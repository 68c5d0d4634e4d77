package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.connector.read.V1Scan
import org.apache.spark.sql.sources.{BaseRelation, TableScan}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sqlcat.GraftSqlTable
import graft.table.MergeTable

/** SQL-first surface over engine tables (VERDICT r2 item 1): the entire
  * DDL + DML lifecycle driven through `spark.sql` ONLY — catalog plugin
  * resolution, V1 write fallback, extension-spliced reads, and the
  * UPDATE/DELETE/MERGE command rewrites.
  */
class SqlCatalogSpec extends SparkSpec {

  private def sql(s: String) = spark.sql(s)

  test("full SQL lifecycle: DDL, INSERT, UPDATE, DELETE, MERGE, time travel, ALTER, TRUNCATE, DROP") {
    val wh = tmpDir("graft-sqlcat")
    spark.conf.set("spark.sql.catalog.sqlc", "graft.sqlcat.GraftCatalog")
    spark.conf.set("spark.sql.catalog.sqlc.warehouse", wh)

    sql("CREATE NAMESPACE sqlc.demo")
    assert(sql("SHOW NAMESPACES IN sqlc").collect().map(_.getString(0)).contains("demo"))

    sql("""CREATE TABLE sqlc.demo.t (id BIGINT, name STRING, amount DOUBLE, cat STRING)
           PARTITIONED BY (cat)
           TBLPROPERTIES ('unique_keys'='id',
                          'optimize_rewrite_delete_file_threshold'='3',
                          'owner_team'='graft')""")
    assert(sql("SHOW TABLES IN sqlc.demo").collect().map(_.getString(1)).contains("t"))

    val desc = sql("DESCRIBE TABLE sqlc.demo.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc("id") == "bigint" && desc("amount") == "double")

    // TBLPROPERTIES passthrough: user props AND engine-interpreted props
    val props = sql("SHOW TBLPROPERTIES sqlc.demo.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("owner_team") == "graft")
    assert(props("unique_keys") == "id")
    assert(props("optimize_rewrite_delete_file_threshold") == "3")

    // INSERT (positional and column-list) through the V1 write fallback
    sql("INSERT INTO sqlc.demo.t VALUES (1, 'a', 10.0, 'x'), (2, 'b', -5.0, 'y'), (3, 'c', 7.5, 'x')")
    assert(sql("SELECT CAST(count(*) AS BIGINT) FROM sqlc.demo.t").collect().head.getLong(0) == 3L)

    // UPDATE via the engine's keyed merge path
    sql("UPDATE sqlc.demo.t SET amount = amount + 1.0 WHERE cat = 'x'")
    assert(sql("SELECT sum(amount) FROM sqlc.demo.t WHERE cat = 'x'")
      .collect().head.getDouble(0) == 19.5)

    // DELETE
    sql("DELETE FROM sqlc.demo.t WHERE amount < 0")
    assert(sql("SELECT CAST(count(*) AS BIGINT) FROM sqlc.demo.t").collect().head.getLong(0) == 2L)

    // MERGE INTO: matched update + not-matched insert, one commit
    sql("""MERGE INTO sqlc.demo.t t
           USING (SELECT * FROM VALUES (1L, 'A', 0.5, 'x'), (9L, 'i', 9.0, 'z')
                  AS v(id, name, amount, cat)) s
           ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET name = s.name, amount = t.amount + s.amount
           WHEN NOT MATCHED THEN INSERT (id, name, amount, cat)
             VALUES (s.id, s.name, s.amount, s.cat)""")
    assert(sql("SELECT id, name, amount, cat FROM sqlc.demo.t ORDER BY id").collect().toSeq ==
      Seq(Row(1L, "A", 11.5, "x"), Row(3L, "c", 8.5, "x"), Row(9L, "i", 9.0, "z")))

    // conditional matched actions: first matching WHEN wins
    sql("""MERGE INTO sqlc.demo.t t
           USING (SELECT * FROM VALUES (3L), (9L) AS v(id)) s
           ON t.id = s.id
           WHEN MATCHED AND t.amount > 8.6 THEN DELETE
           WHEN MATCHED THEN UPDATE SET name = 'kept'""")
    assert(sql("SELECT id, name FROM sqlc.demo.t ORDER BY id").collect().toSeq ==
      Seq(Row(1L, "A"), Row(3L, "kept")))

    // time travel: v0 was the 3-row initial insert
    assert(sql("SELECT CAST(count(*) AS BIGINT) FROM sqlc.demo.t VERSION AS OF 0")
      .collect().head.getLong(0) == 3L)

    // metadata-only schema evolution
    sql("ALTER TABLE sqlc.demo.t ADD COLUMN note STRING")
    assert(sql("SELECT note FROM sqlc.demo.t").collect().forall(_.isNullAt(0)))
    sql("ALTER TABLE sqlc.demo.t SET TBLPROPERTIES ('quality'='gold')")
    assert(sql("SHOW TBLPROPERTIES sqlc.demo.t").collect()
      .exists(r => r.getString(0) == "quality" && r.getString(1) == "gold"))
    sql("ALTER TABLE sqlc.demo.t DROP COLUMN note")
    assert(!sql("SELECT * FROM sqlc.demo.t").columns.contains("note"))

    // extension splices the native plan: no V1 row-scan in SELECTs
    val plan = sql("SELECT id, amount FROM sqlc.demo.t WHERE cat = 'x'")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("RowDataSourceScan"), s"expected native read plan, got:\n$plan")

    sql("TRUNCATE TABLE sqlc.demo.t")
    assert(sql("SELECT CAST(count(*) AS BIGINT) FROM sqlc.demo.t").collect().head.getLong(0) == 0L)

    sql("DROP TABLE sqlc.demo.t")
    assert(sql("SHOW TABLES IN sqlc.demo").collect().isEmpty)
    sql("DROP NAMESPACE sqlc.demo")
    assert(!sql("SHOW NAMESPACES IN sqlc").collect().map(_.getString(0)).contains("demo"))
  }

  test("INSERT OVERWRITE replaces the snapshot, retaining time travel") {
    val wh = tmpDir("graft-sqlcat-ow")
    spark.conf.set("spark.sql.catalog.sqlo", "graft.sqlcat.GraftCatalog")
    spark.conf.set("spark.sql.catalog.sqlo.warehouse", wh)
    sql("CREATE NAMESPACE sqlo.d")
    sql("CREATE TABLE sqlo.d.t (id BIGINT, v STRING) TBLPROPERTIES ('unique_keys'='id')")
    sql("INSERT INTO sqlo.d.t VALUES (1, 'old'), (2, 'old')")
    sql("INSERT OVERWRITE sqlo.d.t VALUES (7, 'new')")
    assert(sql("SELECT id, v FROM sqlo.d.t").collect().toSeq == Seq(Row(7L, "new")))
    assert(sql("SELECT CAST(count(*) AS BIGINT) FROM sqlo.d.t VERSION AS OF 0")
      .collect().head.getLong(0) == 2L)
  }

  test("MERGE rejects assigning the merge key (silent duplication guard)") {
    val wh = tmpDir("graft-sqlcat-mk")
    spark.conf.set("spark.sql.catalog.sqlm", "graft.sqlcat.GraftCatalog")
    spark.conf.set("spark.sql.catalog.sqlm.warehouse", wh)
    sql("CREATE NAMESPACE sqlm.d")
    sql("CREATE TABLE sqlm.d.t (id BIGINT, v STRING) TBLPROPERTIES ('unique_keys'='id')")
    sql("INSERT INTO sqlm.d.t VALUES (1, 'a'), (2, 'b')")
    // WHEN MATCHED UPDATE SET id=... would upsert under the NEW key while
    // the old row stays live — must reject, mirroring updateWhere's guard
    val e = intercept[Exception] {
      sql("""MERGE INTO sqlm.d.t t
             USING (SELECT 1L AS id, 'x' AS v) s
             ON t.id = s.id
             WHEN MATCHED THEN UPDATE SET id = 99, v = s.v""")
    }
    assert(e.getMessage.contains("merge key"))
    assert(sql("SELECT CAST(count(*) AS BIGINT) FROM sqlm.d.t").collect().head.getLong(0) == 2L)
  }

  test("INSERT OVERWRITE PARTITION replaces only the matching slice, atomically") {
    val wh = tmpDir("graft-sqlcat-owp")
    spark.conf.set("spark.sql.catalog.sqlp", "graft.sqlcat.GraftCatalog")
    spark.conf.set("spark.sql.catalog.sqlp.warehouse", wh)
    sql("CREATE NAMESPACE sqlp.d")
    sql("""CREATE TABLE sqlp.d.t (id BIGINT, v STRING, cat STRING)
           PARTITIONED BY (cat) TBLPROPERTIES ('unique_keys'='id')""")
    sql("INSERT INTO sqlp.d.t VALUES (1, 'keep', 'x'), (2, 'old', 'y'), (3, 'old', 'y')")
    // static-mode partition overwrite → OverwriteByExpression(cat = 'y')
    sql("INSERT OVERWRITE sqlp.d.t PARTITION (cat = 'y') VALUES (9, 'new')")
    assert(sql("SELECT id, v, cat FROM sqlp.d.t ORDER BY id").collect().toSeq ==
      Seq(Row(1L, "keep", "x"), Row(9L, "new", "y")))
    // ONE replacement commit — the pre-image is one version back
    assert(sql("SELECT CAST(count(*) AS BIGINT) FROM sqlp.d.t VERSION AS OF 0")
      .collect().head.getLong(0) == 3L)
  }

  test("CTAS and REPLACE TABLE AS SELECT create engine tables from queries") {
    val wh = tmpDir("graft-sqlcat-ctas")
    spark.conf.set("spark.sql.catalog.sqlt", "graft.sqlcat.GraftCatalog")
    spark.conf.set("spark.sql.catalog.sqlt.warehouse", wh)
    sql("CREATE NAMESPACE sqlt.d")
    sql("""CREATE TABLE sqlt.d.t TBLPROPERTIES ('unique_keys'='id') AS
           SELECT * FROM VALUES (1L, 'a'), (2L, 'b') AS v(id, name)""")
    assert(sql("SELECT id, name FROM sqlt.d.t ORDER BY id").collect().toSeq ==
      Seq(Row(1L, "a"), Row(2L, "b")))
    // the created table is a full MergeTable: keyed DML works on it
    sql("UPDATE sqlt.d.t SET name = 'A' WHERE id = 1")
    assert(sql("SELECT name FROM sqlt.d.t WHERE id = 1").collect().head.getString(0) == "A")
    sql("""REPLACE TABLE sqlt.d.t TBLPROPERTIES ('unique_keys'='id') AS
           SELECT * FROM VALUES (9L, 'z') AS v(id, name)""")
    assert(sql("SELECT id, name FROM sqlt.d.t").collect().toSeq == Seq(Row(9L, "z")))
  }

  test("CALL graft.system.* drives the full maintenance lifecycle from SQL") {
    val wh = tmpDir("graft-sqlcat-proc")
    spark.conf.set("spark.sql.catalog.sqlx", "graft.sqlcat.GraftCatalog")
    spark.conf.set("spark.sql.catalog.sqlx.warehouse", wh)
    sql("CREATE NAMESPACE sqlx.d")
    sql("""CREATE TABLE sqlx.d.t (id BIGINT, v STRING, amount INT)
           TBLPROPERTIES ('unique_keys'='id',
                          'optimize_rewrite_delete_file_threshold'='100')""")
    sql("INSERT INTO sqlx.d.t SELECT id, concat('v', id), CAST(id % 50 AS INT) FROM range(500)")
    sql("UPDATE sqlx.d.t SET v = 'upd' WHERE id < 100")
    val scalaSide = new graft.catalog.LakeCatalog(wh).getTable("d", "t")
    assert(scalaSide.currentSnapshot.get.requiresDedup)

    // compact: merge-on-read -> pure scan, one row returned with the version
    val v = sql("CALL sqlx.system.compact('d.t')").collect()
    assert(v.length == 1 && v.head.getLong(0) == scalaSide.latestVersion)
    assert(!scalaSide.currentSnapshot.get.requiresDedup)
    assert(sql("SELECT CAST(count(*) AS BIGINT) FROM sqlx.d.t").collect().head.getLong(0) == 500L)

    // sorted layout via SQL; manifest stats present afterwards
    sql("CALL sqlx.system.compact_sorted('d.t', 'amount', 4)")
    assert(scalaSide.currentSnapshot.get.colStats.contains("amount"))

    // z-order layout via SQL: per-file stats for BOTH dimensions
    sql("CALL sqlx.system.compact_zorder('d.t', 'amount,id', 4)")
    assert(scalaSide.currentSnapshot.get.colStats.contains("amount")
      && scalaSide.currentSnapshot.get.colStats.contains("id"))

    // bucketed layout, scoped compaction, bin-pack: callable and harmless
    sql("CALL sqlx.system.compact_bucketed('d.t', 4)")
    sql("DELETE FROM sqlx.d.t WHERE id = 7")
    sql("CALL sqlx.system.compact_scoped('d.t')")
    sql("CALL sqlx.system.bin_pack('d.t')")
    assert(sql("SELECT CAST(count(*) AS BIGINT) FROM sqlx.d.t").collect().head.getLong(0) == 499L)

    // rollback to the pre-delete version restores the row
    val target = sql("CALL sqlx.system.rollback('d.t', " +
      (scalaSide.latestVersion - 3) + ")").collect().head.getLong(0)
    assert(target == scalaSide.latestVersion)
    assert(sql("SELECT CAST(count(*) AS BIGINT) FROM sqlx.d.t").collect().head.getLong(0) == 500L)

    // expire old snapshots; the table stays readable
    sql("CALL sqlx.system.expire_snapshots('d.t', 1)")
    assert(sql("SELECT CAST(count(*) AS BIGINT) FROM sqlx.d.t").collect().head.getLong(0) == 500L)

    // unknown procedure fails loudly
    intercept[Exception] { sql("CALL sqlx.system.no_such_proc('d.t')") }
  }

  test("CALL graft.system.clone: zero-copy SQL clone, independent afterwards") {
    val wh = tmpDir("graft-sqlcat-clone")
    spark.conf.set("spark.sql.catalog.sqlcl", "graft.sqlcat.GraftCatalog")
    spark.conf.set("spark.sql.catalog.sqlcl.warehouse", wh)
    sql("CREATE NAMESPACE sqlcl.d")
    sql("""CREATE TABLE sqlcl.d.t (id BIGINT, v STRING)
           TBLPROPERTIES ('unique_keys'='id')""")
    sql("INSERT INTO sqlcl.d.t SELECT id, concat('v', id) FROM range(100)")
    val v = sql("CALL sqlcl.system.clone('d.t', 'd.t2')").collect()
    assert(v.length == 1)
    assert(sql("SELECT CAST(count(*) AS BIGINT) FROM sqlcl.d.t2")
      .collect().head.getLong(0) == 100L)
    // no data bytes under the clone's own data dir
    val ownFiles = java.nio.file.Files.walk(
        java.nio.file.Paths.get(wh, "d", "t2", "data"))
      .filter(java.nio.file.Files.isRegularFile(_)).count()
    assert(ownFiles === 0L)
    // diverge: update the clone, source unchanged
    sql("UPDATE sqlcl.d.t2 SET v = 'x' WHERE id = 5")
    assert(sql("SELECT v FROM sqlcl.d.t2 WHERE id = 5")
      .collect().head.getString(0) == "x")
    assert(sql("SELECT v FROM sqlcl.d.t WHERE id = 5")
      .collect().head.getString(0) == "v5")
    // cloning over an existing table fails loudly
    intercept[Exception] { sql("CALL sqlcl.system.clone('d.t', 'd.t2')") }
    // deep clone: own bytes, survives dropping the source
    sql("CALL sqlcl.system.deep_clone('d.t', 'd.t3')")
    val deepFiles = java.nio.file.Files.walk(
        java.nio.file.Paths.get(wh, "d", "t3", "data"))
      .filter(java.nio.file.Files.isRegularFile(_)).count()
    assert(deepFiles > 0L, "deep clone must own its bytes")
    sql("DROP TABLE sqlcl.d.t")
    assert(sql("SELECT CAST(count(*) AS BIGINT) FROM sqlcl.d.t3")
      .collect().head.getLong(0) == 100L)
  }

  test("write-audit-publish from SQL: branch procedures + branch read") {
    val wh = tmpDir("graft-sqlcat-wap")
    spark.conf.set("spark.sql.catalog.sqlw", "graft.sqlcat.GraftCatalog")
    spark.conf.set("spark.sql.catalog.sqlw.warehouse", wh)
    sql("CREATE NAMESPACE sqlw.d")
    sql("CREATE TABLE sqlw.d.t (id BIGINT, v STRING) TBLPROPERTIES ('unique_keys'='id')")
    sql("INSERT INTO sqlw.d.t VALUES (1L, 'a'), (2L, 'b')")

    sql("CALL sqlw.system.create_branch('d.t', 'audit')")
    // stage a write on the branch through the Scala handle (DML statements
    // address main; branches are written via the API, read via SQL below)
    val main = new graft.catalog.LakeCatalog(wh).getTable("d", "t")
    val b = main.branch("audit")
    b.appendAll(spark.sql("SELECT 3L AS id, 'c' AS v"), Some("wap1"))

    // audit: branch read via VERSION AS OF shows the staged row, main not
    assert(sql("SELECT count(*) FROM sqlw.d.t VERSION AS OF 'branch:audit'")
      .collect().head.getLong(0) == 3L)
    assert(sql("SELECT count(*) FROM sqlw.d.t").collect().head.getLong(0) == 2L)

    // publish: main fast-forwards to the audited snapshot
    sql("CALL sqlw.system.publish_branch('d.t', 'audit')")
    assert(sql("SELECT count(*) FROM sqlw.d.t").collect().head.getLong(0) == 3L)

    // drop path: a discarded branch never surfaces on main
    sql("CALL sqlw.system.create_branch('d.t', 'reject')")
    main.branch("reject").appendAll(spark.sql("SELECT 9L AS id, 'x' AS v"), Some("wap2"))
    sql("CALL sqlw.system.drop_branch('d.t', 'reject')")
    assert(sql("SELECT count(*) FROM sqlw.d.t").collect().head.getLong(0) == 3L)
    intercept[Exception] {
      sql("SELECT * FROM sqlw.d.t VERSION AS OF 'branch:reject'").collect()
    }
  }

  test("SQL range predicates prune files via manifest stats after sorted compaction") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val wh = tmpDir("graft-sqlcat-prune")
    spark.conf.set("spark.sql.catalog.sqlz", "graft.sqlcat.GraftCatalog")
    spark.conf.set("spark.sql.catalog.sqlz.warehouse", wh)
    sql("CREATE NAMESPACE sqlz.d")
    sql("CREATE TABLE sqlz.d.t (id BIGINT, amount INT) TBLPROPERTIES ('unique_keys'='id')")
    sql("INSERT INTO sqlz.d.t SELECT id, CAST(id % 1000 AS INT) FROM range(4000)")
    sql("CALL sqlz.system.compact_sorted('d.t', 'amount', 8)")

    def scannedFiles(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s.relation.location.inputFiles.length
      }.sum
    val full = sql("SELECT * FROM sqlz.d.t")
    val narrow = sql("SELECT * FROM sqlz.d.t WHERE amount BETWEEN 10 AND 60")
    assert(scannedFiles(narrow) < scannedFiles(full),
      s"no file pruning: ${scannedFiles(narrow)} vs ${scannedFiles(full)}")
    // exactness: pruned SQL result == full-scan filter
    assert(narrow.count() ==
      full.filter("amount BETWEEN 10 AND 60").count())
    assert(narrow.count() > 0)

    // a later delta disables pruning (merge work pending) but stays correct
    sql("UPDATE sqlz.d.t SET amount = 999 WHERE id < 50")
    val after = sql("SELECT CAST(count(*) AS BIGINT) FROM sqlz.d.t WHERE amount BETWEEN 10 AND 60")
      .collect().head.getLong(0)
    val expect = sql("SELECT CAST(count(*) AS BIGINT) FROM sqlz.d.t WHERE amount >= 10 AND amount <= 60")
      .collect().head.getLong(0)
    assert(after == expect)
  }

  test("Scala API and SQL see the same table (one catalog layout)") {
    val wh = tmpDir("graft-sqlcat-share")
    spark.conf.set("spark.sql.catalog.sqls", "graft.sqlcat.GraftCatalog")
    spark.conf.set("spark.sql.catalog.sqls.warehouse", wh)
    sql("CREATE NAMESPACE sqls.d")
    sql("CREATE TABLE sqls.d.t (id BIGINT, v STRING) TBLPROPERTIES ('unique_keys'='id')")
    sql("INSERT INTO sqls.d.t VALUES (1, 'sql')")
    // the Scala-API catalog over the same warehouse dir opens the same table
    val scalaSide = new graft.catalog.LakeCatalog(wh).getTable("d", "t")
    assert(scalaSide.read(spark).collect().toSeq == Seq(Row(1L, "sql")))
    import org.apache.spark.sql.functions.{col, lit}
    scalaSide.updateWhere(spark, col("id") === 1, Map("v" -> lit("scala")))
    assert(sql("SELECT v FROM sqls.d.t").collect().head.getString(0) == "scala")
  }

  test("V1 fallback scan returns the merged snapshot (no extension needed)") {
    val root = tmpDir("graft-v1scan")
    val t = MergeTable.retailTrans(root + "/t")
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val rows = Seq((1L, "c1", "visit", "S1", 5, "pc", java.sql.Timestamp.valueOf("2023-01-16 06:00:00")))
      .toDF("trans_id", "customer_id", "event", "sku", "amount", "device", "trans_datetime")
    t.applyBatch(rows.withColumn("operation", lit("insert")))
    val sqlTable = new GraftSqlTable("v1t", t, Map.empty)
    val scan = sqlTable.newScanBuilder(CaseInsensitiveStringMap.empty()).build().asInstanceOf[V1Scan]
    val rel = scan.toV1TableScan[BaseRelation with TableScan](spark.sqlContext)
    assert(rel.buildScan().count() == 1L)
    assert(rel.schema == t.schema)
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE: sync-to-source semantics") {
    val wh = tmpDir("graft-sqlcat-nmbs")
    spark.conf.set("spark.sql.catalog.sqn", "graft.sqlcat.GraftCatalog")
    spark.conf.set("spark.sql.catalog.sqn.warehouse", wh)
    sql("CREATE NAMESPACE sqn.d")
    sql("""CREATE TABLE sqn.d.t (id BIGINT, v STRING, amount DOUBLE)
           TBLPROPERTIES ('unique_keys'='id')""")
    sql("INSERT INTO sqn.d.t VALUES (1, 'a', 1.0), (2, 'b', 2.0), (3, 'c', 30.0)")
    // full replication MERGE: update matches, insert new, delete rows the
    // source no longer carries — all in ONE commit
    sql("""MERGE INTO sqn.d.t t
           USING (SELECT * FROM VALUES (2L, 'B', 20.0), (9L, 'i', 9.0)
                  AS v(id, v, amount)) s
           ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET v = s.v, amount = s.amount
           WHEN NOT MATCHED THEN INSERT (id, v, amount)
             VALUES (s.id, s.v, s.amount)
           WHEN NOT MATCHED BY SOURCE AND t.amount < 10.0 THEN DELETE""")
    // id 1 deleted (absent from source, amount < 10); id 3 survives (the
    // BY SOURCE condition gates the delete); one version advanced
    assert(sql("SELECT id, v, amount FROM sqn.d.t ORDER BY id").collect().toSeq ==
      Seq(Row(2L, "B", 20.0), Row(3L, "c", 30.0), Row(9L, "i", 9.0)))
    // conditional BY-SOURCE UPDATE marks stale rows in place
    sql("""MERGE INTO sqn.d.t t
           USING (SELECT 2L AS id) s
           ON t.id = s.id
           WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = 'stale'""")
    assert(sql("SELECT id, v FROM sqn.d.t ORDER BY id").collect().toSeq ==
      Seq(Row(2L, "B"), Row(3L, "stale"), Row(9L, "stale")))
    // the whole first MERGE was one commit: its pre-image is one version back
    assert(sql("SELECT CAST(count(*) AS BIGINT) FROM sqn.d.t VERSION AS OF 1")
      .collect().head.getLong(0) == 3L)
  }
}
