package graft

import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import org.apache.spark.sql.functions._
import graft.fixtures.GoldenCorpus
import graft.stream.CdcPipeline
import graft.table.MergeTable

/** Snapshot tags (immutable named refs), TIMESTAMP AS OF resolution, and
  * the SQL metadata tables (`cat.db.t.snapshots|files|refs`).
  */
class TagsAndMetaSpec extends SparkSpec {
  import spark.implicits._

  private def seeded(tag: String): MergeTable = {
    val t = MergeTable.retailTrans(tmpDir(tag), threshold = 100)
    CdcPipeline.replayBatch(spark,
      GoldenCorpus.df(spark, GoldenCorpus.insertOnlyLines), t, None, Some("p1"))
    t
  }

  test("tags pin snapshots across expiry; dropTag releases the pin") {
    val t = seeded("tags")
    val v0 = t.latestVersion
    t.createTag("cut-v1") // pins v0
    CdcPipeline.replayBatch(spark,
      GoldenCorpus.df(spark, GoldenCorpus.dmlLines), t, None, Some("p2"))
    t.updateWhere(spark, $"trans_id" === 19, Map("amount" -> lit(7)))
    t.updateWhere(spark, $"trans_id" === 21, Map("amount" -> lit(8)))

    t.expireSnapshots(keepLast = 1)
    // v0 would be expired, but the tag pins it: still readable
    assert(t.tagVersion("cut-v1") === v0)
    assert(t.read(spark, asOfVersion = Some(v0)).count() === 10)
    // untagged intermediate versions are gone
    assert(t.history.map(_.version).toSet === Set(v0, t.latestVersion))

    // duplicate / missing guards
    intercept[IllegalArgumentException](t.createTag("cut-v1"))
    intercept[IllegalArgumentException](t.createTag("nope", 999))

    t.dropTag("cut-v1")
    t.expireSnapshots(keepLast = 1)
    assert(t.history.map(_.version) === Seq(t.latestVersion))
    intercept[Exception](t.read(spark, asOfVersion = Some(v0)).count())
  }

  test("versionAtTimestamp resolves commit stamps in order") {
    val t = seeded("ts")
    val v0 = t.latestVersion
    Thread.sleep(30)
    val mid = System.currentTimeMillis()
    Thread.sleep(30)
    CdcPipeline.replayBatch(spark,
      GoldenCorpus.df(spark, GoldenCorpus.dmlLines), t, None, Some("p2"))
    val v1 = t.latestVersion

    assert(t.versionAtTimestamp(mid) === v0)
    assert(t.versionAtTimestamp(System.currentTimeMillis()) === v1)
    val tooEarly = t.history.head.tsMillis - 1
    intercept[IllegalArgumentException](t.versionAtTimestamp(tooEarly))
  }

  test("SQL surface: metadata tables, TIMESTAMP AS OF, tag reads") {
    val wh = tmpDir("sqltag-wh")
    spark.conf.set("spark.sql.catalog.sqltm", "graft.sqlcat.GraftCatalog")
    spark.conf.set("spark.sql.catalog.sqltm.warehouse", wh)
    def sql(s: String) = spark.sql(s)

    sql("CREATE NAMESPACE sqltm.d")
    sql("""CREATE TABLE sqltm.d.t (id BIGINT, v STRING)
           TBLPROPERTIES ('unique_keys'='id')""")
    sql("INSERT INTO sqltm.d.t VALUES (1, 'a'), (2, 'b')")
    Thread.sleep(30)
    val mid = System.currentTimeMillis()
    Thread.sleep(30)
    sql("INSERT INTO sqltm.d.t VALUES (3, 'c')")

    // TIMESTAMP AS OF between the two inserts sees only the first
    val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(ZoneOffset.UTC)
    val midLit = fmt.format(Instant.ofEpochMilli(mid))
    assert(sql(s"SELECT count(*) FROM sqltm.d.t TIMESTAMP AS OF '$midLit'")
      .head().getLong(0) === 2L)
    assert(sql("SELECT count(*) FROM sqltm.d.t").head().getLong(0) === 3L)

    // snapshots metadata table: two commits, stamped, op=append
    val snaps = sql("SELECT version, op, committed_at FROM sqltm.d.t.snapshots " +
      "ORDER BY version").collect()
    assert(snaps.length === 2)
    assert(snaps.map(_.getString(1)).toSeq === Seq("append", "append"))
    assert(snaps.forall(r => r.getTimestamp(2).getTime > 0))

    // files metadata table: data files with sizes
    val files = sql("SELECT content, size_bytes FROM sqltm.d.t.files").collect()
    assert(files.nonEmpty)
    assert(files.forall(r => r.getString(0) === "data" && r.getLong(1) > 0))

    // tags via CALL + refs metadata table + tag read
    sql("CALL sqltm.system.create_tag('d.t', 'first', 0)")
    val refs = sql("SELECT name, type, version FROM sqltm.d.t.refs").collect()
    assert(refs.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      === Seq(("first", "tag", 0L)))
    assert(sql("SELECT count(*) FROM sqltm.d.t VERSION AS OF 'tag:first'")
      .head().getLong(0) === 2L)
    sql("CALL sqltm.system.drop_tag('d.t', 'first')")
    assert(sql("SELECT count(*) FROM sqltm.d.t.refs").head().getLong(0) === 0L)
  }

  test("expireSnapshotsOlderThan: age cutoff with keepLast floor") {
    val t = seeded("aged")
    Thread.sleep(30)
    val mid = System.currentTimeMillis()
    Thread.sleep(30)
    CdcPipeline.replayBatch(spark,
      GoldenCorpus.df(spark, GoldenCorpus.dmlLines), t, None, Some("p2"))
    t.updateWhere(spark, $"trans_id" === 19, Map("amount" -> lit(7)))
    assert(t.history.size === 3)

    // only the seed commit predates mid; it expires, the rest stay
    t.expireSnapshotsOlderThan(mid)
    assert(t.history.map(_.version) === Seq(1L, 2L))

    // cutoff in the future would drop everything — keepLast floors it
    t.expireSnapshotsOlderThan(System.currentTimeMillis() + 60000, keepLast = 1)
    assert(t.history.map(_.version) === Seq(2L))
    assert(t.read(spark).count() === 12)
  }

  test("partitions metadata table groups current files by partition dir") {
    val t = seeded("parts")
    val parts = t.partitionsDf(spark).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(parts.nonEmpty)
    // retail_trans partitions by event: every row is an event= dir
    assert(parts.forall(_._1.startsWith("event=")))
    assert(parts.forall(p => p._2 > 0 && p._3 > 0))
    val fromFiles = t.filesDf(spark).filter($"content" === "data").count()
    assert(parts.map(_._2).sum === fromFiles)
  }

  test("removeOrphanFiles deletes only unreferenced files past the grace cutoff") {
    val t = seeded("orphans")
    val future = System.currentTimeMillis() + 60000
    // a live table has no orphans
    assert(t.removeOrphanFiles(future) === 0)
    // plant two orphans: a fake data file and a fake tombstone
    val dataOrphan = java.nio.file.Paths.get(t.root, "data", "event=visit",
      "f99-orphan.parquet")
    java.nio.file.Files.createDirectories(dataOrphan.getParent)
    java.nio.file.Files.writeString(dataOrphan, "not really parquet")
    val delOrphan = java.nio.file.Paths.get(t.root, "deletes", "f99-o.parquet")
    java.nio.file.Files.createDirectories(delOrphan.getParent)
    java.nio.file.Files.writeString(delOrphan, "x")
    // the default 24 h grace window protects FRESH unreferenced files —
    // that's the in-flight-commit race guard, not a bug
    assert(t.removeOrphanFiles() === 0)
    assert(t.removeOrphanFiles(future) === 2)
    assert(!java.nio.file.Files.exists(dataOrphan))
    // referenced files all survive: the table still reads in full
    assert(t.read(spark).count() === 10)
    // tag-pinned old versions stay protected after expiry + orphan sweep
    t.createTag("pin")
    CdcPipeline.replayBatch(spark,
      GoldenCorpus.df(spark, GoldenCorpus.dmlLines), t, None, Some("p2"))
    t.expireSnapshots(keepLast = 1)
    assert(t.removeOrphanFiles(System.currentTimeMillis() + 60000) === 0)
    assert(t.read(spark, asOfVersion = Some(t.tagVersion("pin"))).count() === 10)
  }
}
