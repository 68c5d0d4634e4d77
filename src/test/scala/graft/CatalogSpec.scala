package graft

import org.apache.spark.sql.functions._
import graft.catalog.LakeCatalog
import graft.fixtures.{GoldenCorpus, RetailGen}
import graft.model.Schemas
import graft.stream.CdcPipeline
import graft.table.MergeTable

class CatalogSpec extends SparkSpec {
  import spark.implicits._

  test("create/list databases and tables; DESC shows partition column") {
    val cat = new LakeCatalog(tmpDir("wh"))
    cat.createDatabase("cdc_iceberg_demo_db")
    assert(cat.listDatabases === Seq("cdc_iceberg_demo_db"))

    cat.createTable("cdc_iceberg_demo_db", "retail_trans_iceberg",
      Schemas.LakeTableSchema, key = "trans_id", partitionCol = Some("event"))
    assert(cat.listTables("cdc_iceberg_demo_db") === Seq("retail_trans_iceberg"))

    val desc = cat.describeTable(spark, "cdc_iceberg_demo_db", "retail_trans_iceberg")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(desc.contains(("trans_id", "bigint", "")))
    assert(desc.contains(("event", "string", "partition")))
    assert(desc.contains(("trans_datetime", "timestamp", "")))

    assert(cat.showDatabases(spark).as[String].collect() === Array("cdc_iceberg_demo_db"))
    assert(cat.showTables(spark, "cdc_iceberg_demo_db").count() === 1)
  }

  test("reopened table from _table.meta preserves schema/key/partition") {
    val cat = new LakeCatalog(tmpDir("wh"))
    cat.createDatabase("db1")
    cat.createTable("db1", "t1", Schemas.LakeTableSchema, "trans_id", Some("event"), 7)
    val t = cat.getTable("db1", "t1")
    assert(t.keyCol === "trans_id")
    assert(t.partitionCol === Some("event"))
    assert(t.deleteCompactThreshold === 7)
    assert(t.schema === Schemas.LakeTableSchema)
  }

  test("SQL over catalog views: golden corpus COUNT(*) = 12 via spark.sql") {
    val cat = new LakeCatalog(tmpDir("wh"))
    cat.createDatabase("demo")
    val t = cat.createTable("demo", "retail_trans_iceberg",
      Schemas.LakeTableSchema, "trans_id", Some("event"))
    CdcPipeline.replayBatch(spark, GoldenCorpus.df(spark, GoldenCorpus.allLines), t)
    cat.registerViews(spark, "demo")
    // the reference's verification query, README.md:457-460
    assert(spark.sql("SELECT COUNT(*) FROM retail_trans_iceberg")
      .as[Long].collect().head === 12L)
    // arbitrary SQL works over engine tables
    val agg = spark.sql(
      """SELECT event, count(*) AS n FROM retail_trans_iceberg
         GROUP BY event ORDER BY event""").count()
    assert(agg > 0)
  }

  test("path traversal and re-create are rejected") {
    val cat = new LakeCatalog(tmpDir("wh"))
    cat.createDatabase("db9")
    intercept[IllegalArgumentException](cat.dropTable("..", ".."))
    intercept[IllegalArgumentException](cat.getTable("db9", "../x"))
    cat.createTable("db9", "t9", Schemas.LakeTableSchema, "trans_id", None)
    intercept[IllegalArgumentException] {
      cat.createTable("db9", "t9", Schemas.LakeTableSchema, "customer_id", None)
    }
  }

  test("drop table removes it from listings") {
    val cat = new LakeCatalog(tmpDir("wh"))
    cat.createDatabase("db2")
    cat.createTable("db2", "t2", Schemas.LakeTableSchema, "trans_id", None)
    cat.dropTable("db2", "t2")
    assert(cat.listTables("db2") === Nil)
    assert(!cat.tableExists("db2", "t2"))
  }
}

class RetailGenSpec extends SparkSpec {
  import spark.implicits._

  test("generated rows honor the reference field distributions") {
    val df = RetailGen.rows(spark, 2000).cache()
    assert(df.count() === 2000)
    val events = df.select("event").distinct().as[String].collect().toSet
    assert(events.subsetOf(RetailGen.Events.toSet))
    val devices = df.select("device").distinct().as[String].collect().toSet
    assert(devices.subsetOf(RetailGen.Devices.toSet))
    // P7: amount is 1 unless cart/purchase
    assert(df.filter(!$"event".isin("cart", "purchase") && $"amount" =!= 1).count() === 0)
    assert(df.filter($"amount" < 0 || $"amount" > 100).count() === 0)
    // sku pattern ??%###????
    assert(df.filter(!$"sku".rlike("^[A-Z]{2}[1-9][0-9]{3}[A-Z]{4}$")).count() === 0)
    assert(df.filter(!$"customer_id".rlike("^[1-9][0-9]{11}$")).count() === 0)
    df.unpersist()
  }

  test("generation is deterministic in the seed") {
    val a = RetailGen.rows(spark, 100, seed = 7).collect().toSeq
    val b = RetailGen.rows(spark, 100, seed = 7).collect().toSeq
    val c = RetailGen.rows(spark, 100, seed = 8).collect().toSeq
    assert(a === b)
    assert(a !== c)
  }

  test("cdc envelopes round-trip through the transformer") {
    val lines = RetailGen.cdcJsonLines(spark, 500, keySpace = 100)
    val res = graft.transform.CdcTransformer.transform(lines)
    assert(res.errors.count() === 0)
    assert(res.good.count() === 500)
    val ops = res.good.select("operation").distinct().as[String].collect().toSet
    assert(ops === Set("insert", "update", "delete"))
  }

  test("generated CDC stream merges cleanly into a table") {
    val t = MergeTable.retailTrans(tmpDir("gen"))
    val lines = RetailGen.cdcJsonLines(spark, 1000, keySpace = 200)
    CdcPipeline.replayBatch(spark, lines, t, None, Some("g1"))
    val n = t.read(spark).count()
    assert(n > 0 && n <= 200)
    // key uniqueness after merge
    assert(t.read(spark).select("trans_id").distinct().count() === n)
  }
}
