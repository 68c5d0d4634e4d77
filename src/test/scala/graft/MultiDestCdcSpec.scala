package graft

import java.nio.file.{Files, Paths}

import graft.catalog.LakeCatalog
import graft.fixtures.GoldenCorpus
import graft.model.Schemas
import graft.stream.CdcPipeline
import graft.transform.CdcRoute

/** Multi-destination CDC demux (VERDICT r2 item 8): one landing stream,
  * per-record routing to two MergeTables, shared batchId idempotence,
  * unrouted tables to the dead-letter sink.
  */
class MultiDestCdcSpec extends SparkSpec {

  test("one stream demuxes to two tables; replay is a per-table no-op") {
    val base = tmpDir("multi-cdc")
    val landing = s"$base/landing"
    val wh = s"$base/warehouse"
    Files.createDirectories(Paths.get(landing))

    val cat = new LakeCatalog(wh)
    cat.createDatabase("lake")
    cat.createTable("lake", "t_a", Schemas.LakeTableSchema, "trans_id", Some("event"))
    cat.createTable("lake", "t_b", Schemas.LakeTableSchema, "trans_id", Some("event"))

    // table A gets the golden insert corpus verbatim; table B the same
    // records under source table retail_trans_b (keeps the leading-space
    // fixture quirk: " retail_trans" -> " retail_trans_b" still trims);
    // a third flavor targets an unrouted table -> dead letter
    val linesA = GoldenCorpus.insertOnlyLines
    val linesB = linesA.map(_.replace("retail_trans", "retail_trans_b"))
    val linesX = linesA.take(2).map(_.replace("retail_trans", "other_tab"))
    Files.write(Paths.get(landing, "batch0.jsonl"),
      (linesA ++ linesB ++ linesX).mkString("\n").getBytes("UTF-8"))

    val routes = Seq(
      CdcRoute("testdb", "retail_trans", "lake", "t_a"),
      CdcRoute("testdb", "retail_trans_b", "lake", "t_b"))
    val cfg = CdcPipeline.MultiConfig(
      landingDir = landing, warehouse = wh,
      errorRoot = s"$base/errors", checkpointDir = s"$base/ckpt", routes = routes)

    CdcPipeline.startMulti(spark, cfg).awaitTermination(60000)

    val ta = cat.getTable("lake", "t_a")
    val tb = cat.getTable("lake", "t_b")
    assert(ta.read(spark).count() == 10)
    assert(tb.read(spark).count() == 10)
    // same keys landed on both sides, via different routes
    assert(ta.read(spark).select("trans_id").collect().map(_.getLong(0)).toSet ==
      tb.read(spark).select("trans_id").collect().map(_.getLong(0)).toSet)

    // unrouted table records are dead-lettered, not silently dropped
    val errs = spark.read.parquet(s"$base/errors")
    assert(errs.filter(org.apache.spark.sql.functions
      .col("error_type") === "unselected_table").count() == 2)

    // replay with a fresh checkpoint re-reads the files and re-offers
    // batch 0 — both tables must recognize the batchId and no-op
    val va = ta.latestVersion
    val vb = tb.latestVersion
    CdcPipeline.startMulti(spark, cfg.copy(checkpointDir = s"$base/ckpt2"))
      .awaitTermination(60000)
    assert(cat.getTable("lake", "t_a").read(spark).count() == 10)
    assert(cat.getTable("lake", "t_b").read(spark).count() == 10)
    assert(cat.getTable("lake", "t_a").latestVersion == va)
    assert(cat.getTable("lake", "t_b").latestVersion == vb)
  }
}
