package graft

import java.nio.file.Files

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.table.MergeTable

/** ANALYZE + `.stats` metadata table: one-pass per-column statistics
  * with a visible staleness contract.
  */
class AnalyzeStatsSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("amount", LongType),
    StructField("tag", StringType)))

  test("analyze: exact rows/nulls/min/max, NDV estimate in bound, " +
      "staleness flips on write, SQL CALL + .stats read") {
    val wh = Files.createTempDirectory("anlz").toString
    spark.conf.set("spark.sql.catalog.anl", "graft.sqlcat.GraftCatalog")
    spark.conf.set("spark.sql.catalog.anl.warehouse", wh)
    spark.sql("CREATE NAMESPACE anl.d")
    spark.sql("CREATE TABLE anl.d.t (id BIGINT, amount BIGINT, tag STRING) " +
      "TBLPROPERTIES ('unique_keys'='id')")
    spark.sql("INSERT INTO anl.d.t SELECT id, " +
      "CASE WHEN id % 5 = 0 THEN NULL ELSE id % 37 END, " +
      "concat('t', id % 11) FROM range(200)")
    spark.sql("CALL anl.system.analyze('d.t')")
    val st = spark.sql("SELECT * FROM anl.d.t.stats").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(st.size === 3)
    val am = st("amount")
    assert(am.getLong(1) === 200L, "n_rows")
    assert(am.getLong(2) === 40L, "nulls: every 5th of 200")
    // 37 residues 0..36 appear among non-multiples-of-5 ids; sketch ±10%
    assert(math.abs(am.getLong(3) - 37L) <= 4, s"ndv ${am.getLong(3)}")
    assert(am.getString(4) === "0" && am.getString(5) === "36")
    assert(st("tag").getLong(3) >= 10 && st("tag").getLong(3) <= 12)
    assert(st.values.forall(!_.getBoolean(7)), "fresh right after analyze")
    // any later commit marks the stats stale -- visibly, not silently
    spark.sql("INSERT INTO anl.d.t VALUES (1000, 1, 'zz')")
    assert(spark.sql("SELECT * FROM anl.d.t.stats").collect()
      .forall(_.getBoolean(7)), "stale after a write")
  }

  test("statsDf: empty before analyze; direct API round-trip with " +
      "URL-escaped string bounds") {
    val root = Files.createTempDirectory("anlz2").toString
    val t = new MergeTable(s"$root/t", schema, keyCol = "id",
      partitionCol = None).create()
    assert(t.statsDf(spark).count() === 0L)
    t.appendAll(Seq((1L, 5L, "a\tb"), (2L, 7L, "z z"))
      .toDF("id", "amount", "tag"))
    t.analyze(spark)
    val tag = t.statsDf(spark).collect()
      .find(_.getString(0) == "tag").get
    assert(tag.getString(4) === "a\tb", "tab survives the TSV encoding")
    assert(tag.getString(5) === "z z")
  }
}
