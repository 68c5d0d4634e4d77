package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.connector.read.SupportsReportStatistics
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sqlcat.GraftSqlTable
import graft.table.MergeTable

/** DSv2 scan statistics (`SupportsReportStatistics`): the CBO feed that
  * turns manifest metadata and ANALYZE results into join-planning input —
  * what the reference's Glue/Athena stack gets from Iceberg's snapshot
  * summaries. Two layers under test:
  *
  *   1. the scan interface itself — size from summed data-file bytes,
  *      row count + per-column NDV only when ANALYZE stats match the
  *      exact snapshot version (stale stats must NOT flow);
  *   2. the end-to-end planning consequence in the recommended setup
  *      (extension splice): a small graft dimension table joins a large
  *      fact as BroadcastHashJoin, never SortMergeJoin.
  *
  * Note: in the no-extension fallback, Spark wraps V1 scans in
  * `V1ScanWrapper`, which drops `SupportsReportStatistics` after filter
  * pushdown (upstream bridge limitation, hits JDBC sources the same way)
  * — there the stats still serve the pre-pushdown analyzed plan
  * (StatsProbe demonstrates both), and AQE's runtime sizes govern the
  * final shape.
  */
class ScanStatsSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("amount", LongType),
    StructField("tag", StringType)))

  private def scanStats(t: MergeTable)
      : org.apache.spark.sql.connector.read.Statistics = {
    val sqlT = new GraftSqlTable("t", t, Map.empty)
    val scan = sqlT.newScanBuilder(CaseInsensitiveStringMap.empty()).build()
    assert(scan.isInstanceOf[SupportsReportStatistics],
      "scan must report statistics")
    scan.asInstanceOf[SupportsReportStatistics].estimateStatistics()
  }

  private def dataBytes(t: MergeTable): Long =
    t.currentSnapshot.get.dataFiles.map(f =>
      Files.size(Paths.get(t.root, "data", f))).sum

  test("scan reports manifest-derived size; rows/NDV only while ANALYZE " +
      "stats match the exact snapshot version") {
    val root = Files.createTempDirectory("scanstats").toString
    val t = new MergeTable(s"$root/t", schema, keyCol = "id",
      partitionCol = None).create()
    t.appendAll((1L to 300L).map(i => (i, i % 37, s"t${i % 11}"))
      .toDF("id", "amount", "tag"))

    val s0 = scanStats(t)
    assert(s0.sizeInBytes.getAsLong === dataBytes(t))
    assert(!s0.numRows.isPresent, "no row count before ANALYZE")
    assert(s0.columnStats.isEmpty, "no column stats before ANALYZE")

    t.analyze(spark)
    val s1 = scanStats(t)
    assert(s1.numRows.getAsLong === 300L, "exact analyzed row count")
    val byName = {
      import scala.jdk.CollectionConverters._
      s1.columnStats.asScala.map { case (k, v) => k.describe() -> v }
    }
    assert(math.abs(byName("id").distinctCount.getAsLong - 300L) <= 30L)
    assert(math.abs(byName("amount").distinctCount.getAsLong - 37L) <= 4L)
    assert(byName("tag").nullCount.getAsLong === 0L)

    // a later commit makes the analyzed stats describe a DIFFERENT table:
    // size keeps tracking the manifest, rows/NDV must stop flowing
    t.appendAll(Seq((1000L, 1L, "zz")).toDF("id", "amount", "tag"))
    val s2 = scanStats(t)
    assert(s2.sizeInBytes.getAsLong === dataBytes(t))
    assert(s2.sizeInBytes.getAsLong > s0.sizeInBytes.getAsLong)
    assert(!s2.numRows.isPresent, "stale ANALYZE stats must not flow")
    assert(s2.columnStats.isEmpty)
  }

  test("malformed _stats degrades to size-only statistics (stats are " +
      "advisory; a torn ANALYZE rewrite must not fail planning)") {
    val root = Files.createTempDirectory("scanstats-torn").toString
    val t = new MergeTable(s"$root/t", schema, keyCol = "id",
      partitionCol = None).create()
    t.appendAll((1L to 50L).map(i => (i, i, s"t$i"))
      .toDF("id", "amount", "tag"))
    t.analyze(spark)
    // simulate every malformed shape a non-atomic rewrite can leave:
    // empty file, truncated header, truncated column row
    for (bad <- Seq("", "garbage-no-tab",
        s"${t.currentSnapshot.get.version}\t50\nid\t0")) {
      Files.write(Paths.get(t.root, "_stats"), bad.getBytes("UTF-8"))
      val s = scanStats(t) // must not throw
      assert(s.sizeInBytes.getAsLong === dataBytes(t),
        "size still flows from the manifest")
      assert(!s.numRows.isPresent && s.columnStats.isEmpty,
        s"malformed _stats (${bad.take(12)}…) must drop to size-only")
    }
  }

  test("empty and missing snapshots price at zero (never " +
      "defaultSizeInBytes)") {
    val root = Files.createTempDirectory("scanstats0").toString
    val t = new MergeTable(s"$root/t", schema, keyCol = "id",
      partitionCol = None).create()
    val s = scanStats(t)
    assert(s.sizeInBytes.getAsLong === 0L)
    assert(s.numRows.getAsLong === 0L)
  }

  test("small graft dim x large fact plans BroadcastHashJoin via " +
      "SQL-catalog reads (merge-on-read dim with live upserts)") {
    val wh = Files.createTempDirectory("scanstats-bhj").toString
    spark.conf.set("spark.sql.catalog.sbj", "graft.sqlcat.GraftCatalog")
    spark.conf.set("spark.sql.catalog.sbj.warehouse", wh)
    spark.sql("CREATE NAMESPACE sbj.d")
    spark.sql("CREATE TABLE sbj.d.dim (k BIGINT, name STRING) " +
      "TBLPROPERTIES ('unique_keys'='k')")
    spark.sql("INSERT INTO sbj.d.dim SELECT id + 1, concat('n', id) " +
      "FROM range(100)")
    // a second keyed write so the read is a REAL merge-on-read plan
    // (LWW window over two file generations), not a bare parquet scan
    spark.sql("UPDATE sbj.d.dim SET name = 'patched' WHERE k <= 10")

    val fact = spark.range(0, 500000L)
      .selectExpr("id % 100 + 1 as k", "id as v")
    val joined = fact.join(spark.table("sbj.d.dim"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"small graft dim must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no sort-merge for a 100-row dim:\n$plan")
    assert(joined.count() === 500000L)
    assert(joined.filter($"name" === "patched").count() === 50000L)
  }
}
