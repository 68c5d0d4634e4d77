package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession

/** Scratch evidence driver (own JVM — the shared spec session always has
  * the extension installed): what DSv2 scan statistics buy the
  * NO-extension fallback path.
  *
  *   - The pre-pushdown analyzed plan prices a graft relation at its real
  *     manifest bytes (DataSourceV2RelationBase.computeStats builds a
  *     fresh scan and consults SupportsReportStatistics) — asserted here.
  *   - After filter pushdown Spark wraps V1 scans in V1ScanWrapper, which
  *     does NOT forward SupportsReportStatistics (upstream bridge
  *     limitation — JDBC sources hit the same wall), so the static join
  *     pick falls back to defaultSizeInBytes and AQE's runtime sizes
  *     decide the final shape. The recommended setup (extension splice)
  *     sidesteps the wrapper entirely: ScanStatsSpec asserts
  *     BroadcastHashJoin end-to-end there.
  *
  * Exits nonzero if the analyzed-plan estimate regresses to
  * defaultSizeInBytes.
  */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val wh = Files.createTempDirectory("statsprobe").toString
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("stats-probe")
      .config("spark.sql.catalog.sp", "graft.sqlcat.GraftCatalog")
      .config("spark.sql.catalog.sp.warehouse", wh)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._

    spark.sql("CREATE DATABASE sp.db")
    spark.sql("CREATE TABLE sp.db.dim (k BIGINT, name STRING) " +
      "TBLPROPERTIES ('unique_keys' = 'k')")
    (1L to 100L).map(i => (i, s"name$i")).toDF("k", "name")
      .writeTo("sp.db.dim").append()

    val stats = spark.table("sp.db.dim").queryExecution.analyzed.stats
    println(s"analyzed dim stats (no extension): $stats")
    val ok = stats.sizeInBytes < BigInt(1L << 30)
    println(if (ok) "STATS PROBE OK" else "STATS PROBE FAIL: default size")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
