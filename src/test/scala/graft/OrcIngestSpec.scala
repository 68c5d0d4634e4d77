package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

import graft.sources.OrcIngest

/** ORC round trip (q273): value fidelity vs the parquet original, and
  * the two scan properties the partitioned layout exists for —
  * partition pruning and predicate pushdown into the ORC reader.
  */
class OrcIngestSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("roundtrip equals the same aggregate computed from parquet") {
    val viaOrc = OrcIngest.roundtrip(spark, sf).collect()
    val direct = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("1998-09-02 23:59:59")
        .cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        min(col("l_orderkey")).as("min_orderkey"),
        max(col("l_orderkey")).as("max_orderkey"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
      .collect()
    assert(viaOrc.toSeq === direct.toSeq,
      "ORC write/read must be value-preserving")
  }

  test("partition filter prunes ORC directories; timestamp predicate " +
      "reaches the ORC scan") {
    val dir = java.nio.file.Files.createTempDirectory("orc-prune").toString
    Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"),
        col("l_shipdate"))
      .write.mode("overwrite").partitionBy("l_returnflag").orc(dir)
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      val scans = df.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f
      }
      scans.map(s => s.relation.location
        .listFiles(s.partitionFilters, Nil).map(_.files.size).sum).sum
    }
    val pruned = OrcIngest.prunedRead(spark, dir, "R")
    val all = spark.read.orc(dir).filter(lit(true))
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters")
      && planStr.contains("l_returnflag"),
      s"expected partition filter in plan:\n$planStr")
    assert(scannedFiles(pruned) < scannedFiles(all),
      "one flag's read must touch fewer files than the full layout")
    // the non-partition predicate must appear as a pushed filter on the
    // ORC scan, not only as a post-scan Filter
    val pushed = spark.read.orc(dir)
      .filter(col("l_shipdate") <= lit("1998-09-02 23:59:59")
        .cast("timestamp"))
    val pushedStr = pushed.queryExecution.executedPlan.toString
    assert(pushedStr.contains("PushedFilters: [")
      && pushedStr.contains("l_shipdate"),
      s"expected pushed ORC predicate:\n$pushedStr")
  }
}
