package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.fixtures.GoldenCorpus
import graft.stream.CdcPipeline
import graft.table.MergeTable

/** Partition pruning on engine tables: a filter on the partition column
  * must reach the scan as a PartitionFilter and cut the files read.
  */
class PruningSpec extends SparkSpec {
  import spark.implicits._

  test("read with partition-column filter prunes directories") {
    val t = MergeTable.retailTrans(tmpDir("prune"))
    CdcPipeline.replayBatch(spark, GoldenCorpus.df(spark, GoldenCorpus.allLines), t)
    t.compact(spark) // compacted: plain scan path

    val all = t.read(spark)
    val filtered = all.filter($"event" === "cart")

    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      val scans = df.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f
      }
      scans.map(_.metrics("numFiles").value).sum max
        scans.map(_.relation.location.listFiles(
          scans.head.partitionFilters, Nil).map(_.files.size).sum).sum
    }
    filtered.count() // materialize metrics
    val planStr = filtered.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") && planStr.contains("event"),
      s"expected partition filter in plan:\n$planStr")

    val prunedFiles = scannedFiles(filtered)
    val totalFiles = scannedFiles(all.filter(lit(true)))
    assert(prunedFiles < totalFiles,
      s"pruned=$prunedFiles total=$totalFiles")
    assert(filtered.count() === 2) // carts: 21, 30
  }
}
