package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.table.MergeTable

/** Child-process committer for the cross-JVM commit-contract spec: opens
  * the given table from a SEPARATE JVM (so the per-process commit monitor
  * is useless and only the OS `FileLock` on `_commit.lock` serializes us
  * against the parent) and applies `nBatches` disjoint-key batches with
  * rebase-on-conflict, then exits 0. Any failure → nonzero exit.
  *
  * Usage: CommitWorker <tableRoot> <workerId> <nBatches>
  */
object CommitWorker {
  def main(args: Array[String]): Unit = {
    val Array(root, workerIdS, nS) = args
    val workerId = workerIdS.toInt
    val n = nS.toInt
    val spark = SparkSession.builder()
      .appName(s"commit-worker-$workerId")
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import spark.implicits._
      val t = MergeTable.open(root)
      (1 to n).foreach { i =>
        val key = workerId * 1000L + i
        val df = Seq((key, "cart", workerId * 100 + i, "insert",
            Timestamp.valueOf(f"2023-01-01 00:00:${i % 60}%02d"), key))
          .toDF("trans_id", "event", "amount", "operation",
            "src_timestamp", "transaction_id")
          .withColumn("customer_id", lit(s"w$workerId"))
          .withColumn("sku", lit("s"))
          .withColumn("device", lit("pc"))
          .withColumn("trans_datetime",
            lit(Timestamp.valueOf("2023-01-16 06:00:00")))
        t.applyBatch(df, Some(s"w$workerId-b$i"))
      }
      println(s"WORKER $workerId DONE")
    } finally spark.stop()
  }
}
