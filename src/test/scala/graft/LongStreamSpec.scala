package graft

import org.apache.spark.sql.functions._
import graft.fixtures.RetailGen
import graft.stream.CdcPipeline
import graft.table.MergeTable

/** End-to-end invariant: a long CDC stream applied as many micro-batches
  * (with aggressive auto-compaction firing mid-stream) must converge to
  * exactly the state of a single one-shot replay. The generator's
  * timestamps/transaction-ids increase with event order, and batches
  * split in event order, so per-key arrival order equals event order —
  * the reference's Kinesis partition-key FIFO contract.
  */
class LongStreamSpec extends SparkSpec {
  import spark.implicits._

  private def fullState(t: MergeTable) =
    t.read(spark).orderBy("trans_id").collect().toSeq

  test("20k-event stream in 10 batches with auto-compaction == one-shot replay") {
    val lines = RetailGen.cdcJsonLines(spark, 20000, keySpace = 2000)
      .collect().map(_.getString(0)) // collect preserves range order -> seqno order

    val streamed = MergeTable.retailTrans(tmpDir("ls-stream"), threshold = 2)
    lines.grouped(2000).zipWithIndex.foreach { case (chunk, i) =>
      val df = spark.createDataset(chunk.toSeq).toDF("value")
      CdcPipeline.replayBatch(spark, df, streamed, None, Some(s"b$i"))
    }
    val oneShot = MergeTable.retailTrans(tmpDir("ls-oneshot"), threshold = 1000)
    CdcPipeline.replayBatch(spark,
      spark.createDataset(lines.toSeq).toDF("value"), oneShot, None, Some("all"))

    // compaction actually fired mid-stream (threshold 2, deletes every batch)
    val ops = streamed.snapshotsDf(spark).select("op").as[String].collect()
    assert(ops.count(_ == "compact") >= 2, ops.mkString(","))
    assert(streamed.currentSnapshot.get.deleteFiles.size < 2)

    val a = fullState(streamed)
    val b = fullState(oneShot)
    assert(a.nonEmpty)
    assert(a === b)
  }
}
