package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Sketches
import graft.streaming.SketchStream

class SketchStreamSpec extends SparkSpec {
  import spark.implicits._

  private def regMap(df: DataFrame): Map[(String, Long), Long] =
    df.select(col("grp"), col("bucket").cast("long"),
        col("mr").cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("streamed registers == one-shot batch registers; estimate matches; " +
      "replay and re-fold are no-ops") {
    val root = Files.createTempDirectory("sketchstream").toString
    val regs = SketchStream.create(s"$root/regs")
    val all = (1 to 400).map(i => (s"g${i % 3}", (i % 97).toLong))
    val (h1, h2) = all.splitAt(150)

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    // checkpointed: the second start RESUMES (epoch numbering continues),
    // so the epoch-keyed commits stay distinct across restarts
    val q = SketchStream.distinctIngest(
        in.toDF.toDF("grp", "user_id"), regs, "grp", "user_id")
      .queryName("hll_ingest")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
    in.addData(h1)
    val q1 = q.start(); q1.awaitTermination(120000)
    in.addData(h2)
    val q2 = q.start(); q2.awaitTermination(120000)

    val batchRegs = Sketches.registers(
      all.toDF("grp", "user_id"), "grp", "user_id")
    assert(regMap(regs.read(spark)) === regMap(batchRegs),
      "two triggers must land exactly the one-shot registers")

    val est = SketchStream.estimate(spark, regs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Sketches.estimateRegisters(batchRegs, "grp").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === direct)
    // each group cycles through nearly all 97 residues (gcd(3,97)=1);
    // the small-range correction should land near the true count
    est.values.foreach(v => assert(v > 60 && v < 140, s"estimate $v"))

    val vBefore = regs.read(spark).count()
    // epoch-keyed replay: same batchId skips the commit entirely
    SketchStream.foldBatch(h1.toDF("grp", "user_id"), regs, "grp",
      "user_id", batchId = Some("hll-0"))
    // and even a FRESH id is a no-op by the max algebra (empty delta)
    SketchStream.foldBatch(h1.toDF("grp", "user_id"), regs, "grp",
      "user_id", batchId = Some("hll-refold"))
    assert(regMap(regs.read(spark)) === regMap(batchRegs))
    assert(regs.read(spark).count() === vBefore)
  }

  test("delta-sized commits: a batch of already-seen values upserts " +
      "nothing; reopen from disk continues") {
    val root = Files.createTempDirectory("sketchstream2").toString
    val regs = SketchStream.create(s"$root/regs")
    val data = (1 to 200).map(i => ("g", i.toLong))
    SketchStream.foldBatch(data.toDF("grp", "user_id"), regs, "grp",
      "user_id", batchId = Some("b0"))
    val v0 = regs.latestVersion
    SketchStream.foldBatch(data.take(50).toDF("grp", "user_id"), regs,
      "grp", "user_id", batchId = Some("b1"))
    // commit may land, but it writes zero register rows
    assert(regMap(regs.read(spark)) ===
      regMap(Sketches.registers(data.toDF("grp", "user_id"), "grp",
        "user_id")))
    val reopened = SketchStream.open(s"$root/regs")
    SketchStream.foldBatch(
      Seq(("g", 9999L)).toDF("grp", "user_id"), reopened, "grp",
      "user_id", batchId = Some("b2"))
    assert(reopened.latestVersion > v0)
    val merged = regMap(reopened.read(spark))
    val oneShot = regMap(Sketches.registers(
      (data :+ (("g", 9999L))).toDF("grp", "user_id"), "grp", "user_id"))
    assert(merged === oneShot, "reopen + fold == one-shot over the union")
  }
}
