package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.operators.Sketches
import graft.table.MergeTable

/** Streaming distinct-count monitoring on the portable-HLL register
  * algebra ([[Sketches]]) with the register STATE living in an engine
  * table — the third streaming state shape next to watermark-bounded
  * operator state ([[EventStreams]]) and persistent index tables
  * ([[CorpusStreams.dedupedIngest]]).
  *
  * Why this beats both alternatives for a "distinct users per slice,
  * forever" metric: Spark's own streaming dropDuplicates/approx state
  * is checkpoint-private (unreadable by ad-hoc queries, unbounded for
  * exact distinct) — here the state is ≤ |groups|·2^b rows of
  * (grp, bucket, max-ρ), queryable at any time with one value-set fold,
  * time-travelable, and replayable like any engine table.
  *
  * Correctness story: register merge is bucket-MAX — associative,
  * commutative, IDEMPOTENT — so beyond the epoch-keyed commit skip the
  * semantics themselves tolerate replay: re-applying any batch's
  * registers is a no-op by algebra, and trigger splits cannot change the
  * final state (spec-pinned both ways). Each commit upserts ONLY the
  * registers a batch actually raised (delta-sized, usually ≪ m), so the
  * per-trigger write cost tracks novelty, not the register-table size.
  */
object SketchStream {

  val RegSchema: StructType = StructType(Seq(
    StructField("reg_key", StringType),
    StructField("grp", StringType),
    StructField("bucket", LongType),
    StructField("mr", LongType)))

  def create(root: String): MergeTable =
    new MergeTable(root, RegSchema, keyCol = "reg_key",
      partitionCol = None).create()

  def open(root: String): MergeTable =
    new MergeTable(root, RegSchema, keyCol = "reg_key", partitionCol = None)

  /** One micro-batch's register fold into the table — also the unit a
    * checkpoint replay re-runs: compute the batch's registers, keep only
    * those strictly ABOVE the stored ones, upsert. Exposed for specs and
    * batch backfills; [[distinctIngest]] is the streaming face.
    */
  def foldBatch(batch: DataFrame, regs: MergeTable, groupCol: String,
      valueCol: String, b: Int = 10, batchId: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    val newRegs = Sketches.registers(
      batch.select(col(groupCol).cast("string").as("grp"), col(valueCol)),
      "grp", valueCol, b)
    val existing = regs.read(spark)
      .select(col("grp"), col("bucket"), col("mr").as("mr_old"))
    val delta = newRegs.join(existing, Seq("grp", "bucket"), "left")
      .filter(col("mr_old").isNull || col("mr") > col("mr_old"))
      .select(concat_ws("|", col("grp"), col("bucket")).as("reg_key"),
        col("grp"), col("bucket").cast("long").as("bucket"),
        col("mr").cast("long").as("mr"), // registers() emits int ρ
        when(col("mr_old").isNull, lit("insert")).otherwise(lit("update"))
          .as("operation"))
    regs.applyBatch(delta, batchId)
  }

  /** Continuous register maintenance: each micro-batch folds into the
    * register table under an epoch-keyed commit (exactly-once under
    * checkpoint recovery — and idempotent even without it, see above).
    */
  def distinctIngest(events: DataFrame, regs: MergeTable,
      groupCol: String, valueCol: String,
      b: Int = 10): DataStreamWriter[Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, epoch: Long) =>
      foldBatch(batch, regs, groupCol, valueCol, b, Some(s"hll-$epoch"))
    }

  /** Point-in-time distinct estimate per group from the stored registers
    * (pass `asOfVersion` via a time-travel read upstream for historical
    * estimates — registers are an engine table like any other).
    */
  def estimate(spark: SparkSession, regs: MergeTable,
      b: Int = 10): DataFrame =
    Sketches.estimateRegisters(
      regs.read(spark).select(col("grp"), col("bucket"), col("mr")),
      "grp", b)
}
