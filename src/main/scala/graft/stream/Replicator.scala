package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.table.MergeTable

/** Continuous table→table replication over the change-feed streaming
  * source — the consumer side of the engine's CDC-out loop (a read
  * replica, a downstream training-data refresh): the replica converges to
  * the source by applying only O(changes) per trigger, never rescanning
  * the source table.
  *
  * Mechanics per micro-batch (a `(fromVersion, toVersion]` feed slice):
  *   - `upsert`/`delete` rows become a keyed `applyBatch` with
  *     `src_timestamp = _seq`, so last-write-wins across commits inside
  *     one slice resolves exactly like the source's own merge;
  *   - a `resync` marker (overwrite/truncate/rollback on the source)
  *     re-reads the source AT the marker version (time travel), merges the
  *     post-marker tail on top (LWW by `_seq`), and commits the result as
  *     ONE atomic `overwrite` on the replica — the reference's "full load,
  *     then CDC" phasing, collapsed into a single idempotent commit;
  *   - the deterministic per-trigger batch id dedups every write path, so
  *     checkpoint-restart replays commit nothing twice (exactly-once
  *     effects end to end).
  */
object Replicator {

  /** Apply one change-feed slice to the replica. `source` is only touched
    * on a resync marker (bootstrap re-read at the marker version).
    */
  def applyChanges(batch: DataFrame, source: MergeTable, replica: MergeTable,
      batchId: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    val payload = replica.schema.fields.map(f => col(f.name)).toSeq
    val cached = batch.cache()
    try {
      if (cached.isEmpty) return // maintenance-only slice: nothing to apply
      val marker = cached
        .agg(max(when(col("_change_type") === "resync", col("_seq"))).as("m"))
        .head.getAs[Any]("m")
      marker match {
        case null =>
          val shaped = cached
            .filter(col("_change_type") =!= "resync")
            .select(payload :+
              when(col("_change_type") === "delete", lit("delete"))
                .otherwise(lit("update")).as("operation") :+
              col("_seq").as("src_timestamp"): _*)
          replica.applyBatch(shaped, batchId)
        case m: Long =>
          // post-slice state = source@marker ⊎ post-marker tail, LWW by
          // _seq (tail is strictly newer; per-commit rows are key-unique,
          // so no ties) — committed as one atomic overwrite
          val base = source.read(spark, Some(m))
            .select(payload: _*)
            .withColumn("_cseq", lit(m))
            .withColumn("_ct", lit("upsert"))
          val tail = cached
            .filter(col("_change_type") =!= "resync" && col("_seq") > m)
            .select(payload :+ col("_seq").as("_cseq") :+
              col("_change_type").as("_ct"): _*)
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col(replica.keyCol)).orderBy(col("_cseq").desc)
          val state = base.unionByName(tail)
            .withColumn("_rn", row_number().over(w))
            .filter(col("_rn") === 1 && col("_ct") =!= "delete")
            .select(payload: _*)
          replica.overwrite(state, batchId)
      }
    } finally cached.unpersist()
  }

  /** Start continuous replication of the table at `sourceRoot` into
    * `replica`. The stream's offsets are source-table versions; restart
    * from the same checkpoint resumes where it left off.
    */
  def start(
      spark: SparkSession,
      sourceRoot: String,
      replica: MergeTable,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery = {
    val source = MergeTable.open(sourceRoot)
    spark.readStream.format("graft-changes").option("path", sourceRoot).load()
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyChanges(batch, source, replica, Some(s"cf-$id"))
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }
}
