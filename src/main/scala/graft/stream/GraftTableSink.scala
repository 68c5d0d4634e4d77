package graft.stream

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graftshim.StreamShim
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

import graft.table.MergeTable

/** Native streaming SINK into a MergeTable — `writeStream.format("graft")`
  * closes the pipeline loop the source side opened (`format("graft-
  * changes")`): a stream writes keyed upserts/deletes straight into an
  * engine table with no foreachBatch plumbing.
  *
  *   df.writeStream.format("graft")
  *     .option("path", tableRoot)          // required: existing table root
  *     .option("defaultOperation", "update") // when no `operation` column
  *     .option("checkpointLocation", ...)
  *     .start()
  *
  * Row contract: the table's payload columns, plus optionally
  *   - `operation` (insert | update | delete) — per-row DML verb; absent →
  *     every row gets `defaultOperation` (update = upsert semantics,
  *     insert = plain keyed append);
  *   - `src_timestamp` / `transaction_id` — last-write-wins ordering
  *     within the batch, exactly as the CDC pipeline supplies them.
  *
  * Each micro-batch is ONE `applyBatch` call: O(batch) write + atomic
  * snapshot commit, and the epoch id is recorded as the batch id, so
  * checkpoint-recovery replays are no-ops (effective exactly-once — the
  * same guarantee the CDC pipeline's foreachBatch path has, now available
  * to any writeStream).
  */
final class GraftTableSink(root: String, defaultOp: String, scope: String)
  extends Sink {
  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the micro-batch frame is streaming-tagged; re-wrap as batch first
    val df = StreamShim.asBatch(data)
    val withOp =
      if (df.columns.contains("operation")) df
      else df.withColumn("operation", lit(defaultOp))
    // the recorded id is scoped by the QUERY (checkpoint), not just the
    // epoch: epoch numbers restart at 0 for every new checkpoint, and an
    // unscoped "sink-0" would make a second stream's first batch look
    // like a replay and be silently dropped
    MergeTable.open(root).applyBatch(withOp, Some(s"sink-$scope-$batchId"))
  }
  override def toString: String = s"GraftTableSink[$root]"
}

/** `format("graft")` registration (DataSourceRegister service file). */
final class GraftTableSinkProvider extends StreamSinkProvider with DataSourceRegister {
  override def shortName(): String = "graft"

  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    val root = parameters.getOrElse("path",
      throw new IllegalArgumentException("option 'path' (table root) is required"))
    val op = parameters.getOrElse("defaultOperation", "update")
    require(Seq("insert", "update").contains(op),
      s"defaultOperation must be insert|update, got '$op'")
    require(partitionColumns.isEmpty,
      "partitionBy is not supported: the table's own partition spec applies")
    // Complete mode re-emits the FULL result every batch; applying it as
    // upserts would never delete keys that left the result — reject it
    require(outputMode != OutputMode.Complete(),
      "OutputMode.Complete is not supported: keys leaving the result set " +
        "would never be deleted; use update/append with per-row operations")
    // replay scope = the checkpoint identity: same checkpoint restarts
    // replay the same (scope, epoch) ids and are skipped; a fresh
    // checkpoint (or a second concurrent stream) gets a fresh scope and
    // its batches apply. No checkpoint option → per-instance scope (safe
    // direction: reapplying is idempotent per key, dropping is not).
    val scope = parameters.find(_._1.equalsIgnoreCase("checkpointLocation"))
      .map(kv => java.util.UUID.nameUUIDFromBytes(
        kv._2.getBytes("UTF-8")).toString.take(8))
      .getOrElse(java.util.UUID.randomUUID().toString.take(8))
    new GraftTableSink(root, op, scope)
  }
}
