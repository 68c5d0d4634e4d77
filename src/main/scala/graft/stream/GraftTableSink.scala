package graft.stream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graftshim.StreamShim
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructField

import graft.table.MergeTable

/** Native streaming SINK into a MergeTable — `writeStream.format("graft")`
  * closes the pipeline loop the source side opened (`format("graft-
  * changes")`): a stream writes keyed upserts/deletes straight into an
  * engine table with no foreachBatch plumbing.
  *
  *   df.writeStream.format("graft")
  *     .option("path", tableRoot)          // required: existing table root
  *     .option("defaultOperation", "update") // when no `operation` column
  *     .option("evolveSchema", "true")     // batch columns beyond the table
  *                                         // schema evolve it (add-column)
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
final class GraftTableSink(root: String, defaultOp: String, scope: String,
    evolve: Boolean) extends Sink {

  // columns the sink consumes itself; never table payload
  private val SinkCols = Set("operation", "src_timestamp", "transaction_id")

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the micro-batch frame is streaming-tagged; re-wrap as batch first
    val df = StreamShim.asBatch(data)
    val withOp =
      if (df.columns.contains("operation")) df
      else df.withColumn("operation", lit(defaultOp))
    // re-open per batch: evolution persists via table metadata, so a
    // handle opened after addColumn always sees the current schema
    var table = MergeTable.open(root)
    val known = table.schema.fieldNames.toSet
    if (evolve) {
      // SCHEMA DRIFT through the sink, batch-sized detection like the
      // foreachBatch pipeline: stream columns beyond the table schema
      // become table columns (metadata-only add) instead of an analysis
      // error. Deterministic name order; added columns must be nullable.
      withOp.schema.fields.toSeq
        .filter(f => !known(f.name) && !SinkCols(f.name))
        .sortBy(_.name)
        .foreach(f => table = table.addColumn(
          StructField(f.name, f.dataType, nullable = true)))
    }
    // null-fill table payload columns the stream doesn't carry: an
    // evolved table fed by a restarted non-drifted stream (or a second
    // writer that never saw the new field) must keep applying
    val present = withOp.columns.toSet
    val filled = table.schema.fields.toSeq
      .filter(f => !present(f.name))
      .foldLeft(withOp)((d, f) => d.withColumn(f.name, lit(null).cast(f.dataType)))
    // the recorded id is scoped by the QUERY (checkpoint), not just the
    // epoch: epoch numbers restart at 0 for every new checkpoint, and an
    // unscoped "sink-0" would make a second stream's first batch look
    // like a replay and be silently dropped
    table.applyBatch(filled, Some(s"sink-$scope-$batchId"))
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
    val evolve = parameters.find(_._1.equalsIgnoreCase("evolveSchema"))
      .exists(_._2.trim.equalsIgnoreCase("true"))
    // Replay scope = the checkpoint IDENTITY, not the checkpoint path: a
    // random marker persisted inside the checkpoint directory. Same
    // checkpoint restarts reuse the marker, so replayed (scope, epoch)
    // ids are skipped; wiping the checkpoint dir (the standard reprocess
    // flow) or pointing a NEW query at a recycled path removes/renews the
    // marker, so epochs restarting at 0 APPLY instead of being silently
    // dropped as replays of the previous incarnation. A path hash would
    // get that wrong in both directions. No checkpoint option →
    // per-instance scope (safe direction: reapplying is idempotent per
    // key, dropping is not).
    val scope = parameters.find(_._1.equalsIgnoreCase("checkpointLocation"))
      .map(kv => checkpointScope(sqlContext, kv._2))
      .getOrElse(java.util.UUID.randomUUID().toString.take(8))
    new GraftTableSink(root, op, scope, evolve)
  }

  /** Read-or-create the scope marker at `<checkpoint>/graft-sink-scope`
    * through the Hadoop FS API (checkpoints may live on any FS). Created
    * with overwrite=false so a racing creator loses cleanly and re-reads.
    */
  private def checkpointScope(sqlContext: SQLContext, checkpoint: String): String = {
    val dir = new Path(checkpoint)
    val fs = dir.getFileSystem(
      sqlContext.sparkSession.sessionState.newHadoopConf())
    val marker = new Path(dir, "graft-sink-scope")
    def read(): String = {
      val in = fs.open(marker)
      try {
        val buf = new Array[Byte](64)
        val n = math.max(0, in.read(buf))
        new String(buf, 0, n, "UTF-8").trim
      } finally in.close()
    }
    if (fs.exists(marker)) read()
    else {
      fs.mkdirs(dir)
      val fresh = java.util.UUID.randomUUID().toString.take(8)
      try {
        val out = fs.create(marker, false)
        try out.write(fresh.getBytes("UTF-8")) finally out.close()
        fresh
      } catch { case _: java.io.IOException => read() }
    }
  }
}
