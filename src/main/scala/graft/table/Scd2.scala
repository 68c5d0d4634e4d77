package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 maintenance (q215) — the dimension-
  * history pattern every warehouse keeps next to its fact tables: instead
  * of overwriting a changed attribute (losing the past) or appending raw
  * events (losing the "as of" read), each key holds a CHAIN of validity
  * intervals; the open row (valid_to null) is the present, closed rows
  * answer any point-in-time join. The merge-table layer gives version
  * time travel of the whole TABLE; SCD2 is the complementary per-ROW
  * history that survives compaction and reads as a plain join.
  *
  * Batch semantics (one call = one CDC micro-batch): latest update per
  * key wins within the batch — ts desc, ties broken by `seqCol` desc
  * when the caller supplies a stable sequence (the CDC `_seq` the table
  * layer stamps is the natural choice), else by the tracked attribute
  * VALUES ascending. Both tiebreaks are functions of row CONTENT, never
  * of physical row order (`monotonically_increasing_id` would pick a
  * different winner under repartition); a changed
  * tracked attribute closes the open row at the update ts and opens a
  * new one; an update equal on every tracked attribute is a NO-OP (no
  * churn rows — the detail naive implementations get wrong and that
  * doubles table growth); unknown keys insert their first open row;
  * closed history passes through untouched.
  *
  * Scale shape: one per-key window over the update batch (batch-sized,
  * not table-sized), one full-outer equi-join of OPEN rows against the
  * batch on the key, row-local branch logic, and a union with the
  * untouched closed partition — O(open + batch), never O(history).
  */
object Scd2 {

  /** The four SCD2 slices of one (current, updates) application —
    * shared by [[applyBatch]] (full next state) and [[deltaBatch]]
    * (changed rows only, for keyed-table application).
    */
  private def slices(current: DataFrame, updates: DataFrame,
      keyCol: String, attrCols: Seq[String], tsCol: String,
      seqCol: Option[String])
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val outCols = (keyCol +: attrCols) ++
      Seq("valid_from", "valid_to", "is_current")
    val tiebreak = seqCol.map(s => Seq(col(s).desc))
      .getOrElse(attrCols.map(col(_).asc))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc +: tiebreak: _*)
    val latest = updates.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col(keyCol).as("_k") +:
        attrCols.map(a => col(a).as(s"_u_$a")) :+
        col(tsCol).as("_uts"): _*)
    val open = current.filter(col("is_current"))
    val closed = current.filter(!col("is_current"))
      .select(outCols.map(col): _*)
    val joined = open.join(latest, col(keyCol) === col("_k"), "full_outer")
    val changed = attrCols.map(a => !(col(a) <=> col(s"_u_$a")))
      .reduce(_ || _)
    // untouched: open rows with no update, or a no-op update
    val untouched = joined
      .filter(col("_k").isNull || (col(keyCol).isNotNull && !changed))
      .select(outCols.map(col): _*)
    // close-out: the superseded version of a genuinely changed key
    val closedOut = joined
      .filter(col(keyCol).isNotNull && col("_k").isNotNull && changed)
      .select((col(keyCol) +: attrCols.map(col)) ++
        Seq(col("valid_from"), col("_uts").as("valid_to"),
          lit(false).as("is_current")): _*)
    // new open rows: changed keys and brand-new keys
    val opened = joined
      .filter(col("_k").isNotNull && (col(keyCol).isNull || changed))
      .select((col("_k").as(keyCol) +:
        attrCols.map(a => col(s"_u_$a").as(a))) ++
        Seq(col("_uts").as("valid_from"),
          lit(null).cast(open.schema("valid_to").dataType).as("valid_to"),
          lit(true).as("is_current")): _*)
    (closed, untouched, closedOut, opened)
  }

  def applyBatch(current: DataFrame, updates: DataFrame, keyCol: String,
      attrCols: Seq[String], tsCol: String,
      seqCol: Option[String] = None): DataFrame = {
    val (closed, untouched, closedOut, opened) =
      slices(current, updates, keyCol, attrCols, tsCol, seqCol)
    closed.union(untouched).union(closedOut).union(opened)
  }

  /** The CHANGED rows only — close-outs (superseded versions, now with
    * valid_to set) plus newly opened rows. What a KEYED table needs to
    * upsert: [[applyBatch]] materializes the whole next state (O(open +
    * batch) rows out), which as a table write is an O(table) rewrite
    * per batch; the delta keeps the table-layer commit O(changed).
    */
  def deltaBatch(current: DataFrame, updates: DataFrame, keyCol: String,
      attrCols: Seq[String], tsCol: String,
      seqCol: Option[String] = None): DataFrame = {
    val (_, _, closedOut, opened) =
      slices(current, updates, keyCol, attrCols, tsCol, seqCol)
    closedOut.union(opened)
  }

  /** Continuous SCD2 maintenance of a dimension stored as a keyed
    * engine table — the streaming face of [[applyBatch]], with the
    * table-layer cost model a dimension actually wants: per micro-batch
    * the update stream joins the CURRENT open rows (O(open + batch)
    * compute), and only the CHANGED interval rows commit
    * ([[deltaBatch]] → one transactional upsert, O(changed) write —
    * never a table rewrite).
    *
    * Contract: `dim` is keyed by a synthetic `row_id` =
    * `<key>:<valid_from>` (each validity interval is one immutable-key
    * row: a close-out UPDATES its interval's row with valid_to, a new
    * interval INSERTS a fresh row_id) with payload
    * (keyCol, attrs…, valid_from, valid_to, is_current). Exactly-once
    * under checkpoint recovery twice over: the commit is epoch-keyed
    * (`scd2-<epoch>` batch id), and even an unkeyed replay would no-op
    * because re-applying a batch against the post-apply state finds
    * every update equal on the tracked attributes.
    */
  /** The synthetic interval key `<key>:<valid_from>` — ONE canonical
    * derivation (Spark's timestamp/date → string cast), used by
    * [[scd2Ingest]] and required of any bootstrap rows the caller
    * seeds: a hand-formatted variant (e.g. JDBC's trailing `.0`) would
    * silently fork an interval's identity and leave the superseded row
    * open forever.
    */
  def rowId(keyCol: String): org.apache.spark.sql.Column =
    concat_ws(":", col(keyCol), col("valid_from").cast("string"))

  /** Seed an open-rows side table from an existing dimension (attach-time
    * bootstrap for [[scd2Ingest]]'s `openSide` option): the side table
    * must hold EXACTLY the dimension's open rows before the first epoch
    * runs, or the first delta would re-open already-closed intervals.
    * Epoch-keyed so an interrupted attach replays as a no-op.
    */
  def seedOpenSide(spark: org.apache.spark.sql.SparkSession,
      dim: MergeTable, side: MergeTable): Unit =
    side.appendAll(
      dim.read(spark).filter(col("is_current"))
        .select(side.schema.fieldNames.map(col(_)): _*),
      Some("scd2open-seed"))

  /** One epoch of [[scd2Ingest]] — exposed for tests that inject a crash
    * between the two table commits. Commit order is load-bearing: `dim`
    * commits FIRST, so a crash between the dim and side commits replays
    * against the STALE side state and recomputes the identical delta
    * (the dim commit then no-ops on its epoch key, the side commit
    * completes) — whereas side-first would make the replay's delta empty
    * and the dim commit would never happen.
    */
  private[graft] def scd2EpochApply(b: DataFrame, epoch: Long,
      dim: MergeTable, keyCol: String, attrCols: Seq[String], tsCol: String,
      seqCol: Option[String], openSide: Option[MergeTable]): Unit = {
    val spark = b.sparkSession
    openSide match {
      case None =>
        val current = dim.read(spark).drop("row_id")
        val delta = deltaBatch(current, b, keyCol, attrCols, tsCol, seqCol)
          .withColumn("row_id", rowId(keyCol))
          .withColumn("operation", lit("update"))
        dim.applyBatch(delta, Some(s"scd2-$epoch"))
      case Some(side) =>
        // O(open) read: the side table CONTAINS only open rows (one per
        // live key, LWW-upserted below), so `current` never scans the
        // dimension's closed history. A side table rather than
        // is_current partitioning: under merge-on-read a close-out's
        // superseding row lands in the OTHER partition, so a pruned
        // open-partition scan would resurrect the stale version.
        val current = side.read(spark)
        val sc = spark.sparkContext
        val before = sc.getPersistentRDDs.keySet.toSet
        // the O(changed) delta feeds TWO commits — checkpoint it so the
        // open-rows join runs once, then release the blocks
        val delta = deltaBatch(current, b, keyCol, attrCols, tsCol, seqCol)
          .withColumn("row_id", rowId(keyCol))
          .withColumn("operation", lit("update"))
          .localCheckpoint(eager = true)
        val ids = sc.getPersistentRDDs.keySet.toSet -- before
        try {
          dim.applyBatch(delta, Some(s"scd2-$epoch"))
          // the opened slice IS the side upsert: one open row per
          // changed/new key replaces (LWW on keyCol) the superseded one
          side.applyBatch(delta.filter(col("is_current")).drop("row_id"),
            Some(s"scd2open-$epoch"))
        } finally ids.foreach(id =>
          sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    }
  }

  /** `openSide` (gen-13): a second keyed engine table (key = `keyCol`,
    * schema = dim minus row_id) holding exactly the OPEN rows, making the
    * per-epoch READ O(open) as well — without it every micro-batch scans
    * the dimension's full history even though only open rows join. Seed
    * it with [[seedOpenSide]] when attaching to a non-empty dimension.
    * Crash safety between the two epoch-keyed commits: see
    * [[scd2EpochApply]].
    */
  def scd2Ingest(updates: DataFrame, dim: MergeTable, keyCol: String,
      attrCols: Seq[String], tsCol: String,
      seqCol: Option[String] = None,
      openSide: Option[MergeTable] = None)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    updates.writeStream.foreachBatch { (b: DataFrame, epoch: Long) =>
      scd2EpochApply(b, epoch, dim, keyCol, attrCols, tsCol, seqCol, openSide)
    }
}
