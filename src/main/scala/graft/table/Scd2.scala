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

  def applyBatch(current: DataFrame, updates: DataFrame, keyCol: String,
      attrCols: Seq[String], tsCol: String,
      seqCol: Option[String] = None): DataFrame = {
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
    closed.union(untouched).union(closedOut).union(opened)
  }
}
