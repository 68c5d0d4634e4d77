package graft.table

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregate over a [[MergeTable]] —
  * the downstream half of the change-feed contract: a grouped
  * count(+sum) view that is refreshed from `changesBetween` deltas
  * instead of recomputed from the full table.
  *
  * Maintenance algebra (the classic view-maintenance delta rule):
  * for the keys touched in (v0, v1],
  *
  *   view(v1) = view(v0) − agg(pre-images of touched keys at v0)
  *                       + agg(post-images of touched keys at v1)
  *
  * Pre-images come from TIME TRAVEL at v0 restricted to the touched keys
  * (a broadcast semi-join plus a key-range pushdown, so the old-image
  * read prunes to the files that can hold those keys — O(touched slice),
  * not O(table)); post-images are the feed's last-write-wins row per key.
  * Replacement commits (overwrite / truncate / rollback) surface in the
  * feed as `resync` markers → the view falls back to one full recompute,
  * same contract as any Iceberg-style incremental consumer.
  *
  * State is a parquet directory per refreshed version plus an atomically
  * renamed `_version` pointer — readers never observe a half-written
  * view, mirroring the table's own pointer-swap publication.
  *
  * At 100 TB: each refresh costs O(batch) feed I/O + O(touched files)
  * pre-image I/O + a view-sized merge — the view (group cardinality) is
  * orders of magnitude smaller than the fact table, which is the point
  * of maintaining it incrementally.
  */
final class IncrementalView(
    val table: MergeTable,
    val root: String,
    val groupCols: Seq[String],
    val sumCol: Option[String] = None) {

  require(groupCols.nonEmpty, "at least one group column")

  private val rootPath: Path = Paths.get(root)
  private val ptrPath: Path = rootPath.resolve("_version")
  private def viewDir(v: Long): Path = rootPath.resolve(s"view-v$v")

  private val nRows = "n_rows"
  private val sumName = sumCol.map(c => s"sum_$c")

  /** Table version this view currently reflects, if materialized. */
  def refreshedVersion: Option[Long] =
    if (Files.exists(ptrPath)) Some(Files.readString(ptrPath).trim.toLong)
    else None

  /** The materialized view (groupCols, n_rows[, sum_<col>]). */
  def read(spark: SparkSession): DataFrame = {
    val v = refreshedVersion.getOrElse(
      throw new IllegalStateException(s"view at $root never refreshed"))
    spark.read.parquet(viewDir(v).toString)
  }

  private def aggOf(rows: DataFrame, negate: Boolean): DataFrame = {
    val sign = if (negate) lit(-1L) else lit(1L)
    val aggs = (sign * count(lit(1))).as(nRows) +:
      sumCol.map(c => (sign.cast("double") * sum(col(c))).as(sumName.get)).toSeq
    rows.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  private def fullView(spark: SparkSession): DataFrame =
    aggOf(table.read(spark), negate = false)

  private def commit(df: DataFrame, v: Long): Unit = {
    Files.createDirectories(rootPath)
    val tmp = rootPath.resolve(s".tmp-view-v$v-${System.nanoTime()}")
    df.write.mode("overwrite").parquet(tmp.toString)
    val dest = viewDir(v)
    Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE)
    val tmpPtr = rootPath.resolve(s".tmp-ptr-${System.nanoTime()}")
    Files.writeString(tmpPtr, v.toString)
    Files.move(tmpPtr, ptrPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    // GC superseded view snapshots (pointer already swapped)
    val keep = dest.getFileName.toString
    val entries = {
      val s = Files.list(rootPath)
      try { import scala.jdk.CollectionConverters._; s.iterator().asScala.toList }
      finally s.close()
    }
    entries.foreach { p =>
      val n = p.getFileName.toString
      if ((n.startsWith("view-v") && n != keep) || n.startsWith(".tmp-view")) {
        Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))
      }
    }
  }

  /** Bring the view up to the table's latest version. Returns
    * (fromVersion, toVersion) where fromVersion = -1 marks a full
    * (re)compute. No-op if already current.
    */
  def refresh(spark: SparkSession): (Long, Long) = {
    val v1 = table.latestVersion
    require(v1 >= 0, "table has no committed snapshot")
    val v0 = refreshedVersion.getOrElse(-1L)
    if (v0 == v1) return (v0, v1)

    val incremental: Option[DataFrame] =
      if (v0 < 0) None
      else {
        val ch = scala.util.Try(table.changesBetween(spark, v0, v1)).toOption
        ch.filter(_.filter(col("_change_type") === "resync").head(1).isEmpty)
          .map { feed =>
            val key = table.keyCol
            val changedKeys = feed.select(col(key)).distinct()
            val Array(lo, hi) = changedKeys
              .agg(min(col(key)), max(col(key))).head().toSeq.toArray
            // pre-images: time travel + key-range pushdown + broadcast semi
            val pre = table.read(spark, Some(v0))
              .filter(col(key).between(lit(lo), lit(hi)))
              .join(broadcast(changedKeys), Seq(key), "left_semi")
            // post-images: LWW row per key, surviving keys only
            val w = Window.partitionBy(col(key)).orderBy(col("_seq").desc)
            val post = feed.withColumn("_rn", row_number().over(w))
              .filter(col("_rn") === 1 && col("_change_type") === "upsert")
              .drop("_rn", "_seq", "_change_type")
            read(spark)
              .unionByName(aggOf(post, negate = false))
              .unionByName(aggOf(pre, negate = true))
          }
      }

    val merged = incremental match {
      case Some(parts) =>
        val aggs = sum(col(nRows)).as(nRows) +:
          sumName.map(s => sum(col(s)).as(s)).toSeq
        parts.groupBy(groupCols.map(col): _*)
          .agg(aggs.head, aggs.tail: _*)
          .filter(col(nRows) =!= 0)
      case None => fullView(spark)
    }
    commit(merged, v1)
    (if (incremental.isDefined) v0 else -1L, v1)
  }
}
