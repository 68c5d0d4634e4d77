package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.table.MergeTable

/** Incremental near-duplicate deduplication against a PERSISTENT index —
  * the continuous-crawl-ingest operation: each arriving batch is deduped
  * within itself (exact, PPJoin-backed) and against everything ever
  * accepted (MinHash-LSH candidates + exact-Jaccard verification), then
  * the accepted documents' signatures join the index. Cost per batch is
  * O(batch + candidate pairs) — the full corpus is NEVER re-scanned or
  * re-paired, which is the only shape that works when the corpus is
  * 100 TB and the daily delta is 1%.
  *
  * The index is two engine tables, so it inherits the table layer's
  * guarantees wholesale: atomic commits, batchId-idempotent replay
  * (restart-safe under streaming checkpoints), time travel (the index AS
  * OF any ingest point), and the change feed:
  *   - `sigs`  — doc_id → sorted distinct shingle-hash array (the exact
  *     verification side; stores hashes, not text: ~8 bytes/shingle)
  *   - `bands` — (entry_id, doc_id, band, bkey): the pre-exploded LSH
  *     bucket rows the delta equi-joins against
  *
  * Dedup contract: a new document is dropped iff (a) it is a non-minimum
  * member of a within-batch near-dup cluster (exact, connected-component
  * min-id rule — same as [[Dedup.survivors]]), or (b) exact Jaccard ≥
  * threshold with an INDEXED document among its LSH candidates. (b)'s
  * candidate generation carries q27's banding recall (pairs far above
  * threshold are near-certain; the standard LSH trade) while the
  * verification keeps every reported drop exact — no false drops, ever.
  *
  * 100 TB notes: the delta join shuffles (band, bkey) keys of the BATCH
  * against the bands table; bucket the bands table's parquet by `bkey`
  * (ScalePatterns bucketed layout) to make that a co-located join with
  * zero index-side shuffle. Index size is O(corpus survivors), ~k+1 longs
  * per doc; `expireSnapshots` bounds its manifest history like any table.
  */
final class IncrementalDedup private (
    val root: String,
    val sigs: MergeTable,
    val bands: MergeTable,
    val n: Int,
    val k: Int,
    val nBands: Int) {

  /** Dedup `batch` (must carry `doc_id` and `text`) within itself and
    * against the index; append the survivors' signatures/buckets to the
    * index; return the surviving rows of `batch` unchanged.
    *
    * `batchId` makes the INDEX update idempotent (both member tables
    * replay-skip a seen id — a crash between the two appends replays to
    * exactly-once state). The returned frame is deterministic for a given
    * (index state, batch), so replays also return identical survivors.
    */
  def dedupeBatch(batch: DataFrame, threshold: Double = 0.8,
      batchId: Option[String] = None): DataFrame = {
    val spark = batch.sparkSession

    // (a) within-batch: exact clustering, min-id survivor
    val within = Dedup.survivors(batch, n, threshold)

    // shingle index of the batch survivors: built once, read by the
    // bucket build, the verification join, and the index append
    val sh = Dedup.shingleArrays(within, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // (b) LSH candidates vs the index, then exact verification against
    // the STORED signatures — the original corpus text is never touched
    val newBuckets = Dedup.minhashBuckets(sh, k, nBands)
    val oldBuckets = bands.read(spark)
      .select(col("doc_id").as("old_id"), col("band"), col("bkey"))
    // self-pairs excluded: doc_id is the unique ingest id, so an indexed
    // entry with the SAME id is this batch being replayed (checkpoint
    // recovery), not a duplicate — with them excluded, a replay returns
    // the identical survivor set instead of dropping everything against
    // its own first attempt. A re-crawled duplicate arrives under a new
    // id and still drops via the original entry.
    val cands = newBuckets.join(oldBuckets, Seq("band", "bkey"))
      .filter(col("old_id") =!= col("doc_id"))
      .select(col("doc_id"), col("old_id")).distinct()
    val oldSh = sigs.read(spark)
      .select(col("doc_id").as("old_id"), col("sh").as("old_sh"))
    val dropped = cands
      .join(sh, "doc_id")
      .join(oldSh, "old_id")
      .withColumn("common", size(array_intersect(col("sh"), col("old_sh"))))
      .withColumn("jaccard", TextAnalysis.quant4(col("common").cast("double")
        / (size(col("sh")) + size(col("old_sh")) - col("common"))))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_id")).distinct()

    val acceptedSh = sh.join(dropped, Seq("doc_id"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // sigs first, bands second: a sig without bands is inert (never a
      // candidate), so a crash between the appends leaves the index
      // consistent and the batchId replay completes it
      sigs.appendAll(acceptedSh.select(col("doc_id"), col("sh")),
        batchId.map(_ + ":sigs"))
      bands.appendAll(
        Dedup.minhashBuckets(acceptedSh, k, nBands)
          .select((col("doc_id") * nBands + col("band")).as("entry_id"),
            col("doc_id"), col("band"), col("bkey")),
        batchId.map(_ + ":bands"))
      // eager checkpoint: the caller's actions must not re-run the
      // clustering/verification DAG after the internal caches release
      val out = within.join(dropped, Seq("doc_id"), "left_anti")
      PlanCapture.record(
        "q104_incremental_dedup (delta-vs-index pass, pre-checkpoint)", out)
      out.localCheckpoint(true)
    } finally {
      acceptedSh.unpersist(blocking = false)
      sh.unpersist(blocking = false)
    }
  }

  /** Indexed corpus size (sigs rows) — monitoring/spec hook. */
  def indexedDocs(spark: SparkSession): Long = sigs.read(spark).count()
}

object IncrementalDedup {
  private val SigSchema =
    StructType.fromDDL("doc_id BIGINT, sh ARRAY<BIGINT>")
  private val BandSchema =
    StructType.fromDDL("entry_id BIGINT, doc_id BIGINT, band INT, bkey BIGINT")

  /** Create a fresh index at `root` (two engine tables + a meta file
    * pinning the shingle/signature parameters — mixed-parameter probes
    * would silently miss everything, so the params live with the data).
    */
  def create(root: String, n: Int = 3, k: Int = 16, bands: Int = 4): IncrementalDedup = {
    require(k % bands == 0, "k must divide into bands")
    Files.createDirectories(Paths.get(root))
    Files.writeString(Paths.get(root, "_dedup.meta"), s"n\t$n\nk\t$k\nbands\t$bands\n")
    val sigs = new MergeTable(s"$root/sigs", SigSchema, keyCol = "doc_id",
      partitionCol = None).create()
    val bandTbl = new MergeTable(s"$root/bands", BandSchema, keyCol = "entry_id",
      partitionCol = None).create()
    new IncrementalDedup(root, sigs, bandTbl, n, k, bands)
  }

  /** Open an existing index: parameters come from `_dedup.meta`, table
    * shapes from each table's own persisted metadata.
    */
  def open(root: String): IncrementalDedup = {
    val meta = Paths.get(root, "_dedup.meta")
    require(Files.exists(meta), s"no dedup index at $root")
    val kv = Files.readAllLines(meta).toArray(Array.empty[String])
      .flatMap(_.split("\t", 2) match {
        case Array(a, b) => Some(a -> b)
        case _           => None
      }).toMap
    new IncrementalDedup(root, MergeTable.open(s"$root/sigs"),
      MergeTable.open(s"$root/bands"), kv("n").toInt, kv("k").toInt,
      kv("bands").toInt)
  }
}
