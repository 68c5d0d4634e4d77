package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.table.MergeTable

/** Incremental LEAKAGE-SAFE split assignment against a persistent
  * registry — [[CorpusOps.leakSafeSplit]] for a corpus that GROWS: when
  * documents arrive continuously, a batch-at-a-time split must stay
  * cluster-consistent across batches, or next month's re-crawl of a
  * training page lands in the eval split and the leak is back. Each
  * arriving batch is clustered within itself (exact connected
  * components, [[Dedup.nearDupClusters]]), matched against everything
  * ever assigned (MinHash-LSH candidates + exact-Jaccard verification —
  * [[IncrementalDedup]]'s machinery), and every cluster either INHERITS
  * the registered split of its minimum matched indexed document or,
  * when nothing matches, hashes its representative through
  * [[CorpusOps.splitExpr]]. Cost per batch is O(batch + candidates);
  * the corpus is never re-paired.
  *
  * State is three engine tables (atomic commits, batchId-idempotent
  * replay, time travel): `sigs`/`bands` index EVERY assigned document
  * (unlike [[IncrementalDedup]], which indexes survivors only — here
  * near-dups are exactly the documents that must keep pulling their
  * future kin into the same split), and `registry` holds the
  * authoritative (doc_id, split) assignment.
  *
  * Consistency contract:
  *   - Within a batch, cluster members share a split (exact).
  *   - A new document exact-verified at ≥ threshold against an indexed
  *     one gets that document's split (LSH-recall-bounded, like every
  *     LSH system; the standard trade — and [[CorpusOps.splitLeakage]]
  *     is the independent auditor that certifies the outcome).
  *   - Transitively: C matching B matching A yields A's split, because
  *     B carries A's split in the registry.
  *   - A cluster matching two indexed docs with DIFFERENT splits (the
  *     graph grew a bridge between previously separate components)
  *     deterministically takes the minimum matched id's split; such
  *     bridges are precisely what [[CorpusOps.splitLeakage]] detects
  *     post-hoc.
  *
  * Replay: appends run registry → sigs → bands, so a crash between any
  * two replays into the SAME assignment (candidate generation reads
  * `bands`, still pre-batch until the final append; batch-mate entries
  * visible after full completion are harmless — any exact-verified
  * batch-mate is a cluster-mate whose registered split equals the one
  * being recomputed). The returned (doc_id, rep, split) is
  * replay-deterministic; `anchor` may resolve to a cluster-mate on
  * replay (same split by the argument above).
  */
final class IncrementalSplit private (
    val root: String,
    val sigs: MergeTable,
    val bands: MergeTable,
    val registry: MergeTable,
    val n: Int,
    val k: Int,
    val nBands: Int,
    val trainPct: Int,
    val valPct: Int) {

  /** Assign splits to `batch` (must carry `doc_id` and `text`),
    * cluster-consistently with everything previously assigned; persist
    * the assignments and the batch's index entries. Returns
    * (doc_id, rep, anchor, split) — `rep` the within-batch cluster
    * representative, `anchor` the minimum matched indexed doc (−1 when
    * the cluster is fresh).
    */
  def assignBatch(batch: DataFrame, threshold: Double = 0.8,
      batchId: Option[String] = None): DataFrame = {
    val spark = batch.sparkSession
    val clusters = Dedup.nearDupClusters(batch, n, threshold)
    val withRep = batch.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster"), col("doc_id")).as("rep"))

    val sh = Dedup.shingleArrays(batch, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val newBuckets = Dedup.minhashBuckets(sh, k, nBands)
      val oldBuckets = bands.read(spark)
        .select(col("doc_id").as("old_id"), col("band"), col("bkey"))
      // same-id pairs are this batch's own replay, not a match
      val cands = newBuckets.join(oldBuckets, Seq("band", "bkey"))
        .filter(col("old_id") =!= col("doc_id"))
        .select(col("doc_id"), col("old_id")).distinct()
      val oldSh = sigs.read(spark)
        .select(col("doc_id").as("old_id"), col("sh").as("old_sh"))
      val matched = cands
        .join(sh, "doc_id")
        .join(oldSh, "old_id")
        .withColumn("common", size(array_intersect(col("sh"), col("old_sh"))))
        .withColumn("jaccard", TextAnalysis.quant4(col("common").cast("double")
          / (size(col("sh")) + size(col("old_sh")) - col("common"))))
        .filter(col("jaccard") >= threshold)
        .groupBy(col("doc_id")).agg(min(col("old_id")).as("m"))

      // cluster-level anchor: the minimum matched indexed doc over ALL
      // members (min ignores nulls; all-null groups yield null = fresh)
      val anchors = withRep.join(matched, Seq("doc_id"), "left")
        .groupBy(col("rep")).agg(min(col("m")).as("anchor"))
      val reg = registry.read(spark)
        .select(col("doc_id").as("anchor"), col("split").as("inh_split"))
      val assigned0 = withRep
        .join(anchors, "rep")
        .join(reg, Seq("anchor"), "left")
        .select(col("doc_id"), col("rep"),
          coalesce(col("anchor"), lit(-1L)).as("anchor"),
          coalesce(col("inh_split"),
            CorpusOps.splitExpr(col("rep"), trainPct, valPct)).as("split"))
      PlanCapture.record(
        "q116_incremental_split (assign pass, pre-checkpoint)", assigned0)
      // eager checkpoint: three appends and the caller must not re-run
      // the clustering/matching DAG per consumer
      val assigned = assigned0.localCheckpoint(true)

      registry.appendAll(assigned.select(col("doc_id"), col("split")),
        batchId.map(_ + ":reg"))
      sigs.appendAll(sh.select(col("doc_id"), col("sh")),
        batchId.map(_ + ":sigs"))
      bands.appendAll(
        Dedup.minhashBuckets(sh, k, nBands)
          .select((col("doc_id") * nBands + col("band")).as("entry_id"),
            col("doc_id"), col("band"), col("bkey")),
        batchId.map(_ + ":bands"))
      assigned
    } finally sh.unpersist(blocking = false)
  }

  /** Registered assignments so far — monitoring/spec hook. */
  def assignments(spark: SparkSession): DataFrame = registry.read(spark)
}

object IncrementalSplit {
  private val SigSchema =
    StructType.fromDDL("doc_id BIGINT, sh ARRAY<BIGINT>")
  private val BandSchema =
    StructType.fromDDL("entry_id BIGINT, doc_id BIGINT, band INT, bkey BIGINT")
  private val RegSchema =
    StructType.fromDDL("doc_id BIGINT, split STRING")

  /** Create a fresh registry at `root` (three engine tables + a meta
    * file pinning the shingle/signature/split parameters — assignments
    * made under different percentages must not silently mix).
    */
  def create(root: String, n: Int = 3, k: Int = 16, bands: Int = 4,
      trainPct: Int = 80, valPct: Int = 10): IncrementalSplit = {
    require(k % bands == 0, "k must divide into bands")
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100)
    Files.createDirectories(Paths.get(root))
    Files.writeString(Paths.get(root, "_split.meta"),
      s"n\t$n\nk\t$k\nbands\t$bands\ntrain\t$trainPct\nval\t$valPct\n")
    val sigs = new MergeTable(s"$root/sigs", SigSchema, keyCol = "doc_id",
      partitionCol = None).create()
    val bandTbl = new MergeTable(s"$root/bands", BandSchema,
      keyCol = "entry_id", partitionCol = None).create()
    val reg = new MergeTable(s"$root/registry", RegSchema,
      keyCol = "doc_id", partitionCol = None).create()
    new IncrementalSplit(root, sigs, bandTbl, reg, n, k, bands,
      trainPct, valPct)
  }

  /** Open an existing registry: parameters from `_split.meta`. */
  def open(root: String): IncrementalSplit = {
    val kv = Files.readAllLines(Paths.get(root, "_split.meta")).toArray
      .map(_.toString.split("\t")).map(a => a(0) -> a(1)).toMap
    new IncrementalSplit(root,
      MergeTable.open(s"$root/sigs"), MergeTable.open(s"$root/bands"),
      MergeTable.open(s"$root/registry"),
      kv("n").toInt, kv("k").toInt, kv("bands").toInt,
      kv("train").toInt, kv("val").toInt)
  }
}
