package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.StructType

import graft.operators.{CorpusOps, IncrementalDedup, IncrementalSplit}
import graft.table.MergeTable

/** Per-epoch pipeline accounting, one row of monitoring per micro-batch. */
final case class EpochStats(
    epochId: String,
    nIn: Long,
    nGated: Long,
    nSurvivors: Long,
    nClean: Long,
    nTokensRemoved: Long)

/** The COMPOSED training-data curation pipeline — every stage of the
  * engine's corpus-prep surface chained into ONE continuously-running
  * job over the table layer:
  *
  * {{{
  *   landing docs (stream)
  *     │ 1. curation gates   — CorpusOps.curationReport: exact-dup /
  *     │                      lang / Gopher battery / quality / PII;
  *     │                      kept docs → `corpus` table, full per-doc
  *     │                      audit → `audit` table
  *     │ 2. near-dup dedup   — IncrementalDedup.dedupeBatch against the
  *     │                      PERSISTENT MinHash/LSH index (cross-epoch:
  *     │                      a duplicate arriving months later still
  *     │                      drops against the original)
  *     │ 3. split assignment — IncrementalSplit.assignBatch: cluster-
  *     │                      consistent train/val/test (a near-dup of
  *     │                      an old doc inherits ITS split — no
  *     │                      train/test leakage across epochs)
  *     │ 4. decontamination  — CorpusOps.removeContaminatedSpansText:
  *     │                      benchmark n-gram spans surgically excised
  *     │                      from the surviving text
  *     ▼ `clean` table (doc_id, text, split, n_removed)
  *   release(): shard export + additive-checksum manifest
  * }}}
  *
  * Epoch idempotence — the property that makes the CHAIN crash-safe,
  * not just each stage: every table write in every stage is keyed by a
  * batch id derived from the epoch id (`"$epoch:gated"`, `":audit"`,
  * `":dedup:sigs"`, `":split:reg"`, `":clean"`, …), and every stage's
  * RESULT is a deterministic function of (its input, the index state
  * that stage's own replay rules make stable). So a crash after stage k
  * replays stages 1..k as no-ops (each `appendAll` replay-skips its
  * seen id; `dedupeBatch`/`assignBatch` return identical frames on
  * replay by their own documented contracts) and then RESUMES: the
  * whole epoch lands exactly-once however many times the stream
  * restarts mid-chain. CurationPipelineSpec drives a 3-epoch ingest
  * with a simulated crash between stages and asserts the final corpus
  * is bit-identical to an uncrashed reference run.
  *
  * Scale shape per epoch: gates are row-local + one batch-sized hash
  * window; dedup/split are LSH-bucket joins against the index (cost ∝
  * candidates, not index size — measured flat in SCALE.md's incr
  * probe); decontamination is a broadcast semi-join of the benchmark
  * gram set + an O(tokens + covered) excision; all table commits are
  * O(delta) manifest appends. Nothing in the chain scans history.
  */
final class CurationPipeline private (
    val root: String,
    val corpus: MergeTable,
    val audit: MergeTable,
    val clean: MergeTable,
    val dedup: IncrementalDedup,
    val split: IncrementalSplit,
    val minQuality: Double,
    val allowedLangs: Seq[String],
    val threshold: Double,
    val nGram: Int) {

  /** Run one epoch (= one micro-batch) through all four stages.
    * `batch` must carry (doc_id, text, lang); `benchmark` is the eval
    * set to decontaminate against (text column; empty frame = no-op
    * surgery). Replaying a completed epoch id is a no-op on every
    * table and returns the same stats.
    */
  def applyEpoch(batch: DataFrame, benchmark: DataFrame,
      epochId: String): EpochStats =
    applyEpochUpTo(batch, benchmark, epochId, stages = 4)

  /** Crash-simulation seam (spec-only): run just the first `stages`
    * stages of the epoch. A real crash between stages leaves exactly
    * this state; the recovery path is `applyEpoch` with the SAME epoch
    * id, which replays the completed prefix as no-ops and finishes the
    * chain.
    */
  private[graft] def applyEpochUpTo(batch: DataFrame, benchmark: DataFrame,
      epochId: String, stages: Int): EpochStats = {
    val nIn = batch.count()
    // ── stage 1: curation gates ───────────────────────────────────────
    val report = CorpusOps
      .curationReport(batch, minQuality, allowedLangs)
      .persist()
    try {
      val kept = batch
        .join(report.filter(col("keep")).select("doc_id"), "doc_id")
        .select(col("doc_id"), col("text"), col("lang"))
        .localCheckpoint(true) // reused by the corpus append AND stage 2
      audit.appendAll(report, Some(s"$epochId:audit"))
      corpus.appendAll(kept, Some(s"$epochId:gated"))
      val nGated = kept.count()
      if (stages <= 1) return EpochStats(epochId, nIn, nGated, 0L, 0L, 0L)

      // ── stage 2: cross-epoch near-dup dedup ─────────────────────────
      val survivors =
        dedup.dedupeBatch(kept, threshold, Some(s"$epochId:dedup"))
      val nSurv = survivors.count()
      if (stages <= 2) return EpochStats(epochId, nIn, nGated, nSurv, 0L, 0L)

      // ── stage 3: leak-safe split assignment ─────────────────────────
      val assigned =
        split.assignBatch(survivors, threshold, Some(s"$epochId:split"))
      if (stages <= 3) return EpochStats(epochId, nIn, nGated, nSurv, 0L, 0L)

      // ── stage 4: span decontamination + clean landing ───────────────
      val cleaned = CorpusOps
        .removeContaminatedSpansText(survivors, benchmark, nGram)
      val outRows = cleaned
        .join(assigned.select(col("doc_id"), col("split")), "doc_id")
        .select(col("doc_id"), col("text"), col("split"), col("n_removed"))
        .localCheckpoint(true)
      clean.appendAll(outRows, Some(s"$epochId:clean"))
      val removed = outRows.agg(sum(col("n_removed"))).collect()
        .headOption.flatMap(r => Option(r.get(0)))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
      EpochStats(epochId, nIn, nGated, nSurv, outRows.count(), removed)
    } finally report.unpersist(blocking = false)
  }

  /** The streaming face: one continuously-running job from a landing
    * stream to the `clean` table. Each micro-batch is one epoch keyed
    * by the streaming epoch id, so checkpoint recovery replays land
    * exactly-once across ALL four stages, not just the last write.
    */
  def ingest(docs: DataFrame, benchmark: DataFrame): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (b: DataFrame, epoch: Long) =>
      applyEpoch(b, benchmark, s"e$epoch"); ()
    }

  /** Final-mile release: export one split of the `clean` table as
    * `nShards` deterministic shards under `outDir` and return the
    * additive-checksum manifest (CorpusOps.shardManifest) a consumer
    * verifies the files against.
    */
  def release(spark: SparkSession, outDir: String, nShards: Int = 8,
      splitName: String = "train"): DataFrame = {
    val docs = clean.read(spark)
      .filter(col("split") === splitName)
      .select(col("doc_id"), col("text"))
    CorpusOps.exportShards(docs, nShards, outDir)
    CorpusOps.shardManifest(docs, nShards)
  }
}

object CurationPipeline {

  private val CorpusSchema =
    StructType.fromDDL("doc_id BIGINT, text STRING, lang STRING")
  private val AuditSchema = StructType.fromDDL(
    "doc_id BIGINT, gate_exact BOOLEAN, gate_lang BOOLEAN, " +
      "gate_gopher BOOLEAN, gate_quality BOOLEAN, gate_pii BOOLEAN, " +
      "keep BOOLEAN, first_fail STRING")
  private val CleanSchema = StructType.fromDDL(
    "doc_id BIGINT, text STRING, split STRING, n_removed BIGINT")

  /** Create a fresh pipeline rooted at `root`: three corpus tables plus
    * the dedup index and split registry, with the stage parameters
    * pinned in `_pipeline.meta` (epochs ingested under different
    * thresholds must not silently mix).
    */
  def create(root: String, minQuality: Double = 0.5,
      allowedLangs: Seq[String] = Seq("en", "de", "fr", "es", "ja"),
      threshold: Double = 0.8, nGram: Int = 8,
      trainPct: Int = 80, valPct: Int = 10): CurationPipeline = {
    Files.createDirectories(Paths.get(root))
    Files.writeString(Paths.get(root, "_pipeline.meta"),
      s"minQuality\t$minQuality\nlangs\t${allowedLangs.mkString(",")}\n" +
        s"threshold\t$threshold\nngram\t$nGram\n")
    val corpus = new MergeTable(s"$root/corpus", CorpusSchema,
      keyCol = "doc_id", partitionCol = None).create()
    val audit = new MergeTable(s"$root/audit", AuditSchema,
      keyCol = "doc_id", partitionCol = None).create()
    val clean = new MergeTable(s"$root/clean", CleanSchema,
      keyCol = "doc_id", partitionCol = None).create()
    val dedup = IncrementalDedup.create(s"$root/dedup")
    val split = IncrementalSplit.create(s"$root/split",
      trainPct = trainPct, valPct = valPct)
    new CurationPipeline(root, corpus, audit, clean, dedup, split,
      minQuality, allowedLangs, threshold, nGram)
  }

  /** Reopen an existing pipeline (restart path): parameters from
    * `_pipeline.meta`, all tables/indices from their own metadata.
    */
  def open(root: String): CurationPipeline = {
    val meta = Paths.get(root, "_pipeline.meta")
    require(Files.exists(meta), s"no pipeline at $root")
    val kv = Files.readAllLines(meta).toArray(Array.empty[String])
      .flatMap(_.split("\t", 2) match {
        case Array(a, b) => Some(a -> b)
        case _           => None
      }).toMap
    new CurationPipeline(root,
      MergeTable.open(s"$root/corpus"), MergeTable.open(s"$root/audit"),
      MergeTable.open(s"$root/clean"), IncrementalDedup.open(s"$root/dedup"),
      IncrementalSplit.open(s"$root/split"),
      kv("minQuality").toDouble, kv("langs").split(",").toSeq,
      kv("threshold").toDouble, kv("ngram").toInt)
  }
}
