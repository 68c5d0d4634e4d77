package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Streaming face of the training-data prep pipeline: an unbounded
  * documents stream is quality-gated, language-tagged, and exact-deduped
  * by content hash — the continuous-ingest shape of the batch
  * CorpusOps/TextAnalysis operators (which are all per-row expressions,
  * so they drop into a stream unchanged).
  *
  * State story at 100 TB/day: the only stateful operator is the content
  * dedup, and its state is bounded by the watermark
  * (`dropDuplicatesWithinWatermark` evicts hashes older than the event-time
  * horizon) — quality scoring and language ID are stateless projections.
  */
object CorpusStreams {

  /** Ingest-prep for a documents stream with columns
    * (doc_id, ingest_ts: timestamp, text): filter low-quality docs, tag
    * language, drop exact duplicates within the watermark horizon.
    */
  def prepare(docs: DataFrame,
      watermark: String = "1 hour",
      minWords: Int = 5,
      maxDigitRatio: Double = 0.30): DataFrame =
    TextAnalysis.withQuality(docs.withWatermark("ingest_ts", watermark))
      .filter(col("n_words") >= minWords &&
        col("digit_ratio") <= maxDigitRatio)
      .withColumn("lang_id", TextAnalysis.langIdExpr(col("text")))
      .withColumn("content_hash", md5(col("text")))
      .dropDuplicatesWithinWatermark("content_hash")
      .select(col("doc_id"), col("ingest_ts"), col("text"), col("lang_id"),
        col("content_hash"), col("n_words"), col("quality_score"))

  /** Continuous NEAR-dup-deduped ingestion: each micro-batch of documents
    * is deduped within itself and against the persistent
    * [[graft.operators.IncrementalDedup]] index, and survivors append to
    * `out`. All three writes (sigs, bands, corpus) key idempotence off
    * the streaming epoch id, so checkpoint-recovery replays land
    * exactly-once — the dedup state is the INDEX TABLES, unbounded by any
    * watermark (unlike `prepare`'s within-horizon exact dedup), which is
    * the semantics a training corpus actually needs: a crawl re-fetching
    * last month's page is still a duplicate.
    */
  def dedupedIngest(docs: DataFrame, index: graft.operators.IncrementalDedup,
      out: graft.table.MergeTable, threshold: Double = 0.8)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (b: DataFrame, epoch: Long) =>
      val accepted = index.dedupeBatch(b, threshold, Some(s"ingest-$epoch"))
      out.appendAll(accepted, Some(s"ingest-$epoch"))
    }

  /** Continuous CURATED ingestion: each micro-batch runs the full
    * [[graft.operators.CorpusOps.curationReport]] gate battery; kept
    * documents append to `out`, and EVERY document's audit row (per-gate
    * verdicts + first failing gate) appends to `audit` — the streaming
    * face of the batch audit, because at continuous-crawl scale the drop
    * provenance must be recorded at ingest time or re-derived by
    * re-running curation. Both writes key idempotence off the streaming
    * epoch id, so checkpoint-recovery replays land exactly-once; a crash
    * between the two appends replays into a consistent pair (the
    * completed write skips itself). The exact-dedup gate is
    * WITHIN-batch here — compose with [[dedupedIngest]]'s persistent
    * index when cross-batch near-dedup is also wanted.
    */
  /** Continuous cluster-consistent split assignment: each micro-batch
    * runs [[graft.operators.IncrementalSplit.assignBatch]] against the
    * persistent registry, so a document arriving months after its
    * near-duplicate still lands in the SAME train/val/test split. The
    * registry's three appends are epoch-keyed (exactly-once under
    * checkpoint recovery); the assignment rows additionally append to
    * `out` when given — e.g. a corpus table carrying the split column
    * for downstream export.
    */
  def splitIngest(docs: DataFrame, registry: graft.operators.IncrementalSplit,
      out: Option[graft.table.MergeTable] = None)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (b: DataFrame, epoch: Long) =>
      val assigned = registry.assignBatch(b, batchId = Some(s"split-$epoch"))
      out.foreach(_.appendAll(
        assigned.select(col("doc_id"), col("split")), Some(s"split-$epoch")))
    }

  def curatedIngest(docs: DataFrame, out: graft.table.MergeTable,
      audit: graft.table.MergeTable, minQuality: Double = 0.5,
      allowedLangs: Seq[String] = Seq("en", "de", "fr", "es", "ja"))
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (b: DataFrame, epoch: Long) =>
      val report = graft.operators.CorpusOps
        .curationReport(b, minQuality, allowedLangs)
        .persist()
      try {
        val kept = b.join(
          report.filter(col("keep")).select("doc_id"), "doc_id")
        out.appendAll(kept, Some(s"curate-$epoch"))
        audit.appendAll(report, Some(s"curate-$epoch"))
      } finally report.unpersist(blocking = false)
    }

  /** Continuous distribution monitoring: each micro-batch is PSI-compared
    * against a STATIC baseline snapshot via
    * [[graft.operators.CorpusOps.driftReport]], and the per-bucket rows
    * land in `out` keyed by (epoch, bucket) — the streaming face of the
    * q134 snapshot-drift query, watching an ingest stream drift away from
    * the corpus it is supposed to extend (alarm on Σpsi per epoch). The
    * baseline should be a bounded/cached relation (its [min,max] edges
    * and counts are re-derived per epoch; cache it or pre-reduce to a
    * summary when the baseline is a full lake snapshot). Appends key
    * idempotence off the epoch id — checkpoint-recovery replays land
    * exactly-once.
    */
  def driftMonitor(docs: DataFrame, baseline: DataFrame, scoreCol: String,
      out: graft.table.MergeTable, buckets: Int = 10)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (b: DataFrame, epoch: Long) =>
      val rep = graft.operators.CorpusOps
        .driftReport(baseline, b, scoreCol, buckets)
        .withColumn("epoch", lit(epoch))
        .withColumn("drift_id", lit(epoch) * buckets + col("bucket"))
        .select(col("drift_id"), col("epoch"), col("bucket"),
          col("n_before"), col("n_after"), col("p"), col("q"), col("psi"))
      out.appendAll(rep, Some(s"drift-$epoch"))
    }

  /** Continuous CHECK-gated ingestion — the streaming face of
    * [[graft.table.MergeTable.appendWithDeadLetter]]: each micro-batch
    * splits on `out`'s CHECK constraints, the clean slice appends to
    * `out`, violators (payload + `violated` column naming the first
    * failing constraint) to `deadLetter`. Idempotence keys off the epoch
    * id through appendWithDeadLetter's derived `-clean`/`-dead` batch
    * ids, so a checkpoint-recovery replay lands EACH slice exactly-once
    * even when the crash fell between the two commits (the replayed
    * epoch short-circuits whichever slice already committed and applies
    * only the missing one). Constraints are re-read per batch, so
    * ALTER-style constraint changes take effect on the next epoch
    * without restarting the stream.
    */
  def checkedIngest(docs: DataFrame, out: graft.table.MergeTable,
      deadLetter: graft.table.MergeTable)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (b: DataFrame, epoch: Long) =>
      out.appendWithDeadLetter(b, deadLetter, Some(s"checked-$epoch"))
      ()
    }

  /** One epoch of [[pipelineIngest]] — exposed so tests can kill the
    * pipeline at every inter-table boundary and replay. Stage order and
    * the per-boundary crash argument (all nine commits key idempotence
    * off the `pipe-<epoch>` id family; every stage's OUTPUT is a
    * deterministic function of the batch and of state the stage itself
    * has not yet committed, so a replay recomputes identical inputs for
    * whatever commits are still missing):
    *
    *   1–2. CHECK gate → `checked` + `deadLetter`
    *        (`pipe-N-clean` / `pipe-N-dead`; appendWithDeadLetter's
    *        between-slices crash contract)
    *   3.   curationReport on the clean slice → `audit`
    *        (`pipe-N:audit`; EVERY clean doc's audit row lands, kept or
    *        not — drop provenance is recorded at ingest time)
    *   4–5. cross-batch near-dedup of the curation-kept docs against the
    *        persistent index (`pipe-N:sigs` / `pipe-N:bands`; sig-without-
    *        bands is inert, replay completes — IncrementalDedup's
    *        contract; replays return identical survivors)
    *   6–8. cluster-consistent split of the survivors against the
    *        registry (`pipe-N:reg`/`:sigs`/`:bands`; IncrementalSplit's
    *        replay contract)
    *   9.   survivors + split column → `corpus` (`pipe-N:corpus`)
    *
    * Leak-safety under growth: `dedupThreshold` must be ≥
    * `splitThreshold` (tighter), so a late near-variant that the dedup
    * KEEPS as corpus still matches its indexed sibling at the split
    * threshold and inherits the sibling's split — the gap between the
    * two thresholds is exactly the similarity band where a document is
    * "new enough to keep, close enough to leak".
    *
    * Epoch hygiene: every intermediate the stages checkpoint (clean
    * slice, audit report, survivors, assignments) is released at epoch
    * end via the getPersistentRDDs diff — a continuously-running
    * pipeline holds no per-epoch blocks.
    */
  private[graft] def pipelineEpoch(b: DataFrame, epoch: Long,
      checked: graft.table.MergeTable, deadLetter: graft.table.MergeTable,
      audit: graft.table.MergeTable, dedup: graft.operators.IncrementalDedup,
      split: graft.operators.IncrementalSplit,
      corpus: graft.table.MergeTable,
      dedupThreshold: Double, splitThreshold: Double,
      minQuality: Double, allowedLangs: Seq[String]): Unit = {
    require(dedupThreshold >= splitThreshold,
      "leak-safety needs the dedup threshold at least as tight as the " +
        s"split threshold (dedup $dedupThreshold < split $splitThreshold " +
        "would keep near-variants without inheriting their sibling's split)")
    val id = s"pipe-$epoch"
    val sc = b.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    try {
      val (clean, _, _) = checked.appendWithDeadLetterKept(b, deadLetter, Some(id))
      val report = graft.operators.CorpusOps
        .curationReport(clean, minQuality, allowedLangs)
        .localCheckpoint(eager = true)
      audit.appendAll(report, Some(s"$id:audit"))
      val kept = clean.join(report.filter(col("keep")).select("doc_id"), "doc_id")
      val survivors = dedup.dedupeBatch(kept, dedupThreshold, Some(id))
      val assigned = split.assignBatch(survivors, splitThreshold, Some(id))
      corpus.appendAll(
        survivors.join(assigned.select(col("doc_id"), col("split")), "doc_id"),
        Some(s"$id:corpus"))
    } finally (sc.getPersistentRDDs.keySet.toSet -- before).foreach(rid =>
      sc.getPersistentRDDs.get(rid).foreach(_.unpersist(blocking = false)))
  }

  /** The composed continuous curation pipeline (gen-13 capstone): CHECK
    * gate → curation audit → persistent cross-batch near-dedup →
    * cluster-consistent split → corpus landing, every stage in its own
    * engine table under ONE `pipe-<epoch>` id family — the streaming
    * twin of the batch [[graft.pipeline.CurationPipeline]]. A crash
    * between ANY two of the nine per-epoch commits leaves a committed
    * prefix that the checkpoint replay completes exactly-once (see
    * [[pipelineEpoch]] for the stage-by-stage argument). `corpus` rows
    * carry the assigned split column; the `audit` table records every
    * CHECK-clean document's gate verdicts; `deadLetter` the violators
    * with the failing constraint named.
    */
  /** One epoch of [[annIngest]], exposed for boundary-replay tests (the
    * [[pipelineEpoch]] precedent): append the batch to the PUBLISHED
    * index generation, then — on maintenance epochs — measure pruning on
    * the batch itself and swap generations only past the threshold.
    */
  private[graft] def annEpoch(b: DataFrame, epoch: Long, root: String,
      k: Int, maxScoredFraction: Double, maintainEvery: Int, nProbe: Int,
      onMaintain: (Long, Double, Int) => Unit): Unit = {
    val idx = graft.operators.VectorIndex.open(root)
    idx.addBatch(b, Some(s"ann-$epoch"))
    if (maintainEvery > 0 && (epoch + 1) % maintainEvery == 0) {
      // maintenance is epoch-marker-keyed, NOT merely threshold-gated: a
      // replayed epoch could measure a post-swap fraction still above
      // the threshold (small corpora, adversarial probes) and swap
      // AGAIN — so the completed decision is recorded like any other
      // epoch commit and replays skip it. The marker lands atomically
      // AFTER the swap; a crash inside that window at worst re-runs one
      // maintenance pass, which is exact (a duplicate recluster is
      // correct, just redundant work), never wrong.
      val dir = Paths.get(root, ".maint")
      Files.createDirectories(dir)
      val marker = dir.resolve(s"epoch-$epoch")
      if (!Files.exists(marker)) {
        val (next, frac) = idx.maintain(b.sparkSession, b, k,
          maxScoredFraction, nProbe)
        val tmp = dir.resolve(s".epoch-$epoch.tmp")
        Files.write(tmp, f"$frac%.6f g${next.generation}".getBytes("UTF-8"))
        Files.move(tmp, marker, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
        onMaintain(epoch, frac, next.generation)
      }
    }
  }

  /** Continuous ANN-index ingestion with threshold-gated maintenance —
    * the streaming face of [[graft.operators.VectorIndex.maintain]]:
    * each micro-batch of (vec_id, embedding) rows appends to the
    * PUBLISHED index generation (the handle reopens per epoch, so a swap
    * from an earlier epoch is picked up instead of tripping the
    * stale-writer guard), and every `maintainEvery` epochs the batch
    * itself doubles as the probe workload: `scoredFraction` is measured
    * on the production candidate pass and [[graft.operators.VectorIndex.recluster]]
    * runs only when pruning has decayed past `maxScoredFraction`.
    *
    * Idempotence & crash story: the append keys off `ann-<epoch>`
    * (replay = no-op by the MergeTable contract), and the maintenance
    * DECISION keys off an atomically-written per-epoch marker under
    * `root/.maint/` — re-measuring on replay is not enough, because a
    * post-swap fraction can legitimately still exceed the threshold and
    * would swap again. A crash between append and maintain replays into
    * append-no-op + one maintenance pass; a crash between the swap and
    * its marker at worst re-runs one maintenance pass, which is exact
    * (a duplicate recluster is redundant work, never a wrong answer).
    * Probe = the batch is deliberate: ingest drift shows up
    * first in the newest vectors, so the batch is the most adverse
    * available sample for the pruning gauge — and it costs no second
    * stored workload.
    */
  def annIngest(vecs: DataFrame, root: String, k: Int = 5,
      maxScoredFraction: Double = 0.5, maintainEvery: Int = 4,
      nProbe: Int = 4,
      onMaintain: (Long, Double, Int) => Unit = (_, _, _) => ())
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    vecs.writeStream.foreachBatch { (b: DataFrame, epoch: Long) =>
      annEpoch(b, epoch, root, k, maxScoredFraction, maintainEvery,
        nProbe, onMaintain)
    }

  def pipelineIngest(docs: DataFrame,
      checked: graft.table.MergeTable, deadLetter: graft.table.MergeTable,
      audit: graft.table.MergeTable, dedup: graft.operators.IncrementalDedup,
      split: graft.operators.IncrementalSplit,
      corpus: graft.table.MergeTable,
      dedupThreshold: Double = 0.9, splitThreshold: Double = 0.7,
      minQuality: Double = 0.5,
      allowedLangs: Seq[String] = Seq("en", "de", "fr", "es", "ja"))
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (b: DataFrame, epoch: Long) =>
      pipelineEpoch(b, epoch, checked, deadLetter, audit, dedup, split,
        corpus, dedupThreshold, splitThreshold, minQuality, allowedLangs)
    }
}
