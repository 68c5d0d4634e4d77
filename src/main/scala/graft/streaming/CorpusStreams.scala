package graft.streaming

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
}
