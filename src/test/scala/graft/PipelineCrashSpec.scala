package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.operators.{IncrementalDedup, IncrementalSplit}
import graft.streaming.CorpusStreams
import graft.table.MergeTable

/** The gen-13 streaming capstone under crash injection: the composed
  * CHECK-gate → curation-audit → persistent near-dedup → cluster-
  * consistent split → corpus pipeline is killed at EVERY inter-table
  * commit boundary in EACH epoch, and the recovered end state must equal
  * the uninterrupted run — across all nine per-epoch commits and all
  * seven distinct state surfaces (checked, dead-letter, audit, corpus,
  * dedup index ×2, split registry ×3).
  *
  * Fixture (similarities verified against the engine's own
  * ngramJaccardPairs): J(1,5)=J(1,10)=0.9523 (dups at the 0.9 dedup
  * threshold), J(1,11)=0.7692 (the straddler: kept at 0.9, inherits at
  * the 0.7 split threshold), all pairs LSH-recalled at the index
  * parameters.
  */
class PipelineCrashSpec extends SparkSpec {
  import spark.implicits._

  private val good = "the quick brown fox jumps over the lazy dog and runs " +
    "through the forest with great speed while birds sing songs above"
  private val dup = good + " today"                            // J=0.9523
  private val dup2 = good + " again"                           // J=0.9523
  private val straddler = good + " while the gentle evening wind blows" // J=0.7692
  private val docB = "a small village near the river holds a market every " +
    "sunday where farmers sell fresh bread cheese and honey to visitors"
  private val fresh = "in the morning the old man walks down to the harbor and " +
    "watches the boats come in with their catch of fish and crab"

  // epoch 0: CHECK violator (-5), quality victim (3), exact within-batch
  // dup (4), near within-batch dup (5), two keepers (1, 6)
  private def batch0: DataFrame = Seq(
    (1L, "en", good), (-5L, "en", good), (3L, "en", "x y z"),
    (4L, "en", good), (5L, "en", dup), (6L, "en", docB))
    .toDF("doc_id", "lang", "text")
  // epoch 1: cross-epoch dup (10), split straddler (11), violator (-2),
  // fresh keeper (12)
  private def batch1: DataFrame = Seq(
    (10L, "en", dup2), (11L, "en", straddler), (-2L, "en", fresh + " x"),
    (12L, "en", fresh))
    .toDF("doc_id", "lang", "text")

  private final class Pipe(val root: String) {
    val checked = new MergeTable(s"$root/checked",
      StructType.fromDDL("doc_id BIGINT, lang STRING, text STRING"),
      keyCol = "doc_id", partitionCol = None).create()
    checked.addCheckConstraint(spark, "nonneg_id", "doc_id >= 0")
    val dl = new MergeTable(s"$root/dead",
      StructType.fromDDL("doc_id BIGINT, lang STRING, text STRING, violated STRING"),
      keyCol = "doc_id", partitionCol = None).create()
    val audit = new MergeTable(s"$root/audit",
      StructType.fromDDL("doc_id BIGINT, gate_exact BOOLEAN, gate_lang BOOLEAN, " +
        "gate_gopher BOOLEAN, gate_quality BOOLEAN, gate_pii BOOLEAN, " +
        "keep BOOLEAN, first_fail STRING"),
      keyCol = "doc_id", partitionCol = None).create()
    val corpus = new MergeTable(s"$root/corpus",
      StructType.fromDDL("doc_id BIGINT, lang STRING, text STRING, split STRING"),
      keyCol = "doc_id", partitionCol = None).create()
    val dedup = IncrementalDedup.create(s"$root/dedup")
    val split = IncrementalSplit.create(s"$root/split")
    val tables = Seq(checked, dl, audit, corpus, dedup.sigs, dedup.bands,
      split.sigs, split.bands, split.registry)

    def epoch(b: DataFrame, e: Long): Unit =
      CorpusStreams.pipelineEpoch(b, e, checked, dl, audit, dedup, split,
        corpus, 0.9, 0.7, 0.5, Seq("en", "de", "fr", "es", "ja"))

    /** Arm a planted crash on the (limit+1)-th table commit. */
    def arm(limit: Int): Unit = {
      var n = 0
      tables.foreach(_.onBaseSnapshotRead = () => {
        n += 1
        if (n > limit) throw new PipelineCrashSpec.PlantedCrash
      })
    }
    def disarm(): Unit = tables.foreach(_.onBaseSnapshotRead = () => ())

    /** Every state surface, as one comparable value. */
    def state(): (Set[Long], Map[Long, String], Map[Long, (Boolean, String)],
        Map[Long, String], Set[Long], Long, Map[Long, String], Set[Long], Long) = (
      checked.read(spark).select("doc_id").as[Long].collect().toSet,
      dl.read(spark).select("doc_id", "violated").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap,
      audit.read(spark).select("doc_id", "keep", "first_fail").collect()
        .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(2)))).toMap,
      corpus.read(spark).select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap,
      dedup.sigs.read(spark).select("doc_id").as[Long].collect().toSet,
      dedup.bands.read(spark).count(),
      split.registry.read(spark).select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap,
      split.sigs.read(spark).select("doc_id").as[Long].collect().toSet,
      split.bands.read(spark).count())
  }

  /** The uninterrupted two-epoch reference run, computed once. */
  private lazy val reference = {
    val p = new Pipe(tmpDir("pipecap-ref"))
    p.epoch(batch0, 0)
    p.epoch(batch1, 1)
    val s = p.state()
    // sanity: the fixture exercises every stage as designed
    assert(s._1 === Set(1L, 3L, 4L, 5L, 6L, 10L, 11L, 12L), "checked")
    assert(s._2 === Map(-5L -> "nonneg_id", -2L -> "nonneg_id"), "dead letter")
    assert(s._3(3L) === ((false, "gopher")), "quality victim audited")
    assert(s._3(4L) === ((false, "exact_dup")), "exact dup audited")
    assert(s._3(1L)._1 && s._3(5L)._1 && s._3(11L)._1, "keepers audited")
    assert(s._4.keySet === Set(1L, 6L, 11L, 12L),
      "corpus: near-dups 5 and 10 dropped, straddler 11 kept")
    assert(s._4(11L) === s._4(1L),
      "leak-safety: the straddler inherits its sibling's split")
    assert(s._5 === Set(1L, 6L, 11L, 12L), "dedup index = survivors")
    assert(s._7.keySet === Set(1L, 6L, 11L, 12L), "registry = assigned")
    s
  }

  test("uninterrupted pipeline: gates, audit, dedup, split inheritance") {
    reference // assertions live in the lazy val
  }

  test("crash at every commit boundary of epoch 0 recovers exactly-once") {
    // 9 commits per epoch: clean, dead, audit, dedup sigs/bands,
    // split reg/sigs/bands, corpus
    for (k <- 0 until 9) {
      val p = new Pipe(tmpDir(s"pipecap-e0c$k"))
      p.arm(k)
      val crashed = intercept[Exception] { p.epoch(batch0, 0) }
      assert(crashed.isInstanceOf[PipelineCrashSpec.PlantedCrash],
        s"k=$k: $crashed")
      p.disarm()
      p.epoch(batch0, 0) // checkpoint replay
      p.epoch(batch1, 1)
      assert(p.state() === reference, s"crash after $k commits of epoch 0")
    }
  }

  test("crash at every commit boundary of epoch 1 recovers exactly-once") {
    for (k <- 0 until 9) {
      val p = new Pipe(tmpDir(s"pipecap-e1c$k"))
      p.epoch(batch0, 0)
      p.arm(k)
      val crashed = intercept[Exception] { p.epoch(batch1, 1) }
      assert(crashed.isInstanceOf[PipelineCrashSpec.PlantedCrash],
        s"k=$k: $crashed")
      p.disarm()
      p.epoch(batch1, 1) // checkpoint replay
      assert(p.state() === reference, s"crash after $k commits of epoch 1")
    }
  }

  test("pipelineIngest streaming wiring: two epochs through a real stream, " +
      "with a pre-planted partial epoch-0 commit, leaves no cached blocks") {
    val p = new Pipe(tmpDir("pipecap-stream"))
    // simulate a crash that landed ONLY the epoch-0 clean slice before the
    // stream (re)starts: the replay must apply every other commit once
    p.checked.appendAll(batch0.filter(col("doc_id") >= 0), Some("pipe-0-clean"))
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet.toSet
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val q = CorpusStreams.pipelineIngest(
        mem.toDF().toDF("doc_id", "lang", "text"),
        p.checked, p.dl, p.audit, p.dedup, p.split, p.corpus)
      .option("checkpointLocation", s"${p.root}/ckpt").start()
    try {
      mem.addData(batch0.as[(Long, String, String)].collect().toSeq)
      q.processAllAvailable()
      mem.addData(batch1.as[(Long, String, String)].collect().toSeq)
      q.processAllAvailable()
    } finally q.stop()
    assert(p.state() === reference, "streamed end state == reference")
    // epoch hygiene: every per-epoch checkpoint/persist block was released
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- cachedBefore
    assert(leaked.isEmpty, s"leaked cached RDDs: $leaked")
  }

  test("thresholds the wrong way round are rejected (leak-safety guard)") {
    val p = new Pipe(tmpDir("pipecap-guard"))
    val e = intercept[IllegalArgumentException] {
      CorpusStreams.pipelineEpoch(batch0, 0, p.checked, p.dl, p.audit,
        p.dedup, p.split, p.corpus, 0.7, 0.9, 0.5, Seq("en"))
    }
    assert(e.getMessage.contains("leak-safety"))
  }
}

object PipelineCrashSpec {
  final class PlantedCrash extends RuntimeException("planted crash")
}
