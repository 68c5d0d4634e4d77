package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.pipeline.CurationPipeline

/** The capstone composition: landing stream → gates → incremental dedup
  * → leak-safe split → span decontamination → clean table → shard
  * release, as ONE job — plus the crash-replay contract that makes the
  * CHAIN (not just each stage) exactly-once.
  */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  // Gate-passing prose: 20+ words, stopwords present, low digit/dup
  // ratios. Each doc gets a distinct tail so shingle sets differ.
  private val baseA = "the quick brown fox jumps over the lazy dog and " +
    "runs through the quiet forest while many small birds sing gentle " +
    "songs above the shaded winding river path"
  private val baseB = "a careful engineer reads the long design document " +
    "before changing any part of the critical system because every " +
    "small mistake there could break the whole busy service later"
  private val span8 = "alpha beta gamma delta epsilon zeta eta theta"
  private val contaminated = "this friendly guide explains how the " +
    "evaluation works in detail " + span8 + " and then continues with " +
    "plain safe original prose about gardens and weather patterns"
  private val baseD = "many readers enjoy stories where the small crew " +
    "sails across a wide cold ocean toward islands that no map in the " +
    "old dusty library had ever shown before"
  private val baseE = "the village bakery opens early every morning and " +
    "the warm smell of fresh bread drifts slowly down the narrow stone " +
    "street while neighbors greet each other kindly"

  private def docs(rows: (Long, String, String)*): DataFrame =
    rows.toDF("doc_id", "text", "lang")

  private val benchmark = Seq("the benchmark asks about " + span8 +
    " as its famous question").toDF("text")

  private val e0 = Seq(
    (1L, baseA, "en"),
    (2L, baseA, "en"),             // exact dup -> gate_exact
    (3L, "too short to pass", "en"), // gopher
    (4L, baseB, "en"),
    (5L, contaminated, "en"))      // survives; span excised in stage 4
  private val e1 = Seq(
    (10L, baseA + " extra", "en"), // near-dup of 1 -> dropped vs index
    (11L, baseD, "en"),
    (12L, baseB + " anders", "zh")) // lang gate
  private val e2 = Seq(
    (20L, baseD + " tail", "en"),  // near-dup of 11 -> dropped vs index
    (21L, baseE, "en"))

  test("streaming 3-epoch ingest: gates, cross-epoch dedup, split, " +
      "decontamination, release") {
    implicit val sqlCtx = spark.sqlContext
    val root = tmpDir("pipe-stream")
    val p = CurationPipeline.create(s"$root/p")
    val mem = MemoryStream[(Long, String, String)]
    val q = p.ingest(mem.toDF().toDF("doc_id", "text", "lang"), benchmark)
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      Seq(e0, e1, e2).foreach { batch =>
        mem.addData(batch: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    // gates: audit carries every landed doc with its first failure
    val a = p.audit.read(spark).select("doc_id", "keep", "first_fail")
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getString(2)))).toMap
    assert(a.keySet === Set(1L, 2L, 3L, 4L, 5L, 10L, 11L, 12L, 20L, 21L))
    assert(a(2L) === ((false, "exact_dup")))
    assert(a(3L) === ((false, "gopher")))
    assert(a(12L) === ((false, "lang")))
    assert(a(1L)._1 && a(5L)._1 && a(10L)._1 && a(11L)._1 && a(20L)._1)

    // cross-epoch dedup: 10 (near-dup of 1) and 20 (near-dup of 11)
    // pass the gates but never reach the clean table
    val clean = p.clean.read(spark)
      .select("doc_id", "text", "split", "n_removed").collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getLong(3)))).toMap
    assert(clean.keySet === Set(1L, 4L, 5L, 11L, 21L))

    // decontamination surgery: doc 5 lost exactly the covered span
    // tokens; clean docs pass through whitespace-normalized
    assert(clean(1L)._1 === baseA && clean(1L)._3 === 0L)
    assert(!clean(5L)._1.contains("alpha") &&
      !clean(5L)._1.contains("theta"))
    assert(clean(5L)._1.startsWith("this friendly guide"))
    assert(clean(5L)._3 >= 8L, s"span tokens removed: ${clean(5L)._3}")

    // split assignment landed and is registry-consistent
    assert(clean.values.map(_._2).toSet.subsetOf(
      Set("train", "val", "test")))
    val reg = p.split.assignments(spark).select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    clean.foreach { case (id, (_, s, _)) => assert(reg(id) === s) }

    // release: shards on disk match the additive-checksum manifest
    val trainIds = clean.collect { case (id, (_, "train", _)) => id }.toSet
    if (trainIds.nonEmpty) {
      val man = p.release(spark, s"$root/shards", nShards = 2)
        .agg(sum("n_docs"), sum("checksum")).collect().head
      val files = spark.read.parquet(s"$root/shards")
      assert(man.getLong(0) === trainIds.size.toLong)
      assert(files.count() === trainIds.size.toLong)
      val re = graft.operators.CorpusOps.shardManifest(
        files.select("doc_id", "text"), 2)
        .agg(sum("checksum")).collect().head
      assert(re.getLong(0) === man.getLong(1), "checksum round-trip")
    }
  }

  test("crash between stages + epoch replay converge to the uncrashed " +
      "reference state") {
    val root = tmpDir("pipe-crash")
    val ref = CurationPipeline.create(s"$root/ref")
    val cr = CurationPipeline.create(s"$root/cr")

    // reference: three clean epochs
    ref.applyEpoch(docs(e0: _*), benchmark, "e0")
    ref.applyEpoch(docs(e1: _*), benchmark, "e1")
    ref.applyEpoch(docs(e2: _*), benchmark, "e2")

    // crashed run: e0 lands; e1 dies after stage 2 (dedup index updated,
    // split/clean never ran); recovery re-runs the WHOLE epoch; then a
    // full replay of e0 (late checkpoint re-delivery) must be a no-op
    cr.applyEpoch(docs(e0: _*), benchmark, "e0")
    cr.applyEpochUpTo(docs(e1: _*), benchmark, "e1", stages = 2)
    val recovered = cr.applyEpoch(docs(e1: _*), benchmark, "e1")
    cr.applyEpoch(docs(e2: _*), benchmark, "e2")
    cr.applyEpoch(docs(e0: _*), benchmark, "e0")

    assert(recovered.nSurvivors === 1L, "replayed dedup kept 11, dropped 10")

    def snap(p: CurationPipeline): (Seq[(Long, String, String, Long)],
        Seq[(Long, Boolean)], Long, Seq[(Long, String)]) = (
      p.clean.read(spark).select("doc_id", "text", "split", "n_removed")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3))).sortBy(_._1).toSeq,
      p.audit.read(spark).select("doc_id", "keep").collect()
        .map(r => (r.getLong(0), r.getBoolean(1))).sortBy(_._1).toSeq,
      p.dedup.indexedDocs(spark),
      p.split.assignments(spark).select("doc_id", "split").collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq)

    assert(snap(cr) === snap(ref))

    // reopen from disk (restart path) and ingest one more epoch on both
    val ref2 = CurationPipeline.open(s"$root/ref")
    val cr2 = CurationPipeline.open(s"$root/cr")
    val e3 = Seq((30L, baseE + " reprise", "en"), (31L, baseA, "en"))
    ref2.applyEpoch(docs(e3: _*), benchmark, "e3")
    cr2.applyEpoch(docs(e3: _*), benchmark, "e3")
    // 30 is a near-dup of 21 (indexed two epochs ago) and must drop;
    // 31 is an EXACT dup of 1 and drops at the dedup stage too
    assert(snap(cr2) === snap(ref2))
    assert(!snap(cr2)._1.exists(r => r._1 == 30L || r._1 == 31L))
  }
}
