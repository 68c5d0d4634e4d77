package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{Similarity, VectorIndex}
import graft.streaming.CorpusStreams

/** Streaming face of the IVF index's threshold-gated maintenance: a
  * drifted two-epoch stream triggers exactly ONE generation swap, query
  * results stay exact (== brute force) before and after, and replaying
  * an epoch (append + maintain) is a no-op — the append by the
  * epoch-keyed MergeTable contract, the maintenance by the per-epoch
  * marker (re-measuring is NOT sufficient: on this very fixture the
  * post-swap fraction still exceeds the calibrated threshold, which is
  * exactly why the decision is marker-keyed).
  */
class AnnIngestStreamSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(ids: Range, shift: Double = 0.0): DataFrame =
    ids.map { i =>
      val v = (0 until 8).map(j =>
        (math.sin(i * 1.7 + j * 0.9) + shift).toFloat).toArray
      (i.toLong, v)
    }.toDF("vec_id", "embedding")

  test("drifted two-epoch stream: exactly one swap, exact before/after, " +
      "epoch replay is a no-op") {
    val root = Files.createTempDirectory("annstream").toString + "/idx"
    val base = vecs(0 until 40)
    val b0 = vecs(40 until 60)                 // same cluster: no drift
    val b1 = vecs(300 until 340, shift = 5.0)  // adversarial drift

    // calibrate the threshold on a throwaway replica so the spec is
    // robust to the fixture's measured fractions, not tuned by hand
    val calRoot = Files.createTempDirectory("anncal").toString + "/idx"
    val cal = VectorIndex.create(calRoot, base, nlist = 6)
    cal.addBatch(b0, Some("c0"))
    val f0 = cal.scoredFraction(b0, k = 7)
    cal.addBatch(b1, Some("c1"))
    val f1 = cal.scoredFraction(b1, k = 7)
    assert(f1 > f0, s"fixture must drift: f0=$f0 f1=$f1")
    val threshold = (f0 + f1) / 2

    VectorIndex.create(root, base, nlist = 6)
    assert(VectorIndex.currentGeneration(root) === 0)

    var maintains = List.empty[(Long, Double, Int)]
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Array[Float])]
    val writer = CorpusStreams.annIngest(
        in.toDF.toDF("vec_id", "embedding"), root, k = 7,
        maxScoredFraction = threshold, maintainEvery = 1,
        onMaintain = (e, f, g) => maintains ::= ((e, f, g)))
      .queryName("ann_ingest")
      .option("checkpointLocation", s"$root-ckpt")
      .trigger(Trigger.AvailableNow())

    // epoch 0: in-cluster batch — measured, below threshold, no swap
    in.addData((40 until 60).map(i =>
      (i.toLong, (0 until 8).map(j =>
        math.sin(i * 1.7 + j * 0.9).toFloat).toArray)))
    val q1 = writer.start(); q1.awaitTermination(120000)
    assert(VectorIndex.currentGeneration(root) === 0,
      "no-drift epoch must not swap")
    val mid = VectorIndex.open(root)
    assert(mid.indexedVectors(spark) === 60)
    val probeMid = vecs(0 until 3)
    val gotMid = mid.query(probeMid, k = 7)
      .select("q_id", "neighbor_id", "rank", "cos_sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    val wantMid = Similarity.bruteForceTopK(base.union(b0), probeMid, k = 7)
      .select("q_id", "neighbor_id", "rank", "cos_sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(gotMid === wantMid, "exactness before the swap")

    // epoch 1: drifted batch — fraction exceeds the threshold, ONE swap
    in.addData((300 until 340).map(i =>
      (i.toLong, (0 until 8).map(j =>
        (math.sin(i * 1.7 + j * 0.9) + 5.0).toFloat).toArray)))
    val q2 = writer.start(); q2.awaitTermination(120000)
    assert(VectorIndex.currentGeneration(root) === 1,
      "drifted epoch must swap exactly once")
    assert(maintains.count(_._3 == 1) === 1)

    val post = VectorIndex.open(root)
    assert(post.generation === 1 && post.indexedVectors(spark) === 100)
    val all = base.union(b0).union(b1)
    val probe = all.filter(col("vec_id").isin(1L, 45L, 310L))
    val got = post.query(probe, k = 7)
      .select("q_id", "neighbor_id", "rank", "cos_sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    val want = Similarity.bruteForceTopK(all, probe, k = 7)
      .select("q_id", "neighbor_id", "rank", "cos_sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got === want, "exactness after the swap")

    // crash-replay: re-running the swap epoch's body end-to-end is a
    // no-op — the append dedupes on `ann-1`, and the maintenance is
    // skipped by the epoch marker (threshold re-measurement alone would
    // double-swap here: the post-swap fraction on this fixture is still
    // above the calibrated threshold)
    val callsBefore = maintains.size
    CorpusStreams.annEpoch(b1, epoch = 1L, root, k = 7,
      maxScoredFraction = threshold, maintainEvery = 1, nProbe = 4,
      onMaintain = (e, f, g) => maintains ::= ((e, f, g)))
    assert(VectorIndex.currentGeneration(root) === 1,
      "replay must not double-swap")
    assert(VectorIndex.open(root).indexedVectors(spark) === 100,
      "replayed append must dedupe on the epoch id")
    assert(maintains.size === callsBefore,
      "replayed maintenance must be marker-skipped")
  }
}
