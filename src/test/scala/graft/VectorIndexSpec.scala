package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Similarity, VectorIndex}

/** The persistent incremental IVF index: exactness vs brute force after
  * incremental adds (including adversarial drift the trained centroids
  * never saw), idempotent replay, and reopen-from-disk.
  */
class VectorIndexSpec extends SparkSpec {

  import spark.implicits._

  /** Deterministic unit-ish vectors in 8 dims; ids pick the pattern. */
  private def vecs(ids: Range, shift: Double = 0.0): DataFrame =
    ids.map { i =>
      val v = (0 until 8).map(j =>
        (math.sin(i * 1.7 + j * 0.9) + shift).toFloat).toArray
      (i.toLong, v)
    }.toDF("vec_id", "embedding")

  test("query equals brute force after an incremental add") {
    val idx = VectorIndex.create(tmpDir("vecidx"), vecs(0 until 40), nlist = 4)
    idx.addBatch(vecs(40 until 80), Some("b2"))
    assert(idx.indexedVectors(spark) === 80)

    val all = vecs(0 until 80)
    val queries = all.filter(col("vec_id") < 3)
    val got = idx.query(queries, k = 5)
      .select("q_id", "neighbor_id", "rank", "cos_sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    val want = Similarity.bruteForceTopK(all, queries, k = 5)
      .select("q_id", "neighbor_id", "rank", "cos_sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got === want)
  }

  test("drifted additions stay exact (bound widens, never misses)") {
    // train on a tight cluster, then add a SHIFTED cluster the centroids
    // never saw — worst case for IVF pruning, must not cost correctness
    val idx = VectorIndex.create(tmpDir("vecidx"), vecs(0 until 30), nlist = 4)
    idx.addBatch(vecs(100 until 130, shift = 2.5), Some("drift"))

    val all = vecs(0 until 30).union(vecs(100 until 130, shift = 2.5))
    val queries = all.filter(col("vec_id").isin(0L, 100L, 115L))
    val got = idx.query(queries, k = 7)
      .select("q_id", "neighbor_id", "rank", "cos_sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    val want = Similarity.bruteForceTopK(all, queries, k = 7)
      .select("q_id", "neighbor_id", "rank", "cos_sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got === want)
  }

  test("recluster: exact before/during/after the swap, pruning " +
      "recovers, stale writers refused") {
    // train on one tight cluster, then drift HARD: three shifted
    // clusters the trained centroids never saw — radii widen, pruning
    // decays, and recluster is the maintenance action that restores it
    val root = tmpDir("vecidx")
    val idx = VectorIndex.create(root, vecs(0 until 40), nlist = 6)
    idx.addBatch(vecs(100 until 140, shift = 2.5), Some("d1"))
    idx.addBatch(vecs(200 until 240, shift = -2.5), Some("d2"))
    idx.addBatch(vecs(300 until 340, shift = 5.0), Some("d3"))
    val all = vecs(0 until 40)
      .union(vecs(100 until 140, shift = 2.5))
      .union(vecs(200 until 240, shift = -2.5))
      .union(vecs(300 until 340, shift = 5.0))
    val queries = all.filter(col("vec_id").isin(1L, 110L, 210L, 310L))
    def ranked(ix: VectorIndex): Set[(Long, Long, Long, Double)] =
      ix.query(queries, k = 7)
        .select("q_id", "neighbor_id", "rank", "cos_sim")
        .as[(Long, Long, Long, Double)].collect().toSet
    val want = Similarity.bruteForceTopK(all, queries, k = 7)
      .select("q_id", "neighbor_id", "rank", "cos_sim")
      .as[(Long, Long, Long, Double)].collect().toSet

    // BEFORE: exact (the standing guarantee) but pruning has decayed
    assert(ranked(idx) === want)
    val fracBefore = idx.scoredFraction(queries, k = 7)

    // SWAP: retrain + re-assign + atomic pointer flip
    val idx2 = idx.recluster(spark)
    assert(idx2.generation === 1)
    assert(VectorIndex.currentGeneration(root) === 1)

    // AFTER: same corpus, same exact answers, measurably better pruning
    assert(idx2.indexedVectors(spark) === 160)
    assert(ranked(idx2) === want)
    val fracAfter = idx2.scoredFraction(queries, k = 7)
    assert(fracAfter < fracBefore,
      f"recluster must recover pruning: $fracBefore%.3f -> $fracAfter%.3f")

    // DURING (time travel): the superseded generation remains a
    // CONSISTENT (centroids, vectors) pair — a reader that resolved
    // CURRENT before the flip still gets exact answers from it
    val old = VectorIndex.open(root, generation = Some(0))
    assert(old.generation === 0)
    assert(ranked(old) === want)

    // stale handles must not write into an abandoned generation
    val e = intercept[IllegalArgumentException] {
      idx.addBatch(vecs(400 until 410), Some("late"))
    }
    assert(e.getMessage.contains("stale index handle"))

    // the published generation ingests + replays as before, and a fresh
    // open() resolves it
    idx2.addBatch(vecs(400 until 410), Some("late"))
    idx2.addBatch(vecs(400 until 410), Some("late"))
    assert(idx2.indexedVectors(spark) === 170)
    val re = VectorIndex.open(root)
    assert(re.generation === 1 && re.indexedVectors(spark) === 170)
    val all2 = all.union(vecs(400 until 410))
    val got2 = re.query(queries, k = 7)
      .select("q_id", "neighbor_id", "rank", "cos_sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    val want2 = Similarity.bruteForceTopK(all2, queries, k = 7)
      .select("q_id", "neighbor_id", "rank", "cos_sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got2 === want2)
  }

  test("maintain: below-threshold is a no-op, decayed pruning triggers " +
      "the swap, both report the measured fraction") {
    val root = tmpDir("vecidx")
    val idx = VectorIndex.create(root, vecs(0 until 40), nlist = 6)
    idx.addBatch(vecs(100 until 140, shift = 2.5), Some("d1"))
    idx.addBatch(vecs(300 until 340, shift = 5.0), Some("d2"))
    val all = vecs(0 until 40)
      .union(vecs(100 until 140, shift = 2.5))
      .union(vecs(300 until 340, shift = 5.0))
    val probe = all.filter(col("vec_id").isin(1L, 110L, 310L))
    val fDrift = idx.scoredFraction(probe, k = 7)
    // threshold above the measured drift fraction: no swap
    val (same, f1) = idx.maintain(spark, probe, k = 7,
      maxScoredFraction = math.min(1.0, fDrift + 0.01))
    assert(same.generation === 0 && f1 === fDrift)
    // threshold below it: swap happens, handle advances, exactness holds
    val (next, f2) = idx.maintain(spark, probe, k = 7,
      maxScoredFraction = fDrift - 0.01)
    assert(f2 === fDrift)
    assert(next.generation === 1)
    assert(VectorIndex.currentGeneration(root) === 1)
    val got = next.query(probe, k = 7)
      .select("q_id", "neighbor_id", "rank", "cos_sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    val want = Similarity.bruteForceTopK(all, probe, k = 7)
      .select("q_id", "neighbor_id", "rank", "cos_sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got === want)
    assert(next.scoredFraction(probe, k = 7) < fDrift,
      "the swap must have recovered pruning on the drifted fixture")
  }

  test("addBatch replay is a no-op; open() resumes from disk") {
    val root = tmpDir("vecidx")
    val idx = VectorIndex.create(root, vecs(0 until 20), nlist = 4)
    idx.addBatch(vecs(20 until 30), Some("b2"))
    val v1 = idx.vectors.latestVersion
    idx.addBatch(vecs(20 until 30), Some("b2"))
    assert(idx.vectors.latestVersion === v1, "replay must not commit")

    val re = VectorIndex.open(root)
    assert(re.nlist === 4)
    assert(re.indexedVectors(spark) === 30)
    val q = vecs(0 until 30).filter(col("vec_id") === 5)
    val got = re.query(q, k = 3).select("neighbor_id").as[Long].collect().toSet
    val want = Similarity.bruteForceTopK(vecs(0 until 30), q, k = 3)
      .select("neighbor_id").as[Long].collect().toSet
    assert(got === want)
  }
}
