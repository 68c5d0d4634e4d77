package graft

import graft.operators.Dedup

/** Candidate-bounded EXACT embedding near-dup (VERDICT r2 item 3): the
  * block-pair triangle-inequality prune must change the plan, never the
  * answer.
  */
class EmbedNearDupSpec extends SparkSpec {

  private def quant(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def localPairs(rows: Seq[(Long, Array[Float])], t: Double): Seq[(Long, Long, Double)] =
    (for {
      (a, va) <- rows
      (b, vb) <- rows
      if a < b
      na = math.sqrt(va.map(x => x.toDouble * x).sum)
      nb = math.sqrt(vb.map(x => x.toDouble * x).sum)
      if na > 0 && nb > 0
      cos = va.zip(vb).map { case (x, y) => x.toDouble * y }.sum / (na * nb)
      q = quant(cos)
      if q >= t
    } yield (a, b, q)).sortBy(p => (p._1, p._2))

  test("k-means-celled exact near-dup is bit-identical to the all-pairs reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def jitter(base: Array[Float]): Array[Float] =
      base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f)
    val c1 = Array.fill(16)(1f)
    val c2 = Array.tabulate(16)(i => if (i % 2 == 0) 1f else -1f)
    val rows: Seq[(Long, Array[Float])] = (0L until 60L).map { i =>
      if (i < 20) (i, jitter(c1))
      else if (i < 40) (i, jitter(c2))
      else (i, Array.fill(16)((rnd.nextFloat() - 0.5f) * 2f))
    }
    val emb = rows.toDF("vec_id", "embedding")
    // cells > 0 forces the k-means grouping path; tiny blocks force many
    // block pairs so the prune actually has something to cut
    val got = Dedup.embeddingNearDups(emb, 0.95, blockSize = 8, cells = 4)
      .orderBy("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = localPairs(rows, 0.95)
    assert(want.nonEmpty, "fixture must produce matches")
    assert(got == want)
    // and the low-threshold case still agrees (prune mostly disabled)
    val gotLow = Dedup.embeddingNearDups(emb, 0.4, blockSize = 8, cells = 4)
      .orderBy("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(gotLow == localPairs(rows, 0.4))
  }

  test("triangle-inequality bound prunes far block pairs, keeps near ones") {
    import spark.implicits._
    val stats = Seq(
      (0, 0, Array(1.0, 0.0), 0.05),
      (1, 0, Array(-1.0, 0.0), 0.05),
      (2, 0, Array(0.0, 1.0), 0.05)
    ).toDF("cell", "sub", "mean", "radius")
    def pairsAt(t: Double): Set[(Int, Int)] =
      Dedup.candidateBlockPairs(stats, t).collect()
        .map(r => (r.getInt(0), r.getInt(2))).toSet
    // t=0.9 → D≈0.447: only self-pairs survive (dist 2.0 and 1.414 pruned)
    assert(pairsAt(0.9) == Set((0, 0), (1, 1), (2, 2)))
    // t=0.0 → D≈1.414: orthogonal pair (0,2) within D+radii, opposite (0,1) not
    assert(pairsAt(0.0) == Set((0, 0), (1, 1), (2, 2), (0, 2), (1, 2)))
    // degenerate: every pair survives at t = -1 (D = 2)
    assert(pairsAt(-1.0).size == 6)
  }

  test("heavy joins are candidate-driven equi-joins, zero vectors never pair") {
    import spark.implicits._
    val rows: Seq[(Long, Array[Float])] =
      Seq((0L, Array(1f, 0f)), (1L, Array(1f, 0.001f)), (2L, Array(0f, 0f)))
    val df = Dedup.embeddingNearDups(rows.toDF("vec_id", "embedding"), 0.9, blockSize = 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"unconditioned cross join in:\n$plan")
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 1L))) // the zero vector contributes nothing
  }
}
