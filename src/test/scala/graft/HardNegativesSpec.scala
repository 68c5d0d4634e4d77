package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Hard-negative mining at query-set sizes beyond broadcast: the IVF
  * candidate front-end must (a) return EXACTLY what the broadcast
  * non-equi join returns — the dispatch is a plan decision, never a
  * result decision — and (b) contain no BroadcastNestedLoopJoin /
  * CartesianProduct anywhere in the executed plan, because the whole
  * point of the candidate generator is that a 100 TB corpus with a
  * million-query batch only ever does equi-joins on cell / q_id.
  */
class HardNegativesSpec extends SparkSpec {

  /** 2000 deterministic labeled vectors, dim 16: five label families
    * around distinct base directions with per-id perturbation, so the
    * IVF cells carry real structure (the bound actually prunes) and
    * every query has plenty of different-label impostors.
    */
  private def corpus: DataFrame =
    spark.range(2000).select(
      col("id").cast("int").as("vec_id"),
      (col("id") % 5).cast("int").as("label"),
      transform(sequence(lit(1), lit(16)), j =>
        (cos(col("id") % 5 * j) + sin(col("id") * j) * 0.3)
          .cast("float")).as("embedding"))

  test("IVF path returns bit-identical results to the broadcast path (2000 queries)") {
    val k = 5
    val viaBroadcast = Similarity.hardNegatives(corpus, corpus, k,
        broadcastThresholdBytes = Long.MaxValue)
      .collect().map(_.toSeq).sortBy(_.toString)
    val viaIvf = Similarity.hardNegatives(corpus, corpus, k,
        broadcastThresholdBytes = 0L)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(viaIvf.length === viaBroadcast.length)
    assert(viaIvf.sameElements(viaBroadcast),
      "IVF candidate generation must not change a single row")
    // sanity on the shared contract
    assert(viaIvf.length === 2000 * k)
  }

  test("IVF path plan has no BroadcastNestedLoopJoin or CartesianProduct") {
    val df = Similarity.hardNegatives(corpus, corpus, k = 5,
      broadcastThresholdBytes = 0L)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "large-query hard negatives must never nested-loop")
    assert(!plan.contains("CartesianProduct"),
      "large-query hard negatives must never cross-join")
  }

  test("broadcast-path plan DOES use the fused non-equi broadcast join (small queries)") {
    val q = corpus.filter(col("vec_id") < 5)
    val df = Similarity.hardNegatives(corpus, q, k = 5,
      broadcastThresholdBytes = Long.MaxValue)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "small-query regime should keep the fused broadcast shape")
  }

  test("auto-dispatch: tiny query plans pick broadcast, the threshold is honored") {
    // the auto path reads Catalyst's size estimate — a 5-row slice of a
    // 2000-row local relation sits far under the 10MB default, so the
    // default dispatch must match an explicit broadcast pin
    val q = corpus.filter(col("vec_id") < 5)
    val auto = Similarity.hardNegatives(corpus, q, k = 3)
      .collect().map(_.toSeq).sortBy(_.toString)
    val pinned = Similarity.hardNegatives(corpus, q, k = 3,
        broadcastThresholdBytes = Long.MaxValue)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(auto.sameElements(pinned))
  }

  test("session threshold -1 (broadcast disabled) dispatches to IVF instead of crashing") {
    // "-1" is the documented way to disable broadcast joins — exactly the
    // at-scale tuning this operator targets. JavaUtils.byteStringAsBytes
    // rejects it; the dispatch must read the pre-parsed session conf.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q = corpus.filter(col("vec_id") < 5)
      val viaAuto = Similarity.hardNegatives(corpus, q, k = 3)
      viaAuto.write.format("noop").mode("overwrite").save()
      assert(!viaAuto.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"),
        "disabled broadcast must route to the IVF candidate path")
      val viaIvf = Similarity.hardNegatives(corpus, q, k = 3,
        broadcastThresholdBytes = 0L)
      assert(viaAuto.collect().map(_.toSeq).sortBy(_.toString)
        .sameElements(viaIvf.collect().map(_.toSeq).sortBy(_.toString)))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("IVF path: never same-label, contiguous ranks, scores non-increasing") {
    val out = Similarity.hardNegatives(corpus, corpus, k = 5,
      broadcastThresholdBytes = 0L).collect()
    out.foreach { r =>
      assert(r.getInt(1) !== r.getInt(3),
        s"hard negative shares the query label: $r")
    }
    out.groupBy(_.getInt(0)).foreach { case (qid, rows) =>
      val byRank = rows.sortBy(_.getLong(4))
      assert(byRank.map(_.getLong(4)).toSeq === (1L to byRank.length).toSeq,
        s"ranks not contiguous for q_id=$qid")
      val sims = byRank.map(_.getDouble(5))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
        s"scores must be non-increasing for q_id=$qid")
    }
  }

  test("tripletMine: label constraints, self-exclusion, champions are true argmaxes") {
    val queries = corpus.filter(col("vec_id") < 50)
    val out = Similarity.tripletMine(corpus, queries).collect()
    assert(out.length === 50)
    val all = corpus.collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getSeq[Float](2).map(_.toDouble).toArray))
    val lab = all.map(t => t._1 -> t._2).toMap
    def cos4(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      BigDecimal(dot / (na * nb))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    out.foreach { r =>
      val (qId, qLabel) = (r.getInt(0), r.getInt(1))
      val (posId, posSim) = (r.getInt(2), r.getDouble(3))
      val (negId, negSim) = (r.getInt(4), r.getDouble(5))
      assert(qLabel === lab(qId))
      assert(posId !== qId, "positive must exclude self")
      assert(lab(posId) === qLabel, "positive must share the label")
      assert(lab(negId) !== qLabel, "negative must differ in label")
      assert(r.getDouble(6) ===
        BigDecimal(posSim - negSim)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        "margin = pos_sim - neg_sim")
      // driver-side brute force over the full corpus: the champions are
      // the true (cos desc, vec_id) argmaxes on each side
      val qv = all.find(_._1 == qId).get._3
      val scored = all.filter(_._1 != qId)
        .map(t => (t._1, t._2, cos4(t._3, qv)))
      val bestPos = scored.filter(_._2 == qLabel)
        .minBy(t => (-t._3, t._1))
      val bestNeg = scored.filter(_._2 != qLabel)
        .minBy(t => (-t._3, t._1))
      assert((posId, posSim) === ((bestPos._1, bestPos._3)),
        s"q=$qId positive champion")
      assert((negId, negSim) === ((bestNeg._1, bestNeg._3)),
        s"q=$qId negative champion")
    }
  }
}
