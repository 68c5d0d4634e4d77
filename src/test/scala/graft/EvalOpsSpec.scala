package graft

import org.apache.spark.sql.functions._
import graft.operators.EvalOps

/** Evaluation/annotation analytics (q168+): Fleiss' κ hand-checked closed
  * forms, degenerate-agreement edges, fixture structure, determinism.
  */
class EvalOpsSpec extends SparkSpec {

  import spark.implicits._

  test("fleissKappa: hand-computed 2-item/2-rater example") {
    // item A: both raters cat0; item B: split cat0/cat1.
    // P_bar = (6-4)/(2*2*1) = 0.5 ; P_e = (3²+1²)/(2·2)² = 0.625
    // kappa = (0.5-0.625)/(1-0.625) = -1/3 → floored millionths -333334
    val r = Seq(("s", 1L, 0L, 0L), ("s", 1L, 1L, 0L),
      ("s", 2L, 0L, 0L), ("s", 2L, 1L, 1L))
      .toDF("source", "item_id", "rater", "cat")
    val row = EvalOps.fleissKappa(r).collect().head
    assert(row.getLong(1) === 2L && row.getLong(2) === 2L)
    assert(row.getDouble(3) === 0.5)
    assert(row.getDouble(4) === 0.625)
    assert(row.getDouble(5) === -0.333334)
  }

  test("fleissKappa: perfect agreement is exactly 1 even with mixed cats") {
    // all raters agree per item, items spread over two categories so
    // P_e < 1 and the kappa division is non-degenerate
    val r = (0L to 9L).flatMap(i =>
      (0L to 2L).map(k => ("s", i, k, i % 2)))
      .toDF("source", "item_id", "rater", "cat")
    val row = EvalOps.fleissKappa(r).collect().head
    assert(row.getDouble(3) === 1.0)
    assert(row.getDouble(5) === 1.0)
  }

  test("ratings fixture: rater count, category range, exact noise rule") {
    val docs = (0L to 49L).map(i => (i, s"t$i", s"src${i % 3}"))
      .toDF("doc_id", "text", "source")
    val r = EvalOps.ratings(docs)
    assert(r.count() === 250L)
    val perItem = r.groupBy("item_id").count().select("count")
      .distinct().collect().map(_.getLong(0)).toSeq
    assert(perItem === Seq(5L))
    assert(r.filter(col("cat") < 0 || col("cat") > 3).count() === 0L)
    // doc 7: idHash = 1401181151, base = 3; rater 0 noisy ((h+0)%10=1<3)
    // → flipped to (3 + 1 + (1401181151%97 + 0)%3) % 4 = 1; rater 1
    // clean ((h+17)%10=8) → base 3
    val c70 = r.filter(col("item_id") === 7 && col("rater") === 0)
      .collect().head.getLong(3)
    assert(c70 === 1L)
    val c71 = r.filter(col("item_id") === 7 && col("rater") === 1)
      .collect().head.getLong(3)
    assert(c71 === 3L)
  }

  test("bradleyTerry: 2-model integer MM converges to the exact 3:1 ratio") {
    // A beats B 3 times, B beats A once → MM fixed point s_A/s_B = 3;
    // normalized to mean 1e6 the integer loop lands exactly on
    // (1500000, 500000) — computed independently with the same floor rule
    val g = Seq((1L, 0L, 1L, 0L), (2L, 0L, 1L, 0L), (3L, 1L, 0L, 0L),
      (4L, 0L, 1L, 1L)).toDF("game_id", "model_a", "model_b", "winner")
    val out = EvalOps.bradleyTerry(g).orderBy("model").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(0L, 1L))
    assert(out(0).getLong(2) === 4L && out(0).getLong(3) === 3L)
    assert(out(0).getDouble(4) === 1.5)
    assert(out(1).getDouble(4) === 0.5)
    assert(out(0).getLong(0) === 1L && out(1).getLong(0) === 2L)
  }

  test("btGames + bradleyTerry recover the planted strength ordering") {
    val docs = (0L to 499L).map(i => (i, s"t$i", s"src${i % 20}"))
      .toDF("doc_id", "text", "source")
    val out = EvalOps.bradleyTerry(EvalOps.btGames(docs))
    val strength = out.collect().map(r => r.getLong(1) -> r.getDouble(4)).toMap
    // planted true strengths are index+1: the top model must beat the
    // bottom decisively, and the rank correlation must be strongly
    // positive (exact per-pair order can wobble at ~125 games/model)
    assert(strength(7L) > 2 * strength(0L))
    val ms = (0L to 7L).map(strength)
    val pairs = for (a <- 0 until 8; b <- a + 1 until 8) yield
      if (ms(b) > ms(a)) 1 else -1
    assert(pairs.sum > 14, s"rank correlation too weak: ${pairs.sum}/28")
    // deterministic under repartition
    val again = EvalOps.bradleyTerry(
      EvalOps.btGames(docs.repartition(13))).collect().toSeq
    assert(again === out.collect().toSeq)
  }

  test("passAtK: closed-form subset-count cases") {
    // (n=5,c=2,k=3): 1 - (3·2·1)/(5·4·3) = 0.9 exactly
    // (n=4,c=0,k=4): 1 - 4!/4! = 0 ; (n=4,c=4,k=1): numerator 0 → 1
    // (n=3,c=1,k=4): k>n → null ; (n=5,c=3,k=3): n-c<k → 1
    val runs = Seq((1L, "s", 5L, 2L), (2L, "s", 4L, 0L), (3L, "s", 4L, 4L),
      (4L, "s", 3L, 1L), (5L, "s", 5L, 3L))
      .toDF("task_id", "source", "n", "c")
    val out = EvalOps.passAtK(runs, Seq(1, 3, 4))
      .orderBy("task_id").collect()
    def pass(i: Int, colName: String): Any =
      out(i).getAs[Any](colName)
    assert(pass(0, "pass_3") === 0.9)
    assert(pass(1, "pass_4") === 0.0)
    assert(pass(2, "pass_1") === 1.0)
    assert(pass(3, "pass_4") === null)
    assert(pass(4, "pass_3") === 1.0)
    // monotone in k where defined: pass@1 <= pass@3 on task 1
    assert(out(0).getDouble(4) <= out(0).getDouble(5))
  }

  test("calibrationReport: exact bin stats and weighted ECE") {
    val preds = Seq(
      ("s", 1L, 900000L, true), ("s", 2L, 950000L, false), // bin 9
      ("s", 3L, 50000L, true))                             // bin 0
      .toDF("source", "pred_id", "conf6", "correct")
    val out = EvalOps.calibrationReport(preds).orderBy("bin").collect()
    assert(out.length === 2)
    // bin 0: conf 0.05, acc 1.0, gap 0.95
    assert(out(0).getDouble(3) === 0.05 && out(0).getDouble(4) === 1.0)
    assert(out(0).getDouble(5) === 0.95)
    // bin 9: conf (0.9+0.95)/2, acc 0.5
    assert(out(1).getDouble(3) === 0.925 && out(1).getDouble(4) === 0.5)
    assert(out(1).getDouble(5) === 0.425)
    // ECE = (0.425·2 + 0.95·1)/3 = 0.6 exactly, same on every row
    assert(out.forall(_.getDouble(6) === 0.6))
  }

  test("calibration fixture exposes the planted 4/5 overconfidence") {
    val docs = (0L to 499L).map(i => (i, s"t$i", s"src${i % 20}"))
      .toDF("doc_id", "text", "source")
    val out = EvalOps.calibrationReport(
      EvalOps.predictions(docs).withColumn("source", lit("all")))
      .orderBy("bin").collect()
    // in every bin with real mass, realized accuracy sits below stated
    // confidence (acc ≈ 0.8·conf by construction)
    val highBins = out.filter(r => r.getLong(1) >= 5 && r.getLong(2) >= 20)
    assert(highBins.nonEmpty)
    highBins.foreach { r =>
      assert(r.getDouble(4) < r.getDouble(3),
        s"bin ${r.getLong(1)}: acc ${r.getDouble(4)} !< conf ${r.getDouble(3)}")
    }
    // ECE materially positive for an overconfident model
    assert(out.head.getDouble(6) > 0.05)
  }

  test("wilsonCi: classic p=0.5 n=100 values and the p=1 edge") {
    val runs = Seq(("a", 1L, 50L, 25L), ("a", 2L, 50L, 25L),
      ("b", 3L, 5L, 5L), ("b", 4L, 5L, 5L))
      .toDF("source", "task_id", "n", "c")
    val out = EvalOps.wilsonCi(runs).orderBy("source").collect()
    // source a: 50/100 → the textbook Wilson interval [0.4038, 0.5962]
    assert(out(0).getDouble(3) === 0.5)
    assert(math.abs(out(0).getDouble(4) - 0.40383) < 0.0001)
    assert(math.abs(out(0).getDouble(5) - 0.59617) < 0.0001)
    // source b: 10/10 → upper bound exactly 1, lower stays honest
    assert(out(1).getDouble(3) === 1.0)
    assert(out(1).getDouble(5) === 1.0)
    assert(out(1).getDouble(4) > 0.70 && out(1).getDouble(4) < 0.75)
  }

  test("bootstrapCi: constant-accuracy category collapses to a point") {
    // every task 2/4 → every Poisson-weighted replica is exactly 0.5
    val const = (1L to 30L).map(i => ("k", i, 4L, 2L))
      .toDF("source", "task_id", "n", "c")
    val row = EvalOps.bootstrapCi(const).collect().head
    assert(row.getDouble(1) === 0.5)
    assert(row.getDouble(2) === 0.5 && row.getDouble(3) === 0.5)
    // varying category: CI brackets the point estimate with real width
    val varied = (1L to 40L).map(i => ("v", i, 10L, i % 11))
      .toDF("source", "task_id", "n", "c")
    val v = EvalOps.bootstrapCi(varied).collect().head
    assert(v.getDouble(2) < v.getDouble(1) && v.getDouble(1) < v.getDouble(3))
    assert(v.getDouble(3) - v.getDouble(2) > 0.01)
    // deterministic under repartition
    val again = EvalOps.bootstrapCi(varied.repartition(7)).collect().head
    assert(again === v)
  }

  test("mcnemar: hand-counted cells, correction, decision edges") {
    // 20 discordant A-wins vs 5 B-wins: chi2 = (15-1)^2/25 = 7.84 → A
    val rows = (1 to 20).map(i => ("s", i.toLong, true, false)) ++
      (21 to 25).map(i => ("s", i.toLong, false, true)) ++
      (26 to 30).map(i => ("s", i.toLong, true, true)) ++
      Seq(("s", 31L, false, false)) ++
      // balanced source: b=c=3 → chi2 = 1/6, not significant
      (1 to 3).map(i => ("t", 100L + i, true, false)) ++
      (4 to 6).map(i => ("t", 100L + i, false, true))
    val df = rows.toDF("source", "task_id", "a_ok", "b_ok")
    val out = EvalOps.mcnemar(df).orderBy("source").collect()
    assert(out(0).getLong(2) === 5L && out(0).getLong(3) === 1L)
    assert(out(0).getLong(4) === 20L && out(0).getLong(5) === 5L)
    assert(out(0).getDouble(6) === 7.84)
    assert(out(0).getBoolean(7) && out(0).getString(8) === "A")
    assert(out(1).getDouble(6) === math.floor(1e6 / 6.0) / 1e6)
    assert(!out(1).getBoolean(7) && out(1).getString(8) === "tie")
  }

  test("mcnemar on the fixture: A's planted edge shows up somewhere") {
    val docs = (0L to 499L).map(i => (i, s"t$i", s"src${i % 20}"))
      .toDF("doc_id", "text", "source")
    val out = EvalOps.mcnemar(EvalOps.pairedOutcomes(docs)
      .withColumn("source", lit("all"))).collect().head
    // A planted stronger: more A-only than B-only wins overall
    assert(out.getLong(4) > out.getLong(5))
  }

  test("raterDrift: the planted-noisier rater scores lowest kappa") {
    val r = Seq(
      // 10 items, raters 0/1 always majority cat, rater 2 always off
      (1 to 10).map(i => (i.toLong, 0L, (i % 2).toLong)),
      (1 to 10).map(i => (i.toLong, 1L, (i % 2).toLong)),
      (1 to 10).map(i => (i.toLong, 2L, ((i % 2) + 2).toLong))
    ).flatten.toDF("item_id", "rater", "cat")
    val out = EvalOps.raterDrift(r).orderBy("rater").collect()
    assert(out(0).getDouble(3) === 1.0 && out(1).getDouble(3) === 1.0)
    assert(out(2).getDouble(3) === 0.0)
    // kappa: perfect raters 1.0; the off-rater at or below chance
    assert(out(0).getDouble(5) === 1.0)
    assert(out(2).getDouble(5) <= 0.0)
  }

  test("irMetrics: closed-form perfect, inverted, and empty rankings") {
    // query 0: perfect ranking (scores follow relevance) → ndcg = 1
    // query 1: the rel-2 doc ranked LAST of 3 → known dcg ratio
    // query 2: nothing relevant → all zeros
    val runs = Seq(
      (1L, 0L, 2L, 30L), (2L, 0L, 1L, 20L), (3L, 0L, 0L, 10L),
      (11L, 1L, 2L, 1L), (12L, 1L, 0L, 20L), (13L, 1L, 0L, 10L),
      (21L, 2L, 0L, 5L), (22L, 2L, 0L, 4L))
      .toDF("doc_id", "qid", "rel", "score")
    val out = EvalOps.irMetrics(runs).orderBy("qid").collect()
    assert(out(0).getDouble(2) === 1.0)   // recall
    assert(out(0).getDouble(3) === 1.0)   // mrr
    assert(out(0).getDouble(4) === 1.0)   // ndcg
    // query 1: first (only) relevant at rank 3 → mrr = 1/3 floored
    assert(out(1).getDouble(3) === 0.333333)
    val g3 = math.floor(3e6 / (math.log(4.0) / math.log(2.0))).toLong
    val g1 = math.floor(3e6 / (math.log(2.0) / math.log(2.0))).toLong
    assert(out(1).getDouble(4) ===
      math.floor(g3 * 1e6 / g1) / 1e6)
    assert(out(2).getDouble(2) === 0.0 && out(2).getDouble(3) === 0.0
      && out(2).getDouble(4) === 0.0)
  }

  test("retrievalRuns + irMetrics: planted ranker lands mid-range") {
    val docs = (0L to 499L).map(i => (i, s"t$i", s"src${i % 20}"))
      .toDF("doc_id", "text", "source")
    val out = EvalOps.irMetrics(EvalOps.retrievalRuns(docs)).collect()
    assert(out.length === 10)
    // the ranker is rel-correlated but noisy: strong but imperfect
    out.foreach { r =>
      assert(r.getDouble(4) > 0.5, s"q${r.getLong(0)} ndcg ${r.getDouble(4)}")
    }
    assert(out.exists(_.getDouble(4) < 1.0), "noise must cost someone")
  }

  test("fleissKappa is deterministic under repartition") {
    val docs = (0L to 99L).map(i => (i, s"t$i", s"src${i % 4}"))
      .toDF("doc_id", "text", "source")
    val a = EvalOps.fleissKappa(EvalOps.ratings(docs))
      .orderBy("source").collect().toSeq
    val b = EvalOps.fleissKappa(EvalOps.ratings(docs.repartition(11)))
      .orderBy("source").collect().toSeq
    assert(a === b)
    // the fixture's 30% noise should land κ in the informative band
    val k = a.head.getDouble(5)
    assert(k > 0.2 && k < 0.9, s"kappa out of informative band: $k")
  }

  test("brierDecomposition: hand toy, identity residual, fixture sanity") {
    import spark.implicits._
    // one source, constant-confidence bins → resid must be EXACTLY 0:
    // bin 8 (conf 0.8): outcomes {1, 1, 0}; bin 2 (conf 0.2): {0}
    // BS = ((0.2)²+(0.2)²+(0.8)²+(0.2)²)/4 = 0.19
    // REL = (3(0.8−2/3)² + 1(0.2−0)²)/4 = (0.05333+0.04)/4 ≈ 0.023333
    // RES = (3(2/3−0.5)² + 1(0−0.5)²)/4 = (0.08333+0.25)/4 ≈ 0.083333
    // UNC = 0.5·0.5 = 0.25 → REL−RES+UNC = 0.19 = BS ✓
    val toy = Seq(
      ("s", 800000L, true), ("s", 800000L, true), ("s", 800000L, false),
      ("s", 200000L, false))
      .toDF("source", "conf6", "correct")
    val r = EvalOps.brierDecomposition(toy).collect().head
    assert(r.getLong(1) === 4L)
    assert(r.getDouble(2) === 0.19)
    assert(math.abs(r.getDouble(3) - 0.023333) < 2e-6, s"rel ${r.getDouble(3)}")
    assert(math.abs(r.getDouble(4) - 0.083333) < 2e-6, s"res ${r.getDouble(4)}")
    assert(r.getDouble(5) === 0.25)
    assert(math.abs(r.getDouble(6)) < 5e-6, "constant-conf bins → resid ≈ 0")
    // real fixture: all terms nonnegative (up to floor), identity holds
    // within floor slack, UNC ≤ 0.25
    val real = EvalOps.brierDecomposition(EvalOps.predictions(
      Tables.documents(spark, "/root/testdata/sf0.001"))).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      val (bs, rel, res, unc, resid) = (r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(bs >= 0 && rel >= 0 && res >= 0 && unc >= 0 && unc <= 0.25)
      assert(math.abs(bs - (rel - res + unc + resid)) < 1e-9)
      assert(bs > 0 && bs < 1)
    }
  }

  test("brierDecomposition: exact far past the old 3e6 nb*N ceiling " +
      "(q/r-decomposed arithmetic vs direct BigInt reference)") {
    import spark.implicits._
    // 100k rows in ONE source: nb*N ≈ 10^9 — the pre-lift BIGINT bound
    // (3e6) is exceeded 300×; the decomposed engine arithmetic must
    // equal a direct BigInt replay of the ORIGINAL formulas bit-for-bit
    val n = 100000
    val rows = (0 until n).map { i =>
      ("big", (i.toLong * 97L) % 1000000L, i % 3 == 0)
    }
    val got = EvalOps.brierDecomposition(rows.toDF("source", "conf6", "correct"))
      .collect().head
    // direct reference in unbounded integers
    case class B(var nb: Long = 0, var sb: Long = 0, var yb: Long = 0,
      var d2b: Long = 0)
    val bins = scala.collection.mutable.Map.empty[Long, B]
    rows.foreach { case (_, conf6, correct) =>
      val p3 = conf6 / 1000
      val bin = math.min(conf6 / 100000, 9L)
      val y = if (correct) 1L else 0L
      val d = p3 - 1000 * y
      val b = bins.getOrElseUpdate(bin, B())
      b.nb += 1; b.sb += p3; b.yb += y; b.d2b += d * d
    }
    val nn = BigInt(n)
    val ytot = BigInt(bins.values.map(_.yb).sum)
    val d2 = BigInt(bins.values.map(_.d2b).sum)
    val relSum = bins.values.map { b =>
      val e = BigInt(b.sb) - 1000 * BigInt(b.yb); e * e / b.nb }.sum
    val resSum = bins.values.map { b =>
      val d = BigInt(b.yb) * nn - ytot * BigInt(b.nb)
      d * d * 1000000 / b.nb }.sum
    val bs6 = d2 / nn
    val rel6 = relSum / nn
    val res6 = resSum / (nn * nn * nn)
    val unc6 = ytot * (nn - ytot) * 1000000 / (nn * nn)
    assert(got.getLong(1) === n.toLong)
    assert(got.getDouble(2) === bs6.toDouble / 1e6, "brier")
    assert(got.getDouble(3) === rel6.toDouble / 1e6, "reliability")
    assert(got.getDouble(4) === res6.toDouble / 1e6, "resolution")
    assert(got.getDouble(5) === unc6.toDouble / 1e6, "uncertainty")
  }

  test("prAuc: hand-computed threshold blocks and the baseline property") {
    import spark.implicits._
    def ap(rows: Seq[(Double, Boolean)]): Double =
      EvalOps.prAuc(rows.toDF("score", "pos"), "score", "pos")
        .collect().head.getDouble(2)
    // pos {4, 2}, neg {3}: threshold 4 → prec 1 (ΔTP 1); threshold 3 →
    // ΔTP 0; threshold 2 → tp2/fp1 prec 2/3 (ΔTP 1) → AP = 0.833333
    assert(ap(Seq((4.0, true), (3.0, false), (2.0, true))) === 0.833333)
    // perfect separation → 1.0
    assert(ap(Seq((9.0, true), (8.0, true), (1.0, false))) === 1.0)
    // all scores tied → one block: AP = prevalence
    assert(ap(Seq((5.0, true), (5.0, false), (5.0, false),
      (5.0, false))) === 0.25)
    // inverted ranking floors toward prevalence, never below it
    val inv = ap(Seq((1.0, true), (9.0, false), (8.0, false),
      (7.0, false)))
    assert(inv === 0.25, s"worst case = prevalence at the last block, $inv")
    // repartition determinism
    val big = (1 to 400).map(i => ((i % 11).toDouble, i % 4 == 0))
    val a = ap(big)
    val b = EvalOps.prAuc(big.toDF("score", "pos").repartition(13),
      "score", "pos").collect().head.getDouble(2)
    assert(a === b)
  }

  test("rankAuc: hand-computed tie half-credit and the degenerate ends") {
    import spark.implicits._
    def auc(rows: Seq[(Double, Boolean)]): (Long, Long, Double) = {
      val r = EvalOps.rankAuc(rows.toDF("score", "pos"), "score", "pos")
        .collect().head
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    }
    // pos {3, 2}, neg {1, 2}: 3 wins + 1 tie of 4 pairs → 0.875
    assert(auc(Seq((3.0, true), (2.0, true), (1.0, false), (2.0, false)))
      === ((2L, 2L, 0.875)))
    // perfect separation → 1.0; inverted → 0.0; all tied → 0.5
    assert(auc(Seq((9.0, true), (8.0, true), (1.0, false)))._3 === 1.0)
    assert(auc(Seq((1.0, true), (9.0, false)))._3 === 0.0)
    assert(auc(Seq((5.0, true), (5.0, false), (5.0, true)))._3 === 0.5)
    // repartition determinism (cumulative window over the value set)
    val big = (1 to 500).map(i => ((i % 13).toDouble, i % 3 == 0))
    val a1 = auc(big)
    val a2 = EvalOps.rankAuc(big.toDF("score", "pos").repartition(17),
      "score", "pos").collect().head
    assert(a1 === ((a2.getLong(0), a2.getLong(1), a2.getDouble(2))))
  }

  test("conformalThreshold: ceiling-rank order statistic, degenerate " +
      "cap, holdout coverage census") {
    // group a: cal scores 1..19 -> k = ceil(20*0.9) = 18, qhat = 18;
    // test scores 1..20 -> coverage 18/20 = 0.9
    val a = (1L to 19L).map(v => ("a", v, true)) ++
      (1L to 20L).map(v => ("a", v, false))
    // group b: 5 cal scores -> k = ceil(6*0.9) = 6 > 5 -> capped at 5,
    // qhat = max cal score 50; all 4 test scores <= 50 -> coverage 1.0
    val b = Seq(10L, 20L, 30L, 40L, 50L).map(v => ("b", v, true)) ++
      Seq(5L, 15L, 45L, 50L).map(v => ("b", v, false))
    val out = EvalOps.conformalThreshold(
        (a ++ b).toDF("g", "v", "cal").repartition(7), "g", "v", "cal")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out("a") === ((19L, 18L, 18L, 20L, 0.9)))
    assert(out("b") === ((5L, 5L, 50L, 4L, 1.0)))
  }

  test("conformalThreshold holds its 1-alpha guarantee on an exchangeable " +
      "split") {
    // 2000 iid-ish scores hash-split 50/50: empirical holdout coverage
    // must land near 0.9 (exchangeability => within a few percent)
    val rows = (1 to 2000).map { i =>
      val h = (i * 2654435761L) % 2147483647L
      ("g", h % 1000L, h % 2 == 0)
    }
    val out = EvalOps.conformalThreshold(
        rows.toDF("g", "v", "cal"), "g", "v", "cal")
      .collect().head
    val cov = out.getDouble(5)
    assert(cov >= 0.85 && cov <= 0.95, s"coverage $cov")
  }

  test("ksTest: hand ECDFs, disjoint supports give D = 1, argmax ties " +
      "break to the smallest value") {
    import spark.implicits._
    // disjoint supports: A = {1..4}, B = {5..8} -> D = 1.0, first value
    // where the gap is maximal = 4 (A's ECDF hits 1, B's still 0)
    val rows = (1L to 4L).map(v => ("A", v)) ++ (5L to 8L).map(v => ("B", v))
    val out = EvalOps.ksTest(rows.toDF("g", "v"), "g", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("A").getDouble(4) === 1.0)
    assert(out("A").getLong(3) === 4L, "argmax at A's last jump")
    assert(out("B").getDouble(4) === 1.0)
    assert(out("B").getLong(3) === 4L, "same sup point from B's view")
    assert(out("A").getBoolean(6), "D = 1 at n = m = 4 clears crit")
    // interleaved: A = {1, 3}, B = {2, 4}: at v=1 |1/2 - 0| = 0.5 = D
    val out2 = EvalOps.ksTest(
      Seq(("A", 1L), ("A", 3L), ("B", 2L), ("B", 4L)).toDF("g", "v"),
      "g", "v").collect().map(r => r.getString(0) -> r).toMap
    assert(out2("A").getDouble(4) === 0.5)
    assert(out2("A").getLong(3) === 1L)
    // crit at n = m = 2: 1.358 * sqrt(4/4) = 1.358 -> not drifted
    assert(!out2("A").getBoolean(6))
    // identical samples -> D = 0
    val out3 = EvalOps.ksTest(
      Seq(("A", 1L), ("A", 2L), ("B", 1L), ("B", 2L)).toDF("g", "v"),
      "g", "v").collect().map(r => r.getString(0) -> r).toMap
    assert(out3("A").getDouble(4) === 0.0)
  }

  test("bhSelect: step-up includes a rank that fails its own threshold " +
      "when a later rank passes") {
    import spark.implicits._
    // m = 10, alpha = 0.05 -> crit(i) = 0.005 i. Sorted p: rank 2
    // (0.011 > 0.010) fails its own line but rank 4 (0.019 <= 0.020)
    // passes, so k* = 4 and ranks 1..4 are ALL discoveries - the
    // step-up property that distinguishes BH from Holm/step-down
    val p6 = Seq(1000L, 11000L, 12000L, 19000L, 110000L, 200000L,
      300000L, 400000L, 500000L, 600000L)
    val tests = p6.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("test_id", "p6")
    val out = EvalOps.bhSelect(tests, "test_id", "p6")
      .collect().map(r => r.getLong(2) -> r.getBoolean(4)).toMap
    assert((1L to 4L).forall(out(_)), s"ranks 1-4 discovered: $out")
    assert((5L to 10L).forall(!out(_)), s"ranks 5-10 not: $out")
    // all p = 1: zero discoveries (kstar = 0 path)
    val none = EvalOps.bhSelect(
      Seq((1L, 1000000L), (2L, 1000000L)).toDF("test_id", "p6"),
      "test_id", "p6").collect()
    assert(none.forall(!_.getBoolean(4)))
  }

  test("krippendorffAlpha: perfect agreement gives alpha 1, singleton " +
      "units are excluded, hand case matches a BigInt replay") {
    import spark.implicits._
    // perfect agreement on 4 units (2-3 raters each) + one singleton
    // unit that must not count
    val perfect = Seq(
      ("s", 1L, 0L, 2L), ("s", 1L, 1L, 2L), ("s", 1L, 2L, 2L),
      ("s", 2L, 0L, 3L), ("s", 2L, 1L, 3L),
      ("s", 3L, 0L, 2L), ("s", 3L, 1L, 2L),
      ("s", 4L, 0L, 3L), ("s", 4L, 1L, 3L), ("s", 4L, 2L, 3L),
      ("s", 9L, 0L, 1L)) // singleton: one rating only
      .toDF("source", "item_id", "rater", "cat")
    val p = EvalOps.krippendorffAlpha(perfect).collect().head
    assert(p.getLong(1) === 4L, "singleton unit excluded from n_units")
    assert(p.getLong(2) === 10L, "and from the pooled ratings")
    assert(p.getDouble(3) === 0.0, "perfect agreement: D_obs = 0")
    assert(p.getDouble(5) === 1.0, "alpha = 1")
    // mixed hand case, checked against an independent BigInt replay of
    // the documented quantization
    val mixed = Seq(
      ("s", 1L, 0L, 0L), ("s", 1L, 1L, 0L), ("s", 1L, 2L, 1L),
      ("s", 2L, 0L, 1L), ("s", 2L, 1L, 1L),
      ("s", 3L, 0L, 0L), ("s", 3L, 1L, 2L))
      .toDF("source", "item_id", "rater", "cat")
    val g = EvalOps.krippendorffAlpha(mixed).collect().head
    // unit 1: m=3, counts {0:2, 1:1} -> m^2 - s2 = 9 - 5 = 4, /(m-1)=2
    //   -> du6 = 2000000; unit 2: m=2 {1:2} -> 0; unit 3: m=2 {0,2}
    //   -> (4-2)/1 = 2 -> du6 = 2000000
    // Do6 = 4000000 div 7 = 571428
    // totals over included: n=7, nc = {0:3, 1:3, 2:1}
    //   x = 3*4 + 3*4 + 1*6 = 30
    //   de6 = ((30 div 7)*1e6 + (30%7)*1e6 div 7) div 6 = (4000000 +
    //   285714) div 6 = 714285
    // alpha6 = (714285 - 571428)*1e6 div 714285 = 142857000000/714285
    //   = exactly 200000
    assert(g.getDouble(3) === 0.571428)
    assert(g.getDouble(4) === 0.714285)
    assert(g.getDouble(5) === 0.2)
  }

  test("cohenKappaMatrix: hand po/pe/kappa incl. a below-chance negative " +
      "pair and the undefined pe=1 case") {
    import spark.implicits._
    // raters 0/1 on items 1-4: cats (0,0),(1,1),(0,1),(2,2) -> agree 3/4
    // rater 2: (1,0,1,0) -> vs rater 0 agree 0 (below chance)
    // rater 3: constant cat 0; rater 4: constant cat 0 (pe = 1 -> NULL)
    val rows = Seq(
      ("s", 1L, 0, 0L), ("s", 2L, 0, 1L), ("s", 3L, 0, 0L), ("s", 4L, 0, 2L),
      ("s", 1L, 1, 0L), ("s", 2L, 1, 1L), ("s", 3L, 1, 1L), ("s", 4L, 1, 2L),
      ("s", 1L, 2, 1L), ("s", 2L, 2, 0L), ("s", 3L, 2, 1L), ("s", 4L, 2, 0L),
      ("s", 1L, 3, 0L), ("s", 2L, 3, 0L), ("s", 3L, 3, 0L), ("s", 4L, 3, 0L),
      ("s", 1L, 4, 0L), ("s", 2L, 4, 0L), ("s", 3L, 4, 0L), ("s", 4L, 4, 0L))
      .toDF("source", "item_id", "rater", "cat")
    val out = EvalOps.cohenKappaMatrix(rows).collect()
      .map(r => (r.getInt(1), r.getInt(2)) -> r).toMap
    // (0,1): po6 750000; marginals a{0:2,1:1,2:1} b{0:1,1:2,2:1} ->
    // x = 2+2+1 = 5 -> pe6 = (1250000) div 4 = 312500;
    // kappa6 = 437500*1e6 div 687500 = 636363
    val r01 = out((0, 1))
    assert(r01.getDouble(4) === 0.75 && r01.getDouble(5) === 0.3125)
    assert(r01.getDouble(6) === 0.636363)
    // (0,2): agree 0; a{0:2,1:1,2:1} c{0:2,1:2} -> x = 4+2 = 6 ->
    // pe6 = 1500000 div 4 = 375000; kappa6 = -375000*1e6 div 625000 = -0.6
    val r02 = out((0, 2))
    assert(r02.getDouble(4) === 0.0 && r02.getDouble(6) === -0.6)
    // (3,4): both constant same cat -> po 1, pe 1 -> kappa undefined
    val r34 = out((3, 4))
    assert(r34.getDouble(4) === 1.0 && r34.getDouble(5) === 1.0)
    assert(r34.isNullAt(6), "pe = 1 leaves kappa undefined")
    assert(out.size === 10, "all 5-choose-2 pairs present")
  }

  test("mannWhitney: hand rank sums with ties, closed-form z, complement " +
      "symmetry, all-tied NULL, separation significance") {
    import spark.implicits._
    // a = {1, 2, 2, 5}, b = {2, 3, 4}: doubled midranks 2/6/10/12/14,
    // R2(a) = 2+6+6+14 = 28, 2U1(a) = 28 - 4*5 = 8 (direct count: one 5
    // beats all three b's = 3, two 2-vs-2 half-ties = 1 -> U1 = 4)
    val df = (Seq(1, 2, 2, 5).map(("a", _)) ++ Seq(2, 3, 4).map(("b", _)))
      .toDF("g", "v")
    val out = EvalOps.mannWhitney(df, "g", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getLong(1) === 4L && a.getLong(2) === 3L)
    assert(a.getLong(3) === 8L, "2U1 from doubled midranks")
    // 4Var = n1*n2*(N^3 - N - T) div (3N(N-1)) with T = 2^3-2 for the
    // tied triple = 24: 12*312 div 126 = 29; z6 = floor(-4e6/sqrt(29))
    assert(a.getDouble(4) === -0.742782, "closed-form tie-corrected z")
    assert(a.getDouble(5) === -0.333333, "rank-biserial truncates toward 0")
    assert(!a.getBoolean(6), "not significant at n = 7")
    // complement: 2U1(b) = 2*n1*n2 - 2U1(a); rb flips sign exactly
    val b = out("b")
    assert(b.getLong(3) === 16L && b.getDouble(5) === 0.333333)
    assert(math.abs(a.getDouble(4) + b.getDouble(4)) <= 2e-6,
      "z antisymmetric up to the two floors")
    // all-tied corpus: variance 0 -> z and shifted NULL, rb 0
    val tied = Seq(("a", 7), ("a", 7), ("b", 7), ("b", 7)).toDF("g", "v")
    val t = EvalOps.mannWhitney(tied, "g", "v").collect()
    t.foreach { r =>
      assert(r.isNullAt(4) && r.isNullAt(6), "all-tied: z undefined")
      assert(r.getDouble(5) === 0.0, "all-tied: zero effect")
    }
    // clear separation at n = 200: shifted, effect size pinned at -1/+1
    val sep = ((1 to 100).map(("lo", _)) ++ (1001 to 1100).map(("hi", _)))
      .toDF("g", "v")
    val s = EvalOps.mannWhitney(sep, "g", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(s("lo").getDouble(5) === -1.0 && s("hi").getDouble(5) === 1.0)
    assert(s("lo").getBoolean(6) && s("hi").getBoolean(6), "separation is significant")
    assert(s("lo").getDouble(4) < -12 && s("hi").getDouble(4) > 12)
  }

  test("logRank: censoring semantics, exact-integer chi2 replay, " +
      "separation significance, identical groups near-zero") {
    import spark.implicits._
    // hand fixture: A = {1 obs, 2 cens}, B = {2 obs}
    //   t=1: n=3 (all at risk), d=1 (A's event), nA=2
    //     e6 = 1*2*1e6 div 3 = 666666; v6 = 1*2*1*2*1e6 div (9*2) = 222222
    //   t=2: n=2 (A-cens + B), d=1 (B's event), nA=1
    //     e6 = 1*1*1e6 div 2 = 500000; v6 = 1*1*1*1*1e6 div (4*1) = 250000
    //   O_A = 1, E6 = 1166666, V6 = 472222
    //   chi26 = (1000000-1166666)^2 div 472222 = 58823*... exact below
    val units = Seq(("A", 1L, true), ("A", 2L, false), ("B", 2L, true))
      .toDF("g", "dur", "obs")
    val r = EvalOps.logRank(units, "g", "dur", "obs").collect()(0)
    assert(r.getString(0) === "A" && r.getString(1) === "B")
    assert(r.getLong(2) === 2L && r.getLong(3) === 1L)
    assert(r.getLong(4) === 1L && r.getLong(5) === 2L)
    assert(r.getDouble(6) === 1.166666, "E_A from quantized per-time sums")
    val d = BigInt(1000000 - 1166666)
    assert(r.getDouble(7) === (d * d / 472222).toLong / 1e6,
      "chi2 replays the exact integer chain")
    assert(!r.getBoolean(8))
    // identical survival in both groups: chi2 ~ 0
    val same = (1 to 50).flatMap(i =>
      Seq(("A", i.toLong, true), ("B", i.toLong, true))).toDF("g", "dur", "obs")
    val rs = EvalOps.logRank(same, "g", "dur", "obs").collect()(0)
    assert(rs.getDouble(7) <= 0.000001 && !rs.getBoolean(8))
    // full separation (every A dies at 1, every B survives past 100)
    val sepu = ((1 to 50).map(_ => ("A", 1L, true)) ++
      (1 to 50).map(_ => ("B", 100L, false))).toDF("g", "dur", "obs")
    val rp = EvalOps.logRank(sepu, "g", "dur", "obs").collect()(0)
    assert(rp.getBoolean(8), s"separation must be significant: $rp")
    // censoring semantics: flipping A's censored unit to observed moves
    // expected_a (it becomes an event at t=2) — the obs column is load-
    // bearing, not cosmetic
    val units2 = Seq(("A", 1L, true), ("A", 2L, true), ("B", 2L, true))
      .toDF("g", "dur", "obs")
    val r2 = EvalOps.logRank(units2, "g", "dur", "obs").collect()(0)
    assert(r2.getLong(4) === 2L && r2.getDouble(6) != r.getDouble(6))
    // exactly-two-groups contract
    val e = intercept[IllegalArgumentException] {
      EvalOps.logRank(units.withColumn("g", lit("only")), "g", "dur", "obs")
    }
    assert(e.getMessage.contains("exactly two groups"))
  }

  test("kendallTauB: perfect agreement/reversal, hand tie case, " +
      "all-tied NULL") {
    import spark.implicits._
    // perfect agreement and perfect reversal, no ties
    val mono = (1 to 10).map(i => ("up", i, i)) ++
      (1 to 10).map(i => ("down", i, -i))
    val m = EvalOps.kendallTauB(mono.toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m("up").getDouble(6) === 1.0 && m("down").getDouble(6) === -1.0)
    assert(m("up").getLong(2) === 45L && m("up").getLong(3) === 0L)
    // hand tie case: (1,1),(1,2),(2,1),(2,2),(2,2): n=5, n0=10
    //   cells: (1,1)x(2,2):2 + (1,1)x(2,1)? y tied-> no; (1,2)x(2,?) ...
    //   concordant: (1,1)-(2,2) c=2; discordant: (1,2)-(2,1) c=1
    //   ties_x: x=1 ct2 ->1; x=2 ct3 ->3 => 4; ties_y: y=1 ct2 ->1, y=2 ct3 ->3 => 4
    //   tau6 = floor((2-1)*1e6 / (sqrt(6)*sqrt(6))) = 166666
    val tiedf = Seq((1, 1), (1, 2), (2, 1), (2, 2), (2, 2))
      .map { case (x, y) => ("t", x, y) }.toDF("g", "x", "y")
    val t = EvalOps.kendallTauB(tiedf, "g", "x", "y").collect()(0)
    assert(t.getLong(1) === 5L && t.getLong(2) === 2L && t.getLong(3) === 1L)
    assert(t.getLong(4) === 4L && t.getLong(5) === 4L)
    assert(t.getDouble(6) === 0.166666, "hand tau-b with tie terms")
    // all x tied: denominator term zero -> NULL
    val ax = Seq(("c", 1, 1), ("c", 1, 2), ("c", 1, 3)).toDF("g", "x", "y")
    val ar = EvalOps.kendallTauB(ax, "g", "x", "y").collect()(0)
    assert(ar.isNullAt(6), "x all-tied leaves tau undefined")
    assert(ar.getLong(2) === 0L && ar.getLong(3) === 0L)
  }

  test("cochranArmitage: hand 2xk table, exact T*N and variance floor, " +
      "degenerate NULLs") {
    import spark.implicits._
    // buckets 0/1/2 with (n, flagged) = (10,1), (10,5), (10,9):
    //   N=30, N1=15, Sw=30, Sw1=23, Sww=50
    //   T*N = 30*23 - 15*30 = 240
    //   v = 15*15*(30*50 - 900) div 30 = 135000 div 30 = 4500
    //   z6 = floor(240e6 / sqrt(4500)) = 3577708
    val rows = (1 to 10).flatMap(i => Seq(
      ("s", 0L, i <= 1), ("s", 1L, i <= 5), ("s", 2L, i <= 9)))
    val out = EvalOps.cochranArmitage(rows.toDF("g", "w", "f"),
      "g", "w", "f").collect()(0)
    assert(out.getLong(1) === 30L && out.getLong(2) === 15L)
    assert(out.getLong(3) === 240L, "exact T*N")
    assert(out.getDouble(4) === 3.577708, "closed-form z from v = 4500")
    assert(out.getBoolean(5), "a 10%->90% ramp trends")
    // flat rates: T*N = 0, z = 0, no trend
    val flat = (1 to 10).flatMap(i => Seq(
      ("s", 0L, i <= 5), ("s", 1L, i <= 5), ("s", 2L, i <= 5)))
    val fo = EvalOps.cochranArmitage(flat.toDF("g", "w", "f"),
      "g", "w", "f").collect()(0)
    assert(fo.getLong(3) === 0L && fo.getDouble(4) === 0.0 &&
      !fo.getBoolean(5))
    // degenerate: all-flagged (variance 0) and single-bucket -> NULL
    val deg = Seq(("a", 0L, true), ("a", 1L, true),
      ("b", 1L, true), ("b", 1L, false)).toDF("g", "w", "f")
    EvalOps.cochranArmitage(deg, "g", "w", "f").collect().foreach { r =>
      assert(r.isNullAt(4) && r.isNullAt(5),
        s"degenerate group must report NULL: $r")
    }
  }

  test("kruskalWallis: hand doubled-rank H with tie correction, " +
      "Wilson-Hilferty critical value, all-tied NULL, separation") {
    // a={1,2}, b={2,3}, c={5}: rank2 = 2/5/5/8/10, R2 = 7/13/10,
    // term6 = 49e6 div 8 / 169e6 div 8 / 100e6 div 4, sum6 = 52_250_000
    // H6 = 12*sum6 div 30 - 18e6 = 2_900_000; T = 6, N3-N = 120
    // Hadj6 = 2_900_000*120 div 114 = 3_052_631
    val df = (Seq(1L, 2L).map(("a", _)) ++ Seq(2L, 3L).map(("b", _))
      ++ Seq(5L).map(("c", _))).map { case (g, v) => ("s", g, v) }
      .toDF("slice", "g", "v")
    val r = EvalOps.kruskalWallis(df, "slice", "g", "v").collect().head
    assert(r.getLong(1) === 3L && r.getLong(2) === 5L)
    assert(r.getDouble(3) === 3.052631, "tie-corrected H from exact chain")
    // WH at nu=2: 2*(1 - 1/9 + 1.6449*sqrt(1/9))^3 ~ 5.937 (true 5.991)
    assert(math.abs(r.getDouble(4) - 5.991) < 0.06, s"crit ${r.getDouble(4)}")
    assert(!r.getBoolean(5), "H below critical at n=5")
    // all-tied slice: C = 0 -> NULL H and verdict
    val tied = Seq(("s", "a", 7L), ("s", "a", 7L), ("s", "b", 7L))
      .toDF("slice", "g", "v")
    val t = EvalOps.kruskalWallis(tied, "slice", "g", "v").collect().head
    assert(t.isNullAt(3) && t.isNullAt(5), "all-tied: H undefined")
    // three disjoint-range groups at n=90: H ~ chi2 far past crit
    val sep = ((1 to 30).map(v => ("s", "lo", v.toLong))
      ++ (101 to 130).map(v => ("s", "mid", v.toLong))
      ++ (201 to 230).map(v => ("s", "hi", v.toLong)))
      .toDF("slice", "g", "v")
    val sp = EvalOps.kruskalWallis(sep, "slice", "g", "v").collect().head
    assert(sp.getBoolean(5), "clean separation is significant")
    assert(sp.getDouble(3) > 70, s"near-max H, got ${sp.getDouble(3)}")
  }

  test("wasserstein1d: closed-form mass transport, identical-dist zero, " +
      "normalization, CDF-gap quantization") {
    // a = {0,0}, b = {10,10}: every doc moves 10 units -> W1 = 10 both
    val df = Seq(("a", 0L), ("a", 0L), ("b", 10L), ("b", 10L))
      .toDF("g", "v")
    val out = EvalOps.wasserstein1d(df, "g", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("a").getDouble(3) === 10.0 && out("b").getDouble(3) === 10.0)
    assert(out("a").getDouble(4) === 1.0, "normalized by range 10")
    // identical distributions: W1 exactly 0
    val same = Seq(("a", 0L), ("a", 10L), ("b", 0L), ("b", 10L))
      .toDF("g", "v")
    EvalOps.wasserstein1d(same, "g", "v").collect().foreach { r =>
      assert(r.getDouble(3) === 0.0 && r.getDouble(4) === 0.0)
    }
    // hand quantization: a={0}, b={0,5}: grid v=0: Fa=1, Fb=1/2 ->
    // gap6 = 1e6 - 500000, dv=5 -> w1 = 2.5
    val h = Seq(("a", 0L), ("b", 0L), ("b", 5L)).toDF("g", "v")
    val ha = EvalOps.wasserstein1d(h, "g", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(ha("a").getDouble(3) === 2.5)
    assert(ha("b").getDouble(3) === 2.5, "vs-rest symmetry on two groups")
  }

  test("psiDrift: single-group exact zero, matched distributions stay " +
      "under watch line, planted shift crosses 0.2, bucket determinism") {
    // one group IS the baseline: every p == q -> psi exactly 0
    val solo = (1L to 10L).map(("only", _)).toDF("g", "v")
    val s = EvalOps.psiDrift(solo, "g", "v").collect().head
    assert(s.getDouble(2) === 0.0 && !s.getBoolean(3))
    // two identical groups: smoothing-only wobble, far under 0.1
    val same = (1L to 50L).flatMap(v => Seq(("a", v), ("b", v)))
      .toDF("g", "v")
    EvalOps.psiDrift(same, "g", "v").collect().foreach { r =>
      assert(r.getDouble(2) < 0.01, s"matched dist psi ${r.getDouble(2)}")
      assert(!r.getBoolean(3))
    }
    // planted shift: a owns the low half, b the high half -> both act
    val shift = ((1L to 50L).map(("a", _)) ++ (51L to 100L).map(("b", _)))
      .toDF("g", "v")
    EvalOps.psiDrift(shift, "g", "v").collect().foreach { r =>
      assert(r.getDouble(2) > 0.2 && r.getBoolean(3),
        s"disjoint halves must trip the action line: $r")
    }
  }

  test("cmhTest: hand two-strata chain (consistent OR 2.25, chi2 " +
      "0.745098), separation significance, degenerate stratum") {
    import spark.implicits._
    // S1: T 9/1, C 8/2; S2: T 2/8, C 1/9 — per-stratum OR 2.25 both,
    // E6 = 8.5e6 + 1.5e6, V6 = 671052 x2, D = 1e6
    // chi2_6 = 1e12 div 1342104 = 745098; OR_MH = 1.8e6*1e6 div 8e5
    def rows(s: String, t: Boolean, y: Boolean, k: Int) =
      Seq.fill(k)((s, t, y))
    val df = (rows("s1", true, true, 9) ++ rows("s1", true, false, 1)
      ++ rows("s1", false, true, 8) ++ rows("s1", false, false, 2)
      ++ rows("s2", true, true, 2) ++ rows("s2", true, false, 8)
      ++ rows("s2", false, true, 1) ++ rows("s2", false, false, 9))
      .toDF("s", "t", "y")
    val r = EvalOps.cmhTest(df, "s", "t", "y").collect().head
    assert(r.getLong(0) === 2L && r.getLong(1) === 40L)
    assert(r.getDouble(2) === 0.745098, "exact integer chi2 chain")
    assert(r.getDouble(3) === 2.25, "MH common OR pools per-stratum 2.25")
    assert(!r.getBoolean(4))
    // strong within-stratum association -> significant
    val sep = (rows("a", true, true, 50) ++ rows("a", true, false, 5)
      ++ rows("a", false, true, 5) ++ rows("a", false, false, 50)
      ++ rows("b", true, true, 40) ++ rows("b", true, false, 10)
      ++ rows("b", false, true, 10) ++ rows("b", false, false, 40))
      .toDF("s", "t", "y")
    val sp = EvalOps.cmhTest(sep, "s", "t", "y").collect().head
    assert(sp.getBoolean(4) && sp.getDouble(2) > 50)
    // a single-cohort stratum contributes zero variance, no crash
    val deg = (rows("only_t", true, true, 3) ++ rows("only_t", true, false, 2)
      ++ rows("mixed", true, true, 4) ++ rows("mixed", true, false, 1)
      ++ rows("mixed", false, true, 1) ++ rows("mixed", false, false, 4))
      .toDF("s", "t", "y")
    val dg = EvalOps.cmhTest(deg, "s", "t", "y").collect().head
    assert(dg.getLong(0) === 2L && dg.getDouble(2) > 0)
  }

  test("isotonicCalibration: violator pooling to the pooled mean, " +
      "monotone input unchanged, fitted sequence always monotone") {
    // bin0 rate 1.0, bin1 rate 0.0 -> PAV pools both to 2/4 = 0.5
    val pool = Seq(("s", 10000L, true), ("s", 20000L, true),
      ("s", 60000L, false), ("s", 70000L, false))
      .toDF("source", "conf6", "correct")
    val p = EvalOps.isotonicCalibration(pool).collect()
      .map(r => r.getLong(1) -> r).toMap
    assert(p(0L).getDouble(4) === 1.0 && p(1L).getDouble(4) === 0.0)
    assert(p(0L).getDouble(5) === 0.5 && p(1L).getDouble(5) === 0.5,
      "adjacent violators pool to the weighted mean")
    // already-monotone rates are a fixpoint
    val mono = Seq(("s", 10000L, false), ("s", 10001L, false),
      ("s", 60000L, true), ("s", 60001L, false),
      ("s", 960000L, true), ("s", 960001L, true))
      .toDF("source", "conf6", "correct")
    val m = EvalOps.isotonicCalibration(mono).collect()
      .map(r => r.getLong(1) -> r).toMap
    assert(m(0L).getDouble(5) === 0.0 && m(1L).getDouble(5) === 0.5
      && m(19L).getDouble(5) === 1.0, "monotone input: fitted == raw")
    // fixture predictions: fitted must be nondecreasing within source
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val fit = EvalOps.isotonicCalibration(EvalOps.predictions(docs))
      .orderBy(col("source"), col("bin")).collect()
    fit.groupBy(_.getString(0)).foreach { case (src, rows) =>
      val fs = rows.sortBy(_.getLong(1)).map(_.getDouble(5))
      assert(fs.zip(fs.tail).forall { case (a, b) => a <= b },
        s"non-monotone fit for $src: ${fs.mkString(",")}")
    }
  }

  test("ansariBradley: folded scores on a hand census, tail group reads " +
      "negative z; covering group positive") {
    import spark.implicits._
    // values 1,4,5,6,10 (c=1 each), N=5: doubled scores a2 = 6-|2r-6|
    // = [2,4,6,4,2]; group a = {1,10} owns the tails: S2=4, T2=18,
    // Q4=76; num = N*S2 - ng*T2 = -16; var4 = 6*(5*76-324) div 100 = 3
    // z6 = floor(-16e6 / (5*sqrt(3)))
    val df = Seq(("a", 1L), ("a", 10L), ("b", 4L), ("b", 5L), ("b", 6L))
      .toDF("g", "v")
    val r = graft.operators.EvalOps.ansariBradley(df, "g", "v")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("a").getAs[Long]("ab2") === 4L)
    val want = math.floor(-16e6 / (5.0 * math.sqrt(3.0))).toLong
    assert(r("a").getAs[Long]("z6") === want)
    assert(!r("a").getAs[Boolean]("spread_differs"))
    // the mirror group: S2=14, num = 5*14 - 3*18 = +16, same var4 = 3
    // (floor is NOT antisymmetric: floor(+x) = -floor(-x) - 1 here)
    val wantB = math.floor(16e6 / (5.0 * math.sqrt(3.0))).toLong
    assert(r("b").getAs[Long]("z6") === wantB)
    // single distinct value: zero variance -> NULL
    val z = Seq(("a", 5L), ("b", 5L)).toDF("g", "v")
    val zr = graft.operators.EvalOps.ansariBradley(z, "g", "v")
      .collect().head
    assert(zr.isNullAt(zr.fieldIndex("z6")))
  }

  test("gwetAC1: closed-form on a hand census, and the kappa paradox — " +
      "skewed prevalence zeroes Fleiss but not AC1") {
    import spark.implicits._
    // 2 items x 2 raters: item 1 agrees on cat 0, item 2 splits
    // paN=2 paD=4 nr=4 C=(3,1) eN=16-10=6 eD=16
    // AC1_6 = (2*16 - 6*4)*1e6 div (4*10) = 200000
    val small = Seq((1L, 0L, 0L), (1L, 1L, 0L), (2L, 0L, 0L), (2L, 1L, 1L))
      .map { case (i, r, c) => ("s", i, r, c) }
      .toDF("source", "item_id", "rater", "cat")
    val a = graft.operators.EvalOps.gwetAC1(small).collect().head
    assert(a.getAs[Long]("ac1_6") === 200000L)
    // the paradox fixture: 9/10 items unanimous majority class, 1 split
    // -> raw agreement 0.9, but Fleiss pe = 0.905 makes kappa NEGATIVE
    // while AC1's uncertainty-based pe = 0.095 reads the agreement:
    // AC1_6 = (18*400 - 38*20)*1e6 div (20*362) = 889502
    val skew = ((1L to 9L).flatMap(i => Seq((i, 0L, 0L), (i, 1L, 0L)))
      ++ Seq((10L, 0L, 0L), (10L, 1L, 1L)))
      .map { case (i, r, c) => ("s", i, r, c) }
      .toDF("source", "item_id", "rater", "cat")
    val g = graft.operators.EvalOps.gwetAC1(skew).collect().head
    assert(g.getAs[Long]("ac1_6") === 889502L)
    val f = graft.operators.EvalOps.fleissKappa(skew).collect().head
    assert(f.getAs[Double]("kappa") < 0.0,
      "Fleiss must show the paradox on this fixture")
    // all mass in one category: ed = en -> NULL
    val mono = Seq(("s", 1L, 0L, 0L), ("s", 1L, 1L, 0L))
      .toDF("source", "item_id", "rater", "cat")
    val m = graft.operators.EvalOps.gwetAC1(mono).collect().head
    assert(m.isNullAt(m.fieldIndex("ac1_6")))
  }

  test("randolphKappa: chance-level reads 0, perfect reads 1e6, " +
      "one-category NULL, double-floor replay") {
    // A: item1 unanimous, item2 split, q=2 -> pbar6=500000,
    // kfree = 2*0.5-1 = 0 (agreement exactly at the 1/q floor)
    // B: both items unanimous over two cats -> pbar6=1e6, kfree=1e6
    // C: every rating cat0 -> q=1 -> NULL
    val r = Seq(
      ("A", 1L, 0L, 0L), ("A", 1L, 1L, 0L),
      ("A", 2L, 0L, 0L), ("A", 2L, 1L, 1L),
      ("B", 1L, 0L, 0L), ("B", 1L, 1L, 0L),
      ("B", 2L, 0L, 1L), ("B", 2L, 1L, 1L),
      ("C", 1L, 0L, 0L), ("C", 1L, 1L, 0L))
      .toDF("source", "item_id", "rater", "cat")
    val out = EvalOps.randolphKappa(r).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(out("A").getAs[Long]("pbar6") === 500000L)
    assert(out("A").getAs[Long]("kfree6") === 0L)
    assert(out("B").getAs[Long]("kfree6") === 1000000L)
    assert(out("C").isNullAt(out("C").fieldIndex("kfree6")))
    // the double-floor contract: kfree6 derives from the quantized
    // pbar6, never from a fresh exact ratio
    out.values.filterNot(_.isNullAt(out("A").fieldIndex("kfree6")))
      .foreach { x =>
        val q = x.getAs[Long]("n_cats")
        assert(x.getAs[Long]("kfree6") ===
          (x.getAs[Long]("pbar6") * q - 1000000L) / (q - 1L))
      }
  }

  test("bowker: per-pair floored terms, observed df, planted asymmetry " +
      "flagged, concordant-only NULL") {
    def rows(src: String, cells: ((Long, Long), Int)*): Seq[(String, Long, Long, Long)] =
      cells.zipWithIndex.flatMap { case (((a, b), n), i) =>
        (0 until n).map(k => (src, i * 1000L + k, a, b))
      }
    // S: n01=3, n10=1, n12=2, n21=2, pair (0,2) empty -> df=2,
    // chi2_6 = floor(4e6/4) + 0 = 1e6, below WH chi2(2) -> symmetric
    // T: n01=10, n10=0 -> df=1, chi2_6 = 10e6 > WH chi2(1) -> asymmetric
    // U: all concordant (diagonal only) -> df=0 -> NULL
    val paired = (rows("S", (0L, 1L) -> 3, (1L, 0L) -> 1,
        (1L, 2L) -> 2, (2L, 1L) -> 2, (0L, 0L) -> 5)
      ++ rows("T", (0L, 1L) -> 10, (2L, 2L) -> 3)
      ++ rows("U", (0L, 0L) -> 4, (1L, 1L) -> 4))
      .toDF("source", "task_id", "cat_a", "cat_b")
    val out = EvalOps.bowker(paired, nCats = 3).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(out("S").getAs[Long]("df") === 2L)
    assert(out("S").getAs[Long]("chi2_6") === 1000000L)
    assert(!out("S").getAs[Boolean]("asymmetric"))
    assert(out("T").getAs[Long]("df") === 1L)
    assert(out("T").getAs[Long]("chi2_6") === 10000000L)
    assert(out("T").getAs[Boolean]("asymmetric"))
    assert(out("U").getAs[Long]("df") === 0L)
    assert(out("U").isNullAt(out("U").fieldIndex("chi2_6")))
    assert(out("U").isNullAt(out("U").fieldIndex("asymmetric")))
  }

  test("cvmTest: exact one-floor T on a hand grid, symmetric across " +
      "the two-group split, whole-corpus group NULL") {
    // A = {1,1,2}, B = {2,3}: dInt over pooled values (1,2,3) =
    // (4,3,0) from A's side; sum ct*d^2 = 2*16+2*9 = 50
    // T6(A) = 50e6 div (25*3*2) = 333333 ; T6(B) identical (d mirrors)
    val df = Seq(("A", 1L), ("A", 1L), ("A", 2L), ("B", 2L), ("B", 3L))
      .toDF("g", "v")
    val out = EvalOps.cvmTest(df, "g", "v").collect()
      .map(x => x.getString(0) -> x).toMap
    assert(out("A").getAs[Long]("cvm6") === 333333L)
    assert(out("B").getAs[Long]("cvm6") === 333333L)
    assert(!out("A").getAs[Boolean]("differs"), "0.33 < 0.461")
    val solo = Seq(("A", 1L), ("A", 2L)).toDF("g", "v")
    val s = EvalOps.cvmTest(solo, "g", "v").collect().head
    assert(s.isNullAt(s.fieldIndex("cvm6")))
  }

  test("wilcoxonSignedRank: hand census with a zero drop and a " +
      "midrank tie, exact W2/E2/var12 chain; all-tied source drops") {
    // s diffs: +1, +2, +3, -1, 0(dropped) -> |d| ranks2 {1:3, 2:6, 3:8}
    // W2 = 3+6+8 = 17, m = 4, E2 = 10, 12Var = 2*4*5*9 - 6 = 354
    val paired = Seq(
      ("s", 1L, 0L, 1L), ("s", 2L, 0L, 2L), ("s", 3L, 0L, 3L),
      ("s", 4L, 10L, 9L), ("s", 5L, 5L, 5L),
      ("t", 6L, 7L, 7L), ("t", 7L, 3L, 3L))
      .toDF("source", "task_id", "score_a6", "score_b6")
    val out = EvalOps.wilcoxonSignedRank(paired).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(!out.contains("t"), "all-zero-diff source must drop")
    val s = out("s")
    assert(s.getAs[Long]("n_pairs") === 4L)
    assert(s.getAs[Long]("w2") === 17L)
    assert(s.getAs[Long]("z6") ===
      math.floor(7.0 * 1e6 / math.sqrt(354.0 / 12.0)).toLong)
    assert(!s.getAs[Boolean]("shifted"))
    // the planted fixture has enough sign mixing to keep both sides
    val fx = EvalOps.pairedScores(
      Tables.documents(spark, "/root/testdata/sf0.001"))
    val d = fx.withColumn("_d", col("score_b6") - col("score_a6"))
    assert(d.filter(col("_d") > 0).count() > 0)
    assert(d.filter(col("_d") < 0).count() > 0)
    assert(d.filter(col("_d") === 0).count() > 0,
      "the zero-drop path must stay exercised")
  }

  test("ordinalAssociation: perfect concordance 1e6, reversal -1e6, " +
      "tie asymmetry splits d_yx from d_xy") {
    def words(n: Int): String = Seq.fill(n)("w").mkString(" ")
    val docs = Seq(
      // s: three docs, buckets (0,0) (1,1) (2,2) -> all concordant
      ("s", 1L, 0L, words(10)), ("s", 2L, 250L, words(35)),
      ("s", 3L, 450L, words(70)),
      // t: one discordant pair -> gamma = -1e6
      ("t", 4L, 0L, words(35)), ("t", 5L, 250L, words(10)),
      // u: both docs in x-bucket 0, different y -> no x-ordered pairs:
      // gamma NULL, d_yx NULL (no Y-tied pairs either), d_xy = 0
      // (the X-tied pair carries the whole d_xy denominator)
      ("u", 6L, 0L, words(10)), ("u", 7L, 50L, words(35)))
      .toDF("source", "doc_id", "n_chars", "text")
    val out = EvalOps.ordinalAssociation(docs).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(out("s").getAs[Long]("c2") === 6L)
    assert(out("s").getAs[Long]("d2") === 0L)
    assert(out("s").getAs[Long]("gamma6") === 1000000L)
    assert(out("s").getAs[Long]("dyx6") === 1000000L)
    assert(out("s").getAs[Long]("dxy6") === 1000000L)
    assert(out("t").getAs[Long]("gamma6") === -1000000L)
    assert(out("u").isNullAt(out("u").fieldIndex("gamma6")))
    assert(out("u").isNullAt(out("u").fieldIndex("dyx6")))
    assert(out("u").getAs[Long]("dxy6") === 0L)
  }

  test("rbo: identical rankers replay the exact per-depth floors, " +
      "head disagreement scores below full agreement") {
    // s: both rankers order doc1 > doc2 > doc3 (longer = more words)
    // u: 2 docs, identical order
    // t: 2 docs, rank-1 disagreement (chars and words reversed)
    val docs = Seq(
      ("s", 1L, 30L, "a b c"), ("s", 2L, 20L, "a b"), ("s", 3L, 10L, "a"),
      ("u", 4L, 30L, "a b"), ("u", 5L, 20L, "a"),
      ("t", 6L, 100L, "a"), ("t", 7L, 50L, "b c"))
      .toDF("source", "doc_id", "n_chars", "text")
    val out = EvalOps.rbo(docs).collect()
      .map(x => x.getString(0) -> x).toMap
    def expect(overlap: Int => Long): Long =
      (1 to 10).map { d =>
        overlap(d) * math.pow(9, d - 1).toLong * 1000000L /
          (d * math.pow(10, d).toLong)
      }.sum
    assert(out("s").getAs[Long]("n_common") === 3L)
    assert(out("s").getAs[Long]("rbo6") === expect(d => math.min(d, 3)))
    assert(out("s").getAs[Long]("rbo6") === 461247L)
    assert(out("u").getAs[Long]("rbo6") === expect(d => math.min(d, 2)))
    // t: rank 1 disagrees, both docs present from depth 2 on
    assert(out("t").getAs[Long]("rbo6") ===
      expect(d => if (d == 1) 0L else 2L))
    assert(out("t").getAs[Long]("rbo6") < out("u").getAs[Long]("rbo6"),
      "a head disagreement must cost more than deep-rank equality")
  }

  test("kuiper: D+ and D- exact, V one floor on the sum, the mirror " +
      "group swaps the sides, crit via the 1.747 band") {
    val df = Seq(("A", 1L), ("A", 1L), ("A", 2L), ("B", 2L), ("B", 3L))
      .toDF("g", "v")
    val out = EvalOps.kuiper(df, "g", "v").collect()
      .map(x => x.getString(0) -> x).toMap
    // A's ECDF sits above rest everywhere: D+ = 4/6, D- = 0
    assert(out("A").getAs[Long]("dplus6") === 666666L)
    assert(out("A").getAs[Long]("dminus6") === 0L)
    assert(out("A").getAs[Long]("v6") === 666666L)
    // B mirrors: the gap flips sign
    assert(out("B").getAs[Long]("dplus6") === 0L)
    assert(out("B").getAs[Long]("dminus6") === 666666L)
    assert(out("B").getAs[Long]("v6") === 666666L)
    assert(out("A").getAs[Long]("crit6") ===
      math.floor(1747000.0 * math.sqrt(5.0 / 6.0)).toLong)
    assert(!out("A").getAs[Boolean]("differs"))
  }
}
