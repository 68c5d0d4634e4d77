package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusOps, Dedup, Similarity}

/** Specs for the data-selection / tokenizer-accounting operators
  * (q91–q96): semantic properties the hash-equality oracle doesn't state
  * directly — sign/direction of the scores, selection bias, label
  * constraints, and determinism under repartitioning.
  */
class DataSelectionSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def embs = Tables.embeddings(spark, sf)

  test("dsirWeights: target-looking docs score high, raw-looking docs low") {
    import spark.implicits._
    // target slice speaks "aa bb", the rest speaks "zz ww"; doc 5 is a
    // target-dialect doc OUTSIDE the slice — DSIR should still rank it up
    val toy = Seq(
      (1L, "aa bb aa bb", "tgt"), (2L, "aa bb bb aa", "tgt"),
      (3L, "zz ww zz ww", "raw"), (4L, "zz ww ww zz", "raw"),
      (5L, "aa bb aa bb", "raw")
    ).toDF("doc_id", "text", "source")
    val out = CorpusOps.dsirWeights(toy, col("source") === "tgt")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(5L) > out(3L) && out(5L) > out(4L),
      s"target-dialect doc should outscore raw-dialect docs: $out")
    assert(out(1L) > 0 && out(3L) < 0,
      s"sign should follow the dialect: $out")
    assert(out(5L) === out(1L), "score depends on content, not slice membership")
  }

  test("bigramLmScore: predictable transitions score lower xent than rare ones") {
    import spark.implicits._
    val toy = Seq(
      (1L, "a b a b a b a b"), // transitions the corpus sees constantly
      (2L, "a b a b a b a b"),
      (3L, "b a b a b a b a"),
      (4L, "q z"),            // a transition seen exactly once
      (5L, "x")               // no transitions at all
    ).toDF("doc_id", "text")
    val out = CorpusOps.bigramLmScore(toy)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byId = out.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(byId(5L) === ((0L, 0.0)), "tokenless-transition doc reports zero")
    assert(byId(4L)._2 > byId(1L)._2,
      s"rare transition must cost more bits: $byId")
    assert(byId(1L) === byId(2L), "identical docs score identically")
  }

  test("weightedSample: deterministic, partitioning-independent, weight-biased") {
    import spark.implicits._
    val docs = (1L to 400L).map(i =>
      (i, if (i % 2 == 0) 100.0 else 1.0)).toDF("doc_id", "w")
    val a = CorpusOps.weightedSample(docs, 60, col("w"))
      .collect().map(_.getLong(0)).toSet
    val b = CorpusOps.weightedSample(docs.repartition(7), 60, col("w"))
      .collect().map(_.getLong(0)).toSet
    assert(a === b, "selection must not depend on partitioning")
    val heavy = a.count(_ % 2 == 0)
    assert(heavy > 45, s"100:1 weights should dominate the sample: $heavy/60")
    // zero/negative weights never selected
    val withZero = docs.withColumn("w",
      when(col("doc_id") <= 10, lit(0.0)).otherwise(col("w")))
    val c = CorpusOps.weightedSample(withZero, 60, col("w"))
      .collect().map(_.getLong(0)).toSet
    assert(c.forall(_ > 10), "zero-weight rows must be excluded")
  }

  test("hardNegatives: never same-label, ranks are contiguous, scores sorted") {
    val q = embs.filter(col("vec_id") < 5)
    val out = Similarity.hardNegatives(embs, q, k = 10).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getInt(1) !== r.getInt(3),
        s"hard negative shares the query label: $r")
      assert(r.getLong(0) !== r.getLong(2))
    }
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getLong(4))
      assert(byRank.map(_.getLong(4)).toSeq === (1L to rows.length).toSeq)
      val sims = byRank.map(_.getDouble(5)).toSeq
      assert(sims === sims.sorted.reverse, "cos_sim must be non-increasing")
    }
    // subset property: hard negatives are exactly brute-force top-k
    // restricted to different-label rows
    val brute = Similarity.bruteForceTopK(embs, q, 400).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    out.foreach { r =>
      assert(brute((r.getLong(0), r.getLong(2))) === r.getDouble(5),
        "scores must agree with the exact scorer")
    }
  }

  test("bpeEncode: merge accounting shrinks token counts, never below word count") {
    import spark.implicits._
    val toy = Seq(
      (1L, "low low low lower"),
      (2L, "newest newest widest"),
      (3L, "low newest")
    ).toDF("doc_id", "text")
    val enc0 = CorpusOps.bpeEncode(toy, merges = 0)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // zero merges = character tokenization: "low low low lower" = 3+3+3+5
    assert(enc0(1L) === ((4L, 14L)))
    assert(enc0(2L) === ((3L, 18L))) // 6 + 6 + 6 chars
    val enc8 = CorpusOps.bpeEncode(toy, merges = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    (1L to 3L).foreach { id =>
      assert(enc8(id)._2 < enc0(id)._2, s"merges must shrink doc $id")
      assert(enc8(id)._2 >= enc8(id)._1, "at least one token per word")
    }
  }

  test("textEmbed: order-free, deterministic, separates disjoint vocabularies") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val toy = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "delta gamma beta alpha"),   // permutation of doc 1
      (3L, "omega sigma theta kappa"),  // disjoint vocabulary
      (4L, "")                          // empty
    ).toDF("doc_id", "text")
    def vecs(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.textEmbed(df).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](2)).toMap
    val v = vecs(toy)
    assert(v(1L) === v(2L), "bag-of-words: permutation must not change the vector")
    assert(v(1L) !== v(3L), "disjoint vocabularies must separate")
    assert(v(4L) === Seq.fill(16)(0L), "empty doc embeds at the origin")
    assert(v === vecs(toy.repartition(5)), "partitioning-independent")
    // cosine geometry: the permuted pair is identical, the disjoint pair
    // should be far (JL preserves bag-of-words angles in expectation)
    def cos(a: Seq[Long], b: Seq[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    assert(cos(v(1L), v(2L)) === 1.0)
    assert(cos(v(1L), v(3L)) < 0.9)
    // the native jl_embed kernel must be BIT-identical to the original
    // HOF formulation it replaced (round-12 codegen promotion) — incl.
    // a multi-byte token exercising the code-point rolling hash
    val mixed = toy.union(Seq((5L, "caf\u00e9 na\u00efve \u4f60\u597d x"))
      .toDF("doc_id", "text"))
    val native = TextAnalysis.textEmbed(mixed).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Long](2))).toMap
    val hof = TextAnalysis.textEmbedHof(mixed).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Long](2))).toMap
    assert(native === hof, "native kernel must replay the HOF chain")
  }

  test("logregScore: separable labels get separated probabilities") {
    import spark.implicits._
    // long docs are positive, short docs negative — x2/x3 separate them
    val toy = (1L to 100L).map { i =>
      val pos = i % 2 == 0
      val text = if (pos) Seq.fill(80)("token").mkString(" ")
      else Seq.fill(5)("token").mkString(" ")
      (i, text, if (pos) "good" else "bad")
    }.toDF("doc_id", "text", "source")
    val out = CorpusOps.logregScore(toy, col("source") === "good",
      iters = 20, lr = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val posMin = out.filter(_._2 == 1L).map(_._3).min
    val negMax = out.filter(_._2 == 0L).map(_._3).max
    assert(posMin > negMax,
      s"20 GD iters should separate a separable set: posMin=$posMin negMax=$negMax")
    out.foreach(t => assert(t._3 >= 0.0 && t._3 <= 1.0))
  }

  test("sourceQuota: caps per source, keeps the best, plans WindowGroupLimit") {
    val docs = Tables.documents(spark, sf)
    val out = CorpusOps.sourceQuota(docs, cap = 3)
    val rows = out.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (src, rs) =>
      assert(rs.length <= 3, s"source $src over cap")
      assert(rs.map(_._4).sorted.toSeq === (1L to rs.length))
      // kept docs are the GLOBAL best of that source: nothing outside the
      // kept set scores strictly better than the worst kept doc
      val worstKept = rs.map(_._3).min
      val all = graft.operators.TextAnalysis.withQuality(docs)
        .filter(col("source") === src)
        .select(col("doc_id"), col("quality_score")).collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      val excluded = all.filterNot(a => rs.exists(_._2 == a._1))
      excluded.foreach { case (id, q) =>
        assert(q <= worstKept, s"excluded doc $id ($q) beats kept ($worstKept)") }
    }
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "cap filter should push into WindowGroupLimit")
  }

  test("tokenBudgetSelect: equals the single-global-window formulation") {
    val docs = Tables.documents(spark, sf)
    // naive reference: one global-order running sum (what the bucketed
    // version must reproduce exactly, for any rangeWidth)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("quality_score").desc, col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val naive = graft.operators.TextAnalysis.withQuality(docs)
      .select(col("doc_id"), col("quality_score"),
        size(graft.operators.TextAnalysis.wsTokens(col("text")))
          .cast("long").as("n_toks"))
      .withColumn("cum_toks", sum(col("n_toks")).over(w))
      .filter(col("cum_toks") <= 5000)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    for (rw <- Seq(7L, 100L, 100000L)) {
      val got = CorpusOps.tokenBudgetSelect(docs, budget = 5000, rangeWidth = rw)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
      assert(got.toSeq === naive.toSeq, s"rangeWidth=$rw diverges from naive")
    }
    // the budget is respected and binding: kept total <= budget, and the
    // best unkept doc would overflow it
    val keptTotal = naive.map(_._3).sum
    assert(keptTotal <= 5000 && naive.nonEmpty)
  }

  test("leakSafeSplit: near-dups share a split; the naive split straddles") {
    import spark.implicits._
    def bucket(id: Long): Long =
      ((id % 2147483648L) * 2654435761L) % 2147483647L % 100
    def naive(id: Long): String =
      if (bucket(id) < 80) "train" else if (bucket(id) < 90) "val" else "test"
    // two ids the naive per-document hash sends to DIFFERENT splits — the
    // exact leakage scenario the cluster-level assignment exists to close
    val a = (1L to 500L).find(naive(_) == "train").get
    val b = (1L to 500L).find(naive(_) == "test").get
    val nearDup = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (a, nearDup), (b, nearDup + " tail"),
      (900L, "completely unrelated text about astronomy and telescopes"),
      (901L, "another singleton document concerning maritime navigation")
    ).toDF("doc_id", "text")
    val out = CorpusOps.leakSafeSplit(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(naive(a) != naive(b), "fixture must exhibit the naive straddle")
    assert(out(a)._2 === out(b)._2, s"near-dups must share a split: $out")
    assert(out(a)._1 === math.min(a, b) && out(b)._1 === math.min(a, b),
      "pair members carry the component representative as cluster")
    assert(out(900L)._2 === naive(900L) && out(901L)._2 === naive(901L),
      "singletons degenerate to the per-document split")
    assert(out.size === 4)
  }

  test("leakSafeFolds: components share a fold, singletons hash their own " +
      "id, no near-dup pair straddles folds on the real fixture") {
    import spark.implicits._
    def bucket(id: Long, k: Int): Long =
      ((id % 2147483648L) * 2654435761L) % 2147483647L % k
    // a near-dup pair whose ids hash to DIFFERENT folds naively
    val a = (1L to 500L).find(bucket(_, 5) == 0L).get
    val b = (1L to 500L).find(bucket(_, 5) == 3L).get
    val nearDup = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (a, nearDup), (b, nearDup + " tail"),
      (900L, "completely unrelated text about astronomy and telescopes")
    ).toDF("doc_id", "text")
    val out = CorpusOps.leakSafeFolds(docs, k = 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(bucket(a, 5) != bucket(b, 5), "fixture exhibits the naive straddle")
    assert(out(a)._2 === out(b)._2, s"pair must share a fold: $out")
    assert(out(a)._2 === bucket(math.min(a, b), 5),
      "fold hashes the component representative")
    assert(out(900L)._2 === bucket(900L, 5), "singleton degenerates")
    // real fixture: no near-dup pair straddles any of the 5 folds
    val real = Tables.documents(spark, sf).select("doc_id", "text")
    val folds = CorpusOps.leakSafeFolds(real, k = 5)
    val pairs = graft.operators.Dedup.ngramJaccardPairs(real, 3, 0.8)
    val straddle = pairs
      .join(folds.select(col("doc_id").as("doc_a"), col("fold").as("fa")), "doc_a")
      .join(folds.select(col("doc_id").as("doc_b"), col("fold").as("fb")), "doc_b")
      .filter(col("fa") =!= col("fb")).count()
    assert(straddle === 0L, "a straddling pair means cross-fold leakage")
  }

  test("lossCurveFit: nested prefixes grow monotonically, more data " +
      "lowers holdout xent, the log-log slope is negative") {
    val docs = Tables.documents(spark, sf)
    val out = CorpusOps.lossCurveFit(docs, k = 5)
      .orderBy(col("checkpoint")).collect()
    assert(out.length === 5)
    val toks = out.map(_.getLong(1))
    assert(toks.zip(toks.tail).forall { case (a, b) => a < b },
      s"nested prefixes must strictly grow: ${toks.toSeq}")
    val nTrans = out.map(_.getLong(2)).distinct
    assert(nTrans.length === 1, "fixed holdout: same transitions per cp")
    val xents = out.map(_.getDouble(3))
    assert(xents.forall(_ > 0))
    assert(xents.last < xents.head,
      s"more data must lower holdout xent: ${xents.toSeq}")
    assert(out.head.getDouble(4) < 0, "log-log slope negative")
    val r2 = out.head.getDouble(5)
    assert(r2 >= 0 && r2 <= 1)
  }

  test("fairBudgetSelect: floors bank every source, fill is the best prefix") {
    val budget = 20000L
    val floorT = 500L
    val docs = Tables.documents(spark, sf)
    val out = CorpusOps.fairBudgetSelect(docs, budget, floorT).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3),
        r.getString(4)))
    assert(out.map(_._4).sum <= budget, "total spend must respect the budget")
    val srcAll = docs.select("source").distinct().collect()
      .map(_.getString(0)).toSet
    assert(out.filter(_._5 == "floor").map(_._2).toSet === srcAll,
      "every source must bank floor tokens on this fixture")

    // replay the contract in plain Scala from the scored corpus
    val scored = graft.operators.TextAnalysis.withQuality(docs)
      .select(col("doc_id"), col("source"), col("quality_score"),
        size(graft.operators.TextAnalysis.wsTokens(col("text")))
          .cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3)))
    val bySrc = scored.groupBy(_._2)
    val floorIds = bySrc.values.flatMap { rows =>
      var cum = 0L
      rows.sortBy(t => (-t._3, t._1)).takeWhile { t =>
        cum += t._4; cum <= floorT }
    }.map(_._1).toSet
    val spent = scored.filter(t => floorIds(t._1)).map(_._4).sum
    var cum = 0L
    val fillIds = scored.filterNot(t => floorIds(t._1))
      .sortBy(t => (-t._3, t._1))
      .takeWhile { t => cum += t._4; cum <= budget - spent }
      .map(_._1).toSet
    assert(out.filter(_._5 == "floor").map(_._1).toSet === floorIds)
    assert(out.filter(_._5 == "fill").map(_._1).toSet === fillIds)
  }

  test("curationReport: gate verdicts, conjunction, and first-fail order") {
    import spark.implicits._
    val good = "the quick brown fox jumps over the lazy dog and runs " +
      "through the forest with great speed while birds sing songs above"
    val docs = Seq(
      (1L, good, "en"),                       // passes every gate
      (5L, good, "en"),                       // exact dup of 1 -> dropped
      (6L, good + " extra", "zh"),            // lang gate
      (7L, good + " extra", "zh"),            // dup AND zh: exact_dup wins
      (8L, good + " contact me at john.doe@example.com", "en"), // pii gate
      (9L, "x y z", "en")                     // gopher battery fails
    ).toDF("doc_id", "text", "lang")
    val out = CorpusOps.curationReport(docs).collect().map { r =>
      r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4), r.getBoolean(5), r.getBoolean(6), r.getString(7)))
    }.toMap
    assert(out(1L) === ((true, true, true, true, true, true, "")))
    assert(out(5L)._1 === false && out(5L)._7 === "exact_dup")
    assert(out(6L)._2 === false && out(6L)._7 === "lang")
    assert(out(7L)._7 === "exact_dup",
      "evaluation order: exact_dup is reported before lang")
    assert(out(8L)._5 === false && out(8L)._7 === "pii")
    assert(out(9L)._3 === false && out(9L)._7 === "gopher")
    assert(out.forall { case (_, g) => g._6 === (g._7 == "") },
      "keep must hold exactly when no gate failed")
  }

  test("leakSafeSplit: no near-dup pair straddles splits on the real fixture") {
    val docs = Tables.documents(spark, sf)
    val split = CorpusOps.leakSafeSplit(docs)
    val pairs = Dedup.ngramJaccardPairs(docs, 3, 0.8)
    val straddle = pairs
      .join(split.select(col("doc_id").as("doc_a"), col("split").as("sa")),
        "doc_a")
      .join(split.select(col("doc_id").as("doc_b"), col("split").as("sb")),
        "doc_b")
      .filter(col("sa") =!= col("sb"))
      .count()
    assert(straddle === 0L, "a straddling near-dup pair means eval leakage")
  }

  test("splitLeakage: flags the naive split's straddles, certifies leakSafeSplit") {
    val docs = Tables.documents(spark, sf)
    val naive = docs.withColumn("split", CorpusOps.splitExpr(col("doc_id")))
    val naiveLeaks = CorpusOps.splitLeakage(naive).collect()
    assert(naiveLeaks.nonEmpty,
      "the per-document hash should straddle at least one near-dup pair here")
    assert(naiveLeaks.forall(r => r.getString(2) != r.getString(3)),
      "every reported pair must actually straddle")
    val safe = docs.join(
      CorpusOps.leakSafeSplit(docs).select("doc_id", "split"), "doc_id")
    assert(CorpusOps.splitLeakage(safe).count() === 0L,
      "the cluster-level assignment must certify clean")
  }

  test("pplBuckets: per-source integer-cut thirds, fluent head, rangeWidth-invariant") {
    import spark.implicits._
    // source A: 6 docs (even 2/2/2 cut); source B: 4 docs (2/1/1 cut);
    // fluency graded by how often the corpus repeats each transition
    val toy = Seq(
      (1L, "a b a b a b a b", "A"), (2L, "a b a b a b", "A"),
      (3L, "a b a b", "A"), (4L, "q z", "A"), (5L, "m n", "A"),
      (6L, "x", "A"),
      (11L, "a b a b a b", "B"), (12L, "a b", "B"), (13L, "q z", "B"),
      (14L, "y", "B")
    ).toDF("doc_id", "text", "source")
    val out = CorpusOps.pplBuckets(toy, rangeWidth = 2L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3), r.getString(4)))
    val a = out.filter(_._2 == "A")
    val b = out.filter(_._2 == "B")
    assert(a.groupBy(_._5).view.mapValues(_.length).toMap ===
      Map("head" -> 2, "middle" -> 2, "tail" -> 2))
    assert(b.groupBy(_._5).view.mapValues(_.length).toMap ===
      Map("head" -> 2, "middle" -> 1, "tail" -> 1))
    // ranks are an exact per-source permutation ordered by (xent2, doc_id)
    for (src <- Seq(a, b)) {
      val byRank = src.sortBy(_._4)
      assert(byRank.map(_._4).toSeq === (1L to src.length).toSeq)
      assert(byRank.map(r => (r._3, r._1)).toSeq ===
        src.map(r => (r._3, r._1)).sorted.toSeq,
        "rank order must be (xent2, doc_id)")
    }
    // every head xent2 ≤ every tail xent2 within a source
    for (src <- Seq(a, b)) {
      val head = src.filter(_._5 == "head").map(_._3)
      val tail = src.filter(_._5 == "tail").map(_._3)
      assert(head.max <= tail.min, s"head must be at least as fluent: $src")
    }
    // the bucketed-rank trick is formulation-invariant: any rangeWidth
    // (bucket granularity) yields the identical assignment
    val wide = CorpusOps.pplBuckets(toy, rangeWidth = 100000L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3), r.getString(4))).toSet
    assert(wide === out.toSet, "rangeWidth must not change any rank or bucket")
  }

  test("epochSchedule: small sources cap first, remainder waterfills, budget respected") {
    import spark.implicits._
    def words(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")
    // A: 16 tokens, B: 100, C: 10000 — ratios 4*sqrt(n) = 16 / 40 / 400,
    // so at 3x budget A and B hit the 4-epoch cap and C fills the rest
    val toy = (Seq((1L, words(16), "A"), (2L, words(100), "B")) ++
      (1 to 10).map(i => (10L + i, words(1000), "C"))).toDF("doc_id", "text", "source")
    val out = CorpusOps.epochSchedule(toy, budgetFactor = 3.0,
        maxEpochs = 4.0, alpha = 0.5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getBoolean(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out("A") === ((16L, true, 64L, 4.0)), s"A: ${out("A")}")
    assert(out("B") === ((100L, true, 400L, 4.0)), s"B: ${out("B")}")
    val (nC, cappedC, allocC, epochsC) = out("C")
    assert(nC === 10000L && !cappedC)
    // λ* = (3*10116 - 464) / 100 = 298.84; ×100 lands one ulp under
    // 29884 in binary, so the floor is 29883 — deterministically, in
    // every engine running the same double ops (the oracle replays this)
    assert(allocC === 29883L, s"C alloc: $allocC")
    assert(epochsC === 2.9883)
    // invariants: total ≤ budget, epochs ≤ cap, capped ⇔ exactly 4 epochs
    val totalAlloc = out.values.map(_._3).sum
    assert(totalAlloc <= (3.0 * 10116).toLong)
    out.values.foreach { case (_, capped, _, e) =>
      assert(e <= 4.0)
      assert(capped === (e === 4.0))
    }
    // saturated regime: budget above every cap → everyone at maxEpochs
    val sat = CorpusOps.epochSchedule(toy, budgetFactor = 10.0,
        maxEpochs = 2.0, alpha = 0.5)
      .collect().map(r => (r.getString(0), r.getBoolean(2), r.getLong(3)))
    sat.foreach { case (s, capped, alloc) =>
      assert(capped, s"$s must cap when the budget exceeds every cap")
      assert(alloc === out(s)._1 * 2, s"$s saturated alloc")
    }
  }

  test("bpeCompression: exact rollup of the per-doc encode accounting") {
    val docs = Tables.documents(spark, sf)
    val perDoc = graft.operators.CorpusOps.bpeEncode(docs, merges = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val meta = docs.select(col("doc_id"), col("source"), col("n_chars"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val expected = meta.toSeq.flatMap { case (id, (src, chars)) =>
      perDoc.get(id).map { case (w, t) => (src, w, t, chars) } }
      .groupBy(_._1).view.mapValues { rs =>
        (rs.map(_._2).sum, rs.map(_._3).sum, rs.map(_._4).sum) }.toMap
    val out = CorpusOps.bpeCompression(docs, merges = 8).collect()
    assert(out.map(_.getString(0)).toSet === expected.keySet)
    out.foreach { r =>
      val (w, t, c) = expected(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((w, t, c)),
        s"rollup mismatch for ${r.getString(0)}")
      assert(r.getDouble(4) === math.floor(c.toDouble / t * 10000) / 10000)
      assert(r.getDouble(5) === math.floor(t.toDouble / w * 10000) / 10000)
      assert(r.getDouble(5) >= 1.0, "every word is at least one token")
    }
  }

  test("doremiWeights: eta=0 is the share baseline, divergent source upweights") {
    import spark.implicits._
    // two sources speaking the corpus dialect, one speaking its own
    val toy = Seq(
      (1L, "aa bb cc dd", "s1"), (2L, "aa bb cc dd", "s1"),
      (3L, "aa bb cc dd", "s2"), (4L, "aa bb cc dd", "s2"),
      (5L, "xx yy xx yy", "odd"), (6L, "xx yy yy xx", "odd")
    ).toDF("doc_id", "text", "source")
    val base = CorpusOps.doremiWeights(toy, eta = 0.0)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    // eta = 0: exp(0) = 1, weight == quantized share for every source
    base.foreach { case (s, (share, _, w)) =>
      assert(w === share, s"$s: eta=0 must recover the baseline") }
    val step = CorpusOps.doremiWeights(toy, eta = 1.0)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    // the isolated dialect has positive excess; the blended ones are
    // lower-excess, so the step moves weight toward "odd"
    assert(step("odd")._2 > step("s1")._2,
      "isolated dialect must carry higher excess")
    assert(step("odd")._3 > step("odd")._1, "excess source upweighted")
    assert(step("s1")._3 < base("s1")._1 + 1e-9, "blended source not lifted")
    // weights remain a distribution up to quantization slack
    val total = step.values.map(_._3).sum
    assert(total > 0.999 && total <= 1.0 + 1e-9, s"sum $total")
  }

  test("snapshotDiff: all five classes, exact version Jaccard, " +
      "short-doc gram convention") {
    import spark.implicits._
    val base = "a b c d e f g h i j k l m n o" // 15 words, 13 trigrams
    val v1 = Seq((1L, base), (2L, "x"), (3L, "gone doc"),
      (5L, "stable doc text here")).toDF("doc_id", "text")
    val v2 = Seq((1L, base + " tail word added"), (2L, "y"),
      (4L, "brand new doc"), (5L, "stable doc text here"))
      .toDF("doc_id", "text")
    val out = graft.operators.CorpusOps.snapshotDiff(v1, v2).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)).map(_.toString)))).toMap
    // appending 3 words keeps all 13 grams, adds 3: J = 13/16 = 0.8125
    assert(out(1L) === (("minor_edit", Some("0.8125"))))
    // single-word docs compare as their one space-joined gram: disjoint
    assert(out(2L) === (("rewrite", Some("0.0"))))
    assert(out(3L) === (("removed", None)))
    assert(out(4L) === (("added", None)))
    assert(out(5L) === (("unchanged", None)))
    assert(out.size === 5)
  }

  test("sourceContainment: asymmetric containment vs Jaccard, dense " +
      "spine zeros, identical sources at 1.0") {
    import spark.implicits._
    val base = "a b c d e f g h i j k l m"          // 13 words, 11 grams
    val docs = Seq(
      (1L, "A", base),
      (2L, "B", base),                              // B == A
      (3L, "C", "z1 z2 z3 z4 z5"),                  // disjoint, 3 grams
      (4L, "D", base + " n o p q r"))               // A ⊂ D (16 grams)
      .toDF("doc_id", "source", "text")
    val out = graft.operators.CorpusOps.sourceContainment(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6), r.getDouble(7)))).toMap
    assert(out.size === 6, "dense spine: all 4C2 pairs present")
    assert(out(("A", "B")) === ((11L, 11L, 11L, 1.0, 1.0, 1.0)))
    // A fully contained in D; D only 11/16 contained in A
    val (na, nd, sh, j, ca, cd) = out(("A", "D"))
    assert(na === 11L && nd === 16L && sh === 11L)
    assert(ca === 1.0, "A is fully contained in D")
    assert(cd === math.floor(11e6 / 16) / 1e6, "D is not")
    assert(j === math.floor(11e6 / 16) / 1e6)
    assert(ca > j, "containment is the signal Jaccard hides")
    // disjoint pair reports zeros, not absence
    assert(out(("A", "C")) === ((11L, 3L, 0L, 0.0, 0.0, 0.0)))
  }
}
