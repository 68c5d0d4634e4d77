package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusOps, TextAnalysis}

/** Gen-17d (q294/q295): tokenizer fertility and the quality-weighted
  * mixture allocator — closed-form integer expectations throughout.
  */
class MixtureSpec extends SparkSpec {
  import spark.implicits._

  // 22 distinct words, stopwords present, clean lengths: passes every
  // gopher rule
  private val good = "the quick brown fox jumps over lazy dogs and " +
    "runs with great speed toward distant hills where many birds " +
    "sing loudly today"
  private val bad = "x y z"

  test("tokenizerFertility: exact ratios, zero-token NULL") {
    // 'ab cd.': 2 ws words, 3 subword tokens (ab / cd / .), 6 chars
    val df = Seq(("x", "ab cd."), ("y", "")).toDF("lang", "text")
    val r = TextAnalysis.tokenizerFertility(df, "lang")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("x").getAs[Long]("words") === 2L)
    assert(r("x").getAs[Long]("subtokens") === 3L)
    assert(r("x").getAs[Double]("fertility") === 1.5)
    assert(r("x").getAs[Double]("chars_per_token") === 2.0)
    assert(r("y").isNullAt(r("y").fieldIndex("fertility")))
  }

  test("mixtureAllocation: quality-squared shares, exact integer " +
      "budget, sub-granularity residual stays unallocated") {
    // a: 2 keepers (keep 1.0, T=44); b: 1 keeper + 1 reject (0.5, 22);
    // c: 2 rejects (0.0, 0). B = 66*500/1000 = 33.
    // w = keep6^2*T: a 44e12, b 5.5e12; w9: a 888888888, b 111111111
    // raw: a 29, b 3; nothing capped; leftover 1 < 1e-9 granularity
    val df = Seq(("a", good), ("a", good), ("b", good), ("b", bad),
      ("c", bad), ("c", bad)).toDF("source", "text")
    val r = CorpusOps.mixtureAllocation(df, "source",
        budgetPerMille = 500, capMilliEpochs = 2000)
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("a").getAs[Double]("keep_rate") === 1.0)
    assert(r("b").getAs[Double]("keep_rate") === 0.5)
    assert(r("c").getAs[Double]("keep_rate") === 0.0)
    assert(r("a").getAs[Long]("budget_tokens") === 33L)
    assert(r("a").getAs[Long]("alloc_tokens") === 29L)
    assert(r("b").getAs[Long]("alloc_tokens") === 3L)
    assert(r("c").getAs[Long]("alloc_tokens") === 0L)
    assert(r("a").getAs[Double]("epochs") === 0.659090)
    assert(!r("a").getAs[Boolean]("capped"))
    assert(r("c").isNullAt(r("c").fieldIndex("epochs")), "t=0")
  }

  test("mixtureAllocation: epoch cap clamps and the surplus " +
      "redistributes to uncapped sources by weight") {
    // a: 1 keeper (1.0, T=22, w=22e12); b: 1 keeper + 4 rejects
    // (0.2, T=22, w=0.88e12). B = 44*500/1000 = 22; cap = 0.5 epochs
    // = 11. raw a = 21 -> capped at 11; leftover 11 goes entirely to b
    // (sole uncapped), landing exactly on ITS cap without exceeding it.
    val df = Seq(("a", good), ("b", good), ("b", bad), ("b", bad),
      ("b", bad), ("b", bad)).toDF("source", "text")
    val r = CorpusOps.mixtureAllocation(df, "source",
        budgetPerMille = 500, capMilliEpochs = 500)
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("a").getAs[Long]("alloc_tokens") === 11L)
    assert(r("a").getAs[Boolean]("capped"))
    assert(r("a").getAs[Double]("epochs") === 0.5)
    assert(r("b").getAs[Long]("alloc_tokens") === 11L)
    assert(!r("b").getAs[Boolean]("capped"))
    assert(r("b").getAs[Double]("epochs") === 0.5)
    // budget fully placed in this geometry
    assert(r("a").getAs[Long]("alloc_tokens")
      + r("b").getAs[Long]("alloc_tokens")
      === r("a").getAs[Long]("budget_tokens"))
  }

  test("yuleK: closed-form K on hand spectra; repetition reads higher") {
    // 'x x y': N=3 types=2 S2=5 -> K6 = (5-3)*1e10 // 9 = 2222222222
    // 'x x x x': N=4 S2=16 -> K6 = 12e10 // 16 = 7500000000
    val df = Seq(("a", "x x y"), ("b", "x x x x")).toDF("g", "text")
    val r = TextAnalysis.yuleK(df, "g")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("a").getAs[Long]("n_tokens") === 3L)
    assert(r("a").getAs[Long]("n_types") === 2L)
    assert(r("a").getAs[Long]("yule_k6") === 2222222222L)
    assert(r("b").getAs[Long]("yule_k6") === 7500000000L)
    assert(r("b").getAs[Long]("yule_k6") > r("a").getAs[Long]("yule_k6"),
      "pure repetition must read more concentrated")
    // all-hapax text: S2 = N -> K exactly 0
    val h = Seq(("c", "p q r s")).toDF("g", "text")
    val rc = TextAnalysis.yuleK(h, "g").collect().head
    assert(rc.getAs[Long]("yule_k6") === 0L)
  }
}
