package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusOps, EvalOps, Sketches}

/** q229 Count-Min, q230 l-diversity, q231 Hill tail index, q232 Spearman. */
class SketchStatsSpec extends SparkSpec {
  import spark.implicits._

  test("cmCounters: additive/mergeable, row sums = N, estimate >= exact") {
    val rows = Seq.tabulate(60)(i => (i.toLong % 7, s"row$i"))
    val df = rows.toDF("user_id", "pad")
    val (a, b) = rows.splitAt(25)
    val full = Sketches.cmCounters(df, "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // every row of the grid holds the whole stream's mass
    (0 until 4).foreach { j =>
      assert(full.collect { case ((`j`, _), c) => c }.sum === 60L,
        s"row $j mass")
    }
    // merge = plain (j, idx) sum of independently-built counters
    val merged = Sketches.cmCounters(a.toDF("user_id", "pad"), "user_id")
      .unionByName(Sketches.cmCounters(b.toDF("user_id", "pad"), "user_id"))
      .groupBy("j", "idx").agg(sum("cnt").as("cnt")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged === full)
    val rep = Sketches.cmReport(df, "user_id", topN = 7).collect()
    assert(rep.length === 7)
    rep.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CM never undercounts: ${r.mkString(",")}")
      assert(r.getLong(3) === r.getLong(2) - r.getLong(1))
    }
  }

  test("lDiversity: constant-source class fails, uniform 3-source class " +
      "passes both verdicts") {
    val docs = Seq(
      (1L, "en", "s1", 100L), (2L, "en", "s2", 100L), (3L, "en", "s3", 100L),
      (4L, "de", "s1", 100L), (5L, "de", "s1", 100L), (6L, "de", "s1", 100L))
      .toDF("doc_id", "lang", "source", "n_chars")
    val out = CorpusOps.lDiversity(docs, l = 3L).collect()
      .map(r => r.getString(0) -> r).toMap
    val en = out("en")
    assert(en.getLong(3) === 3L && en.getBoolean(6) && en.getBoolean(7))
    // c=1,n=3 cells: l6 = floor(-1098612.28…) = -1098613; H6 = 1098613
    assert(en.getDouble(5) === 1.098613)
    val de = out("de")
    assert(de.getLong(3) === 1L && de.getDouble(5) === 0.0)
    assert(!de.getBoolean(6) && !de.getBoolean(7))
  }

  test("hillTail: hand-quantized Hill sum; thin and degenerate tails NULL") {
    def t6(x: Long) = math.floor(math.log(x.toDouble) * 1e6).toLong
    // group a: enough rows, distinct tail; group b: too thin; group c:
    // constant top values -> inv6 = 0
    val docs = (Seq((1000L, "a"), (900L, "a"), (800L, "a"), (100L, "a"),
      (50L, "a"), (10L, "b"), (7L, "c"), (7L, "c"), (7L, "c"), (7L, "c"))
      .zipWithIndex.map { case ((x, g), i) => (i.toLong, g, x) })
      .toDF("doc_id", "source", "n_chars")
    val out = CorpusOps.hillTail(docs, k = 2).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("a")
    val inv6 = t6(1000) + t6(900) - 2 * t6(800)
    assert(a.getLong(1) === 5L && a.getLong(3) === 800L)
    assert(a.getDouble(4) ===
      (2L * 1000000000000L / inv6).toDouble / 1e6)
    assert(out("b").isNullAt(4), "2 rows < k+1")
    assert(out("c").isNullAt(4), "constant tail has no slope")
  }

  test("spearman: monotone +-1, tie-averaged midranks match the " +
      "closed-form Pearson, zero variance NULL") {
    val up = Seq.tabulate(10)(i => ("g", i.toLong, i.toLong * 3 + 1))
      .toDF("source", "a", "b")
    val rUp = EvalOps.spearman(up, "source", "a", "b").collect()(0)
    assert(math.abs(rUp.getDouble(2) - 1.0) < 1e-5)
    val down = Seq.tabulate(10)(i => ("g", i.toLong, 100L - i))
      .toDF("source", "a", "b")
    val rDown = EvalOps.spearman(down, "source", "a", "b").collect()(0)
    assert(math.abs(rDown.getDouble(2) + 1.0) < 1e-5)
    // ties: reference midrank Pearson computed directly in the test
    val data = Seq(("g", 1L, 2L), ("g", 1L, 5L), ("g", 2L, 5L),
      ("g", 3L, 5L), ("g", 3L, 1L), ("g", 4L, 9L))
    def mid(vs: Seq[Long]): Map[Long, Double] = {
      val sorted = vs.sorted
      vs.distinct.map { v =>
        val idx = sorted.zipWithIndex.filter(_._1 == v).map(_._2 + 1)
        v -> idx.sum.toDouble / idx.size
      }.toMap
    }
    val (as, bs) = (data.map(_._2), data.map(_._3))
    val (ma, mb) = (mid(as), mid(bs))
    val (ra, rb) = (as.map(ma), bs.map(mb))
    val n = ra.size.toDouble
    val (sa, sb) = (ra.sum, rb.sum)
    val num = n * ra.zip(rb).map { case (x, y) => x * y }.sum - sa * sb
    val da = n * ra.map(x => x * x).sum - sa * sa
    val db = n * rb.map(x => x * x).sum - sb * sb
    val expected = num / math.sqrt(da * db)
    val got = EvalOps.spearman(data.toDF("source", "a", "b"),
      "source", "a", "b").collect()(0).getDouble(2)
    assert(math.abs(got - expected) < 1e-5, s"$got vs $expected")
    val flat = Seq(("g", 5L, 1L), ("g", 5L, 2L)).toDF("source", "a", "b")
    assert(EvalOps.spearman(flat, "source", "a", "b").collect()(0)
      .isNullAt(2))
  }
}
