package graft

import org.apache.spark.sql.functions._

import graft.operators.Quantiles

/** Scale-safe grouped quantiles (q221/q222): exact percentile_cont
  * equivalence, value-set-only plan shape, Tukey fence census.
  */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("groupedQuantiles equals Spark's exact percentile on every " +
      "group and quantile (odd/even n, heavy ties)") {
    val rows = Seq.tabulate(101)(i => ("odd", i.toLong)) ++
      Seq.tabulate(100)(i => ("even", (i * 3).toLong)) ++
      Seq.fill(50)(("ties", 7L)) ++ Seq.fill(50)(("ties", 11L))
    val df = rows.toDF("g", "v").repartition(7)
    val qs = Seq(Quantiles.Q("p25", 1, 4), Quantiles.Q("p50", 1, 2),
      Quantiles.Q("p90", 9, 10), Quantiles.Q("p99", 99, 100))
    val mine = Quantiles.groupedQuantiles(df, "g", "v", qs)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    val ref = df.groupBy("g").agg(
        expr("percentile(v, 0.25)"), expr("percentile(v, 0.5)"),
        expr("percentile(v, 0.9)"), expr("percentile(v, 0.99)"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4)))).toMap
    // 1e-9 tolerance: the built-in interpolates in FLOATS (0.9*(n-1)
    // carries binary error, e.g. 267.30000000000007); the integer-rank
    // formulation is the exact value — strictly tighter, never looser
    assert(mine.keySet === ref.keySet)
    mine.foreach { case (g, (a, b, c, d)) =>
      val (ra, rb, rc, rd) = ref(g)
      assert(math.abs(a - ra) < 1e-9 && math.abs(b - rb) < 1e-9 &&
        math.abs(c - rc) < 1e-9 && math.abs(d - rd) < 1e-9,
        s"$g: ($a,$b,$c,$d) vs ($ra,$rb,$rc,$rd)")
    }
  }

  test("plan carries no percentile aggregate; windows run over the " +
      "collapsed value set") {
    val df = spark.range(100000)
      .selectExpr("id % 3 AS g", "id % 97 AS v") // 97 distinct values
    val out = Quantiles.groupedQuantiles(df, "g", "v",
      Seq(Quantiles.Q("p50", 1, 2)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("percentile"))
    val r = out.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(r.values.forall(v => v >= 0 && v <= 96))
  }

  test("outlierFences: hand case — quartiles, fences, census on the " +
      "collapsed table") {
    // group a: 1..11 plus outliers 100, -50; quartiles of 13 values
    val vals = (1L to 11L) ++ Seq(100L, -50L)
    val df = vals.map(("a", _)).toDF("g", "v")
    val out = Quantiles.outlierFences(df, "g", "v").collect().head
    // sorted: -50,1..11,100 (n=13): q1 idx 3 -> 3; med idx 6 -> 6;
    // q3 idx 9 -> 9; iqr 6; fences [-6, 18]
    assert(out.getAs[Long]("n") === 13L)
    assert(out.getAs[Double]("q1") === 3.0)
    assert(out.getAs[Double]("median") === 6.0)
    assert(out.getAs[Double]("q3") === 9.0)
    assert(out.getAs[Double]("iqr") === 6.0)
    assert(out.getAs[Long]("n_low") === 1L)   // -50
    assert(out.getAs[Long]("n_high") === 1L)  // 100
  }

  test("outlierFences: fractional-quarter fences stay exact") {
    // n=6 values 0,10,20,30,40,1000: q1 = 12.5, q3 = 37.5, iqr = 25
    // fences [-25, 75] -> only 1000 is high
    val df = Seq(0L, 10L, 20L, 30L, 40L, 1000L).map(("a", _))
      .toDF("g", "v")
    val out = Quantiles.outlierFences(df, "g", "v").collect().head
    assert(out.getAs[Double]("q1") === 12.5)
    assert(out.getAs[Double]("q3") === 37.5)
    assert(out.getAs[Long]("n_low") === 0L)
    assert(out.getAs[Long]("n_high") === 1L)
    assert(out.getAs[Double]("outlier_frac") === 0.166666)
  }

  test("weightedQuantiles: type-1 ceiling-rank by mass; zero weights " +
      "carry none; one heavy value dominates") {
    // values 10/20/30 with weights 1/1/8 (W=10): ceil(.25*10)=3 -> 30;
    // ceil(.5*10)=5 -> 30; the heavy value owns everything past w=2
    val df = Seq(("g", 10L, 1L), ("g", 20L, 1L), ("g", 30L, 8L),
      ("g", 99L, 0L)).toDF("g", "v", "wt")
    val qs = Seq(Quantiles.Q("p25", 1, 4), Quantiles.Q("p50", 1, 2),
      Quantiles.Q("p90", 9, 10))
    val r = Quantiles.weightedQuantiles(df, "g", "v", "wt", qs)
      .collect().head
    assert(r.getAs[Long]("w_total") === 10L, "zero-weight row excluded")
    assert(r.getAs[Long]("p25") === 30L)
    assert(r.getAs[Long]("p50") === 30L)
    assert(r.getAs[Long]("p90") === 30L)
    // uniform weights degenerate to the unweighted ceiling-rank statistic
    val u = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 1L), ("g", 4L, 1L))
      .toDF("g", "v", "wt")
    val r2 = Quantiles.weightedQuantiles(u, "g", "v", "wt",
      Seq(Quantiles.Q("p50", 1, 2))).collect().head
    assert(r2.getAs[Long]("p50") === 2L, "ceil(0.5*4)=2 -> second value")
  }

  test("winsorizedStats: hand clips, tie-splitting trimmed overlap, an " +
      "extreme value cannot move either robust mean") {
    import spark.implicits._
    // 10 values, p = 10% -> k = 1 clipped per end: raw 1..9 plus a wild
    // 1000; winsorize clips {1 -> 2, 1000 -> 9}; trim drops both
    val vals = (1L to 9L) :+ 1000L
    val df = vals.map(("g", _)).toDF("g", "v")
    val r = Quantiles.winsorizedStats(df, "g", "v",
      pNum = 10, pDen = 100).collect().head
    assert(r.getAs[Long]("n") === 10L)
    assert(r.getAs[Long]("n_clipped_per_end") === 1L)
    assert(r.getAs[Long]("lo_clip") === 2L)
    assert(r.getAs[Long]("hi_clip") === 9L)
    // winsorized: (2+2..9+9)/10 = (44+9+2)/10 ... sum = 2+2+3+..+8+9+9 = 55
    assert(r.getAs[Double]("winsorized_mean") === 5.5)
    // trimmed: (2+..+9)/8 = 44/8 = 5.5
    assert(r.getAs[Double]("trimmed_mean") === 5.5)
    // the wild value's MAGNITUDE is irrelevant: 10^6 instead of 10^3
    val df2 = ((1L to 9L) :+ 1000000L).map(("g", _)).toDF("g", "v")
    val r2 = Quantiles.winsorizedStats(df2, "g", "v", 10, 100)
      .collect().head
    assert(r2.getAs[Double]("winsorized_mean") === 5.5)
    assert(r2.getAs[Double]("trimmed_mean") === 5.5)
    // tie splitting: six 5s with k = 1 -> exactly one 5 trimmed per end
    val ties = Seq.fill(6)(5L).map(("t", _)).toDF("g", "v")
    val rt = Quantiles.winsorizedStats(ties, "g", "v", 20, 100)
      .collect().head
    assert(rt.getAs[Double]("trimmed_mean") === 5.0)
    assert(rt.getAs[Double]("winsorized_mean") === 5.0)
  }

  test("groupedMad: hand median/MAD, 3.5-MAD census, 50% breakdown " +
      "against stddev's 0%") {
    import spark.implicits._
    // {1,2,3,4,5,100}: median = 3.5, deviations {2.5,1.5,0.5,0.5,1.5,96.5}
    // -> MAD = median{0.5,0.5,1.5,1.5,2.5,96.5} = 1.5
    val df = Seq(1L, 2L, 3L, 4L, 5L, 100L).map(("g", _)).toDF("g", "v")
    val r = Quantiles.groupedMad(df, "g", "v").collect().head
    assert(r.getAs[Long]("n") === 6L)
    assert(r.getAs[Double]("median") === 3.5)
    assert(r.getAs[Double]("mad") === 1.5)
    // outliers: |v - 3.5| > 3.5*1.5 = 5.25 -> only 100
    assert(r.getAs[Long]("n_outliers") === 1L)
    // breakdown: make the outlier absurd - median and MAD unmoved
    val df2 = Seq(1L, 2L, 3L, 4L, 5L, 1000000L).map(("g", _)).toDF("g", "v")
    val r2 = Quantiles.groupedMad(df2, "g", "v").collect().head
    assert(r2.getAs[Double]("median") === 3.5)
    assert(r2.getAs[Double]("mad") === 1.5)
  }

  test("giniConcentration: equality zero, max-concentration (n-1)/n, " +
      "in-block Lorenz interpolation, first-block cut correctness") {
    import spark.implicits._
    // perfect equality: gini 0, bottom half owns exactly half
    val eq = Seq.fill(4)(("g", 5L)).toDF("g", "v")
    val e = Quantiles.giniConcentration(eq, "g", "v").collect().head
    assert(e.getAs[Long]("n") === 4L && e.getAs[Long]("total") === 20L)
    assert(e.getAs[Long]("gini6") === 0L)
    assert(e.getAs[Long]("bottom_half_share6") === 500000L)
    // one doc owns everything: gini = (n-1)/n = 0.75 at n=4
    val mx = Seq(("g", 0L), ("g", 0L), ("g", 0L), ("g", 10L)).toDF("g", "v")
    val m = Quantiles.giniConcentration(mx, "g", "v").collect().head
    assert(m.getAs[Long]("gini6") === 750000L)
    assert(m.getAs[Long]("bottom_half_share6") === 0L)
    // cut inside a tied block: {1,1,1,1,2} bottom-2 mass = 2/6
    val ib = Seq.fill(4)(("g", 1L)).toDF("g", "v")
      .union(Seq(("g", 2L)).toDF("g", "v"))
    val i = Quantiles.giniConcentration(ib, "g", "v").collect().head
    assert(i.getAs[Long]("bottom_half_share6") === 333333L)
    // the cut must use the FIRST qualifying block: {1,2,5} m=1 -> 1/8
    // (a later block's formula would go negative: 8 - 5*2 = -2)
    val fb = Seq(("g", 1L), ("g", 2L), ("g", 5L)).toDF("g", "v")
    val f = Quantiles.giniConcentration(fb, "g", "v").collect().head
    assert(f.getAs[Long]("bottom_half_share6") === 125000L)
    // all-zero mass: Lorenz undefined -> NULLs, not a crash
    val z = Seq(("g", 0L), ("g", 0L)).toDF("g", "v")
    val zr = Quantiles.giniConcentration(z, "g", "v").collect().head
    assert(zr.isNullAt(zr.fieldIndex("gini6")))
    assert(zr.isNullAt(zr.fieldIndex("bottom_half_share6")))
  }
}
