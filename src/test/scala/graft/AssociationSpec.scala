package graft

import org.apache.spark.sql.functions._
import graft.operators.Association

/** Categorical association (q267/q268): closed-form chi-square/V on
  * perfect and independent tables, rule arithmetic on hand baskets.
  */
class AssociationSpec extends SparkSpec {
  import spark.implicits._

  test("cramersV: perfect association V=1, independence V=0, " +
      "single-valued column NULL, dof bookkeeping") {
    // perfect 2x2: a<->x, b<->y (5 each): chi2 = N = 10, V = 1
    val perfect = (Seq.fill(5)(("a", "x")) ++ Seq.fill(5)(("b", "y")))
      .toDF("u", "w")
    val p = Association.cramersV(perfect, Seq("u", "w")).collect().head
    assert(p.getAs[Long]("n") === 10L && p.getAs[Long]("dof") === 1L)
    assert(p.getAs[Double]("chi2") === 10.0)
    assert(p.getAs[Double]("cramers_v") === 1.0)
    // independent uniform 2x2 (5 per cell): chi2 exactly 0
    val ind = (for (u <- Seq("a", "b"); w <- Seq("x", "y");
      _ <- 1 to 5) yield (u, w)).toDF("u", "w")
    val i = Association.cramersV(ind, Seq("u", "w")).collect().head
    assert(i.getAs[Double]("chi2") === 0.0)
    assert(i.getAs[Double]("cramers_v") === 0.0)
    // constant column: min(r-1, c-1) = 0 -> V undefined
    val const = Seq(("a", "x"), ("a", "y")).toDF("u", "w")
    val c = Association.cramersV(const, Seq("u", "w")).collect().head
    assert(c.getAs[Long]("dof") === 0L)
    assert(c.isNullAt(c.fieldIndex("cramers_v")))
    // three columns -> three pair rows, 2x3 dof = 2
    val tri = (Seq(("a", "x", "p"), ("a", "y", "q"), ("b", "z", "p"),
      ("b", "x", "q"), ("a", "z", "p"), ("b", "y", "q")))
      .toDF("u", "w", "t")
    val rows = Association.cramersV(tri, Seq("u", "w", "t")).collect()
    assert(rows.length === 3)
    val uw = rows.find(r => r.getString(0) == "u" && r.getString(1) == "w").get
    assert(uw.getAs[Long]("dof") === 2L, "(2-1)*(3-1)")
  }

  test("cramersV: absent cells contribute expected mass (dense spine)") {
    // 2x2 with an EMPTY (b,x) cell: o = [[4,0],[0,4]] minus one row ->
    // a/x 4, a/y 1, b/y 4: margins ra=5/4, cb=4/5, N=9
    // chi2*1e-6 from the dense spine must include the (b,x) zero cell
    // term (0*9 - 4*4)^2 / (9*4*4) = 256/144
    val df = (Seq.fill(4)(("a", "x")) ++ Seq.fill(1)(("a", "y"))
      ++ Seq.fill(4)(("b", "y"))).toDF("u", "w")
    val r = Association.cramersV(df, Seq("u", "w")).collect().head
    // exact per-cell chain: cells (a,x): (4*9-5*4)^2*1e6 div (9*5*4)=
    // 256e6 div 180 = 1422222; (a,y): (1*9-5*5)^2*1e6 div (9*5*5) =
    // 256e6 div 225 = 1137777; (b,x): 256e6 div 144 = 1777777;
    // (b,y): (4*9-4*5)^2*1e6 div (9*4*5) = 256e6 div 180 = 1422222
    val chi6 = 1422222L + 1137777L + 1777777L + 1422222L
    assert(r.getAs[Double]("chi2") === chi6 / 1e6)
    assert(r.getAs[Long]("occupied_cells") === 3L)
  }

  test("cramersV/mutualInfo: NULL category values are excluded from " +
      "the pair census (n, margins, dof all agree)") {
    // perfect 2x2 plus NULL-polluted rows in each column: the census
    // must be identical to the clean frame — NULL is not a category,
    // so n=10, r=c=2, dof=1, V=1 (not a 3x3 with a NULL margin)
    val clean = (Seq.fill(5)(("a", "x")) ++ Seq.fill(5)(("b", "y")))
    val polluted = (clean ++ Seq((null, "x"), ("a", null), (null, null)))
      .toDF("u", "w")
    val r = Association.cramersV(polluted, Seq("u", "w")).collect().head
    assert(r.getAs[Long]("n") === 10L)
    assert(r.getAs[Long]("dof") === 1L)
    assert(r.getAs[Double]("cramers_v") === 1.0)
    val m = Association.mutualInfo(polluted, Seq("u", "w")).collect().head
    assert(m.getAs[Long]("n") === 10L)
    assert(m.getAs[Double]("nmi") === 1.0)
  }

  test("mutualInfo: perfect pair hits ln2 with NMI exactly 1, " +
      "independence exactly 0, single-valued NULL NMI") {
    // perfect 2x2: per cell (5/10)*ln(2) -> 346573 floored, x2 cells;
    // margins give the same entropy -> NMI = 1.0 exactly
    val perfect = (Seq.fill(5)(("a", "x")) ++ Seq.fill(5)(("b", "y")))
      .toDF("u", "w")
    val p = Association.mutualInfo(perfect, Seq("u", "w")).collect().head
    assert(p.getAs[Double]("mi") === 0.693146, "quantized ln 2")
    assert(p.getAs[Double]("h_a") === 0.693146
      && p.getAs[Double]("h_b") === 0.693146)
    assert(p.getAs[Double]("nmi") === 1.0)
    // independent uniform: every cell ln-ratio is ln 1 = 0
    val ind = (for (u <- Seq("a", "b"); w <- Seq("x", "y");
      _ <- 1 to 5) yield (u, w)).toDF("u", "w")
    val i = Association.mutualInfo(ind, Seq("u", "w")).collect().head
    assert(i.getAs[Double]("mi") === 0.0 && i.getAs[Double]("nmi") === 0.0)
    // constant column: zero entropy -> NMI undefined, MI clamps to 0
    val const = Seq(("a", "x"), ("a", "y")).toDF("u", "w")
    val c = Association.mutualInfo(const, Seq("u", "w")).collect().head
    assert(c.getAs[Double]("mi") === 0.0)
    assert(c.isNullAt(c.fieldIndex("nmi")))
  }

  test("theilU: a functional dependency reads ~1 one way and the " +
      "entropy ratio the other; single-valued margin NULL") {
    // a in 0..3 (4 each), b = a mod 2: b is a FUNCTION of a, so
    // U(b|a) ~ 1 while U(a|b) = ln2/ln4 = 1/2 — the asymmetry NMI
    // cannot express. Expected values replay the operator's exact
    // floor chain (per-cell/per-margin floors, then one division).
    val df = (0 until 16).map(i => (i % 4, (i % 4) % 2))
      .toDF("a", "b")
    val r = Association.theilU(df, Seq("a", "b")).collect().head
    val mi6 = 4L * math.floor(
      0.25 * math.log((4.0 * 16) / (4.0 * 8)) * 1e6).toLong
    val ha6 = 4L * math.floor(0.25 * -math.log(0.25) * 1e6).toLong
    val hb6 = 2L * math.floor(0.5 * -math.log(0.5) * 1e6).toLong
    assert(r.getAs[Long]("mi6") === mi6)
    assert(r.getAs[Long]("ha6") === ha6)
    assert(r.getAs[Long]("hb6") === hb6)
    assert(r.getAs[Long]("u_a_given_b6") === mi6 * 1000000L / ha6)
    assert(r.getAs[Long]("u_b_given_a6") === mi6 * 1000000L / hb6)
    assert(r.getAs[Long]("u_b_given_a6") > 999000L,
      "knowing a removes (nearly) all of b's uncertainty")
    // ln2/ln4 = 0.5 exactly; the per-term floors shave ~2 millionths
    assert(r.getAs[Long]("u_a_given_b6") === 499998L)
    // single-valued column: H = 0 -> that direction NULL
    val mono = (0 until 8).map(i => (i % 4, 1)).toDF("a", "b")
    val m = Association.theilU(mono, Seq("a", "b")).collect().head
    assert(m.isNullAt(m.fieldIndex("u_b_given_a6")))
  }

  test("frequentPairs: support cut, truncating confidence, lift " +
      "strictly-greater contract, presence semantics") {
    // b1{A,A,B,C} (dup A counts once), b2{A,B}, b3{A}
    val baskets = Seq((1L, "A"), (1L, "A"), (1L, "B"), (1L, "C"),
      (2L, "A"), (2L, "B"), (3L, "A")).toDF("bk", "item")
    val out = Association.frequentPairs(baskets, "bk", "item", 2L).collect()
    assert(out.length === 1, "only AB reaches support 2")
    val ab = out.head
    assert(ab.getString(0) === "A" && ab.getString(1) === "B")
    assert(ab.getAs[Long]("support") === 2L)
    assert(ab.getAs[Long]("supp_a") === 3L && ab.getAs[Long]("supp_b") === 2L)
    assert(ab.getAs[Double]("conf_a_b") === 0.666666, "2e6 div 3 truncates")
    assert(ab.getAs[Double]("conf_b_a") === 1.0)
    // lift = 2*3/(3*2) = exactly 1 -> NOT positive (strict >)
    assert(ab.getAs[Double]("lift") === 1.0)
    assert(!ab.getAs[Boolean]("positive"))
    // genuinely positive co-occurrence: C,D always together, E alone
    val pos = Seq((1L, "C"), (1L, "D"), (2L, "C"), (2L, "D"), (3L, "E"))
      .toDF("bk", "item")
    val cd = Association.frequentPairs(pos, "bk", "item", 2L).collect().head
    assert(cd.getAs[Double]("lift") === 1.5 && cd.getAs[Boolean]("positive"))
  }
}
