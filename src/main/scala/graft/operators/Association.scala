package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Categorical-association analytics — which metadata columns move
  * together. Curation metadata is mostly categorical (source, language,
  * license, length bucket, quality tier), and two questions recur before
  * any stratified split or mixture decision: are two columns DEPENDENT
  * (a split stratified on one silently stratifies on the other —
  * [[cramersV]] puts a 0–1 number on it), and which concrete VALUES
  * co-occur beyond chance (the rule read: documents tagged A are also
  * tagged B — [[frequentPairs]] with support/confidence/lift).
  *
  * Both are census-shaped: one aggregation to (value, value) cells, then
  * report-sized arithmetic — the [[EvalOps]] exact-integer discipline
  * (BIGINT/DECIMAL(38,0) products, ONE truncating division per quantized
  * output, at most one IEEE sqrt), so every number replays in a SQL
  * oracle bit-for-bit.
  */
object Association {

  /** Pairwise chi-square independence + Cramér's V over the given
    * categorical columns (q267) — the association MATRIX a curation
    * audit reads before trusting any per-column analysis: V ≈ 0 means
    * the columns partition the corpus independently; V near 1 means one
    * is a proxy for the other (the classic failure: length bucket is a
    * proxy for source, so a "balanced by source" split is length-skewed).
    *
    * Exactness: per ordered pair of columns, one (a, b) cell census;
    * margins and N aggregate from the SAME relation. χ² works on the
    * DENSE margin spine (absent cells contribute their full expected
    * mass — dropping them understates χ² exactly where dependence is
    * strongest): cell6 = (o·N − rₐ·c_b)²·10⁶ div (N·rₐ·c_b) in
    * DECIMAL(38,0) (products ≤ N⁴·10⁶ — exact to N ≈ 10⁷ with headroom),
    * χ²₆ = Σ cell6. V = √(χ²/(N·min(r−1, c−1))) takes the one IEEE sqrt
    * on the exact-integer ratio; dof = (r−1)(c−1). Single-valued columns
    * report NULL V (min(r−1,c−1) = 0 — V undefined, the degenerate
    * contract). NULL category values are EXCLUDED from each pair's
    * census up front (a NULL is not a category: countDistinct, equi-join
    * margins, and SQL oracles all disagree on its bookkeeping — callers
    * who want missingness as a level coalesce to a sentinel upstream);
    * n is therefore per-pair when NULL patterns differ across columns.
    *
    * Scale: |pairs| censuses over one scan (Spark shares the scan across
    * the unioned branches), each collapsing to |A|·|B| cells; everything
    * after is report-sized.
    */
  def cramersV(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    pairs.map { case (a, b) =>
      val cells = df.filter(col(a).isNotNull && col(b).isNotNull)
        .groupBy(col(a).as("_a"), col(b).as("_b"))
        .agg(count(lit(1)).as("_o"))
      val ra = cells.groupBy(col("_a")).agg(sum(col("_o")).as("_ra"))
      val cb = cells.groupBy(col("_b")).agg(sum(col("_o")).as("_cb"))
      val n = cells.agg(sum(col("_o")).as("_n"),
        count(lit(1)).as("cells"))
      val spine = broadcast(ra).crossJoin(broadcast(cb))
        .join(cells, Seq("_a", "_b"), "left")
        .withColumn("_o", coalesce(col("_o"), lit(0L)))
        .crossJoin(broadcast(n))
        .withColumn("_cell6", expr(
          """(CAST(_o AS DECIMAL(38,0)) * _n - CAST(_ra AS DECIMAL(38,0)) * _cb)
             * (CAST(_o AS DECIMAL(38,0)) * _n - CAST(_ra AS DECIMAL(38,0)) * _cb)
             * 1000000 div (CAST(_n AS DECIMAL(38,0)) * _ra * _cb)"""))
      spine.agg(
          max(col("_n")).as("n"),
          max(col("cells")).as("occupied_cells"),
          countDistinct(col("_a")).as("_r"),
          countDistinct(col("_b")).as("_c"),
          sum(col("_cell6")).as("_chi6"))
        .withColumn("_m", least(col("_r") - 1L, col("_c") - 1L))
        .select(lit(a).as("col_a"), lit(b).as("col_b"), col("n"),
          col("occupied_cells"),
          ((col("_r") - 1L) * (col("_c") - 1L)).as("dof"),
          (col("_chi6").cast("double") / 1e6).as("chi2"),
          when(col("_m") > 0, floor(sqrt(col("_chi6").cast("double")
            / (lit(1e6) * col("n").cast("double") * col("_m").cast("double")))
            * 1e6).cast("double") / 1e6).as("cramers_v"))
    }.reduce(_.unionByName(_))
  }

  /** Pairwise mutual information + normalized MI over categorical
    * columns (q278) — [[cramersV]]'s information-theoretic complement:
    * V measures deviation-from-independence in χ² units (dominated by
    * the heaviest cells), MI measures it in nats (how many bits one
    * column tells you about the other — the number a feature-selection
    * or leakage audit actually wants), and NMI = MI/min(H_a, H_b)
    * rescales to [0,1] so pairs with different alphabet sizes compare.
    *
    * Exactness, the [[CorpusOps.sourceKl]]/q70 ln discipline: per
    * OCCUPIED cell (absent cells contribute exactly 0 to MI — no dense
    * spine here, unlike χ²) the summand (c/N)·ln(c·N/(rₐ·c_b)) is built
    * from exact-integer ratios pushed through IEEE double division
    * (correctly rounded, engine-identical; products c·N and rₐ·c_b stay
    * in BIGINT to N ≤ 3·10⁹), one ln, then floor-quantized to
    * millionths PER CELL and integer-summed — identical doubles in, so
    * identical integers out. MI ≥ 0 mathematically; per-cell floors
    * bias the sum down by < |cells|·10⁻⁶, so the total clamps at 0.
    * Entropies quantize the same way per margin value; NMI is one
    * truncating division, NULL when a column is single-valued (H = 0).
    *
    * Scale: the [[cramersV]] shape — |pairs| cell censuses over one
    * scan, report-sized arithmetic after.
    */
  def mutualInfo(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    pairs.map { case (a, b) =>
      // same NULL contract as [[cramersV]]: a NULL is not a category
      val cells = df.filter(col(a).isNotNull && col(b).isNotNull)
        .groupBy(col(a).as("_a"), col(b).as("_b"))
        .agg(count(lit(1)).as("_o"))
      val ra = cells.groupBy(col("_a")).agg(sum(col("_o")).as("_ra"))
      val cb = cells.groupBy(col("_b")).agg(sum(col("_o")).as("_cb"))
      val n = cells.agg(sum(col("_o")).as("_n"))
      def h6(margin: DataFrame, mcol: String): DataFrame =
        margin.crossJoin(broadcast(n))
          .withColumn("_t6", floor((col(mcol).cast("double")
            / col("_n").cast("double"))
            * -log(col(mcol).cast("double") / col("_n").cast("double"))
            * 1e6).cast("long"))
          .agg(sum(col("_t6")).as(s"h6$mcol"))
      val mi = cells
        .join(ra, "_a").join(cb, "_b")
        .crossJoin(broadcast(n))
        .withColumn("_m6", floor((col("_o").cast("double")
          / col("_n").cast("double"))
          * log((col("_o") * col("_n")).cast("double")
            / (col("_ra") * col("_cb")).cast("double")) * 1e6)
          .cast("long"))
        .agg(max(col("_n")).as("n"), sum(col("_m6")).as("_mi6raw"))
        .withColumn("_mi6", greatest(lit(0L), col("_mi6raw")))
      mi.crossJoin(broadcast(h6(ra, "_ra")))
        .crossJoin(broadcast(h6(cb, "_cb")))
        .select(lit(a).as("col_a"), lit(b).as("col_b"), col("n"),
          (col("_mi6").cast("double") / 1e6).as("mi"),
          (col("h6_ra").cast("double") / 1e6).as("h_a"),
          (col("h6_cb").cast("double") / 1e6).as("h_b"),
          when(least(col("h6_ra"), col("h6_cb")) > 0,
            expr("_mi6 * 1000000 div least(h6_ra, h6_cb)")
              .cast("double") / 1e6).as("nmi"))
    }.reduce(_.unionByName(_))
  }

  /** Frequent co-occurring item pairs with support / confidence / lift
    * (q268) — Agrawal-style association rules restricted to pairs (the
    * 2-itemset census IS the workhorse read; longer itemsets derive from
    * it): which values of `itemCol` appear together in the same
    * `basketCol` beyond their independent rates. The training-data uses:
    * tag/topic co-occurrence, per-order part affinity, per-user
    * event-type bundles.
    *
    * Semantics: presence, not multiplicity — the (basket, item) relation
    * is DISTINCT'd first (a basket with the same item five times
    * supports the item once, the standard market-basket contract).
    * support(a,b) counts baskets containing BOTH; pairs below
    * `minSupport` are cut. conf(a→b) = supp(ab)·10⁶ div supp(a) both
    * directions; lift = supp(ab)·B·10⁶ div (supp(a)·supp(b)) in
    * DECIMAL(38,0) (B = basket count); `positive` = lift > 1
    * (co-occurrence beyond independence) decided on the exact integers.
    *
    * Scale: the pair stage is a basket-keyed self-join — work is
    * Σ_baskets k_b², bounded by the max basket size, never |items|²;
    * the minSupport cut happens at aggregation (map-side combined).
    * A pathological giant basket (k_b ~ 10⁶) needs a basket-size cap
    * upstream — the standard Apriori hygiene, documented not hidden.
    */
  def frequentPairs(baskets: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 2L): DataFrame = {
    val items = baskets.select(col(basketCol).as("_bk"),
      col(itemCol).as("_item")).distinct()
    val nb = items.agg(countDistinct(col("_bk")).as("_nb"))
    val supp = items.groupBy(col("_item")).agg(count(lit(1)).as("_s"))
    val co = items.as("x")
      .join(items.as("y"), col("x._bk") === col("y._bk")
        && col("x._item") < col("y._item"))
      .groupBy(col("x._item").as("item_a"), col("y._item").as("item_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    co.join(supp.select(col("_item").as("item_a"), col("_s").as("supp_a")),
        "item_a")
      .join(supp.select(col("_item").as("item_b"), col("_s").as("supp_b")),
        "item_b")
      .crossJoin(broadcast(nb))
      .withColumn("_lift6", expr(
        """CAST(support AS DECIMAL(38,0)) * _nb * 1000000
           div (CAST(supp_a AS DECIMAL(38,0)) * supp_b)"""))
      .select(col("item_a"), col("item_b"), col("support"),
        col("supp_a"), col("supp_b"),
        (expr("support * 1000000 div supp_a").cast("double") / 1e6)
          .as("conf_a_b"),
        (expr("support * 1000000 div supp_b").cast("double") / 1e6)
          .as("conf_b_a"),
        (col("_lift6").cast("double") / 1e6).as("lift"),
        (col("_lift6") > 1000000L).as("positive"))
  }

  /** Theil's uncertainty coefficient, both directions per pair (q320)
    * — [[mutualInfo]]'s ASYMMETRIC normalization (Theil 1970): NMI
    * divides by min(H_a, H_b), which hides which way the prediction
    * runs; U(a|b) = I/H(a) reads "what fraction of a's uncertainty
    * does knowing b remove" and U(b|a) the reverse — a near-1 U(lang |
    * source) with a small U(source | lang) says source determines
    * language but not back, exactly the dependency-direction question
    * a leakage/feature audit asks.
    *
    * Exactness: the IDENTICAL [[mutualInfo]] chain (per-occupied-cell
    * floored ln summands, per-margin floored entropies — identical
    * doubles in, identical integers out), then each U is ONE
    * truncating division of the two already-quantized integers (the
    * double-floor contract). Single-valued margins (H = 0) → NULL on
    * that direction only. Reported as BIGINT millionths.
    *
    * Scale: the [[cramersV]] shape — |pairs| cell censuses over one
    * scan, report-sized arithmetic after.
    */
  def theilU(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    pairs.map { case (a, b) =>
      val cells = df.filter(col(a).isNotNull && col(b).isNotNull)
        .groupBy(col(a).as("_a"), col(b).as("_b"))
        .agg(count(lit(1)).as("_o"))
      val ra = cells.groupBy(col("_a")).agg(sum(col("_o")).as("_ra"))
      val cb = cells.groupBy(col("_b")).agg(sum(col("_o")).as("_cb"))
      val n = cells.agg(sum(col("_o")).as("_n"))
      def h6(margin: DataFrame, mcol: String): DataFrame =
        margin.crossJoin(broadcast(n))
          .withColumn("_t6", floor((col(mcol).cast("double")
            / col("_n").cast("double"))
            * -log(col(mcol).cast("double") / col("_n").cast("double"))
            * 1e6).cast("long"))
          .agg(sum(col("_t6")).as(s"h6$mcol"))
      val mi = cells
        .join(ra, "_a").join(cb, "_b")
        .crossJoin(broadcast(n))
        .withColumn("_m6", floor((col("_o").cast("double")
          / col("_n").cast("double"))
          * log((col("_o") * col("_n")).cast("double")
            / (col("_ra") * col("_cb")).cast("double")) * 1e6)
          .cast("long"))
        .agg(max(col("_n")).as("n"), sum(col("_m6")).as("_mi6raw"))
        .withColumn("_mi6", greatest(lit(0L), col("_mi6raw")))
      mi.crossJoin(broadcast(h6(ra, "_ra")))
        .crossJoin(broadcast(h6(cb, "_cb")))
        .select(lit(a).as("col_a"), lit(b).as("col_b"), col("n"),
          col("_mi6").as("mi6"),
          col("h6_ra").as("ha6"), col("h6_cb").as("hb6"),
          when(col("h6_ra") > 0,
            expr("_mi6 * 1000000 div h6_ra")).as("u_a_given_b6"),
          when(col("h6_cb") > 0,
            expr("_mi6 * 1000000 div h6_cb")).as("u_b_given_a6"))
    }.reduce(_.unionByName(_))
  }
}
