package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Evaluation & annotation analytics — the measurement side of a
  * training-data pipeline. Post-training datasets are produced by human
  * raters and judged by eval harnesses, and both emit tables whose
  * curation questions are statistical: do the raters agree with each
  * other (Fleiss' κ — the go/no-go read on a labeling vendor), which
  * model actually wins the pairwise preferences (Bradley–Terry strength
  * fit — the aggregate behind every chatbot leaderboard), and how often
  * does a model solve a task within k samples (the pass@k unbiased
  * estimator from the Codex paper).
  *
  * The test corpus has no annotation columns, so — exactly like
  * [[CorpusOps.urlFixture]] and [[SftOps.turns]] — the fixtures here
  * BUILD deterministic rating/pairing structures from each document's
  * doc_id arithmetic, and the operators genuinely compute over the built
  * structure. Every ranking/agreement decision is exact integer
  * arithmetic (floor-quantized millionths), so the full chains replay in
  * SQL oracles.
  *
  * Scale shape: fixtures are bounded explodes (≤ raters per item); every
  * report is 2–3 map-side-combining aggregations keyed on (source, item)
  * then (source) — nothing shuffles more than the ratings table, and the
  * final reports are |sources|- or |models|-row tables.
  */
object EvalOps {

  /** Deterministic annotation fixture: `nRaters` categorical ratings per
    * document over `nCats` categories. Each rater reports the item's base
    * category `idHash(doc_id) % nCats` unless their noise draw
    * `(idHash + rater·17) % 10 < 3` flips them to a deterministic other
    * category — ~70% marginal agreement with real per-item structure, the
    * regime where κ is informative (κ=1 and κ≈0 are both degenerate
    * reads). Everything derives from [[CorpusOps.idHash]] rather than raw
    * doc_id residues because the corpus assigns `source = doc_id % 20`:
    * any direct `doc_id % k` with gcd(k,20)>1 would be CONSTANT within a
    * source and collapse κ to ~0 — the prime-modulus hash decorrelates.
    *
    * Output: (source, item_id, rater, cat).
    */
  def ratings(docs: DataFrame, nRaters: Int = 5, nCats: Int = 4): DataFrame = {
    val h = CorpusOps.idHash(col("item_id"))
    val r = col("rater")
    val base = h % nCats
    val noisy = (h + r * 17) % 10 < 3
    val flipped = (base + 1 + (h % 97 + r) % (nCats - 1)) % nCats
    docs.select(col("source"), col("doc_id").as("item_id"))
      .select(col("source"), col("item_id"),
        explode(sequence(lit(0), lit(nRaters - 1))).as("rater"))
      .withColumn("cat",
        when(noisy, flipped).otherwise(base).cast("long"))
  }

  /** Fleiss' κ (q168): chance-corrected inter-annotator agreement for
    * `nRaters` raters assigning `nCats` categories, per source — THE
    * acceptance gate on a labeling batch (κ below ~0.4 means the raters
    * are not measuring the same thing and the labels train noise).
    *
    * Exact-arithmetic plan (requires a constant rater count per item,
    * which the fixture guarantees and the report surfaces as `n_raters`):
    *   - per (source,item,cat) count c → per item Σc² and n=Σc;
    *   - P̄  = (ΣᵢΣⱼc²  − N·n) / (N·n·(n−1)), floor-quantized ×1e6 from
    *     exact BIGINTs;
    *   - P̄ₑ = Σⱼ(Σᵢcᵢⱼ)² / (N·n)², same quantization;
    *   - κ = (P̄₆−P̄ₑ₆)·1e6 / (1e6−P̄ₑ₆) floored — computed FROM the two
    *     quantized values, so both engines make the identical integer
    *     decisions all the way down.
    * Three aggregations (item-keyed, then source-keyed twice), report is
    * |sources| rows.
    */
  def fleissKappa(ratingsDf: DataFrame): DataFrame = {
    val cnt = ratingsDf.groupBy(col("source"), col("item_id"), col("cat"))
      .agg(count(lit(1)).as("c"))
    val perItem = cnt.groupBy(col("source"), col("item_id"))
      .agg(sum(col("c") * col("c")).as("s2"), sum(col("c")).as("n_i"))
    val perSource = perItem.groupBy(col("source"))
      .agg(count(lit(1)).as("n_items"), sum(col("s2")).as("sum_s2"),
        max(col("n_i")).as("n_raters"))
    val catTot = cnt.groupBy(col("source"), col("cat"))
      .agg(sum(col("c")).as("cj"))
      .groupBy(col("source")).agg(sum(col("cj") * col("cj")).as("sum_cj2"))
    val nn = col("n_items") * col("n_raters")
    val joined = perSource.join(catTot, Seq("source"))
      .withColumn("pbar6", floor((col("sum_s2") - nn) * 1000000L /
        (nn * (col("n_raters") - 1))))
      .withColumn("pe6", floor(col("sum_cj2") * 1000000L / (nn * nn)))
      .withColumn("kappa6",
        floor((col("pbar6") - col("pe6")) * 1000000L / (lit(1000000L) - col("pe6"))))
    joined.select(col("source"), col("n_items"), col("n_raters"),
      (col("pbar6").cast("double") / 1e6).as("p_bar"),
      (col("pe6").cast("double") / 1e6).as("p_e"),
      (col("kappa6").cast("double") / 1e6).as("kappa"))
  }

  /** Gwet's AC1 (q304) — the chance-corrected agreement that survives
    * the "kappa paradox": [[fleissKappa]]'s chance model charges the
    * raters for PREVALENCE (two raters agreeing that almost everything
    * is the majority class read κ ≈ 0 even at 95% raw agreement);
    * Gwet's chance model 2008 prices chance agreement by category
    * UNCERTAINTY instead — p_e = Σ_c π_c(1−π_c)/(q−1) — so skewed
    * label distributions don't zero out honest agreement. Same census
    * as Fleiss (constant raters r per item, the fixture contract):
    * p_a = (Σ r_ic(r_ic−1)) / (n·r(r−1)), π_c = C_c/(nr), and
    * AC1 = (p_a − p_e)/(1 − p_e) closed-forms to one exact integer
    * division: AC1₆ = (paN·eD − eN·paD)·10⁶ div (paD·(eD − eN)) with
    * eN = Σ C_c(nr − C_c), eD = (q−1)(nr)² — every term BIGINT/DECIMAL
    * (ceiling: paN·eD rides n³r⁴q, exact in DECIMAL(38,0) to n ≈ 10⁸
    * items at r = 5). q counts the OBSERVED categories in the group;
    * q < 2 or eD = eN (all mass one category) → NULL.
    *
    * Scale: the Fleiss census shapes — item-keyed then source-keyed
    * aggregations, |sources|-row arithmetic.
    */
  def gwetAC1(ratingsDf: DataFrame): DataFrame = {
    val cnt = ratingsDf.groupBy(col("source"), col("item_id"), col("cat"))
      .agg(count(lit(1)).as("c"))
    val perItem = cnt.groupBy(col("source"), col("item_id"))
      .agg(sum(col("c") * (col("c") - 1L)).as("agree2"),
        sum(col("c")).as("n_i"))
    val perSource = perItem.groupBy(col("source"))
      .agg(count(lit(1)).as("n_items"), sum(col("agree2")).as("_pan"),
        max(col("n_i")).as("n_raters"), min(col("n_i")).as("_rmin"))
    val catTot = cnt.groupBy(col("source"), col("cat"))
      .agg(sum(col("c")).as("_cc"))
    val cats = catTot.groupBy(col("source"))
      .agg(count(lit(1)).as("_q"), sum(col("_cc")).as("_nr"),
        sum(col("_cc").cast("decimal(38,0)") * col("_cc")).as("_cc2"))
    perSource.join(cats, Seq("source"))
      // eN = Σ C_c(nr − C_c) = nr·Σ C_c − Σ C_c² ; eD = (q−1)(nr)²
      .withColumn("_en", expr(
        "CAST(_nr AS DECIMAL(38,0)) * _nr - _cc2"))
      .withColumn("_ed", expr(
        "(_q - 1) * CAST(_nr AS DECIMAL(38,0)) * _nr"))
      .withColumn("_pad", expr(
        "CAST(n_items AS DECIMAL(38,0)) * n_raters * (n_raters - 1)"))
      .withColumn("_ac16", when(col("_rmin") === col("n_raters")
          && col("_q") >= 2 && col("n_raters") >= 2
          && col("_ed") > col("_en"), expr(
        """(CAST(_pan AS DECIMAL(38,0)) * _ed - _en * _pad) * 1000000
           div nullif(_pad * (_ed - _en), 0)""").cast("long")))
      .select(col("source"), col("n_items"), col("n_raters"),
        col("_q").as("n_cats"), col("_ac16").as("ac1_6"))
  }

  /** Deterministic paired-score fixture for [[wilcoxonSignedRank]]:
    * per task, model A's and model B's scores in integer millionths.
    * A's score is hash-uniform; B's is A's plus a decorrelated noise
    * term (second multiplicative fold through a different prime — the
    * [[pairedCats]] nonlinearity discipline) that is POSITIVELY biased
    * (+[0..30000) on u%5<3, −[0..20000) otherwise) — a planted median
    * shift for the signed-rank test to find, with enough sign mixing
    * that the test is non-trivial. ~1/40 of diffs land exactly 0 (the
    * zero-drop path stays exercised). Output (task_id, source,
    * score_a6, score_b6).
    */
  def pairedScores(docs: DataFrame): DataFrame = {
    val h = CorpusOps.idHash(col("task_id"))
    val u = ((h % 999979L) * 69621L) % 2147483647L
    val noise = when(u % 5 < 3, (u % 30000L))
      .otherwise(-(u % 20000L))
    docs.select(col("doc_id").as("task_id"), col("source"))
      .withColumn("score_a6", (h % 1000000L).cast("long"))
      .withColumn("score_b6",
        (col("score_a6") + when(u % 40 === 0, 0L).otherwise(noise))
          .cast("long"))
  }

  /** Wilcoxon signed-rank test per source (q318) — the PAIRED-samples
    * gap in the location battery ([[mannWhitney]] compares independent
    * groups; [[mcnemar]] pairs booleans; this pairs CONTINUOUS scores
    * — "did model B genuinely score higher than A on the same tasks",
    * with shared task difficulty cancelling in the differences): drop
    * zero differences (Wilcoxon's convention, documented), rank |d|
    * with doubled midranks over the |d| VALUE SET, W₂ = Σ_{d>0} r₂.
    *
    * Exactness: E[W₂] = m(m+1)/2 exact integer; the tie-corrected
    * 12·Var[W₂] = 2m(m+1)(2m+1) − Σ(t³−t) exact BIGINT, so
    * z₆ = ⌊(W₂ − E₂)·10⁶ / √((12Var₂)/12)⌋ — ONE IEEE sqrt on the
    * exact integer over 12.0 (the turningPoints recipe). Verdict
    * |z₆| > 1 959 964; m = 0 (all ties) or all-tied |d| (Var = 0) →
    * NULL.
    *
    * Scale: one census to the per-source |d| value set; ranks run over
    * value sets, never task rows; |sources|-row arithmetic after.
    */
  def wilcoxonSignedRank(paired: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val d = paired
      .withColumn("_d", col("score_b6") - col("score_a6"))
      .filter(col("_d") =!= 0L)
      .withColumn("_ad", abs(col("_d")))
    val census = d.groupBy(col("source"), col("_ad"))
      .agg(count(lit(1)).as("_ct"),
        sum(when(col("_d") > 0, 1L).otherwise(0L)).as("_pos"))
    val wv = W.partitionBy(col("source")).orderBy(col("_ad"))
      .rowsBetween(W.unboundedPreceding, 0)
    val ranked = census.withColumn("_r2",
      lit(2L) * sum(col("_ct")).over(wv) - col("_ct") + 1L)
    ranked.groupBy(col("source"))
      .agg(sum(col("_ct")).as("n_pairs"),
        sum(col("_pos") * col("_r2")).as("w2"),
        sum(col("_ct") * col("_ct") * col("_ct") - col("_ct")).as("_tie"))
      .withColumn("_e2", expr("n_pairs * (n_pairs + 1) div 2"))
      .withColumn("_var12", expr(
        """2 * CAST(n_pairs AS DECIMAL(38,0)) * (n_pairs + 1)
          * (2 * n_pairs + 1) - _tie"""))
      .withColumn("z6", when(col("n_pairs") > 0 && col("_var12") > 0,
        floor((col("w2") - col("_e2")).cast("double") * 1e6
          / sqrt(col("_var12").cast("double") / 12.0)).cast("long")))
      .select(col("source"), col("n_pairs"), col("w2"), col("z6"),
        when(col("z6").isNotNull, abs(col("z6")) > 1959964L)
          .as("shifted"))
  }

  /** Randolph's free-marginal multirater κ (q309) — the third corner of
    * the chance-correction triangle beside [[fleissKappa]] (prevalence-
    * based pe, punishes skewed labels) and [[gwetAC1]] (uncertainty-
    * based pe): Randolph (2005) prices chance at the FIXED-marginal
    * floor pe = 1/q — the right model when raters are NOT quota-bound
    * to reproduce a label distribution (every labeling rubric without
    * per-class quotas), and the standard companion report when Fleiss κ
    * and raw agreement disagree. κ_free = (p̄ − 1/q)/(1 − 1/q).
    *
    * Exactness: p̄₆ is the IDENTICAL Fleiss quantity (same census, same
    * floor); κ_free₆ = (p̄₆·q − 10⁶) div (q − 1) — one truncating
    * division on the already-quantized p̄₆ (the fleiss κ₆ double-floor
    * contract). q counts the OBSERVED categories in the group (the
    * gwetAC1 convention, documented — a category no rater ever used is
    * unknowable here). Constant-raters contract gated (rmin = rmax);
    * q < 2 or r < 2 → NULL.
    *
    * Scale: the Fleiss census shapes — item-keyed then source-keyed
    * aggregations, |sources|-row arithmetic.
    */
  def randolphKappa(ratingsDf: DataFrame): DataFrame = {
    val cnt = ratingsDf.groupBy(col("source"), col("item_id"), col("cat"))
      .agg(count(lit(1)).as("c"))
    val perItem = cnt.groupBy(col("source"), col("item_id"))
      .agg(sum(col("c") * col("c")).as("s2"), sum(col("c")).as("n_i"))
    val perSource = perItem.groupBy(col("source"))
      .agg(count(lit(1)).as("n_items"), sum(col("s2")).as("sum_s2"),
        max(col("n_i")).as("n_raters"), min(col("n_i")).as("_rmin"))
    val cats = cnt.groupBy(col("source"))
      .agg(countDistinct(col("cat")).as("n_cats"))
    val nn = col("n_items") * col("n_raters")
    perSource.join(cats, Seq("source"))
      .withColumn("_pbar6", floor((col("sum_s2") - nn) * 1000000L /
        (nn * (col("n_raters") - 1))))
      .withColumn("kfree6", when(col("_rmin") === col("n_raters")
          && col("n_cats") >= 2 && col("n_raters") >= 2,
        expr("(_pbar6 * n_cats - 1000000) div (n_cats - 1)")))
      .select(col("source"), col("n_items"), col("n_raters"),
        col("n_cats"), col("_pbar6").as("pbar6"), col("kfree6"))
  }

  /** Deterministic paired-categorical fixture for [[bowker]]: per task,
    * model A's and model B's answer CATEGORY (0..q−1) — the multi-class
    * face of [[modelOutcomes]]' booleans. A's category is the id-hash
    * class; B agrees except on a decorrelated draw (second
    * multiplicative fold through a different prime — the [[predictions]]
    * nonlinearity discipline, an affine second step would correlate
    * with catA over the id lattice): u%20 ∈ {0,1,2} → B answers one
    * class UP (mod q), u%20 = 3 → one class DOWN — a planted 3:1
    * directional asymmetry, exactly what Bowker exists to detect.
    * Output (task_id, source, cat_a, cat_b).
    */
  def pairedCats(docs: DataFrame, nCats: Int = 4): DataFrame = {
    val h = CorpusOps.idHash(col("task_id"))
    val u = ((h % 999983L) * 48271L) % 2147483647L % 20L
    val ca = h % nCats
    docs.select(col("doc_id").as("task_id"), col("source"))
      .withColumn("cat_a", ca.cast("long"))
      .withColumn("cat_b",
        when(u < 3, (ca + 1) % nCats)
          .when(u === 3, (ca + nCats - 1) % nCats)
          .otherwise(ca).cast("long"))
  }

  /** Bowker's symmetry test (q310) — [[mcnemar]] generalized to q ≥ 2
    * answer categories: on paired per-task categorical outcomes, is the
    * disagreement DIRECTIONAL (model B systematically drifts answers
    * toward certain classes — the signature of a miscalibrated refusal/
    * hedge class) or symmetric noise? χ² = Σ_{i<j}(n_ij−n_ji)²/(n_ij+n_ji)
    * with df = #{pairs with n_ij+n_ji > 0} (empty pairs carry no
    * information and drop from both the sum and the df — the standard
    * convention).
    *
    * Exactness: the (source, cat_a, cat_b) census collapses map-side;
    * the q(q−1)/2 pair spine is a broadcast literal grid; each term
    * floors independently at millionths ((n_ij−n_ji)²·10⁶ div
    * (n_ij+n_ji) — per-term flooring, replayed identically by the
    * oracle) and χ²₆ is their exact sum. Significance via the
    * Wilson–Hilferty cube at the OBSERVED df (the friedman recipe),
    * df floored at 1 under the gate. df = 0 (no discordant pairs at
    * all) → NULL.
    *
    * Scale: corpus rows enter ONE census; everything after is
    * |sources|·q²-row arithmetic.
    */
  def bowker(paired: DataFrame, nCats: Int = 4): DataFrame = {
    val cells = paired.groupBy(col("source"),
        col("cat_a").as("_i"), col("cat_b").as("_j"))
      .agg(count(lit(1)).as("_c"))
    val srcs = paired.select(col("source")).distinct()
    val pairSpine = (for { i <- 0 until nCats; j <- (i + 1) until nCats }
      yield (i.toLong, j.toLong)).toSeq
    val spine = srcs.crossJoin(broadcast(
      paired.sparkSession.createDataFrame(pairSpine)
        .toDF("_i", "_j")))
    val terms = spine
      .join(cells, Seq("source", "_i", "_j"), "left")
      .withColumnRenamed("_c", "_nij")
      .join(cells.select(col("source"), col("_i").as("_j"),
        col("_j").as("_i"), col("_c").as("_nji")),
        Seq("source", "_i", "_j"), "left")
      .withColumn("_nij", coalesce(col("_nij"), lit(0L)))
      .withColumn("_nji", coalesce(col("_nji"), lit(0L)))
      .withColumn("_tot", col("_nij") + col("_nji"))
      .withColumn("_t6", when(col("_tot") > 0,
        expr("""CAST(_nij - _nji AS DECIMAL(38,0)) * (_nij - _nji)
                * 1000000 div nullif(_tot, 0)""").cast("long"))
        .otherwise(lit(0L)))
    terms.groupBy(col("source"))
      .agg(count(lit(1)).as("_npairs"),
        sum(when(col("_tot") > 0, 1L).otherwise(0L)).as("df"),
        sum(col("_t6")).as("chi2_6"),
        sum(col("_tot")).as("n_discordant"))
      .withColumn("_nu", greatest(col("df"), lit(1L)).cast("double"))
      .withColumn("_wh", lit(1.0) - lit(2.0) / (lit(9.0) * col("_nu"))
        + lit(1.6448536269514722) * sqrt(lit(2.0) / (lit(9.0) * col("_nu"))))
      .withColumn("crit6", when(col("df") >= 1, floor(col("_nu")
        * col("_wh") * col("_wh") * col("_wh") * 1e6).cast("long")))
      .select(col("source"), col("df"), col("n_discordant"),
        when(col("df") >= 1, col("chi2_6")).as("chi2_6"),
        col("crit6"),
        when(col("df") >= 1, col("chi2_6") > col("crit6"))
          .as("asymmetric"))
  }

  /** Ordinal association battery per source (q319) — Goodman–Kruskal γ
    * and BOTH Somers' D asymmetries between two ordinal bucketings
    * (byte-length bucket vs token-count bucket — "does more bytes mean
    * more tokens, monotonically", per source; a source where the two
    * diverge has unusual tokenization density worth inspecting).
    * Kendall τ-b (q255) treats the two variables symmetrically; γ
    * ignores ALL ties (the optimist), Somers' d_yx/d_xy charge ties on
    * the DEPENDENT side only — the directional "does X predict Y"
    * reads (Somers 1962).
    *
    * Exactness, doubled-pair convention: over the (source, x, y) cell
    * census, one cell-pair join on x_a < x_b classifies pairs —
    * C₂ = 2C from y_a < y_b, D₂ = 2D from y_a > y_b; tie masses from
    * the margins: TY₂ = Σ_y n_y(n_y−1) − Σ_cell n(n−1) (tied on Y but
    * not both), TX₂ likewise. γ₆ = (C₂−D₂)·10⁶ div (C₂+D₂),
    * d_yx₆ = (C₂−D₂)·10⁶ div (C₂+D₂+TY₂), d_xy₆ with TX₂ — each ONE
    * truncating DECIMAL(38,0) division. C+D = 0 (any degenerate
    * margin) → NULL γ; zero denominators → NULL.
    *
    * Scale: corpus rows enter ONE census; the pair join runs on the
    * bounded per-source CELL GRID (buckets², never rows²); margins are
    * grid aggregations.
    */
  def ordinalAssociation(docs: DataFrame, xBucket: Long = 200L,
      yBucket: Long = 30L): DataFrame = {
    val nWords = size(filter(split(col("text"), " "), t => t =!= lit("")))
      .cast("long")
    val b = docs.select(col("source"),
      expr(s"n_chars div $xBucket").as("_x"),
      (nWords / yBucket).cast("long").as("_y"))
    val cells = b.groupBy(col("source"), col("_x"), col("_y"))
      .agg(count(lit(1)).as("_n"))
    val pair = cells.alias("a").join(cells.alias("b"),
        col("a.source") === col("b.source")
          && col("a._x") < col("b._x"))
      .groupBy(col("a.source").as("source"))
      .agg(
        sum(when(col("a._y") < col("b._y"),
          col("a._n").cast("decimal(38,0)") * col("b._n"))
          .otherwise(lit(0L).cast("decimal(38,0)"))).as("_c"),
        sum(when(col("a._y") > col("b._y"),
          col("a._n").cast("decimal(38,0)") * col("b._n"))
          .otherwise(lit(0L).cast("decimal(38,0)"))).as("_d"))
    val xm = cells.groupBy(col("source"), col("_x"))
      .agg(sum(col("_n")).as("_nx"))
      .groupBy(col("source"))
      .agg(sum(col("_nx").cast("decimal(38,0)") * (col("_nx") - 1L))
        .as("_txall"))
    val ym = cells.groupBy(col("source"), col("_y"))
      .agg(sum(col("_n")).as("_ny"))
      .groupBy(col("source"))
      .agg(sum(col("_ny").cast("decimal(38,0)") * (col("_ny") - 1L))
        .as("_tyall"))
    val both = cells.groupBy(col("source"))
      .agg(sum(col("_n")).as("n_docs"),
        sum(col("_n").cast("decimal(38,0)") * (col("_n") - 1L))
          .as("_tboth"))
    both.join(pair, Seq("source"), "left")
      .join(xm, Seq("source")).join(ym, Seq("source"))
      .withColumn("_c2", coalesce(col("_c") * 2L,
        lit(0L).cast("decimal(38,0)")))
      .withColumn("_d2", coalesce(col("_d") * 2L,
        lit(0L).cast("decimal(38,0)")))
      .withColumn("_ty2", col("_tyall") - col("_tboth"))
      .withColumn("_tx2", col("_txall") - col("_tboth"))
      .withColumn("gamma6", when(col("_c2") + col("_d2") > 0,
        expr("(_c2 - _d2) * 1000000 div nullif(_c2 + _d2, 0)")
          .cast("long")))
      .withColumn("dyx6", when(col("_c2") + col("_d2") + col("_ty2") > 0,
        expr("(_c2 - _d2) * 1000000 div nullif(_c2 + _d2 + _ty2, 0)")
          .cast("long")))
      .withColumn("dxy6", when(col("_c2") + col("_d2") + col("_tx2") > 0,
        expr("(_c2 - _d2) * 1000000 div nullif(_c2 + _d2 + _tx2, 0)")
          .cast("long")))
      .select(col("source"), col("n_docs"),
        col("_c2").cast("long").as("c2"), col("_d2").cast("long").as("d2"),
        col("gamma6"), col("dyx6"), col("dxy6"))
  }

  /** Deterministic pairwise-battle fixture: one game per document between
    * two of `nModels` systems. Contestant a = idHash % m, opponent
    * b = (a + 1 + idHash % (m−1)) % m (always ≠ a), and the winner is
    * drawn by an integer rule whose odds are proportional to the models'
    * TRUE strengths (index+1): a wins iff (idHash % 1009) % (a+b+2) < a+1
    * — so higher-index models genuinely win more, giving the fit
    * something real to recover.
    *
    * Output: (game_id, model_a, model_b, winner).
    */
  def btGames(docs: DataFrame, nModels: Int = 8): DataFrame = {
    val h = CorpusOps.idHash(col("game_id"))
    docs.select(col("doc_id").as("game_id"))
      .withColumn("model_a", (h % nModels).cast("long"))
      .withColumn("model_b",
        ((h % nModels + 1 + h % (nModels - 1)) % nModels).cast("long"))
      .withColumn("winner",
        when((h % 1009) % (col("model_a") + col("model_b") + 2)
          < col("model_a") + 1, col("model_a")).otherwise(col("model_b")))
  }

  /** Bradley–Terry strength fit (q169): maximum-likelihood pairwise
    * strengths via Hunter's MM algorithm — the aggregate behind every
    * pairwise-preference leaderboard (chatbot arenas, RLHF reward
    * sanity checks). Model i's strength update each round is
    * πᵢ ← Wᵢ / Σⱼ nᵢⱼ/(πᵢ+πⱼ), then the vector is renormalized to mean
    * 1e6. Every update runs in INTEGER millionths (each addend and each
    * division floor-truncated), so a fixed iteration count produces
    * bit-identical strengths in any engine — the SQL oracle unrolls the
    * same `iters` rounds with `//` floor division.
    *
    * Scale shape: the corpus-sized work is two aggregations (the
    * symmetric pair matrix and the win counts); the MM loop then runs on
    * the DRIVER over ≤ |models|² matrix rows (the centroid-collect
    * pattern — |models| is leaderboard-sized, never corpus-sized), and
    * the result returns as |models| literal rows.
    */
  def bradleyTerry(games: DataFrame, iters: Int = 10): DataFrame = {
    val spark = games.sparkSession
    import spark.implicits._
    val edges = games.select(col("model_a").as("i"), col("model_b").as("j"))
      .unionByName(games.select(col("model_b").as("i"), col("model_a").as("j")))
      .groupBy("i", "j").agg(count(lit(1)).as("n"))
    val winsDf = games.groupBy(col("winner").as("i")).agg(count(lit(1)).as("w"))
    // driver-bounded collects: ≤ |models|² + |models| rows
    val e = edges.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val wins = winsDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ranked = btMmFit(e.toSeq, wins, iters).map {
      case (rank, i, g, w, str) => (rank, i, g, w, str.toDouble / 1e6)
    }
    ranked.toDF("rank", "model", "games", "wins", "strength")
  }

  /** The integer MM core of [[bradleyTerry]], extracted verbatim so the
    * streaming face ([[graft.streaming.EventStreams.bradleyTerryMonitor]])
    * refits the SAME recurrence per epoch and the spec can assert stream
    * ≡ batch bit-for-bit. Pure function on a leaderboard-sized census:
    * `edges` is the symmetric (i, j, n) pair matrix (both directions
    * present), `wins` the per-model win counts. Every addend and every
    * division floor-truncates in ×10⁶ / ×10¹² integer space, so a fixed
    * `iters` yields bit-identical strengths in any engine — the q169
    * SQL oracle unrolls the same rounds with `//`. Sums are order-free
    * (Long addition is associative; each addend is independently
    * floored), so map-iteration order cannot leak into the result.
    * Ceiling: n·10¹² stays in BIGINT to n ≈ 9.2·10⁶ games per ordered
    * pair — pre-bucket beyond that.
    *
    * Returns (rank, model, games, wins, strength6) sorted by
    * (−strength6, model), rank 1-based.
    */
  private[graft] def btMmFit(e: Seq[(Long, Long, Long)],
      wins: Map[Long, Long], iters: Int): Seq[(Long, Long, Long, Long, Long)] = {
    val models = e.map(_._1).distinct.sorted
    val m = models.length
    val gamesPer = e.groupBy(_._1).map { case (i, es) => i -> es.map(_._3).sum }
    val byI = e.groupBy(_._1)
    var s = models.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val u = models.map { i =>
        val d = byI(i).map { case (_, j, n) =>
          n * 1000000000000L / (s(i) + s(j))
        }.sum
        i -> (if (d > 0) wins.getOrElse(i, 0L) * 1000000000000L / d else 0L)
      }.toMap
      val t = u.values.sum
      s = u.map { case (i, v) => i -> v * m * 1000000L / t }
    }
    models.map(i => (i, gamesPer(i), wins.getOrElse(i, 0L), s(i)))
      .sortBy { case (i, _, _, str) => (-str, i) }
      .zipWithIndex.map { case ((i, g, w, str), idx) =>
        (idx + 1L, i, g, w, str)
      }
  }

  /** Deterministic eval-run fixture: per task (document), `n` samples
    * drawn (4–12, from the id hash) of which `c` solved the task
    * (0..n, from a decorrelated prime residue). These two integers are
    * all the pass@k estimator consumes.
    */
  def evalRuns(docs: DataFrame): DataFrame = {
    val h = CorpusOps.idHash(col("task_id"))
    docs.select(col("doc_id").as("task_id"), col("source"))
      .withColumn("n", (lit(4) + h % 9).cast("long"))
      .withColumn("c", ((h % 997) % (col("n") + 1)).cast("long"))
  }

  /** Deterministic prediction fixture: per document a confidence in
    * integer millionths (idHash-uniform) and a correctness draw from a
    * SECOND multiplicative hash step, planted so true accuracy is 4/5 of
    * stated confidence — a uniformly overconfident model, the exact
    * pathology a calibration report exists to expose. The correctness
    * rule is the pure integer comparison u2·5 < conf6·4 (no division
    * anywhere), so both engines make identical draws. The second draw
    * FOLDS the hash through a different prime before re-multiplying —
    * a purely linear second step stays correlated with conf6 over the
    * id lattice and silently mis-plants the calibration curve.
    */
  def predictions(docs: DataFrame): DataFrame = {
    val h = CorpusOps.idHash(col("pred_id"))
    val u2 = ((h % 999983L) * 48271L) % 2147483647L % 1000000L
    docs.select(col("doc_id").as("pred_id"), col("source"))
      .withColumn("conf6", h % 1000001L)
      .withColumn("correct", u2 * 5 < col("conf6") * 4)
  }

  /** Expected calibration error (q174): the reliability-diagram table —
    * predictions bucketed into 10 equal-width confidence bins per
    * source; each bin reports its count, mean stated confidence, and
    * realized accuracy (both floor-quantized millionths from exact
    * BIGINTs), the |conf−acc| gap, and the source's ECE (the
    * count-weighted mean gap — THE go/no-go number before trusting a
    * model's confidences for filtering or routing). Two aggregations
    * plus a |sources|-partition window; report is ≤ 10·|sources| rows.
    */
  def calibrationReport(preds: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val binned = preds.withColumn("bin",
      least(floor(col("conf6") / 100000L), lit(9L)))
    val perBin = binned.groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("conf6")).as("sum_conf6"),
        sum(when(col("correct"), 1L).otherwise(0L)).as("n_correct"))
      .withColumn("conf6b", floor(col("sum_conf6") / col("n")))
      .withColumn("acc6b", floor(col("n_correct") * 1000000L / col("n")))
      .withColumn("gap6", abs(col("conf6b") - col("acc6b")))
    val w = Window.partitionBy(col("source"))
    perBin
      .withColumn("ece6",
        floor(sum(col("gap6") * col("n")).over(w) / sum(col("n")).over(w)))
      .select(col("source"), col("bin"), col("n"),
        (col("conf6b").cast("double") / 1e6).as("conf"),
        (col("acc6b").cast("double") / 1e6).as("acc"),
        (col("gap6").cast("double") / 1e6).as("gap"),
        (col("ece6").cast("double") / 1e6).as("ece"))
  }

  /** Retrieval-run fixture: 10 queries, each with the documents in its
    * doc_id%10 slice as candidates; graded relevance (0/1/2) and a
    * good-but-imperfect ranker score (rel·10 + folded-hash noise) both
    * derive from a composite id hash — so the ranking genuinely
    * correlates with relevance and the metrics land in the informative
    * mid-range instead of 0 or 1.
    */
  def retrievalRuns(docs: DataFrame, nQueries: Int = 10): DataFrame = {
    val qid = (col("doc_id") % nQueries).cast("long")
    val h = CorpusOps.idHash(col("doc_id") * 1009 + qid)
    val rel = when(h % 20 === 0, 2L).when(h % 20 <= 2, 1L).otherwise(0L)
    docs.select(col("doc_id"), qid.as("qid"))
      .withColumn("rel", rel)
      .withColumn("score", col("rel") * 10 + (h % 997) % 15)
  }

  /** IR ranking metrics (q186): recall@k, MRR@k and nDCG@k per query —
    * the numbers every retrieval change is judged by. All three are
    * exact: per-rank DCG contributions floor-quantize to millionths
    * BEFORE summation (⌊(2^rel−1)·10⁶/log₂(r+1)⌋ — summing raw doubles
    * would make the result depend on aggregation order), so DCG, ideal
    * DCG and their ratio are integer decisions. System ranking and ideal
    * ranking are both per-query windows cut at k (WindowGroupLimit-
    * bounded state); queries with no relevant candidates report 0.
    */
  def irMetrics(runs: DataFrame, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sysW = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("doc_id"))
    val idealW = Window.partitionBy(col("qid"))
      .orderBy(col("rel").desc, col("doc_id"))
    def gain(relC: Column, rank: Column): Column =
      floor((pow(lit(2.0), relC.cast("double")) - 1.0) * 1000000L /
        (log(rank.cast("double") + 1.0) / math.log(2.0))).cast("long")
    val sys = runs.withColumn("rk", row_number().over(sysW))
      .filter(col("rk") <= k)
      .groupBy(col("qid")).agg(
        sum(when(col("rel") > 0, 1L).otherwise(0L)).as("rel_found"),
        min(when(col("rel") > 0, col("rk"))).as("first_rel"),
        sum(gain(col("rel"), col("rk"))).as("dcg6"))
    val ideal = runs.withColumn("rk", row_number().over(idealW))
      .filter(col("rk") <= k)
      .groupBy(col("qid"))
      .agg(sum(gain(col("rel"), col("rk"))).as("idcg6"))
    val totals = runs.groupBy(col("qid"))
      .agg(sum(when(col("rel") > 0, 1L).otherwise(0L)).as("n_relevant"))
    totals.join(sys, Seq("qid")).join(ideal, Seq("qid"))
      .select(col("qid"), col("n_relevant"),
        when(col("n_relevant") > 0,
          floor(col("rel_found") * 1000000L / col("n_relevant"))
            .cast("double") / 1e6).otherwise(0.0).as(s"recall_$k"),
        when(col("first_rel").isNotNull,
          floor(lit(1000000L) / col("first_rel")).cast("double") / 1e6)
          .otherwise(0.0).as(s"mrr_$k"),
        when(col("idcg6") > 0,
          floor(col("dcg6") * 1000000L / col("idcg6"))
            .cast("double") / 1e6).otherwise(0.0).as(s"ndcg_$k"))
  }

  /** Paired-model correctness fixture: per task, whether model A and
    * model B each solved it, driven by a shared per-task difficulty plus
    * independent folded-hash draws — A is planted slightly stronger, and
    * the shared difficulty makes outcomes correlated (the reason McNemar
    * exists: a two-proportion test would waste the pairing).
    */
  def pairedOutcomes(docs: DataFrame): DataFrame = {
    val h = CorpusOps.idHash(col("task_id"))
    val diff = h % 40
    val uA = ((h % 999983L) * 48271L) % 2147483647L % 100L
    val uB = ((h % 999979L) * 69621L) % 2147483647L % 100L
    docs.select(col("doc_id").as("task_id"), col("source"))
      .withColumn("a_ok", uA < lit(75L) - diff)
      .withColumn("b_ok", uB < lit(70L) - diff)
  }

  /** k-model paired correctness fixture (q296): [[pairedOutcomes]]
    * generalized — per task, model m solves it iff an independent
    * folded-hash draw clears a per-model base rate minus the SHARED
    * per-task difficulty (the correlation that makes a paired test the
    * right tool). Long format (task_id, source, model, ok); base rates
    * 78/74/70/66 plant a real ordering for Cochran's Q to find.
    */
  def modelOutcomes(docs: DataFrame, k: Int = 4): DataFrame = {
    require(k >= 2 && k <= 4, s"fixture supports 2..4 models, got $k")
    val h = CorpusOps.idHash(col("task_id"))
    val diff = h % 40
    val mults = Seq(48271L, 69621L, 16807L, 40692L)
    val mods = Seq(999983L, 999979L, 999961L, 999959L)
    val bases = Seq(78L, 74L, 70L, 66L)
    val arr = array((0 until k).map { m =>
      val u = ((h % mods(m)) * mults(m)) % 2147483647L % 100L
      struct(lit(s"m$m").as("model"),
        (u < lit(bases(m)) - diff).as("ok"))
    }: _*)
    docs.select(col("doc_id").as("task_id"), col("source"))
      .withColumn("_mo", explode(arr))
      .select(col("task_id"), col("source"),
        col("_mo.model").as("model"), col("_mo.ok").as("ok"))
  }

  /** McNemar's test (q184): per category, is model A genuinely better
    * than model B on PAIRED per-task outcomes — the correct significance
    * test for "same eval set, two models" (it only scores the discordant
    * tasks, so shared difficulty cancels). Continuity-corrected
    * χ² = (|b−c|−1)²/(b+c) computed ENTIRELY in integers (the square is
    * exact, the ratio floors at millionths), and significance is the
    * integer comparison χ²₆ > 3841458 (the df=1, α=0.05 critical value
    * in millionths) — no doubles anywhere in the decision. One
    * aggregation to |categories| rows.
    */
  def mcnemar(outcomes: DataFrame): DataFrame = {
    val agg = outcomes.groupBy(col("source")).agg(
      count(lit(1)).as("n_tasks"),
      sum(when(col("a_ok") && col("b_ok"), 1L).otherwise(0L)).as("both_right"),
      sum(when(!col("a_ok") && !col("b_ok"), 1L).otherwise(0L)).as("both_wrong"),
      sum(when(col("a_ok") && !col("b_ok"), 1L).otherwise(0L)).as("a_only"),
      sum(when(!col("a_ok") && col("b_ok"), 1L).otherwise(0L)).as("b_only"))
    val b = col("a_only")
    val c = col("b_only")
    val d = abs(b - c) - 1
    val chi6 = when(b + c > 0, floor(d * d * 1000000L / (b + c)))
      .otherwise(lit(0L))
    agg.withColumn("chi2_6", chi6)
      .select(col("source"), col("n_tasks"), col("both_right"),
        col("both_wrong"), col("a_only"), col("b_only"),
        (col("chi2_6").cast("double") / 1e6).as("chi2"),
        (col("chi2_6") > 3841458L).as("significant"),
        when(col("chi2_6") > 3841458L,
          when(b > c, "A").otherwise("B")).otherwise("tie").as("winner"))
  }

  /** Per-rater drift audit (q185): the actionable step after a low
    * Fleiss κ — WHICH rater disagrees with the room. Majority label per
    * item (count desc, category asc via a folded integer argmax — no
    * window), then per rater: agreement with the majority and Cohen's κ
    * against it (observed and chance agreement both exact floored
    * millionths; chance from the rater's and the majority's label
    * marginals). Raters whose κ sits far below the room's are the
    * relabel/retrain list. Two aggregations + one join; |raters| rows.
    */
  def raterDrift(ratingsDf: DataFrame): DataFrame = {
    val majority = ratingsDf.groupBy(col("item_id"), col("cat"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("item_id"))
      .agg(max_by(col("cat"), col("cnt") * 1000L - col("cat")).as("maj"))
    val joined = ratingsDf.join(majority, Seq("item_id"))
    val nItems = joined.select(col("item_id")).distinct().count()
    val perRater = joined.groupBy(col("rater")).agg(
      count(lit(1)).as("n_items"),
      sum(when(col("cat") === col("maj"), 1L).otherwise(0L)).as("n_agree"))
    // marginals for chance agreement: rater's label counts × majority's
    val ratMarg = joined.groupBy(col("rater"), col("cat"))
      .agg(count(lit(1)).as("rc"))
    val majMarg = majority.groupBy(col("maj").as("cat"))
      .agg(count(lit(1)).as("mc"))
    val pe = ratMarg.join(majMarg, Seq("cat"))
      .groupBy(col("rater"))
      .agg(floor(sum(col("rc") * col("mc")) * 1000000L /
        (lit(nItems) * nItems)).as("pe6"))
    // a rater whose labels never coincide with any majority label has
    // chance agreement exactly 0 — left join + coalesce, not a dropped row
    perRater.join(pe, Seq("rater"), "left")
      .withColumn("pe6", coalesce(col("pe6"), lit(0L)))
      .withColumn("po6", floor(col("n_agree") * 1000000L / col("n_items")))
      .select(col("rater"), col("n_items"), col("n_agree"),
        (col("po6").cast("double") / 1e6).as("p_agree"),
        (col("pe6").cast("double") / 1e6).as("p_chance"),
        (floor((col("po6") - col("pe6")) * 1000000L /
          (lit(1000000L) - col("pe6"))).cast("double") / 1e6).as("kappa"))
  }

  /** Wilson score interval (q182): per category (source), the binomial
    * confidence interval on accuracy that stays honest at small n and
    * extreme p — the error bars an eval report should print instead of
    * ±z√(p(1−p)/n) (which collapses to zero width at p∈{0,1}). Computed
    * over pooled [[evalRuns]] trials; the double chain (one sqrt) is
    * written identically in both engines and the bounds floor-quantize
    * at millionths. One aggregation to |categories| rows.
    */
  def wilsonCi(runs: DataFrame, z: Double = 1.96): DataFrame = {
    val agg = runs.groupBy(col("source"))
      .agg(sum(col("n")).as("trials"), sum(col("c")).as("successes"))
    val n = col("trials").cast("double")
    val p = col("successes").cast("double") / n
    val z2 = z * z
    val denom = lit(1.0) + lit(z2) / n
    val center = p + lit(z2) / (n * 2)
    val margin = lit(z) *
      sqrt(p * (lit(1.0) - p) / n + lit(z2) / (n * n * 4))
    def q6(c: Column) = floor(c * 1000000L).cast("double") / 1e6
    agg.select(col("source"), col("trials"), col("successes"),
      q6(p).as("acc"),
      q6((center - margin) / denom).as("ci_lo"),
      q6((center + margin) / denom).as("ci_hi"))
  }

  /** Poisson-bootstrap confidence interval (q183): per category, a
    * 95% CI on accuracy from `replicas` bootstrap resamples — using the
    * POISSON bootstrap, the resampling scheme that works distributed:
    * classic bootstrap needs a global sample-with-replacement (a
    * coordination point), while Poisson(1) weights are independent
    * per (row, replica), so the whole thing is one bounded explode and
    * one aggregation. Weights draw by inverse CDF against the literal
    * millionth-quantized Poisson(1) thresholds from md5-seeded uniforms
    * — fully integer, bit-identical anywhere. The interval is the
    * empirical 2.5%/97.5% replica accuracy (lower-rank convention,
    * exact floored-millionth replica accuracies); the replica table is
    * |categories|·replicas rows, so the ranking windows are bounded.
    */
  def bootstrapCi(runs: DataFrame, replicas: Int = 200): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // cumulative Poisson(1) CDF in millionths, k = 0..7 (tail capped)
    val ts = Seq(367879L, 735758L, 919698L, 981011L, 996340L, 999405L,
      999916L, 999989L)
    val u6 = Dedup.portableHash32(concat(col("task_id").cast("string"),
      lit("|boot|"), col("r").cast("string"))) % 1000000L
    val weight = ts.zipWithIndex.foldRight(lit(8L): Column) {
      case ((t, k), rest) => when(u6 < t, k.toLong).otherwise(rest)
    }
    val rep = runs.select(col("source"), col("task_id"), col("n"), col("c"),
        explode(sequence(lit(0), lit(replicas - 1))).as("r"))
      .withColumn("w", weight)
      .groupBy(col("source"), col("r"))
      .agg(sum(col("w") * col("c")).as("sr"), sum(col("w") * col("n")).as("tr"))
      .filter(col("tr") > 0)
      .withColumn("acc6", floor(col("sr") * 1000000L / col("tr")))
    // replica id in the order: equal accuracies must rank identically
    // in any engine
    val wnd = Window.partitionBy(col("source"))
      .orderBy(col("acc6"), col("r"))
    val loRank = math.floor(0.025 * (replicas - 1)).toLong + 1
    val hiRank = math.floor(0.975 * (replicas - 1)).toLong + 1
    val ranked = rep.withColumn("rk", row_number().over(wnd))
    val point = runs.groupBy(col("source"))
      .agg((floor(sum(col("c")) * 1000000L / sum(col("n"))).cast("double")
        / 1e6).as("acc"))
    point
      .join(ranked.filter(col("rk") === loRank)
        .select(col("source"), (col("acc6").cast("double") / 1e6).as("boot_lo")),
        Seq("source"))
      .join(ranked.filter(col("rk") === hiRank)
        .select(col("source"), (col("acc6").cast("double") / 1e6).as("boot_hi")),
        Seq("source"))
  }

  /** pass@k (q170): the unbiased estimator from the Codex paper —
    * pass@k = 1 − C(n−c,k)/C(n,k), the probability that a random size-k
    * subset of the n samples contains a correct one. Computed as the
    * exact integer ratio Π(n−c−t)/Π(n−t), t<k (numerator clamped at 0
    * when n−c<k, where every subset must contain a solve), floored at
    * millionths — the per-task number every eval report aggregates.
    * k>n is reported null (the estimator is undefined there). Row-local
    * arithmetic, zero shuffle.
    */
  def passAtK(runs: DataFrame, ks: Seq[Int] = Seq(1, 4, 8)): DataFrame = {
    def p(k: Int): Column = {
      val num = aggregate(sequence(lit(0), lit(k - 1)), lit(1L),
        (acc, t) => acc * greatest(col("n") - col("c") - t, lit(0L)))
      val den = aggregate(sequence(lit(0), lit(k - 1)), lit(1L),
        (acc, t) => acc * (col("n") - t))
      when(col("n") < k, lit(null).cast("double"))
        .otherwise(
          (lit(1000000L) - floor(num * 1000000L / den)).cast("double") / 1e6)
    }
    ks.foldLeft(runs)((df, k) => df.withColumn(s"pass_$k", p(k)))
  }

  /** Murphy decomposition of the Brier score (q212), per source:
    * BS = REL − RES + UNC + resid over the same 10 equal-width
    * confidence bins as [[calibrationReport]] — ECE localizes WHERE
    * confidences lie; this splits the total probabilistic loss into
    * miscalibration (REL: fixable by remapping confidences), honest
    * discrimination (RES: how much the bins separate outcomes — no
    * remap can buy more), irreducible base-rate noise (UNC), and the
    * within-bin residual (exactly 0 when a bin's confidences are
    * constant; reported, not hidden, so the identity is auditable).
    *
    * All terms are exact integer folds in millis-squared micro-units:
    * per-bin squares divide by n_b as integers, per-source terms divide
    * by N (and N³ for RES) — no float sums. The RES term's
    * d²·10⁶ div n_b (d = y_b·N − y·n_b, |d| ≤ n_b·N) would overflow
    * BIGINT past n_b·N ≈ 3·10⁶, so it is computed by EXACT
    * quotient/remainder algebra — with q = d div n_b, r = d mod n_b:
    * d²·10⁶ div n_b = q²·n_b·10⁶ + 2qr·10⁶ + (r² div n_b)·10⁶ +
    * (r² mod n_b)·10⁶ div n_b — where every true DIVISION runs on
    * BIGINT-safe magnitudes and only the (division-free, hence exact)
    * products are lifted to DECIMAL(38,0); the REL/UNC terms use the
    * same decomposition entirely in BIGINT. The values are
    * algebraically IDENTICAL to the direct formulas, so the DuckDB
    * oracle keeps its direct HUGEINT replay (exact to n_b·N ≈ 1.3·10¹⁶
    * on its side). Engine bound: N ≤ 10⁹ rows per source — ENFORCED by
    * an `assert_true` fused into the per-bin projection, failing loud
    * with a shard-the-source message instead of silently wrapping.
    * Two aggregations, then |sources|-sized arithmetic.
    */
  def brierDecomposition(preds: DataFrame): DataFrame = {
    val p3 = expr("conf6 div 1000")
    val y = when(col("correct"), 1L).otherwise(0L)
    val binned = preds
      .withColumn("bin", least(floor(col("conf6") / 100000L), lit(9L)))
      .withColumn("p3", p3).withColumn("y", y)
      .withColumn("d", col("p3") - lit(1000L) * col("y"))
    val perBin = binned.groupBy(col("source"), col("bin")).agg(
      count(lit(1)).as("nb"), sum(col("p3")).as("sb"),
      sum(col("y")).as("yb"), sum(col("d") * col("d")).as("d2b"))
    val perSrc = perBin.groupBy(col("source")).agg(
      sum(col("nb")).as("n"), sum(col("yb")).as("ytot"),
      sum(col("d2b")).as("d2"))
    perBin.join(perSrc, "source")
      // REL: e² div nb with e = |sb − 1000·yb| ≤ nb·10³; q/r-decomposed
      // so every product stays under 2⁶³ at N ≤ 10⁹ (qe ≤ 10³,
      // re < nb ≤ 10⁹ → qe²·nb ≤ 10¹⁵, re² ≤ 10¹⁸)
      .withColumn("_ea", expr("abs(sb - 1000 * yb)"))
      .withColumn("_qe", expr("_ea div nb"))
      .withColumn("_re", expr("_ea % nb"))
      .withColumn("relT", expr(
        "_qe * _qe * nb + 2 * _qe * _re + _re * _re div nb"))
      // RES: d²·10⁶ div nb, same decomposition; the two overflow-prone
      // products (q²·nb·10⁶ ≤ 10³³, 2qr·10⁶ ≤ 2·10²⁴) lift to
      // DECIMAL(38,0) — exact multiplications, no decimal division
      .withColumn("_a", expr(
        "if(assert_true(n <= 1000000000, " +
          "'brierDecomposition: source exceeds the exact-arithmetic " +
          "bound 1e9 rows - shard the source') is null, " +
          "abs(yb * n - ytot * nb), cast(null as bigint))"))
      .withColumn("_q", expr("_a div nb"))
      .withColumn("_r", expr("_a % nb"))
      .withColumn("resT", expr(
        "cast(_q as decimal(38,0)) * _q * nb * 1000000" +
          " + cast(2 * _q * _r as decimal(38,0)) * 1000000" +
          " + cast((_r * _r div nb) * 1000000" +
          "        + (_r * _r % nb) * 1000000 div nb as decimal(38,0))"))
      .groupBy(col("source")).agg(
        first(col("n")).as("n"), first(col("ytot")).as("ytot"),
        first(col("d2")).as("d2"),
        sum(col("relT")).as("relSum"),
        sum(col("resT")).cast("decimal(38,0)").as("resSum"))
      .withColumn("bs6", expr("d2 div n"))
      .withColumn("rel6", expr("relSum div n"))
      // res6 = resSum div n³ exactly: subtract the decimal remainder,
      // then the division is exact (integral quotient ≤ 10⁶ — no
      // rounding can occur on an exact integer result)
      .withColumn("_n3", expr("cast(n as decimal(38,0)) * n * n"))
      .withColumn("res6", expr(
        "cast((resSum - pmod(resSum, _n3)) / _n3 as bigint)"))
      // UNC: v·10⁶ div n² as ((v·10⁶ div n) div n) — the floor-nesting
      // identity ⌊⌊x/n⌋/n⌋ = ⌊x/n²⌋ — with the inner div decomposed to
      // stay in BIGINT (v div n ≤ n/4 ≤ 2.5·10⁸)
      .withColumn("_v", expr("ytot * (n - ytot)"))
      .withColumn("unc6", expr(
        "((_v div n) * 1000000 + (_v % n) * 1000000 div n) div n"))
      .select(col("source"), col("n"),
        (col("bs6").cast("double") / 1e6).as("brier"),
        (col("rel6").cast("double") / 1e6).as("reliability"),
        (col("res6").cast("double") / 1e6).as("resolution"),
        (col("unc6").cast("double") / 1e6).as("uncertainty"),
        ((col("bs6") - (col("rel6") - col("res6") + col("unc6")))
          .cast("double") / 1e6).as("resid"))
  }

  /** Average precision / PR-AUC (q216): Σ_thresholds ΔTP·precision —
    * the rare-positive companion to [[rankAuc]] (ROC-AUC stays
    * optimistic under class imbalance because FPR divides by the huge
    * negative count; precision divides by retrieved, so AP collapses
    * exactly when a filter would actually drown in false positives).
    * Ties enter as whole threshold blocks with precision measured after
    * the block — the standard step-wise definition. Same value-set
    * collapse as rankAuc: the only window runs over distinct quantized
    * scores, cumulative TP/FP are exact BIGINTs, per-threshold
    * precision quantizes to millionths once, ap = ⌊Σ ΔTP·prec₆ / P⌋.
    * Overflow bound: each term np·prec₆ ≤ np·10⁶, so
    * apNum ≤ n₊·10⁶ < 2⁶³ holds until n₊ ≈ 9.2·10¹² positives —
    * comfortably past any labeled corpus; no DECIMAL lift needed
    * (contrast rankAuc, whose U₂ is pair-COUNT-sized and binds at
    * n₊·n₋ < 4.6·10¹²).
    */
  def prAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val g = df.groupBy(col(scoreCol).as("s")).agg(
      sum(when(col(labelCol), 1L).otherwise(0L)).as("np"),
      sum(when(!col(labelCol), 1L).otherwise(0L)).as("nn"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("s").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    g.withColumn("tp", sum(col("np")).over(w))
      .withColumn("fp", sum(col("nn")).over(w))
      .withColumn("prec6", expr("tp * 1000000 div (tp + fp)"))
      .agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
        sum(col("np") * col("prec6")).as("apNum"))
      .select(col("n_pos"), col("n_neg"),
        (expr("apNum div n_pos").cast("double") / 1e6).as("ap"))
  }

  /** Exact rank-sum AUC (q206): the Mann-Whitney probability that a
    * classifier/quality score ranks a random positive above a random
    * negative, with the standard half-credit for ties — THE
    * threshold-free read on whether a score separates classes at all
    * (the [[calibrationReport]] complement: ECE asks "are the
    * probabilities honest", AUC asks "is the ordering right").
    *
    * Computed WITHOUT a corpus-sized ranking window: scores collapse to
    * a (score → n_pos, n_neg) table first (map-side combine), the
    * negatives-below cumulative runs over |distinct scores| rows (a
    * quantized score has a BOUNDED value set — the only window in the
    * plan is value-set-sized, never corpus-sized), and
    * U₂ = Σ_s n₊(s)·(2·negBelow(s) + n₋(s)) counts concordant pairs
    * doubled to keep tie half-credit integral. auc = ⌊U₂·10⁶/(2·n₊n₋)⌋
    * exact BIGINTs — overflow bound n₊·n₋ < 4.6·10¹² (≈3M balanced
    * rows); past that, stratify per group or lift U₂ to DECIMAL.
    */
  def rankAuc(df: DataFrame, scoreCol: String,
      labelCol: String): DataFrame = {
    val g = df.groupBy(col(scoreCol).as("s")).agg(
      sum(when(col(labelCol), 1L).otherwise(0L)).as("np"),
      sum(when(!col(labelCol), 1L).otherwise(0L)).as("nn"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val cum = g.withColumn("below_n",
      coalesce(sum(col("nn")).over(w), lit(0L)))
    cum.agg(sum(col("np")).as("tp"), sum(col("nn")).as("tn"),
        sum(col("np") * (lit(2L) * col("below_n") + col("nn"))).as("u2"))
      .select(col("tp").as("n_pos"), col("tn").as("n_neg"),
        (expr("u2 * 1000000 div (2 * tp * tn)").cast("double") / 1e6)
          .as("auc"))
  }

  /** Split-conformal calibration (q226) — the distribution-free
    * selective-prediction guarantee (Vovk et al.; Angelopoulos & Bates
    * 2021 tutorial formulation): from a calibration split's integral
    * nonconformity scores, q̂ = the k-th smallest with
    * k = ⌈(n+1)(1−α)⌉, and any future example accepted iff its score
    * ≤ q̂ is covered with probability ≥ 1−α — no model or
    * distributional assumption. The holdout coverage column is the
    * finite-sample audit of that guarantee (≈ 1−α up to ±O(1/√n)).
    *
    * q̂ is an exact ORDER STATISTIC (no interpolation — the conformal
    * guarantee needs the ceiling rank, not a smoothed quantile):
    * k = ((n+1)·(den−num) + den − 1) div den in exact integers, capped
    * at n (α smaller than 1/(n+1) has no finite guarantee; the cap
    * makes q̂ the max score — the honest degenerate answer). Per-group
    * value-set collapse + one value-set window; the holdout census
    * joins the |groups|-row threshold table broadcast onto the
    * COLLAPSED test value table.
    */
  def conformalThreshold(df: DataFrame, groupCol: String,
      scoreCol: String, calCol: String, alphaNum: Int = 1,
      alphaDen: Int = 10): DataFrame = {
    require(alphaNum > 0 && alphaNum < alphaDen)
    val g = df.groupBy(col(groupCol).as("_g"), col(scoreCol).as("_v"))
      .agg(sum(when(col(calCol), 1L).otherwise(0L)).as("_cc"),
        sum(when(!col(calCol), 1L).otherwise(0L)).as("_tc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_g")).orderBy(col("_v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val cum = g.withColumn("_cum", sum(col("_cc")).over(w))
      .withColumn("_n", sum(col("_cc")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("_g"))))
    val k = expr(s"least(_n, ((_n + 1) * ${alphaDen - alphaNum} " +
      s"+ $alphaDen - 1) div $alphaDen)")
    val fences = cum.withColumn("_k", k)
      .groupBy(col("_g"))
      .agg(max(col("_n")).as("n_cal"), max(col("_k")).as("k"),
        min(when(col("_cum") >= col("_k"), col("_v"))).as("qhat"))
    g.join(broadcast(fences), "_g")
      .groupBy(col("_g"))
      .agg(max(col("n_cal")).as("n_cal"), max(col("k")).as("k"),
        max(col("qhat")).as("qhat"),
        sum(col("_tc")).as("n_test"),
        sum(when(col("_v") <= col("qhat"), col("_tc")).otherwise(0L))
          .as("_cov"))
      .select(col("_g").as(groupCol), col("n_cal"), col("k"),
        // degenerate splits report NULL, consistently with the oracle: a
        // group with no calibration rows has no order statistic to take
        // (without the guard qhat would silently be the group MINIMUM —
        // cum >= k holds vacuously at k = 0), and a group with no holdout
        // rows has no coverage to audit (DuckDB's // would raise on the
        // zero divisor where Spark's div yields NULL).
        when(col("n_cal") > 0, col("qhat")).as("qhat"), col("n_test"),
        when(col("n_test") > 0,
          expr("_cov * 1000000 div n_test").cast("double") / 1e6)
          .as("coverage"))
  }

  /** Spearman rank correlation with tie-averaged ranks (q232) — the
    * quality-signal agreement read: two scoring columns that RANK the
    * corpus the same way are redundant gates (keep the cheaper one);
    * ρ near 0 says the signals measure different things and both earn
    * their compute. Pearson on midranks, the standard tie-corrected
    * Spearman.
    *
    * Exactness without corpus-sized sorts or float sums: ranks come from
    * the VALUE-SET collapse (the [[rankAuc]] discipline) — per group and
    * signal, distinct values get cumulative counts, and a tied block's
    * average rank enters as the exact INTEGER doubled-midrank
    * r₂ = 2·cum_before + c + 1. Each doc joins its two doubled midranks
    * back (distinct-value tables, broadcastable), and the five Pearson
    * moments are exact sums lifted to DECIMAL(38,0) at aggregation — the
    * Σr₂² ≈ 4n³ term would pass 2⁶³ at n ≈ 1.3·10⁶ as BIGINT, while the
    * decimal lift keeps the covariance products n·Σab − Σa·Σb ≈ 4n⁴
    * exact to n ≈ 10⁹ rows per group (stratify past that). ρ then
    * divides identical exact decimals (→ identical doubles via IEEE
    * round-half-even, sqrt correctly rounded by the standard) in both
    * engines, 1e-6-floored. Zero variance in either signal → NULL ρ.
    *
    * Scale shape: two map-side-combining (group, value) collapses, rank
    * windows over the collapsed VALUE SETS (never the corpus), two
    * broadcast joins back to docs, one moment aggregation.
    */
  def spearman(df: DataFrame, groupCol: String, colA: String,
      colB: String): DataFrame = {
    def midranks(vc: String): DataFrame = {
      val g = df.groupBy(col(groupCol).as("_g"), col(vc).as("_v"))
        .agg(count(lit(1)).as("_c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("_g")).orderBy(col("_v"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      g.withColumn("_cum", sum(col("_c")).over(w))
        .select(col("_g"), col("_v"),
          (lit(2L) * (col("_cum") - col("_c")) + col("_c") + 1L).as("_r2"))
    }
    val ra = midranks(colA).withColumnRenamed("_v", "_va")
      .withColumnRenamed("_r2", "_ra")
    val rb = midranks(colB).withColumnRenamed("_v", "_vb")
      .withColumnRenamed("_r2", "_rb")
    val dec = "decimal(38,0)"
    val joined = df
      .select(col(groupCol).as("_g"), col(colA).as("_va"),
        col(colB).as("_vb"))
      .join(broadcast(ra), Seq("_g", "_va"))
      .join(broadcast(rb), Seq("_g", "_vb"))
    val m = joined.groupBy(col("_g")).agg(
      count(lit(1)).cast(dec).as("n"),
      sum(col("_ra").cast(dec)).as("sa"),
      sum(col("_rb").cast(dec)).as("sb"),
      sum((col("_ra") * col("_ra")).cast(dec)).as("saa"),
      sum((col("_rb") * col("_rb")).cast(dec)).as("sbb"),
      sum((col("_ra") * col("_rb")).cast(dec)).as("sab"))
    m.withColumn("num",
        (col("n") * col("sab") - col("sa") * col("sb")).cast("double"))
      .withColumn("da",
        (col("n") * col("saa") - col("sa") * col("sa")).cast("double"))
      .withColumn("db",
        (col("n") * col("sbb") - col("sb") * col("sb")).cast("double"))
      .select(col("_g").as(groupCol), col("n").cast("long").as("n"),
        (when(col("da") > 0 && col("db") > 0,
          floor(col("num") / (sqrt(col("da")) * sqrt(col("db")))
            * 1000000L)).cast("double") / 1e6).as("rho"))
  }

  /** Youden-J operating point (q234) — the threshold-selection step
    * [[rankAuc]] deliberately doesn't take: AUC says whether a score CAN
    * separate classes; a deployed gate needs ONE cutoff, and Youden's
    * J = TPR − FPR names the threshold where the score separates them
    * best (the ROC point farthest above the diagonal — the right choice
    * when false positives and false negatives cost the same; re-weight J
    * when they don't). Classification rule: positive iff score ≥ t,
    * t swept over the OBSERVED score values.
    *
    * Exactness, the rankAuc discipline: the corpus collapses to the
    * score value set, TP/FP at each candidate threshold come from one
    * descending cumulative window over that collapsed table, TPR/FPR/J
    * are exact floored millionths, and the winner is a deterministic
    * (J desc, threshold asc) top-1 — ties break toward the LOWER cutoff
    * (keeps more data at equal J; pinned so both engines agree). One
    * aggregation + one value-set window + a TakeOrdered(1).
    */
  def youdenThreshold(df: DataFrame, scoreCol: String,
      labelCol: String): DataFrame = {
    val g = df.groupBy(col(scoreCol).as("s")).agg(
      sum(when(col(labelCol), 1L).otherwise(0L)).as("np"),
      sum(when(!col(labelCol), 1L).otherwise(0L)).as("nn"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("s").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val tot = g.agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"))
    g.withColumn("tp", sum(col("np")).over(w))
      .withColumn("fp", sum(col("nn")).over(w))
      .crossJoin(broadcast(tot))
      .withColumn("tpr6", expr("tp * 1000000 div n_pos"))
      .withColumn("fpr6", expr("fp * 1000000 div n_neg"))
      .withColumn("j6", col("tpr6") - col("fpr6"))
      .orderBy(col("j6").desc, col("s"))
      .limit(1)
      .select(col("s").as("threshold"), col("n_pos"), col("n_neg"),
        col("tp"), col("fp"),
        (col("tpr6").cast("double") / 1e6).as("tpr"),
        (col("fpr6").cast("double") / 1e6).as("fpr"),
        (col("j6").cast("double") / 1e6).as("youden_j"))
  }

  /** Exact two-sample Kolmogorov–Smirnov D per group vs the REST of the
    * corpus (q242) — the distribution-drift test that reads the WHOLE
    * shape where PSI (driftReport) reads binned mass and JSD reads
    * token mixes: D = max over the value set of |ECDF_group −
    * ECDF_rest|, the supremum norm whose critical band
    * c(α)·√((n+m)/nm) needs no distributional assumption. The per-source
    * curation read: a source whose length/quality distribution diverges
    * from the corpus gets inspected before its mixture weight rises.
    *
    * Exactness, the rankAuc discipline: the corpus collapses to the
    * (group, value → count) VALUE SET; per-group and rest cumulative
    * counts come from one window over the |groups|×|values| GRID (the
    * jsdMatrix fan-out shape — grid rows, never corpus rows; both jump
    * sets must be probed, hence the full grid), each ECDF quantizes to
    * exact floored millionths (cum·10⁶ div n — two independent floors,
    * the documented quantization), D6 = max |difference|, tie on the
    * max broken toward the SMALLEST value. The critical band uses
    * IEEE-sqrt on exact integer ratios (the spearman precedent) at
    * α = 0.05 (c = 1.358). Groups covering the whole corpus (no rest)
    * report NULL, the conformal degenerate-split contract.
    */
  def ksTest(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val g = df.groupBy(col(groupCol).as("_g"), col(valueCol).as("_v"))
      .agg(count(lit(1)).as("_c"))
    val vals = g.groupBy(col("_v")).agg(sum(col("_c")).as("_ct"))
    val wAll = org.apache.spark.sql.expressions.Window.orderBy(col("_v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val valsCum = vals.withColumn("_cumall", sum(col("_ct")).over(wAll))
    val groups = g.groupBy(col("_g")).agg(sum(col("_c")).as("_n"))
    val nAll = g.agg(sum(col("_c")).as("_nall"))
    val grid = valsCum.crossJoin(broadcast(groups))
      .join(g, Seq("_g", "_v"), "left")
      .withColumn("_c", coalesce(col("_c"), lit(0L)))
    val wG = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_g")).orderBy(col("_v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val d = grid.withColumn("_cum", sum(col("_c")).over(wG))
      .crossJoin(broadcast(nAll))
      .withColumn("_nrest", col("_nall") - col("_n"))
      .withColumn("_cumrest", col("_cumall") - col("_cum"))
      .withColumn("d6", when(col("_nrest") > 0,
        abs(expr("_cum * 1000000 div _n")
          - expr("_cumrest * 1000000 div _nrest"))))
    val dmax = d.withColumn("_dmax",
      max(col("d6")).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("_g"))))
    dmax.groupBy(col("_g"))
      .agg(max(col("_n")).as("n_group"), max(col("_nrest")).as("n_rest"),
        max(col("d6")).as("d6"),
        min(when(col("d6") === col("_dmax"), col("_v"))).as("at_value"))
      .withColumn("crit6", when(col("n_rest") > 0,
        floor(lit(1358000.0) * sqrt((col("n_group") + col("n_rest"))
          .cast("double") / (col("n_group") * col("n_rest"))
          .cast("double"))).cast("long")))
      .select(col("_g").as(groupCol), col("n_group"), col("n_rest"),
        col("at_value"),
        (col("d6").cast("double") / 1e6).as("d_stat"),
        (col("crit6").cast("double") / 1e6).as("crit_05"),
        (col("d6") > col("crit6")).as("drifted"))
  }

  // shared by cvmTest/kuiper: the ksTest VALUE-SET grid with the ECDF
  // difference carried as the EXACT common-denominator integer
  // dInt = cum·n_rest − cum_rest·n (= (F−G)·n·n_rest) — no per-row
  // quantization at all; each statistic floors exactly once at the end.
  private def edfGrid(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val g = df.groupBy(col(groupCol).as("_g"), col(valueCol).as("_v"))
      .agg(count(lit(1)).as("_c"))
    val vals = g.groupBy(col("_v")).agg(sum(col("_c")).as("_ct"))
    val wAll = org.apache.spark.sql.expressions.Window.orderBy(col("_v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val valsCum = vals.withColumn("_cumall", sum(col("_ct")).over(wAll))
    val groups = g.groupBy(col("_g")).agg(sum(col("_c")).as("_n"))
    val nAll = g.agg(sum(col("_c")).as("_nall"))
    val grid = valsCum.crossJoin(broadcast(groups))
      .join(g, Seq("_g", "_v"), "left")
      .withColumn("_c", coalesce(col("_c"), lit(0L)))
    val wG = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_g")).orderBy(col("_v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    grid.withColumn("_cum", sum(col("_c")).over(wG))
      .crossJoin(broadcast(nAll))
      .withColumn("_nrest", col("_nall") - col("_n"))
      .withColumn("_dint", col("_cum").cast("decimal(38,0)") * col("_nrest")
        - (col("_cumall") - col("_cum")).cast("decimal(38,0)") * col("_n"))
  }

  /** Cramér–von Mises two-sample test per group vs the REST (q306) —
    * [[ksTest]]'s INTEGRATED-difference companion: KS reads only the
    * single worst ECDF gap, so a distribution that differs a little
    * EVERYWHERE (the usual shape of template/boilerplate contamination
    * spread across a source) can hide under the D line; CvM sums the
    * squared gap over the whole pooled sample and catches exactly that.
    * T = nm/N² · Σ_pooled (F(x)−G(x))², the Anderson (1962) two-sample
    * form, evaluated at every pooled observation (each distinct value
    * weighted by its pooled multiplicity).
    *
    * Exactness: over the value-set grid the gap is the EXACT integer
    * dInt = cum·m − cum_rest·n, so Σ ct·dInt² is exact DECIMAL(38,0)
    * and T₆ = (Σ ct·dInt²)·10⁶ div (N²·n·m) — ONE truncating division,
    * no per-point quantization (tighter than the ksTest read, which
    * floors each ECDF — affordable here because the common denominator
    * never leaves integer space). Ceiling: Σ ct·dInt² ≤ N·(nm)² rides
    * DECIMAL(38,0) to N ≈ 2·10⁶ pooled rows per comparison — collapse
    * to value sets upstream holds the grid far below that. Verdict:
    * t6 > 461000, the asymptotic ω² α = 0.05 point (0.461, Anderson
    * 1962) as a fixed integer constant (the mcnemar 3841458 precedent).
    * Groups covering the whole corpus report NULL (the ksTest
    * degenerate contract).
    *
    * Scale: identical to ksTest — |groups|×|values| grid rows, never
    * corpus rows; one grid aggregation to |groups| report rows.
    */
  def cvmTest(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    edfGrid(df, groupCol, valueCol)
      .groupBy(col("_g"))
      .agg(max(col("_n")).as("n_group"), max(col("_nrest")).as("n_rest"),
        sum(col("_ct").cast("decimal(38,0)") * col("_dint") * col("_dint"))
          .as("_sd2"), max(col("_nall")).as("_nall"))
      .withColumn("cvm6", when(col("n_rest") > 0, expr(
        """_sd2 * 1000000 div nullif(CAST(_nall AS DECIMAL(38,0)) * _nall
           * n_group * n_rest, 0)""").cast("long")))
      .select(col("_g").as(groupCol), col("n_group"), col("n_rest"),
        col("cvm6"), when(col("n_rest") > 0, col("cvm6") > 461000L)
          .as("differs"))
  }

  /** Kuiper two-sample test per group vs the REST (q307) — the
    * rotation-invariant [[ksTest]]: V = D⁺ + D⁻ weighs the largest gap
    * ABOVE and the largest gap BELOW equally, so it keeps power at the
    * distribution's tails (a source whose lengths differ only in the
    * extremes moves D⁺ and D⁻ asymmetrically little but their SUM
    * reliably) — the classic astronomy/circular-statistics variant,
    * Kuiper (1960).
    *
    * Exactness: D⁺ = max(dInt), D⁻ = max(−dInt) as exact integers over
    * the grid (both sups land on pooled jump points, where the grid
    * evaluates both ECDFs), clamped at 0; V₆ = (D⁺int + D⁻int)·10⁶ div
    * (n·m) — ONE floor on the sum. Critical band 1 747 000·√(N/(nm))
    * via one IEEE sqrt (the ksTest 1.358 recipe; 1.747 is the
    * asymptotic Kuiper α = 0.05 point). n_rest = 0 → NULL.
    *
    * Scale: the ksTest grid shape exactly.
    */
  def kuiper(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    edfGrid(df, groupCol, valueCol)
      .groupBy(col("_g"))
      .agg(max(col("_n")).as("n_group"), max(col("_nrest")).as("n_rest"),
        greatest(max(col("_dint")), lit(0L).cast("decimal(38,0)"))
          .as("_dp"),
        greatest(max(-col("_dint")), lit(0L).cast("decimal(38,0)"))
          .as("_dm"))
      .withColumn("dplus6", when(col("n_rest") > 0, expr(
        """_dp * 1000000 div nullif(CAST(n_group AS DECIMAL(38,0))
           * n_rest, 0)""").cast("long")))
      .withColumn("dminus6", when(col("n_rest") > 0, expr(
        """_dm * 1000000 div nullif(CAST(n_group AS DECIMAL(38,0))
           * n_rest, 0)""").cast("long")))
      .withColumn("v6", when(col("n_rest") > 0, expr(
        """(_dp + _dm) * 1000000 div nullif(CAST(n_group AS DECIMAL(38,0))
           * n_rest, 0)""").cast("long")))
      .withColumn("crit6", when(col("n_rest") > 0,
        floor(lit(1747000.0) * sqrt((col("n_group") + col("n_rest"))
          .cast("double") / (col("n_group") * col("n_rest"))
          .cast("double"))).cast("long")))
      .select(col("_g").as(groupCol), col("n_group"), col("n_rest"),
        col("dplus6"), col("dminus6"), col("v6"), col("crit6"),
        (col("v6") > col("crit6")).as("differs"))
  }

  /** Rank-biased overlap between two rankers, per source (q316) —
    * Webber/Moffat/Zobel (2010), the standard top-weighted similarity
    * between two rankings: Kendall/Spearman weight every position
    * equally, but for retrieval/quality rankers only the HEAD matters —
    * RBO's geometric weights (p = 0.9) price rank 1 disagreements ~10×
    * rank 10 ones. Here the two production-shaped rankers are the
    * byte-length prior (n_chars desc) and the whitespace-token prior
    * (word count desc) over each source's documents — how
    * interchangeable are the two cheap length proxies a curation
    * pipeline might rank by. Ties broken by doc_id on BOTH rankers
    * (fully deterministic, documented).
    *
    * Exactness: overlap_d (|A_d ∩ B_d| per depth d ≤ 10) is an exact
    * integer census — each common doc contributes from depth
    * max(rankA, rankB) on, so one (source, max-rank) census + a
    * cumulative over the 10-row depth spine covers all depths. With
    * p = 9/10 the weight (1−p)·p^(d−1)/d = 9^(d−1)/(d·10^d) is exact
    * rational: term₆ = overlap_d·9^(d−1)·10⁶ div (d·10^d), floored PER
    * DEPTH, and rbo₆ is their exact sum (10 floors, documented — the
    * truncated-at-depth-10 lower-bound RBO, no extrapolation term).
    *
    * Scale: two per-source ranking windows (WindowGroupLimit caps each
    * partition at the depth before the full sort), one depth-10 equi
    * join, a 10·|sources|-row spine — corpus rows never pair.
    */
  def rbo(docs: DataFrame, depth: Int = 10): DataFrame = {
    require(depth == 10, "the exact 9^k/10^k weight table is depth-10")
    val W = org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    val nWords = size(filter(split(col("text"), " "), t => t =!= lit("")))
      .cast("long")
    val base = docs.select(col("source"), col("doc_id"), col("n_chars"),
      nWords.as("_nw"))
    val wA = W.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    val wB = W.partitionBy(col("source"))
      .orderBy(col("_nw").desc, col("doc_id"))
    val a = base.withColumn("_ra", row_number().over(wA).cast("long"))
      .filter(col("_ra") <= depth)
      .select(col("source"), col("doc_id"), col("_ra"))
    val b = base.withColumn("_rb", row_number().over(wB).cast("long"))
      .filter(col("_rb") <= depth)
      .select(col("source"), col("doc_id"), col("_rb"))
    val census = a.join(b, Seq("source", "doc_id"))
      .withColumn("_m", greatest(col("_ra"), col("_rb")))
      .groupBy(col("source"), col("_m")).agg(count(lit(1)).as("_c"))
    // exact weight table: (d, 9^(d-1), 10^d)
    val weights = (1 to depth).map { d =>
      (d.toLong, math.pow(9, d - 1).toLong, math.pow(10, d).toLong)
    }
    val spine = docs.select(col("source")).distinct()
      .crossJoin(broadcast(
        spark.createDataFrame(weights).toDF("_d", "_p9", "_p10")))
    val wCum = W.partitionBy(col("source")).orderBy(col("_d"))
      .rowsBetween(W.unboundedPreceding, 0)
    spine.join(census, spine("source") === census("source")
        && col("_m") === col("_d"), "left")
      .select(spine("source"), col("_d"), col("_p9"), col("_p10"),
        coalesce(col("_c"), lit(0L)).as("_c"))
      .withColumn("_ov", sum(col("_c")).over(wCum))
      .withColumn("_t6",
        expr("_ov * _p9 * 1000000 div (_d * _p10)"))
      .groupBy(col("source"))
      .agg(max(col("_ov")).as("n_common"), sum(col("_t6")).as("rbo6"))
      .select(col("source"), col("n_common"), col("rbo6"))
  }

  /** Mann–Whitney U per group vs the REST of the corpus (q253) —
    * [[ksTest]]'s location-shift companion: KS asks "is the shape
    * different", U asks "is one distribution stochastically LARGER",
    * which is the curation question behind every per-source length /
    * quality comparison (a source whose documents rank systematically
    * low gets inspected, not just one that merely differs). Reported
    * with the tie-corrected normal z and the rank-biserial effect size
    * (= Cliff's δ), because at corpus n the z is always "significant" —
    * the effect size is the read.
    *
    * Exactness, the rankAuc/ksTest discipline: the corpus collapses to
    * the (group, value → count) VALUE SET; midranks come DOUBLED from
    * one cumulative window (rank2 = 2·cum − ct + 1 — integer-exact, no
    * half-rank floats), 2U₁ = Σ c·rank2 − n₁(n₁+1). The tie-corrected
    * variance is computed as 4·Var = n₁·n₂·(N³ − N − Σ(t³−t)) div
    * (3N(N−1)) with the product in exact DECIMAL(38,0) and ONE integral
    * division (ceiling N ≤ 2·10⁶ — the binding term is the tie cube sum
    * Σ(t³−t) ≤ N³ carried in BIGINT; the quotient fits to N ≤ 4·10⁶ and
    * the decimal product to N ≤ 4·10⁸), then ONE IEEE
    * sqrt: z6 = ⌊(2U₁ − n₁n₂)·10⁶ / √(4Var)⌋. Rank-biserial is exact
    * truncating decimal division: rb6 = (2U₁ − n₁n₂)·10⁶ div n₁n₂
    * (Spark `div` and DuckDB `//` both truncate toward zero — verified,
    * so negative effects replay). Groups covering the whole corpus
    * (n_rest = 0) and all-tied corpora (variance 0) report NULL, the
    * ksTest degenerate contract. `shifted` = |z6| > 1 959 964 (α=0.05
    * two-sided).
    */
  def mannWhitney(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val g = df.groupBy(col(groupCol).as("_g"), col(valueCol).as("_v"))
      .agg(count(lit(1)).as("_c"))
    val vals = g.groupBy(col("_v")).agg(sum(col("_c")).as("_ct"))
    val wAll = org.apache.spark.sql.expressions.Window.orderBy(col("_v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val ranked = vals.withColumn("_rank2",
      lit(2L) * sum(col("_ct")).over(wAll) - col("_ct") + 1L)
    val tie = vals.agg(
      sum(col("_ct") * col("_ct") * col("_ct") - col("_ct")).as("_t"))
    val nAll = g.agg(sum(col("_c")).as("_nall"))
    val per = g.join(ranked.select(col("_v"), col("_rank2")), Seq("_v"))
      .groupBy(col("_g"))
      .agg(sum(col("_c")).as("n_group"),
        sum(col("_c") * col("_rank2")).as("_r2"))
    per.crossJoin(broadcast(nAll)).crossJoin(broadcast(tie))
      .withColumn("n_rest", col("_nall") - col("n_group"))
      .withColumn("u2", col("_r2") - col("n_group") * (col("n_group") + 1L))
      .withColumn("_v4", when(col("_nall") > 1, expr(
        """CAST(n_group AS DECIMAL(38,0)) * n_rest *
           (CAST(_nall AS DECIMAL(38,0)) * _nall * _nall - _nall - _t)
           div (3 * CAST(_nall AS DECIMAL(38,0)) * (_nall - 1))""")))
      .withColumn("_z6", when(col("n_rest") > 0 && col("_v4") > 0,
        floor((col("u2") - col("n_group") * col("n_rest")).cast("double")
          * 1e6 / sqrt(col("_v4").cast("double"))).cast("long")))
      .withColumn("_rb6", when(col("n_rest") > 0, expr(
        """CAST(u2 - n_group * n_rest AS DECIMAL(38,0)) * 1000000
           div (CAST(n_group AS DECIMAL(38,0)) * n_rest)""")))
      .select(col("_g").as(groupCol), col("n_group"), col("n_rest"),
        col("u2"),
        (col("_z6").cast("double") / 1e6).as("z"),
        (col("_rb6").cast("double") / 1e6).as("rank_biserial"),
        (abs(col("_z6")) > 1959964L).as("shifted"))
  }

  /** Ansari–Bradley scale test per group vs rest (q301) — the rank
    * companion [[mannWhitney]] is for LOCATION: do the group's values
    * SPREAD differently than the rest's, detected without any variance
    * computation (robust to heavy tails where an F-test lies). Scores
    * fold the midranks toward the ends: a = min(r, N+1−r), small at
    * both extremes — a group owning the tails scores LOW. Tie-exact by
    * the doubled-midrank identity: with m₂ = 2·cum − c + 1 (the
    * [[mannWhitney]] rank2), the doubled score a₂ = (N+1) − |m₂ −
    * (N+1)| is a pure integer. z is the permutation moment form
    * z = (N·S₂ − n_g·T₂) / (N·√Var₄), Var₄ = n_g·n_r·(N·Q₄ − T₂²) div
    * (N²(N−1)) — the [[mannWhitney]] quantize-then-sqrt recipe (scores
    * replace ranks; the variance formula is the general finite-
    * population one, so midrank ties are already priced in).
    *
    * Exactness ceiling: N·Q₄ and T₂² ride N⁴ and the variance product
    * n_g·n_r·N⁴ ≈ N⁶ — DECIMAL(38,0)-exact to N ≈ 2·10⁶ rows per call
    * (an ANSI overflow past that, never a silent wrap); sample or
    * pre-aggregate above (the [[mannWhitney]]-family ceiling, stated
    * there for N⁵).
    *
    * Scale: one value census; all windows over the VALUE SET.
    */
  def ansariBradley(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val g = df.groupBy(col(groupCol).as("_g"),
        col(valueCol).cast("long").as("_v"))
      .agg(count(lit(1)).as("_c"))
    val vals = g.groupBy(col("_v")).agg(sum(col("_c")).as("_ct"))
    val wAll = org.apache.spark.sql.expressions.Window.orderBy(col("_v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val nAll = g.agg(sum(col("_c")).as("_nall"))
    val scored = vals
      .withColumn("_m2", lit(2L) * sum(col("_ct")).over(wAll)
        - col("_ct") + 1L)
      .crossJoin(broadcast(nAll))
      .withColumn("_a2", col("_nall") + 1L
        - abs(col("_m2") - (col("_nall") + 1L)))
    val tots = scored.agg(max(col("_nall")).as("_nall"),
      sum(col("_ct") * col("_a2")).as("_t2"),
      sum(col("_ct").cast("decimal(38,0)") * col("_a2") * col("_a2"))
        .as("_q4"))
    val per = g.join(scored.select(col("_v"), col("_a2")), Seq("_v"))
      .groupBy(col("_g"))
      .agg(sum(col("_c")).as("n_group"),
        sum(col("_c") * col("_a2")).as("_s2"))
    per.crossJoin(broadcast(tots))
      .withColumn("n_rest", col("_nall") - col("n_group"))
      .filter(col("n_rest") > 0)
      .withColumn("_var4", when(col("_nall") > 1, expr(
        """CAST(n_group AS DECIMAL(38,0)) * n_rest *
           (CAST(_nall AS DECIMAL(38,0)) * _q4
             - CAST(_t2 AS DECIMAL(38,0)) * _t2)
           div nullif(CAST(_nall AS DECIMAL(38,0)) * _nall
             * (_nall - 1), 0)""")))
      .withColumn("_z6", when(col("_var4") > 0,
        floor(expr("""CAST(CAST(_nall AS DECIMAL(38,0)) * _s2
            - CAST(n_group AS DECIMAL(38,0)) * _t2 AS DOUBLE)""")
          * 1e6 / (col("_nall").cast("double")
            * expr("nullif(sqrt(CAST(_var4 AS DOUBLE)), 0.0)")))
          .cast("long")))
      .select(col("_g").as(groupCol), col("n_group"), col("n_rest"),
        col("_s2").as("ab2"), col("_z6").as("z6"),
        when(col("_z6").isNotNull, abs(col("_z6")) > 1959964L)
          .as("spread_differs"))
  }

  /** Two-group log-rank test (Mantel 1966; q254) — the significance
    * companion to [[TemporalJoins.kaplanMeier]]: two survival curves
    * always look different at corpus n, the log-rank χ² says whether the
    * separation exceeds chance under the SAME censoring contract. Input
    * is the reduced per-unit frame (group, duration, observed) — exactly
    * what the KM derivation produces per user — with EXACTLY two groups
    * (checked; the pair read is the A/B question, k-group needs the
    * k−1-df extension).
    *
    * Exactness: risk sets come from one DESCENDING cumulative per group
    * over the duration value-set GRID (the ksTest grid shape — both
    * groups probed at every event time); per-event-time expectation and
    * variance quantize BEFORE the sum (e6 = d·n₁·10⁶ div n, v6 =
    * d·n₁·(n−n₁)·(n−d)·10⁶ div n²(n−1), products exact in
    * DECIMAL(38,0) to n ≤ 4·10⁸ per time); χ²₆ = (O₁·10⁶ − E6)² div V6
    * with the square in DECIMAL(38,0). `significant` at α = 0.05 is
    * χ²₆ > 3 841 459 (χ²₁ 95th percentile). Zero-variance degenerate
    * (every event time single-group-at-risk) reports NULL. The two
    * group labels surface as a bounded 2-row collect (the Linkage
    * census pattern).
    */
  def logRank(units: DataFrame, groupCol: String, durCol: String,
      obsCol: String): DataFrame = {
    val g2 = units.groupBy(col(durCol).as("_d"), col(groupCol).as("_g"))
      .agg(count(lit(1)).as("_enter"),
        sum(when(col(obsCol), 1L).otherwise(0L)).as("_ev"))
    val groups = g2.groupBy(col("_g")).agg(sum(col("_enter")).as("_ng"))
      .orderBy(col("_g")).collect()
    require(groups.length == 2,
      s"logRank needs exactly two groups, got ${groups.length}")
    val (ga, na) = (groups(0).get(0), groups(0).getLong(1))
    val (gb, nb) = (groups(1).get(0), groups(1).getLong(1))
    val vals = g2.select(col("_d")).distinct()
    val gcol = g2.schema("_g").dataType
    val glist = vals.sparkSession.createDataFrame(
      vals.sparkSession.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(ga), org.apache.spark.sql.Row(gb)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_g", gcol))))
    val grid = vals.crossJoin(broadcast(glist))
      .join(g2, Seq("_d", "_g"), "left")
      .withColumn("_enter", coalesce(col("_enter"), lit(0L)))
      .withColumn("_ev", coalesce(col("_ev"), lit(0L)))
    val wDesc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_g")).orderBy(col("_d").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val risk = grid.withColumn("_atrisk", sum(col("_enter")).over(wDesc))
    val perDur = risk.groupBy(col("_d")).agg(
      sum(col("_atrisk")).as("_n"), sum(col("_ev")).as("_dd"),
      sum(when(col("_g") === lit(ga), col("_atrisk")).otherwise(0L)).as("_na"),
      sum(when(col("_g") === lit(ga), col("_ev")).otherwise(0L)).as("_da"))
    val terms = perDur
      .withColumn("_e6",
        expr("CAST(_dd AS DECIMAL(38,0)) * _na * 1000000 div _n"))
      .withColumn("_v6", when(col("_n") > 1, expr(
        """CAST(_dd AS DECIMAL(38,0)) * _na * (_n - _na) * (_n - _dd)
           * 1000000 div (CAST(_n AS DECIMAL(38,0)) * _n * (_n - 1))"""))
        .otherwise(lit(0L)))
    terms.agg(sum(col("_e6")).as("_E6"), sum(col("_v6")).as("_V6"),
        sum(col("_da")).as("events_a"), sum(col("_dd")).as("events_total"))
      .withColumn("_chi26", when(col("_V6") > 0, expr(
        """CAST(events_a * 1000000 - _E6 AS DECIMAL(38,0))
           * (events_a * 1000000 - _E6) div _V6""")))
      .select(lit(ga).cast("string").as("group_a"),
        lit(gb).cast("string").as("group_b"),
        lit(na).as("n_a"), lit(nb).as("n_b"),
        col("events_a"), col("events_total"),
        (col("_E6").cast("double") / 1e6).as("expected_a"),
        (col("_chi26").cast("double") / 1e6).as("chi2"),
        (col("_chi26") > 3841459L).as("significant"))
  }

  /** Kendall's τ-b per group (q255) — the rank-correlation read between
    * two corpus measures (does longer text rank higher on quality?)
    * that, unlike Pearson, ignores scale and, unlike Spearman's ρ,
    * handles heavy ties through the τ-b denominator. Concordant /
    * discordant mass comes from ONE self-join of the joint (x, y)
    * VALUE-SET cells on group equality + strict x-dominance (each
    * unordered pair counted once; cells², report-sized — never corpus
    * pairs; quantize high-cardinality measures into buckets first, the
    * caller's contract). Tie terms are exact integers (n₀ = n(n−1)/2,
    * n₁ = Σ tx(tx−1)/2, n₂ = Σ ty(ty−1)/2); τ₆ = ⌊(nc − nd)·10⁶ /
    * √((n₀−n₁)·(n₀−n₂))⌋ — ONE IEEE sqrt of the tie product computed
    * exactly in DECIMAL(38,0) (a √a·√b split would cost one ulp and
    * turn perfect agreement into 0.999999; the single sqrt of the exact
    * product reports exact ±1). All-tied on either measure (n₀ = n₁ or
    * n₀ = n₂) reports NULL.
    */
  def kendallTauB(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val cells = df.groupBy(col(groupCol).as("_g"), col(xCol).as("_x"),
      col(yCol).as("_y")).agg(count(lit(1)).as("_c"))
    val a = cells.select(col("_g"), col("_x").as("_xa"),
      col("_y").as("_ya"), col("_c").as("_ca"))
    val b = cells.select(col("_g"), col("_x").as("_xb"),
      col("_y").as("_yb"), col("_c").as("_cb"))
    val conc = a.join(b, Seq("_g")).filter(col("_xa") < col("_xb"))
      .groupBy(col("_g"))
      .agg(sum(when(col("_ya") < col("_yb"), col("_ca") * col("_cb"))
        .otherwise(0L)).as("concordant"),
        sum(when(col("_ya") > col("_yb"), col("_ca") * col("_cb"))
          .otherwise(0L)).as("discordant"))
    val nG = cells.groupBy(col("_g")).agg(sum(col("_c")).as("n"))
    val tx = cells.groupBy(col("_g"), col("_x"))
      .agg(sum(col("_c")).as("_tc"))
      .groupBy(col("_g"))
      .agg(expr("sum(_tc * (_tc - 1)) div 2").as("ties_x"))
    val ty = cells.groupBy(col("_g"), col("_y"))
      .agg(sum(col("_c")).as("_tc"))
      .groupBy(col("_g"))
      .agg(expr("sum(_tc * (_tc - 1)) div 2").as("ties_y"))
    nG.join(conc, Seq("_g"), "left").join(tx, Seq("_g")).join(ty, Seq("_g"))
      .withColumn("concordant", coalesce(col("concordant"), lit(0L)))
      .withColumn("discordant", coalesce(col("discordant"), lit(0L)))
      .withColumn("_n0", expr("n * (n - 1) div 2"))
      .withColumn("_tau6", when(
        col("_n0") > col("ties_x") && col("_n0") > col("ties_y"),
        floor((col("concordant") - col("discordant")).cast("double") * 1e6
          / sqrt(expr("""CAST(CAST(_n0 - ties_x AS DECIMAL(38,0))
              * (_n0 - ties_y) AS DOUBLE)""")))
          .cast("long")))
      .select(col("_g").as(groupCol), col("n"), col("concordant"),
        col("discordant"), col("ties_x"), col("ties_y"),
        (col("_tau6").cast("double") / 1e6).as("tau"))
  }

  /** Cochran–Armitage trend test per group (q256-family; q257) — the
    * ORDERED-categories significance read [[kendallTauB]]'s continuous
    * form doesn't give: a binary outcome (flag) against ordinal scores
    * w (bucket indices), testing whether the flag RATE trends
    * monotonically across the ordered buckets (Cochran 1954, Armitage
    * 1955 — the dose-response / "does quality fall with length bucket"
    * test). χ²-equivalent z with one degree of freedom.
    *
    * Exact arithmetic: per (group, bucket): n_i, flagged n1_i; the
    * statistic numerator T·N = N·Σwᵢn1ᵢ − N₁·Σwᵢnᵢ and the variance
    * product N₁(N−N₁)(N·Σwᵢ²nᵢ − (Σwᵢnᵢ)²) are exact (the latter in
    * DECIMAL(38,0)); v = product div N is the one defined floor
    * (quotient fits BIGINT to N·w² ≲ 10⁹ per group — generous for any
    * per-group bucket census), then ONE IEEE sqrt:
    * z6 = ⌊T·N·10⁶ / √v⌋. Degenerate groups (one bucket, all-flagged,
    * none-flagged → variance 0) report NULL, the ksTest contract.
    */
  def cochranArmitage(df: DataFrame, groupCol: String, bucketCol: String,
      flagCol: String): DataFrame = {
    val cells = df.groupBy(col(groupCol).as("_g"), col(bucketCol).as("_w"))
      .agg(count(lit(1)).as("_n"),
        sum(when(col(flagCol), 1L).otherwise(0L)).as("_n1"))
    cells.groupBy(col("_g"))
      .agg(sum(col("_n")).as("n"), sum(col("_n1")).as("n_flag"),
        sum(col("_w") * col("_n")).as("_sw"),
        sum(col("_w") * col("_n1")).as("_sw1"),
        sum(col("_w") * col("_w") * col("_n")).as("_sww"))
      .withColumn("_tn", col("n") * col("_sw1") - col("n_flag") * col("_sw"))
      .withColumn("_v", expr(
        """CAST(n_flag AS DECIMAL(38,0)) * (n - n_flag) *
           (CAST(n AS DECIMAL(38,0)) * _sww - CAST(_sw AS DECIMAL(38,0)) * _sw)
           div n"""))
      .withColumn("_z6", when(col("_v") > 0,
        floor(col("_tn").cast("double") * 1e6
          / sqrt(col("_v").cast("double"))).cast("long")))
      .select(col("_g").as(groupCol), col("n"), col("n_flag"),
        col("_tn").as("t_n"),
        (col("_z6").cast("double") / 1e6).as("z"),
        (abs(col("_z6")) > 1959964L).as("trending"))
  }

  /** Benjamini–Hochberg step-up FDR selection (q243) — the
    * multiple-comparisons gate every per-slice eval sweep needs: read
    * 200 slice deltas at α = 0.05 each and ~10 "significant" ones are
    * noise; BH picks the largest k with p₍ᵢ₎ ≤ i·α/m and flags ranks
    * ≤ k, controlling the EXPECTED false-discovery fraction at α
    * (Benjamini & Hochberg 1995) — the standard remedy that keeps
    * power, unlike Bonferroni's m-fold penalty.
    *
    * Inputs are caller-supplied millionth p-values (the linkage-weights
    * contract: produce p6 with whatever test fits the data). All
    * decisions are exact integers — the step-up test cross-multiplies
    * to p6·αden·m ≤ i·αnum·10⁶ (no division at all; overflows BIGINT
    * only past 9·10¹⁸/(αden·10⁶) ≈ 10¹⁰ tests), rank ties break on
    * (p6, id) so both engines see one deterministic order. m = the
    * number of TESTS (slices), so the windows here are m-row small by
    * construction — this is a report-sized operator, not a corpus one.
    */
  def bhSelect(tests: DataFrame, idCol: String, pCol: String,
      alphaNum: Int = 5, alphaDen: Int = 100): DataFrame = {
    require(alphaNum > 0 && alphaDen > alphaNum)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(pCol), col(idCol))
    val m = tests.agg(count(lit(1)).as("_m"))
    val ranked = tests
      .withColumn("rank", row_number().over(w).cast("long"))
      .crossJoin(broadcast(m))
      .withColumn("_ok",
        col(pCol) * alphaDen * col("_m") <= col("rank") * alphaNum * 1000000L)
    val kStar = ranked.agg(
      coalesce(max(when(col("_ok"), col("rank"))), lit(0L)).as("_k"))
    ranked.crossJoin(broadcast(kStar))
      .select(col(idCol), col(pCol), col("rank"), col("_m").as("m"),
        (col("rank") <= col("_k")).as("discovery"))
  }

  /** Sparse ratings fixture for [[krippendorffAlpha]]: the [[ratings]]
    * grid with a deterministic DROPOUT (rater r skips item u when
    * (h + 23r) % 5 = 0), so units carry UNEQUAL rater counts — the
    * missing-data regime Krippendorff handles and Fleiss' κ cannot.
    */
  def ratingsSparse(docs: DataFrame, nRaters: Int = 5, nCats: Int = 4)
      : DataFrame = {
    val h = CorpusOps.idHash(col("item_id"))
    ratings(docs, nRaters, nCats)
      .filter((h + col("rater") * 23L) % 5 =!= 0)
  }

  /** Pairwise Cohen's κ matrix (q248) — WHICH rater disagrees:
    * [[fleissKappa]] and [[krippendorffAlpha]] score the pool; when the
    * pool number is low the actionable question is which annotator (or
    * model-as-judge) diverges from the others, read off the pairwise κ
    * matrix row that sits below the rest (retrain or drop that rater).
    * For each rater pair within a source, over their CO-RATED items:
    * p_o = agreements/n, p_e = Σ_c marginal_a(c)·marginal_b(c)/n²,
    * κ = (p_o − p_e)/(1 − p_e).
    *
    * Exact arithmetic: the pair relation is a self-join on (source,
    * item) with fan-out ≤ raters² per item (bounded, the ratings-grid
    * shape); marginals aggregate from the SAME joined relation so they
    * count exactly the co-rated subset; p_e uses the brier nested-floor
    * identity ⌊⌊x·10⁶/n⌋/n⌋ with x = Σ nₐ·n_b ≤ n² (exact to 10⁹
    * co-rated items per pair), and κ₆ computes from the two quantized
    * values (the fleissKappa pattern). Perfect agreement with p_e = 1
    * (both raters constant on one category) reports NULL — κ is
    * undefined there. Report is |sources|·|raters|² rows.
    */
  def cohenKappaMatrix(ratingsDf: DataFrame): DataFrame = {
    val a = ratingsDf.select(col("source"), col("item_id"),
      col("rater").as("rater_a"), col("cat").as("cat_a"))
    val b = ratingsDf.select(col("source"), col("item_id"),
      col("rater").as("rater_b"), col("cat").as("cat_b"))
    val pairs = a.join(b, Seq("source", "item_id"))
      .filter(col("rater_a") < col("rater_b"))
    val base = pairs.groupBy(col("source"), col("rater_a"), col("rater_b"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("cat_a") === col("cat_b"), 1L).otherwise(0L))
          .as("agree"))
    val margA = pairs.groupBy(col("source"), col("rater_a"),
        col("rater_b"), col("cat_a").as("cat"))
      .agg(count(lit(1)).as("na"))
    val margB = pairs.groupBy(col("source"), col("rater_a"),
        col("rater_b"), col("cat_b").as("cat"))
      .agg(count(lit(1)).as("nb"))
    val x = margA.join(margB,
        Seq("source", "rater_a", "rater_b", "cat"), "inner")
      .groupBy(col("source"), col("rater_a"), col("rater_b"))
      .agg(sum(col("na") * col("nb")).as("x"))
    base.join(x, Seq("source", "rater_a", "rater_b"), "left")
      .withColumn("x", coalesce(col("x"), lit(0L)))
      .withColumn("po6", expr("agree * 1000000 div n"))
      .withColumn("pe6", expr(
        "((x div n) * 1000000 + (x % n) * 1000000 div n) div n"))
      // κ can be NEGATIVE (below-chance agreement): both engines
      // truncate integer division toward zero (Spark div ≡ DuckDB //,
      // verified on negatives), so the plain quotient is portable
      .withColumn("kappa6", when(col("pe6") < 1000000L,
        expr("(po6 - pe6) * 1000000 div (1000000 - pe6)")))
      .select(col("source"), col("rater_a"), col("rater_b"), col("n"),
        (col("po6").cast("double") / 1e6).as("p_obs"),
        (col("pe6").cast("double") / 1e6).as("p_exp"),
        (col("kappa6").cast("double") / 1e6).as("kappa"))
  }

  /** Krippendorff's α, nominal data (q245) — the inter-annotator
    * agreement coefficient that tolerates MISSING ratings: real labeling
    * batches never have every rater on every item (dropout, spot
    * checks, vendor rotation), which breaks Fleiss' κ's constant-m
    * assumption; α's coincidence-matrix formulation pools whatever
    * pairs exist. Per source:
    *
    *   D_o = Σ_u Σ_c o_uc·(m_u − o_uc)/(m_u − 1) / n,
    *   D_e = Σ_c n_c·(n − n_c) / (n·(n−1)),   α = 1 − D_o/D_e
    *
    * over units with m_u ≥ 2 (singleton units carry no pair evidence
    * and are excluded from BOTH pools, the standard treatment; n = Σm_u
    * over included units). Exact arithmetic: the per-unit fraction
    * quantizes once (·10⁶ div (m_u−1), the dimEnergy
    * quantize-before-aggregate discipline), D_e uses the brier
    * nested-floor identity ⌊⌊x·10⁶/n⌋/(n−1)⌋ with the inner product
    * q/r-decomposed — exact to 10⁹ ratings per source — and α₆
    * computes FROM the two quantized values (the fleissKappa pattern),
    * so both engines make identical integer decisions all the way down.
    * Three aggregations; report is |sources| rows.
    */
  def krippendorffAlpha(ratingsDf: DataFrame): DataFrame = {
    val cnt = ratingsDf.groupBy(col("source"), col("item_id"), col("cat"))
      .agg(count(lit(1)).as("c"))
    val perItem = cnt.groupBy(col("source"), col("item_id"))
      .agg(sum(col("c")).as("m"),
        sum(col("c") * col("c")).as("s2"))
      .filter(col("m") >= 2)
    // observed: per-unit Σc(m−c) = m² − Σc², quantized per unit
    val doPer = perItem
      .withColumn("du6", expr("(m * m - s2) * 1000000 div (m - 1)"))
      .groupBy(col("source"))
      .agg(sum(col("m")).as("n"), count(lit(1)).as("n_units"),
        sum(col("du6")).as("duSum"))
      .withColumn("do6", expr("duSum div n"))
    // expected: pooled category totals over the included units only
    val included = cnt.join(
      perItem.select(col("source"), col("item_id")),
      Seq("source", "item_id"))
    val nc = included.groupBy(col("source"), col("cat"))
      .agg(sum(col("c")).as("nc"))
    val dePer = nc.join(doPer.select(col("source"), col("n")), "source")
      // Σ_c nc·(n − nc) ≤ n²: q/r-decompose the ·10⁶ so every product
      // stays in BIGINT at n ≤ 10⁹ (the brier discipline)
      .groupBy(col("source"))
      .agg(sum(expr("nc * (n - nc)")).as("x"), max(col("n")).as("n"))
      .withColumn("de6", expr(
        "((x div n) * 1000000 + (x % n) * 1000000 div n) div (n - 1)"))
    doPer.join(dePer.select(col("source"), col("de6")), "source")
      .withColumn("alpha6",
        when(col("de6") > 0, expr("(de6 - do6) * 1000000 div de6")))
      .select(col("source"), col("n_units"), col("n").as("n_ratings"),
        (col("do6").cast("double") / 1e6).as("d_obs"),
        (col("de6").cast("double") / 1e6).as("d_exp"),
        (col("alpha6").cast("double") / 1e6).as("alpha"))
  }

  /** Kruskal–Wallis H test per slice (q262) — the k-group extension of
    * [[mannWhitney]]: U answers "is THIS source shifted vs the rest",
    * H answers the prior question "do the k sources differ AT ALL in
    * location" with one k−1-df test, the gate you run before k per-source
    * follow-ups (and the nonparametric ANOVA every mixture audit wants:
    * length/quality distributions are never normal).
    *
    * Exactness, the [[mannWhitney]] discipline: per slice the corpus
    * collapses to the (group, value → count) VALUE SET; DOUBLED midranks
    * from one cumulative window (rank2 = 2·cum − ct + 1), doubled rank
    * sums R2_g = Σ c·rank2. H = 12/(N(N+1))·Σ R_g²/n_g − 3(N+1)
    * quantizes as term6_g = R2_g²·10⁶ div (4n_g), kept in DECIMAL(38,0)
    * end to end via the exact q/r split a·10⁶ div b = (a div b)·10⁶ +
    * (a%b)·10⁶ div b (term6 reaches N³·10⁶ — past BIGINT at N ≈ 2·10⁴,
    * the 10× probe caught it). Spark's `div` always RETURNS BIGINT, so
    * the square is q/r-split too: R2² div 4n = (R2 div 4n)·R2 +
    * ((R2 % 4n)·R2) div 4n — every individual quotient ≤ R2 ≤ 2N², so
    * the LONG-quotient bind sits at N ≈ 2·10⁹ per slice (Σterm6 ≈
    * N³·10⁶ stays a DECIMAL(38,0) sum, good to N ≈ 3·10¹⁰).
    * H6 = 12·Σterm6 div (N(N+1)) − 3(N+1)·10⁶. Tie correction divides
    * by C = 1 − Σ(t³−t)/(N³−N): Hadj6 = H6·(N³−N) div (N³−N−T), NULL
    * when every value is tied (C = 0, the [[ksTest]] degenerate
    * contract); the tie cube Σ(t³−t) rides DECIMAL(38,0) so per-value
    * tie counts share the same ceiling (ANSI overflows LOUD past it,
    * never silently wrong). The α = 0.05 critical value for df = k−1 comes
    * from the Wilson–Hilferty cube
    * χ²₀.₉₅(ν) ≈ ν(1 − 2/(9ν) + 1.6449√(2/(9ν)))³ — closed-form double
    * arithmetic (one IEEE sqrt, explicit w·w·w multiplies — never pow,
    * which is only ~1-ulp across libms) both engines replay
    * bit-identically, exact-vs-table error < 0.6% at ν ≥ 1.
    *
    * Scale: one (slice, group, value) aggregation, windows over the
    * slice-partitioned VALUE SET (never row-count-sized), |slices|-row
    * output.
    */
  def kruskalWallis(df: DataFrame, sliceCol: String, groupCol: String,
      valueCol: String): DataFrame = {
    val g = df.groupBy(col(sliceCol).as("_s"), col(groupCol).as("_g"),
        col(valueCol).as("_v"))
      .agg(count(lit(1)).as("_c"))
    val vals = g.groupBy(col("_s"), col("_v")).agg(sum(col("_c")).as("_ct"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_s")).orderBy(col("_v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val ranked = vals.withColumn("_rank2",
      lit(2L) * sum(col("_ct")).over(wAll) - col("_ct") + 1L)
    val ties = vals.groupBy(col("_s")).agg(
      // tie cube in DECIMAL — t³ in BIGINT would bind per-value tie
      // counts at ~2·10⁶; DECIMAL lifts it past the term6 ceiling
      sum(col("_ct").cast("decimal(38,0)") * col("_ct") * col("_ct")
        - col("_ct")).as("_t"),
      sum(col("_ct")).as("_nall"))
    val perGrp = g
      .join(ranked.select(col("_s"), col("_v"), col("_rank2")),
        Seq("_s", "_v"))
      .groupBy(col("_s"), col("_g"))
      .agg(sum(col("_c")).as("_n"),
        sum(col("_c") * col("_rank2")).as("_r2"))
      // term6 = R2²·10⁶ div (4n) can reach N³·10⁶ — q/r-decompose so the
      // ·10⁶ happens in DECIMAL (the krippendorff discipline): exact
      // identity a·10⁶ div b = (a div b)·10⁶ + (a % b)·10⁶ div b.
      // Spark `div` ALWAYS returns BIGINT, so the square itself is also
      // split before dividing (R2² div 4n = (R2 div 4n)·R2 +
      // ((R2 % 4n)·R2) div 4n — exact since the first term's product is
      // a multiple of 4n): every individual quotient is ≤ R2 ≤ 2N²,
      // LONG-safe to N ≈ 2·10⁹ instead of binding at N³ ≈ 2·10⁶
      .withColumn("_term6", expr(
        """(CAST(_r2 div (4 * _n) AS DECIMAL(38,0)) * _r2
            + CAST(_r2 % (4 * _n) AS DECIMAL(38,0)) * _r2 div (4 * _n))
             * 1000000
           + (CAST(_r2 AS DECIMAL(38,0)) * _r2 % (4 * _n))
             * 1000000 div (4 * _n)"""))
    perGrp.groupBy(col("_s"))
      .agg(count(lit(1)).as("k"),
        sum(col("_term6").cast("decimal(38,0)")).as("_sum6"))
      .join(broadcast(ties), Seq("_s"))
      .withColumn("_h6", expr(
        """12 * _sum6 div (CAST(_nall AS DECIMAL(38,0)) * (_nall + 1))
           - 3 * (_nall + 1) * 1000000"""))
      .withColumn("_denom", expr(
        "CAST(_nall AS DECIMAL(38,0)) * _nall * _nall - _nall - _t"))
      .withColumn("_hadj6", when(col("_denom") > 0, expr(
        """_h6 * (CAST(_nall AS DECIMAL(38,0)) * _nall * _nall - _nall)
           div _denom""")))
      .withColumn("_nu", (col("k") - 1L).cast("double"))
      // explicit w·w·w, not pow(w,3): multiplication is correctly
      // rounded IEEE in every engine, pow is only ~1 ulp
      .withColumn("_wh", lit(1.0) - lit(2.0) / (lit(9.0) * col("_nu"))
        + lit(1.6448536269514722) * sqrt(lit(2.0) / (lit(9.0) * col("_nu"))))
      .withColumn("_crit6", when(col("k") >= 2, floor(col("_nu")
        * col("_wh") * col("_wh") * col("_wh") * 1e6).cast("long")))
      .select(col("_s").as(sliceCol), col("k"), col("_nall").as("n"),
        (col("_hadj6").cast("double") / 1e6).as("h"),
        (col("_crit6").cast("double") / 1e6).as("crit_05"),
        when(col("_hadj6").isNotNull && col("_crit6").isNotNull,
          col("_hadj6") > col("_crit6")).as("differs"))
  }

  /** 1-D Wasserstein (earth-mover) distance per group vs the REST of the
    * corpus (q263) — [[ksTest]] reports the WORST single CDF gap, W₁
    * integrates ALL of it: W₁ = ∫|F_g − F_rest| dv, the average number
    * of value-units a document must move to turn one distribution into
    * the other. The pair is the standard drift read — KS flags, W₁
    * sizes the flag in the value's own units (chars, tokens, score
    * points), which is what decides whether a drifted source needs
    * re-curation or a shrug.
    *
    * Exactness, the [[ksTest]] grid: the corpus collapses to the global
    * value set; every (group, value) grid cell gets cumulative counts
    * from one partitioned window; per-cell gap6 = |cum·10⁶ div n −
    * cumrest·10⁶ div nrest| (each CDF quantized exactly like ksTest's
    * d6), and W₁6 = Σ gap6·(next_v − v) over the value grid (lead()
    * on the value set; the top value contributes 0 — both CDFs are 1
    * there). Integer throughout: gap6 ≤ 10⁶, Δv ≤ range, the sum ≤
    * 10⁶·range·|grid| — BIGINT-safe to range·|values| ≤ 10¹².
    * `w1_norm` = W₁/range rescales to [0,1] for cross-column
    * comparison (one truncating div by the value range). Groups
    * covering the whole corpus report NULL (no rest to compare).
    *
    * Scale: identical plan shape to [[ksTest]] — value-set windows, a
    * broadcast groups spine, one final per-group aggregation.
    */
  def wasserstein1d(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val g = df.groupBy(col(groupCol).as("_g"), col(valueCol).as("_v"))
      .agg(count(lit(1)).as("_c"))
    val vals = g.groupBy(col("_v")).agg(sum(col("_c")).as("_ct"))
    val wAll = org.apache.spark.sql.expressions.Window.orderBy(col("_v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val wLead = org.apache.spark.sql.expressions.Window.orderBy(col("_v"))
    val valsCum = vals
      .withColumn("_cumall", sum(col("_ct")).over(wAll))
      .withColumn("_dv", coalesce(lead(col("_v"), 1).over(wLead)
        - col("_v"), lit(0L)))
    val groups = g.groupBy(col("_g")).agg(sum(col("_c")).as("_n"))
    val nAll = g.agg(sum(col("_c")).as("_nall"),
      (max(col("_v")) - min(col("_v"))).as("_range"))
    val grid = valsCum.crossJoin(broadcast(groups))
      .join(g, Seq("_g", "_v"), "left")
      .withColumn("_c", coalesce(col("_c"), lit(0L)))
    val wG = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_g")).orderBy(col("_v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    grid.withColumn("_cum", sum(col("_c")).over(wG))
      .crossJoin(broadcast(nAll))
      .withColumn("_nrest", col("_nall") - col("_n"))
      .withColumn("_cumrest", col("_cumall") - col("_cum"))
      .withColumn("_gap6", when(col("_nrest") > 0,
        abs(expr("_cum * 1000000 div _n")
          - expr("_cumrest * 1000000 div _nrest"))))
      .groupBy(col("_g"))
      .agg(max(col("_n")).as("n_group"), max(col("_nrest")).as("n_rest"),
        sum(col("_gap6") * col("_dv")).as("_w6"),
        max(col("_range")).as("_range"))
      .select(col("_g").as(groupCol), col("n_group"), col("n_rest"),
        (col("_w6").cast("double") / 1e6).as("w1"),
        when(col("_range") > 0, expr("_w6 div _range").cast("double") / 1e6)
          .as("w1_norm"))
  }

  /** Population Stability Index per group vs the corpus baseline (q264)
    * — the deployment-monitoring staple: bucket the BASELINE distribution
    * into deciles, then PSI = Σ_b (p_b − q_b)·ln(p_b/q_b) over the
    * group's vs the baseline's bucket shares. The industry read: < 0.1
    * stable, 0.1–0.2 watch, > 0.2 act — `action` surfaces the last.
    * Complements [[ksTest]]/[[wasserstein1d]]: PSI is the one score
    * operations teams already alarm on, and its fixed-bucket form is
    * what a 100 TB scoreboard can afford (10 buckets per group, not a
    * value grid per comparison).
    *
    * Determinism: decile edges come from the corpus VALUE SET — a value
    * lands in bucket min(9, left_rank·10 div N) (left rank = cumulative
    * count strictly below it), so heavy values stay atomic and both
    * engines compute identical buckets with pure integers. Shares are
    * +1/+10 Laplace-smoothed (p = (n_gb+1)/(n_g+10)) so empty buckets
    * stay finite — the standard PSI patch. The summand mixes exact
    * integer ratios into IEEE doubles and one ln per bucket; like
    * [[CorpusOps.sourceKl]] the result clamps at 0 and quantizes to
    * millionths AFTER the 10-term sum (PSI ≥ 0 mathematically; the
    * float sum of a zero-drift group can land at ±1e-16).
    *
    * Scale: one (group, bucket) census over the bucket-tagged value set,
    * a broadcast 10-bucket × groups dense spine, |groups|-row output.
    */
  def psiDrift(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val g = df.groupBy(col(groupCol).as("_g"), col(valueCol).as("_v"))
      .agg(count(lit(1)).as("_c"))
    val vals = g.groupBy(col("_v")).agg(sum(col("_c")).as("_ct"))
    val wAll = org.apache.spark.sql.expressions.Window.orderBy(col("_v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val nAll = g.agg(sum(col("_c")).as("_nall"))
    val bucketed = vals
      .withColumn("_below", sum(col("_ct")).over(wAll) - col("_ct"))
      .crossJoin(broadcast(nAll))
      .withColumn("_b", least(lit(9L), expr("_below * 10 div _nall")))
    val baseline = bucketed.groupBy(col("_b")).agg(sum(col("_ct")).as("_nb"))
    val grpBucket = g
      .join(bucketed.select(col("_v"), col("_b")), Seq("_v"))
      .groupBy(col("_g"), col("_b")).agg(sum(col("_c")).as("_ngb"))
    val groups = g.groupBy(col("_g")).agg(sum(col("_c")).as("_n"))
    val spine = broadcast(groups)
      .crossJoin(broadcast(baseline))
      .join(grpBucket, Seq("_g", "_b"), "left")
      .withColumn("_ngb", coalesce(col("_ngb"), lit(0L)))
      .crossJoin(broadcast(nAll))
      .withColumn("_p", (col("_ngb") + 1L).cast("double")
        / (col("_n") + 10L).cast("double"))
      .withColumn("_q", (col("_nb") + 1L).cast("double")
        / (col("_nall") + 10L).cast("double"))
    spine.groupBy(col("_g"))
      .agg(max(col("_n")).as("n_group"),
        (floor(greatest(lit(0.0), sum((col("_p") - col("_q"))
          * log(col("_p") / col("_q")))) * 1e6) / 1e6).as("psi"))
      .select(col("_g").as(groupCol), col("n_group"), col("psi"),
        (col("psi") > 0.2).as("action"))
  }

  /** Cochran–Mantel–Haenszel stratified 2×2 test (q275) — the
    * Simpson's-paradox-proof A/B readout: comparing a binary outcome
    * between two cohorts POOLED across strata can reverse sign when the
    * strata differ in both mix and base rate; CMH tests the common
    * association WITHIN strata (Mantel & Haenszel 1959), and the MH
    * common odds ratio is the effect size that pools correctly. The
    * curation read: "does cohort A really produce more flagged docs, or
    * does it just over-sample the stratum where everyone flags?"
    *
    * Exactness: per stratum the 2×2 census (a = treated successes,
    * margins n1/n0/m1/m0, N); E6 = n1·m1·10⁶ div N and
    * V6 = n1·n0·m1·m0·10⁶ div (N²(N−1)) in DECIMAL(38,0) (products ≤
    * N⁴·10⁶ — the cramersV ceiling); χ²₆ = D² div ΣV6 with
    * D = Σa·10⁶ − ΣE6 squared in DECIMAL — the units cancel to
    * millionth-χ². OR_MH = Σ(a·d·10⁶ div N) over Σ(b·c·10⁶ div N), one
    * more truncating division, NULL when the denominator is 0.
    * Degenerate strata (single-cohort or single-outcome, V = 0)
    * contribute their E and 0 variance — the standard convention.
    * `significant` at α = 0.05 is χ²₆ > 3 841 459 (1 df).
    *
    * Scale: one (stratum, cohort, outcome) census with map-side
    * partials; everything after is |strata|-row arithmetic folding to
    * ONE report row.
    */
  def cmhTest(df: DataFrame, stratumCol: String, cohortCol: String,
      outcomeCol: String): DataFrame = {
    val cells = df.groupBy(col(stratumCol).as("_s"))
      .agg(
        sum(when(col(cohortCol) && col(outcomeCol), 1L).otherwise(0L))
          .as("_a"),
        sum(when(col(cohortCol) && !col(outcomeCol), 1L).otherwise(0L))
          .as("_b"),
        sum(when(!col(cohortCol) && col(outcomeCol), 1L).otherwise(0L))
          .as("_c"),
        sum(when(!col(cohortCol) && !col(outcomeCol), 1L).otherwise(0L))
          .as("_d"))
      .withColumn("_n", col("_a") + col("_b") + col("_c") + col("_d"))
      .withColumn("_e6", expr(
        """CAST(_a + _b AS DECIMAL(38,0)) * (_a + _c) * 1000000 div _n"""))
      .withColumn("_v6", when(col("_n") > 1, expr(
        """CAST(_a + _b AS DECIMAL(38,0)) * (_c + _d) * (_a + _c)
           * (_b + _d) * 1000000
           div (CAST(_n AS DECIMAL(38,0)) * _n * (_n - 1))"""))
        .otherwise(lit(0L)))
      .withColumn("_or_num6", expr(
        "CAST(_a AS DECIMAL(38,0)) * _d * 1000000 div _n"))
      .withColumn("_or_den6", expr(
        "CAST(_b AS DECIMAL(38,0)) * _c * 1000000 div _n"))
    cells.agg(count(lit(1)).as("n_strata"), sum(col("_n")).as("n"),
        sum(col("_a") * 1000000L).as("_sa6"), sum(col("_e6")).as("_se6"),
        sum(col("_v6")).as("_sv6"),
        sum(col("_or_num6")).as("_num6"), sum(col("_or_den6")).as("_den6"))
      .withColumn("_chi6", when(col("_sv6") > 0, expr(
        """CAST(_sa6 - _se6 AS DECIMAL(38,0)) * (_sa6 - _se6)
           div _sv6""")))
      .select(col("n_strata"), col("n"),
        (col("_chi6").cast("double") / 1e6).as("chi2"),
        when(col("_den6") > 0,
          expr("_num6 * 1000000 div _den6").cast("double") / 1e6)
          .as("or_mh"),
        when(col("_chi6").isNotNull, col("_chi6") > 3841459L)
          .as("significant"))
  }

  /** Isotonic (PAV) calibration per source (q269) — the FIT step behind
    * [[calibrationReport]]: the report says the model's confidences are
    * off, the isotonic fit produces the monotone mapping conf → P(correct)
    * you actually deploy (Zadrozny & Elkan 2002's standard recipe;
    * distribution-free, unlike Platt's sigmoid). Output per occupied
    * confidence bin: raw rate and the fitted monotone rate.
    *
    * The fit uses the max-min CLOSED FORM of pool-adjacent-violators —
    * fitted(k) = max_{i≤k} min_{j≥k} mean(pos, i..j) — instead of the
    * sequential pooling loop: the loop is inherently serial, the closed
    * form is two windows over the B² interval table (B ≤ 20 bins per
    * source, so B² is report-sized; the corpus only pays the one bin
    * census). Interval means quantize FIRST — m6(i,j) = pos(i..j)·10⁶
    * div cnt(i..j) from prefix sums — then min/max run on exact integers,
    * so both engines pool identically (quantized PAV: fitted values can
    * sit 1 millionth off the rational optimum, monotonicity is preserved
    * — min/max of integers — and the spec asserts it).
    *
    * Scale: one (source, bin) census over the predictions, per-(source,i)
    * suffix-min window + per-(source,k) max aggregation over B²-row
    * relations — everything after the census is report-sized.
    */
  def isotonicCalibration(preds: DataFrame, bins: Int = 20): DataFrame = {
    val b = preds.withColumn("_bin",
        least(floor(col("conf6") / lit(1000000L / bins)), lit(bins - 1L)))
      .groupBy(col("source"), col("_bin"))
      .agg(count(lit(1)).as("_n"),
        sum(when(col("correct"), 1L).otherwise(0L)).as("_pos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("_bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val pref = b
      .withColumn("_cn", sum(col("_n")).over(w))
      .withColumn("_cp", sum(col("_pos")).over(w))
    val lo = pref.select(col("source"), col("_bin").as("_i"),
      (col("_cn") - col("_n")).as("_cn0"), (col("_cp") - col("_pos")).as("_cp0"))
    val hi = pref.select(col("source").as("_src2"), col("_bin").as("_j"),
      col("_cn").as("_cnj"), col("_cp").as("_cpj"))
    val intervals = lo
      .join(hi, col("source") === col("_src2") && col("_i") <= col("_j"))
      .withColumn("_m6", expr(
        "(_cpj - _cp0) * 1000000 div (_cnj - _cn0)"))
    val wSuf = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"), col("_i")).orderBy(col("_j").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val fitted = intervals
      .withColumn("_sm", min(col("_m6")).over(wSuf))
      .groupBy(col("source"), col("_j").as("_bin"))
      .agg(max(col("_sm")).as("_fit6"))
    b.join(fitted, Seq("source", "_bin"))
      .select(col("source"), col("_bin").as("bin"), col("_n").as("n"),
        col("_pos").as("n_correct"),
        (expr("_pos * 1000000 div _n").cast("double") / 1e6).as("raw_rate"),
        (col("_fit6").cast("double") / 1e6).as("fitted_rate"))
  }
}
