package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (entity resolution) — the Fellegi–Sunter
  * model (JASA 1969; the Splink/RecordLinkage-style formulation) as a
  * blocked Spark job: candidate pairs come from MULTI-PASS blocking
  * (union of several cheap equi-join keys — the standard recall device,
  * since any single key misses pairs whose error falls inside it), each
  * pair gets a per-field agreement vector, and the match score is the
  * sum of per-field integer log-odds weights (agreement adds
  * log₂(m/u) > 0, disagreement adds log₂((1−m)/(1−u)) < 0; both
  * pre-scaled to integer milli-bits so the fold is exact and
  * engine-portable — no float sums). Scores classify into
  * match / possible / non_match by the two Fellegi–Sunter thresholds.
  *
  * Weights are caller-supplied in [[linkage]]; [[linkageEm]] LEARNS the
  * m/u parameters with the classic EM over the agreement-pattern census
  * (the Splink `estimate_parameters_using_expectation_maximisation`
  * shape) and classifies by the integer match posterior instead.
  *
  * Scale shape: pair space = Σ_pass Σ_block |clean_block|·|dirty_block|
  * — governed entirely by blocking-key cardinality, never |clean|·|dirty|
  * (the blocking keys are the operator's contract: pick them so blocks
  * stay bounded as the data grows, exactly like the dedup family's
  * prefix/LSH blocks). The per-pass block joins run on (id, blockKey)
  * PROJECTIONS — two columns wide — and the cross-pass dedup is a
  * distinct over the (cleanId, dirtyId) pair alone; full rows join back
  * exactly once after dedup, so no stage shuffles candidate rows at
  * record width more than once. Everything after is row-local codegen
  * (agreement predicates, integer weight fold).
  */
object Linkage {

  /** One scoring field: (name, agreement predicate over the joined
    * candidate frame, agreement weight, disagreement weight) — weights
    * in integer milli-bits of log-odds.
    */
  final case class Field(name: String, agree: Column,
      wAgree: Long, wDisagree: Long)

  /** Blocked candidate pairs of `dirty` against `clean`, deduped across
    * passes on the ID PAIR: per pass, both frames project to
    * (id, blockKey) before the equi-join, the union of (cleanId,
    * dirtyId) pairs dedups two longs wide, and the full rows attach via
    * two equi-joins afterwards. A candidate surviving several passes
    * appears exactly once regardless of duplicate full rows in either
    * input.
    */
  private def candidates(clean: DataFrame, dirty: DataFrame,
      cleanId: String, dirtyId: String,
      passes: Seq[(Column, Column)]): DataFrame = {
    // The pair-dedup contract requires unique ids per side: a duplicated
    // id would fan each candidate pair out by its copy count at the
    // join-back and silently multi-score it. Fail loud instead — one
    // single-column map-side-combined aggregate per input, the same cost
    // class as the pass projections themselves.
    requireUniqueIds(clean, cleanId, "clean")
    requireUniqueIds(dirty, dirtyId, "dirty")
    val pairs = passes.map { case (ck, dk) =>
      clean.select(col(cleanId).as("_cid"), ck.as("_bk"))
        .join(dirty.select(col(dirtyId).as("_did"), dk.as("_bk")), "_bk")
        .select(col("_cid"), col("_did"))
    }.reduce(_ unionByName _).distinct()
    pairs
      .join(clean, pairs("_cid") === clean(cleanId))
      .join(dirty, pairs("_did") === dirty(dirtyId))
      .drop("_cid", "_did")
  }

  private def requireUniqueIds(df: DataFrame, idCol: String,
      side: String): Unit = {
    val r = df.agg(count(col(idCol)).as("_n"),
      countDistinct(col(idCol)).as("_d")).collect().head
    require(r.getLong(0) == r.getLong(1),
      s"linkage $side frame must have unique $idCol values: " +
        s"${r.getLong(0)} non-null rows vs ${r.getLong(1)} distinct")
  }

  /** Blocked Fellegi–Sunter linkage of `dirty` records against `clean`.
    * The two frames must have disjoint column names; `cleanId`/`dirtyId`
    * name each side's record-id column (the pair-dedup key). `passes`
    * gives one (clean-side key, dirty-side key) expression pair per
    * blocking pass; a candidate surviving several passes scores once.
    * Returns the candidate pairs with one `<field>_agree` boolean per
    * field, the integer `score`, and the `verdict` (`match` ≥ `matchAt`,
    * `non_match` < `nonMatchBelow`, else `possible`).
    */
  def linkage(clean: DataFrame, dirty: DataFrame,
      cleanId: String, dirtyId: String,
      passes: Seq[(Column, Column)], fields: Seq[Field],
      matchAt: Long, nonMatchBelow: Long): DataFrame = {
    require(clean.columns.toSet.intersect(dirty.columns.toSet).isEmpty,
      "clean and dirty frames must have disjoint column names")
    require(passes.nonEmpty && fields.nonEmpty)
    val cands = candidates(clean, dirty, cleanId, dirtyId, passes)
    val withAgree = fields.foldLeft(cands) { (df, f) =>
      df.withColumn(s"${f.name}_agree", f.agree)
    }
    val score = fields.map(f =>
      when(col(s"${f.name}_agree"), lit(f.wAgree))
        .otherwise(lit(f.wDisagree))).reduce(_ + _)
    withAgree.withColumn("score", score)
      .withColumn("verdict",
        when(col("score") >= matchAt, "match")
          .when(col("score") < nonMatchBelow, "non_match")
          .otherwise("possible"))
  }

  /** EM estimation of the Fellegi–Sunter parameters from the blocked
    * candidates' agreement-pattern census (Winkler 1988; the Splink EM).
    * `cands` must carry one boolean column per field (`agreeCols`); the
    * census collapses them to ≤ 2^k pattern counts — a bounded driver
    * collect (the bradleyTerry pattern), after which the EM loop runs
    * entirely on the driver in EXACT integer millionths (BigInt — no
    * float products), so an oracle can replay the rounds bit-for-bit as
    * unrolled CTEs:
    *
    *   E: post(γ) = p·Π(γᵢ ? mᵢ : S−mᵢ) · S div
    *                [p·Π(γᵢ ? mᵢ : S−mᵢ) + (S−p)·Π(γᵢ ? uᵢ : S−uᵢ)]
    *   M: p = Σ n_γ·post(γ) div N;  mᵢ = Σ_{γᵢ=1} n_γ·post(γ) · S div
    *      Σ n_γ·post(γ);  uᵢ symmetric on (S − post)
    *
    * with every m/u/p clamped to [1, S−1] per round (a parameter pinned
    * at exactly 0 or S would zero all downstream products). At most 4
    * fields: the E-step numerator p·Π·S reaches 10^36 at k = 4, inside
    * DuckDB's HUGEINT (≈1.7·10^38) so the oracle replay stays exact;
    * k = 5 would overflow it.
    *
    * Returns (p6, per-field m6, per-field u6, pattern → posterior6).
    */
  def emEstimate(cands: DataFrame, agreeCols: Seq[String], iters: Int = 5,
      p0: Long = 100000L, m0: Long = 900000L, u0: Long = 100000L)
      : (Long, Vector[Long], Vector[Long], Map[Int, Long]) = {
    val k = agreeCols.size
    require(k >= 1 && k <= 4,
      "EM portability bound: 1..4 fields (HUGEINT-exact oracle replay)")
    require(iters >= 1)
    val bit = agreeCols.zipWithIndex.map { case (c, i) =>
      when(col(c), lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    val census: Seq[(Int, Long)] = cands.groupBy(bit.as("_pat"))
      .agg(count(lit(1)).as("_n")).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1))).toSeq.sortBy(_._1)
    val S = BigInt(1000000)
    def clamp(x: BigInt): BigInt = x.max(BigInt(1)).min(S - 1)
    val N = BigInt(census.map(_._2).sum).max(BigInt(1))
    var p = BigInt(p0)
    var m = Vector.fill(k)(BigInt(m0))
    var u = Vector.fill(k)(BigInt(u0))
    var post = Map.empty[Int, BigInt]
    for (_ <- 1 to iters) {
      post = census.map { case (pat, _) =>
        var num = p
        var den = S - p
        for (i <- 0 until k) {
          val a = ((pat >> i) & 1) == 1
          num *= (if (a) m(i) else S - m(i))
          den *= (if (a) u(i) else S - u(i))
        }
        pat -> num * S / (num + den)
      }.toMap
      val sw = census.map { case (pat, n) => BigInt(n) * post(pat) }.sum
      val swn = census.map { case (pat, n) => BigInt(n) * (S - post(pat)) }.sum
      p = clamp(sw / N)
      m = (0 until k).map { i =>
        val a = census.collect { case (pat, n) if ((pat >> i) & 1) == 1 =>
          BigInt(n) * post(pat) }.sum
        if (sw == 0) BigInt(m0) else clamp(a * S / sw)
      }.toVector
      u = (0 until k).map { i =>
        val a = census.collect { case (pat, n) if ((pat >> i) & 1) == 1 =>
          BigInt(n) * (S - post(pat)) }.sum
        if (swn == 0) BigInt(u0) else clamp(a * S / swn)
      }.toVector
    }
    // final posterior from the last M-step parameters (one more E step),
    // so the classification sees the CONVERGED weights, not the stale
    // pre-M-step posterior
    post = census.map { case (pat, _) =>
      var num = p
      var den = S - p
      for (i <- 0 until k) {
        val a = ((pat >> i) & 1) == 1
        num *= (if (a) m(i) else S - m(i))
        den *= (if (a) u(i) else S - u(i))
      }
      pat -> num * S / (num + den)
    }.toMap
    (p.toLong, m.map(_.toLong), u.map(_.toLong),
      post.map { case (k2, v) => k2 -> v.toLong })
  }

  /** Fellegi–Sunter linkage with LEARNED parameters: same blocked
    * candidate generation as [[linkage]], then [[emEstimate]] over the
    * agreement-pattern census, then classification by the integer match
    * POSTERIOR (millionths) against `matchAt6`/`nonMatchBelow6` — the
    * Splink-style "no training labels" workflow. Two passes over the
    * blocked candidate set (census, then scoring — the heavyHitters
    * 2-pass shape); the pattern → posterior map is ≤ 2^k entries,
    * attached as a literal CASE chain (no join, no broadcast).
    */
  def linkageEm(clean: DataFrame, dirty: DataFrame,
      cleanId: String, dirtyId: String,
      passes: Seq[(Column, Column)], fields: Seq[(String, Column)],
      iters: Int, matchAt6: Long, nonMatchBelow6: Long): DataFrame = {
    require(clean.columns.toSet.intersect(dirty.columns.toSet).isEmpty,
      "clean and dirty frames must have disjoint column names")
    require(passes.nonEmpty && fields.nonEmpty)
    val cands = candidates(clean, dirty, cleanId, dirtyId, passes)
    val withAgree = fields.foldLeft(cands) { case (df, (n, a)) =>
      df.withColumn(s"${n}_agree", a)
    }
    val agreeCols = fields.map { case (n, _) => s"${n}_agree" }
    val (_, _, _, post) = emEstimate(withAgree, agreeCols, iters)
    val bit = agreeCols.zipWithIndex.map { case (c, i) =>
      when(col(c), lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    val postCol = post.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (pat, w6)) => when(bit === pat, lit(w6)).otherwise(acc)
    }
    withAgree.withColumn("posterior6", postCol)
      .withColumn("verdict",
        when(col("posterior6") >= matchAt6, "match")
          .when(col("posterior6") < nonMatchBelow6, "non_match")
          .otherwise("possible"))
  }
}
