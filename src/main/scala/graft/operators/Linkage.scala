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
  * Weights are caller-supplied (estimated offline or from priors) — the
  * EM weight-estimation loop is a bounded driver iteration over the
  * |fields|-sized agreement-pattern census, deliberately out of scope
  * here; given weights, the whole linkage is one declarative plan.
  *
  * Scale shape: pair space = Σ_pass Σ_block |clean_block|·|dirty_block|
  * — governed entirely by blocking-key cardinality, never |clean|·|dirty|
  * (the blocking keys are the operator's contract: pick them so blocks
  * stay bounded as the data grows, exactly like the dedup family's
  * prefix/LSH blocks). Everything after the blocked equi-joins is
  * row-local codegen (agreement predicates, integer weight fold); the
  * cross-pass union dedups on the pair id — an equi-shuffle on the
  * candidate set, not the corpus.
  */
object Linkage {

  /** One scoring field: (name, agreement predicate over the joined
    * candidate frame, agreement weight, disagreement weight) — weights
    * in integer milli-bits of log-odds.
    */
  final case class Field(name: String, agree: Column,
      wAgree: Long, wDisagree: Long)

  /** Blocked Fellegi–Sunter linkage of `dirty` records against `clean`.
    * The two frames must have disjoint column names. `passes` gives one
    * (clean-side key, dirty-side key) expression pair per blocking pass;
    * a candidate surviving several passes scores once. Returns the
    * candidate pairs with one `<field>_agree` boolean per field, the
    * integer `score`, and the `verdict` (`match` ≥ `matchAt`,
    * `non_match` < `nonMatchBelow`, else `possible`).
    */
  def linkage(clean: DataFrame, dirty: DataFrame,
      passes: Seq[(Column, Column)], fields: Seq[Field],
      matchAt: Long, nonMatchBelow: Long): DataFrame = {
    require(clean.columns.toSet.intersect(dirty.columns.toSet).isEmpty,
      "clean and dirty frames must have disjoint column names")
    require(passes.nonEmpty && fields.nonEmpty)
    val cands = passes.map { case (ck, dk) =>
      clean.withColumn("_bk", ck)
        .join(dirty.withColumn("_bk", dk), "_bk")
        .drop("_bk")
    }.reduce(_ unionByName _).distinct()
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
}
