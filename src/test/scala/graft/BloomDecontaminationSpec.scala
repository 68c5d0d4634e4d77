package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusOps

/** Bloom-prefiltered decontamination (q75): the sketch prunes the probe
  * side BEFORE the exact semi-join, and the verify join keeps the output
  * bit-identical to the plain exact path.
  */
class BloomDecontaminationSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def split(d: org.apache.spark.sql.DataFrame) =
    (d.filter(col("doc_id") % 20 =!= 0), d.filter(col("doc_id") % 20 === 0))

  test("bloom path output == exact path output") {
    val docs = Tables.documents(spark, sf)
    val (corpus, bench) = split(docs)
    val exact = CorpusOps.contaminated(corpus, bench, n = 6)
      .orderBy($"doc_id").collect().toSeq
    val bloom = CorpusOps.contaminatedBloom(corpus, bench, n = 6)
      .orderBy($"doc_id").collect().toSeq
    assert(bloom === exact)
    assert(exact.nonEmpty) // fixture actually exercises the join
  }

  test("plan: might_contain prefilters the semi-join probe side") {
    val docs = Tables.documents(spark, sf)
    val (corpus, bench) = split(docs)
    val plan = CorpusOps.contaminatedBloom(corpus, bench, n = 6)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected a BloomFilterMightContain predicate in:\n$plan")
    // the bloom predicate must sit below the join, not above it
    val joinIdx = plan.indexOf("LeftSemi")
    val bloomIdx = plan.indexOf("might_contain")
    assert(joinIdx >= 0 && bloomIdx > joinIdx,
      "bloom filter should be on the probe-side subtree under the semi-join")
  }

  test("empty benchmark -> no contamination, no crash") {
    val docs = Tables.documents(spark, sf)
    val out = CorpusOps.contaminatedBloom(
      docs, docs.filter(lit(false)), n = 6)
    assert(out.count() === 0)
  }

  test("tiny fpp-stress filter still returns exact output") {
    // force a deliberately undersized filter (high fp rate) to prove the
    // verify join removes every false positive
    val docs = Tables.documents(spark, sf)
    val (corpus, bench) = split(docs)
    val exact = CorpusOps.contaminated(corpus, bench, n = 6)
      .orderBy($"doc_id").collect().toSeq
    val stressed = CorpusOps.contaminatedBloom(corpus, bench, n = 6,
      expectedItems = 8, fpp = 0.5)
      .orderBy($"doc_id").collect().toSeq
    assert(stressed === exact)
  }
}
