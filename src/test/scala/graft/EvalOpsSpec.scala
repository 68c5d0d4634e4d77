package graft

import org.apache.spark.sql.functions._
import graft.operators.EvalOps

/** Evaluation/annotation analytics (q168+): Fleiss' κ hand-checked closed
  * forms, degenerate-agreement edges, fixture structure, determinism.
  */
class EvalOpsSpec extends SparkSpec {

  import spark.implicits._

  test("fleissKappa: hand-computed 2-item/2-rater example") {
    // item A: both raters cat0; item B: split cat0/cat1.
    // P_bar = (6-4)/(2*2*1) = 0.5 ; P_e = (3²+1²)/(2·2)² = 0.625
    // kappa = (0.5-0.625)/(1-0.625) = -1/3 → floored millionths -333334
    val r = Seq(("s", 1L, 0L, 0L), ("s", 1L, 1L, 0L),
      ("s", 2L, 0L, 0L), ("s", 2L, 1L, 1L))
      .toDF("source", "item_id", "rater", "cat")
    val row = EvalOps.fleissKappa(r).collect().head
    assert(row.getLong(1) === 2L && row.getLong(2) === 2L)
    assert(row.getDouble(3) === 0.5)
    assert(row.getDouble(4) === 0.625)
    assert(row.getDouble(5) === -0.333334)
  }

  test("fleissKappa: perfect agreement is exactly 1 even with mixed cats") {
    // all raters agree per item, items spread over two categories so
    // P_e < 1 and the kappa division is non-degenerate
    val r = (0L to 9L).flatMap(i =>
      (0L to 2L).map(k => ("s", i, k, i % 2)))
      .toDF("source", "item_id", "rater", "cat")
    val row = EvalOps.fleissKappa(r).collect().head
    assert(row.getDouble(3) === 1.0)
    assert(row.getDouble(5) === 1.0)
  }

  test("ratings fixture: rater count, category range, exact noise rule") {
    val docs = (0L to 49L).map(i => (i, s"t$i", s"src${i % 3}"))
      .toDF("doc_id", "text", "source")
    val r = EvalOps.ratings(docs)
    assert(r.count() === 250L)
    val perItem = r.groupBy("item_id").count().select("count")
      .distinct().collect().map(_.getLong(0)).toSeq
    assert(perItem === Seq(5L))
    assert(r.filter(col("cat") < 0 || col("cat") > 3).count() === 0L)
    // doc 7: idHash = 1401181151, base = 3; rater 0 noisy ((h+0)%10=1<3)
    // → flipped to (3 + 1 + (1401181151%97 + 0)%3) % 4 = 1; rater 1
    // clean ((h+17)%10=8) → base 3
    val c70 = r.filter(col("item_id") === 7 && col("rater") === 0)
      .collect().head.getLong(3)
    assert(c70 === 1L)
    val c71 = r.filter(col("item_id") === 7 && col("rater") === 1)
      .collect().head.getLong(3)
    assert(c71 === 3L)
  }

  test("fleissKappa is deterministic under repartition") {
    val docs = (0L to 99L).map(i => (i, s"t$i", s"src${i % 4}"))
      .toDF("doc_id", "text", "source")
    val a = EvalOps.fleissKappa(EvalOps.ratings(docs))
      .orderBy("source").collect().toSeq
    val b = EvalOps.fleissKappa(EvalOps.ratings(docs.repartition(11)))
      .orderBy("source").collect().toSeq
    assert(a === b)
    // the fixture's 30% noise should land κ in the informative band
    val k = a.head.getDouble(5)
    assert(k > 0.2 && k < 0.9, s"kappa out of informative band: $k")
  }
}
