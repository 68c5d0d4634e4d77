package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

/** q227 code-likeness gate + q228 LSH band-tuning table. */
class CodeGateLshTuningSpec extends SparkSpec {
  import spark.implicits._

  test("codeScore: exact hand-computed signals and operating point") {
    val code = "a;\n  b();"
    // lines ["a;", "  b();"]: semi 2/2, ind 1/2; chars 9, syms 4
    val prose = "the cat sat on the mat and looked around quietly"
    val kwy = "def foo class bar plain words here"
    val out = TextAnalysis.codeScore(
        Seq((1L, code), (2L, prose), (3L, kwy)).toDF("doc_id", "text"))
      .select("doc_id", "sym6", "semi6", "ind6", "code6", "is_code")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5)))).toMap
    assert(out(1L) === ((444444L, 1000000L, 500000L, 677777L, true)))
    assert(out(2L)._4 === 0L && !out(2L)._5)
    // two keywords alone: 50000 -> scored but far below the gate
    assert(out(3L)._4 === 50000L && !out(3L)._5)
  }

  test("codeScore: planted snippet slice flags, untouched prose slice " +
      "does not (q227 fixture shape)") {
    val out = SparkEntry.queries("q227_code_detect")(
      spark, "/root/testdata/sf0.001")
    val h = ((col("doc_id") % 2147483648L) * 2654435761L) % 2147483647L
    val planted = out.filter(h % 5 === 0)
    val clean = out.filter(h % 5 =!= 0)
    assert(planted.count() > 0 && clean.count() > 0)
    assert(planted.filter(!col("is_code")).count() === 0,
      "every planted-code doc must flag")
    assert(clean.filter(col("is_code")).count() === 0,
      "no prose doc may flag")
  }

  test("lshTuningTable: more bands = more candidates and >= recall; " +
      "found never exceeds truth") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val t = Dedup.lshTuningTable(docs).orderBy("bands").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(t.map(_._1).toSeq === Seq(2L, 4L, 8L))
    assert(t.forall { case (b, rpb, _, _, _, _) => b * rpb === 16L })
    assert(t.forall { case (_, _, nt, _, nf, rec) =>
      nf <= nt && rec <= 1.0 })
    // candidate volume is monotone in band count (shorter keys collide
    // at least as often), and so is measured recall on this corpus
    assert(t(0)._4 <= t(1)._4 && t(1)._4 <= t(2)._4)
    assert(t(0)._6 <= t(1)._6 && t(1)._6 <= t(2)._6)
    // at 8x2 banding the planted near-dups are essentially all caught
    assert(t(2)._6 >= 0.9, s"8-band recall ${t(2)._6}")
  }
}
