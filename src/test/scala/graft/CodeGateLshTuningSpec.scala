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

  test("clusterChainAudit: planted A~B~C chain flags with exact pairwise " +
      "floor; identical pair is clean; size cap excludes") {
    import spark.implicits._
    val a = (1 to 30).map(i => s"a$i")
    val b = a.updated(29, "zz")             // differs from A at pos 30
    val c = b.updated(0, "yy")              // differs from A at pos 1+30
    val docs = Seq(
      (1L, a.mkString(" ")), (2L, b.mkString(" ")), (3L, c.mkString(" ")),
      (10L, "same same text here exactly"), (11L, "same same text here exactly"))
      .toDF("doc_id", "text")
    // threshold 0.9: A-B and B-C are 27/29 = .9310 edges, A-C is
    // 26/30 = .8666 -- connected only by chaining
    val out = Dedup.clusterChainAudit(docs, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r).toMap
    val chain = out(1L)
    assert(chain.getLong(1) === 3L && chain.getLong(2) === 3L)
    assert(chain.getDouble(3) === 0.8666, "min = floor(26e4/30)/1e4")
    assert(chain.getDouble(4) === 0.909533, "avg = (9310+8666+9310)*100 div 3")
    assert(chain.getDouble(5) === 0.666666 && chain.getBoolean(6))
    val clean = out(10L)
    assert(clean.getDouble(3) === 1.0 && clean.getDouble(5) === 1.0)
    assert(!clean.getBoolean(6))
    // the size cap drops the triple, keeps the pair
    val capped = Dedup.clusterChainAudit(docs, threshold = 0.9,
      maxClusterSize = 2).collect().map(_.getLong(0)).toSet
    assert(capped === Set(10L))
  }
}
