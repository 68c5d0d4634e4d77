package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusOps, Dedup}

/** BM25 scoring (q76) and SemDeDup semantic dedup (q77). */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("bm25: hand-checked score on a 3-doc corpus") {
    val docs = Seq(
      (0L, "cat dog cat"),
      (1L, "dog fish"),
      (2L, "bird bird bird bird")).toDF("doc_id", "text")
    val out = CorpusOps.bm25(docs, Seq("cat"), k1 = 1.2, b = 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // N=3, df(cat)=1, idf = ln((3-1+0.5)/1.5 + 1) = ln(8/3)
    // doc0: tf=2, dl=3, avgdl=3 -> idf*2*2.2/(2+1.2*(0.25+0.75)) = idf*1.375
    val expected = math.floor(math.log(8.0 / 3) * 2 * 2.2 / 3.2 * 1000) / 1000
    assert(out === Seq((0L, 1L, expected)))
  }

  test("bm25: higher tf scores higher at equal length") {
    val docs = Seq(
      (0L, "cat cat cat dog"),
      (1L, "cat dog dog dog")).toDF("doc_id", "text")
    val m = CorpusOps.bm25(docs, Seq("cat"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(m(0L) > m(1L))
  }

  test("semanticDropped equals the brute-force smaller-neighbor rule") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    // brute force on the driver (sf0.001 is tiny)
    val vecs = emb.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      math.floor(d / math.sqrt(na * nb) * 10000 + 0.5) / 10000
    }
    val expected = (for {
      j <- vecs.indices
      i <- 0 until j
      if cos(vecs(i)._2, vecs(j)._2) >= 0.45
    } yield (vecs(j)._1, vecs(i)._1))
      .groupBy(_._1)
      .map { case (b, ps) => (b, ps.map(_._2).min, ps.size.toLong) }
      .toSet
    val got = Dedup.semanticDropped(emb, threshold = 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    assert(got.forall { case (v, d, _) => d < v })
  }
}
