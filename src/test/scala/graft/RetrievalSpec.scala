package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusOps, Dedup, Similarity}

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

  test("hybridRetrieve: RRF fusion invariants + bounded ranking windows") {
    val sf = "/root/testdata/sf0.001"
    val out = Similarity.hybridRetrieve(
      Tables.documents(spark, sf), Tables.embeddings(spark, sf),
      queryIds = Seq(0L, 1L, 2L), k = 10)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1),
      Option(r.get(2)).map(_.asInstanceOf[Long]),
      Option(r.get(3)).map(_.asInstanceOf[Long]),
      r.getDouble(4), r.getLong(5)))

    // every query returns exactly k fused results, ranks contiguous
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._6).sorted.toSeq === (1L to 10L), s"query $q ranks")
      // fused order is by score desc (doc_id tiebreak)
      val inOrder = rs.sortBy(_._6).map(_._5)
      assert(inOrder.sliding(2).forall {
        case Array(a, b) => a >= b
        case _           => true
      }, s"query $q fused scores not descending")
    }
    // no self-retrieval on either side
    assert(rows.forall { case (q, d, _, _, _, _) => q != d })
    // the fused score IS 1/(60+lex) + 1/(60+dense): recompute from ranks
    rows.foreach { case (_, _, lex, dense, score, _) =>
      val expect = math.floor((lex.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        dense.map(r => 1.0 / (60 + r)).getOrElse(0.0)) * 1e6) / 1e6
      assert(score === expect)
    }
    // fusion dominance: a doc in BOTH lists with worse-side rank w beats
    // any single-list doc whose rank is >= w (1/(60+lex)+1/(60+dense) >=
    // 2/(60+w) > 1/(60+r) for r >= w) — the point of consensus fusion
    val both = rows.filter(r => r._3.isDefined && r._4.isDefined)
    val single = rows.filter(r => r._3.isEmpty || r._4.isEmpty)
    for {
      b <- both
      w = b._3.get max b._4.get
      s <- single if (s._3 orElse s._4).get >= w
    } assert(b._5 > s._5,
      s"two-list doc ${b._2} (worse rank $w) not above one-list doc ${s._2}")

    // per-side cuts must plan as WindowGroupLimit (bounded per-partition
    // state at 100 TB), never a full sort of the corpus per query
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "row_number<=cut filters should push into WindowGroupLimit")
  }

  test("rm3Rerank: expansion retrieves docs with NO original query term") {
    // "lakehouse" co-occurs with the query terms in the pseudo-relevant
    // docs; doc 10 contains ONLY "lakehouse" — a first-pass BM25 can
    // never rank it, RM3's expanded query must
    val docs = (
      (0L to 5L).map(i => (i, "spark stream lakehouse engine run fast")) ++
      Seq((10L, "lakehouse lakehouse warehouse data"),
        (11L, "turtle river bank walk slow green"),
        (12L, "unrelated words about nothing at all"))
    ).toDF("doc_id", "text")
    val out = CorpusOps.rm3Rerank(docs, Seq("spark", "stream"),
      fbDocs = 4, fbTerms = 3, topK = 10)
    val ranked = out.collect().map(r => r.getLong(1)).toSeq
    assert(ranked.contains(10L), s"expanded query must reach doc 10: $ranked")
    assert(!ranked.contains(11L) && !ranked.contains(12L))
    // the original-term docs still dominate the top of the ranking
    assert((0L to 5L).contains(ranked.head))
  }

  test("rm3Rerank with lambda=1e6 reduces to pure original-query ranking") {
    val docs = Seq(
      (0L, "cat cat cat dog filler words here"),
      (1L, "cat dog dog dog filler words here"),
      (2L, "bird bird bird bird filler words here")).toDF("doc_id", "text")
    val rm3 = CorpusOps.rm3Rerank(docs, Seq("cat"), fbDocs = 2,
      fbTerms = 2, lambda6 = 1000000L, topK = 3)
      .collect().map(r => r.getLong(1)).toSeq
    val bm = CorpusOps.bm25(docs, Seq("cat"))
      .orderBy(col("bm25").desc, col("doc_id")).collect()
      .map(_.getLong(0)).toSeq
    // fb terms get weight floor(0 * r6/s) = 0: ranking = BM25's
    assert(rm3 === bm)
  }

  test("rm3Rerank is deterministic under repartition") {
    val docs = ((0L to 30L).map(i =>
      (i, s"term${i % 7} spark filler w${i % 5} stream x${i % 3}")))
      .toDF("doc_id", "text")
    val a = CorpusOps.rm3Rerank(docs, Seq("spark", "stream"), topK = 10)
      .collect().toSeq
    val b = CorpusOps.rm3Rerank(docs.repartition(9),
      Seq("spark", "stream"), topK = 10).collect().toSeq
    assert(a === b)
  }

  test("bm25f: title hits outrank equal body hits; field norms differ") {
    // docs 1/2 identical except WHERE the query term sits: doc 1 in the
    // title (weight 3, short field), doc 2 in the body
    val fielded = Seq(
      (1L, Seq("spark", "intro"), Seq("filler", "words", "here", "now")),
      (2L, Seq("other", "intro"), Seq("spark", "words", "here", "now")),
      (3L, Seq("other", "page"), Seq("filler", "words", "here", "now")))
      .toDF("doc_id", "title", "body")
    val out = CorpusOps.bm25f(fielded, Seq("spark"), topK = 5)
      .orderBy("rank").collect()
    assert(out.length === 2)                  // doc 3 never matches
    assert(out(0).getLong(1) === 1L)          // title hit wins
    assert(out(1).getLong(1) === 2L)
    assert(out(0).getLong(2) > out(1).getLong(2))
  }

  test("bm25f is deterministic under repartition") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    def run(df: org.apache.spark.sql.DataFrame) =
      CorpusOps.bm25f(CorpusOps.fieldedFixture(df),
        Seq("vector", "stream", "filter", "spark")).orderBy("rank")
        .collect().toSeq
    assert(run(docs) === run(docs.repartition(9)))
    assert(run(docs).nonEmpty)
  }

  test("qlDirichlet: hand-quantized smoothed scores; absent terms " +
      "contribute the prior; OOV terms dropped") {
    import spark.implicits._
    def l6(tf: Long, cf: Long, dl: Long, ctot: Long, mu: Long) =
      math.floor(math.log((tf * ctot + mu * cf).toDouble /
        ((dl + mu) * ctot).toDouble) * 1e6).toLong
    val docs = Seq((1L, "a b"), (2L, "a a c")).toDF("doc_id", "text")
    val out = CorpusOps.qlDirichlet(docs, Seq("a", "c"), mu = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // ctot=5, cf(a)=3, cf(c)=1; d2 (both hits) outranks d1
    val d2 = (l6(2, 3, 3, 5, 2) + l6(1, 1, 3, 5, 2)).toDouble / 1e6
    val d1 = (l6(1, 3, 2, 5, 2) + l6(0, 1, 2, 5, 2)).toDouble / 1e6
    assert(out.toSeq === Seq((1, 2L, 2L, d2), (2, 1L, 1L, d1)))
    // an OOV query term changes nothing (dropped, standard convention)
    val withOov = CorpusOps.qlDirichlet(docs, Seq("a", "c", "zzz"), mu = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(withOov.toSeq === out.toSeq)
    // a doc with NO query hits is still ranked (prior-only score)
    val three = Seq((1L, "a b"), (2L, "a a c"), (3L, "x y"))
      .toDF("doc_id", "text")
    val all = CorpusOps.qlDirichlet(three, Seq("a"), mu = 2).collect()
    assert(all.length === 3)
    assert(all.map(_.getLong(1)).contains(3L))
    assert(all.find(_.getLong(1) == 3L).get.getLong(2) === 0L, "n_hit 0")
  }

  test("nbSourceClassifier: planted disjoint vocabularies classify " +
      "perfectly; full holdout accounted") {
    import spark.implicits._
    def isTrain(id: Long): Boolean =
      ((id % 2147483648L) * 2654435761L) % 2147483647L % 2 == 0
    val docs = (0L until 40L).map { i =>
      val src = if (i % 2 == 0) "cats" else "dogs"
      val text = if (src == "cats") "meow purr meow whiskers"
        else "woof bark woof fetch"
      (i, src, text)
    }.toDF("doc_id", "source", "text")
    val out = CorpusOps.nbSourceClassifier(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(out.keySet === Set("cats", "dogs"))
    out.foreach { case (s, (n, c, acc)) =>
      assert(n === c && acc === 1.0, s"$s: $n/$c")
    }
    val nTest = (0L until 40L).count(!isTrain(_))
    assert(out.values.map(_._1).sum === nTest.toLong,
      "every holdout doc classified")
  }
}
