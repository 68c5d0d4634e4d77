package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusOps, Similarity, TextAnalysis}

/** Specs for the round-4 corpus-analytics / embedding-QC operators
  * (q79–q84) — properties the DuckDB oracle can't express: recall against
  * brute force, determinism under repartitioning, and the analytic
  * invariants (KL ≥ 0, coverage monotone).
  */
class CorpusAnalyticsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, sf)
  private def embs = Tables.embeddings(spark, sf)

  test("PQ ADC + rerank: high recall vs brute force, never invents scores") {
    val queries = embs.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(embs, queries, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqTopK(embs, queries, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (pq intersect exact).size.toDouble / exact.size
    assert(recall >= 0.85, s"recall $recall") // untrained codebooks; trained would tighten
    // rerank is exact: any (q, neighbor) it returns carries the true cosine
    val pqScores = Similarity.pqTopK(embs, queries, 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    val exactScores = Similarity.bruteForceTopK(embs, queries, 400)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    pqScores.foreach { case (k, s) =>
      assert(exactScores(k) === s, s"rerank score drift at $k") }
  }

  test("trained PQ codebooks: recall at least matches untrained at equal oversample") {
    val queries = embs.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(embs, queries, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame) = {
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (got intersect exact).size.toDouble / exact.size
    }
    val untrained = recallOf(Similarity.pqTopK(embs, queries, 10, oversample = 4))
    val trained = recallOf(Similarity.pqTopKTrained(embs, queries, 10, oversample = 4))
    assert(trained >= untrained,
      s"Lloyd-trained codebooks regressed recall: $trained < $untrained")
    assert(trained >= 0.7, s"trained recall $trained")
  }

  test("removeDupSpans: excises cross-doc spans, keeps unique text, empties exact dups") {
    import spark.implicits._
    val toy = Seq(
      (1L, "a b c d e"),       // shares "a b c" with doc 2
      (2L, "x y a b c q r"),   // shares "a b c" with doc 1
      (3L, "u v w"),           // exact dup of doc 4 (whole-doc span, len = n)
      (4L, "u v w"),
      (5L, "solo text here ok") // nothing shared
    ).toDF("doc_id", "text")
    val out = CorpusOps.removeDupSpans(toy, n = 3)
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    def md5of(s: String) = toy.sparkSession.range(1)
      .select(md5(lit(s))).head().getString(0)
    assert(byId(1L) === ((5L, 3L, md5of("d e"))))      // "a b c" covered
    assert(byId(2L) === ((7L, 3L, md5of("x y q r"))))  // mid-doc span covered
    assert(byId(3L) === ((3L, 3L, md5of(""))))         // fully duplicated
    assert(byId(4L) === ((3L, 3L, md5of(""))))
    assert(byId(5L) === ((4L, 0L, md5of("solo text here ok"))))
    // overlapping dup spans must not double-remove: coverage is a set
    val toy2 = Seq(
      (1L, "p q r s t"),  // spans "p q r","q r s","r s t" all shared with doc 2
      (2L, "p q r s t u")
    ).toDF("doc_id", "text")
    val o2 = CorpusOps.removeDupSpans(toy2, n = 3)
      .orderBy("doc_id").collect()
    assert(o2(0).getLong(2) === 5L) // whole doc 1 covered once
    assert(o2(1).getLong(2) === 5L) // doc 2 keeps only "u"
    assert(o2(1).getString(3) === md5of("u"))
  }

  test("removeBoilerplateSpans: df-threshold excision of template spans") {
    import spark.implicits._
    def md5of(s: String) = spark.range(1)
      .select(md5(lit(s))).head().getString(0)
    val toy = Seq(
      (1L, "cookie notice here x1 y1"),
      (2L, "cookie notice here x2 y2"),
      (3L, "cookie notice here x3 y3"),
      (4L, "cookie notice maybe x4 y4"),   // no 3-gram reaches df 3
      (5L, "unique text entirely here ok")
    ).toDF("doc_id", "text")
    // dfFrac 0.5 over 5 docs -> minDf 3: only "cookie notice here" is hot
    val out = CorpusOps.removeBoilerplateSpans(toy, n = 3, dfFrac = 0.5)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((5L, 3L, md5of("x1 y1"))))
    assert(out(2L) === ((5L, 3L, md5of("x2 y2"))))
    assert(out(3L) === ((5L, 3L, md5of("x3 y3"))))
    assert(out(4L) === ((5L, 0L, md5of("cookie notice maybe x4 y4"))),
      "df-2 spans stay below a df-3 threshold (unlike removeDupSpans)")
    assert(out(5L) === ((5L, 0L, md5of("unique text entirely here ok"))))
  }

  test("benchmarkExposure: per-eval-doc fraction of grams the corpus has seen") {
    import spark.implicits._
    val bench = Seq(
      (1L, "a b c d"),   // grams {a b c, b c d}: one exposed below
      (2L, "p q r s"),   // grams {p q r, q r s}: untouched
      (3L, "a b c")      // single gram, fully exposed
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "z z a b c z"),
      (11L, "totally unrelated words here")
    ).toDF("doc_id", "text")
    val out = CorpusOps.benchmarkExposure(corpus, bench, n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) === ((2L, 1L, 0.5)))
    assert(out(2L) === ((2L, 0L, 0.0)))
    assert(out(3L) === ((1L, 1L, 1.0)))
  }

  test("removeContaminatedSpans: excises only benchmark-overlapping spans") {
    import spark.implicits._
    def md5of(s: String) = spark.range(1)
      .select(md5(lit(s))).head().getString(0)
    val bench = Seq((100L, "a b c")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "x y a b c q r"),   // quotes the benchmark mid-doc
      (2L, "a b c"),           // IS the benchmark text -> fully excised
      (3L, "x y z q r"),       // clean, even though it shares words
      (4L, "a b q c r")        // shares tokens but no 3-gram
    ).toDF("doc_id", "text")
    val out = CorpusOps.removeContaminatedSpans(corpus, bench, n = 3)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((7L, 3L, md5of("x y q r"))))
    assert(out(2L) === ((3L, 3L, md5of(""))))
    assert(out(3L) === ((5L, 0L, md5of("x y z q r"))))
    assert(out(4L) === ((5L, 0L, md5of("a b q c r"))),
      "shared vocabulary without a shared n-gram is not contamination")
    // corpus-internal duplication is NOT excised by this operator: two
    // corpus docs sharing a span unknown to the benchmark keep it
    val corpus2 = Seq((1L, "p q r s"), (2L, "p q r t")).toDF("doc_id", "text")
    val o2 = CorpusOps.removeContaminatedSpans(corpus2, bench, n = 3)
      .orderBy("doc_id").collect()
    assert(o2.forall(_.getLong(2) === 0L),
      "only benchmark n-grams drive excision here; use removeDupSpans for dups")
  }

  test("lineDedup: global first occurrence wins; repeats drop within and across docs") {
    import spark.implicits._
    val toy = Seq(
      (1L, "a b c d a b"), // segs "a b","c d","a b" — the third repeats the first
      (2L, "c d x y"),     // "c d" already seen in doc 1; "x y" is new
      (3L, "a b c d"),     // every segment seen → collapses to the empty string
      (4L, "a b c")        // tail segment "c" is shorter than segWords and kept
    ).toDF("doc_id", "text")
    def md5of(s: String) = toy.sparkSession.range(1)
      .select(md5(lit(s))).head().getString(0)
    val out = CorpusOps.lineDedup(toy, segWords = 2).orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(byId(1L) === ((3L, 2L, md5of("a b c d"))))
    assert(byId(2L) === ((2L, 1L, md5of("x y"))))
    assert(byId(3L) === ((2L, 0L, md5of(""))))
    assert(byId(4L) === ((2L, 1L, md5of("c"))))
    // the policy keeps one canonical copy: unlike removeDupSpans, no
    // segment text vanishes from the corpus entirely
    val keptTotal = out.map(_.getLong(2)).sum
    assert(keptTotal === 4L) // "a b","c d","x y","c" each survive exactly once
    // partitioning-independent: the winner is an argmin, not a scan order
    val re = CorpusOps.lineDedup(toy.repartition(7), segWords = 2)
      .orderBy("doc_id").collect()
    assert(re.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
      === out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq)
  }

  test("packSequences: spans tile documents and sequences; rangeWidth-invariant") {
    import spark.implicits._
    val toy = Seq(
      (1L, "a b c d e"), (3L, "f g"), (7L, "h i j k l m n"),
      (9L, "o"), (12L, "p q r s")
    ).toDF("doc_id", "text") // 19 tokens, seqLen 4 → seqs 0..4, last partial
    val out = CorpusOps.packSequences(toy, seqLen = 4)
      .orderBy("seq_id", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // every document is tiled exactly once: per doc, seg_lens sum to n and
    // doc_starts are the running prefix of those lengths
    val byDoc = out.groupBy(_._2)
    val nTokens = Map(1L -> 5L, 3L -> 2L, 7L -> 7L, 9L -> 1L, 12L -> 4L)
    nTokens.foreach { case (d, n) =>
      val spans = byDoc(d).sortBy(_._3)
      assert(spans.map(_._5).sum === n, s"doc $d coverage")
      assert(spans.scanLeft(0L)(_ + _._5).init.toSeq === spans.map(_._3).toSeq,
        s"doc $d span starts must be the prefix sums of lengths")
    }
    // every sequence but the last is exactly full, tiled contiguously
    val bySeq = out.groupBy(_._1)
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (sq, spans0) =>
      val spans = spans0.sortBy(_._4)
      val total = spans.map(_._5).sum
      if (sq != lastSeq) assert(total === 4L, s"seq $sq not full")
      assert(spans.scanLeft(0L)(_ + _._5).init.toSeq === spans.map(_._4).toSeq,
        s"seq $sq offsets must tile")
    }
    assert(bySeq(lastSeq).map(_._5).sum === 19L % 4)
    // the range-bucketed prefix sum is an implementation detail: any
    // rangeWidth (and any input partitioning) yields identical placement
    val alt = CorpusOps.packSequences(toy.repartition(5), seqLen = 4, rangeWidth = 3L)
      .orderBy("seq_id", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(alt.toSeq === out.toSeq)
  }

  test("bpeMerges: greedy weighted merges with left-to-right application") {
    import spark.implicits._
    // "aaab" x3, "ab" x2: chars a,a,a,b / a,b
    // round 1 pairs: (a,a): 2*3=6, (a,b): 3+2=5 -> merge (a,a) freq 6
    //   "aaab" -> aa,a,b (left-to-right greedy: [aa, a, b]); "ab" -> a,b
    // round 2 pairs: (aa,a):3, (a,b):3+2=5 -> merge (a,b) freq 5
    //   "aaab" -> aa,ab? no: [aa, a, b] -> a,b adjacent -> [aa, ab]; "ab" -> [ab]
    // round 3 pairs: (aa,ab):3 -> merge freq 3
    val toy = Seq((1L, "aaab aaab aaab ab ab")).toDF("doc_id", "text")
    val out = CorpusOps.bpeMerges(toy, merges = 3).orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq === Seq((1L, "a", "a", 6L), (2L, "a", "b", 5L),
      (3L, "aa", "ab", 3L)))
    // exhausting the vocabulary stops early instead of emitting junk
    val tiny = Seq((1L, "ab")).toDF("doc_id", "text")
    val o2 = CorpusOps.bpeMerges(tiny, merges = 5).collect()
    assert(o2.length === 1) // only (a,b) is ever mergeable
  }

  test("kmeansClusters: deterministic, partition-invariant, all clusters live") {
    val a = Similarity.kmeansClusters(embs, k = 8, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = Similarity.kmeansClusters(embs.repartition(13), k = 8, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a === b, "assignments must not depend on partitioning")
    assert(a.size === embs.count())
    assert(a.values.forall(c => c >= 0 && c < 8))
    // random unit-ish data at n=500 should populate every cell
    assert(a.values.toSet.size === 8)
  }

  test("PQ plan is candidate-bounded: no corpus-by-corpus nested loop") {
    val queries = embs.filter(col("vec_id") < 5)
    val plan = Similarity.pqTopK(embs, queries, 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "PQ plan must not cross the corpus")
  }

  test("label outliers: rank 1 is the label's true min-cosine member") {
    val out = Similarity.labelOutliers(embs, k = 1).collect()
    assert(out.length === embs.select("label").distinct().count())
    // recompute each label's min rounded cosine against its centroid the
    // slow way (full scoring, no window) and compare
    val spark2 = spark
    import spark2.implicits._
    val e = embs.select(col("vec_id"), col("label"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
      .as[(Long, Int, Array[Double])].collect()
    val byLabel = e.groupBy(_._2)
    out.foreach { r =>
      val (label, vecId, cos) = (r.getLong(0).toInt, r.getLong(1), r.getDouble(3))
      val members = byLabel(label)
      val dim = members.head._3.length
      val cv = Array.tabulate(dim)(i => members.map(_._3(i)).sum / members.length)
      def cosTo(v: Array[Double]) = {
        val dot = v.zip(cv).map { case (a, b) => a * b }.sum
        val r4 = dot / (math.sqrt(v.map(x => x * x).sum) * math.sqrt(cv.map(x => x * x).sum))
        math.round(r4 * 10000) / 10000.0
      }
      val minCos = members.map(m => (cosTo(m._3), m._1)).min
      assert(minCos === ((cos, vecId)), s"label $label outlier mismatch")
    }
  }

  test("fixed sample: exactly k per stratum, invariant to partitioning") {
    val a = CorpusOps.fixedSample(docs, "lang", 7)
    val b = CorpusOps.fixedSample(docs.repartition(17, col("text")), "lang", 7)
    assert(a.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
      === b.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted)
    val counts = a.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (lang, n) =>
      assert(counts(lang) === math.min(7L, n), s"lang $lang") }
  }

  test("vocab coverage: monotone in top_n, capped at 1, full vocab covers all") {
    val rows = CorpusOps.vocabCoverage(docs, Seq(1, 5, 1000))
      .orderBy(col("top_n")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq === Seq(1L, 5L, 1000L))
    assert(rows.sliding(2).forall { case Array(a, b) => a._3 <= b._3 })
    assert(rows.forall(_._3 <= 1.0))
    val total = docs.select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "").count()
    assert(rows.last._2 === total, "a cutoff beyond the vocab covers every token")
  }

  test("source KL: nonnegative for every slice, zero for a uniform clone") {
    val kl = CorpusOps.sourceKl(docs, "source").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(kl.nonEmpty)
    // floor-quantization can only round DOWN toward -0.001 from a true
    // value >= 0, so anything at or above -0.001 is a nonnegative KL
    kl.foreach { case (s, v) => assert(v >= -0.001, s"KL($s) = $v") }
    // a corpus where every slice IS the blend: KL == 0 exactly
    val uniform = docs.withColumn("source",
      concat(lit("clone"), (col("doc_id") % 2).cast("string")))
      .withColumn("text", lit("a b c"))
    CorpusOps.sourceKl(uniform, "source").collect()
      .foreach(r => assert(math.abs(r.getDouble(2)) <= 0.001))
  }

  test("content-defined chunks: cover the doc exactly and survive a prefix edit") {
    import spark.implicits._
    val words = (1 to 400).map(i => s"w${i % 91}tok$i")
    val original = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val chunks = CorpusOps.contentChunks(original)
      .orderBy("chunk_ord").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    // exact coverage: contiguous ords, contiguous token spans, full length
    assert(chunks.map(_._1).toSeq === chunks.indices.map(_.toLong))
    chunks.sliding(2).foreach {
      case Array((_, s1, n1, _), (_, s2, _, _)) => assert(s2 === s1 + n1)
      case _ =>
    }
    assert(chunks.head._2 === 1L && chunks.map(_._3).sum === words.size.toLong)
    // mean chunk length tracks the divisor (geometric, expectation 8)
    assert(chunks.length >= words.size / 24 && chunks.length <= words.size / 3)

    // THE property fixed windows lack: prepend 5 tokens and every chunk
    // past the edit's reach keeps its hash — boundaries are decided by a
    // trailing 3-token window, so only chunks overlapping the first
    // post-edit boundary can change. Fixed 8-token windows would shift
    // every hash in the document.
    val edited = Seq((1L, ("zz0 zz1 zz2 zz3 zz4 " + words.mkString(" "))))
      .toDF("doc_id", "text")
    val editedHashes = CorpusOps.contentChunks(edited)
      .orderBy("chunk_ord").collect().map(_.getString(4))
    val origHashes = chunks.map(_._4)
    val commonSuffix = origHashes.reverse.zip(editedHashes.reverse)
      .takeWhile { case (a, b) => a == b }.length
    assert(commonSuffix >= origHashes.length - 3,
      s"prefix edit rewrote ${origHashes.length - commonSuffix} of " +
        s"${origHashes.length} chunks; CDC should localize the damage")

    // and fixed-window chunking on the same edit shares nothing: the
    // contrast that justifies the operator
    val fixedOrig = CorpusOps.chunkDocs(original, window = 8, stride = 8)
      .orderBy("chunk_ord").collect().map(_.getString(4))
    val fixedEdit = CorpusOps.chunkDocs(edited, window = 8, stride = 8)
      .orderBy("chunk_ord").collect().map(_.getString(4))
    val fixedShared = fixedOrig.toSet.intersect(fixedEdit.toSet).size
    assert(fixedShared <= 1, s"fixed windows unexpectedly stable: $fixedShared")
  }

  test("tfidf top terms: every term is from the doc, scores descend") {
    val rows = CorpusOps.tfidfTop(docs, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.groupBy(_._1).foreach { case (docId, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._4).sliding(2).forall {
        case Array(a, b) => a >= b
        case _ => true
      }, s"doc $docId scores not descending")
      sorted.foreach { case (_, _, term, _) =>
        assert(texts(docId).split(" ").contains(term), s"doc $docId term $term") }
    }
  }

  test("novelty: exact dups score zero, unique text one, mixtures exact") {
    import spark.implicits._
    val toy = Seq(
      (1L, "aa bb cc dd ee"), (2L, "aa bb cc dd ee"), // exact dup pair
      (3L, "pp qq rr ss tt uu"),                      // fully novel
      (4L, "aa bb cc zz yy xx ww")                    // shares one 3-gram with 1/2
    ).toDF("doc_id", "text")
    val out = CorpusOps.novelty(toy).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(1L)._3 === 0.0 && out(2L)._3 === 0.0,
      "every gram of an exact dup is shared")
    assert(out(3L) === ((4L, 0L, 1.0)), "nothing shared, novelty 1")
    // doc 4 grams: "aa bb cc" (shared), "bb cc zz", "cc zz yy",
    // "zz yy xx", "yy xx ww" — 1 of 5 shared
    assert(out(4L)._1 === 5L && out(4L)._2 === 1L)
    assert(out(4L)._3 === math.floor(4.0 * 1e6 / 5) / 1e6)
  }

  test("piiScanValidated: Luhn gate and octet validation discriminate") {
    import spark.implicits._
    val toy = Seq(
      (1L, "pay 4539 5787 6362 1486 now"), // Luhn-valid test number
      (2L, "pay 4539 5787 6362 1487 now"), // one digit off: candidate, not valid
      (3L, "ip 10.5.35.65 and 999.5.7.9 only"),
      (4L, "ssn 123-45-6789 url https://x.org/a b")
    ).toDF("doc_id", "text")
    val out = CorpusOps.piiScanValidated(toy).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(out(1L) === ((0L, 0L, 0L, 0L, 1L, 1L)), s"valid card: ${out(1L)}")
    assert(out(2L) === ((0L, 0L, 0L, 0L, 1L, 0L)),
      s"corrupted check digit must fail Luhn: ${out(2L)}")
    assert(out(3L) === ((0L, 1L, 0L, 0L, 0L, 0L)),
      s"999.x.y.z must fail octet validation: ${out(3L)}")
    assert(out(4L) === ((0L, 0L, 1L, 1L, 0L, 0L)), s"ssn+url: ${out(4L)}")
  }

  test("piiFixture: the built payload scans back exactly per doc_id parity") {
    val enriched = docs.limit(24)
      .withColumn("text", CorpusOps.piiFixture(col("doc_id"), col("text")))
    val out = CorpusOps.piiScanValidated(enriched).collect()
    assert(out.length === 24)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) === 1L, s"doc $id email")
      assert(r.getLong(2) === 1L,
        s"doc $id: exactly the valid IPv4, never the 999.x decoy")
      assert(r.getLong(3) === (if (id % 2 == 0) 1L else 0L), s"doc $id ssn")
      assert(r.getLong(4) === (if (id % 3 == 0) 1L else 0L), s"doc $id url")
      assert(r.getLong(5) === 1L, s"doc $id card candidate")
      assert(r.getLong(6) === (if (id % 2 == 0) 1L else 0L),
        s"doc $id: Luhn valid iff even (odd docs' check digit is bumped)")
    }
  }

  test("clusterSample: min(m, cell) per cell, deterministic, WindowGroupLimit") {
    val sample = Similarity.clusterSample(embs, 5)
    val rows = sample.collect()
    val per = rows.groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    val full = Similarity.kmeansClusters(embs).collect()
      .groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    assert(per.keySet === full.keySet,
      "every non-empty cell must be represented")
    per.foreach { case (c, n) =>
      assert(n === math.min(5, full(c)), s"cell $c: $n of ${full(c)}") }
    // within-cell ranks are 1..n
    rows.groupBy(_.getLong(1)).foreach { case (c, rs) =>
      assert(rs.map(_.getLong(2)).sorted.toSeq === (1L to rs.length).toSeq,
        s"cell $c ranks") }
    // deterministic under repartitioning
    val again = Similarity.clusterSample(embs.repartition(7), 5).collect()
    assert(rows.map(_.toSeq).toSet === again.map(_.toSeq).toSet,
      "sample must not depend on partitioning")
    // the per-cell cut must plan as WindowGroupLimit (bounded state)
    val plan = sample.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "row_number<=m should push into WindowGroupLimit")
  }

  test("dimEnergy: closed forms, monotone in cutoff, full width is exactly 1") {
    import spark.implicits._
    // first-dim spike: energy 1 at every cutoff; all-ones: energy k/d
    // (dyadic at d=64 → exact floors)
    val spike = (1.0 +: Seq.fill(63)(0.0)).map(_.toFloat)
    val ones = Seq.fill(64)(1.0f)
    val toy = Seq((1L, spike, 0), (2L, ones, 0))
      .toDF("vec_id", "embedding", "label")
    def energies(df: org.apache.spark.sql.DataFrame) =
      Similarity.dimEnergy(df).collect()
        .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    val spikeE = energies(toy.filter($"vec_id" === 1))
    assert(Seq(4, 8, 16, 32, 64).forall(k => spikeE(k) === 1.0), s"$spikeE")
    val onesE = energies(toy.filter($"vec_id" === 2))
    Seq(4, 8, 16, 32, 64).foreach { k =>
      assert(onesE(k) === k.toDouble / 64, s"cutoff $k: ${onesE(k)}") }
    // corpus fixture: monotone, capped at 1, full width exactly 1
    val real = Similarity.dimEnergy(embs).collect()
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    val ks = Seq(4, 8, 16, 32, 64)
    ks.sliding(2).foreach { case Seq(a, b) =>
      assert(real(a) <= real(b), s"energy must be monotone: $real") }
    assert(real(64) === 1.0, "full width holds the whole norm")
  }

  test("heavyHitters: exact counts, CMS never under-admits, tail pruned") {
    import spark.implicits._
    // skewed fixture: one phrase repeated far past the threshold inside
    // each heavy doc, plus a long tail of distinct one-shot trigrams
    val heavyText = Seq.fill(10)("the heavy phrase").mkString(" ")
    val toy = ((1L to 4L).map(i => (i, heavyText)) ++
      (100L to 400L).map(i => (i, s"tail a$i b$i c$i d$i"))).toDF("doc_id", "text")
    val out = CorpusOps.heavyHitters(toy, n = 3, minCount = 6,
      depth = 4, width = 4096).collect()
    // ground truth by brute force
    val brute = toy.collect().flatMap { r =>
      val w = r.getString(1).split(" ").filter(_.nonEmpty)
      if (w.length >= 3) w.sliding(3).map(_.mkString(" ")).toSeq
      else Seq(w.mkString(" "))
    }.groupBy(identity).view.mapValues(_.length.toLong)
      .filter(_._2 >= 6).toMap
    val got = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === brute, s"exact rescan must equal brute force: $got vs $brute")
    // CMS property: estimate ≥ exact count on every emitted row
    out.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS underestimated ${r.getString(0)}") }
    // pruning really happens: with 4k buckets and ~1.5k tail occurrences
    // the one-shot trigrams' estimates sit far below minCount, so the
    // admitted-occurrence relation is a small fraction of the corpus
    val admitted = {
      val w = filter(split(col("text"), " "), t => t =!= lit(""))
      val sh = when(size(w) >= 3,
          transform(sequence(lit(0), size(w) - 3),
            i => concat_ws(" ", slice(w, i + lit(1), lit(3)))))
        .otherwise(array(concat_ws(" ", w)))
      toy.select(explode(sh).as("s")).count()
    }
    val emittedOcc = out.map(_.getLong(1)).sum
    assert(emittedOcc < admitted / 5,
      s"heavy occurrences $emittedOcc should be a small fraction of $admitted")
  }

  test("seqLenFit: closed-form waste accounting, monotone in seq_len") {
    import spark.implicits._
    // token counts 2, 4, 10 — straddle both candidate lengths
    val toy = Seq((1L, "a b"), (2L, "a b c d"),
      (3L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val out = CorpusOps.seqLenFit(toy, lengths = Seq(4, 8))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getLong(4), r.getDouble(7)))).toMap
    // L=4: trunc = 10-4 = 6; pad = (4-2)+(4-4)+0 = 2; fit = 2/3
    assert(out(4L) === ((6L, 2L, math.floor(2e6 / 3) / 1e6)))
    // L=8: trunc = 2; pad = 6+4+0 = 10; fit = 2/3
    assert(out(8L) === ((2L, 10L, math.floor(2e6 / 3) / 1e6)))
    // corpus sanity: truncation falls and padding rises with L
    val real = CorpusOps.seqLenFit(docs).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(5), r.getDouble(6)))).toMap
    Seq(64L, 128L, 256L).sliding(2).foreach { case Seq(a, b) =>
      assert(real(a)._1 >= real(b)._1, s"trunc_frac not monotone: $real")
      assert(real(a)._2 <= real(b)._2, s"pad_frac not monotone: $real")
    }
  }

  test("shardManifest: additive checksums detect any mutation") {
    import spark.implicits._
    val m0 = CorpusOps.shardManifest(docs, nShards = 8).collect()
    assert(m0.map(_.getLong(1)).sum === docs.count(), "every doc in a shard")
    // partition invariance (order independence of the checksum)
    val m1 = CorpusOps.shardManifest(docs.repartition(13), nShards = 8)
      .collect()
    assert(m0.map(r => r.getLong(0) -> r.getLong(6)).toMap ===
      m1.map(r => r.getLong(0) -> r.getLong(6)).toMap)
    // one flipped character in one doc shifts exactly that shard's sum
    val corpusSum = m0.map(_.getLong(6)).sum
    val tampered = docs.withColumn("text",
      when(col("doc_id") === 7, concat(col("text"), lit("x")))
        .otherwise(col("text")))
    val mt = CorpusOps.shardManifest(tampered, nShards = 8).collect()
    assert(mt.map(_.getLong(6)).sum !== corpusSum, "tamper must shift sum")
    val changed = mt.map(r => r.getLong(0) -> r.getLong(6)).toMap
    val orig = m0.map(r => r.getLong(0) -> r.getLong(6)).toMap
    assert(orig.keySet.count(s => orig(s) != changed(s)) === 1,
      "exactly one shard's checksum moves")
    // a dropped doc shifts the sum too (count alone would also catch it,
    // but the checksum catches drop+re-add-of-different-content)
    val dropped = CorpusOps.shardManifest(docs.filter(col("doc_id") =!= 7),
      nShards = 8).collect().map(_.getLong(6)).sum
    assert(dropped !== corpusSum)
  }

  test("driftReport: zero PSI on identical snapshots, positive under shift") {
    import spark.implicits._
    val base = (1L to 100L).map(i => (i, i % 50)).toDF("id", "score")
    val same = CorpusOps.driftReport(base, base, "score").collect()
    same.foreach { r =>
      assert(r.getDouble(3) === r.getDouble(4), s"p != q on clone: $r")
      assert(r.getDouble(5) === 0.0, s"PSI must be 0 on a clone: $r") }
    assert(same.length === 10, "one row per bucket, empties included")
    // shift mass upward: drift must register, all terms finite/nonnegative
    val shifted = base.withColumn("score", col("score") + 30)
    val drift = CorpusOps.driftReport(base, shifted, "score").collect()
    val total = drift.map(_.getDouble(5)).sum
    assert(total > 0.2, s"upward shift must alarm: $total")
    drift.foreach(r => assert(r.getDouble(5) >= 0.0 &&
      !r.getDouble(5).isNaN, s"smoothing keeps terms finite: $r"))
    // out-of-range after-scores clamp into the edge buckets, never drop
    assert(drift.map(_.getLong(2)).sum === 100L)
  }

  test("domainStats: normalization folds to registered domain, verdicts split") {
    import spark.implicits._
    val toy = Seq(
      (1L, "see https://www.example.com/a and http://example.com:8080/b"),
      (2L, "also https://blog.example.com/post plain text"),
      (3L, "bad https://ads.spamhub.biz/x here"),
      (4L, "rare https://one-off.io/q"),
      (5L, "no urls at all")
    ).toDF("doc_id", "text")
    val out = CorpusOps.domainStats(toy, minDocs = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getString(4)))).toMap
    // www./port/path stripped, blog. subdomain folded into example.com
    assert(out("example.com") === ((3L, 2L, false, "keep")))
    // subdomain meets the blocklist at the registered domain
    assert(out("spamhub.biz") === ((1L, 1L, true, "drop")))
    // below minDocs → manual-review queue
    assert(out("one-off.io") === ((1L, 1L, false, "review")))
    assert(out.size === 3, s"doc 5 contributes nothing: $out")
  }

  test("epochOrder: a bijection, partition-invariant, re-dealt per seed") {
    val n = docs.count()
    val e0 = CorpusOps.epochOrder(docs, seed = 42L, nShards = 8).collect()
    // bijection into the strided order: every global_pos distinct, every
    // doc placed, and shard ≡ global_pos mod nShards (the stride law)
    assert(e0.length === n.toInt)
    assert(e0.map(_.getLong(3)).distinct.length === n.toInt)
    e0.foreach(r => assert(r.getLong(3) % 8 === r.getLong(1),
      s"stride law broken: $r"))
    // deterministic under physical layout changes
    val e1 = CorpusOps.epochOrder(docs.repartition(17), seed = 42L,
      nShards = 8).collect()
    assert(e0.map(r => r.getLong(0) -> r.getLong(3)).toMap ===
      e1.map(r => r.getLong(0) -> r.getLong(3)).toMap)
    // a different seed is a genuinely different permutation
    val e2 = CorpusOps.epochOrder(docs, seed = 43L, nShards = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val moved = e0.count(r => e2(r.getLong(0)) != r.getLong(3))
    assert(moved > n / 2, s"seed change moved only $moved of $n docs")
    // the window is per-shard: the plan must not collapse to a single
    // partition (no empty partitionBy in any window exchange)
    val plan = CorpusOps.epochOrder(docs, 42L, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"epoch order must never globally sort:\n$plan")
  }

  test("datasetCard: exact counts, dup rate, and language entropy on a toy") {
    import spark.implicits._
    val toy = Seq(
      (1L, "a b c", "en", "web"), (2L, "a b c", "en", "web"),
      (3L, "d e", "de", "web"), (4L, "f g h i", "fr", "books")
    ).toDF("doc_id", "text", "lang", "source")
    val out = CorpusOps.datasetCard(toy).collect()
      .map(r => r.getString(0) -> r).toMap
    val web = out("web")
    assert(web.getLong(1) === 3L && web.getLong(2) === 8L) // docs, tokens
    // docs 1 and 2 are byte-identical → 1 duplicate of 3 docs
    assert(web.getDouble(6) === math.floor(1e6 / 3) / 1e6)
    assert(web.getLong(7) === 2L) // en, de
    // entropy of {en:2, de:1}: ln3 − (2ln2)/3
    val h = math.floor((math.log(3) - 2 * math.log(2) / 3) * 1e6) / 1e6
    assert(web.getDouble(8) === h)
    val books = out("books")
    assert(books.getDouble(6) === 0.0 && books.getDouble(8) === 0.0)
    // token shares partition the corpus (up to floor quantization)
    val shares = out.values.map(_.getDouble(4)).sum
    assert(shares > 0.999 && shares <= 1.0, s"shares sum $shares")
  }

  test("clusterKeywords: cluster-exclusive terms outrank shared ones") {
    import spark.implicits._
    val toyDocs = Seq(
      (1L, "rust memory rust borrow code"), (2L, "rust borrow checker"),
      (3L, "pasta tomato pasta basil code"), (4L, "pasta olive basil oil")
    ).toDF("doc_id", "text")
    val assign = Seq((1L, 0), (2L, 0), (3L, 1), (4L, 1))
      .toDF("vec_id", "label")
    val out = CorpusOps.clusterKeywords(toyDocs, assign, k = 2).collect()
    val top = out.filter(_.getLong(1) === 1L)
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    // the most frequent exclusive term names each cluster — "code" has
    // the same frequency as the winners but lives in BOTH clusters, so
    // its idf ln((1+2)/(1+2)) = 0 kills it
    assert(top(0L) === "rust" && top(1L) === "pasta", s"$top")
    out.filter(_.getString(2) === "code")
      .foreach(r => assert(r.getDouble(5) === 0.0, s"shared term: $r"))
    out.filter(r => r.getString(2) === "rust" || r.getString(2) === "pasta")
      .foreach(r => assert(r.getDouble(5) > 0.0, s"exclusive term: $r"))
    // real tables: k rows per label, ranks contiguous from 1
    val real = CorpusOps.clusterKeywords(docs, embs, k = 3).collect()
    val byLabel = real.groupBy(_.getLong(0))
    assert(byLabel.size === 10)
    byLabel.values.foreach { rs =>
      assert(rs.map(_.getLong(1)).sorted.toSeq === Seq(1L, 2L, 3L)) }
  }

  test("ngramLm: probabilities partition each context, support filter holds") {
    import spark.implicits._
    val toy = Seq(
      (1L, "the cat sat"), (2L, "the cat ran"), (3L, "the cat sat"),
      (4L, "the cat sat"), (5L, "a dog ran")
    ).toDF("doc_id", "text")
    val out = CorpusOps.ngramLm(toy, n = 2, k = 3, minCount = 4).collect()
    // only "the cat" reaches support 4; "a dog" (1) is pruned pre-window
    assert(out.map(_.getString(0)).distinct.toSeq === Seq("the cat"))
    val byNext = out.map(r => r.getString(2) -> r.getLong(3)).toMap
    assert(byNext === Map("sat" -> 3L, "ran" -> 1L))
    assert(out.forall(_.getLong(4) === 4L))
    // rank 1 is the argmax continuation
    assert(out.find(_.getLong(1) === 1L).get.getString(2) === "sat")
    // real corpus: per-context probs sum to ≤ 1 and ranks are contiguous
    val real = CorpusOps.ngramLm(docs, n = 2, k = 3, minCount = 4).collect()
    real.groupBy(_.getString(0)).values.foreach { rs =>
      val ranks = rs.map(_.getLong(1)).sorted.toSeq
      assert(ranks === (1L to ranks.length).toSeq, s"ranks $ranks")
      assert(rs.map(_.getDouble(5)).sum <= 1.0 + 1e-9)
    }
  }

  test("sourceAffinity: zero diagonal, disjoint sources pay positive excess") {
    import spark.implicits._
    val toy = Seq(
      (1L, "alpha alpha alpha beta", "A"), (2L, "alpha beta beta", "A"),
      (3L, "gamma gamma delta", "B"), (4L, "delta delta gamma", "B"),
      (5L, "alpha beta gamma delta", "C")
    ).toDF("doc_id", "text", "source")
    val out = CorpusOps.sourceAffinity(toy).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out.size === 9)
    // diagonal: excess exactly 0, token totals exact
    Seq("A", "B", "C").foreach { s =>
      assert(out((s, s))._3 === 0.0, s"diag excess $s")
    }
    assert(out(("A", "A"))._1 === 7L && out(("B", "B"))._1 === 6L)
    // A and B share no vocabulary: each pays strictly positive excess
    // under the other's model, and more than under the blended C model
    assert(out(("A", "B"))._3 > 0 && out(("B", "A"))._3 > 0)
    assert(out(("A", "B"))._3 > out(("A", "C"))._3,
      "blended model must sit closer than the disjoint one")
    // real tables: full |sources|^2 matrix, zero diagonal everywhere
    val real = CorpusOps.sourceAffinity(docs).collect()
    val nSrc = real.map(_.getString(0)).distinct.length
    assert(real.length === nSrc * nSrc)
    real.filter(r => r.getString(0) === r.getString(1))
      .foreach(r => assert(r.getDouble(4) === 0.0))
  }

  test("labelAgreement: planted mislabel is the suspect, clean labels agree") {
    import spark.implicits._
    // two tight clusters in 4-d; vector 10 sits in cluster A but carries
    // cluster B's label — the planted noise the audit must flag
    def v(parts: Float*): Array[Float] = parts.toArray
    val a = (0 to 4).map(i => (i * 10L, v(1f, 0.01f * i, 0f, 0f), 0))
    val b = (5 to 9).map(i => (i * 10L, v(0f, 0f, 1f, 0.01f * i), 1))
    val planted = Seq((100L, v(1f, 0.02f, 0f, 0f), 1))
    val toy = (a ++ b ++ planted).toDF("vec_id", "embedding", "label")
    val out = Similarity.labelAgreement(toy, k = 4, sampleMod = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out.size === 11)
    // the planted row: all 4 nearest neighbors are cluster A → agreement 0
    assert(out(100L) === ((0.0, true)), s"${out(100L)}")
    // clean cluster-B rows keep their neighborhoods (the planted A-vector
    // is far away); their agreement is 3/4+ and never suspect
    (5 to 9).map(_ * 10L).foreach { id =>
      assert(out(id)._1 >= 0.75 && !out(id)._2, s"clean row $id: ${out(id)}")
    }
    // real tables: every sampled vector reported, agreement in [0, 1]
    val real = Similarity.labelAgreement(embs, k = 8, sampleMod = 10)
      .collect()
    assert(real.length === embs.filter(col("vec_id") % 10 === 0).count())
    real.foreach(r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
  }

  test("sourceBalance: exact margins, chi2 localizes a planted imbalance") {
    import spark.implicits._
    // src A: all short docs; src B: all long docs → maximal dependence
    val toy = ((1 to 10).map(i => (i.toLong, "A", 10L)) ++
      (11 to 20).map(i => (i.toLong, "B", 1000L)))
      .toDF("doc_id", "source", "n_chars")
    val out = CorpusOps.sourceBalance(toy, buckets = 2).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(5), r.getDouble(6)))).toMap
    assert(out.size === 4)
    // A fills bucket 0, B fills bucket 1; expected is 5 everywhere
    assert(out(("A", 0L))._1 === 10L && out(("A", 1L))._1 === 0L)
    assert(out(("B", 0L))._1 === 0L && out(("B", 1L))._1 === 10L)
    out.values.foreach { case (_, e, c) =>
      assert(e === 5.0); assert(c === 5.0) } // (10-5)^2/5 = (0-5)^2/5 = 5
    // real tables: margins reconstruct the corpus, contribs nonnegative
    val real = CorpusOps.sourceBalance(docs).collect()
    val n = docs.count()
    val bySource = real.groupBy(_.getString(0))
    bySource.values.foreach { rs =>
      assert(rs.map(_.getLong(2)).sum === rs.head.getLong(3), "row margin") }
    assert(real.map(_.getLong(2)).sum === n)
    real.foreach(r => assert(r.getDouble(6) >= 0.0))
  }

  test("kAnonymity: singleton classes flagged, populous classes clear") {
    import spark.implicits._
    // 6 docs share one quasi-identifier tuple; one doc is unique
    val toy = ((1 to 6).map(i => (i.toLong, "en", "web", 100L)) :+
      (7L, "de", "rare", 500L))
      .toDF("doc_id", "lang", "source", "n_chars")
    val out = CorpusOps.kAnonymity(toy, k = 5, buckets = 4).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(("en", "web")) === ((6L, false)))
    assert(out(("de", "rare")) === ((1L, true)), "singleton must flag")
    // real tables: class sizes partition the corpus
    val real = CorpusOps.kAnonymity(docs).collect()
    assert(real.map(_.getLong(3)).sum === docs.count())
    real.foreach(r => assert(r.getBoolean(4) === (r.getLong(3) < 5)))
  }

  test("logOddsLexicon: a source-exclusive term tops its source, shared terms don't") {
    import spark.implicits._
    val toy = Seq(
      (1L, "blockchain ledger blockchain token common word", "crypto"),
      (2L, "blockchain token ledger common", "crypto"),
      (3L, "recipe flour oven common word", "cooking"),
      (4L, "recipe recipe oven butter common", "cooking")
    ).toDF("doc_id", "text", "source")
    val out = CorpusOps.logOddsLexicon(toy, k = 3).collect()
    val top = out.filter(_.getLong(1) === 1L)
      .map(r => r.getString(0) -> r.getString(2)).toMap
    // the most-overrepresented exclusive term names each source
    assert(top("crypto") === "blockchain", s"$top")
    assert(top("cooking") === "recipe", s"$top")
    // an evenly-shared term never ranks first, and its z is below the
    // exclusive winners'
    val common = out.filter(_.getString(2) === "common")
    common.foreach(r => assert(r.getLong(1) > 1L, s"shared term at rank 1: $r"))
    // real tables: k ranks per source, z finite
    val real = CorpusOps.logOddsLexicon(docs, k = 5).collect()
    assert(real.groupBy(_.getString(0)).forall(_._2.length === 5))
    real.foreach(r => assert(!r.getDouble(5).isNaN && !r.getDouble(5).isInfinite))
  }

  test("mojibake: damaged classes flag and repair; clean accents don't") {
    import spark.implicits._
    val ta = graft.operators.TextAnalysis
    val toy = Seq(
      (1L, "plain ascii"),
      (2L, "one caf\u00C3\u00A9 here"),
      (3L, "it\u00E2\u20AC\u2122s \u00E2\u20AC\u0153ok\u00E2\u20AC\u0153"),
      (4L, "clean caf\u00E9 na\u00EFve"),
      (5L, "nb\u00C2\u00A0sp"))
      .toDF("doc_id", "text")
    val out = ta.mojibake(toy).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getBoolean(2), r.getString(3)))).toMap
    assert(out(1L) === ((0L, false, "plain ascii")))
    assert(out(2L) === ((1L, true, "one caf\u00E9 here")))
    assert(out(3L) === ((3L, true, "it\u2019s \u201Cok\u201C")))
    // correctly-encoded accents are NOT artifacts
    assert(out(4L) === ((0L, false, "clean caf\u00E9 na\u00EFve")))
    assert(out(5L) === ((1L, true, "nb sp")))
    // repair is idempotent: a second scan over repaired text is clean
    val again = ta.mojibake(ta.mojibake(toy)
      .select(col("doc_id"), col("repaired").as("text"))).collect()
    again.foreach(r => assert(r.getLong(1) === 0L, s"not idempotent: $r"))
    // fixture contract on real docs: exactly the three damaged classes
    // flag, and the clean-accent class repairs to itself
    val fixed = docs.withColumn("text",
      ta.mojibakeFixture(col("doc_id"), col("text")))
    val h = ((col("doc_id") % 2147483648L) * 2654435761L) % 2147483647L
    val scanned = ta.mojibake(fixed.withColumn("cls", h % 5)
      .select(col("doc_id"), col("cls"), col("text")))
      .join(fixed.withColumn("cls2", h % 5)
        .select(col("doc_id"), col("cls2")), "doc_id")
    import org.apache.spark.sql.functions.{count => cnt}
    val byCls = scanned.groupBy(col("cls2"))
      .agg(cnt(when(col("damaged"), 1)).as("dmg"), cnt(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    byCls.foreach { case (cls, (dmg, n)) =>
      if (cls == 1L || cls == 2L || cls == 3L)
        assert(dmg === n, s"class $cls should all flag")
      else assert(dmg === 0L, s"class $cls must not flag")
    }
  }

  test("contextAssemble: budget-feasible ranked prefix, exact accounting") {
    val out = Similarity.contextAssemble(docs, embs, nQueries = 4,
      budget = 128L).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.keySet === Set(0L, 1L, 2L, 3L))
    byQ.values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(1))
      // ranks are a contiguous prefix from 1 (greedy = maximal prefix)
      assert(sorted.map(_.getLong(1)).toSeq ===
        (1L to sorted.length).toSeq)
      // running sums account exactly and never exceed the budget
      var cum = 0L
      sorted.foreach { r =>
        cum += r.getLong(4)
        assert(r.getLong(5) === cum)
      }
      assert(cum <= 128L)
      // relevance order: cosine non-increasing down the context
      sorted.map(_.getDouble(3)).toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(a >= b); case _ => }
    }
  }

  test("mmrSelect: redundant near-copy is skipped for a diverse pick") {
    import spark.implicits._
    // candidates for query 0 (qv = e1): a (best relevance), a2 (a's
    // near-copy, second-best relevance), b (distinct direction). MMR must
    // pick a, then b — relevance-only ranking would pick a, a2.
    def v(parts: Float*): Array[Float] = parts.toArray
    val toy = Seq(
      (0L, v(1f, 0f, 0f, 0f)),        // the query
      (10L, v(0.99f, 0.1f, 0f, 0f)),  // a
      (11L, v(0.98f, 0.12f, 0f, 0f)), // a2: near-copy of a
      (12L, v(0.6f, 0f, 0.8f, 0f))    // b: distinct
    ).toDF("vec_id", "embedding")
    val out = Similarity.mmrSelect(toy, nQueries = 1, k = 2).collect()
      .sortBy(r => (r.getLong(0), r.getLong(1)))
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq ===
      Seq((1L, 10L), (2L, 12L)), s"${out.toSeq}")
    // step 1 has zero redundancy; step 2's redundancy is its sim to a
    assert(out(0).getDouble(4) === 0.0)
    assert(out(1).getDouble(4) > 0.0)
    // real tables: k distinct picks per query, no re-selection
    val real = Similarity.mmrSelect(embs, nQueries = 4, k = 3).collect()
    val byQ = real.groupBy(_.getLong(0))
    assert(byQ.size === 4)
    byQ.values.foreach { rs =>
      assert(rs.map(_.getLong(1)).sorted.toSeq === Seq(1L, 2L, 3L))
      assert(rs.map(_.getLong(2)).distinct.length === 3, "re-selected doc")
    }
  }

  test("collocations: bound phrases top the PMI list, independent pairs don't") {
    import spark.implicits._
    // "new york" always adjacent (perfectly bound); "the cat" frequent
    // but "the" pairs with everything → high c1 crushes its PMI
    val reps = (1 to 10).map(i =>
      (i.toLong, s"new york w$i the cat the dog the w$i fish"))
    val toy = reps.toDF("doc_id", "text")
    val out = CorpusOps.collocations(toy, k = 10, minCount = 5).collect()
    assert(out.head.getString(0) === "new" && out.head.getString(1) === "york",
      s"${out.toSeq}")
    val pmiOf = out.map(r => (r.getString(0), r.getString(1)) ->
      r.getDouble(5)).toMap
    pmiOf.get(("the", "cat")).foreach(p =>
      assert(p < pmiOf(("new", "york")), "independent pair must rank below"))
    // exact margins on the winner: 10 pairs, both words appear 10x
    assert(out.head.getLong(2) === 10L && out.head.getLong(3) === 10L
      && out.head.getLong(4) === 10L)
    // real corpus: all supported pairs, PMI finite, at most k rows
    val real = CorpusOps.collocations(docs).collect()
    assert(real.length <= 50)
    real.foreach { r =>
      assert(r.getLong(2) >= 5L)
      assert(!r.getDouble(5).isNaN && !r.getDouble(5).isInfinite)
    }
  }

  test("batchingWaste: sorted batching beats hashed; closed-form toy accounting") {
    import spark.implicits._
    // lengths 1..64, one shard, batch 32: sorted batches are {64..33}
    // and {32..1} → waste 32·64−Σ(33..64) = 496 and 32·32−Σ(1..32) = 496
    val toy = (1 to 64).map(i => (i.toLong, ("w " * i).trim))
      .toDF("doc_id", "text")
    val out = CorpusOps.batchingWaste(toy, batchSize = 32, nShards = 1)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("sorted") === ((2L, 2080L, 992L)), s"${out("sorted")}")
    assert(out("hashed")._2 === 2080L)
    // the whole point: hashed mixes lengths, so its waste exceeds sorted
    assert(out("hashed")._3 > out("sorted")._3)
    // real corpus, all shards: sorted strictly cheaper in aggregate
    val real = CorpusOps.batchingWaste(docs).collect()
    val byStrat = real.groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(4)).sum }
    assert(byStrat("sorted") < byStrat("hashed"),
      s"sorted must reduce padding: $byStrat")
    // token mass is strategy-invariant
    val toks = real.groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(3)).sum }
    assert(toks("sorted") === toks("hashed"))
  }

  test("sourceCentroidMap: identical sources map to 1, orthogonal to 0") {
    import spark.implicits._
    def v(parts: Float*): Array[Float] = parts.toArray
    val toyDocs = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "C"))
      .toDF("doc_id", "source")
    val toyEmb = Seq(
      (1L, v(1f, 0f, 0f, 0f)), (2L, v(1f, 0.02f, 0f, 0f)),
      (3L, v(1f, 0.01f, 0f, 0f)),  // B ≈ A's centroid direction
      (4L, v(0f, 0f, 1f, 0f))      // C orthogonal
    ).toDF("vec_id", "embedding")
    val out = Similarity.sourceCentroidMap(toyDocs, toyEmb).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    assert(out(("A", "B")) > 0.999, s"$out")
    assert(math.abs(out(("A", "C"))) < 0.05 && math.abs(out(("B", "C"))) < 0.05)
    // real tables: the full upper triangle, sims in [-1, 1]
    val real = Similarity.sourceCentroidMap(docs, embs).collect()
    val nSrc = docs.select(col("source")).distinct().count()
    assert(real.length === (nSrc * (nSrc - 1) / 2).toInt)
    real.foreach(r =>
      assert(r.getDouble(4) >= -1.0001 && r.getDouble(4) <= 1.0001))
  }

  test("memorizationRisk: verbatim boilerplate scores 1, divergent text doesn't") {
    import spark.implicits._
    // 9 docs share a verbatim sentence (every context dominant at full
    // support); doc 10 shares the contexts but diverges at each next
    // token, so its pairs never follow the dominant continuation
    val boiler = "terms of service apply to all users"
    val toy = ((1 to 9).map(i => (i.toLong, boiler)) :+
      (10L, "terms of use apply to new users always")).toDF("doc_id", "text")
    val out = CorpusOps.memorizationRisk(toy, n = 2, minCount = 8,
      topProb = 0.9).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3),
        r.getDouble(4)))).toMap
    (1 to 9).foreach { i =>
      val (nCtx, nFollow, risk) = out(i.toLong)
      assert(nCtx === 5L && nFollow === 5L && risk === 1.0, s"doc $i: ${out(i.toLong)}")
    }
    val (n10, f10, r10) = out(10L)
    assert(n10 === 6L && f10 < 2L && r10 < 0.34, s"divergent doc: ${out(10L)}")
    // real corpus: risk bounded, following ≤ predictable ≤ contexts
    val real = CorpusOps.memorizationRisk(docs).collect()
    real.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2) && r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("compressionRatio: repetition compresses, noise doesn't, exact accounting") {
    import spark.implicits._
    val toy = Seq(
      (1L, "spam " * 200),                             // pure repetition
      (2L, (1 to 200).map(i => s"w${i * 7919 % 1000}").mkString(" ")),
      (3L, ""),                                        // empty guard
      (4L, "short")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.compressionRatio(toy).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // byte accounting is exact
    assert(out(1L)._1 === 1000L && out(4L)._1 === 5L)
    // boilerplate compresses an order of magnitude harder than diverse text
    assert(out(1L)._3 < 0.05, s"repetition must crush: ${out(1L)}")
    assert(out(2L)._3 > 3 * out(1L)._3, s"diverse text must not: ${out(2L)}")
    // empty doc: defined, ratio 1 by convention
    assert(out(3L) === ((0L, out(3L)._2, 1.0)))
    // deterministic under repartition (fixed level, per-row reset)
    val r1 = TextAnalysis.compressionRatio(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val r2 = TextAnalysis.compressionRatio(docs.repartition(13)).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(r1 === r2)
    // real corpus: every ratio in (0, 1.2], none NaN
    r1.values.foreach(v => assert(v > 0.0 && v <= 1.2))
  }

  test("compressionRatio pinned-fixture contract: per-class ratio ordering, " +
      "absolute bands, and an exact independent deflate replay") {
    import spark.implicits._
    // Closed-form fixture, every byte a function of doc_id (the q99/q100
    // pattern): three compressibility classes whose ORDERING and bands
    // are pinned, so a codec / level / reset regression fails this test
    // deterministically instead of passing a rows-only check.
    //   class 0 (rep):   one token repeated — boilerplate, crushes
    //   class 1 (prose): diverse pseudo-words — the natural-text band
    //   class 2 (noise): base64 of a chained-md5 byte stream — ~6 bits
    //                    of entropy per char, deflate can't win much
    def md5Stream(seed: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      var b = seed.toString.getBytes("UTF-8")
      val acc = new java.io.ByteArrayOutputStream()
      (1 to 40).foreach { _ => b = md.digest(b); acc.write(b) }
      java.util.Base64.getEncoder.encodeToString(acc.toByteArray)
    }
    val fixture = (0L until 60L).map { id =>
      val text = (id % 3) match {
        case 0 => (s"tok${id / 3 % 5} ") * (100 + id).toInt
        case 1 => (1 to 150)
          .map(i => s"w${(id * 31 + i * 7919) % 2000}").mkString(" ")
        case _ => md5Stream(id)
      }
      (id, text)
    }
    val out = TextAnalysis.compressionRatio(fixture.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    def cls(c: Long) = out.collect { case (id, v) if id % 3 == c => v }.toSeq
    // pinned ORDERING: every rep ratio below every prose ratio below
    // every noise ratio — class separation, not just class means
    assert(cls(0).map(_._3).max < cls(1).map(_._3).min,
      "repetition must compress strictly harder than prose")
    assert(cls(1).map(_._3).max < cls(2).map(_._3).min,
      "prose must compress strictly harder than the md5 stream")
    // pinned absolute bands (generous vs measured, tight vs regressions:
    // a level-1 Deflater, a missing reset, or a broken finish loop lands
    // outside at least one band)
    assert(cls(0).forall(_._3 <= 0.10), s"rep band: ${cls(0).map(_._3)}")
    assert(cls(1).forall(v => v._3 >= 0.20 && v._3 <= 0.80),
      s"prose band: ${cls(1).map(_._3)}")
    assert(cls(2).forall(_._3 >= 0.70), s"noise band: ${cls(2).map(_._3)}")
    // exact independent replay of EVERY n_compressed: a fresh driver-side
    // Deflater at the contract level (6) must reproduce the byte counts
    // bit-for-bit (and n_bytes must equal the UTF-8 length)
    fixture.foreach { case (id, text) =>
      val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val d = new java.util.zip.Deflater(6)
      d.setInput(bytes); d.finish()
      var total = 0L
      val buf = new Array[Byte](8192)
      while (!d.finished()) total += d.deflate(buf)
      d.end()
      val (nBytes, nCompressed, _) = out(id)
      assert(nBytes === bytes.length.toLong, s"doc $id n_bytes")
      assert(nCompressed === total, s"doc $id n_compressed replay")
    }
  }

  test("normalizeText: NFC composition, invisible strip, typographic " +
      "standardization, ASCII no-op, idempotence") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "caf" + "e\u0301" + " au lait"),   // combining acute
      (2L, "a\u200Bb\u200Cc\u200Dd\uFEFFe\u00ADf"), // invisibles
      (3L, "\u201Cq\u201D \u2018x\u2019 a\u2013b\u2014c"), // quotes/dashes
      (4L, "plain ascii text stays put"))
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.normalizeText(fixture).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) === (("caf\u00e9 au lait", true, 13L, 12L)),
      "NFC composes e + U+0301 into é")
    assert(out(2L) === (("abcdef", true, 11L, 6L)),
      "all five invisible classes stripped")
    assert(out(3L) === (("\"q\" 'x' a-b-c", true, 13L, 13L)))
    assert(out(4L) === (("plain ascii text stays put", false, 26L, 26L)))
    // idempotence: normalize(normalize(x)) == normalize(x)
    val again = graft.operators.TextAnalysis.normalizeText(
      graft.operators.TextAnalysis.normalizeText(fixture)
        .select(col("doc_id"), col("text_clean").as("text")))
    assert(again.filter(col("changed")).count() === 0L)
    // the native expression keeps its isNormalized fast path honest
    val direct = graft.functions.TextHashFunctions
      .nfcNormalize(spark, lit("already normal"))
    assert(fixture.select(direct).head().getString(0) === "already normal")
  }

  test("bitextMine: translation pairs clear the margin, hub vectors don't") {
    import spark.implicits._
    // e1↔f1 and e2↔f2 are near-identical (translations); e3 is a hub
    // moderately close to EVERY foreign doc, so its best link is not
    // stronger than its neighborhood average and the margin rejects it
    val toyDocs = Seq((1L, "en"), (2L, "en"), (3L, "en"),
      (11L, "de"), (12L, "fr"), (13L, "es"), (14L, "zh"))
      .toDF("doc_id", "lang")
    def v(parts: Float*): Array[Float] = parts.toArray
    val toyEmb = Seq(
      (1L, v(1f, 0f, 0f, 0f)), (2L, v(0f, 1f, 0f, 0f)),
      (3L, v(0.5f, 0.5f, 0.5f, 0.5f)),
      (11L, v(0.99f, 0.1f, 0f, 0f)), (12L, v(0.1f, 0.99f, 0f, 0f)),
      (13L, v(0f, 0f, 1f, 0.1f)), (14L, v(0f, 0f, 0.1f, 1f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.bitextMine(toyDocs, toyEmb, "en", k = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(3))))
      .toMap
    assert(out(1L)._1 === 11L && out(2L)._1 === 12L, s"$out")
    assert(!out.contains(3L), s"hub must fail the margin test: $out")
    // margins of accepted pairs are ≥ 1 by construction of the filter
    out.values.foreach { case (_, m) => assert(m >= 1.0, s"margin $m") }
    // real tables: deterministic under repartition
    val r1 = Similarity.bitextMine(docs, embs, "en", 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val r2 = Similarity.bitextMine(docs.repartition(7), embs.repartition(5),
      "en", 4).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(r1 === r2)
  }

  test("scoreSweep: monotone selection, exact endpoints vs the gate") {
    val out = CorpusOps.scoreSweep(docs).collect()
      .map(r => r.getDouble(0) -> r).sortBy(_._1)
    // threshold 0.0 selects everything: frac 1, recall 1
    val t0 = out.head._2
    assert(t0.getDouble(3) === 1.0 && t0.getDouble(5) === 1.0, s"$t0")
    // selection and recall shrink monotonically as the threshold rises
    out.map(_._2).sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(1) >= b.getLong(1), "n_selected monotone")
      assert(a.getLong(2) >= b.getLong(2), "sel_tokens monotone")
      assert(a.getDouble(5) >= b.getDouble(5), "recall monotone")
    }
  }

  test("entropyPanel: hand-quantized entropies, clamps, corpus sanity") {
    import spark.implicits._
    val toy = Seq(
      (1L, "x x x x", "det"),      // one type → H1 = 0, redundancy null
      (2L, "x y x y", "alt"))      // H1 = ln2; tiny-sample H2 < H1
      .toDF("doc_id", "text", "source")
    val out = CorpusOps.entropyPanel(toy).collect()
      .map(r => r.getString(0) -> r).toMap
    val det = out("det")
    assert(det.getLong(1) === 4L && det.getLong(2) === 1L)
    assert(det.getDouble(3) === 0.0 && det.isNullAt(6))
    val alt = out("alt")
    // quantized by hand: l6(2/4) = −693148 → H1 = 693148 µnats;
    // bigrams {xy:2, yx:1}: 2·(−405466)+1·(−1098613) → H2 = 636515
    assert(alt.getDouble(3) === 0.693148)
    assert(alt.getDouble(4) === 0.636515)
    assert(alt.getDouble(5) === -0.056633, "raw h_cond is unclamped")
    // clamped redundancy: negative h_cond reads as fully redundant
    assert(alt.getDouble(6) === 1.0)
    // real corpus: H2 ≥ H1 (positive h_cond), redundancy ∈ [0, 1]
    val real = CorpusOps.entropyPanel(docs).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      assert(r.getDouble(4) >= r.getDouble(3), s"H2 < H1 on ${r.getString(0)}")
      assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= 1.0)
    }
  }

  test("readability: exact counts, bands at the classic thresholds") {
    import spark.implicits._
    val ta = graft.operators.TextAnalysis
    val toy = Seq(
      // 4 words, 1 sentence-terminator run, syllables 1+1+1+1 = 4:
      // wps=4, spw=1 → flesch = 206.835 − 4.06 − 84.6 = 118.175 → easy
      (1L, "a be go my."),
      // no terminator → clamps to 1 sentence; "xyzzy" has 2 y-runs
      (2L, "xyzzy"),
      // long single sentence drags the score down to difficult
      (3L, Seq.fill(100)("strength").mkString(" ")))
      .toDF("doc_id", "text")
    val out = ta.readability(toy).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(6), r.getString(7)))).toMap
    assert(out(1L) === ((4L, 1L, 4L, 118.175, "easy")))
    assert(out(2L)._2 === 1L && out(2L)._3 === 2L)
    // 100 words / 1 sentence: −1.015·100 dominates
    assert(out(3L)._1 === 100L && out(3L)._5 === "difficult")
    assert(out(3L)._4 < 50.0)
    // sentence fixture: every 12th token gains a period; the trailing
    // partial sentence has no terminator, so for n ≥ 24 words wps =
    // n/⌊n/12⌋ ∈ [12, 12·(1+11/24)] ≈ [12, 17.5]
    val fixed = ta.readability(
      docs.withColumn("text", ta.sentenceFixture(col("text"))))
    fixed.filter(col("n_words") >= 24).collect().foreach { r =>
      val wps = r.getDouble(4)
      assert(wps >= 12.0 && wps <= 17.5, s"wps $wps for ${r.getLong(0)}")
    }
  }

  test("unsafeGate: policy thresholds, whole-token matching, audit order") {
    import spark.implicits._
    val ta = graft.operators.TextAnalysis
    val toy = Seq(
      (1L, "a clean doc"),
      (2L, "one rifle here"),                // zero-tolerance: flags at 1
      (3L, "casino night"),                  // repeat-class single: keeps
      (4L, "casino then poker again"),       // repeat-class double: flags
      (5L, "Damn HELL"),                     // case-insensitive repeat
      (6L, "the rifleman ammunition"),       // substrings must NOT hit
      (7L, "rifle damn damn"))               // multi-category, fixed order
      .toDF("doc_id", "text")
    val out = ta.unsafeGate(toy).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3), r.getLong(4),
        r.getString(5), r.getBoolean(6)))).toMap
    assert(out(1L) === ((0L, 0L, 0L, "", true)))
    assert(out(2L) === ((1L, 0L, 0L, "weapons", false)))
    assert(out(3L) === ((0L, 1L, 0L, "", true)))
    assert(out(4L) === ((0L, 2L, 0L, "gambling", false)))
    assert(out(5L) === ((0L, 0L, 2L, "profanity", false)))
    assert(out(6L) === ((0L, 0L, 0L, "", true)), "no substring hits")
    assert(out(7L) === ((1L, 0L, 2L, "weapons,profanity", false)))
    // fixture contract on real docs: class 3 (single repeat-class term)
    // and classes 0/5 keep; classes 1/2/4 flag
    val h = ((col("doc_id") % 2147483648L) * 2654435761L) % 2147483647L
    val real = ta.unsafeGate(docs.withColumn("text",
        ta.unsafeFixture(col("doc_id"), col("text"))))
      .join(docs.select(col("doc_id"), (h % 6).as("cls")), "doc_id")
    val byCls = real.groupBy(col("cls"))
      .agg(count(when(!col("keep"), 1)).as("flagged"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    byCls.foreach { case (cls, (flagged, n)) =>
      if (cls == 1L || cls == 2L || cls == 4L)
        assert(flagged === n, s"class $cls must all flag")
      else assert(flagged === 0L, s"class $cls must keep")
    }
  }

  test("goodTuring: hand-computed N_r, r*, p0; truncation at missing r+1") {
    import spark.implicits._
    // bigram counts: "a a"=3, "d d"=2, "a d"=1, "d b"=1 (doc 2 is a
    // single word → no bigrams) → N1=2, N2=1, N3=1, N=7
    val toy = Seq((1L, "a a a a d d d b"), (2L, "c")).toDF("doc_id", "text")
    val out = CorpusOps.goodTuring(toy).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(out(1L) === ((2L, 1L, 1.0, 0.285714)))   // r* = 2·1/2
    assert(out(2L) === ((1L, 1L, 3.0, 0.285714)))   // r* = 3·1/1
    assert(out(3L) === ((1L, 0L, 0.0, 0.285714)))   // N4 = 0 → truncated
    assert(out.size === 3)
    // real corpus: the GT identity Σ_{r≤maxR} r·N_r ≤ N over bigrams,
    // p0 ∈ (0,1), and the low-count regime is actually populated
    val real = CorpusOps.goodTuring(docs).collect()
    assert(real.nonEmpty, "bigram table must keep N_1..N_10 populated")
    val n = docs.select(explode(graft.operators.TextAnalysis.wordNgrams(
        graft.operators.TextAnalysis.wsTokens(col("text")), 2)))
      .count()
    assert(real.map(r => r.getLong(0) * r.getLong(1)).sum <= n)
    real.foreach { r =>
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) < 1.0)
      assert(r.getLong(0) >= 1L && r.getLong(0) <= 10L)
    }
  }

  test("heapsFit: exact checkpoint accounting, sublinear beta bounds") {
    import spark.implicits._
    // doc i = "a b w<i> x<i>": 4 tokens, 2 shared + 2 new per doc →
    // N_c = 4c, V_c = 2 + 2c at thresholds c = 1..10 (max id 10)
    val toy = (1 to 10).map(i => (i.toLong, s"a b w$i x$i"))
      .toDF("doc_id", "text")
    val out = CorpusOps.heapsFit(toy).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(6)))).toMap
    assert(out.size === 10)
    (1 to 10).foreach { c =>
      val (thresh, nTok, nTyp, _, _) = out(c.toLong)
      assert(thresh === c.toLong)
      assert(nTok === 4L * c, s"checkpoint $c tokens")
      assert(nTyp === 2L + 2L * c, s"checkpoint $c types")
    }
    // V = N/2 + 2: the +2 flattens the low-N end of the log-log line —
    // analytic slope (ln22−ln4)/(ln40−ln4) ≈ 0.74
    val (_, _, _, beta, r2) = out(5L)
    assert(beta > 0.7 && beta <= 0.8, s"beta $beta")
    assert(r2 > 0.98, s"r2 $r2")
    // real corpus: growth curve is monotone, beta in the sane band
    val real = CorpusOps.heapsFit(docs).collect().sortBy(_.getLong(0))
    assert(real.length === 10)
    real.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(2) <= b.getLong(2) && a.getLong(3) <= b.getLong(3))
    }
    // a saturated vocab (flat n_types) legitimately yields NULL slope
    if (!real.head.isNullAt(4)) {
      val rb = real.head.getDouble(4)
      assert(rb >= 0.0 && rb <= 1.1, s"real beta $rb")
    } else assert(real.map(_.getLong(3)).distinct.length === 1,
      "null beta is only legal when the growth curve is flat")
  }

  test("zipfFit: synthetic Zipf corpus recovers slope -1, real corpus is zipfian") {
    import spark.implicits._
    // token t_r appears round(1000/r) times: an exact Zipf distribution
    val words = (1 to 50).flatMap(r =>
      Seq.fill(math.round(1000.0 / r).toInt)(s"w$r"))
    val toy = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val fit = CorpusOps.zipfFit(toy, topN = 50).collect().head
    assert(fit.getLong(0) === 50L && fit.getLong(1) === 50L)
    val (slope, r2) = (fit.getDouble(3), fit.getDouble(5))
    assert(slope > -1.05 && slope < -0.95, s"slope $slope")
    assert(r2 > 0.99, s"r2 $r2")
    // the driver fixture is near-UNIFORM random text, so the health check
    // should correctly flag it as non-Zipfian: shallow slope, poor fit —
    // exactly the signal the operator exists to surface
    val real = CorpusOps.zipfFit(docs).collect().head
    assert(real.getDouble(3) <= 0, s"real slope ${real.getDouble(3)}")
    assert(real.getDouble(3) > -0.5, s"uniform text must fit shallow")
    assert(real.getDouble(5) >= 0.0 && real.getDouble(5) < 0.5,
      s"uniform text must fit poorly: r2 ${real.getDouble(5)}")
    assert(real.getLong(0) <= 1000L && real.getLong(1) >= real.getLong(0))
  }

  test("shardMix: perfectly mixed shards read mixed, a correlated key " +
      "reads skewed with top_share 1, absent cells count") {
    import spark.implicits._
    // 2 sources x 40 docs; shard A = id div 40 (every shard sees both
    // sources evenly), shard B = id%2 == the source index (total
    // correlation)
    val docs = (0L until 80L).map(i => (i, s"s${i % 2}"))
      .toDF("doc_id", "src")
    val mixed = CorpusOps.shardMix(
      docs.withColumn("shard", expr("doc_id div 40")), "shard", "src")
      .collect()
    assert(mixed.forall(_.getAs[String]("verdict") === "mixed"))
    assert(mixed.forall(_.getAs[Double]("tv") === 0.0))
    val skew = CorpusOps.shardMix(
      docs.withColumn("shard", (col("doc_id") % 2).cast("long")),
      "shard", "src").collect() // shard == src index: fully correlated
    // doc_id%2 IS the source here, so each shard holds one source:
    // tv = |1 - 0.5| /? -> shares p=(1e6,0), q=(5e5,5e5): tv = 0.5
    assert(skew.forall(r => r.getAs[Double]("tv") === 0.5
      && r.getAs[String]("verdict") === "skewed"
      && r.getAs[Double]("top_share") === 1.0
      && r.getAs[Long]("n_groups") === 1L))
  }

  test("shardMix mixed case is genuinely balanced (distinct schemes differ)") {
    import spark.implicits._
    // 4 sources, shard = id div 4 groups ids 0-3,4-7,... each shard
    // sees all four sources once -> tv 0
    val docs = (0L until 16L).map(i => (i, s"s${i % 4}"))
      .toDF("doc_id", "src")
    val out = CorpusOps.shardMix(
      docs.withColumn("shard", expr("doc_id div 4")), "shard", "src")
      .collect()
    assert(out.length === 4)
    assert(out.forall(r => r.getAs[Double]("tv") === 0.0
      && r.getAs[Long]("n_groups") === 4L))
  }

  test("paddingWaste: hand-counted buckets, truncation cap, naive vs " +
      "bucketed totals") {
    import spark.implicits._
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, words(10)),   // bucket 16, pad 6 (naive 118)
      (2L, words(16)),   // bucket 16, pad 0 (naive 112)
      (3L, words(40)),   // bucket 64, pad 24 (naive 88)
      (4L, words(200)))  // truncated to 128, bucket 128, pad 0
      .toDF("doc_id", "text")
    val out = CorpusOps.paddingWaste(docs, seqLen = 128).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(out(16L) === ((2L, 26L, 6L, 230L)))
    assert(out(64L) === ((1L, 40L, 24L, 88L)))
    assert(out(128L) === ((1L, 128L, 0L, 0L)))
    assert(out.size === 3)
    // waste fractions: bucketed strictly <= naive everywhere
    val fr = CorpusOps.paddingWaste(docs, seqLen = 128)
      .select("waste", "waste_naive").collect()
    assert(fr.forall(r => r.getDouble(0) <= r.getDouble(1)))
  }

  test("silhouetteSimplified: k matching the planted structure wins, " +
      "bounds hold, degenerate duplicates give exactly 0") {
    import spark.implicits._
    // two well-separated 2-D blobs: k = 2 must clearly beat k = 4
    val blobs = (
      Seq((0.0, 0.0), (0.0, 1.0), (1.0, 0.0), (1.0, 1.0))
        .zipWithIndex.map { case ((x, y), i) =>
          (i.toLong, Array(x.toFloat, y.toFloat)) } ++
      Seq((10.0, 10.0), (10.0, 11.0), (11.0, 10.0), (11.0, 11.0))
        .zipWithIndex.map { case ((x, y), i) =>
          ((i + 4).toLong, Array(x.toFloat, y.toFloat)) })
      .toDF("vec_id", "embedding")
    val out = Similarity.silhouetteSimplified(blobs, ks = Seq(2, 4),
        iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(2) > 0.8, s"separated blobs at the true k: ${out(2)}")
    assert(out(2) > out(4), s"true k must win the sweep: $out")
    assert(out.values.forall(s => s >= -1.0 && s <= 1.0))
    // all-identical vectors: every distance 0 -> the degenerate guard
    val same = (1L to 6L).map(i => (i, Array(1.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val deg = Similarity.silhouetteSimplified(same, ks = Seq(2), iters = 1)
      .collect().head
    assert(deg.getDouble(2) === 0.0)
  }

  test("chao1: hand f1/f2 correction, bias-corrected f2=0 branch, " +
      "saturated corpus estimates its own size") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a b c", "s1"),     // a:2 b:1 c:1 -> D 3, f1 2, f2 1
      (2L, "x y", "s2"),         // D 2, f1 2, f2 0 -> corrected branch
      (3L, "k k k k", "s3"))     // no singletons: chao1 = D
      .toDF("doc_id", "text", "source")
    val out = CorpusOps.chao1(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    // s1: chao1 = 3 + 2*2 div 2 = 5; coverage (4-2)/4 = 0.5
    assert(out("s1") === ((4L, 3L, 2L, 1L, 5L, 0.5)))
    // s2: f2 = 0 -> 2 + 2*1 div 2 = 3; coverage 0
    assert(out("s2") === ((2L, 2L, 2L, 0L, 3L, 0.0)))
    // s3: f1 = 0 -> estimate equals observed; coverage 1
    assert(out("s3") === ((4L, 1L, 0L, 0L, 1L, 1.0)))
  }

  test("centroidDrift: hand cosine vs global, single-label identity, " +
      "zero-norm NULL, scale invariance of the sum trick") {
    import spark.implicits._
    // A: two copies of (1,0); B: one (0,1). global sums = (2e6, 1e6)
    // cos(A) = 2/sqrt(5) -> 894427 floored; cos(B) = 1/sqrt(5) -> 447213
    val df = Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(1.0f, 0.0f), 0),
      (3L, Seq(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.centroidDrift(df).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(out(0).getLong(1) === 2L)
    assert(out(0).getDouble(2) === 0.894427 && out(0).getBoolean(3))
    assert(out(1).getDouble(2) === 0.447213 && out(1).getBoolean(3))
    // single label IS the corpus: cosine exactly 1, not drifted
    val solo = Seq((1L, Seq(0.25f, -0.5f), 7), (2L, Seq(0.5f, 0.125f), 7))
      .toDF("vec_id", "embedding", "label")
    val s = Similarity.centroidDrift(solo).collect().head
    assert(s.getDouble(2) === 1.0 && !s.getBoolean(3))
    // zero-norm label: undefined cosine -> NULLs, not a crash
    val z = Seq((1L, Seq(0.0f, 0.0f), 3), (2L, Seq(1.0f, 1.0f), 4))
      .toDF("vec_id", "embedding", "label")
    val zr = Similarity.centroidDrift(z).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(zr(3).isNullAt(2) && zr(3).isNullAt(3))
    // cosine is scale-invariant, so the sum-instead-of-mean trick is
    // exact: halving every vector (dyadic values, so quantization is
    // lossless) reproduces the report bit for bit
    def fix(s: Float) = Seq(
      (1L, Seq(0.5f * s, 0.75f * s), 0), (2L, Seq(0.25f * s, 0.5f * s), 0),
      (5L, Seq(-0.75f * s, 0.25f * s), 1))
      .toDF("vec_id", "embedding", "label")
    val full = Similarity.centroidDrift(fix(1.0f)).collect().toSeq
    val half = Similarity.centroidDrift(fix(0.5f)).collect().toSeq
    assert(full === half, "scaled corpus must report identical cosines")
  }
}
