package graft

import org.apache.spark.sql.functions._
import graft.functions.TextHashFunctions
import graft.operators.{Dedup, TextAnalysis}

/** Parity proofs for the native text-hash expressions: bit-identical to
  * the expression-composed formulations they replace.
  */
class TextHashesSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, sf)

  test("ShingleHashes equals the composed xxhash64 formulation") {
    for (n <- Seq(3, 8)) {
      val hw = transform(TextAnalysis.wsTokens(col("text")), t => xxhash64(t))
      val grams = when(size(col("hw")) >= n,
          transform(sequence(lit(1), size(col("hw")) - (n - 1)),
            i => xxhash64((0 until n).map(j => element_at(col("hw"), i + j)): _*)))
        .otherwise(array(xxhash64(col("hw"))))
      val composed = docs.select(col("doc_id"), hw.as("hw"))
        .select(col("doc_id"), array_sort(array_distinct(grams)).as("sh"))
        .orderBy("doc_id").as[(Long, Seq[Long])].collect()
      val native = Dedup.shingleArrays(docs, n)
        .orderBy("doc_id").as[(Long, Seq[Long])].collect()
      assert(native.toSeq === composed.toSeq, s"n=$n")
    }
  }

  test("ShingleHashes edge cases: short, empty, multi-space documents") {
    val df = Seq((1L, "one two"), (2L, ""), (3L, "  a   b  c  "),
      (4L, "a b c d")).toDF("doc_id", "text")
    val out = Dedup.shingleArrays(df, 3).orderBy("doc_id")
      .as[(Long, Seq[Long])].collect().toMap
    assert(out(1L).length === 1) // < n tokens -> one whole-doc shingle
    assert(out(2L) === Seq(42L)) // zero tokens -> fold seed only
    assert(out(3L).length === 1) // "a b c" one trigram
    assert(out(4L).length === 2) // two trigrams
    // same token sequence hashes identically regardless of extra spaces
    val canon = Dedup.shingleArrays(
      Seq((9L, "a b c")).toDF("doc_id", "text"), 3)
      .as[(Long, Seq[Long])].collect().head._2
    assert(out(3L) === canon)
  }

  test("SimHash64 equals the exploded bit-vote formulation") {
    val toks = docs.select(col("doc_id"),
        explode(TextAnalysis.wsTokens(col("text"))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$i")
    }
    val agg = toks.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val hashExpr = (0 until 64).map { i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)
    val composed = agg.select(col("doc_id"), hashExpr.as("simhash"))
      .orderBy("doc_id").as[(Long, Long)].collect()
    val native = Dedup.simhash(docs).orderBy("doc_id")
      .as[(Long, Long)].collect()
    assert(native.toSeq === composed.toSeq)
  }

  test("functions are callable from the SQL surface once registered") {
    Graft.registerFunctions(spark)
    val r = spark.sql(
      "SELECT size(shingle_hashes('a b c d', 3)) AS n_sh, " +
        "simhash64('a b c') AS sh, cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS cs")
      .collect().head
    assert(r.getInt(0) === 2)
    assert(r.getLong(1) === graft.functions.TextHashOps.simHash64(
      org.apache.spark.unsafe.types.UTF8String.fromString("a b c")))
    assert(r.getDouble(2) === 1.0)
  }

  test("native expressions stay inside whole-stage codegen") {
    val plan = docs.select(
        TextHashFunctions.shingleHashes(spark, col("text"), 3),
        TextHashFunctions.simHash64(spark, col("text")))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators fused into WholeStageCodegen stage n
    assert(plan.contains("*(1) Project [shingle_hashes"), plan)
  }

  test("ByteHistogram: exact bins, codegen fusion, and the q210 pair contract") {
    // histogram vs hand-count over a literal payload (0x00 01 01 ff ff ff)
    val hist = Seq(Tuple1("000101ffffff")).toDF("hx")
      .select(TextHashFunctions.byteHistogram(spark, unhex(col("hx")))
        .as("h"))
      .as[Seq[Long]].collect().head
    assert(hist.length === 256)
    assert(hist(0) === 1L && hist(1) === 2L && hist(255) === 3L)
    assert(hist.sum === 6L)
    // stays inside whole-stage codegen like the text kernels (the q210
    // FIXTURE's higher-order hex builder legitimately doesn't fuse; the
    // kernel itself must)
    val plan = docs.select(TextHashFunctions.byteHistogram(spark,
        unhex(lpad(hex(col("doc_id")), 16, "0"))))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [byte_histogram"), plan)
    // q210 contract: pairs only within a family (same 8-byte prefix),
    // ordered a<b, cos² >= threshold, and mutated-but-same-family docs
    // DO pair (near-dup, not exact-dup)
    val out = graft.operators.Multimodal.binaryNearDup(spark, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3))
    assert(out.nonEmpty)
    val nFam = math.max(25L, docs.count() / 20L)
    val h = (i: Long) => ((i % 2147483648L) * 2654435761L) % 2147483647L
    out.foreach { case ((a, b), c) =>
      assert(a < b)
      assert(h(a) % nFam === h(b) % nFam, s"cross-family pair ($a,$b)")
      assert(c >= 0.9 && c <= 1.0)
    }
    assert(out.exists(_._2 < 1.0), "mutations must yield sub-1.0 near-dups")
  }

  test("prefix-filtered Jaccard equals brute force, including J==t boundaries") {
    // planted cases: identical pair, exact-0.8 pair (5-shingle superset of
    // a 4-shingle doc: J = 4/5), disjoint docs, sub-n-gram short docs
    val df = Seq(
      (1L, "a b c d e f g"),        // 5 trigrams
      (2L, "a b c d e f"),          // 4 trigrams, all shared with 1 -> J=0.8
      (3L, "a b c d e f g"),        // identical to 1 -> J=1.0
      (4L, "x y z w v u t s"),      // disjoint
      (5L, "p q"),                  // short doc: single whole-doc shingle
      (6L, "p q")                   // identical short doc -> J=1.0
    ).toDF("doc_id", "text")
    for (t <- Seq(0.5, 0.8, 1.0)) {
      val arrays = Dedup.shingleArrays(df, 3)
      val brute = arrays.as("a").crossJoin(arrays.as("b"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .withColumn("common", size(array_intersect(col("a.sh"), col("b.sh"))))
        .withColumn("j", col("common").cast("double") /
          (size(col("a.sh")) + size(col("b.sh")) - col("common")))
        .filter(col("j") >= t)
        .select(col("a.doc_id"), col("b.doc_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val pref = Dedup.ngramJaccardPairs(df, 3, t)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pref === brute, s"threshold $t")
    }
    // sanity on the planted expectations at t=0.8
    val out = Dedup.ngramJaccardPairs(df, 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out.keySet === Set((1L, 2L), (1L, 3L), (2L, 3L), (5L, 6L)))
    assert(out((1L, 2L)) === 0.8)
    assert(out((1L, 3L)) === 1.0)
  }

  test("containmentPairs: asymmetry, brute-force equality, Jaccard blindspot") {
    val toy = Seq(
      (1L, "a b c d e f"),                       // 4 trigrams
      // doc 1 embedded verbatim inside a much longer doc: C(1→2) = 1.0
      (2L, "a b c d e f g h i j k l m n o p"),   // 14 trigrams
      (3L, "x y z w v"),                         // unrelated
      (4L, "a b c d e f")                        // identical to 1
    ).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(toy, 3, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(out((1L, 2L)) === 1.0, "embedded doc is contained")
    assert(!out.contains((2L, 1L)), "container is NOT contained (4/14)")
    assert(out((1L, 4L)) === 1.0 && out((4L, 1L)) === 1.0)
    assert(out((4L, 2L)) === 1.0)
    assert(out.keys.forall { case (a, b) => a != b && !Set(a, b)(3L) })
    // the symmetric view misses the embedding: J(1,2) = 4/14 << 0.8
    val j = Dedup.ngramJaccardPairs(toy, 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!j((1L, 2L)), "Jaccard is blind to the embedded pair")
    // prefix-filtered result equals the brute-force ordered-pair scan
    // on a real corpus slice
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001").limit(150)
    val arrays = Dedup.shingleArrays(corpus, 3)
    val brute = arrays.as("a").crossJoin(arrays.as("b"))
      .filter(col("a.doc_id") =!= col("b.doc_id"))
      .withColumn("common",
        size(array_intersect(col("a.sh"), col("b.sh"))))
      .withColumn("c", graft.operators.TextAnalysis.quant4(
        col("common").cast("double") / size(col("a.sh"))))
      .filter(col("c") >= 0.9)
      .select(col("a.doc_id"), col("b.doc_id"), col("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val pref = Dedup.containmentPairs(corpus, 3, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(pref === brute)
  }

  test("df-ordered prefixes: identical pairs+scores, on toy docs and real corpus") {
    val toy = Seq(
      (1L, "a b c d e f g"), (2L, "a b c d e f"), (3L, "a b c d e f g"),
      (4L, "x y z w v u t s"), (5L, "p q"), (6L, "p q")).toDF("doc_id", "text")
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001").limit(150)
    for ((df, n, t) <- Seq((toy, 3, 0.8), (corpus, 3, 0.8))) {
      val plain = Dedup.ngramJaccardPairs(df, n, t)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val dfo = Dedup.ngramJaccardPairs(df, n, t, dfOrderedPrefixes = true)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(dfo === plain)
    }
  }
}
