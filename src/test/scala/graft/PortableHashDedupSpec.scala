package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The q101/q102 portable-hash dedup twins, checked against an
  * INDEPENDENT JVM reimplementation (MessageDigest md5 + BigInt/Long
  * arithmetic — no Spark expressions): the point of the portable family
  * is that any engine reproduces it bit-for-bit, so the spec plays the
  * role of a third engine next to Spark and the DuckDB oracle.
  */
class PortableHashDedupSpec extends SparkSpec {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private def base32(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16)

  private def base60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)

  test("portableHash32 expression equals the JVM md5-prefix value") {
    import spark.implicits._
    val vals = Seq("hello world", "", "a b c", "κόσμε utf8")
    val got = vals.toDF("s")
      .select(Dedup.portableHash32(col("s")).as("h"))
      .as[Long].collect().toSeq
    assert(got === vals.map(base32))
  }

  test("simhashPortable matches an independent per-token vote replay") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different words entirely"),
      (4L, "single"),
      (5L, "  padded   spacing   tokens  ")).toDF("doc_id", "text")

    def expected(text: String): Long = {
      val toks = text.split(" ").filter(_.nonEmpty)
      (0 until 60).map { j =>
        val vote = toks.map(t => if ((base60(t) & (1L << j)) != 0) 1 else -1).sum
        if (vote > 0) 1L << j else 0L
      }.sum
    }

    val got = Dedup.simhashPortable(docs).orderBy("doc_id")
      .as[(Long, Long)].collect().toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 5L))
    Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      3L -> "completely different words entirely",
      4L -> "single",
      5L -> "  padded   spacing   tokens  ").foreach { case (id, text) =>
      assert(got(id) === expected(text), s"doc $id")
    }
    // identical text → identical signature
    assert(got(1L) === got(2L))
  }

  test("minhashLshPairsPortable finds exact near-dups and verifies candidates") {
    import spark.implicits._
    val dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val dupShift = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    val docs = Seq(
      (1L, dup), (2L, dup),                 // exact dup pair: J = 1.0
      (3L, dupShift),                        // near dup of 1/2 (J = 7/9 < 0.8)
      (4L, "totally unrelated words one"),
      (5L, "other disjoint content two")).toDF("doc_id", "text")

    val pairs = Dedup.minhashLshPairsPortable(docs, n = 3, k = 16, bands = 4,
      threshold = 0.8).as[(Long, Long, Double)].collect()

    // the J=1.0 pair must be found (identical signatures collide in every
    // band); sub-threshold and disjoint pairs must never be reported
    // (verification step), regardless of LSH luck
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0))
    assert(pairs.forall(_._3 >= 0.8))
    assert(!pairs.exists(p => Set(p._1, p._2).intersect(Set(4L, 5L)).nonEmpty))
  }

  test("affine row hashes and band fold are overflow-free BIGINT arithmetic") {
    // max products the pipeline can form, checked against the doc-comment
    // claim (exact in 64-bit): base < 2^32, a_max = 35, fold acc < P
    val maxBase = (1L << 32) - 1
    val aMax = 2L * 15 + 3
    assert(maxBase * aMax + 7919L * 15 + 1 > 0, "no Long overflow")
    assert((Dedup.PortableP - 1) * 31 + (Dedup.PortableP - 1) > 0)
  }

  test("editVerifiedNearDups separates in-place edits from reorderings") {
    import spark.implicits._
    // base: 60 deterministic tokens, md5-derived so distinct tokens share
    // few characters (a toy "tokNN" vocabulary lets the DP find cheap
    // cross-alignments and inflates reordering similarity)
    val toks = (0 until 60).map(i => md5hex("tok" + i).take(8))
    val base = toks.mkString(" ")
    // one token edited in place: shingle Jaccard dips (3 of 58 shingles
    // shredded) but the CHARACTERS barely move -> gold says duplicate
    val edited = toks.updated(30, "EDITED").mkString(" ")
    // halves swapped: almost every shingle survives (high Jaccard, LSH
    // candidate for sure) but half the characters moved -> gold says NOT
    val swapped = (toks.drop(30) ++ toks.take(30)).mkString(" ")
    val docs = Seq((0L, base), (1L, edited), (2L, swapped))
      .toDF("doc_id", "text")

    val out = Dedup.editVerifiedNearDups(docs, minEditSim = 0.8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(4))).toMap
    assert(out.contains((0L, 1L)), "in-place edit must survive the gate")
    assert(out((0L, 1L)) >= 0.95, s"tiny edit, near-1 similarity: $out")
    assert(!out.contains((0L, 2L)),
      "reordering shares shingles but fails the edit gate")

    // and the sketch alone would have admitted the reordering: the pair
    // IS an LSH candidate with high Jaccard (the disagreement q110 exists
    // to resolve)
    val sketchOnly = Dedup.minhashLshPairsPortable(docs, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sketchOnly.contains((0L, 2L)),
      "reordered doc should be a high-Jaccard sketch pair")
  }
}
