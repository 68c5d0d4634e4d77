package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Winnowing fingerprints (q161): the MOSS guarantee (shared substrings of
  * ≥ k+w−1 words always share a fingerprint), equality against an
  * independent driver-side reference implementation (including the
  * rightmost-min tie rule), and the df-cap's boilerplate suppression.
  */
class WinnowSpec extends SparkSpec {

  import spark.implicits._

  /** Independent reference: same definition, plain Scala. */
  private def reference(text: String, k: Int, w: Int): Set[(Int, Long)] = {
    val toks = text.split(" ").filter(_.nonEmpty)
    if (toks.isEmpty) return Set.empty
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16)
    }
    val hs =
      if (toks.length >= k)
        (0 to toks.length - k).map(i => h32(toks.slice(i, i + k).mkString(" ")))
      else Seq(h32(toks.mkString(" ")))
    val starts = if (hs.length >= w) 0 to hs.length - w else Seq(0)
    starts.map { j =>
      val win = hs.slice(j, j + math.min(w, hs.length))
      val mn = win.min
      val sel = j + win.lastIndexOf(mn) // rightmost tie
      (sel, hs(sel))
    }.toSet
  }

  private val prose = ("the quick brown fox jumps over a lazy dog while " +
    "seventeen small green turtles watch from the river bank in silence " +
    "and a cold wind moves through the tall dry grass near the old mill").trim

  test("engine fingerprints equal the independent reference implementation") {
    val docs = Seq(
      1L -> prose,
      2L -> prose.split(" ").reverse.mkString(" "),
      3L -> "short text only",
      4L -> prose.split(" ").take(7).mkString(" "), // fewer grams than w
      5L -> ("x " * 40).trim // maximal hash ties: every gram identical
    ).toDF("doc_id", "text")
    val got = Dedup.winnowFingerprints(docs, k = 5, w = 4).collect()
      .map(r => (r.getLong(0), (r.getLong(1).toInt, r.getLong(2))))
      // pos is cast to long in the operator; fp is the 8-hex-digit md5 long
      .groupBy(_._1).map { case (k2, v) => k2 -> v.map(_._2).toSet }
    for ((id, text) <- Seq(1L -> prose,
        2L -> prose.split(" ").reverse.mkString(" "),
        3L -> "short text only",
        4L -> prose.split(" ").take(7).mkString(" "),
        5L -> ("x " * 40).trim)) {
      assert(got(id) === reference(text, 5, 4), s"doc $id")
    }
  }

  test("MOSS guarantee: a shared >= k+w-1 word span yields a shared fingerprint") {
    val span = "alpha beta gamma delta epsilon zeta eta theta" // 8 = k+w-1
    val a = s"unrelated prefix words here $span and then some trailing text"
    val b = s"$span completely different continuation of the second document"
    val fps = Dedup.winnowFingerprints(
      Seq(10L -> a, 20L -> b).toDF("doc_id", "text"), k = 5, w = 4)
      .select(col("doc_id"), col("fp")).collect()
      .groupBy(_.getLong(0)).map { case (k2, v) =>
        k2 -> v.map(_.getLong(1)).toSet }
    assert((fps(10L) intersect fps(20L)).nonEmpty)
  }

  test("overlap pairs: plagiarized pair surfaces; df cap kills boilerplate") {
    val shared = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen seventeen"
    val boiler = "all rights reserved contact us terms of service apply here"
    val docs = Seq(
      1L -> s"$shared plus some extra words at the end of it",
      2L -> s"opening remark then $shared closing remark afterwards",
      3L -> s"$boiler totally different content about turtles and rivers",
      4L -> s"$boiler another unrelated page concerning cold mountain wind",
      5L -> s"$boiler third unrelated page about an old grain mill",
      6L -> s"$boiler fourth unrelated page on dry summer grass fields"
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowOverlapPairs(docs, k = 5, w = 4,
      minShared = 2, maxDf = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 2L)), s"got ${pairs.keySet}")
    // the boilerplate fingerprints sit in 4 docs > maxDf=2: no boiler pairs
    assert(pairs.keySet.forall { case (a2, b2) => Set(a2, b2) == Set(1L, 2L) })
  }

  test("deterministic under repartition") {
    val docs = Seq(1L -> prose, 2L -> (prose + " with a small tail change"))
      .toDF("doc_id", "text")
    val a = Dedup.winnowFingerprints(docs, 5, 4)
      .orderBy("doc_id", "pos").collect().toSeq
    val b = Dedup.winnowFingerprints(docs.repartition(5), 5, 4)
      .orderBy("doc_id", "pos").collect().toSeq
    assert(a === b)
  }
}
