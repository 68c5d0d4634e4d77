package graft

import org.apache.spark.sql.functions._

import graft.operators.Linkage

/** Fellegi–Sunter record linkage (q218): multi-pass blocking recall,
  * integer weight fold, verdict thresholds, cross-pass dedup.
  */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private val passes = Seq(
    (expr("substring(name, 1, 4)"), expr("substring(d_name, 1, 4)")),
    (expr("substring(name, 5, 4)"), expr("substring(d_name, 5, 4)")))
  private val fields = Seq(
    Linkage.Field("name", levenshtein(col("name"), col("d_name")) <= 1,
      5000L, -3000L),
    Linkage.Field("city", col("city") === col("d_city"), 1500L, -1200L))

  test("multi-pass blocking: a pair broken in pass 1 is caught by pass 2, " +
      "and both-pass survivors score once") {
    val clean = Seq((1L, "abcdwxyz", "rome"), (2L, "ppppqqqq", "oslo"))
      .toDF("id", "name", "city")
    val dirty = Seq(
      (11L, "Xbcdwxyz", "rome"),  // first-4 block broken, last-4 catches
      (12L, "ppppqqqq", "oslo"),  // identical: BOTH passes produce it
      (13L, "zzzzqqqq", "bern"))  // blocks with 2 via pass 2, all disagree
      .toDF("d_id", "d_name", "d_city")
    val out = Linkage.linkage(clean, dirty, passes, fields,
        matchAt = 5000L, nonMatchBelow = 0L)
      .select("id", "d_id", "score", "verdict").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getString(3)))).toMap
    assert(out((1L, 11L)) === ((6500L, "match")))
    assert(out((2L, 12L)) === ((6500L, "match")), "deduped across passes")
    assert(out((2L, 13L)) === ((-4200L, "non_match")))
    assert(out.size === 3, s"exactly one row per candidate pair: $out")
  }

  test("possible band sits between the two thresholds") {
    val clean = Seq((1L, "abcdwxyz", "rome")).toDF("id", "name", "city")
    val dirty = Seq((11L, "abcdwxyX", "lyon"))
      .toDF("d_id", "d_name", "d_city") // name in band, city off
    val out = Linkage.linkage(clean, dirty, passes, fields, 5000L, 0L)
      .select("score", "verdict").collect().head
    assert(out.getLong(0) === 3800L && out.getString(1) === "possible")
  }

  test("q218 fixture: planted slices land in the expected verdicts") {
    val out = SparkEntry.queries("q218_record_linkage")(
      spark, "/root/testdata/sf0.001")
    val cust = Tables.customer(spark, "/root/testdata/sf0.001")
    val h = ((col("c_custkey") % 2147483648L) * 2654435761L) % 2147483647L
    val planted = cust.filter(h % 3 === 0).count()
    // every planted perturbed copy is recovered as its own candidate
    val truePairs = out.filter(col("d_id") - 10000000L === col("c_custkey"))
    assert(truePairs.count() === planted, "two-pass blocking recall = 100%")
    // clean-slice copies (bal and seg both unperturbed) classify match
    val fullAgree = cust.filter(h % 3 === 0 && h % 5 =!= 0 && h % 7 =!= 0)
      .count()
    assert(truePairs.filter(col("verdict") === "match").count()
      >= fullAgree)
    // fresh records never self-link (their true pair does not exist)
    assert(out.filter(col("d_id") >= 20000000L
      && col("verdict") === "match").count() === 0L)
  }
}
