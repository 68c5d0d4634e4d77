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
    val out = Linkage.linkage(clean, dirty, "id", "d_id", passes, fields,
        matchAt = 5000L, nonMatchBelow = 0L)
      .select("id", "d_id", "score", "verdict").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getString(3)))).toMap
    assert(out((1L, 11L)) === ((6500L, "match")))
    assert(out((2L, 12L)) === ((6500L, "match")), "deduped across passes")
    assert(out((2L, 13L)) === ((-4200L, "non_match")))
    assert(out.size === 3, s"exactly one row per candidate pair: $out")
  }

  test("duplicate ids fail loud: a duplicated input id would fan each " +
      "pair out by its copy count and multi-score it") {
    val dirty = Seq((11L, "abcdwxyz", "rome"))
      .toDF("d_id", "d_name", "d_city")
    val dupClean = Seq((1L, "abcdwxyz", "rome"), (1L, "abcdwxyz", "lyon"))
      .toDF("id", "name", "city")
    val e = intercept[IllegalArgumentException] {
      Linkage.linkage(dupClean, dirty, "id", "d_id", passes, fields,
        5000L, 0L).collect()
    }
    assert(e.getMessage.contains("unique id"), e.getMessage)
    val dupDirty = Seq((11L, "abcdwxyz", "rome"), (11L, "abcdwxyz", "rome"))
      .toDF("d_id", "d_name", "d_city")
    val clean = Seq((1L, "abcdwxyz", "rome")).toDF("id", "name", "city")
    val e2 = intercept[IllegalArgumentException] {
      Linkage.linkage(clean, dupDirty, "id", "d_id", passes, fields,
        5000L, 0L).collect()
    }
    assert(e2.getMessage.contains("unique d_id"), e2.getMessage)
  }

  test("possible band sits between the two thresholds") {
    val clean = Seq((1L, "abcdwxyz", "rome")).toDF("id", "name", "city")
    val dirty = Seq((11L, "abcdwxyX", "lyon"))
      .toDF("d_id", "d_name", "d_city") // name in band, city off
    val out = Linkage.linkage(clean, dirty, "id", "d_id", passes, fields,
      5000L, 0L)
      .select("score", "verdict").collect().head
    assert(out.getLong(0) === 3800L && out.getString(1) === "possible")
  }

  test("cross-pass dedup: 3-pass overlap yields candidate multiplicity 1, " +
      "and the dedup exchange shuffles only the id pair") {
    val clean = Seq((1L, "abcdwxyz", "rome"), (2L, "ppppqqqq", "oslo"))
      .toDF("id", "name", "city")
    val dirty = Seq((11L, "abcdwxyz", "rome"), (12L, "ppppqqqq", "oslo"))
      .toDF("d_id", "d_name", "d_city")
    val threePasses = passes :+
      ((expr("substring(name, 1, 8)"), expr("substring(d_name, 1, 8)")))
    val out = Linkage.linkage(clean, dirty, "id", "d_id", threePasses,
      fields, 5000L, 0L)
    val counts = out.groupBy("id", "d_id").count().collect()
    assert(counts.length === 2)
    assert(counts.forall(_.getLong(2) === 1L),
      "a pair surviving all three passes scores exactly once")
    // the dedup aggregates over the two-long id pair, never full-width
    // candidate rows: the pre-dedup HashAggregate keys are (_cid, _did)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("_cid") && plan.contains("_did"),
      s"id-pair dedup missing from plan:\n$plan")
    assert(!plan.linesIterator.filter(_.contains("HashAggregate"))
      .exists(l => l.contains("d_name")),
      s"dedup must not aggregate full-width rows:\n$plan")
  }

  test("EM estimation: m/u learned from the census recover the planted " +
      "slice without caller-supplied weights") {
    // 60 planted true pairs (name one edit off, city intact), 40 fresh
    // non-pairs that still share a block (name disagrees, city agrees on
    // half — background coincidence): EM must discover that NAME
    // agreement is the match signal and city coincidences are noise
    val clean = (1L to 100L)
      .map(i => (i, f"rec$i%04dtail", if (i % 2 == 0) "rome" else "oslo"))
      .toDF("id", "name", "city")
    val dirty = (1L to 100L).map { i =>
      val cleanCity = if (i % 2 == 0) "rome" else "oslo"
      if (i <= 60) (i + 1000L, f"rec$i%04dtaiX", cleanCity)
      else (i + 2000L, f"rec$i%04dZZZZ",
        if (i % 2 == 0) cleanCity else "bern")
    }.toDF("d_id", "d_name", "d_city")
    val out = Linkage.linkageEm(clean, dirty, "id", "d_id",
      passes = Seq((expr("substring(name, 1, 7)"),
        expr("substring(d_name, 1, 7)"))),
      fields = Seq(
        ("name", levenshtein(col("name"), col("d_name")) <= 1),
        ("city", col("city") === col("d_city"))),
      iters = 5, matchAt6 = 900000L, nonMatchBelow6 = 100000L)
    val byBand = out.groupBy("verdict").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byBand.getOrElse("match", 0L) === 60L,
      s"EM must recover exactly the planted true pairs: $byBand")
    assert(byBand.getOrElse("non_match", 0L) === 40L,
      s"block-only candidates must land non_match: $byBand")
    // the learned parameters themselves: name m >> u
    val cands = clean.join(dirty,
      expr("substring(name, 1, 7) = substring(d_name, 1, 7)"))
      .withColumn("name_agree", levenshtein(col("name"), col("d_name")) <= 1)
      .withColumn("city_agree", col("city") === col("d_city"))
    val (p6, m6, u6, _) = Linkage.emEstimate(cands,
      Seq("name_agree", "city_agree"), iters = 5)
    assert(m6(0) > 900000L, s"name m should converge high: ${m6(0)}")
    assert(u6(0) < 100000L, s"name u should converge low: ${u6(0)}")
    assert(p6 > 500000L && p6 < 700000L,
      s"match prevalence ~0.6 of candidates: $p6")
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
