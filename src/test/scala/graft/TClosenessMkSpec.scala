package graft

import java.sql.Timestamp

import graft.operators.{CorpusOps, TemporalJoins}

/** q236 t-closeness, q237 Mann-Kendall. */
class TClosenessMkSpec extends SparkSpec {
  import spark.implicits._

  test("tCloseness: hand TV per class against the global mix, dense " +
      "absent-cell accounting, verdicts") {
    // constant n_chars -> every class is (lang, bucket 0).
    // global mix: s1 4/10, s2 1/10, s3 5/10
    val docs = (
      Seq.fill(2)(("en", "s1")) ++ Seq(("en", "s2"), ("en", "s3")) ++
        Seq.fill(4)(("de", "s3")) ++ Seq.fill(2)(("fr", "s1")))
      .zipWithIndex.map { case ((l, s), i) => (i.toLong, l, s, 100L) }
      .toDF("doc_id", "lang", "source", "n_chars")
    val out = CorpusOps.tCloseness(docs).collect()
      .map(r => r.getString(0) -> ((r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out("en") === ((0.25, true)))   // (.5,.25,.25) vs (.4,.1,.5)
    assert(out("de") === ((0.5, false)))   // (0,0,1): absent cells count
    assert(out("fr") === ((0.6, false)))   // (1,0,0)
  }

  test("mannKendall: exact S/Var on monotone, tied, and single-day " +
      "series; continuity-corrected z") {
    def ts(day: Int) = new Timestamp(
      java.time.LocalDate.of(2023, 1, 1).plusDays(day.toLong)
        .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli)
    val rows =
      (0 until 5).flatMap(d => Seq.fill(d + 1)(("up", ts(d)))) ++
        (0 until 5).flatMap(d => Seq.fill(5 - d)(("down", ts(d)))) ++
        (0 until 5).flatMap(d => Seq.fill(3)(("flat", ts(d)))) ++
        Seq(("oneday", ts(2)))
    val out = TemporalJoins.mannKendall(rows.toDF("event_type", "ts"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          r.getString(5)))).toMap
    // 5 strictly-increasing days: S = 10, no ties, Var18 = 5*4*15 = 300
    val zUp = math.floor(9.0 / math.sqrt(300.0 / 18.0) * 1e6) / 1e6
    val zDown = math.floor(-9.0 / math.sqrt(300.0 / 18.0) * 1e6) / 1e6
    assert(out("up") === ((5L, 10L, 300L, Some(zUp), "increasing")))
    assert(out("down") === ((5L, -10L, 300L, Some(zDown), "decreasing")))
    // all-tied: tie correction zeroes the variance -> NULL z, none
    assert(out("flat") === ((5L, 0L, 0L, None, "none")))
    assert(out("oneday") === ((1L, 0L, 0L, None, "none")))
  }
}
