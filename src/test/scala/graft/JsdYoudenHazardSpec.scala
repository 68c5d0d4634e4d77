package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{CorpusOps, EvalOps, TemporalJoins}

/** q233 JSD matrix, q234 Youden-J threshold, q235 Nelson-Aalen hazard. */
class JsdYoudenHazardSpec extends SparkSpec {
  import spark.implicits._

  test("jsdMatrix: identical = 0, disjoint = ln 2, hand-quantized middle") {
    // s1/s2: identical distributions; s3: disjoint vocabulary;
    // s4 vs s5: the hand case 'a a b' vs 'a b b'
    val docs = Seq(
      (1L, "s1", "x y"), (2L, "s2", "x y"), (3L, "s3", "zq zq"),
      (4L, "s4", "a a b"), (5L, "s5", "a b b"))
      .toDF("doc_id", "source", "text")
    val out = CorpusOps.jsdMatrix(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out.size === 10, "C(5,2) unordered pairs")
    assert(out(("s1", "s2")) === 0.0)
    // disjoint: every term ln 2 -> floor(693147.18) = 693147 micro-nats
    assert(out(("s1", "s3")) === 0.693147)
    assert(out(("s3", "s4")) === 0.693147)
    // hand case: per-token l6 = 287682 / -405466, t6 = 169898 div 3
    assert(out(("s4", "s5")) === 0.056632)
    out.values.foreach(v => assert(v >= 0.0 && v <= 0.693148))
  }

  test("youdenThreshold: hand ROC sweep picks max J; ties break to the " +
      "lower cutoff") {
    val df = Seq((0.9, true), (0.8, true), (0.4, true),
      (0.7, false), (0.3, false), (0.1, false)).toDF("s", "pos")
    val r = EvalOps.youdenThreshold(df, "s", "pos").collect()(0)
    assert(r.getDouble(0) === 0.4)
    assert(r.getLong(3) === 3L && r.getLong(4) === 1L) // tp, fp
    assert(r.getDouble(5) === 1.0 && r.getDouble(6) === 0.333333)
    assert(r.getDouble(7) === 0.666667)
    val tie = Seq((0.9, true), (0.5, true), (0.7, false), (0.1, false))
      .toDF("s", "pos")
    val rt = EvalOps.youdenThreshold(tie, "s", "pos").collect()(0)
    assert(rt.getDouble(0) === 0.5, "equal J at 0.9 and 0.5 -> lower wins")
  }

  test("hazard: hand risk sets with horizon censoring, exact steps and " +
      "cumulative") {
    def ts(day: Int) = new Timestamp(
      java.time.LocalDate.of(2023, 1, 1).plusDays(day.toLong)
        .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli)
    // horizon = day 30 (u5's last event). Durations/censoring:
    // u1 0->10 observed, u2 0->28 censored (gap 2), u3 5->5 observed,
    // u4 0->10 observed, u5 20->30 censored (gap 0)
    val events = Seq(
      (1L, ts(0)), (1L, ts(10)), (2L, ts(0)), (2L, ts(28)),
      (3L, ts(5)), (4L, ts(0)), (4L, ts(10)), (5L, ts(20)), (5L, ts(30)))
      .toDF("user_id", "ts")
    val out = TemporalJoins.hazard(events).orderBy("duration_days")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq === Seq(
      (0L, 5L, 1L, 0.2, 0.2),
      (10L, 4L, 2L, 0.5, 0.7),
      (28L, 1L, 0L, 0.0, 0.7)))
  }

  test("hazard: censored users sit in risk sets but never add events") {
    def ts(day: Int) = new Timestamp(
      java.time.LocalDate.of(2023, 1, 1).plusDays(day.toLong)
        .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli)
    // all users end at the horizon -> all censored -> hazard identically 0
    val events = Seq((1L, ts(0)), (1L, ts(9)), (2L, ts(3)), (2L, ts(9)))
      .toDF("user_id", "ts")
    val out = TemporalJoins.hazard(events).collect()
    assert(out.forall(_.getDouble(4) === 0.0))
  }

  test("kaplanMeier: hand product-limit steps under the same censoring " +
      "contract, per-step integer floors") {
    def ts(day: Int) = new Timestamp(
      java.time.LocalDate.of(2024, 1, 1).plusDays(day.toLong)
        .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli)
    // horizon = day 31 (u6). Durations: 0 × {u1 observed, u2 censored
    // gap 3, u6 censored gap 0}; 5 × {u3 observed, u4 censored gap 1};
    // 10 × {u5 observed, gap 11}
    val events = Seq(
      (1L, ts(0)),
      (2L, ts(28)),
      (3L, ts(4)), (3L, ts(9)),
      (4L, ts(25)), (4L, ts(30)),
      (5L, ts(10)), (5L, ts(20)),
      (6L, ts(31)))
      .toDF("user_id", "ts")
    val out = TemporalJoins.kaplanMeier(events).orderBy("duration_days")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // s6 fold: 1e6·5/6 = 833333; ·2/3 = 555555 (1666666 div 3); ·0 = 0
    assert(out.toSeq === Seq(
      (0L, 6L, 1L, 0.833333),
      (5L, 3L, 1L, 0.555555),
      (10L, 1L, 1L, 0.0)))
    // all censored: survival stays exactly 1 at every step
    val flat = Seq((1L, ts(0)), (1L, ts(9)), (2L, ts(3)), (2L, ts(9)))
      .toDF("user_id", "ts")
    assert(TemporalJoins.kaplanMeier(flat).collect()
      .forall(_.getDouble(3) === 1.0))
  }
}
