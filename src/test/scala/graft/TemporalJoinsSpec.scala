package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.TemporalJoins

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join picks the latest right row at or before each left ts") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), 100L),
      (1L, ts("2024-01-01 10:00:30"), 101L),
      (2L, ts("2024-01-01 10:00:10"), 102L))
      .toDF("user_id", "ts", "event_id")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 900L),
      (1L, ts("2024-01-01 10:00:30"), 901L), // ties with trade 101 → matches
      (2L, ts("2024-01-01 10:00:20"), 902L)) // AFTER trade 102 → no match
      .toDF("user_id", "ts", "event_id")

    val out = TemporalJoins.asofJoin(trades, quotes, "user_id", "ts", Seq("event_id"))
      .select($"event_id", $"asof_event_id")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(100L) === Some(900L))
    assert(out(101L) === Some(901L)) // equal-ts right row matches (as-of semantics)
    assert(out(102L) === None)       // only future quotes → null
  }

  test("bounded range join finds exactly the within-bound pairs") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:04:00"), 2L),  // 240s from 1 → within 300
      (1L, ts("2024-01-01 10:10:00"), 3L),  // 360s from 2 → out
      (2L, ts("2024-01-01 10:00:00"), 4L))  // other key
      .toDF("user_id", "ts", "event_id")
    val r = ev.select($"user_id", $"event_id".as("r_event_id"), $"ts")
    val pairs = TemporalJoins.boundedRangeJoin(ev, r, "user_id", "ts", 300)
      .filter($"event_id" < $"r_event_id")
      .select($"event_id", $"r_event_id")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("range join boundary: exactly bound seconds apart is included") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:05:00"), 2L)) // exactly 300s
      .toDF("user_id", "ts", "event_id")
    val r = ev.select($"user_id", $"event_id".as("r_event_id"), $"ts")
    val pairs = TemporalJoins.boundedRangeJoin(ev, r, "user_id", "ts", 300)
      .filter($"event_id" < $"r_event_id").count()
    assert(pairs === 1L)
  }

  test("funnel: order matters — a click before the first view doesn't count") {
    // A: view → click → purchase (full). B: click BEFORE its view, then a
    // purchase — B reaches step 1 only (its one click precedes the
    // anchor). C: view → click, purchase before the click → stops at 2.
    val ev = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:01:00")),
      (1L, "purchase", ts("2024-01-01 10:02:00")),
      (2L, "click", ts("2024-01-01 09:00:00")),
      (2L, "view", ts("2024-01-01 09:30:00")),
      (2L, "purchase", ts("2024-01-01 09:45:00")),
      (3L, "view", ts("2024-01-01 08:00:00")),
      (3L, "purchase", ts("2024-01-01 08:10:00")),
      (3L, "click", ts("2024-01-01 08:20:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = TemporalJoins.funnel(ev, Seq("view", "click", "purchase"))
      .collect().sortBy(_.getLong(0))
    assert(out.map(r => (r.getString(1), r.getLong(2))).toSeq ===
      Seq(("view", 3L), ("click", 2L), ("purchase", 1L)), s"${out.toSeq}")
    // conversions: 2/3 floored, then 1/2
    assert(out(1).getDouble(3) === math.floor(2e6 / 3) / 1e6)
    assert(out(2).getDouble(3) === 0.5)
    assert(out(0).getDouble(3) === 1.0)
  }

  test("hourlyAnomalies: planted spike flags, diurnal shape does not") {
    import java.sql.Timestamp
    // 9 days: hour 3 always has 10 events, hour 4 always 2 — on day 5,
    // hour 3 spikes to 30. The per-hour baselines must absorb the
    // diurnal 10-vs-2 difference and flag ONLY the spike.
    val rows = for {
      day <- 1 to 9
      hod <- Seq(3, 4)
      n = if (day == 5 && hod == 3) 30 else if (hod == 3) 10 else 2
      i <- 1 to n
    } yield (day.toLong * 1000 + hod * 100 + i,
      Timestamp.valueOf(f"2024-01-$day%02d $hod%02d:15:00"), 1L)
    val ev = rows.toDF("event_id", "ts", "user_id")
    val out = graft.operators.TemporalJoins.hourlyAnomalies(ev)
      .collect().map(r => (r.getDate(0).toString, r.getInt(1)) ->
        ((r.getLong(2), r.getBoolean(6)))).toMap
    assert(out(("2024-01-05", 3)) === ((30L, true)))
    assert(out(("2024-01-04", 3)) === ((10L, false)))
    assert(out(("2024-01-05", 4)) === ((2L, false)))
    assert(out.values.count(_._2) === 1, "only the spike flags")
  }

  test("transitions: per-user consecutive pairs, exact row probabilities") {
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val ev = Seq(
      (1L, t(1), 100L, "visit"), (2L, t(2), 100L, "cart"),
      (3L, t(3), 100L, "buy"),
      (4L, t(1), 200L, "visit"), (5L, t(2), 200L, "cart"),
      (6L, t(3), 200L, "visit"),
      // user 300's events must NOT pair with anyone else's
      (7L, t(9), 300L, "buy"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = graft.operators.TemporalJoins.transitions(ev)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out(("visit", "cart")) === ((2L, 1.0)))
    assert(out(("cart", "buy")) === ((1L, 0.5)))
    assert(out(("cart", "visit")) === ((1L, 0.5)))
    assert(out.size === 3, s"unexpected transitions: ${out.keys}")
  }

  test("conversionLatency: first-touch hops, negative drop, exact p50/p90") {
    import java.sql.Timestamp
    def t(m: Int, s: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:$s%02d")
    val ev = Seq(
      // user 1: view@0:00, click@1:00 (60 s), purchase@3:00 (120 s)
      (1L, t(0, 0), 1L, "view"), (2L, t(1, 0), 1L, "click"),
      (3L, t(3, 0), 1L, "purchase"),
      // user 2: view@0:00, click@0:30 (30 s); duplicate later view must
      // NOT move first-touch
      (4L, t(0, 0), 2L, "view"), (5L, t(0, 30), 2L, "click"),
      (6L, t(5, 0), 2L, "view"),
      // user 3: click BEFORE view → negative hop dropped
      (7L, t(1, 0), 3L, "click"), (8L, t(2, 0), 3L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = graft.operators.TemporalJoins.conversionLatency(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    // view->click: {60, 30} → p50 interpolates to 45, p90 to 57
    assert(out("view->click") === ((2L, 45.0, 57.0)))
    // click->purchase: single 120 s hop
    assert(out("click->purchase") === ((1L, 120.0, 120.0)))
    assert(out.size === 2)
  }

  test("conversionLatency: 1e5 distinct latencies, no corpus-sized " +
      "percentile buffer in the plan") {
    // 100k users, each with a view at t0 and a click i ms later —
    // 100k DISTINCT latencies, the shape that would blow the exact
    // `percentile` aggregate's single-group buffer
    val base = spark.range(1, 100001)
    val views = base.selectExpr("id AS event_id",
      "timestamp_micros(1700000000000000) AS ts", "id AS user_id",
      "'view' AS event_type")
    val clicks = base.selectExpr("id + 200000 AS event_id",
      "timestamp_micros(1700000000000000 + id * 1000) AS ts",
      "id AS user_id", "'click' AS event_type")
    val out = graft.operators.TemporalJoins
      .conversionLatency(views.union(clicks))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("percentile"),
      "plan must not carry the exact percentile aggregate")
    val r = out.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // independent check: sorted lat_ms = 1..100000; percentile_cont at
    // q(n-1): p50 = 50000.5 ms, p90 = 90000.1 ms
    assert(r("view->click") === ((100000L, 50.0005, 90.0001)))
  }

  test("cusum: sustained shift alarms on the exact crossing day, " +
      "stable stays quiet, mirror shift trips the S- side") {
    import java.sql.Timestamp
    def rows(et: String, daily: Seq[Int]): Seq[(Long, Timestamp, Long, String)] =
      daily.zipWithIndex.flatMap { case (n, d) =>
        (1 to n).map(i => (d * 10000L + i,
          Timestamp.valueOf(f"2024-01-${d + 1}%02d 10:00:00"),
          i.toLong, et))
      }
    // steady: 10/day x 20 -> S+ = S- = 0 throughout (x = mu exactly)
    // up: 10/day x 10 then 100/day x 10. mu = 55, k = 5.5, h = 275.
    //   The mean is GLOBAL, so the low half itself drifts: S- gains
    //   55 - 5.5 - 10 = 39.5/day from day 1 and crosses 275 on day 7
    //   (39.5 * 7 = 276.5) -> first_alarm Jan 07; S- peaks at 395 on
    //   day 10, and the high half pushes S+ to the same 395 by day 20
    // down: the exact mirror (S+ trips first) -> Jan 07 too
    val ev = (rows("steady", Seq.fill(20)(10)) ++
      rows("up", Seq.fill(10)(10) ++ Seq.fill(10)(100)) ++
      rows("down", Seq.fill(10)(100) ++ Seq.fill(10)(10)))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = graft.operators.TemporalJoins.cusum(ev).collect()
      .map(r => r.getString(0) -> ((r.getString(5),
        Option(r.getDate(4)).map(_.toString), r.getDouble(3)))).toMap
    assert(out("steady")._1 === "stable" && out("steady")._2 === None)
    assert(out("steady")._3 === 0.0)
    assert(out("up") === (("alarm", Some("2024-01-07"), 395.0)))
    assert(out("down") === (("alarm", Some("2024-01-07"), 395.0)))
  }

  test("retention: first-touch cohorts, exact fractions, offset-0 = 1") {
    import java.sql.Timestamp
    def t(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // epoch-weeks: 2024-01-01..03 one week; 2024-01-08.. next
    // cohort A (week of Jan 1): users 1,2,3; user 1 returns both weeks,
    // user 2 returns week+1 only, user 3 never returns
    // cohort B (week of Jan 8): user 4, returns week+1
    val ev = Seq(
      (1L, t(1), 1L, "visit"), (2L, t(2), 2L, "visit"),
      (3L, t(3), 3L, "visit"),
      (4L, t(8), 1L, "visit"), (5L, t(9), 2L, "visit"),
      (6L, t(15), 1L, "visit"),
      (7L, t(8), 4L, "visit"), (8L, t(16), 4L, "visit"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = graft.operators.TemporalJoins.retention(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val wA = out.keys.map(_._1).min
    assert(out((wA, 0L)) === ((3L, 3L, 1.0)))
    assert(out((wA, 1L)) === ((2L, 3L, 0.666666)))
    assert(out((wA, 2L)) === ((1L, 3L, 0.333333)))
    assert(out((wA + 1, 0L)) === ((1L, 1L, 1.0)))
    assert(out((wA + 1, 1L)) === ((1L, 1L, 1.0)))
    assert(out.size === 5)
    // real events: every cohort has offset-0 at exactly 1.0, fractions
    // are monotonically bounded by 1, cohort sizes partition the users
    val real = graft.operators.TemporalJoins.retention(
      Tables.events(spark, "/root/testdata/sf0.001")).collect()
    val zero = real.filter(_.getLong(1) == 0L)
    assert(zero.nonEmpty)
    zero.foreach(r => assert(r.getDouble(4) === 1.0))
    real.foreach(r => assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0))
  }

  test("dispersion: exact Fano fold, verdicts, degenerate null") {
    import java.sql.Timestamp
    def t(d: Int, i: Int) = Timestamp.valueOf(f"2024-01-$d%02d 10:$i%02d:00")
    // "flat": 3,3,3 daily → var 0 → fano 0 (regular)
    // "spike": 1,1,10 → mean 4, var = (3·102−144)/6 = 27, F = 27/4 = 6.75
    // "one": single day → null fano
    val ev = (
      (0 until 9).map(i => (i.toLong, t(1 + i / 3, i % 3), 1L, "flat")) ++
        Seq((20L, t(1, 0), 2L, "spike"), (21L, t(2, 0), 2L, "spike")) ++
        (30 until 40).map(i => (i.toLong, t(3, i - 30), 2L, "spike")) ++
        Seq((50L, t(1, 5), 3L, "one")))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = graft.operators.TemporalJoins.dispersion(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("flat").getLong(1) === 3L)
    assert(out("flat").getDouble(5) === 0.0)
    assert(out("flat").getString(6) === "regular")
    assert(out("spike").getDouble(3) === 4.0)      // mean
    assert(out("spike").getDouble(4) === 27.0)     // sample variance
    assert(out("spike").getDouble(5) === 6.75)     // Fano
    assert(out("spike").getString(6) === "bursty")
    assert(out("one").isNullAt(5) && out("one").isNullAt(6))
  }

  test("ewmaTrend: exact dyadic fold, keys independent, odd-sum floors") {
    import java.sql.Timestamp
    def t(d: Int, i: Int) = Timestamp.valueOf(f"2024-01-$d%02d 10:0$i:00")
    // type a: daily counts 4, 2, 8 → s = 4e6, 3e6, 5.5e6
    // type b: counts 1, 2 → s = 1e6, (2e6+1e6) div 2 = 1.5e6
    // plus an odd case: 1, 0-day gap is NOT filled (days observed only)
    val ev = (
      (1 to 4).map(i => (i.toLong, t(1, i), 10L, "a")) ++
        (5 to 6).map(i => (i.toLong, t(2, i), 10L, "a")) ++
        (7 to 14).map(i => (i.toLong - 6, t(3, (i - 6)), 10L, "a")) ++
        Seq((20L, t(1, 1), 20L, "b")) ++
        (21 to 22).map(i => (i.toLong, t(3, i - 20), 20L, "b")))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = graft.operators.TemporalJoins.ewmaTrend(ev).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(out(("a", "2024-01-01")) === ((4L, 4000000L)))
    assert(out(("a", "2024-01-02")) === ((2L, 3000000L)))
    assert(out(("a", "2024-01-03")) === ((8L, 5500000L)))
    // key b folds its own days only — no bleed from a's day-2 count
    assert(out(("b", "2024-01-01")) === ((1L, 1000000L)))
    assert(out(("b", "2024-01-03")) === ((2L, 1500000L)))
    assert(out.size === 5)
    // determinism under repartitioning (collect_list order must not leak)
    val again = graft.operators.TemporalJoins.ewmaTrend(ev.repartition(7))
      .collect().map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(again === out)
  }

  test("theilSen: exact slope on a clean ramp, robustness to one wild day, " +
      "pinned lower median, single-day NULL") {
    // counts per (type, day): "ramp" = 1,3,5 (all pair slopes = 2);
    // "noisy" = 1,10,3 (slopes 9e6, -7e6, 1e6 -> median 1.0 — an OLS fit
    // would chase the spike); "lone" = single day
    def mk(t: String, day: String, n: Int) =
      (1 to n).map(_ => (t, ts(s"$day 10:00:00")))
    val ev = (mk("ramp", "2024-01-01", 1) ++ mk("ramp", "2024-01-02", 3) ++
      mk("ramp", "2024-01-03", 5) ++
      mk("noisy", "2024-01-01", 1) ++ mk("noisy", "2024-01-02", 10) ++
      mk("noisy", "2024-01-03", 3) ++
      mk("lone", "2024-01-01", 2)).toDF("event_type", "ts")
    val out = TemporalJoins.theilSen(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("ramp").getLong(2) === 3L &&
      out("ramp").getDouble(3) === 2.0)
    assert(out("noisy").getDouble(3) === 1.0, "median shrugs off the spike")
    // level = lower median of (cnt - slope*epochday); epochday(2024-01-01)
    // = 19723: levels -19722, -19714, -19722 -> tie broken by day -> -19722
    assert(out("noisy").getDouble(4) === -19722.0)
    assert(out("lone").getLong(1) === 1L && out("lone").getLong(2) === 0L)
    assert(out("lone").isNullAt(3) && out("lone").isNullAt(4))
    // even pair count pins the LOWER median: counts 1,2,4 over 3 days +
    // day 4 count 4 -> 6 pairs, slopes sorted [0,666666,1e6,1e6,1.5e6,2e6]
    // -> rank (6+1) div 2 = 3 -> 1.0
    val ev4 = (mk("e", "2024-01-01", 1) ++ mk("e", "2024-01-02", 2) ++
      mk("e", "2024-01-03", 4) ++ mk("e", "2024-01-04", 4))
      .toDF("event_type", "ts")
    val o4 = TemporalJoins.theilSen(ev4).collect()(0)
    assert(o4.getLong(2) === 6L && o4.getDouble(3) === 1.0)
  }

  test("pageHinkley: constant series never drifts, a sustained shift " +
      "alarms, exact integer replay of the excursion chain") {
    def mk(t: String, day: Int, n: Int) =
      (1 to n).map(_ => (t, ts(f"2024-01-$day%02d 10:00:00")))
    // flat: 10/day for 10 days; shifted: 10/day for 5 then 30/day for 5
    val ev = ((1 to 10).flatMap(d => mk("flat", d, 10)) ++
      (1 to 5).flatMap(d => mk("shift", d, 10)) ++
      (6 to 10).flatMap(d => mk("shift", d, 30))).toDF("event_type", "ts")
    val out = TemporalJoins.pageHinkley(ev, lambda = 20.0).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("flat").getDouble(2) === 0.0 &&
      out("flat").getString(4) === "stable")
    // exact replay of the defined integer chain for the shifted series
    val xs = Seq.fill(5)(10L) ++ Seq.fill(5)(30L)
    var cum = 0L; var m6 = 0L; var minM = Long.MaxValue
    var maxExc = 0L; var firstAlarm: Option[Int] = None
    xs.zipWithIndex.foreach { case (x, i) =>
      cum += x
      m6 += x * 1000000L - (cum * 1000000L) / (i + 1)
      minM = math.min(minM, m6)
      val exc = m6 - minM
      maxExc = math.max(maxExc, exc)
      if (exc > 20000000L && firstAlarm.isEmpty) firstAlarm = Some(i + 1)
    }
    assert(out("shift").getString(4) === "drift")
    assert(out("shift").getDouble(2) === maxExc / 1e6,
      "max excursion replays the integer chain")
    assert(out("shift").getDate(3).toString ===
      f"2024-01-${firstAlarm.get}%02d")
  }

  test("holtLinear: hand two-day recurrence, constant-series fixpoint, " +
      "single-day degenerate, fold matches a reference replay") {
    import java.sql.Timestamp
    def rows(et: String, daily: Seq[Int]): Seq[(Long, Timestamp, Long, String)] =
      daily.zipWithIndex.flatMap { case (n, d) =>
        (1 to n).map(i => (d * 10000L + i,
          Timestamp.valueOf(f"2024-01-${d + 1}%02d 10:00:00"),
          i.toLong, et))
      }
    // hand: [10, 20] -> l1 = (20e6 + 4*10e6) div 5 = 12e6, b1 = 2e6
    // div 10 = 0.2e6, forecast 12.2, one error |20e6-10e6| -> mae 10
    val df = (rows("hand", Seq(10, 20)) ++ rows("const", Seq(7, 7, 7, 7))
      ++ rows("solo", Seq(5))
      ++ rows("wavy", Seq(12, 3, 25, 7, 19, 2, 30, 11, 6, 22)))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = TemporalJoins.holtLinear(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val h = out("hand")
    assert(h.getLong(1) === 2L && h.getDouble(2) === 12.0)
    assert(h.getDouble(3) === 0.2 && h.getDouble(4) === 12.2)
    assert(h.getDouble(5) === 10.0)
    // constant series is a fixpoint: level = x, trend 0, mae 0
    val c = out("const")
    assert(c.getDouble(2) === 7.0 && c.getDouble(3) === 0.0)
    assert(c.getDouble(4) === 7.0 && c.getDouble(5) === 0.0)
    // single day: trend 0, no one-step errors
    assert(out("solo").getDouble(3) === 0.0
      && out("solo").isNullAt(5))
    // reference replay with Scala's toward-zero Long division (the div
    // contract), negative trends included
    var l = 12000000L; var b = 0L; var sae = 0L; var ne = 0L
    Seq(3, 25, 7, 19, 2, 30, 11, 6, 22).foreach { x =>
      val pred = l + b
      val l2 = (x * 1000000L + 4 * pred) / 5
      b = (l2 - l + 9 * b) / 10
      sae += math.abs(x * 1000000L - pred); ne += 1; l = l2
    }
    val w = out("wavy")
    assert(w.getDouble(2) === l / 1e6 && w.getDouble(3) === b / 1e6)
    assert(w.getDouble(5) === (sae / ne) / 1e6)
  }
}
