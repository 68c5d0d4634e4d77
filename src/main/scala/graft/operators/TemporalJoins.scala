package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively, composed from built-ins
  * (the preferred extension path — no custom strategy needed):
  *
  *   - as-of join: one union + one window pass — O(n log n) per key,
  *     single shuffle, vs the naive per-left-row subquery
  *   - bounded range join: equi-join on coarse time buckets + residual
  *     filter — turns an inequality join (BroadcastNestedLoop at scale)
  *     into a shuffle-hash join whose cost is pairs-within-bucket
  */
object TemporalJoins {

  /** Funnel conversion latency (q217): for each adjacent step pair of
    * the funnel, the distribution of time-to-convert across users —
    * [[funnel]] counts WHO progresses, this measures HOW LONG the hop
    * takes (the number an activation team actually tunes). First-touch
    * timestamp per (user, step), per-pair latency quantized to integer
    * MILLISECONDS (floor — product latencies below 1 ms are noise),
    * negative hops dropped (converted before entering), then
    * n / median / p90 seconds by linear interpolation at rank q·(n−1)
    * — percentile_cont semantics, replayed in exact BIGINTs.
    *
    * Deliberately NOT Spark's exact `percentile`: that aggregate
    * buffers every group value in ONE task's aggregation buffer, and
    * the group key here is the step pair (~|steps| groups), so a
    * 100 TB funnel would funnel all converting users' latencies into
    * one reducer. Instead latencies collapse to a (step, lat_ms → n)
    * table first (map-side combine; bounded by DISTINCT quantized
    * latencies, not users), the only window runs over that value-set
    * cumulative, and the interpolation reads two rows of it — the
    * value-set-collapse pattern rankAuc/prAuc established. Interpolated
    * values carry exactly one decimal digit of ms (frac ∈ k/10), so
    * tenth-of-ms integer units are exact and the /10⁴ emit is the only
    * float op.
    *
    * Scale shape: one (user, step) min-agg, one user-keyed equi-join
    * per step pair over the |steps|-bounded first-touch table, one
    * (step, lat_ms) count, one value-set-sized window.
    */
  def conversionLatency(events: DataFrame,
      steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    val ft = events.filter(col("event_type").isin(steps.map(lit): _*))
      .groupBy(col("user_id"), col("event_type")).agg(min(col("ts")).as("t"))
    val pairs = steps.sliding(2).toSeq.map { case Seq(a, b) =>
      val from = ft.filter(col("event_type") === a)
        .select(col("user_id"), col("t").as("t_from"))
      val to = ft.filter(col("event_type") === b)
        .select(col("user_id").as("u2"), col("t").as("t_to"))
      from.join(to, col("user_id") === col("u2"))
        .filter(col("t_to") >= col("t_from"))
        .select(lit(s"$a->$b").as("step"),
          ((unix_micros(col("t_to")) - unix_micros(col("t_from")))
            .divide(lit(1000L)).cast("long")).as("lat_ms"))
    }
    val g = pairs.reduce(_ union _)
      .groupBy(col("step"), col("lat_ms")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("step")).orderBy(col("lat_ms"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = g.withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt"))
        .over(Window.partitionBy(col("step"))))
    // rank r_q = q·(n−1) = lo + frac with frac in tenths; value at
    // 0-based index i is the first lat_ms whose cumulative count
    // exceeds i. vhi falls back to vlo when lo is the last index
    // (frac is provably 0 there).
    def vAt(loE: String): (Column, Column) = (
      min(when(col("cum") > expr(loE), col("lat_ms"))),
      min(when(col("cum") > expr(loE) + 1, col("lat_ms"))))
    val (vlo50, vhi50) = vAt("(n - 1) div 2")
    val (vlo90, vhi90) = vAt("(9 * (n - 1)) div 10")
    cum.groupBy(col("step")).agg(
        max(col("n")).as("n"),
        vlo50.as("vlo50"), vhi50.as("vhi50"),
        vlo90.as("vlo90"), vhi90.as("vhi90"))
      .select(col("step"), col("n"),
        (expr("vlo50 * 10 + 5 * ((n - 1) % 2) " +
          "* (coalesce(vhi50, vlo50) - vlo50)")
          .cast("double") / 10000).as("p50_sec"),
        (expr("vlo90 * 10 + ((9 * (n - 1)) % 10) " +
          "* (coalesce(vhi90, vlo90) - vlo90)")
          .cast("double") / 10000).as("p90_sec"))
  }

  /** Weekly cohort retention matrix (q213): users grouped by their
    * first-seen epoch-week (cohort), each later week's active fraction
    * of that cohort — THE product-analytics read the funnel/transition
    * views don't give (those ask what users do; this asks whether they
    * COME BACK), and for a data engine the canonical test that
    * first-touch attribution, distinct-per-window, and ratio arithmetic
    * compose. Epoch-weeks (days-since-1970 div 7) — calendar weekofyear
    * would fold across year boundaries. Retention is an exact BIGINT
    * millionth division; offset 0 is 1.0 by construction (the built-in
    * sanity row).
    *
    * Scale shape: one (user, week) distinct (map-side partial), one
    * min-agg for cohorts, one equi-join back on user, one (cohort,
    * offset) count — all user-keyed equi-shuffles; the matrix itself is
    * |weeks|² rows.
    */
  def retention(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val uw = events.select(col(userCol).as("u"),
        expr(s"datediff(to_date($tsCol), DATE'1970-01-01') div 7")
          .cast("long").as("w"))
      .distinct()
    val firstW = uw.groupBy(col("u")).agg(min(col("w")).as("cw"))
    val cohorts = firstW.groupBy(col("cw"))
      .agg(count(lit(1)).as("cohort_size"))
    uw.join(firstW, "u")
      .groupBy(col("cw"), (col("w") - col("cw")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(cohorts), "cw")
      .select(col("cw").as("cohort_week"), col("week_offset"),
        col("n_active"), col("cohort_size"),
        (expr("n_active * 1000000 div cohort_size").cast("double") / 1e6)
          .as("retention"))
  }

  /** Daily-count dispersion (q207): the Fano factor variance/mean of an
    * event type's daily volumes — the one-number answer to "is this
    * stream Poisson-regular or bursty" that picks monitoring thresholds
    * for [[hourlyAnomalies]] (a bursty stream needs MAD-style robust
    * baselines; a regular one can use tight ones) and tells a trainer
    * whether an event source can be uniformly subsampled. Exact BIGINT
    * algebra: with D days, S = Σn, Q = Σn², sample-variance/mean folds
    * to F = (D·Q − S²)/(S·(D−1)) — emitted as floored millionths, no
    * intermediate float. Verdicts at the conventional reading: < 0.7
    * under-dispersed (regular), > 1.5 over-dispersed (bursty), else
    * consistent with Poisson. Degenerate keys (single day / zero count)
    * report NULL. Overflow bound: S² needs S < 3·10⁹ per key; shard the
    * key (e.g. by week) past that.
    *
    * One map-side-combined (key, day) count, one per-key moment agg —
    * |keys| rows after the first shuffle.
    */
  def dispersion(events: DataFrame, keyCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val daily = events.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
    val m = daily.groupBy(col(keyCol)).agg(
      count(lit(1)).as("d"), sum(col("n")).as("s"),
      sum(col("n") * col("n")).as("q"))
    m.withColumn("fano6",
        when(col("d") > 1 && col("s") > 0,
          expr("(d * q - s * s) * 1000000 div (s * (d - 1))")))
      .select(col(keyCol), col("d").as("n_days"), col("s").as("n_events"),
        (expr("s * 1000000 div d").cast("double") / 1e6).as("mean_daily"),
        when(col("d") > 1,
          expr("(d * q - s * s) * 1000000 div (d * (d - 1))")
            .cast("double") / 1e6).as("variance"),
        (col("fano6").cast("double") / 1e6).as("fano"),
        when(col("fano6").isNull, lit(null).cast("string"))
          .when(col("fano6") < 700000L, "regular")
          .when(col("fano6") > 1500000L, "bursty")
          .otherwise("poisson").as("verdict"))
  }

  /** Time-decay daily trend (q201): per event type, daily counts smoothed
    * by an exponentially-weighted moving average with decay 1/2 — the
    * freshness-weighted activity signal a mixture scheduler reads when
    * recent volume should outweigh history (the EWMA complement of
    * [[hourlyAnomaly]]'s median baseline). The decay is DYADIC on
    * purpose: s₁ = n₁·10⁶, s_r = (n_r·10⁶ + s_{r−1}) div 2 keeps every
    * step an exact BIGINT halving, so the per-step floor lands at the
    * same place in both engines and the whole recurrence hash-checks
    * (an arbitrary α multiplies counts by 10⁶ twice and overflows the
    * day-count regime this serves).
    *
    * The recurrence is inherently sequential PER KEY, so it runs as an
    * `aggregate` fold over the key's day array: one map-side-combined
    * (key, day) count shuffle, then one row per key holding ≤|days|
    * structs — state bounded by the calendar, never by event volume.
    * 100 TB of events still folds the same few-hundred-element arrays.
    */
  def ewmaTrend(events: DataFrame, keyCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val daily = events.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
    val packed = daily.groupBy(col(keyCol))
      .agg(array_sort(collect_list(struct(col("day"), col("n")))).as("ds"))
    val folded = packed.withColumn("es",
      expr("""aggregate(ds,
          CAST(array() AS ARRAY<STRUCT<day: DATE, n: BIGINT, s: BIGINT>>),
          (acc, x) -> array_append(acc, struct(x.day AS day, x.n AS n,
            CASE WHEN size(acc) = 0 THEN x.n * 1000000L
                 ELSE (x.n * 1000000L + element_at(acc, -1).s) div 2
            END AS s)))"""))
    folded.select(col(keyCol), explode(col("es")).as("e"))
      .select(col(keyCol), col("e.day").as("day"), col("e.n").as("n"),
        col("e.s").as("ewma6"),
        (col("e.s").cast("double") / 1e6).as("ewma"))
  }

  /** Two-sided CUSUM changepoint detection (q223) over a key's daily
    * event volumes — the Page (1954) sequential test the EWMA trend
    * (q201) and the MAD hourly anomalies (q38-family) don't give: EWMA
    * shows drift, MAD flags single outlier buckets, CUSUM detects a
    * SUSTAINED small shift (a 15% volume drop spread over a week that
    * no single day makes alarming) and names the day the evidence
    * crossed the line. S⁺ₜ = max(0, S⁺ₜ₋₁ + xₜ − μ − k) accumulates
    * upward drift, S⁻ₜ the mirror; alarm when either exceeds h.
    * Textbook tuning baked in: allowance k = μ/`kDiv` (default half a
    * 20% shift), threshold h = `hMult`·μ.
    *
    * Exact integer staging: counts scale to millionths, μ₆ = ⌊Σn·10⁶/d⌋,
    * and the whole recurrence folds in BIGINTs — engine-portable
    * bit-for-bit (the oracle replays it as a recursive CTE).
    *
    * Scale shape = [[ewmaTrend]]'s: one map-side-combined (key, day)
    * count, then one aggregate-fold per key over ≤|days| structs —
    * state bounded by the calendar, never event volume.
    */
  def cusum(events: DataFrame, keyCol: String = "event_type",
      tsCol: String = "ts", kDiv: Int = 10, hMult: Int = 5): DataFrame = {
    val daily = events.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
    val stats = daily.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"), sum(col("n")).as("s"))
      .withColumn("mu6", expr("s * 1000000 div n_days"))
      .withColumn("k6", expr(s"mu6 div $kDiv"))
      .withColumn("h6", expr(s"$hMult * mu6"))
    val packed = daily.groupBy(col(keyCol))
      .agg(array_sort(collect_list(struct(col("day"), col("n")))).as("ds"))
      .join(broadcast(stats), keyCol)
    val folded = packed.withColumn("es",
      expr("""aggregate(ds,
          CAST(array() AS ARRAY<STRUCT<day: DATE, sp: BIGINT, sn: BIGINT>>),
          (acc, x) -> array_append(acc, struct(x.day AS day,
            greatest(CAST(0 AS BIGINT),
              CASE WHEN size(acc) = 0 THEN CAST(0 AS BIGINT)
                   ELSE element_at(acc, -1).sp END
                + x.n * 1000000L - mu6 - k6) AS sp,
            greatest(CAST(0 AS BIGINT),
              CASE WHEN size(acc) = 0 THEN CAST(0 AS BIGINT)
                   ELSE element_at(acc, -1).sn END
                + mu6 - x.n * 1000000L - k6) AS sn)))"""))
    folded
      .withColumn("cusum_max6",
        expr("array_max(transform(es, x -> greatest(x.sp, x.sn)))"))
      .withColumn("first_alarm",
        expr("try_element_at(filter(es, x -> greatest(x.sp, x.sn) > h6)" +
          ", 1).day"))
      .select(col(keyCol), col("n_days"),
        (col("mu6").cast("double") / 1e6).as("mean_daily"),
        (col("cusum_max6").cast("double") / 1e6).as("cusum_max"),
        col("first_alarm"),
        when(col("first_alarm").isNull, "stable").otherwise("alarm")
          .as("verdict"))
  }

  /** Page–Hinkley drift detector over daily volumes (q258) — the
    * UNKNOWN-baseline companion to [[cusum]]: CUSUM needs a trusted μ
    * (its in-sample mean makes it a retrospective test); Page–Hinkley
    * (Page 1954, the mean-shift form used by streaming-ML drift
    * monitors) tracks xₜ against the RUNNING mean and alarms when the
    * cumulative positive deviation m_t leaves its own historical
    * minimum by more than λ — no baseline parameter, self-calibrating
    * as data arrives.
    *
    * Exact integer staging: x̄₆(t) = cum·10⁶ div t (running mean as a
    * defined floor), term_t = x_t·10⁶ − x̄₆(t) − δ₆,
    * m₆ = running Σ term, excursion₆ = m₆ − min_{s≤t} m₆, alarm when
    * excursion₆ > λ₆. Every stage is a per-key window over the
    * COLLAPSED daily table (calendar-bounded; no recursion — unlike
    * CUSUM's max(0, ·) clamp, PH's running mean and min are plain
    * cumulative windows, so the oracle replays without a recursive
    * CTE).
    */
  def pageHinkley(events: DataFrame, keyCol: String = "event_type",
      tsCol: String = "ts", delta: Double = 0.0, lambda: Double = 50.0)
      : DataFrame = {
    val delta6 = math.floor(delta * 1e6).toLong
    val lambda6 = math.floor(lambda * 1e6).toLong
    val daily = events.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val terms = daily
      .withColumn("t", row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(col("day"))).cast("long"))
      .withColumn("cum", sum(col("n")).over(w))
      .withColumn("xbar6", expr("cum * 1000000 div t"))
      .withColumn("term", col("n") * 1000000L - col("xbar6") - delta6)
      .withColumn("m6", sum(col("term")).over(w))
      .withColumn("exc6", col("m6") - min(col("m6")).over(w))
    terms.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"),
        max(col("exc6")).as("exc6"),
        min(when(col("exc6") > lambda6, col("day"))).as("first_alarm"))
      .select(col(keyCol), col("n_days"),
        (col("exc6").cast("double") / 1e6).as("max_excursion"),
        col("first_alarm"),
        when(col("first_alarm").isNull, "stable").otherwise("drift")
          .as("verdict"))
  }

  /** Theil–Sen slope over daily volumes (q256) — the MAGNITUDE
    * companion to [[mannKendall]]: MK says whether a monotone trend
    * exceeds chance, Theil–Sen says how big it is, robustly — the
    * median of all pairwise day-to-day slopes (Theil 1950, Sen 1968)
    * tolerates up to ~29% wild days where an OLS fit follows them.
    *
    * Exactness: slopes quantize to millionths by truncating integer
    * division ((cnt_j − cnt_i)·10⁶ div (day_j − day_i); Spark `div`
    * and DuckDB `//` both truncate toward zero, so negative slopes
    * replay), the LOWER weighted median is the pinned order statistic
    * (rank ⌈m/2⌉ over (slope6, then i-day, j-day) — fully ordered, so
    * ties are deterministic), and the intercept is the median of
    * (cnt − slope6·day) residual levels under the same rule. Pair
    * table is calendar-bounded (days² per key, never rows); single-day
    * keys report NULL slope.
    */
  def theilSen(events: DataFrame, typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val daily = events
      .groupBy(col(typeCol).as("k"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("x", datediff(col("day"), to_date(lit("1970-01-01")))
        .cast("long"))
    val pairs = daily.as("a").join(daily.as("b"),
        col("a.k") === col("b.k") && col("a.x") < col("b.x"))
      .select(col("a.k").as("k"), col("a.x").as("xi"), col("b.x").as("xj"),
        expr("(b.cnt - a.cnt) * 1000000 div (b.x - a.x)").as("slope6"))
    val m = pairs.groupBy(col("k")).agg(count(lit(1)).as("n_pairs"))
    val wS = Window.partitionBy(col("k"))
      .orderBy(col("slope6"), col("xi"), col("xj"))
    val med = pairs.withColumn("rn", row_number().over(wS).cast("long"))
      .join(m, "k")
      .filter(col("rn") === expr("(n_pairs + 1) div 2"))
      .select(col("k"), col("n_pairs"), col("slope6"))
    val nD = daily.groupBy(col("k")).agg(count(lit(1)).as("n_days"))
    val wI = Window.partitionBy(col("k"))
      .orderBy(col("lev6"), col("day"))
    val icpt = daily.join(med.select(col("k"), col("slope6")), "k")
      .withColumn("lev6", col("cnt") * 1000000L - col("slope6") * col("x"))
      .withColumn("rn", row_number().over(wI).cast("long"))
      .join(nD, "k")
      .filter(col("rn") === expr("(n_days + 1) div 2"))
      .select(col("k"), col("lev6"))
    nD.join(med, Seq("k"), "left").join(icpt, Seq("k"), "left")
      .select(col("k").as(typeCol), col("n_days"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        (col("slope6").cast("double") / 1e6).as("slope_per_day"),
        (col("lev6").cast("double") / 1e6).as("level"))
  }

  /** Event-flow transition matrix (q198): the Markov view of the event
    * stream — for every ordered pair of CONSECUTIVE events of the same
    * user, a (from, to) count and the row-normalized transition
    * probability (floored millionths from exact counts): the product-
    * analytics flow diagram, and the complement of [[funnel]] (funnel
    * asks "did the prescribed path happen"; this asks "what paths
    * actually happen"). Consecutive pairs come from a per-user lag
    * window ordered by (ts, event_id) — the event_id tiebreak makes
    * simultaneous events deterministic; user partitions are
    * session-sized, never stream-sized. One window + one count
    * aggregation + a broadcast row-margin join.
    */
  def transitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = events
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val margins = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).as("row_n"))
    pairs.join(broadcast(margins), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        (floor(col("n") * 1000000L / col("row_n")).cast("double") / 1e6)
          .as("p"))
  }

  /** Hourly traffic-anomaly audit (q194): the monitoring read over an
    * event stream — hourly event counts judged against a per-hour-of-day
    * baseline (the median count of the SAME hour across all days, so
    * diurnal shape isn't mistaken for anomaly) with a MAD scale; an hour
    * is anomalous when its deviation exceeds max(3·MAD, 1). Median and
    * MAD are Spark's EXACT percentile (interpolated midpoint on even
    * counts — identical arithmetic to DuckDB's median, so .5 values
    * compare bit-equal). Shapes: one (date, hour) count aggregation,
    * one 24-row-per-metric baseline aggregation joined back broadcast,
    * row-local flags — nothing downstream is event-sized.
    */
  def hourlyAnomalies(events: DataFrame, tsCol: String = "ts"): DataFrame = {
    val hourly = events
      .groupBy(to_date(col(tsCol)).as("date"),
        hour(col(tsCol)).as("hod"))
      .agg(count(lit(1)).as("n"))
    val base = hourly.groupBy(col("hod"))
      .agg(expr("percentile(n, 0.5)").as("med"))
    val withMed = hourly.join(broadcast(base), Seq("hod"))
      .withColumn("dev", abs(col("n") - col("med")))
    val mad = withMed.groupBy(col("hod"))
      .agg(expr("percentile(dev, 0.5)").as("mad"))
    withMed.join(broadcast(mad), Seq("hod"))
      .select(col("date"), col("hod"), col("n"), col("med"), col("mad"),
        col("dev"),
        (col("dev") > greatest(col("mad") * 3, lit(1.0))).as("is_anomaly"))
  }

  /** As-of join: for every left row, the single most recent right row with
    * `right.ts <= left.ts`, per key. Implementation: union both sides
    * tagged, sort within key by (ts, side), and carry the last-seen right
    * row forward as ONE struct with `last_value(ignoreNulls)` — the struct
    * is non-null for every right row even when its fields are null, so
    * NULL payload values round-trip and multiple payload columns can never
    * be stitched from different right rows. Ties (equal ts) prefer the
    * right row (standard as-of: a quote AT the trade time matches), and
    * equal-(key, ts) right rows resolve deterministically to the largest
    * payload struct.
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String,
      rightPayload: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val rStructType = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => right.schema(c).copy(name = c)))
    val l = left
      .withColumn("_side", lit(1))
      .select(Seq(col(keyCol).as("_k"), col(tsCol).as("_ts"), col("_side")) ++
        leftCols.map(c => col(c).as(s"_l_$c")) :+
        lit(null).cast(rStructType).as("_r"): _*)
    val r = right
      .withColumn("_side", lit(0))
      .select(Seq(col(keyCol).as("_k"), col(tsCol).as("_ts"), col("_side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"_l_$c")) :+
        struct(rightPayload.map(col): _*).as("_r"): _*)

    // _r in the ordering breaks (key, ts) ties among right rows
    // deterministically (struct comparison, field order = rightPayload)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_side"), col("_r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_carried", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(c => col(s"_l_$c").as(c)) ++
        rightPayload.map(c => col("_carried").getField(c).as(s"$prefix$c")): _*)
  }

  /** Bounded range join: all (left, right) pairs with the same key and
    * `|left.ts − right.ts| <= bound`. Each left row lands in its bucket and
    * probes the two adjacent buckets (bucket width = bound), so every
    * qualifying pair shares a probed bucket; an exact residual filter
    * removes bucket-mates outside the bound. Shuffles on (key, bucket) —
    * never a nested-loop.
    */
  def boundedRangeJoin(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String,
      boundSeconds: Long): DataFrame = {
    require(boundSeconds > 0, "boundSeconds must be positive")
    // microsecond precision throughout: second-truncated arithmetic would
    // admit pairs up to bound+1s apart on sub-second timestamps
    val boundUs = boundSeconds * 1000000L
    val bucket = (c: Column) => floor(unix_micros(c) / boundUs)
    val l = left
      .withColumn("_probe", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("_b", bucket(col(tsCol)) + col("_probe"))
      .drop("_probe")
    val r = right
      .withColumnRenamed(tsCol, s"r_$tsCol")
      .withColumn("_b", bucket(col(s"r_$tsCol")))
    // each right row lives in exactly one bucket, so a qualifying pair
    // matches exactly one probe — no dedup needed afterwards
    l.join(r, Seq(keyCol, "_b"))
      .filter(abs(unix_micros(col(tsCol)) - unix_micros(col(s"r_$tsCol")))
        <= boundUs)
      .drop("_b")
  }

  /** Ordered-funnel analysis — the product-analytics staple: per user,
    * step i is reached when its event occurs STRICTLY AFTER the user's
    * step-(i−1) anchor time (earliest qualifying occurrence becomes the
    * next anchor — the standard "first touch" funnel semantics, immune
    * to out-of-order duplicates). Reports users reached and step-over-
    * step conversion.
    *
    * Shape: one user-keyed min-aggregation per step, each joined to the
    * previous anchor — \|steps\| bounded passes over user-keyed equi
    * joins (the key is the natural partitioner; no windows, no
    * per-user sort). Counts are exact; conversions floored at 1e-6.
    *
    * Per-step persist contract: each step's anchor table is persisted
    * BEFORE its count action, so step i's `.count()` reads the cached
    * anchors instead of re-executing the cumulative join lineage back
    * to `events` — a k-step funnel scans events once per step (O(k)
    * scans), not O(k²). Each anchor set is unpersisted as soon as the
    * next step has materialized on top of it.
    */
  def funnel(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    var anchors = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
      .persist()
    var counts = Vector(anchors.count())
    steps.tail.foreach { st =>
      val prev = anchors
      anchors = events.filter(col(typeCol) === st)
        .join(prev, Seq(userCol))
        .filter(col(tsCol) > col("_t"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
        .persist()
      counts :+= anchors.count() // materializes on top of cached prev
      prev.unpersist()
    }
    anchors.unpersist()
    steps.indices.map { i =>
      val conv = if (i == 0) 1.0
        else math.floor(counts(i) * 1000000.0 / counts(i - 1)) / 1e6
      (i + 1L, steps(i), counts(i), conv)
    }.toDF("step", "event_type", "n_users", "conversion")
  }

  /** Mann–Kendall trend test over daily volumes (q237) — the
    * SIGNIFICANCE companion to the point-estimate trend ops (EWMA shows
    * drift, CUSUM names the day a known-size shift crossed; MK answers
    * "is there ANY monotone trend at all, and is it more than chance"
    * without assuming a distribution or shift size — Mann 1945,
    * Kendall 1975, the standard hydrology/monitoring test):
    * S = Σ_{i<j} sign(xⱼ − xᵢ) over time-ordered daily counts,
    * Var(S) = [n(n−1)(2n+5) − Σₜ t(t−1)(2t+5)]/18 with the tie
    * correction, z = (S∓1)/√Var (continuity-corrected), two-sided
    * α = 0.05 verdict at |z| ≥ 1.96.
    *
    * Exactness: S and the Var numerator are exact BIGINTs (the pair
    * table and tie groups are both calendar-bounded — days², never
    * rows); z is one identical IEEE chain on exact longs, 1e-6-floored;
    * all-tied series (Var = 0) report NULL z and "none".
    *
    * Scale shape: one map-side-combining (key, day) count; the pair
    * self-join and tie aggregation run on the collapsed daily table.
    */
  def mannKendall(events: DataFrame, typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val daily = events
      .groupBy(col(typeCol).as("k"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val s = daily.as("a").join(daily.as("b"),
        col("a.k") === col("b.k") && col("a.day") < col("b.day"))
      .select(col("a.k").as("k"),
        when(col("b.cnt") > col("a.cnt"), 1L)
          .when(col("b.cnt") < col("a.cnt"), -1L).otherwise(0L).as("sg"))
      .groupBy(col("k")).agg(sum(col("sg")).as("s"))
    val n = daily.groupBy(col("k")).agg(count(lit(1)).as("n"))
    val ties = daily.groupBy(col("k"), col("cnt"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("k"))
      .agg(sum(col("t") * (col("t") - 1) * (col("t") * 2L + 5)).as("tsum"))
    // LEFT from the key census: a single-day key has no pairs at all —
    // it must still report (S = 0, Var = 0, trend none), not vanish
    n.join(s, Seq("k"), "left").join(ties, "k")
      .withColumn("s", coalesce(col("s"), lit(0L)))
      .withColumn("v18",
        col("n") * (col("n") - 1) * (col("n") * 2L + 5) - col("tsum"))
      .withColumn("z6", when(col("v18") > 0, floor(
        (when(col("s") > 0, col("s") - 1)
          .when(col("s") < 0, col("s") + 1).otherwise(0L)).cast("double")
          / sqrt(col("v18").cast("double") / 18.0) * 1000000L)
        .cast("long")))
      .select(col("k").as(typeCol), col("n").as("n_days"),
        col("s").as("s_stat"), col("v18"),
        (col("z6").cast("double") / 1e6).as("z"),
        when(col("z6").isNull || abs(col("z6")) < 1960000L, "none")
          .when(col("s") > 0, "increasing").otherwise("decreasing")
          .as("trend"))
  }

  /** Nelson–Aalen cumulative hazard over user lifetimes (q235) — the
    * censoring-honest churn read [[retention]] can't give: a user whose
    * last event is RECENT hasn't churned, they just haven't been
    * observed long enough, and counting them as gone biases every naive
    * "days active" histogram. Lifetime = days between a user's first
    * and last event; a user is an observed churn only when their last
    * event predates the corpus horizon by ≥ `censorDays` (otherwise
    * they're censored: still in every risk set up to their duration,
    * never an event). H(t) = Σ_{tᵢ ≤ t} dᵢ/nᵢ (Nelson 1972, Aalen 1978)
    * with nᵢ = users whose duration ≥ tᵢ — chosen over Kaplan–Meier
    * because the estimator is a pure SUM of per-step rationals: each
    * step quantizes to an exact integer millionth and the cumulative is
    * an exact BIGINT fold (KM's product would need order-dependent float
    * multiplication or a ln/exp round-trip).
    *
    * Scale shape: one (user) min/max aggregation (map-side combinable),
    * then EVERYTHING runs on the collapsed (duration → counts) table —
    * the two cumulative windows are value-set-sized (bounded by the
    * calendar, not users).
    */
  def hazard(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", censorDays: Int = 7): DataFrame = {
    val span = events.groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("first_d"),
        max(to_date(col(tsCol))).as("last_d"))
    val horizon = events.agg(max(to_date(col(tsCol))).as("gmax"))
    val u = span.crossJoin(broadcast(horizon))
      .select(datediff(col("last_d"), col("first_d")).cast("long")
          .as("dur"),
        (datediff(col("gmax"), col("last_d")) >= censorDays)
          .as("observed"))
    val g = u.groupBy(col("dur")).agg(count(lit(1)).as("n_enter"),
      sum(when(col("observed"), 1L).otherwise(0L)).as("n_events"))
    val wDesc = org.apache.spark.sql.expressions.Window
      .orderBy(col("dur").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val wAsc = org.apache.spark.sql.expressions.Window
      .orderBy(col("dur"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    g.withColumn("n_risk", sum(col("n_enter")).over(wDesc))
      .withColumn("h6", expr("n_events * 1000000 div n_risk"))
      .withColumn("ch6", sum(col("h6")).over(wAsc))
      .select(col("dur").as("duration_days"), col("n_risk"),
        col("n_events"),
        (col("h6").cast("double") / 1e6).as("hazard"),
        (col("ch6").cast("double") / 1e6).as("cum_hazard"))
  }

  /** Kaplan–Meier survival curve (q246) — the product-limit companion
    * to [[hazard]]'s sum-form: S(t) = Π_{tᵢ ≤ t} (nᵢ − dᵢ)/nᵢ, the
    * probability a user remains active past t under the same censoring
    * contract (recent last-events are censored, in every risk set up to
    * their duration, never an event). The curve every retention report
    * plots; Nelson–Aalen's exp(−H) approximates it, KM IS it.
    *
    * The hazard doc's objection to KM — an order-dependent float
    * product — dissolves under the integer SEQUENTIAL fold (the q223
    * CUSUM discipline): s₆(tᵢ) = s₆(tᵢ₋₁)·(nᵢ − dᵢ) div nᵢ from
    * s₆ = 10⁶, folded in ascending duration order over the COLLAPSED
    * (duration → counts) value set. Each step is exact integer
    * arithmetic (s₆·n ≤ 10⁶·10⁹ stays in BIGINT), the order is pinned
    * by the value set, and the oracle replays the recurrence as a
    * recursive CTE bit-for-bit. Per-step floors drift at most 10⁻⁶ per
    * step below the real product — a DEFINED quantization, not float
    * nondeterminism. Same scale shape as hazard: one user-keyed
    * aggregation, then calendar-bounded value-set work.
    */
  def kaplanMeier(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", censorDays: Int = 7): DataFrame = {
    val span = events.groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("first_d"),
        max(to_date(col(tsCol))).as("last_d"))
    val horizon = events.agg(max(to_date(col(tsCol))).as("gmax"))
    val u = span.crossJoin(broadcast(horizon))
      .select(datediff(col("last_d"), col("first_d")).cast("long")
          .as("dur"),
        (datediff(col("gmax"), col("last_d")) >= censorDays)
          .as("observed"))
    val g = u.groupBy(col("dur")).agg(count(lit(1)).as("n_enter"),
      sum(when(col("observed"), 1L).otherwise(0L)).as("n_events"))
    val wDesc = org.apache.spark.sql.expressions.Window
      .orderBy(col("dur").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val packed = g.withColumn("n_risk", sum(col("n_enter")).over(wDesc))
      .agg(array_sort(collect_list(struct(col("dur"), col("n_risk"),
        col("n_events")))).as("ds"))
    // the q223 in-plan sequential fold: calendar-bounded array, one row
    packed.withColumn("rows", expr(
      """aggregate(ds,
          CAST(array() AS ARRAY<STRUCT<dur: BIGINT, n_risk: BIGINT,
            n_events: BIGINT, s6: BIGINT>>),
          (acc, x) -> array_append(acc, struct(x.dur AS dur,
            x.n_risk AS n_risk, x.n_events AS n_events,
            (CASE WHEN size(acc) = 0 THEN 1000000L
                  ELSE element_at(acc, -1).s6 END)
              * (x.n_risk - x.n_events) div x.n_risk AS s6)))"""))
      .select(explode(col("rows")).as("r"))
      .select(col("r.dur").as("duration_days"), col("r.n_risk"),
        col("r.n_events"),
        (col("r.s6").cast("double") / 1e6).as("survival"))
  }

  /** Holt's linear-trend double exponential smoothing over per-key daily
    * volumes (q272) — the FORECASTING read beside the detector family:
    * ewmaTrend tracks the level, mannKendall/theilSen test and size a
    * trend retrospectively; Holt carries level AND trend forward and
    * answers "what does tomorrow look like", which is what capacity
    * planning actually asks of an event stream. Fixed α = 1/5,
    * β = 1/10 (the exact-rational choice that keeps every step one
    * truncating division).
    *
    * Recurrence in integer millionths, the [[cusum]] fold shape
    * (calendar-bounded per-key array, `aggregate` higher-order fold —
    * state is one 4-BIGINT struct, NEVER a per-row window):
    * l₆⁰ = x₀·10⁶, b₆⁰ = 0; then pred₆ = l₆+b₆,
    * l₆′ = (xₜ·10⁶ + 4·pred₆) div 5, b₆′ = (l₆′ − l₆ + 9·b₆) div 10,
    * one-step error err₆ = xₜ·10⁶ − pred₆ accumulating Σ|err₆|.
    * Divisions hit negative operands on declining series — Spark `div`
    * and DuckDB `//` both truncate toward zero (the verified theilSen
    * contract), so the SQL oracle replays the fold as a recursive CTE
    * bit for bit. Single-day keys report trend 0 and NULL mae.
    *
    * Output per key: n_days, final level/trend, the one-step-ahead
    * forecast l+b, and the in-sample MAE of the one-step forecasts
    * (mae₆ = Σ|err₆| div n_err) — the honesty number beside the
    * forecast.
    */
  def holtLinear(events: DataFrame, keyCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val daily = events.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("x"))
    val packed = daily.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"),
        array_sort(collect_list(struct(col("day"), col("x")))).as("ds"))
    val folded = packed.withColumn("st", expr(
      """aggregate(ds,
          CAST(NULL AS STRUCT<l6: BIGINT, b6: BIGINT,
            sae: BIGINT, nerr: BIGINT>),
          (acc, d) -> CASE WHEN acc IS NULL THEN
              struct(d.x * 1000000 AS l6, CAST(0 AS BIGINT) AS b6,
                CAST(0 AS BIGINT) AS sae, CAST(0 AS BIGINT) AS nerr)
            ELSE struct(
              (d.x * 1000000 + 4 * (acc.l6 + acc.b6)) div 5 AS l6,
              ((d.x * 1000000 + 4 * (acc.l6 + acc.b6)) div 5
                - acc.l6 + 9 * acc.b6) div 10 AS b6,
              acc.sae + abs(d.x * 1000000 - acc.l6 - acc.b6) AS sae,
              acc.nerr + 1 AS nerr) END)"""))
    folded.select(col(keyCol), col("n_days"),
      (col("st.l6").cast("double") / 1e6).as("level"),
      (col("st.b6").cast("double") / 1e6).as("trend"),
      ((col("st.l6") + col("st.b6")).cast("double") / 1e6)
        .as("forecast_next"),
      when(col("st.nerr") > 0,
        expr("st.sae div st.nerr").cast("double") / 1e6).as("mae"))
  }
}
