package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Additional relational coverage: statistical aggregates, exact
  * percentiles, array aggregation, regex predicates, scalar subqueries
  * (via the spark.sql surface), and approximate sketches (rows-only — the
  * sketch algorithms legitimately differ across engines).
  */
object Extra {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q38_stats_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          (round(corr(col("l_quantity"), col("l_extendedprice")), 4) + lit(0.0)).as("corr_qty_price"),
          (round(covar_samp(col("l_quantity"), col("l_discount")), 4) + lit(0.0)).as("cov_qty_disc"),
          // + 0.0 collapses IEEE -0.0 (a tiny-negative skew rounded to
          // zero keeps its sign bit; engines then print "-0" vs "0")
          (round(skewness(col("l_quantity")), 4) + lit(0.0)).as("skew_qty"))
        .orderBy(col("l_returnflag"))
    }),

    "q39_percentiles" -> ((s, d) => {
      // exact percentile partials buffer every value — fan the scan out so
      // the buffering/sorting is spread across cores, and ask for both
      // price percentiles from ONE aggregate (one value buffer, one final
      // sort instead of two; the buffer is the whole cost at scale)
      Tables.fanout(Tables.lineitem(s, d))
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 4).as("p50_qty"),
          expr("percentile(l_extendedprice, array(0.9, 0.99))").as("pp"))
        .select(col("l_returnflag"), col("p50_qty"),
          round(element_at(col("pp"), 1), 4).as("p90_price"),
          round(element_at(col("pp"), 2), 4).as("p99_price"))
        .orderBy(col("l_returnflag"))
    }),

    "q40_array_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          concat_ws(",", sort_array(collect_set(col("l_linestatus")))).as("statuses_csv"),
          size(collect_set(col("l_suppkey"))).cast("long").as("n_supps"))
        .orderBy(col("l_returnflag"))
    }),

    "q41_regexp_predicates" -> ((s, d) => {
      Tables.part(s, d)
        .groupBy(col("p_brand"))
        .agg(
          count(when(col("p_type").rlike("^ECONOMY"), 1)).as("n_economy"),
          count(when(col("p_name").rlike("[aeiou]{2}"), 1)).as("n_double_vowel"),
          count(lit(1)).as("n"))
        .orderBy(col("p_brand"))
    }),

    // scalar subquery through the spark.sql surface over registered views
    "q42_scalar_subquery" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("v_orders")
      s.sql(
        """SELECT o_orderpriority, count(*) AS n_above_avg
           FROM v_orders
           WHERE o_totalprice > (SELECT avg(o_totalprice) FROM v_orders)
           GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    }),

    // correlated EXISTS through spark.sql (analyzer decorrelates to a join)
    "q43_correlated_exists" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("v_orders2")
      Tables.lineitem(s, d).createOrReplaceTempView("v_lineitem2")
      s.sql(
        """SELECT o_orderstatus, count(*) AS n
           FROM v_orders2 o
           WHERE EXISTS (SELECT 1 FROM v_lineitem2 l
                         WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
           GROUP BY o_orderstatus ORDER BY o_orderstatus""")
    }),

    // the streaming window() function, batch-evaluated
    "q45_window_fn" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("total_value"))
        .select(col("window.start").as("hour_ts"), col("event_type"),
          col("cnt"), col("total_value"))
        .orderBy(col("hour_ts"), col("event_type"))
    }),

    // the streaming session_window() function, batch-evaluated; output uses
    // epoch micros (raw session-start timestamps differ in sub-us precision
    // across engines)
    "q46_session_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("start_us"),
          col("n_events"))
        .orderBy(col("user_id"), col("start_us"))
    }),

    // pivot: rows -> columns per l_linestatus
    "q47_pivot" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O", "P"))
        .agg(round(sum(col("l_quantity")), 2))
        .orderBy(col("l_returnflag"))
    }),

    // unpivot/melt: wide -> long
    "q48_unpivot" -> ((s, d) => {
      Tables.part(s, d)
        .groupBy(col("p_brand"))
        .agg(round(avg(col("p_retailprice")), 4).as("avg_price"),
          round(avg(col("p_size")), 4).as("avg_size"))
        .unpivot(Array(col("p_brand")),
          Array(col("avg_price"), col("avg_size")), "metric", "value")
        .orderBy(col("p_brand"), col("metric"))
    }),

    // as-of join (composed: union + window carry-forward)
    "q54_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
      val clicks = ev.filter(col("event_type") === "click")
      graft.operators.TemporalJoins.asofJoin(
        purchases, clicks, "user_id", "ts", Seq("event_id"))
        .select(col("user_id"), col("event_id"), col("asof_event_id"))
        .orderBy(col("event_id"))
    }),

    // bounded range join (bucket equi-join + residual filter)
    "q55_range_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val r = ev.select(col("user_id"), col("event_id").as("r_event_id"), col("ts"))
      graft.operators.TemporalJoins.boundedRangeJoin(
        ev, r, "user_id", "ts", boundSeconds = 300)
        .filter(col("event_id") < col("r_event_id"))
        .select(col("user_id"), col("event_id"), col("r_event_id"))
        .orderBy(col("user_id"), col("event_id"), col("r_event_id"))
    }),

    // salted two-phase aggregation (skew pattern; identical results to the
    // direct groupBy, verified by the plain-SQL oracle)
    "q60_salted_agg" -> ((s, d) =>
      graft.operators.ScalePatterns.saltedAgg(Tables.events(s, d),
          "event_type", "value")
        .withColumn("total", round(col("total"), 2))
        .orderBy(col("event_type"))),

    // approximate sketches: rows-only (HLL/KLL implementations differ)
    "q44_approx_sketches" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          round(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)), 2).as("approx_p50"))
        .orderBy(col("l_returnflag"))
    }),

    // q44's ERROR-CONTRACT twin: the sketch values themselves cannot be
    // oracle-replayed (HLL register layouts / KLL compaction differ per
    // engine), but the accuracy CONTRACT can — emit the exact answers
    // plus booleans asserting each estimate lands within its documented
    // bound (HLL default rsd 0.05 → |err| ≤ 2·rsd; percentile_approx
    // accuracy 1000 → rank error ≤ 0.001, asserted at 10× slack via the
    // exact 0.49/0.51 quantile bracket). The oracle computes the exact
    // side and TRUE literals for the contract columns: a sketch
    // regression flips a boolean and fails the hash.
    // Round-13 optimization (guide §2.3/§3): the single mixed aggregation
    // made Catalyst's count-DISTINCT rewrite key the partial aggregate by
    // (l_returnflag, l_partkey) — so the HLL registers (52 longs) and BOTH
    // exact-percentile value maps were maintained PER PARTKEY GROUP
    // (~20k·|flags| heavy states, plan op (2) Results[57]) and merged
    // through two exchanges. Splitting the distinct count from the
    // sketch/percentile pass keeps each aggregation in its cheap shape:
    // the distinct pass carries no object state, the sketch pass holds
    // |flags| states per task. Same functions over the same rows — values
    // identical; the 3-row join broadcasts. (Warm 4.2 s → 0.9 s; at scale
    // this is the difference between O(|partkeys|) and O(|flags|) percentile
    // maps per task.)
    "q103_sketch_bounds" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val exact = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      val sketches = li.groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey")).as("hll"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("ap50"),
          expr("percentile(l_extendedprice, 0.49)").as("p_lo"),
          expr("percentile(l_extendedprice, 0.51)").as("p_hi"))
      exact.join(sketches, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("hll") - col("exact_parts"))
            <= col("exact_parts") * lit(0.10)).as("hll_within"),
          (col("ap50") >= col("p_lo") && col("ap50") <= col("p_hi"))
            .as("p50_within"))
        .orderBy(col("l_returnflag"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q103_sketch_bounds" ->
      """SELECT l_returnflag,
         count(DISTINCT l_partkey) AS exact_parts,
         TRUE AS hll_within,
         TRUE AS p50_within
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q60_salted_agg" ->
      """SELECT event_type, count(*) AS cnt, round(sum(value), 2) AS total
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q38_stats_agg" ->
      """SELECT l_returnflag,
         round(stddev_samp(l_quantity), 4) AS sd_qty,
         round(corr(l_quantity, l_extendedprice), 4) + 0.0 AS corr_qty_price,
         round(covar_samp(l_quantity, l_discount), 4) + 0.0 AS cov_qty_disc,
         round(skewness(l_quantity), 4) + 0.0 AS skew_qty
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q39_percentiles" ->
      """SELECT l_returnflag,
         round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity), 4) AS p50_qty,
         round(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p90_price,
         round(percentile_cont(0.99) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p99_price
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q40_array_agg" ->
      """SELECT l_returnflag,
         array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses_csv,
         CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q41_regexp_predicates" ->
      """SELECT p_brand,
         count(CASE WHEN regexp_matches(p_type, '^ECONOMY') THEN 1 END) AS n_economy,
         count(CASE WHEN regexp_matches(p_name, '[aeiou]{2}') THEN 1 END) AS n_double_vowel,
         count(*) AS n
         FROM part GROUP BY p_brand ORDER BY p_brand""",
    "q42_scalar_subquery" ->
      """SELECT o_orderpriority, count(*) AS n_above_avg
         FROM orders
         WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q43_correlated_exists" ->
      """SELECT o_orderstatus, count(*) AS n
         FROM orders o
         WHERE EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q54_asof_join" ->
      """SELECT l.user_id, l.event_id, r.event_id AS asof_event_id
         FROM (SELECT * FROM events WHERE event_type = 'purchase') l
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
           ON l.user_id = r.user_id AND l.ts >= r.ts
         ORDER BY l.event_id""",
    "q55_range_join" ->
      """SELECT a.user_id, a.event_id, b.event_id AS r_event_id
         FROM events a JOIN events b
           ON a.user_id = b.user_id AND a.event_id < b.event_id
          AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 300000000
         ORDER BY a.user_id, a.event_id, b.event_id""",
    "q47_pivot" ->
      """SELECT l_returnflag,
         round(sum(CASE WHEN l_linestatus='F' THEN l_quantity END),2) AS F,
         round(sum(CASE WHEN l_linestatus='O' THEN l_quantity END),2) AS O,
         round(sum(CASE WHEN l_linestatus='P' THEN l_quantity END),2) AS P
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q48_unpivot" ->
      """WITH a AS (SELECT p_brand, round(avg(p_retailprice),4) AS avg_price,
                     round(avg(p_size),4) AS avg_size
              FROM part GROUP BY p_brand)
         SELECT p_brand, 'avg_price' AS metric, avg_price AS value FROM a
         UNION ALL
         SELECT p_brand, 'avg_size' AS metric, avg_size AS value FROM a
         ORDER BY p_brand, metric""",
    "q45_window_fn" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_ts, event_type,
         count(*) AS cnt, round(sum(value),2) AS total_value
         FROM events GROUP BY 1, 2 ORDER BY hour_ts, event_type""",
    "q46_session_window" ->
      """SELECT user_id, CAST(min(epoch_us(ts)) AS BIGINT) AS start_us,
         count(*) AS n_events
         FROM (SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
               FROM (SELECT user_id, ts, event_id,
                     CASE WHEN lag(ts) OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) IS NULL
                          OR epoch_us(ts) - epoch_us(lag(ts) OVER (
                            PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
                            >= 1800000000
                          THEN 1 ELSE 0 END AS new_s
                     FROM events) a) b
         GROUP BY user_id, sess_id ORDER BY user_id, start_us"""
  )
}
