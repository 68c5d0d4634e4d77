package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational operator inventory (SURVEY.md §2 + §2.11): every category the
  * reference exercises or that stock Spark supplies over engine tables, each
  * expressed Spark-first with a DuckDB oracle for the driver's correctness
  * gate.
  *
  * Conventions (driver compare hashes values after sorting columns by name):
  *   - every aggregate/computed column is aliased identically in Spark + SQL
  *   - double aggregates are rounded (2dp sums, 4dp avgs) — double summation
  *     order differs across engines only below these digits
  *   - computed integers are cast to long on both sides (DuckDB year() etc.
  *     return int64; Spark returns int)
  *   - every query carries a total ORDER BY for deterministic output
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // --- aggregation (A1-family; TPC-H Q1 shape) ---
    "q01_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // --- projection + filter pushed to the parquet scan (P1/P6) ---
    "q02_filter_pushdown" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1996-04-01"
          && col("l_quantity") < 5)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // --- multi-way join, small dims broadcast ---
    "q03_region_revenue" -> ((s, d) => {
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("r_name"))
    }),

    // --- large-fact shuffle join (AQE picks strategy) ---
    "q04_priority_revenue" -> ((s, d) => {
      // pre-aggregate the fact by its join key: countDistinct(l_orderkey)
      // after an equi-join ON l_orderkey is count(*) over per-order
      // partials, so collapsing lineitem to one row per order BEFORE the
      // join removes the distinct-Expand pass and shrinks the join input
      // 4x — at 100 TB the shuffle moves per-order rows, not per-line
      val perOrder = Tables.fanout(Tables.lineitem(s, d))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      perOrder
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("rev")), 2).as("revenue"))
        .orderBy(col("o_orderpriority"))
    }),

    // --- semi join (EXISTS) ---
    "q05_semi_join" -> ((s, d) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"))
        .orderBy(col("c_mktsegment"))
    }),

    // --- anti join (NOT EXISTS) ---
    "q06_anti_join" -> ((s, d) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"))
        .orderBy(col("c_mktsegment"))
    }),

    // --- outer join with null-aware aggregation ---
    "q07_unreferenced_parts" -> ((s, d) => {
      Tables.part(s, d)
        .join(Tables.lineitem(s, d), col("p_partkey") === col("l_partkey"), "left_outer")
        .groupBy(col("p_brand"))
        .agg(count(col("l_orderkey")).as("n_lines"),
          sum(when(col("l_orderkey").isNull, 1).otherwise(0)).cast("long").as("n_unref"))
        .orderBy(col("p_brand"))
    }),

    // --- ranking window (W1/A2 shape: latest row per key) ---
    "q08_latest_order" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey").as("last_orderkey"),
          round(col("o_totalprice"), 2).as("last_totalprice"))
        .orderBy(col("o_custkey"))
    }),

    // --- analytic window with running frame ---
    "q09_running_total" -> ((s, d) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, d)
        .filter(col("l_suppkey") <= 5)
        .withColumn("running_qty", round(sum(col("l_quantity")).over(w), 2))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("running_qty"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),

    // --- global top-k (TakeOrderedAndProject) ---
    "q10_topk_orders" -> ((s, d) => {
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("total"))
    }),

    // --- distinct aggregation ---
    "q11_distinct_counts" -> ((s, d) => {
      Tables.lineitem(s, d).agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
    }),

    // --- grouping sets: rollup ---
    "q12_rollup" -> ((s, d) => {
      Tables.orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .select(col("gid"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("cnt"), col("total"))
        .orderBy(col("gid"), col("status"), col("priority"))
    }),

    // --- grouping sets: cube ---
    "q13_cube" -> ((s, d) => {
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .select(col("gid"),
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("sum_qty"))
        .orderBy(col("gid"), col("flag"), col("status"))
    }),

    // --- set operations ---
    "q14_union" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey"))
        .union(o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey")))
        .distinct()
        .agg(count(lit(1)).as("n_cust"))
    }),
    "q15_intersect" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey"))
        .intersect(o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey")))
        .agg(count(lit(1)).as("n_cust"))
    }),
    "q16_except" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey"))
        .except(o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey")))
        .agg(count(lit(1)).as("n_cust"))
    }),

    // --- scalar string functions (F-family) ---
    "q17_string_funcs" -> ((s, d) => {
      Tables.part(s, d)
        .groupBy(col("p_brand"))
        .agg(
          min(length(col("p_name"))).cast("long").as("min_name_len"),
          max(length(col("p_name"))).cast("long").as("max_name_len"),
          min(substring(col("p_type"), 1, 6)).as("type_pfx"),
          countDistinct(col("p_type")).as("n_types"))
        .withColumn("brand_up", upper(col("p_brand")))
        .select(col("p_brand"), col("brand_up"), col("min_name_len"),
          col("max_name_len"), col("type_pfx"), col("n_types"))
        .orderBy(col("p_brand"))
    }),

    // --- scalar date functions (F4/F6 analogs) ---
    "q18_date_funcs" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"))
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("yr"), col("mo"))
    }),

    // --- conditional aggregation (P7 analog) ---
    "q19_case_agg" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          round(sum(when(col("o_orderstatus") === "F", col("o_totalprice")).otherwise(0.0)), 2).as("f_total"),
          count(when(col("o_totalprice") > 100000, 1)).as("n_big"),
          round(avg(when(col("o_orderstatus") === "O", col("o_totalprice"))), 4).as("o_avg"))
        .orderBy(col("o_orderpriority"))
    }),

    // --- JSON field extraction (F2 analog on events.props) ---
    "q20_json_extract" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("k", regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("long"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).cast("long").as("sum_k"),
          max(col("k")).cast("long").as("max_k"),
          count(lit(1)).as("cnt"))
        .orderBy(col("event_type"))
    }),

    // --- last-write-wins per key (A2 on the events stream table) ---
    "q21_last_event" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("last_event"),
          col("value").as("last_value"))
        .orderBy(col("user_id"))
    }),

    // --- CDC merge simulation (J1: LWW + tombstone drop) ---
    "q22_cdc_merge_sim" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("event_type") =!= "error")
        .select(col("user_id"), col("event_type").as("last_event"),
          col("value").as("last_value"))
        .orderBy(col("user_id"))
    }),

    // --- sessionization (gaps-and-islands; streaming session-window analog) ---
    "q23_sessionize" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_s",
          when(col("prev_ts").isNull ||
            (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))) > 1800, 1)
            .otherwise(0))
        .groupBy(col("user_id"))
        .agg(sum(col("new_s")).cast("long").as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    }),

    // --- tumbling event-time window (T4 analog, batch semantics) ---
    "q24_hourly_events" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("hour_ts"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("value")), 2).as("total_value"))
        .orderBy(col("hour_ts"), col("event_type"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity),2) AS sum_qty,
         round(sum(l_extendedprice),2) AS sum_base,
         round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc,
         round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
         round(avg(l_quantity),4) AS avg_qty,
         round(avg(l_extendedprice),4) AS avg_price,
         count(*) AS cnt
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q02_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1996-04-01' AND l_quantity < 5
         ORDER BY l_orderkey, l_linenumber""",
    "q03_region_revenue" ->
      """SELECT r_name, round(sum(o_totalprice),2) AS revenue, count(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",
    "q04_priority_revenue" ->
      """SELECT o_orderpriority, count(DISTINCT l_orderkey) AS n_orders,
         round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q05_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_cust FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 400000)
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q06_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_cust FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 400000)
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q07_unreferenced_parts" ->
      """SELECT p_brand, count(l_orderkey) AS n_lines,
         CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unref
         FROM part LEFT JOIN lineitem ON p_partkey = l_partkey
         GROUP BY p_brand ORDER BY p_brand""",
    "q08_latest_order" ->
      """SELECT o_custkey, o_orderkey AS last_orderkey,
         round(o_totalprice,2) AS last_totalprice
         FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders) t
         WHERE rn = 1 ORDER BY o_custkey""",
    "q09_running_total" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
         round(sum(l_quantity) OVER (PARTITION BY l_suppkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_qty
         FROM lineitem WHERE l_suppkey <= 5
         ORDER BY l_suppkey, l_orderkey, l_linenumber""",
    "q10_topk_orders" ->
      """SELECT o_orderkey, round(o_totalprice,2) AS total FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q11_distinct_counts" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts,
         count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows FROM lineitem""",
    "q12_rollup" ->
      """SELECT CAST(grouping(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
         coalesce(o_orderstatus,'ALL') AS status,
         coalesce(o_orderpriority,'ALL') AS priority,
         count(*) AS cnt, round(sum(o_totalprice),2) AS total
         FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
         ORDER BY gid, status, priority""",
    "q13_cube" ->
      """SELECT CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid,
         coalesce(l_returnflag,'ALL') AS flag,
         coalesce(l_linestatus,'ALL') AS status,
         round(sum(l_quantity),2) AS sum_qty
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         ORDER BY gid, flag, status""",
    "q14_union" ->
      """SELECT count(*) AS n_cust FROM (
         SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
         UNION
         SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996) t""",
    "q15_intersect" ->
      """SELECT count(*) AS n_cust FROM (
         SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
         INTERSECT
         SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996) t""",
    "q16_except" ->
      """SELECT count(*) AS n_cust FROM (
         SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
         EXCEPT
         SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996) t""",
    "q17_string_funcs" ->
      """SELECT p_brand, upper(p_brand) AS brand_up,
         CAST(min(length(p_name)) AS BIGINT) AS min_name_len,
         CAST(max(length(p_name)) AS BIGINT) AS max_name_len,
         min(substring(p_type,1,6)) AS type_pfx,
         count(DISTINCT p_type) AS n_types
         FROM part GROUP BY p_brand ORDER BY p_brand""",
    "q18_date_funcs" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(month(o_orderdate) AS BIGINT) AS mo,
         count(*) AS cnt, round(sum(o_totalprice),2) AS total
         FROM orders GROUP BY 1, 2 ORDER BY yr, mo""",
    "q19_case_agg" ->
      """SELECT o_orderpriority,
         round(sum(CASE WHEN o_orderstatus='F' THEN o_totalprice ELSE 0 END),2) AS f_total,
         count(CASE WHEN o_totalprice > 100000 THEN 1 END) AS n_big,
         round(avg(CASE WHEN o_orderstatus='O' THEN o_totalprice END),4) AS o_avg
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q20_json_extract" ->
      """SELECT event_type,
         CAST(sum(CAST(regexp_extract(props,'"k": ([0-9]+)',1) AS BIGINT)) AS BIGINT) AS sum_k,
         CAST(max(CAST(regexp_extract(props,'"k": ([0-9]+)',1) AS BIGINT)) AS BIGINT) AS max_k,
         count(*) AS cnt
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q21_last_event" ->
      """SELECT user_id, event_type AS last_event, value AS last_value
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn FROM events) t
         WHERE rn = 1 ORDER BY user_id""",
    "q22_cdc_merge_sim" ->
      """SELECT user_id, event_type AS last_event, value AS last_value
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn FROM events) t
         WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id""",
    "q23_sessionize" ->
      """SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions,
         count(*) AS n_events
         FROM (SELECT user_id,
               CASE WHEN prev_ts IS NULL
                    OR (epoch_us(ts)//1000000 - epoch_us(prev_ts)//1000000) > 1800
                    THEN 1 ELSE 0 END AS new_s
               FROM (SELECT user_id, ts, event_id,
                     lag(ts) OVER (PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id) AS prev_ts
                     FROM events) a) b
         GROUP BY user_id ORDER BY user_id""",
    "q24_hourly_events" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_ts, event_type,
         count(*) AS cnt, round(sum(value),2) AS total_value
         FROM events GROUP BY 1, 2 ORDER BY hour_ts, event_type"""
  )
}
