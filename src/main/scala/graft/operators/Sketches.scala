package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable sketches — the [[Dedup.minhashLshPairsPortable]] strategy
  * applied to cardinality estimation: Spark's own `approx_count_distinct`
  * is a black-box HLL++ whose hashes no SQL oracle can replay (q44 is
  * rows-only with an error-contract spec for exactly that reason). This
  * HLL is built from the md5-prefix hash family instead, so EVERY
  * register value — and therefore the estimate itself — is replayable
  * bit-for-bit by any engine with md5: the sketch algebra gets a full
  * hash-checked oracle, not just an error bound.
  */
object Sketches {

  /** Rank-of-leading-zeros over the low `wBits` bits of a 32-bit hash,
    * as a pure integer comparison cascade (ρ = position of the highest
    * set bit from the top; all-zero word → wBits+1). No log2 — float
    * boundary rounding must never decide a register.
    */
  private def rho(w: Column, wBits: Int): Column =
    // ρ = wBits − ⌊log₂ w⌋, i.e. the first threshold 2^(wBits−r) that w
    // reaches walking r = 1, 2, …; fold so r = 1 tests OUTERMOST
    (wBits to 1 by -1).foldLeft(lit(wBits + 1): Column) { (elseC, r) =>
      when(w >= (1L << (wBits - r)), lit(r)).otherwise(elseC)
    }

  /** Rolling distinct-user counts via register reuse (q196): the
    * WAU-style product metric computed the way sketches earn their keep
    * at scale — per-DAY registers are built ONCE from the raw events,
    * and every trailing `windowDays` window is answered by MERGING the
    * ≤ windowDays register sets (a ~m-row fold per window) instead of
    * re-scanning raw events per window. The report pairs each day's
    * trailing estimate with the EXACT trailing distinct count and the
    * 3/√m contract verdict — at 100 TB the exact side is the thing this
    * operator exists to avoid, and here it is the oracle's witness.
    *
    * Scale shape: one event scan builds day-registers (|days|·m rows);
    * the window spine join and merges never touch raw events again.
    */
  def rollingDistinct(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", windowDays: Int = 7, b: Int = 10): DataFrame = {
    val m = 1 << b
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val scaleBit = 32 - b + 1
    val dayRegs = registers(
      events.select(to_date(col(tsCol)).as("grp"), col(userCol)),
      "grp", userCol, b)
      .withColumnRenamed("grp", "day")
    val days = dayRegs.select(col("day")).distinct()
    val spine = days.select(col("day").as("win_end"))
    val winRegs = spine.join(dayRegs,
        col("day") <= col("win_end") &&
          col("day") > date_sub(col("win_end"), windowDays))
      .groupBy(col("win_end"), col("bucket")).agg(max(col("mr")).as("mr"))
    val folded = winRegs.groupBy(col("win_end")).agg(
      sum(expr(s"CAST(power(2, $scaleBit - mr) AS BIGINT)")).as("z_num"),
      count(lit(1)).as("used"))
    val est = folded
      .withColumn("v", lit(m.toLong) - col("used"))
      .withColumn("z",
        (col("z_num") + col("v") * (1L << scaleBit)).cast("double") /
          (1L << scaleBit).toDouble)
      .withColumn("e_raw", lit(alpha) * m * m / col("z"))
      .withColumn("estimate",
        floor(when(col("e_raw") <= 2.5 * m && col("v") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("v").cast("double")))
          .otherwise(col("e_raw"))).cast("long"))
      .select(col("win_end"), col("estimate"))
    val exact = spine.join(
        events.select(to_date(col(tsCol)).as("day"), col(userCol)),
        col("day") <= col("win_end") &&
          col("day") > date_sub(col("win_end"), windowDays))
      .groupBy(col("win_end"))
      .agg(countDistinct(col(userCol)).as("exact"))
    exact.join(est, Seq("win_end"))
      .select(col("win_end"), col("exact"), col("estimate"),
        (abs(col("estimate") - col("exact")).cast("double") <
          col("exact") * (3.0 / math.sqrt(m.toDouble))).as("within_bound"))
  }

  /** Portable-HLL distinct-count estimate per group (q195): standard
    * HyperLogLog with m = 2^`b` registers over [[Dedup.portableHash32]]
    * values — bucket = top b bits, ρ = leading-zero rank of the
    * remaining 32−b bits — including the small-range linear-counting
    * correction (E ≤ 2.5m with empty registers → m·ln(m/V)). The report
    * compares against the EXACT distinct count and flags whether the
    * relative error sits inside 3/√m (≈2σ of the HLL standard error) —
    * the q44 error contract, now hash-checked end to end.
    *
    * Scale shape: one map-side-combining (group, bucket) max-ρ
    * aggregation (the sketch is mergeable by construction — max is
    * associative/commutative), then a |groups|·m-row register fold.
    */
  /** The sketch state: one max-ρ register per (group, bucket). This IS
    * the whole algebra — [[mergeRegisters]] folds any number of
    * independently-built register tables with a bucket-max, so sharding,
    * batching, re-ingestion, and arrival order can never change the
    * final estimate (spec-pinned).
    */
  def registers(df: DataFrame, groupCol: String, valueCol: String,
      b: Int = 10): DataFrame = {
    val wBits = 32 - b
    val h = Dedup.portableHash32(col(valueCol).cast("string"))
    df.select(col(groupCol).as("grp"), h.as("h"))
      .withColumn("bucket", (col("h") / (1L << wBits)).cast("long"))
      .withColumn("rho", rho(col("h") % (1L << wBits), wBits))
      .groupBy(col("grp"), col("bucket")).agg(max(col("rho")).as("mr"))
  }

  /** Merge independently-built register tables (incremental/streaming
    * ingestion, shard-parallel sketching): bucket-max, associative,
    * commutative, idempotent.
    */
  def mergeRegisters(tables: DataFrame*): DataFrame =
    tables.reduce(_ unionByName _)
      .groupBy(col("grp"), col("bucket")).agg(max(col("mr")).as("mr"))

  def hllReport(df: DataFrame, groupCol: String, valueCol: String,
      b: Int = 10): DataFrame = {
    val m = 1 << b
    val wBits = 32 - b
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val regs = registers(df, groupCol, valueCol, b)
    // Z = Σ 2^-ρ summed as EXACT integers scaled by 2^(wBits+1): a raw
    // double sum would make the estimate depend on aggregation order
    val scaleBit = wBits + 1
    val folded = regs.groupBy(col("grp")).agg(
      sum(expr(s"CAST(power(2, $scaleBit - mr) AS BIGINT)")).as("z_num"),
      count(lit(1)).as("used"))
    val exact = df.groupBy(col(groupCol).as("grp"))
      .agg(countDistinct(col(valueCol)).as("exact"))
    // empty registers contribute 2^0 = 1 each to Z, and V of them to
    // the linear-counting branch
    val zScale = (1L << scaleBit).toDouble
    val est = folded
      .withColumn("v", lit(m.toLong) - col("used"))
      .withColumn("z",
        (col("z_num") + col("v") * (1L << scaleBit)).cast("double") / zScale)
      .withColumn("e_raw", lit(alpha) * m * m / col("z"))
      .withColumn("estimate",
        floor(when(col("e_raw") <= 2.5 * m && col("v") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("v").cast("double")))
          .otherwise(col("e_raw"))).cast("long"))
    est.join(exact, Seq("grp"))
      .select(col("grp").as(groupCol), col("exact"), col("estimate"),
        (floor(abs(col("estimate") - col("exact")) * 1000000L /
          col("exact")).cast("double") / 1e6).as("rel_err"),
        (abs(col("estimate") - col("exact")).cast("double") <
          col("exact") * (3.0 / math.sqrt(m.toDouble))).as("within_bound"))
  }
}
