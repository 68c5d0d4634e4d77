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

  /** The three-regime HLL correction over columns `e_raw` / `v` (Flajolet
    * et al. §4): small range (E ≤ 2.5m with empty registers) → linear
    * counting m·ln(m/V); LARGE range (E > 2³²/30) → −2³²·ln(1 − E/2³²),
    * de-biasing the 32-bit-hash collision saturation as true cardinality
    * approaches 2³² (without it the estimate biases LOW from ~1.4e8 —
    * exactly the regime a rolling-distinct-users metric reaches at the
    * claimed scale); otherwise the raw estimate. Branch order is part of
    * the contract — the SQL oracles replay the same CASE in the same
    * order. Hard ceiling regardless: a 32-bit hash family cannot count
    * past ~2³² distincts; shard the keyspace (extra group column) above
    * that.
    */
  private val TwoP32 = 4294967296.0
  private def hllCorrect(m: Int): Column =
    when(col("e_raw") <= 2.5 * m && col("v") > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / col("v").cast("double")))
      .when(col("e_raw") > TwoP32 / 30.0,
        lit(-TwoP32) * log(lit(1.0) - col("e_raw") / TwoP32))
      .otherwise(col("e_raw"))

  /** Fold a register table keyed by `keyCol` into (keyCol, estimate):
    * the exact-integer Z sum (a raw double sum would make the estimate
    * depend on aggregation order), empty-register back-fill, and the
    * three-regime correction. The ONE estimate path — [[hllReport]] and
    * [[rollingDistinct]] both end here, and the branch spec drives it
    * directly with synthetic registers (real data can't reach the
    * large-range regime in a test).
    */
  def estimateRegisters(regs: DataFrame, keyCol: String,
      b: Int = 10): DataFrame = {
    val m = 1 << b
    val scaleBit = 32 - b + 1
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    regs.groupBy(col(keyCol)).agg(
        sum(expr(s"CAST(power(2, $scaleBit - mr) AS BIGINT)")).as("z_num"),
        count(lit(1)).as("used"))
      .withColumn("v", lit(m.toLong) - col("used"))
      .withColumn("z",
        (col("z_num") + col("v") * (1L << scaleBit)).cast("double") /
          (1L << scaleBit).toDouble)
      .withColumn("e_raw", lit(alpha) * m * m / col("z"))
      .withColumn("estimate", floor(hllCorrect(m)).cast("long"))
      .select(col(keyCol), col("estimate"))
  }

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
    val est = estimateRegisters(winRegs, "win_end", b)
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
    * remaining 32−b bits — with BOTH the small-range linear-counting and
    * the 32-bit large-range corrections ([[hllCorrect]]). The report
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
    val regs = registers(df, groupCol, valueCol, b)
    val exact = df.groupBy(col(groupCol).as("grp"))
      .agg(countDistinct(col(valueCol)).as("exact"))
    val est = estimateRegisters(regs, "grp", b)
    est.join(exact, Seq("grp"))
      .select(col("grp").as(groupCol), col("exact"), col("estimate"),
        (floor(abs(col("estimate") - col("exact")) * 1000000L /
          col("exact")).cast("double") / 1e6).as("rel_err"),
        (abs(col("estimate") - col("exact")).cast("double") <
          col("exact") * (3.0 / math.sqrt(m.toDouble))).as("within_bound"))
  }

  /** Per-key Count-Min index columns: row j's counter index is the
    * affine-mod-P family over the md5-prefix base hash — the SAME
    * portable family as the MinHash signatures — reduced mod `w`. Pure
    * integer, replayable by any engine with md5.
    */
  private def cmIdx(key: Column, j: Int, w: Int): Column =
    (Dedup.portableHash32(key.cast("string")) * lit(2L * j + 3) +
      lit(7919L * j + 1)) % lit(Dedup.PortableP) % lit(w.toLong)

  /** Portable Count-Min sketch counters (Cormode & Muthukrishnan): a
    * d×w counter grid where row j increments counter h_j(key) by the
    * key's weight. Counters are ADDITIVE, so the sketch is mergeable by
    * plain (j, idx) sum — shard-parallel builds, streaming micro-batch
    * folds, and re-ingestion all commute (spec-pinned). Built from the
    * per-key pre-aggregate rather than raw rows: counter additivity
    * makes the two exactly equal, and the pre-aggregate is the canonical
    * map-side-combining groupBy, so the d-way fan-out explodes |keys|
    * rows, never |rows|. Output is the FIXED d·w-row state regardless of
    * key cardinality — that bounded state (here 4·256 = 1 024 counters)
    * is the whole point at 100 TB, where the exact per-key table this
    * test-scale report carries as witness is the thing production
    * cannot afford to keep hot.
    */
  def cmCounters(df: DataFrame, keyCol: String, d: Int = 4,
      w: Int = 256): DataFrame = {
    val keyCnt = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val probes = (0 until d).map(j =>
      struct(lit(j.toLong).as("j"), cmIdx(col("key"), j, w).as("idx")))
    keyCnt.select(explode(array(probes: _*)).as("ji"), col("cnt"))
      .groupBy(col("ji.j").as("j"), col("ji.idx").as("idx"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Count-Min point-query report (q229): the top-`topN` keys by exact
    * frequency (the heavy-hitter regime CM exists for), each paired with
    * its sketch estimate = min over the d rows of the key's counters,
    * the overcount (CM never undercounts — estimate ≥ exact ALWAYS, by
    * construction), and the ε-bound verdict `overcount·w ≤ 3·N` (the
    * standard guarantee is overcount ≤ e·N/w w.p. 1−e^−d; 3 ≥ e keeps
    * the check in exact integers). The top-N cut breaks count ties by
    * key so both engines select the identical set.
    *
    * Scale shape: one map-side-combining per-key count; the d·w counter
    * grid and the topN probe set are both tiny and broadcast; everything
    * downstream is |topN|·d rows.
    */
  def cmReport(df: DataFrame, keyCol: String, d: Int = 4, w: Int = 256,
      topN: Int = 20): DataFrame = {
    val counters = cmCounters(df, keyCol, d, w)
    val keyCnt = df.groupBy(col(keyCol)).agg(count(lit(1)).as("exact"))
    val nTotal = keyCnt.agg(sum(col("exact")).as("n_total"))
    val top = keyCnt.orderBy(col("exact").desc, col(keyCol)).limit(topN)
    val probes = top.select(col(keyCol), col("exact"),
        explode(array((0 until d).map(j => struct(lit(j.toLong).as("j"),
          cmIdx(col(keyCol), j, w).as("idx"))): _*)).as("ji"))
      .select(col(keyCol), col("exact"),
        col("ji.j").as("j"), col("ji.idx").as("idx"))
    probes.join(broadcast(counters), Seq("j", "idx"))
      .groupBy(col(keyCol), col("exact"))
      .agg(min(col("cnt")).as("estimate"))
      .crossJoin(broadcast(nTotal))
      .select(col(keyCol), col("exact"), col("estimate"),
        (col("estimate") - col("exact")).as("overcount"),
        ((col("estimate") - col("exact")) * w <=
          lit(3L) * col("n_total")).as("within_bound"))
  }
}
