package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution patterns for hostile data shapes at cluster scale: skew
  * salting and bucketed co-located joins. These are plan-shaping helpers —
  * results are identical to the naive formulation; only the exchange
  * topology changes.
  */
object ScalePatterns {

  /** Salted inner equi-join for a skewed left side: left rows get a random
    * salt in [0, salts), the (smaller) right side is replicated `salts`
    * times, and the join key becomes (key, salt) — a single hot key spreads
    * over `salts` reducers instead of melting one. AQE's skew-join handles
    * moderate skew automatically; explicit salting is for the pathological
    * key that exceeds a single executor no matter how AQE splits.
    *
    * Right-side replication costs |right| × salts — use for dimension-sized
    * right sides when broadcast is too big but replication is affordable.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    require(salts > 0)
    // Salt values are partitioning-dependent (monotonically_increasing_id
    // encodes the partition index) — safe HERE because the salt never
    // reaches the output and join correctness holds for ANY salt
    // assignment: each left row joins the right replica carrying its own
    // salt, whatever that salt is. Never let this id reach merge/LWW
    // ordering or result columns.
    val salted = left.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id(), rand(42)), lit(salts)).cast("int"))
    val replicated = right.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Salted two-phase aggregation: partial count/sum per (key, salt), then
    * final per key. For a hot grouping key (one key = 30% of a 100 TB
    * table) the partial phase spreads that key over `salts` reducers; the
    * final phase aggregates `salts` partial rows per key. Results are
    * identical to the direct groupBy — only the exchange topology changes.
    * (Spark's partial/final HashAggregate already map-side-combines; the
    * explicit salt additionally splits a hot key ACROSS reducers when one
    * reducer's final-phase input would otherwise be a single giant group.)
    */
  def saltedAgg(df: DataFrame, key: String, valueCol: String,
      salts: Int = 16): DataFrame = {
    require(salts > 0)
    df.withColumn("_salt", pmod(xxhash64(col(valueCol)), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_pc"), sum(col(valueCol)).as("_ps"))
      .groupBy(col(key))
      .agg(sum(col("_pc")).cast("long").as("cnt"), sum(col("_ps")).as("total"))
  }

  /** Top frequent keys — used to pick which keys deserve isolation. */
  def heavyHitters(df: DataFrame, key: String, topK: Int = 10): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(key)).limit(topK)

  /** Skew isolation: route the heavy keys through a broadcast join and
    * everything else through the normal shuffle join, then union. The
    * classic two-path plan for when one key is 1000× the median.
    */
  def skewIsolatedJoin(left: DataFrame, right: DataFrame, key: String,
      heavyKeys: Seq[Any]): DataFrame = {
    val isHeavy = col(key).isin(heavyKeys: _*)
    val hot = left.filter(isHeavy).join(broadcast(right.filter(isHeavy)), Seq(key))
    val cold = left.filter(!isHeavy).join(right.filter(!isHeavy), Seq(key))
    hot.unionByName(cold)
  }

  /** Persist both sides bucketed by the join key so the join compiles to a
    * sort-merge join with ZERO exchanges — the co-located join layout for
    * fact-fact joins that would otherwise shuffle terabytes every query.
    * Bucketed tables go through the session catalog (`saveAsTable`) since
    * parquet-path tables can't carry bucket specs.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Key-skew diagnosis (q225) — the report a planner reads BEFORE
    * picking [[saltedJoin]]/[[saltedAgg]] factors: per keyed relation,
    * the key-frequency Gini coefficient, the heaviest key's row share,
    * and the recommended salt factor (how many ways the hot key must
    * split so no task exceeds an average partition's share). The
    * advice the engine's skew helpers otherwise leave to folklore,
    * computed from the data.
    *
    * Exact staging with NO corpus-sized window: key counts collapse to
    * a frequencies-of-frequencies table (count value c → m keys), the
    * only window runs over DISTINCT count values, and the tied-rank
    * Gini fold is closed-form per class — keys ranked ascending, a
    * class at cumulative rank R with m keys and count c contributes
    * c·m·(2R + m − n) to the numerator; gini₆ = ⌊Σ·10⁶/(n·S)⌋ with
    * n = keys, S = rows. Overflow bound: c·m·2n per class needs
    * S·n < 4.6·10¹⁸ — past that lift the fold to DECIMAL(38,0).
    * salt_factor = ⌈top_count·parts/S⌉ (1 = no salting needed);
    * verdict `salt` exactly when the top key exceeds an average
    * partition (top_count·parts > S).
    */
  def keySkewReport(df: DataFrame, key: String,
      parts: Int = 32): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("c"))
    val fof = counts.groupBy(col("c")).agg(count(lit(1)).as("m"))
    val tot = fof.agg(sum(col("m")).as("nk"),
      sum(col("c") * col("m")).as("s"), max(col("c")).as("top_count"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("c"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    fof.withColumn("r", coalesce(sum(col("m")).over(w), lit(0L)))
      .crossJoin(broadcast(tot))
      .agg(max(col("nk")).as("n_keys"), max(col("s")).as("n_rows"),
        max(col("top_count")).as("top_count"),
        sum(expr("c * m * (2 * r + m - nk)")).as("gnum"))
      .select(col("n_keys"), col("n_rows"), col("top_count"),
        (expr("top_count * 1000000 div n_rows").cast("double") / 1e6)
          .as("top_share"),
        (expr("gnum * 1000000 div (n_keys * n_rows)").cast("double")
          / 1e6).as("gini"),
        greatest(lit(1L),
          expr(s"(top_count * $parts + n_rows - 1) div n_rows"))
          .as("salt_factor"),
        when(expr(s"top_count * $parts > n_rows"), "salt")
          .otherwise("even").as("verdict"))
  }
}
