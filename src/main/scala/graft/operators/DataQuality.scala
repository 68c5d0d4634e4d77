package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-quality tooling — the Deequ/Great-Expectations pillar a lake
  * engine ships next to its tables: one-pass column PROFILING, a
  * composable CONSTRAINT-CHECK battery (not-null / unique / range /
  * accepted-values / referential integrity), and partition-completeness
  * gap detection. The reference delegates this to managed-service
  * dashboards; here the same reports are engine queries with exact
  * semantics, so they hash-check against an independent SQL engine and
  * compose with the table layer (run the battery on a WAP branch before
  * `publish_branch`, profile a snapshot via time travel).
  */
object DataQuality {

  /** One profiling row per requested column: exact row/null/distinct
    * counts plus type-split min/max — numerics as floor-quantized
    * doubles, strings (and timestamps, formatted to whole seconds) as
    * strings, so no cross-engine number-to-text formatting is ever
    * compared.
    *
    * Shape: one SINGLE-COLUMN aggregation per profiled column, unioned —
    * each scan is column-pruned to exactly the bytes it profiles (the
    * columnar-native shape; a fused all-columns aggregate with several
    * exact DISTINCTs plans as an Expand that replicates every row per
    * distinct stream — measured ~6× slower here), each agg keeps its one
    * distinct in the ordinary two-phase partial-agg plan, and the
    * branches run as independent jobs. At 100 TB swap in
    * `approx_count_distinct` via `exactDistinct = false` for one-pass
    * partials per column.
    */
  def profile(df: DataFrame, columns: Seq[String] = Nil,
      exactDistinct: Boolean = true): DataFrame = {
    val cols = if (columns.nonEmpty) columns
      else df.schema.fields.map(_.name).toSeq
    val parts = cols.map { c =>
      val f = df.schema(c)
      val isNum = f.dataType match {
        case _: NumericType => true
        case _ => false
      }
      val str: Column = f.dataType match {
        case TimestampType | TimestampNTZType =>
          date_format(col(c), "yyyy-MM-dd HH:mm:ss")
        case DateType => date_format(col(c), "yyyy-MM-dd")
        case _ => col(c).cast("string")
      }
      val dist =
        if (exactDistinct) countDistinct(col(c))
        else approx_count_distinct(col(c))
      df.select(col(c))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
          dist.as("n_distinct"),
          (if (isNum) floor(min(col(c)).cast("double") * 10000L)
            .cast("double") / 1e4 else lit(null).cast("double"))
            .as("min_num"),
          (if (isNum) floor(max(col(c)).cast("double") * 10000L)
            .cast("double") / 1e4 else lit(null).cast("double"))
            .as("max_num"),
          (if (isNum) lit(null).cast("string") else min(str)).as("min_str"),
          (if (isNum) lit(null).cast("string") else max(str)).as("max_str"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_null"),
          (floor(col("n_null") * 1000000L / col("n_rows")).cast("double")
            / 1e6).as("null_frac"),
          col("n_distinct"), col("min_num"), col("max_num"),
          col("min_str"), col("max_str"))
    }
    parts.reduce(_ unionByName _)
  }

  /** Not-null constraint. */
  def notNull(df: DataFrame, c: String, rule: String): DataFrame =
    satisfies(df, col(c).isNotNull, rule)

  /** Uniqueness constraint: violations = rows carrying a duplicated key
    * (all members of every >1 group count, the deequ convention).
    */
  def unique(df: DataFrame, c: String, rule: String): DataFrame =
    df.groupBy(col(c)).agg(count(lit(1)).as("n"))
      .agg(lit(rule).as("rule"), sum(col("n")).as("n_checked"),
        sum(when(col("n") > 1, col("n")).otherwise(0L)).as("n_violations"))

  /** Predicate constraint (range / accepted values / any row predicate):
    * violations = rows where `ok` is not true (nulls violate).
    */
  def satisfies(df: DataFrame, ok: Column, rule: String): DataFrame =
    df.agg(lit(rule).as("rule"), count(lit(1)).as("n_checked"),
      sum(when(ok, 0L).otherwise(1L)).as("n_violations"))

  /** Referential integrity: child FK values (nulls exempt, the SQL FK
    * convention) that match no parent PK. Broadcast-friendly when the
    * parent key set is small; an equi left-anti at any scale.
    */
  def refIntegrity(child: DataFrame, fk: String, parent: DataFrame,
      pk: String, rule: String): DataFrame = {
    val orphans = child.filter(col(fk).isNotNull)
      .join(parent.select(col(pk).as(fk)).distinct(), Seq(fk), "left_anti")
      .agg(coalesce(count(lit(1)), lit(0L)).as("n_violations"))
    child.filter(col(fk).isNotNull).agg(count(lit(1)).as("n_checked"))
      .crossJoin(orphans)
      .select(lit(rule).as("rule"), col("n_checked"), col("n_violations"))
  }

  /** Union a battery of checks into the report the gate reads:
    * every rule with its counts and verdict.
    */
  def battery(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_ unionByName _)
      .withColumn("passed", col("n_violations") === 0L)

  /** Partition completeness — the freshness/observability query: daily
    * row counts over the FULL calendar spine [min day, max day], so a
    * silent empty day (upstream outage, failed backfill) surfaces as an
    * explicit `is_gap` row instead of a missing one. Spine = one
    * row-local `sequence` over two broadcast scalars; counts are one
    * map-side-collapsing agg keyed by day.
    */
  def partitionCompleteness(df: DataFrame, tsCol: String): DataFrame = {
    val day = col(tsCol).cast("date")
    val bounds = df.agg(min(day).as("lo"), max(day).as("hi"))
    val spine = bounds.select(
      explode(sequence(col("lo"), col("hi"))).as("day"))
    val counts = df.select(day.as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n_rows"))
    spine.join(counts, Seq("day"), "left")
      .select(col("day").cast("string").as("day"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"))
      .withColumn("is_gap", col("n_rows") === 0L)
  }

  /** Benford's-law floored-millionth expected shares for first digits
    * 1..9 (p_d = log₁₀(1 + 1/d)): CONSTANTS, not computed — a runtime
    * log10 would put an engine-specific ulp inside every expected
    * share. They sum to 999 995 (five floors), documented not patched.
    */
  private[graft] val Benford6: Seq[(Int, Long)] = Seq(
    1 -> 301029L, 2 -> 176091L, 3 -> 124938L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66946L, 7 -> 57991L, 8 -> 51152L, 9 -> 45757L)

  /** Benford first-digit audit per group (q276) — the numeric
    * data-quality read beside [[profile]]: naturally-generated
    * multiplicative quantities (prices, populations, transaction
    * amounts) follow log₁₀(1+1/d) first-digit shares; fabricated,
    * truncated, or re-scaled columns don't, which is why auditors run
    * exactly this census. Values < 1 in absolute value (no leading
    * digit in the integer part) and zeros are excluded and counted.
    *
    * Determinism: the first digit comes from the DECIMAL STRING of
    * ⌊|x|⌋ (integer-to-string is exact in every engine — no float
    * formatting anywhere); observed shares are share6 = n_d·10⁶ div n;
    * expected shares are the pinned [[Benford6]] constants; the
    * total-variation distance folds as Σ|share6 − p6| div 2 over the
    * DENSE 9-digit spine (an absent digit contributes its full
    * expected mass). `suspect` = TV > 0.05 — the conventional audit
    * line.
    *
    * Scale: one (group, digit) census with map-side partials, a
    * broadcast 9-row spine, |groups|·9-row output.
    */
  def benfordAudit(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val digits = df
      .withColumn("_m", floor(abs(col(valueCol))).cast("long"))
      .withColumn("_d", when(col("_m") >= 1L,
        substring(col("_m").cast("string"), 1, 1).cast("int")))
    val counted = digits.groupBy(col(groupCol).as("_g"))
      .agg(count(lit(1)).as("_rows"),
        sum(when(col("_d").isNull, 1L).otherwise(0L)).as("n_excluded"))
    val census = digits.filter(col("_d").isNotNull)
      .groupBy(col(groupCol).as("_g"), col("_d")).agg(count(lit(1)).as("_c"))
    val spine = counted.select(col("_g"), col("n_excluded"),
        (col("_rows") - col("n_excluded")).as("_n"))
      .crossJoin(broadcast(Benford6.toDF("_d", "_p6")))
      .join(census, Seq("_g", "_d"), "left")
      .withColumn("_c", coalesce(col("_c"), lit(0L)))
      .withColumn("_share6", when(col("_n") > 0,
        expr("_c * 1000000 div _n")).otherwise(lit(0L)))
    val tv = spine.groupBy(col("_g"))
      .agg(sum(abs(col("_share6") - col("_p6"))).as("_tvs"))
      .withColumn("_tv6", expr("_tvs div 2"))
      .drop("_tvs")
    spine.join(tv, "_g")
      .select(col("_g").as(groupCol), col("_d").as("digit"),
        col("_n").as("n"), col("n_excluded"), col("_c").as("n_digit"),
        (col("_share6").cast("double") / 1e6).as("obs_share"),
        (col("_p6").cast("double") / 1e6).as("benford_share"),
        (col("_tv6").cast("double") / 1e6).as("tv"),
        (col("_tv6") > 50000L).as("suspect"))
  }
}
