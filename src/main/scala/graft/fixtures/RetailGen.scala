package graft.fixtures

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic distributed fixture generator — the engine's port of the
  * reference's seeded Faker generators (src/utils/gen_fake_mysql_data.py:
  * 78–90 field distributions; gen_fake_cdc_data.py envelope shape). Ports
  * the DISTRIBUTIONS, not the code: every field derives from
  * `xxhash64(trans_id, salt)` so generation is pure, seedable,
  * repartition-stable, and runs as one narrow codegen'd stage at any scale
  * (spark.range parallelizes the id space; no driver-side loops, unlike
  * the reference's 0.33 rows/s Python loop).
  *
  * Field semantics mirrored:
  *   - event ∈ {visit,view,cart,list,like,purchase}   (:81)
  *   - amount = 0..100 for cart|purchase else 1        (:82, P7)
  *   - device ∈ {pc,mobile,tablet}                     (:84)
  *   - sku `??%###????` 2 upper + nonzero digit + 3 digits + 4 upper (:86)
  *   - customer_id 12 digits, first nonzero            (:88)
  *   - trans_datetime uniform in a window, second granularity (:89, F10)
  */
object RetailGen {

  private def h(seed: Long, salt: Int): Column =
    abs(xxhash64(col("trans_id"), lit(seed), lit(salt)))

  private def pick(seed: Long, salt: Int, xs: Seq[String]): Column =
    element_at(array(xs.map(lit): _*), pmod(h(seed, salt), lit(xs.size)).cast("int") + 1)

  private def digits(seed: Long, salt: Int, n: Int, firstNonZero: Boolean): Column = {
    val cs = (0 until n).map { i =>
      val d = pmod(h(seed, salt * 100 + i), lit(if (i == 0 && firstNonZero) 9 else 10))
      (if (i == 0 && firstNonZero) d + 1 else d).cast("string")
    }
    concat(cs: _*)
  }

  private def uppers(seed: Long, salt: Int, n: Int): Column =
    concat((0 until n).map(i =>
      chr(pmod(h(seed, salt * 100 + i), lit(26)) + 65)): _*)

  val Events: Seq[String] = Seq("visit", "view", "cart", "list", "like", "purchase")
  val Devices: Seq[String] = Seq("pc", "mobile", "tablet")

  /** `n` retail transactions with trans_id ∈ [startId, startId+n). */
  def rows(spark: SparkSession, n: Long, seed: Long = 47L,
      startId: Long = 1L): DataFrame = {
    val event = pick(seed, 1, Events)
    spark.range(startId, startId + n)
      .select((col("id")).as("trans_id"))
      .withColumn("customer_id", digits(seed, 2, 12, firstNonZero = true))
      .withColumn("event", event)
      .withColumn("sku", concat(
        uppers(seed, 3, 2),
        (pmod(h(seed, 4), lit(9)) + 1).cast("string"),
        digits(seed, 5, 3, firstNonZero = false),
        uppers(seed, 6, 4)))
      .withColumn("amount",
        when(col("event").isin("cart", "purchase"),
          pmod(h(seed, 7), lit(101)).cast("int"))
          .otherwise(lit(1)))
      .withColumn("device", pick(seed, 8, Devices))
      .withColumn("trans_datetime", timestamp_add("SECOND",
        pmod(h(seed, 9), lit(86400L * 30)).cast("int"),
        to_timestamp(lit("2023-01-01 00:00:00"))))
  }

  /** Wrap rows in DMS-style CDC envelopes as JSON lines (the wire format
    * of FIXTURES.md §1), with a deterministic operation mix:
    * ~70% insert / ~20% update / ~10% delete keyed into `keySpace`.
    */
  def cdcJsonLines(spark: SparkSession, n: Long, keySpace: Long,
      seed: Long = 23L): DataFrame = {
    // seqno = the original dense range id, captured BEFORE remapping the
    // key into keySpace: deterministic and repartition-stable, unlike
    // monotonically_increasing_id whose values depend on partitioning —
    // and seqno orders src_timestamp/transaction-id, so LWW outcomes must
    // not change with SPARK_GRAFT_CPUS
    val base = rows(spark, n, seed)
      .withColumn("seqno", col("trans_id") - 1)
      .withColumn("trans_id", pmod(h(seed, 10), lit(keySpace)) + 1)
    val opHash = pmod(h(seed, 11), lit(10))
    val op = when(opHash < 7, "insert").when(opHash < 9, "update").otherwise("delete")
    base
      .withColumn("operation", op)
      .select(to_json(struct(
        struct(
          col("trans_id"), col("customer_id"), col("event"), col("sku"),
          col("amount"), col("device"),
          date_format(col("trans_datetime"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
            .as("trans_datetime")).as("data"),
        struct(
          date_format(timestamp_add("SECOND",
            pmod(col("seqno"), lit(864000L)).cast("int"),
            to_timestamp(lit("2023-02-01 00:00:00"))),
            "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").as("timestamp"),
          lit("data").as("record-type"),
          col("operation"),
          lit("primary-key").as("partition-key-type"),
          lit("testdb").as("schema-name"),
          lit("retail_trans").as("table-name"),
          (lit(12884900000L) + col("seqno")).as("transaction-id")).as("metadata")
      )).as("value"))
  }
}
