package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV as a first-class ingest format (q211) — the flat-file side door
  * every lake ingests besides its streaming path (the reference's
  * pipeline is JSON-over-Kinesis; bulk backfills arrive as delimited
  * dumps). The shape mirrors the CDC path's error contract: explicit
  * schema, PERMISSIVE parse, malformed rows captured via
  * columnNameOfCorruptRecord and DEAD-LETTERED instead of poisoning the
  * batch — the same philosophy as CdcTransformer's error sink, applied
  * to a batch file format.
  */
object CsvIngest {

  val LineitemLite: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("_corrupt", StringType)))

  /** Render lineitem-lite rows as CSV text, corrupting the quantity
    * field of a deterministic ~1/29 slice (hash of the row key) — the
    * fixture for the dead-letter path. No quoting needed: every
    * rendered column is numeric or a single-char flag.
    */
  def renderWithCorruption(li: DataFrame): DataFrame = {
    val key = col("l_orderkey") * 10 + col("l_linenumber")
    val h = ((key % 2147483648L) * 2654435761L) % 2147483647L
    li.select(concat_ws(",",
      col("l_orderkey"),
      col("l_linenumber"),
      when(h % 29 === 0, lit("oops"))
        .otherwise(col("l_quantity").cast("string")),
      col("l_returnflag")).as("value"))
  }

  /** Full round-trip: render (with planted corruption) → write text →
    * read back as schema'd CSV in PERMISSIVE mode → split clean rows
    * from dead letters → per-flag totals plus the dead-letter count.
    * Quantities are integral by data contract, so the totals are exact
    * BIGINT sums (a double sum would ride aggregation order).
    *
    * Resource discipline: the |flags|-bounded result is materialized
    * INSIDE this call, then the CSV cache is unpersisted and the temp
    * directory deleted — repeated bench/verify loops must not
    * accumulate executor storage memory or scratch disk for the
    * session lifetime. The returned frame is a local relation of the
    * (≤ |return-flags|) aggregate rows.
    */
  def roundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val li = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"))
    val dirPath = Files.createTempDirectory("graft-csv")
    val dir = dirPath.toString
    renderWithCorruption(li).write.mode("overwrite").text(dir)
    // cache() is load-bearing: Spark disallows querying ONLY the
    // corrupt-record column straight off a raw CSV scan (the parser
    // prunes columns, so _corrupt alone can't know a row is bad); the
    // documented contract is to materialize the parsed result first —
    // which the dead-letter branch below needs
    val back = spark.read.schema(LineitemLite)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(dir)
      .cache()
    try {
      val deadLetters = back.agg(
        sum(when(col("_corrupt").isNotNull, 1L).otherwise(0L))
          .as("n_malformed"))
      val out = back.filter(col("_corrupt").isNull)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
        .crossJoin(broadcast(deadLetters))
        .orderBy(col("l_returnflag"))
      // bounded collect (≤ |return-flags| rows) so cleanup can run now
      val rows = java.util.Arrays.asList(out.collect(): _*)
      spark.createDataFrame(rows, out.schema)
    } finally {
      back.unpersist()
      Files.walk(dirPath)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => { Files.deleteIfExists(p); () })
    }
  }
}
