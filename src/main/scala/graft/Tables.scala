package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided test tables (TESTDATA.md). */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Fan a narrow scan out to all cores before compute-bound per-row work
    * (regex, n-gram shingling, array math). The local test tables are
    * single-row-group parquet — unsplittable below one task — so without
    * this the whole scan-side pipeline runs on one core of 32. Adaptive:
    * when the source already plans at least `parallelism` partitions (the
    * normal case on a cluster, where inputs have many splits) this is a
    * no-op — the reshuffle only happens for the few-huge-splits corner it
    * exists to fix. (Inspecting the planned partitioning costs one plan
    * analysis, no execution.)
    */
  def fanout(df: DataFrame): DataFrame = {
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= parallelism) df
    else df.repartition(parallelism)
  }

  /** `events` carries nanosecond parquet timestamps, which Spark's reader
    * rejects ([PARQUET_TYPE_ILLEGAL]). Read them as raw ns longs
    * (legacy.parquet.nanosAsLong) and floor to microseconds — consistent
    * with engines that truncate ns → µs.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
