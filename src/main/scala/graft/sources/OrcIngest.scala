package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ORC as a first-class lake format (q273) — the columnar sibling to the
  * CSV side door ([[CsvIngest]]) and the parquet mainline: warehouses
  * migrating from Hive ship ORC, and a lake engine that cannot read or
  * write it sends every such backfill through a lossy re-export. Spark's
  * native ORC datasource (orc-core is on every Spark classpath) gets the
  * same treatment parquet gets in the table layer: partitioned layout,
  * predicate pushdown, partition pruning — and the round trip is
  * hash-checked, not assumed.
  *
  * The check is STRUCTURAL: Spark writes lineitem to a
  * partitioned-by-returnflag ORC layout and reads it back with a
  * date-bounded aggregate; the ORACLE computes the same aggregate from
  * the original parquet. They can only hash-match if the ORC round trip
  * preserved every row, every partition key, and every value the
  * aggregate touches — the oracle never reads ORC (DuckDB has no ORC
  * reader), which is exactly the point.
  */
object OrcIngest {

  /** Write → read → aggregate round trip. Quantities are integral by
    * data contract, so totals are exact BIGINT sums (the CsvIngest
    * discipline — a double sum would ride aggregation order). The temp
    * layout is deleted after the |flags×status|-bounded result
    * materializes; the returned frame is a local relation.
    */
  def roundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val li = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
    val dirPath = Files.createTempDirectory("graft-orc")
    val dir = dirPath.toString
    li.write.mode("overwrite").partitionBy("l_returnflag").orc(dir)
    try {
      val back = spark.read.orc(dir)
      // timestamp-typed comparison (not a cast-to-date) so the predicate
      // pushes into the ORC scan; session tz is UTC everywhere
      val out = back
        .filter(col("l_shipdate") <= lit("1998-09-02 23:59:59")
          .cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          min(col("l_orderkey")).as("min_orderkey"),
          max(col("l_orderkey")).as("max_orderkey"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
      val rows = out.collect()
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq, 1), out.schema)
    } finally {
      // best-effort scratch cleanup (the CsvIngest discipline)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(dirPath.toFile)
    }
  }

  /** The partition-pruned read the layout exists for: one flag's
    * partition only. Exposed for the plan-assert spec.
    */
  def prunedRead(spark: SparkSession, dir: String, flag: String): DataFrame =
    spark.read.orc(dir).filter(col("l_returnflag") === flag)
}
