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
    *
    * Scratch placement: `scratchDir` (or the `graft.scratch.dir` session
    * conf) names a CLUSTER-VISIBLE location — on a multi-node deployment
    * executors writing a driver-local java.io.tmpdir path would each hit
    * their own machine's filesystem and the read-back would silently see
    * a partial layout. Absent both, the fallback is java.io.tmpdir,
    * guarded to local-mode masters where driver and executors share one
    * filesystem.
    */
  def roundtrip(spark: SparkSession, sfDir: String,
      scratchDir: Option[String] = None): DataFrame = {
    val li = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
    val dir = scratchDir
      .orElse(spark.conf.getOption("graft.scratch.dir"))
      .map(_.stripSuffix("/") + "/graft-orc-" +
        java.util.UUID.randomUUID.toString) match {
      case Some(shared) => shared
      case None =>
        require(spark.sparkContext.isLocal,
          "OrcIngest.roundtrip on a non-local master needs a shared " +
            "scratch location: pass scratchDir or set graft.scratch.dir")
        Files.createTempDirectory("graft-orc").toString
    }
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
      // best-effort scratch cleanup through the Hadoop FS API so
      // shared (non-local-posix) scratch locations clean up too
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
      ()
    }
  }

  /** The partition-pruned read the layout exists for: one flag's
    * partition only. Exposed for the plan-assert spec.
    */
  def prunedRead(spark: SparkSession, dir: String, flag: String): DataFrame =
    spark.read.orc(dir).filter(col("l_returnflag") === flag)
}
