package graft

/** `Tables.fanout` decides from file metadata only: small file scans fan
  * out to all cores, already-parallel or non-file sources pass through
  * untouched (and the probe never physically plans the query).
  */
class FanoutSpec extends SparkSpec {
  import spark.implicits._

  test("small single-file scan fans out; in-memory data passes through") {
    val p = tmpDir("fanout") + "/small"
    spark.range(1000).selectExpr("id", "id * 2 AS v").coalesce(1)
      .write.parquet(p)
    val scan = spark.read.parquet(p)
    val fanned = Tables.fanout(scan)
    assert(fanned.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
    assert(fanned.count() === 1000)

    val local = Seq((1, "a"), (2, "b")).toDF("id", "v")
    // non-file leaves are assumed parallel — no repartition inserted
    assert(Tables.fanout(local) eq local)
  }

  test("a wide many-split scan is left untouched (no extra exchange)") {
    val p = tmpDir("fanout") + "/wide"
    spark.range(0, 4000, 1, 8).selectExpr("id", "repeat('x', 64) AS pad")
      .write.parquet(p)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1KB")
    try {
      val scan = spark.read.parquet(p)
      // estimated splits = ceil(bytes / 1KB) >> defaultParallelism → no-op
      assert(Tables.fanout(scan) eq scan)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728")
  }
}
