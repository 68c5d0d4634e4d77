package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.fixtures.GoldenCorpus
import graft.stream.CdcPipeline
import graft.table.MergeTable

/** `writeStream.format("graft")` — the native streaming sink into engine
  * tables, and the source→sink loop (streaming replication with zero
  * foreachBatch plumbing).
  */
class GraftSinkSpec extends SparkSpec {
  import spark.implicits._

  private def seeded(tag: String): MergeTable = {
    val t = MergeTable.retailTrans(tmpDir(tag), threshold = 100)
    CdcPipeline.replayBatch(spark,
      GoldenCorpus.df(spark, GoldenCorpus.insertOnlyLines), t, None, Some("p1"))
    t
  }

  test("format(graft): per-row DML verbs apply; epoch ids recorded") {
    val t = seeded("gsink")
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Int, String)]
    val stream = mem.toDF()
      .select(col("_1").as("trans_id"),
        lit("999000111222").as("customer_id"),
        lit("visit").as("event"),
        lit("ZZ1111AAAA").as("sku"),
        col("_2").as("amount"),
        lit("pc").as("device"),
        to_timestamp(lit("2023-02-01 00:00:00")).as("trans_datetime"),
        col("_3").as("operation"))
    val q = stream.writeStream.format("graft")
      .option("path", t.root)
      .option("checkpointLocation", tmpDir("gsink-ck"))
      .start()
    try {
      // update an existing key, insert a new one, delete an existing one
      mem.addData((19L, 777, "update"), (5000L, 42, "insert"), (24L, 0, "delete"))
      q.processAllAvailable()
      val state = t.read(spark).select($"trans_id", $"amount")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(state(19L) === 777)
      assert(state(5000L) === 42)
      assert(!state.contains(24L))
      assert(t.read(spark).count() === 10) // 10 seed - 1 del + 1 ins
      // the recorded batch id is (checkpoint scope, epoch) — checkpoint
      // replay = no-op, but a FRESH checkpoint gets a fresh scope
      assert(t.currentSnapshot.get.appliedBatches
        .exists(b => b.startsWith("sink-") && b.endsWith("-0")))

      mem.addData((5000L, 43, "update"))
      q.processAllAvailable()
      assert(t.read(spark).filter($"trans_id" === 5000L)
        .head().getAs[Int]("amount") === 43)
    } finally q.stop()
  }

  test("rows without an operation column take defaultOperation") {
    val t = seeded("gsink2")
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Int)]
    val stream = mem.toDF()
      .select(col("_1").as("trans_id"),
        lit("999000111222").as("customer_id"),
        lit("cart").as("event"),
        lit("ZZ1111AAAA").as("sku"),
        col("_2").as("amount"),
        lit("mobile").as("device"),
        to_timestamp(lit("2023-02-01 00:00:00")).as("trans_datetime"))
    val q = stream.writeStream.format("graft")
      .option("path", t.root)
      .option("checkpointLocation", tmpDir("gsink2-ck"))
      .start()
    try {
      mem.addData((19L, 555)) // default = update → upsert
      q.processAllAvailable()
      assert(t.read(spark).filter($"trans_id" === 19L)
        .head().getAs[Int]("amount") === 555)
      assert(t.read(spark).count() === 10)
    } finally q.stop()
  }

  test("evolveSchema: drifted stream columns evolve the table through the sink") {
    val t = seeded("gevo")
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Int, String)]
    val stream = mem.toDF()
      .select(col("_1").as("trans_id"),
        lit("999000111222").as("customer_id"),
        lit("visit").as("event"),
        lit("ZZ1111AAAA").as("sku"),
        col("_2").as("amount"),
        lit("pc").as("device"),
        to_timestamp(lit("2023-02-01 00:00:00")).as("trans_datetime"),
        col("_3").as("coupon_code"))
    val q = stream.writeStream.format("graft")
      .option("path", t.root)
      .option("evolveSchema", "true")
      .option("checkpointLocation", tmpDir("gevo-ck"))
      .start()
    try {
      mem.addData((19L, 777, "SAVE10"), (5000L, 42, "NEW5"))
      q.processAllAvailable()
      val evolved = MergeTable.open(t.root)
      assert(evolved.schema.fieldNames.contains("coupon_code"))
      val state = evolved.read(spark)
        .select($"trans_id", $"amount", $"coupon_code")
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap
      assert(state(19L) === ((777, "SAVE10")))
      assert(state(5000L) === ((42, "NEW5")))
      // pre-drift rows read the evolved column as null
      assert(state.valuesIterator.count(_._2 == null) === 9)
    } finally q.stop()

    // the A2 shape through the sink: a restarted stream WITHOUT the
    // evolved column (and without evolveSchema) must still apply — the
    // sink null-fills payload columns the stream doesn't carry
    val mem2 = MemoryStream[(Long, Int)]
    val plain = mem2.toDF()
      .select(col("_1").as("trans_id"),
        lit("999000111222").as("customer_id"),
        lit("cart").as("event"),
        lit("ZZ1111AAAA").as("sku"),
        col("_2").as("amount"),
        lit("mobile").as("device"),
        to_timestamp(lit("2023-02-02 00:00:00")).as("trans_datetime"))
    val q2 = plain.writeStream.format("graft")
      .option("path", t.root)
      .option("checkpointLocation", tmpDir("gevo-ck2"))
      .start()
    try {
      mem2.addData((6000L, 9))
      q2.processAllAvailable()
      val row = MergeTable.open(t.root).read(spark)
        .filter($"trans_id" === 6000L).head()
      assert(row.getAs[Int]("amount") === 9)
      assert(row.getAs[String]("coupon_code") === null)
    } finally q2.stop()
  }

  test("wiping the checkpoint renews the replay scope: epoch 0 applies again") {
    val t = seeded("gscope")
    val ck = tmpDir("gscope-ck")
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def runOnce(id: Long, amount: Int): Unit = {
      val mem = MemoryStream[(Long, Int)]
      val stream = mem.toDF()
        .select(col("_1").as("trans_id"),
          lit("999000111222").as("customer_id"),
          lit("visit").as("event"),
          lit("ZZ1111AAAA").as("sku"),
          col("_2").as("amount"),
          lit("pc").as("device"),
          to_timestamp(lit("2023-02-01 00:00:00")).as("trans_datetime"),
          lit("insert").as("operation"))
      val q = stream.writeStream.format("graft")
        .option("path", t.root)
        .option("checkpointLocation", ck)
        .start()
      try { mem.addData((id, amount)); q.processAllAvailable() } finally q.stop()
    }
    runOnce(6000L, 1)
    // wipe the checkpoint — the standard reprocess flow. The NEW query's
    // epochs restart at 0; with a path-hashed scope its batches would be
    // silently dropped as replays of the previous incarnation.
    def rm(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.list(p).forEach(rm(_))
      java.nio.file.Files.delete(p)
    }
    rm(java.nio.file.Paths.get(ck))
    runOnce(6001L, 2)
    val keys = t.read(spark).select($"trans_id")
      .collect().map(_.getLong(0)).toSet
    assert(keys.contains(6000L) && keys.contains(6001L))
  }

  test("source→sink loop: streaming replication with no foreachBatch") {
    val src = seeded("gsrc")
    val dst = MergeTable.retailTrans(tmpDir("gdst"), threshold = 100)
    val changes = spark.readStream.format("graft-changes")
      .option("path", src.root).load()
      // change feed → DML verbs: upsert = update, delete = delete; _seq
      // orders replays within a batch exactly like a transaction id
      .withColumn("operation",
        when(col("_change_type") === "delete", "delete").otherwise("update"))
      .withColumn("transaction_id", col("_seq"))
      .drop("_seq", "_change_type")
    val q = changes.writeStream.format("graft")
      .option("path", dst.root)
      .option("checkpointLocation", tmpDir("grepl-ck"))
      .start()
    try {
      q.processAllAvailable() // bootstrap: the seed commit streams over
      assert(dst.read(spark).count() === src.read(spark).count())
      // live DML on the source replicates
      CdcPipeline.replayBatch(spark,
        GoldenCorpus.df(spark, GoldenCorpus.dmlLines), src, None, Some("p2"))
      src.updateWhere(spark, $"trans_id" === 21, Map("amount" -> lit(1234)))
      q.processAllAvailable()
      val s = src.read(spark).select($"trans_id", $"amount")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val d = dst.read(spark).select($"trans_id", $"amount")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(d === s)
      assert(d(21L) === 1234)
    } finally q.stop()
  }
}
