package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.table.MergeTable

class MergeTableSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** (trans_id, event, amount, op, src_ts, tx_id) → applyBatch-shaped DF */
  private def batch(rows: (Long, String, Int, String, String, Long)*): DataFrame =
    rows.toSeq.toDF("trans_id", "event", "amount", "operation", "_ts", "transaction_id")
      .withColumn("customer_id", lit("c"))
      .withColumn("sku", lit("s"))
      .withColumn("device", lit("pc"))
      .withColumn("trans_datetime", lit(ts("2023-01-16 06:00:00")))
      .withColumn("src_timestamp", to_timestamp($"_ts"))
      .drop("_ts")

  private def state(t: MergeTable): Map[Long, (String, Int)] =
    t.read(spark).select($"trans_id", $"event", $"amount")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap

  test("insert then update then delete by key") {
    val t = MergeTable.retailTrans(tmpDir("mt"))
    t.applyBatch(batch(
      (1L, "cart", 10, "insert", "2023-01-01 00:00:01", 1L),
      (2L, "list", 1, "insert", "2023-01-01 00:00:02", 2L)))
    assert(state(t) === Map(1L -> ("cart", 10), 2L -> ("list", 1)))

    t.applyBatch(batch((1L, "cart", 99, "update", "2023-01-01 00:01:00", 3L)))
    assert(state(t) === Map(1L -> ("cart", 99), 2L -> ("list", 1)))

    t.applyBatch(batch((2L, "list", 1, "delete", "2023-01-01 00:02:00", 4L)))
    assert(state(t) === Map(1L -> ("cart", 99)))
  }

  test("last-write-wins within one batch (insert+update+delete same key)") {
    val t = MergeTable.retailTrans(tmpDir("mt"))
    t.applyBatch(batch(
      (7L, "visit", 1, "insert", "2023-01-01 00:00:01", 1L),
      (7L, "visit", 50, "update", "2023-01-01 00:00:02", 2L),
      (8L, "cart", 5, "insert", "2023-01-01 00:00:03", 3L),
      (8L, "cart", 5, "delete", "2023-01-01 00:00:04", 4L)))
    assert(state(t) === Map(7L -> ("visit", 50)))
  }

  test("tiebreak on transaction_id when timestamps equal/null") {
    val t = MergeTable.retailTrans(tmpDir("mt"))
    t.applyBatch(batch(
      (9L, "like", 1, "insert", "2023-01-01 00:00:01", 10L),
      (9L, "like", 77, "update", "2023-01-01 00:00:01", 11L)))
    assert(state(t) === Map(9L -> ("like", 77)))
  }

  test("update that moves the row across partitions does not duplicate") {
    val t = MergeTable.retailTrans(tmpDir("mt"))
    t.applyBatch(batch((3L, "cart", 10, "insert", "2023-01-01 00:00:01", 1L)))
    t.applyBatch(batch((3L, "purchase", 10, "update", "2023-01-01 00:01:00", 2L)))
    assert(state(t) === Map(3L -> ("purchase", 10)))
    t.compact(spark)
    assert(state(t) === Map(3L -> ("purchase", 10)))
  }

  test("replayed batchId is a no-op (exactly-once on at-least-once input)") {
    val t = MergeTable.retailTrans(tmpDir("mt"))
    val b = batch((4L, "cart", 10, "insert", "2023-01-01 00:00:01", 1L))
    t.applyBatch(b, Some("b0"))
    val v = t.latestVersion
    t.applyBatch(b, Some("b0"))
    assert(t.latestVersion === v)
    assert(state(t) === Map(4L -> ("cart", 10)))
  }

  test("auto-compaction at delete-file threshold; state preserved") {
    val t = MergeTable.retailTrans(tmpDir("mt"), threshold = 3)
    t.applyBatch(batch(
      (1L, "cart", 1, "insert", "2023-01-01 00:00:01", 1L),
      (2L, "cart", 2, "insert", "2023-01-01 00:00:01", 2L),
      (3L, "cart", 3, "insert", "2023-01-01 00:00:01", 3L),
      (4L, "cart", 4, "insert", "2023-01-01 00:00:01", 4L)))
    t.applyBatch(batch((1L, "cart", 1, "delete", "2023-01-01 00:01:00", 5L)))
    t.applyBatch(batch((2L, "cart", 2, "delete", "2023-01-01 00:02:00", 6L)))
    assert(t.currentSnapshot.get.deleteFiles.nonEmpty)
    t.applyBatch(batch((3L, "cart", 3, "delete", "2023-01-01 00:03:00", 7L)))
    // threshold hit → compacted: no tombstones, shuffle-free reads again
    val snap = t.currentSnapshot.get
    assert(snap.deleteFiles.isEmpty)
    assert(!snap.requiresDedup)
    assert(state(t) === Map(4L -> ("cart", 4)))
  }

  test("insert-only tables read without dedup flag") {
    val t = MergeTable.retailTrans(tmpDir("mt"))
    t.applyBatch(batch((1L, "cart", 1, "insert", "2023-01-01 00:00:01", 1L)))
    t.applyBatch(batch((2L, "list", 2, "insert", "2023-01-01 00:00:02", 2L)))
    assert(!t.currentSnapshot.get.requiresDedup)
    assert(state(t).keySet === Set(1L, 2L))
  }

  test("time travel reads historical snapshots") {
    val t = MergeTable.retailTrans(tmpDir("mt"))
    t.applyBatch(batch((1L, "cart", 10, "insert", "2023-01-01 00:00:01", 1L)))
    val v0 = t.latestVersion
    t.applyBatch(batch((1L, "cart", 99, "update", "2023-01-01 00:01:00", 2L)))
    assert(t.read(spark, Some(v0)).select($"amount").as[Int].collect() === Array(10))
    assert(t.read(spark).select($"amount").as[Int].collect() === Array(99))
    assert(t.history.size === 2)
  }

  test("empty table reads as empty DataFrame with schema") {
    val t = MergeTable.retailTrans(tmpDir("mt"))
    val df = t.read(spark)
    assert(df.count() === 0)
    assert(df.columns === graft.model.Schemas.LakeTableSchema.fields.map(_.name))
  }
}
