package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.table.{IncrementalView, MergeTable}

/** Incrementally-maintained aggregate view vs full recompute, across
  * inserts, group-moving updates, deletes, compaction, and rollback.
  */
class IncrementalViewSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def batch(rows: (Long, String, Int, String, String, Long)*): DataFrame =
    rows.toSeq.toDF("trans_id", "event", "amount", "operation", "_ts", "transaction_id")
      .withColumn("customer_id", lit("c"))
      .withColumn("sku", lit("s"))
      .withColumn("device", lit("pc"))
      .withColumn("trans_datetime", lit(ts("2023-01-16 06:00:00")))
      .withColumn("src_timestamp", to_timestamp($"_ts"))
      .drop("_ts")

  private def viewState(v: IncrementalView): Map[String, (Long, Double)] =
    v.read(spark).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

  private def recompute(t: MergeTable): Map[String, (Long, Double)] =
    t.read(spark).groupBy($"event")
      .agg(count(lit(1)).as("n"), sum($"amount").cast("double").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

  test("incremental maintenance == recompute across the DML lifecycle") {
    val t = MergeTable.retailTrans(tmpDir("ivt"))
    val view = new IncrementalView(t, tmpDir("ivv"), Seq("event"), Some("amount"))

    t.applyBatch(batch(
      (1L, "cart", 10, "insert", "2023-01-01 00:00:01", 1L),
      (2L, "list", 5, "insert", "2023-01-01 00:00:02", 2L),
      (3L, "cart", 7, "insert", "2023-01-01 00:00:03", 3L)))
    val (f0, _) = view.refresh(spark)
    assert(f0 === -1L) // first refresh is the full compute
    assert(viewState(view) === recompute(t))

    // update that MOVES a row across groups + a plain in-group update
    t.applyBatch(batch(
      (2L, "cart", 6, "update", "2023-01-01 00:01:00", 4L),
      (3L, "cart", 9, "update", "2023-01-01 00:01:01", 5L)))
    val (f1, t1) = view.refresh(spark)
    assert(f1 >= 0 && t1 > f1) // incremental path taken
    assert(viewState(view) === recompute(t))

    // delete emptying a group entirely -> group disappears from the view
    t.applyBatch(batch(
      (1L, "cart", 10, "delete", "2023-01-01 00:02:00", 6L),
      (2L, "cart", 6, "delete", "2023-01-01 00:02:01", 7L),
      (3L, "cart", 9, "delete", "2023-01-01 00:02:02", 8L)))
    val (f2, _) = view.refresh(spark)
    assert(f2 >= 0)
    assert(viewState(view) === recompute(t))
    assert(!viewState(view).contains("cart"))

    // no-op refresh
    val before = view.refreshedVersion.get
    assert(view.refresh(spark) === ((before, before)))
  }

  test("refresh spanning multiple commits and a compaction stays incremental") {
    val t = MergeTable.retailTrans(tmpDir("ivt2"))
    val view = new IncrementalView(t, tmpDir("ivv2"), Seq("event"), Some("amount"))
    t.applyBatch(batch((1L, "cart", 1, "insert", "2023-01-01 00:00:01", 1L)))
    view.refresh(spark)

    t.applyBatch(batch(
      (2L, "list", 2, "insert", "2023-01-01 00:01:00", 2L),
      (1L, "cart", 11, "update", "2023-01-01 00:01:01", 3L)))
    t.applyBatch(batch((3L, "like", 3, "insert", "2023-01-01 00:02:00", 4L)))
    t.compact(spark)
    t.applyBatch(batch((2L, "list", 2, "delete", "2023-01-01 00:03:00", 5L)))

    val (f, _) = view.refresh(spark)
    assert(f >= 0) // compact is layout-only: no resync, still incremental
    assert(viewState(view) === recompute(t))
  }

  test("streaming CDC pipeline keeps a registered view continuously fresh") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.streaming.Trigger
    import graft.fixtures.GoldenCorpus
    import graft.stream.CdcPipeline

    val landing = tmpDir("ivl")
    val tableRoot = tmpDir("ivlt")
    val t = MergeTable.retailTrans(tableRoot)
    val view = new IncrementalView(t, tmpDir("ivlv"), Seq("event"), Some("amount"))
    Files.write(Paths.get(landing, "000-insert.jsonl"),
      (GoldenCorpus.insertOnlyLines.mkString("\n") + "\n").getBytes)
    Files.write(Paths.get(landing, "001-dml.jsonl"),
      (GoldenCorpus.dmlLines.mkString("\n") + "\n").getBytes)

    // one file per micro-batch: batch 0 seeds the view (full compute),
    // batch 1's DML drives the incremental path
    val cfg = CdcPipeline.Config(landing, tableRoot, tmpDir("ivle"), tmpDir("ivlc"),
      trigger = Trigger.AvailableNow(), maxFilesPerTrigger = Some(1),
      views = Seq(view))
    CdcPipeline.start(spark, cfg).awaitTermination(60000)

    assert(view.refreshedVersion.contains(t.latestVersion))
    assert(viewState(view) === recompute(t))
  }

  test("rollback forces a full recompute via the resync marker") {
    val t = MergeTable.retailTrans(tmpDir("ivt3"))
    val view = new IncrementalView(t, tmpDir("ivv3"), Seq("event"), Some("amount"))
    t.applyBatch(batch((1L, "cart", 1, "insert", "2023-01-01 00:00:01", 1L)))
    val v0 = t.latestVersion
    view.refresh(spark)
    t.applyBatch(batch((2L, "list", 2, "insert", "2023-01-01 00:01:00", 2L)))
    t.rollbackTo(v0)
    val (f, _) = view.refresh(spark)
    assert(f === -1L) // resync -> full
    assert(viewState(view) === recompute(t))
  }
}
