package graft

import java.sql.Date

import org.apache.spark.sql.functions._
import graft.table.Scd2

/** SCD2 dimension history (q215): change/no-op/new-key/latest-wins
  * semantics and closed-history passthrough.
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("changed closes+reopens, no-op is zero churn, history passes through") {
    val current = Seq(
      // key 1: one closed ancestor + an open row
      (1L, "A", d("2023-01-01"), Option(d("2023-06-01")), false),
      (1L, "B", d("2023-06-01"), None: Option[Date], true),
      (2L, "A", d("2023-01-01"), None: Option[Date], true),
      (3L, "C", d("2023-01-01"), None: Option[Date], true))
      .toDF("k", "seg", "valid_from", "valid_to", "is_current")
    val updates = Seq(
      (1L, "B2", d("2024-02-01")),   // real change
      (2L, "A", d("2024-02-01")),    // no-op: same attrs
      (9L, "NEW", d("2024-02-01")),  // brand-new key
      // key 3: two updates in one batch — only the latest applies
      (3L, "MID", d("2024-01-15")),
      (3L, "FINAL", d("2024-02-01")))
      .toDF("k", "seg", "ts")
    val out = Scd2.applyBatch(current, updates, "k", Seq("seg"), "ts")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDate(2).toString,
        Option(r.getDate(3)).map(_.toString), r.getBoolean(4)))
      .toSet
    assert(out === Set(
      // key 1: untouched closed ancestor, closed-out B, new open B2
      (1L, "A", "2023-01-01", Some("2023-06-01"), false),
      (1L, "B", "2023-06-01", Some("2024-02-01"), false),
      (1L, "B2", "2024-02-01", None, true),
      // key 2: no-op → the ORIGINAL open row, zero churn
      (2L, "A", "2023-01-01", None, true),
      // key 3: latest-in-batch wins; MID never materializes
      (3L, "C", "2023-01-01", Some("2024-02-01"), false),
      (3L, "FINAL", "2024-02-01", None, true),
      // key 9: first interval opens
      (9L, "NEW", "2024-02-01", None, true)))
    // invariant: exactly one open row per live key
    val opens = out.filter(_._5).groupBy(_._1).view.mapValues(_.size)
    assert(opens.values.forall(_ == 1))
  }

  test("same-key same-ts ties resolve repartition-invariantly") {
    val current = Seq((1L, "A", d("2023-01-01"), None: Option[Date], true))
      .toDF("k", "seg", "valid_from", "valid_to", "is_current")
    val updates = Seq(
      (1L, "Z", d("2024-02-01")), (1L, "B", d("2024-02-01")),
      (1L, "M", d("2024-02-01")))
      .toDF("k", "seg", "ts")
    def winner(parts: Int, seqCol: Option[String] = None,
        up: org.apache.spark.sql.DataFrame = updates): String =
      Scd2.applyBatch(current, up.repartition(parts), "k", Seq("seg"),
          "ts", seqCol)
        .filter(col("is_current")).collect().map(_.getString(1)).head
    // content tiebreak (no seq): attr-ascending — "B" — on ANY layout
    assert(winner(1) === "B")
    assert(winner(17) === "B")
    assert(winner(3) === winner(17))
    // caller-supplied stable sequence: highest _seq wins, any layout
    val seqUp = Seq((1L, "Z", d("2024-02-01"), 10L),
      (1L, "B", d("2024-02-01"), 30L), (1L, "M", d("2024-02-01"), 20L))
      .toDF("k", "seg", "ts", "_seq")
    assert(winner(1, Some("_seq"), seqUp) === "B")
    assert(winner(17, Some("_seq"), seqUp) === "B")
  }

  test("q215 fixture: row accounting matches the planted change slice") {
    val cust = Tables.customer(spark, "/root/testdata/sf0.001")
    val n = cust.count()
    val h = ((col("c_custkey") % 2147483648L) * 2654435761L) % 2147483647L
    val nChanged = cust.filter(h % 4 === 0).count()
    val out = SparkEntry.queries("q215_scd2")(spark, "/root/testdata/sf0.001")
    assert(out.count() === n + nChanged, "one extra row per changed key")
    assert(out.filter(col("is_current")).count() === n)
    assert(out.filter(!col("is_current")).count() === nChanged)
    // the no-op slice (h%4==1) must still carry its ORIGINAL valid_from
    assert(out.filter(h % 4 === 1 && col("valid_from") =!=
      lit(Date.valueOf("2024-01-01"))).count() === 0)
  }

  test("scd2Ingest: streaming dimension maintenance with O(changed) " +
      "commits, exactly-once across epochs and a crash replay") {
    import java.sql.Timestamp
    import graft.table.MergeTable
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.types.StructType
    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
    val root = java.nio.file.Files.createTempDirectory("scd2s").toString
    val dim = new MergeTable(s"$root/dim",
      StructType.fromDDL("row_id STRING, k BIGINT, seg STRING, " +
        "valid_from TIMESTAMP, valid_to TIMESTAMP, is_current BOOLEAN"),
      keyCol = "row_id", partitionCol = None).create()
    // bootstrap two open rows — row_id via the CANONICAL derivation
    // (a hand-formatted id would fork the interval identity)
    dim.appendAll(Seq(
      (1L, "A", ts("2023-01-01"), None: Option[Timestamp], true),
      (2L, "A", ts("2023-01-01"), None: Option[Timestamp], true))
      .toDF("k", "seg", "valid_from", "valid_to", "is_current")
      .withColumn("row_id", Scd2.rowId("k"))
      .select("row_id", "k", "seg", "valid_from", "valid_to", "is_current"))

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = Scd2.scd2Ingest(mem.toDF().toDF("k", "seg", "ts"), dim,
        "k", Seq("seg"), "ts")
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      // epoch 0: key 1 changes, key 2 no-op, key 9 brand new
      mem.addData((1L, "B", ts("2024-02-01")), (2L, "A", ts("2024-02-01")),
        (9L, "NEW", ts("2024-02-01")))
      q.processAllAvailable()
      // epoch 1: key 1 changes again (chain grows)
      mem.addData((1L, "C", ts("2024-03-01")))
      q.processAllAvailable()
    } finally q.stop()

    val out = dim.read(spark)
      .select("k", "seg", "valid_to", "is_current").collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getTimestamp(2)).map(_.toString.take(10)),
        r.getBoolean(3))).toSet
    assert(out === Set(
      (1L, "A", Some("2024-02-01"), false),
      (1L, "B", Some("2024-03-01"), false),
      (1L, "C", None, true),
      (2L, "A", None, true), // no-op: untouched, zero churn
      (9L, "NEW", None, true)))
    // O(changed) commits: epoch 0 wrote 3 delta rows (1 close + 2 opens),
    // epoch 1 wrote 2 — never the whole dimension
    // crash replay: re-applying epoch 1's batch against the post-apply
    // state is a no-op (epoch-keyed id short-circuits; even content-wise
    // the update now matches the open row)
    val vBefore = dim.latestVersion
    dim.applyBatch(Seq((1L, "C",
        ts("2024-03-01"), None: Option[Timestamp], true, "update"))
      .toDF("k", "seg", "valid_from", "valid_to", "is_current",
        "operation").withColumn("row_id", Scd2.rowId("k")), Some("scd2-1"))
    assert(dim.latestVersion === vBefore, "replayed epoch commits nothing")
  }

  test("scd2Ingest openSide: O(open) per-epoch read, side == dim open rows, " +
      "crash between the two commits converges on replay") {
    import java.sql.Timestamp
    import graft.table.MergeTable
    import org.apache.spark.sql.types.StructType
    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
    def mkDim(root: String) = new MergeTable(s"$root/dim",
      StructType.fromDDL("row_id STRING, k BIGINT, seg STRING, " +
        "valid_from TIMESTAMP, valid_to TIMESTAMP, is_current BOOLEAN"),
      keyCol = "row_id", partitionCol = None).create()
    def mkSide(root: String) = new MergeTable(s"$root/open",
      StructType.fromDDL("k BIGINT, seg STRING, " +
        "valid_from TIMESTAMP, valid_to TIMESTAMP, is_current BOOLEAN"),
      keyCol = "k", partitionCol = None).create()
    def bootstrap(dim: MergeTable): Unit = dim.appendAll(Seq(
      (1L, "A", ts("2023-01-01"), None: Option[Timestamp], true),
      (2L, "A", ts("2023-01-01"), None: Option[Timestamp], true))
      .toDF("k", "seg", "valid_from", "valid_to", "is_current")
      .withColumn("row_id", Scd2.rowId("k"))
      .select("row_id", "k", "seg", "valid_from", "valid_to", "is_current"))
    val e0 = Seq((1L, "B", ts("2024-02-01")), (2L, "A", ts("2024-02-01")),
      (9L, "NEW", ts("2024-02-01"))).toDF("k", "seg", "ts")
    val e1 = Seq((1L, "C", ts("2024-03-01"))).toDF("k", "seg", "ts")
    def dimState(dim: MergeTable) = dim.read(spark)
      .select("row_id", "k", "seg", "valid_to", "is_current").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        Option(r.getTimestamp(3)).map(_.toString.take(10)),
        r.getBoolean(4))).toSet

    // reference run: both epochs uninterrupted through the side path
    val rootA = java.nio.file.Files.createTempDirectory("scd2oA").toString
    val dimA = mkDim(rootA); val sideA = mkSide(rootA); bootstrap(dimA)
    Scd2.seedOpenSide(spark, dimA, sideA)
    assert(sideA.read(spark).count() === 2, "seed = the open rows")
    Scd2.scd2EpochApply(e0, 0, dimA, "k", Seq("seg"), "ts", None, Some(sideA))
    Scd2.scd2EpochApply(e1, 1, dimA, "k", Seq("seg"), "ts", None, Some(sideA))
    // end state identical to the no-side path on the same epochs
    val rootB = java.nio.file.Files.createTempDirectory("scd2oB").toString
    val dimB = mkDim(rootB); bootstrap(dimB)
    Scd2.scd2EpochApply(e0, 0, dimB, "k", Seq("seg"), "ts", None, None)
    Scd2.scd2EpochApply(e1, 1, dimB, "k", Seq("seg"), "ts", None, None)
    assert(dimState(dimA) === dimState(dimB),
      "openSide path and full-scan path produce the same dimension")
    // O(open): the side table holds one row per LIVE key (3), never the
    // interval history (dim is at 5 rows after two change epochs)
    assert(sideA.read(spark).count() === 3)
    assert(dimA.read(spark).count() === 5)
    val sideRows = sideA.read(spark).select("k", "seg").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(sideRows === Set((1L, "C"), (2L, "A"), (9L, "NEW")),
      "side == dim's open rows")
    // idempotent replay of a COMPLETED epoch: both commits no-op
    val (dv, sv) = (dimA.latestVersion, sideA.latestVersion)
    Scd2.scd2EpochApply(e1, 1, dimA, "k", Seq("seg"), "ts", None, Some(sideA))
    assert(dimA.latestVersion === dv && sideA.latestVersion === sv)

    // crash BETWEEN the two commits: run epoch 1 on a fresh pair, but
    // pre-apply only the dim commit (what a crash after dim.applyBatch
    // leaves behind), then replay the full epoch — the replay recomputes
    // the identical delta from the STALE side, dim no-ops on its epoch
    // key, side completes; end state == the uninterrupted reference
    val rootC = java.nio.file.Files.createTempDirectory("scd2oC").toString
    val dimC = mkDim(rootC); val sideC = mkSide(rootC); bootstrap(dimC)
    Scd2.seedOpenSide(spark, dimC, sideC)
    Scd2.scd2EpochApply(e0, 0, dimC, "k", Seq("seg"), "ts", None, Some(sideC))
    val staleDelta = Scd2.deltaBatch(sideC.read(spark), e1,
        "k", Seq("seg"), "ts", None)
      .withColumn("row_id", Scd2.rowId("k"))
      .withColumn("operation", lit("update"))
    dimC.applyBatch(staleDelta, Some("scd2-1")) // "crash" happens here
    assert(sideC.read(spark).count() === 3 &&
      sideC.read(spark).filter(col("seg") === "C").count() === 0,
      "side is one epoch behind after the simulated crash")
    Scd2.scd2EpochApply(e1, 1, dimC, "k", Seq("seg"), "ts", None, Some(sideC))
    assert(dimState(dimC) === dimState(dimA), "replay converges")
    assert(sideC.read(spark).select("k", "seg").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet === sideRows)
  }
}
