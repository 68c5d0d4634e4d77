package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.CorpusStreams

class CorpusStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  private def runToMemory(df: DataFrame, name: String): DataFrame = {
    val q = df.writeStream
      .queryName(name)
      .format("memory")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    spark.table(name)
  }

  test("streaming corpus prep: quality gate, lang tag, in-watermark dedup") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val good = "the quick brown fox jumps over the lazy dog again and again"
    val spanish = "el perro y el gato en la casa de la abuela con un amigo"
    in.addData(
      (1L, ts(0), good),
      (2L, ts(1), good),              // exact duplicate -> dropped
      (3L, ts(2), "too short"),       // < minWords -> dropped
      (4L, ts(3), "1 2 3 4 5 6 7 8 9 10 11 12"), // digit-heavy -> dropped
      (5L, ts(4), spanish))
    val out = runToMemory(
      CorpusStreams.prepare(
        in.toDF.toDF("doc_id", "ingest_ts", "text")),
      "corpus_prep")
    val rows = out.select("doc_id", "lang_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.keySet === Set(1L, 5L))
    assert(rows(1L) === "en")
    assert(rows(5L) === "es")
  }

  test("streaming prep matches the batch formulation on surviving rows") {
    implicit val sqlCtx = spark.sqlContext
    val docsB = Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("ingest_ts", lit(ts(0)))
      .select("doc_id", "ingest_ts", "text")
    val in = MemoryStream[(Long, Timestamp, String)]
    in.addData(docsB.as[(Long, Timestamp, String)].collect().toSeq)
    val streamed = runToMemory(
      CorpusStreams.prepare(in.toDF.toDF("doc_id", "ingest_ts", "text")),
      "corpus_prep_b")
      .select("content_hash")
    // batch equivalent: same filters + one survivor per distinct text
    val batch = graft.operators.TextAnalysis.withQuality(docsB)
      .filter(col("n_words") >= 5 && col("digit_ratio") <= 0.30)
      .select(md5(col("text")).as("content_hash")).distinct()
    assert(streamed.count() === batch.count())
    assert(streamed.distinct().count() === batch.count())
  }

  test("curatedIngest: kept docs and full audit rows land exactly-once per epoch") {
    import graft.table.MergeTable
    import org.apache.spark.sql.types.StructType
    val root = java.nio.file.Files.createTempDirectory("curated").toString
    val out = new MergeTable(s"$root/corpus",
      StructType.fromDDL("doc_id BIGINT, text STRING, lang STRING"),
      keyCol = "doc_id", partitionCol = None).create()
    val audit = new MergeTable(s"$root/audit",
      StructType.fromDDL("doc_id BIGINT, gate_exact BOOLEAN, gate_lang BOOLEAN, " +
        "gate_gopher BOOLEAN, gate_quality BOOLEAN, gate_pii BOOLEAN, " +
        "keep BOOLEAN, first_fail STRING"),
      keyCol = "doc_id", partitionCol = None).create()

    val good = "the quick brown fox jumps over the lazy dog and runs " +
      "through the forest with great speed while birds sing songs above"
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val q = CorpusStreams.curatedIngest(
        mem.toDF().toDF("doc_id", "text", "lang"), out, audit)
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      mem.addData((1L, good, "en"), (2L, good, "en"), (3L, "x y z", "en"),
        (4L, good + " more", "zh"))
      q.processAllAvailable()
      mem.addData((10L, good + " fresh words", "en"),
        (11L, good + " contact me at jane.doe@example.com", "en"))
      q.processAllAvailable()
    } finally q.stop()

    assert(out.read(spark).select("doc_id").as[Long].collect().sorted
      === Seq(1L, 10L))
    val a = audit.read(spark)
      .select("doc_id", "keep", "first_fail").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
    assert(a.keySet === Set(1L, 2L, 3L, 4L, 10L, 11L))
    assert(a(1L) === ((true, "")) && a(10L) === ((true, "")))
    assert(a(2L) === ((false, "exact_dup")))
    assert(a(3L) === ((false, "gopher")))
    assert(a(4L) === ((false, "lang")))
    assert(a(11L) === ((false, "pii")))
  }

  test("checkedIngest: CHECK-gated partial acceptance lands both slices " +
      "exactly-once across two epochs and a crash between commits") {
    import graft.table.MergeTable
    import org.apache.spark.sql.types.StructType
    val root = java.nio.file.Files.createTempDirectory("checked").toString
    val out = new MergeTable(s"$root/clean",
      StructType.fromDDL("doc_id BIGINT, n_tokens BIGINT"),
      keyCol = "doc_id", partitionCol = None).create()
    val dl = new MergeTable(s"$root/dead",
      StructType.fromDDL("doc_id BIGINT, n_tokens BIGINT, violated STRING"),
      keyCol = "doc_id", partitionCol = None).create()
    out.appendAll(Seq((0L, 5L)).toDF("doc_id", "n_tokens"))
    out.addCheckConstraint(spark, "tokens_positive", "n_tokens > 0")

    // simulate a crash that fell BETWEEN the two commits of epoch 0: the
    // clean slice already landed under the derived id, the dead one did
    // not — the streaming replay below must apply ONLY the missing slice
    out.appendAll(Seq((1L, 10L), (2L, 20L)).toDF("doc_id", "n_tokens"),
      Some("checked-0-clean"))

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val q = CorpusStreams.checkedIngest(
        mem.toDF().toDF("doc_id", "n_tokens"), out, dl)
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      // epoch 0 replays the pre-crash batch: 2 clean (already committed)
      // + 2 violators (missing)
      mem.addData((1L, 10L), (2L, 20L), (3L, 0L), (4L, -7L))
      q.processAllAvailable()
      // epoch 1: fresh batch, one violator
      mem.addData((10L, 1L), (11L, -1L))
      q.processAllAvailable()
    } finally q.stop()

    val clean = out.read(spark).select("doc_id", "n_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clean === Map(0L -> 5L, 1L -> 10L, 2L -> 20L, 10L -> 1L),
      s"clean slice exactly-once (no duplicate epoch-0 rows): $clean")
    val dead = dl.read(spark).select("doc_id", "violated").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(dead === Map(3L -> "tokens_positive", 4L -> "tokens_positive",
      11L -> "tokens_positive"),
      s"dead slice exactly-once with the failing constraint named: $dead")
  }

  test("driftMonitor: per-epoch PSI rows land exactly-once, shift alarms") {
    import graft.table.MergeTable
    import org.apache.spark.sql.types.StructType
    val root = java.nio.file.Files.createTempDirectory("driftmon").toString
    val out = new MergeTable(s"$root/drift",
      StructType.fromDDL("drift_id BIGINT, epoch BIGINT, bucket BIGINT, " +
        "n_before BIGINT, n_after BIGINT, p DOUBLE, q DOUBLE, psi DOUBLE"),
      keyCol = "drift_id", partitionCol = None).create()
    // baseline: scores uniform over 0..49
    val baseline = spark.range(100)
      .select(col("id"), (col("id") % 50).as("score"))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val q = CorpusStreams.driftMonitor(
        mem.toDF().toDF("id", "score"), baseline, "score", out)
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      mem.addData((1L to 100L).map(i => (i, i % 50)): _*) // epoch 0: clone
      q.processAllAvailable()
      mem.addData((101L to 200L).map(i => (i, 45L + (i % 5))): _*) // shifted
      q.processAllAvailable()
    } finally q.stop()
    val rows = out.read(spark)
      .select("epoch", "bucket", "psi").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(rows.size === 20, "two epochs x ten buckets, exactly once")
    val psi0 = rows.collect { case ((0L, _), v) => v }.sum
    val psi1 = rows.collect { case ((1L, _), v) => v }.sum
    assert(psi0 === 0.0, s"clone epoch must not alarm: $psi0")
    assert(psi1 > 0.2, s"shifted epoch must alarm: $psi1")
  }
}
