package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, IncrementalDedup}
import graft.table.MergeTable
import graft.streaming.CorpusStreams

/** The persistent-index incremental dedup: within-batch exact dedup,
  * cross-batch LSH+verify dedup against stored signatures, idempotent
  * index replay, crash-between-appends recovery, reopen-from-disk, and
  * the streaming foreachBatch face.
  */
class IncrementalDedupSpec extends SparkSpec {

  import spark.implicits._

  private val A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val Anear = "alpha beta gamma delta epsilon zeta eta theta iota kappa extra"
  private val B = "one two three four five six seven eight nine ten"
  private val C = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
  private val D = "completely fresh unrelated sentence about weather patterns today"

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  test("cross-batch near-dups drop; within-batch clusters keep min id") {
    val idx = IncrementalDedup.create(tmpDir("dedupidx"))

    // batch 1: A appears twice (ids 1,2) → within-batch keeps 1; B kept
    val b1 = idx.dedupeBatch(docs(1L -> A, 2L -> A, 3L -> B),
      batchId = Some("b1"))
    assert(b1.select("doc_id").as[Long].collect().sorted === Seq(1L, 3L))
    assert(idx.indexedDocs(spark) === 2)

    // batch 2: 10=A exact re-arrival (indexed), 11=Anear (J=10/11 ≥ 0.8 vs
    // indexed A), 12=C fresh, 13=C dup within batch, 14=D fresh
    val b2 = idx.dedupeBatch(
      docs(10L -> A, 11L -> Anear, 12L -> C, 13L -> C, 14L -> D),
      batchId = Some("b2"))
    assert(b2.select("doc_id").as[Long].collect().sorted === Seq(12L, 14L))
    assert(idx.indexedDocs(spark) === 4)
  }

  test("replayed batchId leaves the index unchanged and returns the same rows") {
    val idx = IncrementalDedup.create(tmpDir("dedupidx"))
    idx.dedupeBatch(docs(1L -> A, 2L -> B), batchId = Some("e1"))
    val v1 = (idx.sigs.latestVersion, idx.bands.latestVersion)

    val replay = idx.dedupeBatch(docs(1L -> A, 2L -> B), batchId = Some("e1"))
    assert(replay.select("doc_id").as[Long].collect().sorted === Seq(1L, 2L))
    assert((idx.sigs.latestVersion, idx.bands.latestVersion) === v1,
      "replay must not commit")
  }

  test("crash between the two appends: replay completes to a consistent index") {
    val root = tmpDir("dedupidx")
    val idx = IncrementalDedup.create(root)
    idx.dedupeBatch(docs(1L -> A), batchId = Some("e1"))

    // simulate the torn write: sigs applied for e2, bands not
    val sh2 = Dedup.shingleArrays(docs(2L -> B), 3)
    idx.sigs.appendAll(sh2.select(col("doc_id"), col("sh")), Some("e2:sigs"))
    assert(idx.indexedDocs(spark) === 2)

    // replaying the full batch skips the applied sigs append, lands the
    // bands append, and doc 2's future dups are then caught
    val out = idx.dedupeBatch(docs(2L -> B), batchId = Some("e2"))
    assert(out.select("doc_id").as[Long].collect() === Seq(2L))
    assert(idx.indexedDocs(spark) === 2)
    val caught = idx.dedupeBatch(docs(20L -> B), batchId = Some("e3"))
    assert(caught.count() === 0, "post-recovery index must catch B's dup")
  }

  test("open() resumes an index from disk with persisted parameters") {
    val root = tmpDir("dedupidx")
    IncrementalDedup.create(root, n = 3, k = 16, bands = 4)
      .dedupeBatch(docs(1L -> A, 2L -> B), batchId = Some("e1"))

    val re = IncrementalDedup.open(root)
    assert((re.n, re.k, re.nBands) === ((3, 16, 4)))
    val out = re.dedupeBatch(docs(10L -> A, 11L -> D), batchId = Some("e2"))
    assert(out.select("doc_id").as[Long].collect() === Seq(11L))
  }

  test("streaming ingest: two epochs dedup against the accumulating index") {
    val root = tmpDir("dedupstream")
    val idx = IncrementalDedup.create(s"$root/idx")
    val out = new MergeTable(s"$root/corpus",
      org.apache.spark.sql.types.StructType.fromDDL("doc_id BIGINT, text STRING"),
      keyCol = "doc_id", partitionCol = None).create()

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val q = CorpusStreams.dedupedIngest(stream, idx, out)
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      mem.addData(1L -> A, 2L -> A, 3L -> B)
      q.processAllAvailable()
      mem.addData(10L -> Anear, 11L -> C)
      q.processAllAvailable()
    } finally q.stop()

    // epoch 1: A-dup collapses to id 1; epoch 2: Anear drops vs indexed A
    assert(out.read(spark).select("doc_id").as[Long].collect().sorted
      === Seq(1L, 3L, 11L))
    assert(idx.indexedDocs(spark) === 3)
  }
}
