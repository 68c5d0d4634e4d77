package graft

import org.apache.spark.sql.functions._

import graft.operators.IncrementalSplit

/** Contract of the persistent cluster-consistent split registry:
  * cross-batch inheritance (a near-dup of an assigned doc gets the
  * assigned split, whatever its own hash says), registry-mediated
  * transitivity (C≈B≈A inherits A's split even when C and A no longer
  * match directly), fresh-doc degeneration to the stateless hash,
  * replay idempotence, and reopen.
  */
class IncrementalSplitSpec extends SparkSpec {
  import spark.implicits._

  private def bucket(id: Long): Long =
    ((id % 2147483648L) * 2654435761L) % 2147483647L % 100
  private def naive(id: Long): String =
    if (bucket(id) < 80) "train" else if (bucket(id) < 90) "val" else "test"

  private def tmpRoot(): String =
    java.nio.file.Files.createTempDirectory("splitreg").toString

  // 12 words -> 10 trigram shingles; +1 word appends exactly one shingle
  private val A = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  private val B = A + " nu"          // J(A,B) = 10/11 ≈ 0.909
  private val C = B + " xi omicron"  // J(B,C) = 11/13 ≈ 0.846; J(A,C) = 10/13 < 0.8

  test("cross-batch inheritance and registry-mediated transitivity") {
    val reg = IncrementalSplit.create(tmpRoot())
    val idA = (1L to 500L).find(naive(_) == "train").get
    val idB = (1L to 500L).find(i => naive(i) == "test" && i != idA).get
    val idC = (idB + 1 to idB + 500).find(i => naive(i) == "val").get

    val a1 = reg.assignBatch(Seq((idA, A)).toDF("doc_id", "text"),
      batchId = Some("b1")).collect()
    assert(a1.length === 1 && a1.head.getString(3) === naive(idA))
    assert(a1.head.getLong(2) === -1L, "first batch is fresh")

    val a2 = reg.assignBatch(Seq((idB, B)).toDF("doc_id", "text"),
      batchId = Some("b2")).collect()
    assert(a2.head.getString(3) === naive(idA),
      s"B must inherit A's split, not its own ${naive(idB)}")
    assert(a2.head.getLong(2) === idA, "anchor is the matched indexed doc")

    val a3 = reg.assignBatch(Seq((idC, C)).toDF("doc_id", "text"),
      batchId = Some("b3")).collect()
    assert(a3.head.getString(3) === naive(idA),
      "C matches only B, whose registered split is A's — transitive")
    assert(a3.head.getLong(2) === idB)

    val all = reg.assignments(spark).select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(all === Map(idA -> naive(idA), idB -> naive(idA), idC -> naive(idA)))
  }

  test("fresh docs hash statelessly; within-batch clusters share one split") {
    val reg = IncrementalSplit.create(tmpRoot())
    val x = (1L to 500L).find(naive(_) == "train").get
    val y = (x + 1 to x + 500).find(naive(_) == "test").get
    val z = (y + 1 to y + 500).find(naive(_) == "val").get
    val other = "one two three four five six seven eight nine ten eleven twelve"
    val out = reg.assignBatch(
      Seq((x, A), (y, A + " nu"), (z, other)).toDF("doc_id", "text"),
      batchId = Some("b1")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(3)))).toMap
    assert(out(x)._2 === out(y)._2, "cluster members share a split")
    assert(out(x)._1 === x && out(y)._1 === x, "rep = min member")
    assert(out(x)._2 === naive(x), "fresh cluster hashes its rep")
    assert(out(z)._2 === naive(z), "fresh singleton hashes itself")
  }

  test("replayed batchId: same returned splits, registry unchanged") {
    val root = tmpRoot()
    val reg = IncrementalSplit.create(root)
    val idA = 7L
    reg.assignBatch(Seq((idA, A)).toDF("doc_id", "text"), batchId = Some("b1"))
    val first = reg.assignBatch(
      Seq((idA + 5, B), (idA + 9, "unrelated words here in this row of text"))
        .toDF("doc_id", "text"), batchId = Some("b2"))
      .select("doc_id", "rep", "split").collect().map(_.toSeq).toSet
    val before = reg.assignments(spark).count()
    val replay = reg.assignBatch(
      Seq((idA + 5, B), (idA + 9, "unrelated words here in this row of text"))
        .toDF("doc_id", "text"), batchId = Some("b2"))
      .select("doc_id", "rep", "split").collect().map(_.toSeq).toSet
    assert(replay === first, "replay returns identical (doc_id, rep, split)")
    assert(reg.assignments(spark).count() === before,
      "replayed appends must be skipped")

    val reopened = IncrementalSplit.open(root)
    assert(reopened.assignments(spark).count() === before)
    assert(reopened.trainPct === 80 && reopened.n === 3)
  }

  test("torn write: crash after the registry append replays to the same state") {
    val root = tmpRoot()
    val reg = IncrementalSplit.create(root)
    reg.assignBatch(Seq((7L, A)).toDF("doc_id", "text"), batchId = Some("b1"))
    // simulate a writer that died between the registry append and the
    // index appends: land the registry rows under b2's batch id, leaving
    // sigs/bands without the batch
    reg.registry.appendAll(
      Seq((12L, naive(12L))).toDF("doc_id", "split"), Some("b2:reg"))
    assert(reg.sigs.read(spark).count() === 1L,
      "precondition: the torn batch's signatures are missing")
    // replay of b2: registry skips (already applied), sigs/bands complete;
    // the recomputed assignment must agree with what the registry holds
    val replay = reg.assignBatch(
      Seq((12L, "totally different words that match nothing indexed yet"))
        .toDF("doc_id", "text"), batchId = Some("b2")).collect()
    assert(replay.head.getString(3) === naive(12L))
    assert(reg.registry.read(spark).count() === 2L,
      "registry must not double-apply the torn batch")
    assert(reg.sigs.read(spark).count() === 2L &&
      reg.bands.read(spark).count() === 2L * 4,
      "replay completes the missing index entries")
  }

  test("splitIngest: two streaming epochs stay cluster-consistent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = tmpRoot()
    val reg = IncrementalSplit.create(root)
    val idA = (1L to 500L).find(naive(_) == "train").get
    val idB = (1L to 500L).find(naive(_) == "test").get
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.CorpusStreams.splitIngest(
        mem.toDF().toDF("doc_id", "text"), reg)
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      mem.addData(idA -> A)
      q.processAllAvailable()
      mem.addData(idB -> B)
      q.processAllAvailable()
    } finally q.stop()
    val all = reg.assignments(spark).select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(all === Map(idA -> naive(idA), idB -> naive(idA)),
      "the later epoch's near-dup must inherit the earlier epoch's split")
  }
}
