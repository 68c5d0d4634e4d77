package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusOps

/** Batched BPE training (round-5): the trainer accepts up to `maxBatch`
  * disjoint merges per round under a prefix rule that is provably
  * identical to one-merge-at-a-time greedy (proof in CorpusOps.trainBpe
  * scaladoc). These specs check the two halves of that claim:
  *
  *  - EXACTNESS: batched output equals the sequential (maxBatch = 1)
  *    implementation on a real corpus, merge for merge;
  *  - BATCHING POWER: a conflict-sparse corpus trains 256 merges in at
  *    most 32 driver rounds (the production-vocab scale shape — a 32k
  *    vocabulary stops costing 32k sequential Spark jobs).
  */
class BpeBatchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** 32 tiers x 8 pairs over the a-z0-9 alphabet: tier r's eight 2-char
    * words have strictly higher frequencies than every later tier's, the
    * eight pairs within a tier are symbol-disjoint, and no pair name
    * repeats across tiers. Sequential greedy therefore learns exactly the
    * schedule order; the batched trainer must too, one tier per round.
    */
  private def tieredSchedule: Seq[(String, String, Long)] = {
    val syms = (('a' to 'z') ++ ('0' to '9')).map(_.toString)
    val n = syms.length
    val usedPairs = scala.collection.mutable.Set[(String, String)]()
    val out = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    for (r <- 0 until 32) {
      val tierSyms = scala.collection.mutable.Set[String]()
      var picked = 0
      // rotate the enumeration per tier so symbol use spreads evenly
      var a = (r * 7) % n
      var steps = 0
      while (picked < 8 && steps < n * n) {
        val b = (a + 1 + (r * 11 + steps) % (n - 1)) % n
        val p = (syms(a), syms(b))
        if (a != b && !usedPairs(p) && !tierSyms(p._1) && !tierSyms(p._2)) {
          usedPairs += p; tierSyms += p._1; tierSyms += p._2
          out += ((p._1, p._2, (500 - out.size).toLong))
          picked += 1
        }
        a = (a + 2) % n
        steps += 1
      }
      assert(picked == 8, s"schedule construction failed at tier $r")
    }
    out.toSeq
  }

  private def tieredCorpus(schedule: Seq[(String, String, Long)]) = {
    import spark.implicits._
    schedule.zipWithIndex.map { case ((l, r, freq), i) =>
      (i.toLong, (s"$l$r " * freq.toInt).trim)
    }.toDF("doc_id", "text")
  }

  test("batched == sequential on the real documents corpus (48 merges)") {
    val docs = Tables.documents(spark, sf)
    val seqOut = CorpusOps.bpeMerges(docs, merges = 48, maxBatch = 1)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val batched = CorpusOps.bpeMerges(docs, merges = 48, maxBatch = 16)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(batched.toSeq === seqOut.toSeq)
  }

  test("256 merges in <= 32 rounds on a conflict-sparse corpus, exact order") {
    val schedule = tieredSchedule
    val docs = tieredCorpus(schedule)
    val (df, rounds) =
      CorpusOps.bpeMergesWithRounds(docs, merges = 256, maxBatch = 8)
    val got = df.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.length === 256)
    assert(rounds <= 32, s"took $rounds rounds for 256 merges")
    assert(got.toSeq === schedule.map { case (l, r, f) => (l, r, f) })
    // the analytic ground truth IS sequential greedy: spot-check by
    // actually running the sequential trainer over the first 64 merges
    val seqOut = CorpusOps.bpeMerges(docs, merges = 64, maxBatch = 1)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(seqOut.toSeq === schedule.take(64).map { case (l, r, f) => (l, r, f) })
  }

  test("bpeEncode batched == sequential token accounting") {
    val docs = Tables.documents(spark, sf).limit(100)
    def counts(maxBatch: Int) =
      CorpusOps.bpeEncode(docs, merges = 24, maxBatch = maxBatch)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(counts(16) === counts(1))
  }
}
