package graft

import org.apache.spark.sql.Row

import graft.fixtures.GoldenCorpus
import graft.stream.{CdcPipeline, Replicator}
import graft.table.MergeTable

/** Table→table replication over the streaming change feed: the replica
  * converges to the source after every trigger — through DML, compaction
  * (no-op slice), rollback and truncate (resync markers → atomic overwrite
  * re-bootstrap) — and checkpoint restarts never double-apply.
  */
class ReplicatorSpec extends SparkSpec {

  private def rows(t: MergeTable): Seq[Row] =
    t.read(spark).orderBy("trans_id").collect().toSeq

  test("replica converges through dml, compaction, rollback, truncate") {
    val srcRoot = tmpDir("repl") + "/src"
    val src = MergeTable.retailTrans(srcRoot, threshold = 100)
    val replica = MergeTable.retailTrans(tmpDir("repl") + "/dst", threshold = 100)
    CdcPipeline.replayBatch(spark,
      GoldenCorpus.df(spark, GoldenCorpus.insertOnlyLines), src, None, Some("c0"))

    val q = Replicator.start(spark, srcRoot, replica, tmpDir("repl-cp"))
    try {
      q.processAllAvailable()
      assert(rows(replica) === rows(src))
      assert(rows(replica).size === 10)

      CdcPipeline.replayBatch(spark,
        GoldenCorpus.df(spark, GoldenCorpus.dmlLines), src, None, Some("c1"))
      q.processAllAvailable()
      assert(rows(replica) === rows(src)) // 5 updates, 5 inserts, 3 deletes

      src.compactScoped(spark)
      q.processAllAvailable()
      assert(rows(replica) === rows(src)) // layout-only: nothing re-applied

      src.rollbackTo(0) // resync marker → overwrite re-bootstrap
      q.processAllAvailable()
      assert(rows(replica) === rows(src))
      assert(rows(replica).size === 10)

      src.truncate()
      q.processAllAvailable()
      assert(rows(replica) === rows(src))
      assert(rows(replica).isEmpty)
    } finally q.stop()
  }

  test("checkpoint restart replays nothing (batch-id idempotence)") {
    val srcRoot = tmpDir("repl2") + "/src"
    val src = MergeTable.retailTrans(srcRoot, threshold = 100)
    val replica = MergeTable.retailTrans(tmpDir("repl2") + "/dst", threshold = 100)
    val cp = tmpDir("repl2-cp")
    CdcPipeline.replayBatch(spark,
      GoldenCorpus.df(spark, GoldenCorpus.insertOnlyLines), src, None, Some("c0"))

    val q1 = Replicator.start(spark, srcRoot, replica, cp)
    try q1.processAllAvailable() finally q1.stop()
    val versionAfterFirst = replica.latestVersion

    CdcPipeline.replayBatch(spark,
      GoldenCorpus.df(spark, GoldenCorpus.dmlLines), src, None, Some("c1"))
    val q2 = Replicator.start(spark, srcRoot, replica, cp)
    try {
      q2.processAllAvailable()
      assert(rows(replica) === rows(src))
      // the restarted stream resumed past the bootstrap slice: exactly one
      // new replica commit for the dml slice, none re-applied
      assert(replica.latestVersion === versionAfterFirst + 1)
    } finally q2.stop()
  }
}
