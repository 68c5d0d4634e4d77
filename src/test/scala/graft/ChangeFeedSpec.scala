package graft

import org.apache.spark.sql.functions._
import graft.fixtures.GoldenCorpus
import graft.stream.CdcPipeline
import graft.table.MergeTable

/** Incremental change feed (CDC-out): a consumer applying
  * `changesSince(v)` on top of the version-v state must reconstruct the
  * current table exactly; maintenance commits emit nothing; replacement
  * commits emit resync markers.
  */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def state(t: MergeTable): Map[Long, Int] =
    t.read(spark).select($"trans_id", $"amount")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("changes after a merge commit reconstruct the table state") {
    val t = MergeTable.retailTrans(tmpDir("feed"), threshold = 100)
    CdcPipeline.replayBatch(spark,
      GoldenCorpus.df(spark, GoldenCorpus.insertOnlyLines), t, None, Some("c0"))
    val base = state(t) // version 0: 10 rows
    CdcPipeline.replayBatch(spark,
      GoldenCorpus.df(spark, GoldenCorpus.dmlLines), t, None, Some("c1"))

    val feed = t.changesSince(spark, 0)
      .select($"trans_id", $"amount", $"_seq", $"_change_type").collect()
    val upserts = feed.filter(_.getString(3) == "upsert")
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val deletes = feed.filter(_.getString(3) == "delete")
      .map(_.getLong(0)).toSet
    assert(upserts.size === 10) // 5 updates + 5 inserts, LWW-collapsed
    assert(deletes === Set(6L, 23L, 33L))
    assert(feed.forall(_.getLong(2) === 1L)) // all changes carry _seq = v1

    // replaying the feed over the v0 state reproduces the current table
    val replayed = (base -- deletes) ++ upserts
    assert(replayed === state(t))
    // and the full feed from the beginning reconstructs from scratch
    val full = t.changesSince(spark, -1)
      .select($"trans_id", $"amount", $"_seq", $"_change_type").collect()
    val byKey = full.filter(_.getString(3) != "resync")
      .groupBy(_.getLong(0)).map { case (k, rows) =>
        k -> rows.maxBy(r => (r.getLong(2), r.getString(3) == "delete"))
      }
    val rebuilt = byKey.collect {
      case (k, r) if r.getString(3) == "upsert" => k -> r.getInt(1)
    }.toMap
    assert(rebuilt === state(t))
  }

  test("maintenance commits emit nothing; truncate emits a resync marker") {
    val t = MergeTable.retailTrans(tmpDir("feed2"), threshold = 100)
    CdcPipeline.replayBatch(spark,
      GoldenCorpus.df(spark, GoldenCorpus.insertOnlyLines), t, None, Some("c0"))
    CdcPipeline.replayBatch(spark,
      GoldenCorpus.df(spark, GoldenCorpus.dmlLines), t, None, Some("c1"))
    val vAfterDml = t.latestVersion
    t.compactScoped(spark)
    assert(t.changesSince(spark, vAfterDml).count() === 0)

    t.truncate()
    val feed = t.changesSince(spark, vAfterDml).collect()
    assert(feed.map(_.getAs[String]("_change_type")).toSeq === Seq("resync"))
    assert(feed.head.isNullAt(feed.head.fieldIndex("trans_id")))
  }

  test("rollback emits a resync marker; feed works across schema evolution") {
    val t = MergeTable.retailTrans(tmpDir("feed3"), threshold = 100)
    CdcPipeline.replayBatch(spark,
      GoldenCorpus.df(spark, GoldenCorpus.insertOnlyLines), t, None, Some("c0"))
    CdcPipeline.replayBatch(spark,
      GoldenCorpus.df(spark, GoldenCorpus.dmlLines), t, None, Some("c1"))
    t.rollbackTo(0)
    val feed = t.changesSince(spark, 1).collect()
    assert(feed.map(_.getAs[String]("_change_type")).toSeq === Seq("resync"))

    // evolve the schema, apply one more batch: the feed surfaces the new
    // column (null for pre-evolution commits' rows, set for new ones)
    val t2 = t.addColumn(org.apache.spark.sql.types.StructField(
      "channel", org.apache.spark.sql.types.StringType))
    val batch = spark.range(900, 903).selectExpr(
      "id AS trans_id", "'999999999999' AS customer_id", "'visit' AS event",
      "'ZZ0000AAAA' AS sku", "7 AS amount", "'pc' AS device",
      "timestamp'2023-03-01 00:00:00' AS trans_datetime",
      "'web' AS channel", "'insert' AS operation")
    t2.applyBatch(batch, Some("c2"))
    val feed2 = t2.changesSince(spark, 0)
    val rows = feed2.filter(col("_change_type") === "upsert")
      .select("trans_id", "channel").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(rows(900L) === Some("web"))
    assert(rows.keySet.exists(_ < 900L)) // pre-evolution rows present...
    assert(rows.filter(_._1 < 900L).values.forall(_.isEmpty)) // ...null channel
  }
}
