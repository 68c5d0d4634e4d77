package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.streaming.Trigger
import graft.fixtures.GoldenCorpus
import graft.stream.CdcPipeline
import graft.table.MergeTable

/** SURVEY.md §5 golden end-to-end: replaying the reference corpus against an
  * empty table must yield exactly 12 rows with the documented keys/amounts,
  * and `SELECT COUNT(*)` (README.md:457–460) must return 12.
  */
class GoldenEndToEndSpec extends SparkSpec {
  import spark.implicits._

  private def assertGolden(t: MergeTable): Unit = {
    val rows = t.read(spark).select($"trans_id", $"amount")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.keySet === GoldenCorpus.goldenKeys)
    assert(rows === GoldenCorpus.goldenAmounts)
    t.read(spark).createOrReplaceTempView("retail_trans_iceberg")
    val cnt = spark.sql("SELECT COUNT(*) FROM retail_trans_iceberg")
      .collect().head.getLong(0)
    assert(cnt === 12L)
  }

  test("batch replay: insert-only then dml phases → golden 12 rows") {
    val t = MergeTable.retailTrans(tmpDir("golden"))
    val err = tmpDir("goldenErr")
    CdcPipeline.replayBatch(spark,
      GoldenCorpus.df(spark, GoldenCorpus.insertOnlyLines), t, Some(err), Some("p1"))
    assert(t.read(spark).count() === 10)
    CdcPipeline.replayBatch(spark,
      GoldenCorpus.df(spark, GoldenCorpus.dmlLines), t, Some(err), Some("p2"))
    assertGolden(t)
  }

  test("streaming replay through the landing dir, then restart is a no-op") {
    val landing = tmpDir("landing")
    val tableRoot = tmpDir("table")
    val errorRoot = tmpDir("error")
    val ckpt = tmpDir("ckpt")
    // two files = two source splits; AvailableNow drains both
    Files.write(Paths.get(landing, "000-insert.jsonl"),
      (GoldenCorpus.insertOnlyLines.mkString("\n") + "\n").getBytes)
    Files.write(Paths.get(landing, "001-dml.jsonl"),
      (GoldenCorpus.dmlLines.mkString("\n") + "\n").getBytes)

    val cfg = CdcPipeline.Config(landing, tableRoot, errorRoot, ckpt,
      trigger = Trigger.AvailableNow())
    val q1 = CdcPipeline.start(spark, cfg)
    q1.awaitTermination(60000)
    val t = MergeTable.retailTrans(tableRoot)
    assertGolden(t)

    val v = t.latestVersion
    // restart against the same checkpoint: nothing new → same version
    val q2 = CdcPipeline.start(spark, cfg)
    q2.awaitTermination(60000)
    assert(MergeTable.retailTrans(tableRoot).latestVersion === v)
    assertGolden(MergeTable.retailTrans(tableRoot))
  }
}
