package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.fixtures.GoldenCorpus
import graft.stream.CdcPipeline
import graft.table.MergeTable

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** CDC golden replay as a query: ignores sfDir (the corpus is embedded),
    * runs the full transform+merge path, returns the final 12-row table.
    * Rows-only check — not expressible as SQL over the sf tables.
    */
  private def cdcGolden(spark: SparkSession, @annotation.nowarn sfDir: String): DataFrame = {
    val root = Files.createTempDirectory("golden-q").toString
    val t = MergeTable.retailTrans(root)
    CdcPipeline.replayBatch(spark, GoldenCorpus.df(spark, GoldenCorpus.insertOnlyLines), t, None, Some("p1"))
    CdcPipeline.replayBatch(spark, GoldenCorpus.df(spark, GoldenCorpus.dmlLines), t, None, Some("p2"))
    t.read(spark).orderBy("trans_id")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.LlmOps.queries ++
      graft.queries.Extra.queries +
      ("q00_cdc_golden" -> (cdcGolden _))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracleSql ++ graft.queries.LlmOps.oracleSql ++
      graft.queries.Extra.oracleSql
}
