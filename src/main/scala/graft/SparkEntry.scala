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

  /** Incremental change feed over the golden corpus: replay both batches,
    * then ask for everything committed after version 0 — the DML batch's
    * 10 upserts + 3 key tombstones, all at _seq 1. Exercises the CDC-out
    * path end-to-end with a fixture-derived oracle.
    */
  private def cdcChanges(spark: SparkSession, @annotation.nowarn sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("golden-feed").toString
    val t = MergeTable.retailTrans(root)
    CdcPipeline.replayBatch(spark, GoldenCorpus.df(spark, GoldenCorpus.insertOnlyLines), t, None, Some("p1"))
    CdcPipeline.replayBatch(spark, GoldenCorpus.df(spark, GoldenCorpus.dmlLines), t, None, Some("p2"))
    t.changesSince(spark, 0)
      .select(col("trans_id"), col("customer_id"), col("event"), col("sku"),
        col("amount"), col("device"), col("_seq").as("seq"),
        col("_change_type").as("change_type"))
      .orderBy(col("change_type"), col("trans_id"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.LlmOps.queries ++
      graft.queries.Extra.queries ++ graft.queries.SqlDml.queries +
      ("q00_cdc_golden" -> (cdcGolden _)) +
      ("q63_change_feed" -> (cdcChanges _))

  /** The golden corpus's expected final table state, fixed by the
    * reference fixtures (10 inserts + 13 DML events → 12 rows;
    * reference src/utils/gen_fake_cdc_data.py:26–59, README.md:457–460):
    * embedded as a VALUES literal so the CDC merge path is hash-checked,
    * not just row-counted.
    */
  private val goldenOracle: String =
    """SELECT * FROM (VALUES
       (CAST(19 AS BIGINT),'826787813308','visit','DK2617NXBK',CAST(39 AS INT),'tablet',TIMESTAMP '2023-01-16 06:11:06'),
       (CAST(21 AS BIGINT),'997346006365','cart','NL7461YPIB',CAST(60 AS INT),'tablet',TIMESTAMP '2023-01-16 06:03:01'),
       (CAST(24 AS BIGINT),'240977651465','list','LB9146CJTW',CAST(42 AS INT),'pc',TIMESTAMP '2023-01-16 06:24:10'),
       (CAST(27 AS BIGINT),'877946792067','like','EJ2923TPZU',CAST(1 AS INT),'tablet',TIMESTAMP '2023-01-16 06:24:59'),
       (CAST(28 AS BIGINT),'342761190559','list','MM5584BTYQ',CAST(1 AS INT),'mobile',TIMESTAMP '2023-01-16 06:00:02'),
       (CAST(30 AS BIGINT),'783305627923','cart','SZ9293QYKU',CAST(67 AS INT),'pc',TIMESTAMP '2023-01-16 06:24:51'),
       (CAST(35 AS BIGINT),'168395939233','like','HQ9147QPJK',CAST(85 AS INT),'pc',TIMESTAMP '2023-01-16 06:01:00'),
       (CAST(37 AS BIGINT),'818177069814','like','JS6166YPTE',CAST(1 AS INT),'mobile',TIMESTAMP '2023-01-16 08:08:44'),
       (CAST(38 AS BIGINT),'387378799012','list','AI6161BEFX',CAST(1 AS INT),'pc',TIMESTAMP '2023-01-16 08:09:33'),
       (CAST(41 AS BIGINT),'839828949919','purchase','AC2306JBRJ',CAST(5 AS INT),'tablet',TIMESTAMP '2023-01-16 08:14:20'),
       (CAST(43 AS BIGINT),'248083404876','visit','AS8552DVOO',CAST(1 AS INT),'pc',TIMESTAMP '2023-01-16 08:21:05'),
       (CAST(47 AS BIGINT),'731184658511','like','XZ9997LSJN',CAST(1 AS INT),'tablet',TIMESTAMP '2023-01-16 08:33:47')
      ) AS t(trans_id, customer_id, event, sku, amount, device, trans_datetime)
      ORDER BY trans_id"""

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  /** Expected change feed after the DML batch, fixed by the reference
    * fixture: its 5 updates + 5 inserts as upserts, its 3 deletes as key
    * tombstones (gen_fake_cdc_data.py:40–58).
    */
  private val changeFeedOracle: String =
    """SELECT * FROM (VALUES
       (CAST(6 AS BIGINT),  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS INT), CAST(NULL AS VARCHAR), CAST(1 AS BIGINT), 'delete'),
       (CAST(23 AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS INT), CAST(NULL AS VARCHAR), CAST(1 AS BIGINT), 'delete'),
       (CAST(33 AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS INT), CAST(NULL AS VARCHAR), CAST(1 AS BIGINT), 'delete'),
       (CAST(19 AS BIGINT),'826787813308','visit','DK2617NXBK',CAST(39 AS INT),'tablet',CAST(1 AS BIGINT),'upsert'),
       (CAST(21 AS BIGINT),'997346006365','cart','NL7461YPIB',CAST(60 AS INT),'tablet',CAST(1 AS BIGINT),'upsert'),
       (CAST(24 AS BIGINT),'240977651465','list','LB9146CJTW',CAST(42 AS INT),'pc',CAST(1 AS BIGINT),'upsert'),
       (CAST(30 AS BIGINT),'783305627923','cart','SZ9293QYKU',CAST(67 AS INT),'pc',CAST(1 AS BIGINT),'upsert'),
       (CAST(35 AS BIGINT),'168395939233','like','HQ9147QPJK',CAST(85 AS INT),'pc',CAST(1 AS BIGINT),'upsert'),
       (CAST(37 AS BIGINT),'818177069814','like','JS6166YPTE',CAST(1 AS INT),'mobile',CAST(1 AS BIGINT),'upsert'),
       (CAST(38 AS BIGINT),'387378799012','list','AI6161BEFX',CAST(1 AS INT),'pc',CAST(1 AS BIGINT),'upsert'),
       (CAST(41 AS BIGINT),'839828949919','purchase','AC2306JBRJ',CAST(5 AS INT),'tablet',CAST(1 AS BIGINT),'upsert'),
       (CAST(43 AS BIGINT),'248083404876','visit','AS8552DVOO',CAST(1 AS INT),'pc',CAST(1 AS BIGINT),'upsert'),
       (CAST(47 AS BIGINT),'731184658511','like','XZ9997LSJN',CAST(1 AS INT),'tablet',CAST(1 AS BIGINT),'upsert')
      ) AS t(trans_id, customer_id, event, sku, amount, device, seq, change_type)
      ORDER BY change_type, trans_id"""

  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracleSql ++ graft.queries.LlmOps.oracleSql ++
      graft.queries.Extra.oracleSql ++ graft.queries.SqlDml.oracleSql +
      ("q00_cdc_golden" -> goldenOracle) +
      ("q63_change_feed" -> changeFeedOracle)
}
