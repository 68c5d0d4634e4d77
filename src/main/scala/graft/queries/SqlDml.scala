package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** q65: the reference's SQL-first table lifecycle (README.md:285–309 DDL,
  * README.md:400–443 DML) driven end-to-end through `spark.sql` against
  * the [[graft.sqlcat.GraftCatalog]] plugin — CREATE NAMESPACE/TABLE,
  * INSERT, UPDATE, DELETE, MERGE INTO, then an aggregate SELECT whose
  * result the DuckDB oracle reproduces with pure relational algebra over
  * the source table.
  */
object SqlDml {

  private def run(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft", "graft.sqlcat.GraftCatalog")
    // the catalog instance (and its warehouse) is cached by Spark at first
    // load; run in a fresh database each invocation so reruns (bench warm
    // passes, probe cold/warm) stay independent
    if (!spark.conf.getOption("spark.sql.catalog.graft.warehouse").exists(_.nonEmpty))
      spark.conf.set("spark.sql.catalog.graft.warehouse",
        java.nio.file.Files.createTempDirectory("graft-sql-wh").toString)
    val db = s"q65_${System.nanoTime()}"
    spark.read.parquet(s"$sfDir/customer.parquet")
      .createOrReplaceTempView("q65_customer")

    spark.sql(s"CREATE NAMESPACE graft.$db")
    spark.sql(s"""CREATE TABLE graft.$db.cust (
        c_custkey BIGINT, c_name STRING, c_acctbal DOUBLE, c_mktsegment STRING)
      TBLPROPERTIES ('unique_keys'='c_custkey')""")
    spark.sql(s"""INSERT INTO graft.$db.cust
      SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM q65_customer""")
    spark.sql(s"""UPDATE graft.$db.cust
      SET c_acctbal = c_acctbal + 100.0 WHERE c_mktsegment = 'BUILDING'""")
    spark.sql(s"DELETE FROM graft.$db.cust WHERE c_acctbal < 0.0")
    spark.sql(s"""MERGE INTO graft.$db.cust t
      USING (SELECT c_custkey, 'MERGED' AS c_name,
                    CAST(0.0 AS DOUBLE) AS c_acctbal,
                    'AUTOMOBILE' AS c_mktsegment
             FROM q65_customer WHERE c_custkey % 97 = 0) s
      ON t.c_custkey = s.c_custkey
      WHEN MATCHED THEN UPDATE SET c_name = s.c_name, c_acctbal = t.c_acctbal + 1.0
      WHEN NOT MATCHED THEN INSERT (c_custkey, c_name, c_acctbal, c_mktsegment)
        VALUES (s.c_custkey, s.c_name, s.c_acctbal, s.c_mktsegment)""")
    spark.sql(s"""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        round(sum(c_acctbal), 2) AS bal
      FROM graft.$db.cust GROUP BY c_mktsegment ORDER BY c_mktsegment""")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q65_sql_dml" -> (run _))

  /** The same final state, derived relationally: UPDATE = CASE projection,
    * DELETE = anti-filter, MERGE = left join (matched) ∪ anti join
    * (inserted).
    */
  val oracleSql: Map[String, String] = Map(
    "q65_sql_dml" ->
      """WITH upd AS (
           SELECT c_custkey, c_name,
                  CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal + 100.0
                       ELSE c_acctbal END AS c_acctbal,
                  c_mktsegment
           FROM customer),
         del AS (SELECT * FROM upd WHERE NOT (c_acctbal < 0.0)),
         s AS (SELECT c_custkey, 'MERGED' AS c_name, 0.0 AS c_acctbal,
                      'AUTOMOBILE' AS c_mktsegment
               FROM customer WHERE c_custkey % 97 = 0),
         merged AS (
           SELECT d.c_custkey,
                  CASE WHEN s.c_custkey IS NOT NULL THEN 'MERGED' ELSE d.c_name END AS c_name,
                  CASE WHEN s.c_custkey IS NOT NULL THEN d.c_acctbal + 1.0 ELSE d.c_acctbal END AS c_acctbal,
                  d.c_mktsegment
           FROM del d LEFT JOIN s ON d.c_custkey = s.c_custkey
           UNION ALL
           SELECT s.c_custkey, s.c_name, s.c_acctbal, s.c_mktsegment
           FROM s LEFT JOIN del d ON s.c_custkey = d.c_custkey
           WHERE d.c_custkey IS NULL)
         SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
                round(sum(c_acctbal), 2) AS bal
         FROM merged GROUP BY c_mktsegment ORDER BY c_mktsegment""")
}
