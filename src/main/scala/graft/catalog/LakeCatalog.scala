package graft.catalog

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.table.MergeTable

/** Thin catalog over a warehouse directory — the engine's stand-in for the
  * reference's Glue catalog (cdk_stacks/firehose_to_iceberg.py:80–82;
  * README.md:283–309 `CREATE DATABASE` / `CREATE TABLE` DDL):
  *
  * {{{
  *   <warehouse>/<database>/<table>/    — a MergeTable root (self-describing
  *                                        via _table.meta)
  * }}}
  *
  * Parity surface (SURVEY.md §2.1 S10–S11):
  *   - `CREATE DATABASE IF NOT EXISTS`    → createDatabase
  *   - `CREATE TABLE ... PARTITIONED BY ... TBLPROPERTIES` → createTable
  *   - `SHOW DATABASES` / `SHOW TABLES`   → showDatabases / showTables
  *   - `DESC <table>`                     → describeTable
  *   - SQL queries over tables            → registerViews + `spark.sql`
  *
  * Catalog metadata is directory structure + per-table `_table.meta` — no
  * central state to corrupt, O(1) lookups by path, and at scale a listing
  * of databases/tables never touches data files.
  */
final class LakeCatalog(val warehouse: String) {

  private val root: Path = Paths.get(warehouse)
  Files.createDirectories(root)

  private def dbPath(db: String): Path = root.resolve(db)

  def createDatabase(db: String): Unit = {
    require(db.matches("[A-Za-z0-9_]+"), s"invalid database name: $db")
    Files.createDirectories(dbPath(db))
  }

  def databaseExists(db: String): Boolean = Files.isDirectory(dbPath(db))

  def listDatabases: Seq[String] =
    if (!Files.isDirectory(root)) Nil
    else Files.list(root).iterator().asScala
      .filter(Files.isDirectory(_)).map(_.getFileName.toString).toSeq.sorted

  def createTable(
      db: String,
      table: String,
      schema: StructType,
      key: String,
      partitionCol: Option[String] = None,
      deleteCompactThreshold: Int = 10): MergeTable = {
    require(table.matches("[A-Za-z0-9_]+"), s"invalid table name: $table")
    require(databaseExists(db), s"database $db does not exist")
    new MergeTable(dbPath(db).resolve(table).toString, schema, key,
      partitionCol, deleteCompactThreshold).create()
  }

  def tableExists(db: String, table: String): Boolean =
    Files.exists(dbPath(db).resolve(table).resolve("_table.meta"))

  def listTables(db: String): Seq[String] =
    if (!databaseExists(db)) Nil
    else Files.list(dbPath(db)).iterator().asScala
      .filter(p => Files.exists(p.resolve("_table.meta")))
      .map(_.getFileName.toString).toSeq.sorted

  def getTable(db: String, table: String): MergeTable = {
    require(tableExists(db, table), s"no such table: $db.$table")
    MergeTable.open(dbPath(db).resolve(table).toString)
  }

  def dropTable(db: String, table: String): Unit = {
    val p = dbPath(db).resolve(table)
    if (Files.exists(p)) {
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    }
  }

  // ---- metadata reads as DataFrames (SHOW/DESC parity) ----

  def showDatabases(spark: SparkSession): DataFrame = {
    import spark.implicits._
    listDatabases.toDF("namespace")
  }

  def showTables(spark: SparkSession, db: String): DataFrame = {
    import spark.implicits._
    listTables(db).map(t => (db, t)).toDF("namespace", "tableName")
  }

  /** `DESC <table>`: column name / type / partition flag. */
  def describeTable(spark: SparkSession, db: String, table: String): DataFrame = {
    import spark.implicits._
    val t = getTable(db, table)
    t.schema.fields.map { f =>
      (f.name, f.dataType.simpleString,
        if (t.partitionCol.contains(f.name)) "partition" else "")
    }.toSeq.toDF("col_name", "data_type", "comment")
  }

  /** Register every table of a database as `<table>` temp view so the full
    * Spark SQL surface (SELECT/JOIN/window/...) works against engine
    * tables: `spark.sql("SELECT COUNT(*) FROM retail_trans_iceberg")`.
    */
  def registerViews(spark: SparkSession, db: String): Unit =
    listTables(db).foreach { t =>
      getTable(db, t).read(spark).createOrReplaceTempView(t)
    }
}
