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

  // every caller-supplied name passes through here — identifiers only, so
  // no path (e.g. "../prod") can ever escape the warehouse directory
  private def validName(n: String): String = {
    require(n.matches("[A-Za-z0-9_]+"), s"invalid identifier: $n")
    n
  }

  private def dbPath(db: String): Path = root.resolve(validName(db))

  /** Files.list/walk hold a directory fd until closed — always scope them. */
  private def withStream[A, B](s: java.util.stream.Stream[A])(f: java.util.stream.Stream[A] => B): B =
    try f(s) finally s.close()

  def createDatabase(db: String): Unit = {
    Files.createDirectories(dbPath(db))
  }

  def databaseExists(db: String): Boolean = Files.isDirectory(dbPath(db))

  def listDatabases: Seq[String] =
    if (!Files.isDirectory(root)) Nil
    else withStream(Files.list(root))(_.iterator().asScala
      .filter(Files.isDirectory(_)).map(_.getFileName.toString).toList).sorted

  def createTable(
      db: String,
      table: String,
      schema: StructType,
      key: String,
      partitionCol: Option[String] = None,
      deleteCompactThreshold: Int = 10): MergeTable = {
    require(databaseExists(db), s"database $db does not exist")
    // creating over an existing table would hand back a handle whose
    // schema/key silently diverge from the on-disk _table.meta
    require(!tableExists(db, table), s"table $db.$table already exists")
    new MergeTable(dbPath(db).resolve(validName(table)).toString, schema, key,
      partitionCol, deleteCompactThreshold).create()
  }

  def tableExists(db: String, table: String): Boolean =
    Files.exists(dbPath(db).resolve(validName(table)).resolve("_table.meta"))

  def listTables(db: String): Seq[String] =
    if (!databaseExists(db)) Nil
    else withStream(Files.list(dbPath(db)))(_.iterator().asScala
      .filter(p => Files.exists(p.resolve("_table.meta")))
      .map(_.getFileName.toString).toList).sorted

  def getTable(db: String, table: String): MergeTable = {
    require(tableExists(db, table), s"no such table: $db.$table")
    MergeTable.open(dbPath(db).resolve(validName(table)).toString)
  }

  /** Zero-copy SHALLOW CLONE of an existing table into this catalog:
    * [[MergeTable.shallowClone]] under catalog naming/validation. The
    * clone shares the source's data bytes through the fallback chain and
    * diverges independently from the moment it is created; dropping or
    * GC'ing the SOURCE can invalidate still-shared bytes (the standard
    * shallow-clone caveat — the clone then reads the missing-file
    * sentinel).
    */
  def cloneTable(db: String, table: String,
      destDb: String, destTable: String): MergeTable = {
    require(databaseExists(destDb), s"database $destDb does not exist")
    require(!tableExists(destDb, destTable),
      s"table $destDb.$destTable already exists")
    getTable(db, table).shallowClone(
      dbPath(destDb).resolve(validName(destTable)).toString)
  }

  def dropTable(db: String, table: String): Unit = {
    // only drop things that are actually tables of this catalog
    val p = dbPath(db).resolve(validName(table))
    if (Files.exists(p.resolve("_table.meta"))) {
      withStream(Files.walk(p))(_.iterator().asScala.toList)
        .reverse.foreach(Files.deleteIfExists(_))
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
