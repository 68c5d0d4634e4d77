package graft.sqlcat

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, ProcedureCatalog, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.catalog.LakeCatalog

/** Spark catalog plugin making engine tables first-class SQL citizens —
  * the reference's Glue-catalog role (cdk_stacks/firehose_to_iceberg.py:
  * 80–82) expressed as a DataSource V2 `TableCatalog`:
  *
  * {{{
  *   spark.sql.catalog.graft            = graft.sqlcat.GraftCatalog
  *   spark.sql.catalog.graft.warehouse  = /data/warehouse
  *   spark.sql.extensions               = graft.sqlcat.GraftSqlExtensions
  *
  *   CREATE NAMESPACE graft.cdc_iceberg_demo_db
  *   CREATE TABLE graft.cdc_iceberg_demo_db.retail_trans_iceberg (
  *     trans_id BIGINT, customer_id STRING, event STRING, sku STRING,
  *     amount INT, device STRING, trans_datetime TIMESTAMP)
  *   PARTITIONED BY (event)
  *   TBLPROPERTIES ('unique_keys'='trans_id',
  *                  'optimize_rewrite_delete_file_threshold'='10')
  *   -- then INSERT / UPDATE / DELETE / MERGE INTO / SELECT, incl.
  *   -- SELECT ... VERSION AS OF <v>  (time travel)
  * }}}
  *
  * mirroring the reference DDL (README.md:292–309: `CREATE TABLE ...
  * PARTITIONED BY (event) ... TBLPROPERTIES`). Arbitrary TBLPROPERTIES
  * are persisted in `_table.props` beside the table metadata and round-
  * trip through `DESCRIBE TABLE EXTENDED` / `ALTER TABLE ... SET
  * TBLPROPERTIES`. Namespaces and tables live under the warehouse dir
  * exactly as [[LakeCatalog]] lays them out — both APIs see one catalog.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog {
  import GraftCatalog._

  private var catalogName: String = _
  private var lake: LakeCatalog = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val wh = Option(options.get(WarehouseOpt)).getOrElse(
      sys.props.getOrElse("java.io.tmpdir", "/tmp") + s"/graft-warehouse-$name")
    lake = new LakeCatalog(wh)
  }

  override def name(): String = catalogName

  /** Underlying path-based catalog (shared layout with the Scala API). */
  def lakeCatalog: LakeCatalog = lake

  private def db(ns: Array[String]): String = {
    if (ns.length != 1) throw new NoSuchNamespaceException(ns)
    ns(0)
  }

  // ---- namespaces (CREATE/SHOW/DROP NAMESPACE) ----

  override def listNamespaces(): Array[Array[String]] =
    lake.listDatabases.map(Array(_)).toArray

  override def listNamespaces(parent: Array[String]): Array[Array[String]] =
    if (parent.isEmpty) listNamespaces()
    else if (lake.databaseExists(db(parent))) Array.empty
    else throw new NoSuchNamespaceException(parent)

  override def namespaceExists(ns: Array[String]): Boolean =
    ns.length == 1 && lake.databaseExists(ns(0))

  override def loadNamespaceMetadata(ns: Array[String]): util.Map[String, String] =
    if (namespaceExists(ns)) Map.empty[String, String].asJava
    else throw new NoSuchNamespaceException(ns)

  override def createNamespace(ns: Array[String], meta: util.Map[String, String]): Unit =
    lake.createDatabase(db(ns))

  override def alterNamespace(ns: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE is not supported")

  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean = {
    if (!namespaceExists(ns)) return false
    val tables = lake.listTables(db(ns))
    if (tables.nonEmpty && !cascade)
      throw new IllegalStateException(s"namespace ${ns(0)} is not empty")
    tables.foreach(t => lake.dropTable(db(ns), t))
    Files.deleteIfExists(Paths.get(lake.warehouse, db(ns)))
    true
  }

  // ---- tables ----

  override def listTables(ns: Array[String]): Array[Identifier] = {
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)
    lake.listTables(db(ns)).map(t => Identifier.of(ns, t)).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace.length == 1 &&
      lake.tableExists(ident.namespace()(0), ident.name)

  private def fullName(ident: Identifier): String =
    (Seq(catalogName) ++ ident.namespace :+ ident.name).mkString(".")

  override def loadTable(ident: Identifier): Table = {
    // metadata tables, Iceberg-style: cat.db.t.snapshots|files|refs
    // arrive as Identifier(ns=[db, t], name=<meta>)
    if (ident.namespace.length == 2 &&
        lake.tableExists(ident.namespace()(0), ident.namespace()(1))) {
      val t = lake.getTable(ident.namespace()(0), ident.namespace()(1))
      val dfFn: Option[org.apache.spark.sql.SparkSession =>
          org.apache.spark.sql.DataFrame] = ident.name match {
        case "snapshots"  => Some(s => t.snapshotsDf(s))
        case "files"      => Some(s => t.filesDf(s))
        case "refs"       => Some(s => t.refsDf(s))
        case "partitions" => Some(s => t.partitionsDf(s))
        case "stats"      => Some(s => t.statsDf(s))
        case _            => None
      }
      dfFn.foreach(f => return new GraftMetaTable(fullName(ident), f))
    }
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val d = ident.namespace()(0)
    new GraftSqlTable(fullName(ident), lake.getTable(d, ident.name),
      readProps(d, ident.name))
  }

  /** `SELECT ... FROM t VERSION AS OF <v>` — engine time travel in SQL.
    * `VERSION AS OF 'branch:<name>'` reads a WAP branch head instead
    * (the audit step of write-audit-publish, read-only by construction:
    * DML statements never carry a version clause);
    * `VERSION AS OF 'tag:<name>'` reads a tag-pinned snapshot.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val d = ident.namespace()(0)
    if (version.startsWith("branch:")) {
      val b = lake.getTable(d, ident.name).branch(version.stripPrefix("branch:"))
      return new GraftSqlTable(fullName(ident), b, readProps(d, ident.name))
    }
    if (version.startsWith("tag:")) {
      val t = lake.getTable(d, ident.name)
      return new GraftSqlTable(fullName(ident), t, readProps(d, ident.name),
        asOfVersion = Some(t.tagVersion(version.stripPrefix("tag:"))))
    }
    val v = try version.toLong catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"graft table versions are integers, 'branch:<name>', or " +
            s"'tag:<name>', got '$version'")
    }
    new GraftSqlTable(fullName(ident), lake.getTable(d, ident.name),
      readProps(d, ident.name), asOfVersion = Some(v))
  }

  /** `SELECT ... FROM t TIMESTAMP AS OF <ts>` — resolve the wall-clock
    * instant (Spark hands micros) to the latest snapshot committed at or
    * before it, using the commit stamps in the manifest headers.
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val d = ident.namespace()(0)
    val t = lake.getTable(d, ident.name)
    new GraftSqlTable(fullName(ident), t, readProps(d, ident.name),
      asOfVersion = Some(t.versionAtTimestamp(timestamp / 1000L)))
  }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident.toString)
    val d = db(ident.namespace())
    if (!lake.databaseExists(d)) throw new NoSuchNamespaceException(ident.namespace())
    val props = properties.asScala.toMap
    val partitionCol = partitions.toSeq match {
      case Seq() => None
      case Seq(t) if t.name == "identity" && t.references.length == 1 =>
        Some(t.references()(0).fieldNames.mkString("."))
      case other => throw new UnsupportedOperationException(
        s"only a single identity PARTITIONED BY column is supported, got: ${other.mkString(", ")}")
    }
    // reference DDL carries the merge key and the MoR maintenance knob as
    // table properties (unique_keys, optimize_rewrite_delete_file_threshold
    // — README.md:302–308); default key = first column
    val key = props.getOrElse(UniqueKeysProp, schema.fields.head.name)
    require(!key.contains(","), "composite unique_keys are not supported")
    val threshold = props.get(ThresholdProp).map(_.toInt).getOrElse(10)
    lake.createTable(d, ident.name, schema, key, partitionCol, threshold)
    // persist every user property verbatim (TBLPROPERTIES passthrough);
    // engine-interpreted ones are also kept so DESCRIBE shows the truth
    writeProps(d, ident.name,
      props -- Seq(TableCatalog.PROP_OWNER, TableCatalog.PROP_LOCATION,
        TableCatalog.PROP_PROVIDER, TableCatalog.PROP_EXTERNAL))
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val d = ident.namespace()(0)
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames.length == 1, "nested ADD COLUMN is not supported")
        lake.getTable(d, ident.name)
          .addColumn(StructField(add.fieldNames()(0), add.dataType, nullable = true))
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames.length == 1, "nested DROP COLUMN is not supported")
        lake.getTable(d, ident.name).dropColumn(del.fieldNames()(0))
      case ren: TableChange.RenameColumn =>
        require(ren.fieldNames.length == 1,
          "nested RENAME COLUMN is not supported")
        lake.getTable(d, ident.name)
          .renameColumn(ren.fieldNames()(0), ren.newName)
      case set: TableChange.SetProperty =>
        writeProps(d, ident.name,
          readProps(d, ident.name) + (set.property -> set.value))
      case rm: TableChange.RemoveProperty =>
        writeProps(d, ident.name, readProps(d, ident.name) - rm.property)
      case other => throw new UnsupportedOperationException(
        s"unsupported ALTER TABLE change: $other")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    if (!tableExists(ident)) return false
    lake.dropTable(ident.namespace()(0), ident.name)
    true
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent.toString)
    val src = Paths.get(lake.warehouse, oldIdent.namespace()(0), oldIdent.name)
    val dst = Paths.get(lake.warehouse, db(newIdent.namespace()), newIdent.name)
    if (!Files.isDirectory(dst.getParent))
      throw new NoSuchNamespaceException(newIdent.namespace())
    Files.move(src, dst, StandardCopyOption.ATOMIC_MOVE)
  }

  // ---- maintenance procedures (CALL graft.system.<proc>(...)) ----

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    require(ident.namespace.sameElements(Array("system")),
      s"procedures live in the 'system' namespace, got ${ident.namespace.mkString(".")}")
    GraftProcedures.load(ident.name, lake)
  }

  override def listProcedures(ns: Array[String]): Array[Identifier] =
    if (ns.isEmpty || ns.sameElements(Array("system")))
      GraftProcedures.names.map(n => Identifier.of(Array("system"), n)).toArray
    else Array.empty

  // ---- TBLPROPERTIES passthrough (stored beside _table.meta) ----

  private def propsPath(d: String, t: String): Path =
    Paths.get(lake.warehouse, d, t, "_table.props")

  private def readProps(d: String, t: String): Map[String, String] = {
    val p = propsPath(d, t)
    if (!Files.exists(p)) Map.empty
    else Files.readAllLines(p).asScala.flatMap { l =>
      l.split("\t", 2) match {
        case Array(k, v) => Some(k -> v)
        case _           => None
      }
    }.toMap
  }

  private def writeProps(d: String, t: String, props: Map[String, String]): Unit = {
    props.keys.foreach(k => require(!k.exists(c => c == '\t' || c == '\n'),
      s"property name must not contain tab/newline: $k"))
    props.values.foreach(v => require(!v.exists(c => c == '\t' || c == '\n'),
      s"property value must not contain tab/newline: $v"))
    val tmp = propsPath(d, t).resolveSibling(".table.props.tmp")
    Files.writeString(tmp, props.toSeq.sorted.map { case (k, v) => s"$k\t$v" }
      .mkString("", "\n", "\n"))
    Files.move(tmp, propsPath(d, t),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }
}

object GraftCatalog {
  val WarehouseOpt = "warehouse"
  /** Reference DDL property naming the merge key (README.md:302–308). */
  val UniqueKeysProp = "unique_keys"
  /** Reference MoR maintenance knob (README.md:307). */
  val ThresholdProp = "optimize_rewrite_delete_file_threshold"
}
