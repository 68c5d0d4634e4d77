package graft.sqlcat

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TruncatableTable}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, Statistics, SupportsReportStatistics, V1Scan}
import org.apache.spark.sql.connector.read.colstats.ColumnStatistics
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsOverwrite, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.table.MergeTable

/** DataSource V2 face of a [[MergeTable]] — what `spark.sql` statements
  * resolve `graft.<db>.<table>` to. The reference's entire user surface is
  * SQL strings against its lake tables (README.md:285–309 DDL,
  * README.md:400–443 DML); this class plus [[GraftCatalog]] and
  * [[GraftSqlExtensions]] gives the engine the same surface.
  *
  * Read/write strategy:
  *   - With [[GraftSqlExtensions]] installed (the recommended setup),
  *     SELECTs never reach the scan below — the analyzer rule splices the
  *     native merge-on-read plan (parquet scans + one keyed window) in
  *     place of this relation, keeping column pruning, filter pushdown
  *     into the scans, and whole-stage codegen.
  *   - Without the extension, the V1 fallback scan still answers SELECTs
  *     correctly (full merged read, filtering above), and the V1 write
  *     handles INSERT INTO / INSERT OVERWRITE. UPDATE/DELETE/MERGE need
  *     the extension.
  *
  * INSERT INTO is a plain transactional append (Iceberg parity — inserts
  * do not merge by key); keyed upserts arrive via the CDC pipeline,
  * `UPDATE`/`MERGE INTO`, or `MergeTable.applyBatch`.
  */
final class GraftSqlTable(
    ident: String,
    val mergeTable: MergeTable,
    val extraProps: Map[String, String],
    val asOfVersion: Option[Long] = None)
  extends Table with SupportsRead with SupportsWrite with TruncatableTable {

  override def name(): String = ident
  override def schema(): StructType = mergeTable.schema

  override def partitioning(): Array[Transform] =
    mergeTable.partitionCol.map(c => Expressions.identity(c)).toArray

  override def properties(): util.Map[String, String] =
    (extraProps ++ Map(
      GraftCatalog.UniqueKeysProp -> mergeTable.keyCol,
      GraftCatalog.ThresholdProp -> mergeTable.deleteCompactThreshold.toString
    )).asJava

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_BY_FILTER)

  /** V1 fallback scan: the merged snapshot as an RDD[Row]. Correct but
    * conversion-heavy; superseded by the extension's plan splice.
    *
    * The scan reports manifest-derived statistics
    * (`SupportsReportStatistics`): without them Spark prices this
    * relation at `defaultSizeInBytes` (~10²⁵ B) and a small dimension
    * table can NEVER broadcast — every key join sort-merges, exactly the
    * plan a 1000-executor cluster can least afford. Size is the
    * snapshot's summed data-file bytes (an upper bound on the merged
    * output — the safe direction); row count and per-column NDV / null
    * counts flow through when persisted ANALYZE stats match this exact
    * snapshot version ([[MergeTable.scanEstimate]]).
    */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new V1Scan with SupportsReportStatistics {
        override def readSchema(): StructType = mergeTable.schema
        override def estimateStatistics(): Statistics = {
          val (bytes, rows, cols) = mergeTable.scanEstimate(asOfVersion)
          new Statistics {
            // None = manifest unreadable → let Spark fall back to
            // defaultSizeInBytes rather than pricing the table as empty
            override def sizeInBytes(): util.OptionalLong =
              bytes.fold(util.OptionalLong.empty())(util.OptionalLong.of)
            override def numRows(): util.OptionalLong =
              rows.fold(util.OptionalLong.empty())(util.OptionalLong.of)
            override def columnStats()
                : util.Map[NamedReference, ColumnStatistics] =
              cols.map { case (c, (nulls, ndv)) =>
                (Expressions.column(c): NamedReference) ->
                  (new ColumnStatistics {
                    override def nullCount(): util.OptionalLong =
                      util.OptionalLong.of(nulls)
                    override def distinctCount(): util.OptionalLong =
                      util.OptionalLong.of(ndv)
                  }: ColumnStatistics)
              }.asJava
          }
        }
        override def toV1TableScan[T <: BaseRelation with TableScan](ctx: SQLContext): T =
          new BaseRelation with TableScan {
            override def sqlContext: SQLContext = ctx
            override def schema: StructType = mergeTable.schema
            // same estimate for planners that consult the V1 relation;
            // unknown → defaultSizeInBytes (the anti-broadcast direction)
            override def sizeInBytes: Long =
              mergeTable.scanEstimate(asOfVersion)._1.getOrElse(
                ctx.sparkSession.sessionState.conf.defaultSizeInBytes)
            override def buildScan(): RDD[Row] =
              mergeTable.read(ctx.sparkSession, asOfVersion).rdd
          }.asInstanceOf[T]
      }
    }

  /** V1 write: INSERT INTO → transactional append; INSERT OVERWRITE /
    * truncate-mode write → full snapshot replacement; filtered overwrite
    * (static-mode `INSERT OVERWRITE ... PARTITION (p = 'x')`) → atomic
    * replacement of exactly the matching rows via
    * [[MergeTable.overwriteWhere]] (time travel retained in every mode).
    */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsOverwrite {
      // None = plain append; Some(all-AlwaysTrue) = truncate-mode
      // replacement (SupportsOverwrite.truncate defaults to
      // overwrite(AlwaysTrue)); Some(other) = filtered overwrite
      private var overwriteFilters: Option[Array[Filter]] = None
      override def overwrite(filters: Array[Filter]): WriteBuilder = {
        overwriteFilters = Some(filters); this
      }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit =
              overwriteFilters match {
                case Some(fs) if fs.forall(_.isInstanceOf[AlwaysTrue]) =>
                  mergeTable.overwrite(data)
                case Some(fs) =>
                  val pred = fs.map(GraftSqlTable.filterToColumn).reduce(_ && _)
                  mergeTable.overwriteWhere(data.sparkSession, pred, data)
                case None =>
                  if (overwrite) mergeTable.overwrite(data)
                  else mergeTable.appendAll(data)
              }
          }
      }
    }

  override def truncateTable(): Boolean = {
    mergeTable.truncate()
    true
  }
}

object GraftSqlTable {
  /** V1 data-source Filter → Column, for the overwrite-by-filter path.
    * Spark's static partition overwrite emits EqualTo on the partition
    * column; the rest covers what V2Writes can translate. Anything it
    * can't express arrives here as an unknown subclass → clear error at
    * write-build time instead of a silent full replacement.
    */
  private[sqlcat] def filterToColumn(f: Filter): Column = f match {
    case _: AlwaysTrue            => lit(true)
    case _: AlwaysFalse           => lit(false)
    case EqualTo(a, v)            => col(a) === lit(v)
    case EqualNullSafe(a, v)      => col(a) <=> lit(v)
    case GreaterThan(a, v)        => col(a) > lit(v)
    case GreaterThanOrEqual(a, v) => col(a) >= lit(v)
    case LessThan(a, v)           => col(a) < lit(v)
    case LessThanOrEqual(a, v)    => col(a) <= lit(v)
    case In(a, vs)                => col(a).isin(vs.toIndexedSeq: _*)
    case IsNull(a)                => col(a).isNull
    case IsNotNull(a)             => col(a).isNotNull
    case And(l, r)                => filterToColumn(l) && filterToColumn(r)
    case Or(l, r)                 => filterToColumn(l) || filterToColumn(r)
    case Not(c)                   => !filterToColumn(c)
    case StringStartsWith(a, v)   => col(a).startsWith(v)
    case StringEndsWith(a, v)     => col(a).endsWith(v)
    case StringContains(a, v)     => col(a).contains(v)
    case other => throw new UnsupportedOperationException(
      s"overwrite filter not supported: $other")
  }
}
