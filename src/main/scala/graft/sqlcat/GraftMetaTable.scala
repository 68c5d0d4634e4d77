package graft.sqlcat

import java.util

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, V1Scan}
import org.apache.spark.sql.sources.{BaseRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Read-only metadata table surfaced through the catalog as
  * `<catalog>.<db>.<table>.<meta>` — the Iceberg metadata-table idiom
  * (`SELECT * FROM cat.db.t.snapshots`). The row set is computed on the
  * driver from manifest headers (snapshots/refs) or file metadata
  * (files): O(versions + files-in-snapshot) work, no data scan — these
  * answer from metadata even on a 100 TB table.
  */
final class GraftMetaTable(
    ident: String,
    df: SparkSession => DataFrame)
  extends Table with SupportsRead {

  override def name(): String = ident

  // one computation per resolution: Spark asks for the schema several
  // times while analyzing a query, and each df() call re-reads manifests
  // on the driver. A Table instance is created per loadTable, so caching
  // here never serves stale metadata across statements.
  private lazy val frame = df(SparkSession.active)

  override def schema(): StructType = frame.schema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new V1Scan {
        override def readSchema(): StructType = frame.schema
        override def toV1TableScan[T <: BaseRelation with TableScan](ctx: SQLContext): T =
          new BaseRelation with TableScan {
            override def sqlContext: SQLContext = ctx
            override def schema: StructType = frame.schema
            override def buildScan(): RDD[Row] = frame.rdd
          }.asInstanceOf[T]
      }
    }
}
