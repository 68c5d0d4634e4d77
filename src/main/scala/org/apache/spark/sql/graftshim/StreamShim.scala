package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}
import org.apache.spark.sql.Row

/** The one internal-API bridge the engine needs: a DSv1 streaming `Source`'s
  * `getBatch` must hand back a DataFrame with `isStreaming = true`
  * (MicroBatchExecution asserts it), and the only way to mint one is
  * `SparkSession.internalCreateDataFrame`, which is `private[sql]`. This
  * object lives under `org.apache.spark.sql` purely to satisfy that access
  * qualifier — the standard pattern for external Spark connectors that
  * implement DSv1 streaming sources (Delta's source does the same).
  */
object StreamShim {

  /** Re-wrap a (lazily evaluated) batch DataFrame as a streaming-tagged one
    * with the identical schema and physical plan.
    */
  def asStreaming(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[ClassicDataset[Row]]
    val spark = ds.sparkSession.asInstanceOf[ClassicSession]
    spark.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = true)
  }

  /** The inverse, for a DSv1 streaming `Sink`: the micro-batch DataFrame
    * handed to `addBatch` is tagged streaming (arbitrary batch operations
    * on it fail analysis), so re-wrap its already-planned incremental RDD
    * as a plain batch frame — the same pattern V1 sinks have always used.
    */
  def asBatch(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[ClassicDataset[Row]]
    val spark = ds.sparkSession.asInstanceOf[ClassicSession]
    spark.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = false)
  }
}
