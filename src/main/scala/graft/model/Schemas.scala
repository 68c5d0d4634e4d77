package graft.model

import org.apache.spark.sql.types._

/** Record schemas for the CDC pipeline.
  *
  * The envelope shape mirrors the DMS→Kinesis wire format observed in the
  * reference (src/utils/gen_fake_cdc_data.py:28–58 and
  * src/main/python/firehose_to_iceberg_transformer.py:54–113): a two-level
  * struct `{data, metadata}`, one JSON object per line. Hyphenated metadata
  * field names are literal.
  */
object Schemas {

  /** Payload row of the OLTP table `testdb.retail_trans`
    * (reference README.md:218–228 MySQL DDL; README.md:292–309 Athena DDL).
    * `trans_id` is standardized to LongType (MySQL BIGINT wins over the
    * Athena DDL's `int` — documented deviation, SURVEY.md §7).
    */
  val RetailTransSchema: StructType = StructType(Seq(
    StructField("trans_id", LongType),
    StructField("customer_id", StringType),
    StructField("event", StringType),
    StructField("sku", StringType),
    StructField("amount", IntegerType),
    StructField("device", StringType),
    StructField("trans_datetime", StringType) // ISO-8601; parsed downstream
  ))

  /** CDC envelope metadata (reference firehose_to_iceberg_transformer.py:24,29;
    * gen_fake_cdc_data.py:28).
    */
  val MetadataSchema: StructType = StructType(Seq(
    StructField("timestamp", StringType),          // ISO-8601 w/ microseconds
    StructField("record-type", StringType),        // "data" | "control"
    StructField("operation", StringType),          // insert | update | delete | ...
    StructField("partition-key-type", StringType), // "primary-key"
    StructField("schema-name", StringType),        // source database
    StructField("table-name", StringType),         // source table
    StructField("transaction-id", LongType)
  ))

  val EnvelopeSchema: StructType = StructType(Seq(
    StructField("data", RetailTransSchema),
    StructField("metadata", MetadataSchema)
  ))

  /** Engine-side lake-table schema: payload with parsed timestamp. */
  val LakeTableSchema: StructType = StructType(Seq(
    StructField("trans_id", LongType),
    StructField("customer_id", StringType),
    StructField("event", StringType),
    StructField("sku", StringType),
    StructField("amount", IntegerType),
    StructField("device", StringType),
    StructField("trans_datetime", TimestampType)
  ))
}

/** Typed views of the above for Dataset[T] API boundaries. */
final case class RetailTrans(
    trans_id: Long,
    customer_id: String,
    event: String,
    sku: String,
    amount: Int,
    device: String,
    trans_datetime: java.sql.Timestamp)

final case class CdcMetadata(
    timestamp: String,
    `record-type`: String,
    operation: String,
    `partition-key-type`: String,
    `schema-name`: String,
    `table-name`: String,
    `transaction-id`: Long)
