package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media payload: opaque bytes + typed metadata. In a real pipeline the
  * bytes are image/audio/video; here they come from the documents table
  * (no media columns in the test data) — the Spark-side plumbing (schema,
  * encoders, partition-wise batch processing) is real either way.
  */
final case class MediaRecord(
    doc_id: Long,
    media_type: String,
    payload: Array[Byte])

final case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    byte_len: Long,
    width: Int,
    height: Int,
    channels: Int,
    brightness: Double)

/** Multimodal-column operators: treat media as `binary` columns with typed
  * metadata, process partition-wise (the Scala analog of `mapInPandas`
  * batch UDFs — one iterator per partition, arbitrary native calls inside).
  *
  * The actual codecs (image decode, audio resample, video frame-grab) are
  * NOT available in this environment, so the decode step is a clearly
  * marked deterministic STUB; everything around it — binary schema,
  * partition iteration, typed Dataset output, downstream aggregation —
  * is the real production shape.
  */
object Multimodal {

  /** Documents → media records: payload = UTF-8 bytes standing in for real
    * media bytes; media_type derived deterministically for fan-out tests.
    */
  def toMedia(documents: DataFrame): Dataset[MediaRecord] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** STUB DECODE — a real deployment replaces the body of `fakeDecode`
    * with an image/audio codec call (e.g. via JNI or a vendored pure-JVM
    * decoder). Deterministic in the payload bytes so tests are stable.
    * Partition-wise (`mapPartitions`): amortizes any per-codec setup cost
    * once per partition, exactly like a batch Pandas UDF would.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition "codec" init would go here
      it.map { r =>
        val (w, h, c, bright) = fakeDecode(r.payload)
        MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong, w, h, c, bright)
      }
    }
  }

  /** STUB: pretends the payload is a decodable frame; derives fake
    * dimensions + mean "brightness" from the bytes deterministically.
    */
  private def fakeDecode(payload: Array[Byte]): (Int, Int, Int, Double) = {
    val n = payload.length
    val width = 64 + (n % 577)
    val height = 64 + ((n * 31) % 421)
    val channels = 3
    var sum = 0L
    var i = 0
    while (i < n) { sum += (payload(i) & 0xFF); i += 1 }
    // floor quantization, not rint: rint is half-even while SQL engines
    // round half-away — floor(x*10000)/10000 is the same float ops
    // everywhere, keeping the feature cross-engine verifiable
    val brightness = if (n == 0) 0.0 else
      math.floor(sum.toDouble / n * 10000) / 10000
    (width, height, channels, brightness)
  }

  /** Fixed-size frame sampling from a binary column — pure expressions:
    * every `stride` bytes take a `frameLen`-byte slice (video frame-sample
    * analog; on real video this is keyframe extraction inside the codec).
    */
  def frameSample(media: DataFrame, frameLen: Int = 16, maxFrames: Int = 4): DataFrame =
    media.withColumn("frames",
      transform(
        sequence(lit(0), least(
          floor(octet_length(col("payload")).cast("long") / frameLen).cast("long") - 1,
          lit(maxFrames.toLong - 1))),
        i => substring(col("payload"), (i * frameLen + 1).cast("int"), lit(frameLen))))

  /** End-to-end multimodal feature pipeline as a query. */
  def featureQuery(spark: SparkSession, documents: DataFrame): DataFrame =
    extractFeatures(toMedia(documents)).toDF()
      .select(col("doc_id"), col("media_type"), col("byte_len"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("brightness"))
      .orderBy(col("doc_id"))
}
