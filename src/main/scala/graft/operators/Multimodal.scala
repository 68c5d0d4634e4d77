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
  * The decode step is REAL container-header parsing ([[ImageHeaders]]:
  * PNG/GIF/JPEG magic + dimension/bit-depth/channel extraction, pure JVM).
  * Full pixel decode (DCT, deflate) still needs codec jars this
  * environment lacks; payloads that are not a recognized image fall back
  * to deterministic byte-derived pseudo-dimensions so non-media payloads
  * (e.g. the text-bytes stand-ins in the test data) still flow through
  * the same typed pipeline.
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

  /** Decode: REAL header parse first ([[ImageHeaders.decode]] — PNG/GIF/
    * JPEG dims, bit depth, channels from the actual bytes); unrecognized
    * payloads get deterministic byte-derived pseudo-dimensions instead
    * (the test corpus' text-bytes payloads take this path — real media
    * never collides with it because the magic check runs first).
    * Partition-wise (`mapPartitions`): amortizes any per-codec setup cost
    * once per partition, exactly like a batch Pandas UDF would.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition codec-table init would go here
      it.map { r =>
        val (w, h, c) = ImageHeaders.decode(r.payload) match {
          case Some(m) => (m.width, m.height, m.channels)
          case None => byteStatsFallback(r.payload)
        }
        MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong, w, h, c,
          meanByte(r.payload))
      }
    }
  }

  /** Fallback for non-image payloads: deterministic pseudo-dimensions
    * derived from the byte length, so arbitrary binary still flows
    * through the typed pipeline with stable, cross-engine-checkable
    * values.
    */
  private def byteStatsFallback(payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length
    (64 + (n % 577), 64 + ((n * 31) % 421), 3)
  }

  /** Mean payload byte ("brightness" on raw frames). Floor quantization,
    * not rint: rint is half-even while SQL engines round half-away —
    * floor(x*10000)/10000 is the same float ops everywhere, keeping the
    * feature cross-engine verifiable.
    */
  private def meanByte(payload: Array[Byte]): Double = {
    val n = payload.length
    var sum = 0L
    var i = 0
    while (i < n) { sum += (payload(i) & 0xFF); i += 1 }
    if (n == 0) 0.0 else math.floor(sum.toDouble / n * 10000) / 10000
  }

  /** q98 pipeline: doc-derived REAL image headers (PNG/GIF/JPEG built by
    * [[ImageHeaders.buildForDoc]]) parsed back by the real decoder. The
    * oracle mirrors both sides in SQL: it re-builds the header hex and
    * re-extracts every field with byte (hex-substring) arithmetic.
    */
  def imageHeaderQuery(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    val parsed = documents.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { docId =>
        val meta = ImageHeaders.decode(ImageHeaders.buildForDoc(docId))
          .getOrElse(sys.error(s"built header failed to parse for doc $docId"))
        (docId, meta.format, meta.width.toLong, meta.height.toLong,
          meta.bitDepth.toLong, meta.channels.toLong)
      }
    }
    parsed.toDF("doc_id", "format", "width", "height", "bit_depth", "channels")
      .orderBy(col("doc_id"))
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
