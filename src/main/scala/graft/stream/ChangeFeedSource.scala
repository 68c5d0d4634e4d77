package graft.stream

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.graftshim.StreamShim
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.table.MergeTable

/** Streaming source over a MergeTable's change feed — the engine's analog of
  * an Iceberg/Delta incremental streaming read, closing the reference's loop
  * where the lake table is itself the head of downstream pipelines
  * (README.md:323–341 reads the continuously-updated table).
  *
  *   spark.readStream.format("graft-changes").option("path", tableRoot).load()
  *
  * Offsets are table versions (one `LongOffset` per committed snapshot), so
  * the offset log is exactly the table's own commit history:
  *   - a micro-batch covers the version range `(start, end]` and returns
  *     `MergeTable.changesBetween` for it — upserts, tombstone deletes, and
  *     `resync` markers for overwrite/truncate/rollback commits;
  *   - compaction/bin-pack commits advance the offset but contribute zero
  *     rows (layout-only), so maintenance never disturbs consumers;
  *   - ranges compose (each version's delta is against its immediate
  *     predecessor), so any micro-batch slicing yields the same multiset of
  *     change rows as one batch `changesSince` call — spec-checked;
  *   - same lag contract as batch incremental reads: compaction rewrites
  *     are metadata-only (superseded files stay until snapshot expiry), so
  *     lagging consumers keep working across rewrites; only a consumer
  *     stopped past `expireSnapshots` of its unread versions must restart
  *     from a fresh bootstrap (new checkpoint) rather than its old offset.
  *
  * At scale this is driver-cheap: `getOffset` reads one 8-byte `_latest`
  * file, and planning a batch touches only the (chunked) manifests of the
  * versions in range — O(delta), never O(table).
  *
  * Options: `path` (table root, required); `startVersion` (first batch covers
  * `(startVersion, latest]`; default -1 = full history, i.e. a bootstrap
  * load followed by incremental tailing — the reference's DMS full-load +
  * CDC phasing in one source); `maxVersionsPerTrigger` (cap on how many
  * table versions one micro-batch may cover — the analog of the file
  * source's `maxFilesPerTrigger` back-pressure knob, so a replication
  * stream started against a long table history catches up in bounded
  * micro-batches instead of planning one giant `(start, latest]` batch;
  * unset = unbounded, the previous behavior).
  */
final class ChangeFeedSource(
    sqlContext: SQLContext,
    tableRoot: String,
    startVersion: Long,
    maxVersionsPerTrigger: Option[Long] = None)
  extends Source {

  private val table = MergeTable.open(tableRoot)

  override val schema: StructType = table.changeFeedSchema

  /** Highest version already handed to a micro-batch — the base the
    * per-trigger cap advances from. Seeded from `startVersion` and
    * restored on restart because the engine re-calls [[getBatch]] with
    * the checkpointed range before polling for new offsets (the same
    * recovery contract FileStreamSource's seen-files map relies on);
    * [[getBatch]] also takes a max so a recovery replay can never move
    * it backwards.
    */
  @volatile private var handedOut: Long = startVersion

  /** Latest committed table version, capped at `handedOut +
    * maxVersionsPerTrigger` when the back-pressure knob is set; None
    * until the first commit past the configured start. Re-reads
    * `_latest` every call — no driver state to go stale when another
    * session writes the table.
    */
  override def getOffset: Option[Offset] = {
    val v = table.latestVersion
    val capped = maxVersionsPerTrigger match {
      // never below handedOut: a stale base must not rewind the stream
      case Some(m) => math.max(math.min(v, handedOut + m), handedOut)
      case None    => v
    }
    if (capped <= startVersion) None else Some(LongOffset(capped))
  }

  private def versionOf(o: Offset): Long = o match {
    case LongOffset(v)       => v
    case so: SerializedOffset => LongOffset(so).offset
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(startVersion)
    val to = versionOf(end)
    handedOut = math.max(handedOut, to)
    StreamShim.asStreaming(
      table.changesBetween(sqlContext.sparkSession, from, to))
  }

  override def stop(): Unit = ()

  override def toString: String = s"ChangeFeedSource[$tableRoot]"
}

/** `format("graft-changes")` registration (via DataSourceRegister service
  * loading) for [[ChangeFeedSource]].
  */
final class ChangeFeedSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-changes"

  private def root(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-changes requires option 'path'"))

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), MergeTable.open(root(parameters)).changeFeedSchema)

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val maxV = parameters.get("maxVersionsPerTrigger").map(_.toLong)
    maxV.foreach(m => require(m > 0,
      s"maxVersionsPerTrigger must be positive, got $m"))
    new ChangeFeedSource(sqlContext, root(parameters),
      parameters.get("startVersion").map(_.toLong).getOrElse(-1L), maxV)
  }
}
