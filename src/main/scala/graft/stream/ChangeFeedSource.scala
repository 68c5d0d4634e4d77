package graft.stream

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.connector.read.streaming.{
  Offset => OffsetV2, ReadAllAvailable, ReadLimit, ReadMaxFiles,
  SupportsAdmissionControl, SupportsTriggerAvailableNow}
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
  * At scale this is driver-cheap: polling reads one 8-byte `_latest` file,
  * and planning a batch touches only the (chunked) manifests of the
  * versions in range — O(delta), never O(table).
  *
  * Admission control follows FileStreamSource: the source implements
  * [[SupportsAdmissionControl]] (the engine polls `latestOffset(start,
  * limit)` instead of `getOffset`) and [[SupportsTriggerAvailableNow]].
  * The latter matters whenever `maxVersionsPerTrigger` is set: a v1 source
  * WITHOUT it gets wrapped under `Trigger.AvailableNow`, the wrapper pins
  * the first (capped!) offset as "everything available", and the query
  * stops after one micro-batch with the rest of the history silently
  * unconsumed. Implementing it directly lets AvailableNow drain the whole
  * prepare-time head in a SEQUENCE of capped micro-batches, exactly like
  * `maxFilesPerTrigger` on the file source.
  *
  * Options: `path` (table root, required); `startVersion` (first batch covers
  * `(startVersion, latest]`; default -1 = full history, i.e. a bootstrap
  * load followed by incremental tailing — the reference's DMS full-load +
  * CDC phasing in one source); `maxVersionsPerTrigger` (cap on how many
  * table versions one micro-batch may cover — back-pressure so a
  * replication stream started against a long table history catches up in
  * bounded micro-batches instead of planning one giant `(start, latest]`
  * batch; unset = unbounded).
  */
final class ChangeFeedSource(
    sqlContext: SQLContext,
    tableRoot: String,
    startVersion: Long,
    maxVersionsPerTrigger: Option[Long] = None)
  extends Source with SupportsAdmissionControl with SupportsTriggerAvailableNow {

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

  /** Trigger.AvailableNow horizon: the table head snapshotted at
    * `prepareForTriggerAvailableNow`. The run drains up to here in capped
    * micro-batches and then stops, even if writers keep committing.
    */
  @volatile private var availableNowHorizon: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowHorizon = Some(table.latestVersion)

  /** `maxVersionsPerTrigger` expressed as the engine's read-limit: versions
    * are this source's admission unit the way files are the file source's.
    */
  override def getDefaultReadLimit: ReadLimit =
    maxVersionsPerTrigger.map(m => ReadLimit.maxFiles(m.toInt))
      .getOrElse(ReadLimit.allAvailable())

  /** Next micro-batch end offset: the table head, bounded by the
    * AvailableNow horizon (when set) and by `base + cap` under a
    * [[ReadMaxFiles]] limit. Returning the start offset itself signals
    * "no new data". Re-reads `_latest` every call — no driver state to go
    * stale when another session writes the table.
    */
  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val base = math.max(handedOut, Option(startOffset).map(versionOf).getOrElse(startVersion))
    val head = availableNowHorizon.fold(table.latestVersion)(h =>
      math.min(h, table.latestVersion))
    val capped = limit match {
      // never below base: a stale head read must not rewind the stream
      case f: ReadMaxFiles => math.max(math.min(head, base + f.maxFiles()), base)
      case _: ReadAllAvailable => math.max(head, base)
      case _ => math.max(head, base)
    }
    if (capped <= startVersion) null else LongOffset(capped)
  }

  /** Uncapped head, for progress reporting (`latestOffset` in the query
    * progress event shows true lag, not the admission-controlled target).
    */
  override def reportLatestOffset(): OffsetV2 = {
    val v = table.latestVersion
    if (v <= startVersion) null else LongOffset(v)
  }

  /** Admission-controlled engines call [[latestOffset]]; this stays for
    * direct drives of the source (specs, tooling) with the same cap.
    */
  override def getOffset: Option[Offset] =
    Option(latestOffset(null, getDefaultReadLimit))
      .map(o => LongOffset(versionOf(o)))

  private def versionOf(o: OffsetV2): Long = o match {
    case LongOffset(v)        => v
    case so: SerializedOffset => LongOffset(so).offset
    case other => other.json.toLong
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
    maxV.foreach(m => require(m > 0 && m <= Int.MaxValue,
      s"maxVersionsPerTrigger must be a positive int, got $m"))
    new ChangeFeedSource(sqlContext, root(parameters),
      parameters.get("startVersion").map(_.toLong).getOrElse(-1L), maxV)
  }
}
