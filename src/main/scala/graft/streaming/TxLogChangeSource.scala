package graft.streaming

import graft.lake.TxLog
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession, graftnative}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow, Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Structured Streaming source over a [[TxLog]] table's CHANGE FEED — the
  * streaming twin of `TxLog.readChanges` (and of Delta's streaming
  * `readChangeFeed`): each micro-batch is the insert/delete rows of the
  * commit range (startOffset, endOffset], tagged `_change_type` and
  * `_commit_version`, with the stream's offset BEING the commit version.
  * Downstream, the full Structured Streaming surface applies (watermarks,
  * stateful aggs, foreachBatch sinks), and the checkpoint makes
  * consumption resumable exactly where [[TxLog.consumeChanges]]'s manual
  * offset file did — but with Spark-managed offsets and replay:
  *
  * {{{
  * spark.readStream
  *   .format("graft.streaming.TxLogChangeSourceProvider")
  *   .option("root", tableRoot)
  *   .load()
  * }}}
  *
  * Admission control: the commit-version cap (`maxVersionsPerTrigger`)
  * goes through [[SupportsAdmissionControl.latestOffset]], which receives
  * the COMMITTED start offset — the capped head is start+n even across
  * restarts (a cap tracked source-side would reset on restart and stall
  * the stream below the head; this is why FileStreamSource uses the same
  * hook). `Trigger.AvailableNow` is implemented natively
  * ([[SupportsTriggerAvailableNow]] — the engine's generic wrapper would
  * bypass the delegate's cap and drain in one giant batch): the head is
  * pinned at query start and drained to in capped batches.
  *
  * Scale notes (100 TB): offset discovery is one log-directory listing;
  * `getBatch` builds the same per-commit file-list scan as the batch feed
  * — no shuffle, cost proportional to the CHANGED bytes of the consumed
  * range, never table size. The declared schema is pinned at stream
  * start; columns added by a mid-stream evolution surface after a restart
  * (same restart contract as every log-format CDC stream). Vacuumed
  * ranges fail fast with the batch feed's named-file error.
  */
final class TxLogChangeSource(spark: SparkSession, root: String,
                              startingVersion: Long,
                              maxVersionsPerTrigger: Option[Long])
    extends Source with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  override val schema: StructType = TxLogChangeSource.schemaFor(spark, root)

  // (exclusive-from, inclusive-to] version window, like the batch feed
  private def ver(o: Offset): Long = o.json.trim.toLong
  private def ver2(o: OffsetV2): Long = o.json.trim.toLong

  override def initialOffset(): OffsetV2 = LongOffset(startingVersion)

  override def deserializeOffset(json: String): OffsetV2 =
    LongOffset(json.trim.toLong)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  // Trigger.AvailableNow pins the head at query start; batches drain to
  // it (still capped per batch) and the query stops there even if other
  // writers keep committing
  @volatile private var pinnedHead: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    pinnedHead = Some(TxLog.latestVersion(spark, root).getOrElse(startingVersion))

  /** Next batch's end version: the table head (or the AvailableNow pin),
    * capped to start+n under `maxVersionsPerTrigger`. Returning the start
    * offset itself means "no new data".
    */
  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val from = Option(start).map(ver2).getOrElse(startingVersion)
    val head = pinnedHead.getOrElse(
      TxLog.latestVersion(spark, root).getOrElse(from))
    val to = maxVersionsPerTrigger.fold(head)(n =>
      math.min(head, from + math.max(1L, n)))
    LongOffset(math.max(from, to))
  }

  /** The true (uncapped) head — what Trigger.AvailableNow pins as its
    * drain target, so capped batches still drain ALL commits present at
    * query start.
    */
  override def reportLatestOffset(): OffsetV2 =
    LongOffset(TxLog.latestVersion(spark, root).getOrElse(startingVersion))

  /** Unreached when admission control is implemented (the engine calls
    * [[latestOffset]]); kept total for direct callers.
    */
  override def getOffset: Option[Offset] =
    TxLog.latestVersion(spark, root)
      .filter(_ > startingVersion).map(LongOffset(_))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(ver).getOrElse(startingVersion)
    val to = ver(end)
    val delta = TxLog.readChanges(spark, root, from, Some(to))
    // conform to the stream's pinned schema: a capped catch-up batch over
    // PRE-EVOLUTION commits resolves under that range's older schema, so
    // columns the table gained later must be null-filled here — a bare
    // select would throw and wedge the stream at the evolution point
    // (columns the declared schema lacks are dropped, same restart
    // contract as above)
    val have = delta.columns.toSet
    val ordered = delta.select(schema.fields.toIndexedSeq.map { f =>
      if (have.contains(f.name)) col(f.name)
      else org.apache.spark.sql.functions.lit(null).cast(f.dataType).as(f.name)
    }: _*)
    graftnative.asStreamingBatch(ordered)
  }

  override def stop(): Unit = ()
}

object TxLogChangeSource {
  /** Feed schema = the table's CURRENT snapshot schema + the two change
    * columns (metadata-only: no data file is opened).
    */
  def schemaFor(spark: SparkSession, root: String): StructType =
    TxLog.readLatest(spark, root).schema
      .add("_change_type", StringType)
      .add("_commit_version", LongType)
}

/** `format("graft.streaming.TxLogChangeSourceProvider")` registration.
  * Options: `root` (table root, required); `startingVersion` (exclusive
  * lower bound, default -1 = from the beginning) OR `startingTimestamp`
  * (epoch ms, 'yyyy-MM-dd HH:mm:ss', or ISO-8601 — the feed includes
  * every commit at-or-after the instant, resolved against the available
  * log once at stream start; mutually exclusive with `startingVersion`);
  * `maxVersionsPerTrigger` (commit-count backpressure cap per
  * micro-batch, default unbounded).
  */
final class TxLogChangeSourceProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "txlog-changes"

  private def root(parameters: Map[String, String]): String =
    parameters.getOrElse("root",
      throw new IllegalArgumentException(
        "txlog-changes needs option(\"root\", <table root>)"))

  private def startVersion(spark: SparkSession,
                           parameters: Map[String, String]): Long =
    (parameters.get("startingVersion"), parameters.get("startingTimestamp")) match {
      case (Some(_), Some(_)) => throw new IllegalArgumentException(
        "txlog-changes takes startingVersion OR startingTimestamp, not both")
      case (Some(v), None) => v.toLong
      case (None, Some(ts)) =>
        // parsing + at-or-after bound resolution shared with the SQL
        // table_changes surface — one implementation, no format drift
        val ms = TxLog.parseTimestampMs(ts).getOrElse(
          throw new IllegalArgumentException(
            s"cannot parse startingTimestamp '$ts' (epoch ms, " +
              "'yyyy-MM-dd HH:mm:ss', or ISO-8601 instant)"))
        TxLog.versionStrictlyBefore(spark, root(parameters), ms)
      case (None, None) => -1L
    }

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (shortName(),
      schema.getOrElse(
        TxLogChangeSource.schemaFor(sqlContext.sparkSession, root(parameters))))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source =
    new TxLogChangeSource(sqlContext.sparkSession, root(parameters),
      startVersion(sqlContext.sparkSession, parameters),
      parameters.get("maxVersionsPerTrigger").map(_.toLong))
}
