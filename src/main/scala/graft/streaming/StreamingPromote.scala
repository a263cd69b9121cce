package graft.streaming

import graft.lake.{Enrich, Normalize, Zones}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming twin of the batch promote (SURVEY.md §2B streaming
  * row): the reference's incremental micro-batch loads (O-15, Step-Function
  * triggered) become a file-source stream over the staging zone — same
  * normalize -> enrich -> partitioned-append pipeline, but Spark tracks
  * progress (checkpoint) and discovers new staging files itself, replacing
  * the external orchestration loop.
  *
  * Scale notes: the file source lists incrementally (maxFilesPerTrigger
  * bounds batch size), state for windowed aggs is bounded by the watermark,
  * and the sink appends the same Hive partitions the batch path writes —
  * so a consumer cannot tell which path produced a partition.
  */
object StreamingPromote {

  /** Continuous staging -> curated promote. `Trigger.AvailableNow` drains
    * everything currently staged then stops — the exact semantics of one
    * reference micro-load, minus the Lambda hop. Schema must be supplied:
    * streaming JSON cannot infer (the all-string staging contract makes
    * this a constant: [[graft.lake.Writer.allStringSchema]]).
    */
  def run(spark: SparkSession, zones: Zones, table: String,
          schema: StructType, checkpoint: String,
          maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader = spark.readStream
      .schema(schema)
      .option("recursiveFileLookup", "true")
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val staged = reader.json(zones.stagingIncremental(table))
    val curated = Enrich.withAuditColumns(Normalize.normalize(staged))
    curated.writeStream
      .format("parquet")
      .option("path", zones.curated(table))
      .option("checkpointLocation", checkpoint)
      .partitionBy(Enrich.PartitionColumns: _*)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming promote into an ACID table: each micro-batch lands as ONE
    * [[graft.lake.TxLog]] commit via foreachBatch, so a concurrent reader
    * of the curated table always resolves a whole number of micro-batches
    * — never a half-written one (the plain parquet streaming sink exposes
    * in-progress files to path scans) — and any batch can be time-traveled
    * or rolled back by version. Combined with the checkpoint's exactly-
    * once file-source tracking, a drained run is an atomic, versioned
    * replica of the staging zone.
    *
    * EXACTLY-ONCE: each commit is tagged (checkpoint, batchId) through
    * [[graft.lake.TxLog.appendIdempotent]], so a batch replayed after a
    * crash between commit and checkpoint is recognized by the log's own
    * transaction watermark and skipped — the same guarantee as the
    * generic `txlog` sink ([[TxLogSinkProvider]]); this path adds the
    * promote pipeline's normalize/enrich on the way.
    */
  def runAcid(spark: SparkSession, zones: Zones, table: String,
              schema: StructType, checkpoint: String,
              maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader = spark.readStream
      .schema(schema)
      .option("recursiveFileLookup", "true")
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val staged = reader.json(zones.stagingIncremental(table))
    val curated = Enrich.withAuditColumns(Normalize.normalize(staged))
    curated.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty)
          graft.lake.TxLog.appendIdempotent(spark, batch.toDF(),
            zones.curated(table), appId = checkpoint, txnVersion = batchId,
            Enrich.PartitionColumns): Unit
      }
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Watermarked tumbling-window counts per event type over a streaming
    * frame with an event-time column: late rows beyond `watermark` are
    * dropped and their window state is reclaimed — the property that keeps
    * state bounded on an unbounded stream.
    */
  def windowedCounts(events: DataFrame, tsCol: String = "ts",
                     watermark: String = "10 minutes",
                     window: String = "5 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(functions_window(col(tsCol), window), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(30,6)")).cast("double").as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("sum_value"))

  // alias: `window` the function vs the parameter name
  private def functions_window(c: org.apache.spark.sql.Column, d: String) =
    org.apache.spark.sql.functions.window(c, d)
}
