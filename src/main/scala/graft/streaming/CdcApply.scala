package graft.streaming

import graft.lake.TxLog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming CDC replication (the medallion hop): a continuous query
  * reading an upstream commit-log table's change feed
  * ([[TxLogChangeSourceProvider]]) and applying each micro-batch to a
  * downstream commit-log table via [[TxLog.applyCdc]] — row-level
  * replication whose per-trigger cost is proportional to the upstream
  * CHANGED bytes, never a table rescan. The reference's Step-Functions
  * `{t}_incremental` promote loop (`utils.py:111-114`,
  * `serverless.yml:147-219`) as one declarative streaming query.
  *
  * Delivery: the source's offsets are upstream commit versions and ride
  * the query checkpoint, so each version is DELIVERED at-least-once;
  * [[TxLog.applyCdc]] is idempotent per batch (re-upserting held values,
  * re-deleting absent keys), so downstream STATE converges exactly-once
  * across crash/replay without transaction plumbing.
  *
  * Scale: `maxVersionsPerTrigger` bounds each trigger to a fixed number
  * of upstream commits (admission control through the source), keeping
  * the per-batch probe/rewrite CDC-sized — the regime the merge's
  * broadcast key probe and stats pruning are built for.
  */
object CdcApply {

  /** Start replicating `sourceRoot`'s change feed into `targetRoot`.
    * With `availableNow` the query drains the current upstream head and
    * terminates (the incremental-batch shape); otherwise it runs
    * continuously. The checkpoint pins upstream progress: restarting
    * with the same `checkpointDir` resumes at the next unapplied
    * version.
    */
  def start(spark: SparkSession, sourceRoot: String, targetRoot: String,
            keyCols: Seq[String], checkpointDir: String,
            partitionCols: Seq[String] = Seq.empty,
            statsCols: Seq[String] = Seq.empty,
            maxVersionsPerTrigger: Option[Int] = None,
            availableNow: Boolean = true): StreamingQuery = {
    require(keyCols.nonEmpty, "CDC replication needs key columns")
    val reader = spark.readStream
      .format("graft.streaming.TxLogChangeSourceProvider")
      .option("root", sourceRoot)
    maxVersionsPerTrigger.foreach(n =>
      reader.option("maxVersionsPerTrigger", n.toString))
    val writer = reader.load()
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        TxLog.applyCdc(batch.sparkSession, batch, targetRoot,
          keyCols, partitionCols, statsCols)
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** One batch replication step WITHOUT the streaming machinery — the
    * cron/Step-Functions driver shape: read the delta past the durable
    * offset ([[TxLog.consumeChanges]]), apply it, advance the offset.
    * The offset advances only AFTER the apply commits (at-least-once),
    * and [[TxLog.applyCdc]] is idempotent, so a crash between apply and
    * offset advance replays into convergence. Returns the applied
    * upstream (fromVersion, headVersion], or None when already caught
    * up.
    */
  def replicateOnce(spark: SparkSession, sourceRoot: String,
                    targetRoot: String, keyCols: Seq[String],
                    offsetPath: String,
                    partitionCols: Seq[String] = Seq.empty,
                    statsCols: Seq[String] = Seq.empty): Option[(Long, Long)] = {
    require(keyCols.nonEmpty, "CDC replication needs key columns")
    TxLog.consumeChanges(spark, sourceRoot, offsetPath) { delta =>
      TxLog.applyCdc(spark, delta, targetRoot, keyCols,
        partitionCols, statsCols)
      ()
    }
  }
}
