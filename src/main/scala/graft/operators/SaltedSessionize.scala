package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase sessionization for skewed keys — the escape hatch for the one
  * residual risk in the plain lag+cumsum form (q59): its window partition
  * is a WHOLE user's event history, and a whale user's partition must be
  * sorted by a single task (AQE cannot split a running window). Here the
  * window key is salted with a TIME CHUNK, so the big sort runs on
  * (user, chunk) — bounded by the chunk width, splittable across the
  * cluster — and the cross-chunk session merge happens on the chunk
  * SUMMARY table, which is events/chunk-sized, not event-sized.
  *
  * Phase 1 (heavy, salted): within each (user, chunk) window, mark breaks
  * (gap > `gapThreshold`) and number local sessions 0..n-1 — the chunk's
  * first event is provisionally NOT a break.
  * Phase 2 (light): per (user, chunk) summary = (first/last event time,
  * local session count). A window over the user's chunk sequence decides
  * for each chunk whether its first local session CONTINUES the previous
  * chunk's last session (first_ts - prev_last_ts <= gap), and accumulates
  * each chunk's global session-id offset. Joining the summary back on
  * (user, chunk) turns local ids into global ids:
  * `global = offset + local - (merged ? 1 : 0)`.
  *
  * Result is identical to the plain one-window form for ANY chunk width
  * (SaltedSessionizeSpec proves parity on whale-skewed data; q64 shares
  * q59's SQL oracle). Chunk width trades salt granularity against summary
  * size — pick it so one user-chunk's events fit a task comfortably.
  *
  * Plan note (asserted in PlanSpec): every event-sized window partitions
  * on (user, chunk) — no whole-user event sort exists anywhere in the
  * plan, which is the entire point. Catalyst inlines phase 1 into both
  * the summary branch and the join-back branch (declarative plans cannot
  * share a subtree without materialization), so phase 1 computes twice;
  * at scale, persist the input — or this operator's `local` stage — the
  * same way the dedup family persists its feature frames, if the doubled
  * scan matters more than the storage.
  */
object SaltedSessionize {

  /** Sessionize `events`, returning the input columns plus `session_id`
    * (0-based per user, identical numbering to the unsalted lag+cumsum
    * form).
    *
    * @param userCol      session key column
    * @param tsCol        numeric event-time column (any unit)
    * @param gapThreshold new session when t - prev_t > gap (same unit)
    * @param chunkWidth   salt granularity (same unit)
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 gapThreshold: Long, chunkWidth: Long): DataFrame = {
    require(gapThreshold > 0 && chunkWidth > 0)
    val user = col(userCol)
    val t = col(tsCol)

    // phase 1: salted local sessionization — the only event-sized window,
    // keyed by (user, chunk) so no task ever sorts a whole whale user
    val wChunk = Window.partitionBy(user, col("_chunk")).orderBy(t)
    val wChunkRun = wChunk.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = events
      .withColumn("_chunk", floor(t / chunkWidth))
      .withColumn("_brk",
        when(t - lag(t, 1).over(wChunk) > gapThreshold, 1).otherwise(0))
      .withColumn("_sid_local", sum(col("_brk")).over(wChunkRun))

    // phase 2: cross-chunk merge on the summary table (events/chunk-sized)
    val wChunks = Window.partitionBy(userCol).orderBy("_chunk")
    val summary = local
      .groupBy(user, col("_chunk"))
      .agg(min(t).as("_first_ts"), max(t).as("_last_ts"),
        (max(col("_sid_local")) + 1).as("_n_local"))
      .withColumn("_prev_last", lag(col("_last_ts"), 1).over(wChunks))
      // does this chunk's first local session continue the previous
      // chunk's last one? (the provisional no-break at each chunk head)
      .withColumn("_merged",
        when(col("_prev_last").isNotNull &&
          col("_first_ts") - col("_prev_last") <= gapThreshold, 1).otherwise(0))
      // global id offset = sessions contributed by all earlier chunks
      .withColumn("_offset",
        coalesce(sum(col("_n_local") - col("_merged"))
          .over(wChunks.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(user, col("_chunk"), col("_offset"), col("_merged"))

    local
      .join(summary, Seq(userCol, "_chunk"))
      .withColumn("session_id",
        (col("_offset") + col("_sid_local") - col("_merged")).cast("long"))
      .drop("_chunk", "_brk", "_sid_local", "_offset", "_merged")
  }
}
