package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming member of the dedup family (SURVEY.md §2C): exact key dedup
  * over an unbounded stream with BOUNDED state — the property that makes
  * it runnable forever on a 100 TB/day feed.
  *
  * `dropDuplicatesWithinWatermark` keeps one state entry per key and
  * expires it once the watermark passes the key's event time + delay, so
  * state is O(keys per watermark window), not O(keys ever seen). The
  * contract is correspondingly windowed: a duplicate arriving within the
  * watermark delay of the original is dropped; a re-arrival after the
  * state expired is treated as new (for global exact dedup over all
  * history, that tail is handled by the batch pass — q35 — over the
  * curated zone, the standard lambda split).
  */
object StreamingDedup {

  def dedup(stream: DataFrame, eventTimeCol: String, delay: String,
            keys: Seq[String]): DataFrame =
    stream
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
}
