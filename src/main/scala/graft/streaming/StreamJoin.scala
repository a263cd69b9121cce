package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join (SURVEY.md §2B streaming row):
  * each left event matched to right events of the same key within a
  * trailing event-time window — e.g. purchases joined to the clicks that
  * preceded them by at most `windowSpec`.
  *
  * Why the shape matters at scale: an unconstrained stream-stream join
  * would need unbounded state on both sides. The watermark plus the
  * two-sided time-range predicate lets Spark expire state as event time
  * advances — each side buffers only `watermark + window` worth of rows
  * per key, regardless of stream length.
  */
object StreamJoin {

  /** Inner interval join: right.ts in [left.ts - window, left.ts].
    * Columns must be disambiguated by the caller (no shared names except
    * via the key equality expressed here); both inputs must carry an
    * event-time column named by `leftTime`/`rightTime`.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTime: String, rightTime: String,
                   watermark: String, windowSpec: String): DataFrame = {
    val l = left.withWatermark(leftTime, watermark)
    val r = right.withWatermark(rightTime, watermark)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTime) <= col(leftTime) &&
        col(rightTime) >= col(leftTime) - expr(s"INTERVAL $windowSpec"))
  }
}
