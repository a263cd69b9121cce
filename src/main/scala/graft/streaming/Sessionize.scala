package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time sessionization with custom keyed state (SURVEY.md §2B
  * UDF/streaming row): groups a user's events into sessions separated by
  * at least `gapMs` of event-time silence, emitting each session once its
  * gap has passed the watermark. State per key is one running session —
  * bounded regardless of stream length — and is reclaimed on timeout.
  */
object Sessionize {

  final case class Event(user_id: Long, ts: Timestamp, event_type: String,
                         value: Double)

  final case class SessionAgg(startMs: Long, endMs: Long, nEvents: Long,
                              totalValue: Double)

  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long,
                           total_value: Double)

  def sessions(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L,
               watermark: String = "10 minutes"): Dataset[Session] = {
    implicit val aggEnc = Encoders.product[SessionAgg]
    implicit val outEnc = Encoders.product[Session]
    implicit val longEnc = Encoders.scalaLong
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update(gapMs))
  }

  /** State transition: fold the batch's events into the running session,
    * splitting whenever the event-time gap exceeds `gapMs` (closed splits
    * emit immediately); otherwise arm an event-time timeout at session end
    * + gap, so the final session emits when the watermark passes it.
    */
  private def update(gapMs: Long)(
      user: Long, batch: Iterator[Event],
      state: GroupState[SessionAgg]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator.single(toSession(user, s))
    }
    val sorted = batch.toSeq.sortBy(_.ts.getTime)
    var cur = state.getOption.orNull
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      val t = e.ts.getTime
      if (cur == null) {
        cur = SessionAgg(t, t, 1L, e.value)
      } else if (t - cur.endMs > gapMs) {
        closed += toSession(user, cur)
        cur = SessionAgg(t, t, 1L, e.value)
      } else {
        // min() the start too: a late-but-in-watermark event from an
        // earlier micro-batch can predate the running session's start
        cur = SessionAgg(math.min(cur.startMs, t), math.max(cur.endMs, t),
          cur.nEvents + 1, cur.totalValue + e.value)
      }
    }
    if (cur != null) {
      state.update(cur)
      state.setTimeoutTimestamp(cur.endMs + gapMs)
    }
    closed.result().iterator
  }

  private def toSession(user: Long, s: SessionAgg): Session =
    Session(user, new Timestamp(s.startMs), new Timestamp(s.endMs),
      s.nEvents, s.totalValue)
}
