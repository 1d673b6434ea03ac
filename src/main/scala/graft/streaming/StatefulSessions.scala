package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: per-user sessionization with
  * `flatMapGroupsWithState` — the surface Structured Streaming offers
  * when windowed aggregation can't express the state machine (here:
  * emit a session row only when the session CLOSES, carrying arbitrary
  * per-session state across micro-batches).
  *
  * State per user = the open session (start, last event, count, value
  * sum). An event with a gap >= `gapSeconds` closes the open session
  * (emits it) and opens a new one. Event-time timeout evicts idle state
  * — bounded state at any scale, keyed shuffle on user_id only.
  */
object StatefulSessions {

  final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
  final case class OpenSession(start: Timestamp, last: Timestamp, n: Long, total: Double)
  final case class ClosedSession(
      user_id: Long, session_start: Timestamp, session_end: Timestamp, n: Long, total: Double)

  def sessionize(gapSeconds: Long)(
      userId: Long,
      events: Iterator[SessionEvent],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.value))
    var open = state.getOption
    val closed = Seq.newBuilder[ClosedSession]
    if (state.hasTimedOut) {
      open.foreach(s => closed += ClosedSession(userId, s.start, s.last, s.n, s.total))
      state.remove()
      return closed.result().iterator
    }
    sorted.foreach { e =>
      open match {
        case Some(s) if (e.ts.getTime - s.last.getTime) / 1000.0 >= gapSeconds =>
          closed += ClosedSession(userId, s.start, s.last, s.n, s.total)
          open = Some(OpenSession(e.ts, e.ts, 1L, e.value))
        case Some(s) =>
          // a late (within-watermark) event from a later batch may carry
          // an EARLIER timestamp: extend, never rewind, the boundaries
          val start = if (e.ts.before(s.start)) e.ts else s.start
          val last = if (e.ts.after(s.last)) e.ts else s.last
          open = Some(OpenSession(start, last, s.n + 1, s.total + e.value))
        case None =>
          open = Some(OpenSession(e.ts, e.ts, 1L, e.value))
      }
    }
    open.foreach { s =>
      state.update(s)
      // a timeout at-or-before the current watermark is rejected by Spark
      // (IllegalArgumentException kills the query) — late-but-kept events
      // can produce one, so clamp just past the watermark
      val candidate = s.last.getTime + gapSeconds * 1000
      state.setTimeoutTimestamp(math.max(candidate, state.getCurrentWatermarkMs() + 1))
    }
    closed.result().iterator
  }

  /** Wire the state machine over a (possibly streaming) Dataset. */
  def closedSessions(
      spark: SparkSession,
      events: Dataset[SessionEvent],
      gapSeconds: Long = 1800L): Dataset[ClosedSession] = {
    import spark.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        sessionize(gapSeconds))
  }
}
