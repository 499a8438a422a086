package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state (SURVEY.md §2.9 "mapGroupsWithState …
  * available for the extension surface"): an event-time sessionizer
  * built on `flatMapGroupsWithState` — the arbitrary-state API the
  * reference's checkpoint machinery would need if its semantics ever
  * outgrew watermarked windows.
  *
  * State per user: the open session (bounds, count, value sum).
  * An event merges into the session if within `gapMs` of EITHER end
  * of its [start, end] interval — an out-of-order event (still inside
  * the watermark) may extend the session backward, lowering `start`.
  * An event past `end + gapMs` closes the session and opens a new
  * one; late stragglers more than `gapMs` BEFORE `start` are
  * gap-sessionized among themselves within the batch and emitted as
  * their own closed session(s) — state keeps only the open session,
  * so a straggler chain is never merged across batches or into the
  * open session (documented trade-off).
  * Event-time timeout closes idle sessions once the watermark passes
  * session end + gap, which bounds state size — the 100 TB
  * requirement for any unbounded-stream operator.
  */
object StatefulSessionizer {

  final case class Event(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(
      start: Long, end: Long, n: Long, total: Double)
  final case class ClosedSession(
      user_id: Long, start: Timestamp, end: Timestamp, n_events: Long,
      total_value: Double)

  def sessionize(spark: SparkSession, events: Dataset[Event],
      gapMs: Long): Dataset[ClosedSession] = {
    import spark.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(userId,
              new Timestamp(s.start), new Timestamp(s.end), s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            // straggler chain: events > gap before the open session,
            // gap-merged among themselves (ascending order)
            var pend: Option[SessionState] = None
            def flushPend(): Unit = pend.foreach { p =>
              closed ::= ClosedSession(userId, new Timestamp(p.start),
                new Timestamp(p.end), p.n, p.total)
              pend = None
            }
            for (e <- sorted) {
              val t = e.ts.getTime
              cur match {
                case Some(s) if t >= s.start - gapMs && t <= s.end + gapMs =>
                  // within the gap of the session interval (either end)
                  flushPend()
                  cur = Some(SessionState(math.min(s.start, t),
                    math.max(s.end, t), s.n + 1, s.total + e.value))
                case Some(s) if t > s.end + gapMs =>
                  flushPend()
                  closed ::= ClosedSession(userId, new Timestamp(s.start),
                    new Timestamp(s.end), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case Some(_) =>
                  // straggler > gap BEFORE the open session: merge into
                  // the pending straggler chain if within gap of it,
                  // else close the chain and start a new one
                  pend match {
                    case Some(p) if t - p.end <= gapMs =>
                      pend = Some(SessionState(p.start, t, p.n + 1,
                        p.total + e.value))
                    case other =>
                      if (other.isDefined) flushPend()
                      pend = Some(SessionState(t, t, 1, e.value))
                  }
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            flushPend()
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
