package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based session windows as a custom stateful streaming operator —
  * the streaming twin of the batch sessionization in Relational.q20.
  *
  * State per user: the open session. Events are folded in event-time
  * order; a gap > `gapMs` closes the open session and emits it. On event-
  * time timeout (watermark passes the gap horizon) the final open session
  * is emitted and state cleared — the standard flatMapGroupsWithState
  * session pattern (Spark Structured Streaming programming guide).
  */
object Sessionize {

  final case class Ev(user_id: Long, event_id: Long, ts_us: Long)
  final case class OpenSession(start_us: Long, end_us: Long, n: Long)
  final case class SessionOut(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  def sessionize(events: Dataset[Ev], gapMs: Long): Dataset[SessionOut] = {
    implicit val evEnc = Encoders.product[Ev]
    implicit val stEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val keyEnc = Encoders.scalaLong
    val gapUs = gapMs * 1000L

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Ev], state: GroupState[OpenSession]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            // watermark passed: close and emit the open session
            val out = state.getOption.toSeq
              .map(s => SessionOut(userId, s.start_us, s.end_us, s.n))
            state.remove()
            out.iterator
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts_us, e.event_id))
            var open = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              open match {
                case Some(s) if e.ts_us - s.end_us <= gapUs =>
                  // min() on start too: a late-but-in-watermark event can
                  // precede the open session's first event
                  open = Some(OpenSession(
                    math.min(s.start_us, e.ts_us), math.max(s.end_us, e.ts_us), s.n + 1))
                case Some(s) =>
                  closed += SessionOut(userId, s.start_us, s.end_us, s.n)
                  open = Some(OpenSession(e.ts_us, e.ts_us, 1))
                case None =>
                  open = Some(OpenSession(e.ts_us, e.ts_us, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              // close the session once the watermark is `gap` past its end
              state.setTimeoutTimestamp(s.end_us / 1000L + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
