package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of q96's ordered-stage conversion funnel: per-user stage
  * progression (view → click-after-view → purchase-after-click) tracked as
  * keyed state with `flatMapGroupsWithState`, emitting a progression row
  * the moment a user advances a stage — the live dashboard feed whose
  * batch rollup is exactly q96.
  *
  * Semantics contract: stage k latches the first qualifying event with
  * timestamp STRICTLY after stage k−1's, the same rule q96's chained
  * window minima compute. Each micro-batch's per-user group is sorted by
  * event time before the state machine runs, so intra-batch arrival order
  * never matters; an event that time-travels BEHIND an already-latched
  * stage across batches is late data — the standard watermark-class
  * caveat every Spark stateful operator carries (the batch q96 over the
  * full log is the reconciliation query).
  *
  * State is three optional microsecond timestamps per user — constant
  * size, so a 1000-executor deployment holds |active users| × 24 bytes of
  * state, not event volume.
  */
object Funnel {

  final case class Ev(user_id: Long, ts_us: Long, event_type: String)
  final case class Stage(user_id: Long, stage: String, us: Long)
  final case class FState(t1: Option[Long], t2: Option[Long], t3: Option[Long])

  def progressions(events: Dataset[Ev]): Dataset[Stage] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(advance)
  }

  private def advance(
      user: Long, evs: Iterator[Ev], state: GroupState[FState]): Iterator[Stage] = {
    var st = state.getOption.getOrElse(FState(None, None, None))
    val out = Seq.newBuilder[Stage]
    // restore event-time order within the batch; event_type as tie-break
    // keeps simultaneous events deterministic
    evs.toSeq.sortBy(e => (e.ts_us, e.event_type)).foreach { e =>
      (e.event_type, st) match {
        case ("view", FState(None, _, _)) =>
          st = st.copy(t1 = Some(e.ts_us))
          out += Stage(user, "view", e.ts_us)
        case ("click", FState(Some(t1), None, _)) if e.ts_us > t1 =>
          st = st.copy(t2 = Some(e.ts_us))
          out += Stage(user, "click", e.ts_us)
        case ("purchase", FState(_, Some(t2), None)) if e.ts_us > t2 =>
          st = st.copy(t3 = Some(e.ts_us))
          out += Stage(user, "purchase", e.ts_us)
        case _ => // stage already latched, out of order, or funnel not yet at this stage
      }
    }
    state.update(st)
    out.result().iterator
  }
}
