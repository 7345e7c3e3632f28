package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of q125's gaps-and-islands activity streaks: per-user
  * keyed state tracks the CURRENT run of consecutive active days and emits
  * one update row per day that changes it — the live engagement feed whose
  * per-(user, streak-start) `max(len)` equals the batch query's island
  * lengths, maintained incrementally instead of re-derived from the full
  * event log every time.
  *
  * Semantics contract (the batch query's rules, restated for state):
  * duplicate events on an already-counted day emit nothing (q125's
  * (user, day) distinct); a day exactly one after the last extends the
  * current streak; any larger forward gap CLOSES it and starts a new
  * 1-day streak at the new day (the Tabibitosan island boundary). Each
  * micro-batch's per-user group sorts by event time first, so intra-batch
  * arrival order never matters; a day that time-travels BEFORE the last
  * counted day across batches is late data and is dropped — it could
  * retroactively MERGE two islands, which no forward-only state can
  * represent (the standard watermark-class caveat; batch q125 over the
  * full log is the reconciliation query).
  *
  * State is two epoch-day longs — O(1) per user regardless of history
  * length; a 1000-executor deployment holds |users| constant-size entries.
  */
object Streaks {

  final case class Ev(user_id: Long, ts_us: Long)

  /** One row per streak CHANGE: `start_day` identifies the island,
    * `len_days` its length as of this event. The newest row per
    * (user_id, start_day) is the island's final length.
    */
  final case class StreakUpdate(user_id: Long, start_day: Long, len_days: Long)

  final case class SState(startDay: Long, lastDay: Long)

  private val DayUs = 86400L * 1000000L

  def updates(events: Dataset[Ev]): Dataset[StreakUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(advance)
  }

  private def advance(
      user: Long, evs: Iterator[Ev], state: GroupState[SState]): Iterator[StreakUpdate] = {
    var st = state.getOption.orNull
    val out = Seq.newBuilder[StreakUpdate]
    evs.toSeq.sortBy(_.ts_us).foreach { e =>
      val d = Math.floorDiv(e.ts_us, DayUs)
      if (st == null || d > st.lastDay + 1) {
        // first activity, or a gap: a fresh 1-day island
        st = SState(d, d)
        out += StreakUpdate(user, d, 1L)
      } else if (d == st.lastDay + 1) {
        st = st.copy(lastDay = d)
        out += StreakUpdate(user, st.startDay, d - st.startDay + 1)
      }
      // d <= lastDay: duplicate day or late data — no state change, no emit
    }
    if (st != null) state.update(st)
    out.result().iterator
  }
}
