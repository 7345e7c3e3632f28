package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of q119's cohort-retention matrix: per-user keyed state
  * latches the FIRST week a user is seen (their cohort) and thereafter
  * emits one activation row per NEW (user, week-offset) — the live feed
  * whose `groupBy(cohort, offset).count()` rollup is exactly q119's
  * `n_active` column, maintained incrementally instead of re-scanned.
  *
  * Semantics contract: cohort is first-touch latched, and a (user, week)
  * activation emits exactly once — the streaming counterparts of q119's
  * per-user `min(week)` and its (cohort, offset, user) `distinct`. Weeks
  * are ISO-Monday truncations (`date_trunc('week')`'s rule) computed in
  * exact epoch-day integer arithmetic, matching the batch query's
  * no-floats discipline. Each micro-batch's per-user group is sorted by
  * event time first, so intra-batch arrival order never matters; an event
  * that time-travels BEFORE the latched cohort across batches is late
  * data and is dropped (offset would be negative) — the standard
  * watermark-class caveat every Spark stateful operator carries; the
  * batch q119 over the full log is the reconciliation query.
  *
  * State is one epoch-day long plus the set of seen week offsets —
  * O(weeks user was active), bounded by campaign lifetime, NOT by event
  * volume; a 1000-executor deployment holds |users| small-state entries.
  */
object Cohort {

  final case class Ev(user_id: Long, ts_us: Long)

  /** `cohort_day` is the epoch-day of the cohort week's Monday. */
  final case class Activation(user_id: Long, cohort_day: Long, offset_weeks: Long)

  final case class CState(cohortDay: Long, offsets: Seq[Long])

  private val DayUs = 86400L * 1000000L

  /** Epoch-day of the ISO-Monday starting `epochDay`'s week (1970-01-01
    * was a Thursday, hence the +3 alignment).
    */
  private def mondayOf(epochDay: Long): Long = epochDay - Math.floorMod(epochDay + 3, 7)

  private def weekOf(tsUs: Long): Long = mondayOf(Math.floorDiv(tsUs, DayUs))

  def activations(events: Dataset[Ev]): Dataset[Activation] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(advance)
  }

  private def advance(
      user: Long, evs: Iterator[Ev], state: GroupState[CState]): Iterator[Activation] = {
    var st = state.getOption.orNull
    val out = Seq.newBuilder[Activation]
    evs.toSeq.sortBy(_.ts_us).foreach { e =>
      val wk = weekOf(e.ts_us)
      if (st == null) {
        st = CState(wk, Seq(0L))
        out += Activation(user, wk, 0L)
      } else {
        val off = (wk - st.cohortDay) / 7
        if (off >= 0 && !st.offsets.contains(off)) {
          st = st.copy(offsets = st.offsets :+ off)
          out += Activation(user, st.cohortDay, off)
        }
      }
    }
    if (st != null) state.update(st)
    out.result().iterator
  }
}
