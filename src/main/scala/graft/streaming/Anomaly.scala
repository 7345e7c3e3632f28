package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of q138's volume-anomaly profile: per event type, keyed
  * state carries Welford running moments of the COMPLETED days' volumes,
  * and each day that closes is judged against the history that preceded
  * it — the live ops canary, flagging an outage/bot-storm day as it
  * closes instead of in the next batch sweep.
  *
  * Semantics contract: a day is judged ONLY against days strictly before
  * it (the online rule — q138's batch z-score judges against the whole
  * window, so the two agree in the limit but differ by design on the
  * prefix; the spec pins this exact prefix rule). A day closes when a
  * later day's event for the same type arrives; out-of-order events for
  * an already-closed day are late data (dropped — the watermark-class
  * caveat; batch q138 is the reconciliation query). Judgments need ≥ 2
  * prior days of history (sample σ undefined below that), σ = 0 history
  * flags nothing — both exactly q138's null-z rule.
  *
  * State is four scalars per type (count, mean, M2, open-day tally) —
  * O(|event types|) total state, independent of volume; Welford's update
  * is the numerically-stable streaming variance recurrence.
  */
object Anomaly {

  final case class Ev(event_type: String, ts_us: Long)

  /** One row per CLOSED day: its volume, the prior-history mean/σ, the
    * z-score against them (None below 2 days of history or σ = 0), and
    * the ≥ 2σ flag.
    */
  final case class DayVerdict(
      event_type: String, day: Long, n: Long,
      z: Option[Double], anomalous: Boolean)

  final case class AState(
      nDays: Long, mean: Double, m2: Double,
      openDay: Long, openCount: Long)

  private val DayUs = 86400L * 1000000L

  def verdicts(events: Dataset[Ev]): Dataset[DayVerdict] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(advance)
  }

  private def judge(st: AState): (Option[Double], Boolean) =
    if (st.nDays < 2) (None, false)
    else {
      val sd = math.sqrt(st.m2 / (st.nDays - 1))
      if (sd <= 0) (None, false)
      else {
        val z = BigDecimal((st.openCount - st.mean) / sd)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (Some(z), math.abs(z) >= 2.0)
      }
    }

  private def fold(st: AState): AState = {
    // Welford: absorb the closed day's volume into the running moments
    val n = st.nDays + 1
    val delta = st.openCount - st.mean
    val mean = st.mean + delta / n
    AState(n, mean, st.m2 + delta * (st.openCount - mean), -1L, 0L)
  }

  private def advance(
      tpe: String, evs: Iterator[Ev], state: GroupState[AState]): Iterator[DayVerdict] = {
    var st = state.getOption.getOrElse(AState(0L, 0.0, 0.0, -1L, 0L))
    val out = Seq.newBuilder[DayVerdict]
    evs.toSeq.sortBy(_.ts_us).foreach { e =>
      val d = Math.floorDiv(e.ts_us, DayUs)
      if (st.openDay < 0) st = st.copy(openDay = d, openCount = 1L)
      else if (d == st.openDay) st = st.copy(openCount = st.openCount + 1L)
      else if (d > st.openDay) {
        // the open day closes: judge it against prior history, then fold
        val (z, flag) = judge(st)
        out += DayVerdict(tpe, st.openDay, st.openCount, z, flag)
        st = fold(st).copy(openDay = d, openCount = 1L)
      }
      // d < openDay: late event for a closed day — dropped
    }
    state.update(st)
    out.result().iterator
  }
}
