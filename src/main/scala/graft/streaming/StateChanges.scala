package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Status-change detection as a custom stateful streaming operator — the
  * streaming twin of the batch transition detector in `CatalogOps.q70`
  * (reference `notify_status_update/task.py:63-110`: one notification per
  * step-state change).
  *
  * State per dataset: the last-seen (time, state). Each micro-batch folds
  * its events in event-time order and emits one Change row per state flip
  * — the same rows the batch lag() window produces, but incrementally
  * with O(1) state per key, so a 100 TB event firehose needs only
  * |datasets| state entries, not a shuffle of history.
  */
object StateChanges {

  final case class Ev(dataset_id: Long, event_id: Long, ts_us: Long, state: String)
  final case class Last(ts_us: Long, event_id: Long, state: String)
  final case class Change(dataset_id: Long, event_id: Long, at_us: Long, from_state: String, to_state: String)

  def detect(events: Dataset[Ev]): Dataset[Change] = {
    implicit val evEnc = Encoders.product[Ev]
    implicit val stEnc = Encoders.product[Last]
    implicit val outEnc = Encoders.product[Change]
    implicit val keyEnc = Encoders.scalaLong

    events
      .groupByKey(_.dataset_id)
      .flatMapGroupsWithState[Last, Change](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id: Long, batch: Iterator[Ev], state: GroupState[Last]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts_us, e.event_id))
          var last = state.getOption
          val out = Seq.newBuilder[Change]
          sorted.foreach { e =>
            last match {
              case Some(l) if l.state != e.state =>
                out += Change(id, e.event_id, e.ts_us, l.state, e.state)
              case _ => ()
            }
            last = Some(Last(e.ts_us, e.event_id, e.state))
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }
}
