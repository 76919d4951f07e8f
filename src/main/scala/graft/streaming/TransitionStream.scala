package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming transition extraction — the streaming twin of the
  * declared batch query x76 ([[graft.ext.Behavior.transitions]]): emit one
  * (from_type → to_type) record per consecutive event pair in each user's
  * time-ordered stream, as the events arrive.
  *
  * State is one tiny record per user (last event's µs timestamp + type) —
  * O(distinct users), not O(events), the only state shape that survives an
  * unbounded stream. Events inside a micro-batch are sorted by (ts_us,
  * event_id) before folding — the same (µs, id) tie pin as the batch
  * window — and the fold carries the state across batch boundaries, so a
  * pair split across two micro-batches is still emitted exactly once.
  * Downstream, a standard streaming `groupBy(from_type, to_type).count` in
  * update mode maintains the running Markov matrix.
  */
object TransitionStream {

  final case class TypedEvent(
    event_id: Long, user_id: Long, ts_us: Long, event_type: String)
  final case class Transition(
    user_id: Long, from_type: String, to_type: String)
  final case class LastEvent(tsUs: Long, eventId: Long, eventType: String)

  def pairs(events: Dataset[TypedEvent]): Dataset[Transition] = {
    implicit val outEnc = Encoders.product[Transition]
    implicit val stateEnc = Encoders.product[LastEvent]
    implicit val keyEnc = Encoders.scalaLong

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, batch: Iterator[TypedEvent], state: GroupState[LastEvent]) => {
          var prev = state.getOption
          val out = batch.toSeq.sortBy(e => (e.ts_us, e.event_id)).flatMap { e =>
            val emitted = prev.map(p => Transition(user, p.eventType, e.event_type))
            prev = Some(LastEvent(e.ts_us, e.event_id, e.event_type))
            emitted
          }
          prev.foreach(state.update)
          out.iterator
        })
  }
}
