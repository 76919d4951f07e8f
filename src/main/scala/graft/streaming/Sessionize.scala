package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization — the streaming twin of the declared
  * batch query x13 (30-min-gap sessions via lag + cumulative sum).
  *
  * `KeyValueGroupedDataset.flatMapGroupsWithState` keeps one tiny state
  * record per user (last event time + current session ordinal), so state
  * size is O(distinct users), not O(events) — the shape that survives an
  * unbounded stream. Events inside a micro-batch are sorted by (ts,
  * event_id) before folding; across batches the watermark/delivery order of
  * the file/kafka source is assumed non-decreasing per user (same contract
  * as the batch query's window sort).
  */
object Sessionize {

  final case class SessionEvent(event_id: Long, user_id: Long, ts_us: Long)
  final case class SessionAssignment(event_id: Long, user_id: Long, session_seq: Long)
  final case class UserSession(lastTsUs: Long, seq: Long)

  val DefaultGapUs: Long = 1800L * 1000000L

  def assign(
      events: Dataset[SessionEvent],
      gapUs: Long = DefaultGapUs): Dataset[SessionAssignment] = {
    implicit val outEnc = Encoders.product[SessionAssignment]
    implicit val stateEnc = Encoders.product[UserSession]
    implicit val keyEnc = Encoders.scalaLong

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, batch: Iterator[SessionEvent], state: GroupState[UserSession]) => {
          var st = state.getOption.getOrElse(UserSession(Long.MinValue, 0L))
          val out = batch.toSeq.sortBy(e => (e.ts_us, e.event_id)).map { e =>
            val isNew = st.seq == 0L || (e.ts_us - st.lastTsUs) > gapUs
            st = UserSession(e.ts_us, if (isNew) st.seq + 1 else st.seq)
            SessionAssignment(e.event_id, user, st.seq)
          }
          state.update(st)
          out.iterator
        })
  }
}
