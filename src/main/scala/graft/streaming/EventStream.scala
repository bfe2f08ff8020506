package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState

/** Streaming analytics over an event stream: watermarked tumbling-window
  * aggregation and custom stateful sessionization — the Structured
  * Streaming counterparts of the batch q_events_hourly /
  * q_events_sessionize queries.
  *
  * Scale notes: watermark bounds state (late events beyond 2h are
  * dropped); the window agg is a streaming partial-agg with state keyed
  * by (window, event_type); sessionization keys state by user_id —
  * high-cardinality, so state distributes evenly across executors and
  * each key's state is O(1) (one open session).
  */
object EventStream {

  final case class Event(user_id: Long, sec: Long, value: Double)
  final case class SessionState(start: Long, end: Long, n: Long, sum: Double)
  final case class SessionSnapshot(user_id: Long, start_sec: Long, end_sec: Long,
                                   n_events: Long, sum_value: Double)

  /** Tumbling 1h counts with a 2h watermark (append-capable). Input needs
    * an event-time `ts: timestamp` column. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"), col("n"), col("sum_value"))

  /** Stream-static enrichment: a live event stream joined to a static
    * (broadcastable) dimension — the streaming analogue of the batch
    * dimension joins. Spark plans this as a broadcast join per
    * micro-batch; the static side is re-resolved per batch, so slowly
    * changing dims pick up updates. */
  def enrich(events: DataFrame, dim: DataFrame, eventKey: String, dimKey: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim),
      events(eventKey) === dim(dimKey), "left_outer")

  /** Per-user sessionization with a gap timeout, as a custom stateful
    * operator (`mapGroupsWithState`): events more than `gapSec` apart
    * start a new session; each update emits the current session snapshot
    * (Update output mode). */
  def sessionize(events: Dataset[Event], gapSec: Long = 1800)(
      implicit enc: org.apache.spark.sql.Encoder[SessionSnapshot],
      stEnc: org.apache.spark.sql.Encoder[SessionState]): Dataset[SessionSnapshot] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionSnapshot] {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = batch.toSeq.sortBy(_.sec)
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, Long.MinValue, 0, 0.0))
          sorted.foreach { e =>
            st = if (st.n == 0 || e.sec - st.end > gapSec)
              SessionState(e.sec, e.sec, 1, e.value)
            else
              SessionState(st.start, e.sec, st.n + 1, st.sum + e.value)
          }
          state.update(st)
          SessionSnapshot(userId, st.start, st.end, st.n, st.sum)
      }
  }
}
