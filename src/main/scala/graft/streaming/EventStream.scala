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
  * high-cardinality, so state distributes evenly across executors, each
  * key's state is O(1) (one open session), and idle keys are evicted by
  * event-time timeout once the watermark passes their session end + gap.
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

  /** Watermarked STREAM-STREAM inner join (attribution shape): each
    * `left` event matched to the `right` events of the same user that
    * occur within `maxGapSec` AFTER it. Both sides carry event-time
    * watermarks, and the time-range predicate bounds the join state on
    * both sides — Spark evicts buffered rows once the watermark passes
    * their match window, so state is O(rate × gap), not unbounded.
    * Input frames need (user_id, ts: timestamp) plus payload columns;
    * output uses `l_`/`r_` prefixes for ts to keep names unambiguous. */
  def attributionJoin(left: DataFrame, right: DataFrame,
                      maxGapSec: Long = 600,
                      watermarkDelay: String = "1 hour"): DataFrame = {
    val l = left.withWatermark("ts", watermarkDelay).as("l")
    val r = right.withWatermark("ts", watermarkDelay).as("r")
    l.join(r,
      expr(s"""l.user_id = r.user_id AND
              |r.ts >= l.ts AND r.ts <= l.ts + interval $maxGapSec seconds""".stripMargin))
      .select((Seq(col("l.user_id").as("user_id")) ++
        left.columns.filterNot(_ == "user_id").toSeq.map(c => col(s"l.$c").as(s"l_$c")) ++
        right.columns.filterNot(_ == "user_id").toSeq.map(c => col(s"r.$c").as(s"r_$c"))): _*)
  }

  /** Per-user sessionization with a gap timeout, as a custom stateful
    * operator (`flatMapGroupsWithState`): events more than `gapSec`
    * apart start a new session; sessions CLOSED within a batch are
    * emitted alongside the open session's snapshot (Update output mode).
    *
    * State hygiene, mirroring the batch sessionizer's gap semantics:
    *  - a late event WITHIN session reach (≥ start − gap) merges without
    *    moving the end backwards (`max(end, e.sec)` — a rewound end
    *    would corrupt every subsequent gap comparison);
    *  - a late event EARLIER than start − gap must NOT merge (the batch
    *    sessionizer would put a gap split between them — merging would
    *    fuse two sessions across a super-gap hole); the sorted early
    *    prefix is mini-sessionized and emitted as closed sessions — the
    *    bounded-one-open-session-per-key approximation, since state
    *    cannot hold reopened history;
    *  - per-user state is evicted via an EVENT-TIME timeout: once the
    *    watermark (bounded by `watermarkDelaySec`) passes session end +
    *    gap, the session can no longer be extended, so its final
    *    snapshot is emitted and the key's state freed. (Event-time, not
    *    processing-time timeouts: a processing-time timeout with the
    *    default 0-interval trigger forces a busy loop of empty
    *    micro-batches, while event-time timeouts fire only on watermark
    *    movement.) */
  def sessionize(events: Dataset[Event], gapSec: Long = 1800,
                 watermarkDelaySec: Long = 7200)(
      implicit enc: org.apache.spark.sql.Encoder[SessionSnapshot],
      stEnc: org.apache.spark.sql.Encoder[SessionState]): Dataset[SessionSnapshot] = {
    import events.sparkSession.implicits._
    events
      .withColumn("__ts", timestamp_seconds(col("sec")))
      .withWatermark("__ts", s"$watermarkDelaySec seconds")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSnapshot](
        org.apache.spark.sql.streaming.OutputMode.Update,
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator(SessionSnapshot(userId, st.start, st.end, st.n, st.sum))
          } else {
            val sorted = batch.toSeq.sortBy(_.sec)
            val out = scala.collection.mutable.Buffer.empty[SessionSnapshot]
            var st = state.getOption.getOrElse(SessionState(Long.MinValue, Long.MinValue, 0, 0.0))
            // sorted ⇒ events too early to touch the open session form a
            // strict PREFIX; they sessionize among themselves and emit
            // closed (they can never merge with the open session — their
            // whole run ends before start − gap by construction)
            val (early, rest) =
              if (st.n == 0) (Seq.empty[Event], sorted)
              else sorted.span(_.sec < st.start - gapSec)
            var cur: SessionState = null
            early.foreach { e =>
              if (cur == null) cur = SessionState(e.sec, e.sec, 1, e.value)
              else if (e.sec - cur.end > gapSec) {
                out += SessionSnapshot(userId, cur.start, cur.end, cur.n, cur.sum)
                cur = SessionState(e.sec, e.sec, 1, e.value)
              } else cur = SessionState(cur.start, e.sec, cur.n + 1, cur.sum + e.value)
            }
            if (cur != null) out += SessionSnapshot(userId, cur.start, cur.end, cur.n, cur.sum)
            rest.foreach { e =>
              st = if (st.n == 0) SessionState(e.sec, e.sec, 1, e.value)
              else if (e.sec - st.end > gapSec) {
                // forward gap: the open session is final — emit it closed
                out += SessionSnapshot(userId, st.start, st.end, st.n, st.sum)
                SessionState(e.sec, e.sec, 1, e.value)
              } else SessionState(math.min(st.start, e.sec), math.max(st.end, e.sec),
                st.n + 1, st.sum + e.value)
            }
            state.update(st)
            // timeout timestamps must stay ahead of the current watermark
            state.setTimeoutTimestamp(
              math.max((st.end + gapSec) * 1000, state.getCurrentWatermarkMs + 1))
            out += SessionSnapshot(userId, st.start, st.end, st.n, st.sum)
            out.iterator
          }
      }
  }

  /** Streaming data-quality gate: per micro-batch, compare the batch's
    * value histogram against a FIXED baseline (driver-collected once —
    * k+2 longs, broadcast implicitly as literals) and write the
    * per-bucket drift report under `batch_id=N` with dynamic overwrite —
    * replays converge, and the report table doubles as a drift
    * time-series. The circuit-breaker read (`anyDrift`) is
    * batches×buckets-sized. Baseline totals never rescan the reference
    * corpus: the whole per-trigger cost is one map-side-combined
    * histogram over the batch. */
  def driftGateBatch(baselineHist: Array[(Long, Long)], reportDir: String,
                     colName: String, lo: Double, hi: Double, buckets: Int,
                     thresholdPct: Int = 20)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val base = baselineHist.toSeq.toDF("bucket", "n")
    graft.operators.Drift.histogramDriftVs(base, batch, colName, lo, hi, buckets,
        thresholdPct)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(reportDir)
  }

  /** True when any batch in the report has a drifted bucket. */
  def anyDrift(spark: org.apache.spark.sql.SparkSession, reportDir: String): Boolean =
    spark.read.parquet(reportDir).where(col("drifted")).limit(1).count() > 0
}
