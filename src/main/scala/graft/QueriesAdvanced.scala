package graft

import org.apache.spark.sql.functions._
import graft.Queries.QueryDef
import graft.operators.AsOfJoin

/** SURVEY.md §2.3 advanced relational operators: as-of join, rollup,
  * percentiles, semi/anti joins, and the Cosmos "all documents" listing. */
object QueriesAdvanced {

  /** events⋈orders as-of shape shared by both gated variants;
    * bucketSec = 0 → single-window [[AsOfJoin.asOf]]. */
  private def asofEventsOrders(s: org.apache.spark.sql.SparkSession, d: String,
                               bucketSec: Long): org.apache.spark.sql.DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), expr("ts div 1000000000").as("sec"))
    val ord = Tables.orders(s, d)
      // o_orderdate is TIMESTAMP_NTZ; NTZ→LTZ is identity under the UTC session
      .select(col("o_custkey"),
        col("o_orderdate").cast("timestamp").cast("long").as("order_sec"), col("o_orderkey"))
      .groupBy(col("o_custkey"), col("order_sec"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    val joined =
      if (bucketSec > 0)
        AsOfJoin.asOfBucketed(ev, ord, "user_id", "o_custkey", "sec", "order_sec", bucketSec)
      else AsOfJoin.asOf(ev, ord, "user_id", "o_custkey", "sec", "order_sec")
    joined
      .select(col("event_id"), col("user_id"), col("sec"), col("o_orderkey"),
        col("order_sec"), (col("sec") - col("order_sec")).as("age_sec"))
      .orderBy(col("event_id"))
  }

  private val asofOracle =
    """WITH o AS (
      |  SELECT o_custkey, CAST(floor(epoch(o_orderdate)) AS BIGINT) AS order_sec,
      |         max(o_orderkey) AS o_orderkey
      |  FROM orders GROUP BY 1, 2),
      |e AS (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events)
      |SELECT e.event_id, e.user_id, e.sec, o.o_orderkey, o.order_sec,
      |       e.sec - o.order_sec AS age_sec
      |FROM e ASOF JOIN o ON e.user_id = o.o_custkey AND e.sec >= o.order_sec
      |ORDER BY event_id""".stripMargin

  val defs: Map[String, QueryDef] = Map(

    // As-of join: each event matched to the user's most recent order at
    // event time. Oracle = DuckDB's native ASOF JOIN. Two gated variants
    // sharing one oracle: the single-window tag-union merge (optimal when
    // keys are well-distributed — one shuffle) and the range-BUCKETED
    // fact-fact scale path, whose merge window partitions by
    // (key, time-bucket) so a hot key's history can't pin one partition;
    // skewed-corpus equality is additionally spec-asserted.
    "q_asof_join" -> QueryDef(
      (s, d) => asofEventsOrders(s, d, bucketSec = 0),
      Some(asofOracle)),

    "q_asof_bucketed" -> QueryDef(
      (s, d) => asofEventsOrders(s, d, bucketSec = 7L * 86400),
      Some(asofOracle)),

    "q_rollup" -> QueryDef(
      (s, d) => Tables.orders(s, d)
        .rollup(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).cast("long").as("n"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .select(coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          col("n"), col("total"))
        .orderBy(col("priority"), col("status")),
      Some("""SELECT coalesce(o_orderpriority, '(all)') AS priority,
             |  coalesce(o_orderstatus, '(all)') AS status,
             |  count(*) AS n, round(sum(o_totalprice), 2) AS total
             |FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
             |ORDER BY priority, status""".stripMargin)),

    "q_percentiles" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90"),
          round(expr("percentile(l_extendedprice, 0.99)"), 4).as("p99"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
             |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
             |  round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    "q_semi_anti" -> QueryDef(
      (s, d) => {
        val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
        val ord = Tables.orders(s, d).select(col("o_custkey"))
        val withOrders = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
          .groupBy(col("c_mktsegment")).agg(count(lit(1)).cast("long").as("with_orders"))
        val withoutOrders = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment")).agg(count(lit(1)).cast("long").as("without_orders"))
        withOrders.join(withoutOrders, Seq("c_mktsegment"), "full_outer")
          .select(col("c_mktsegment"),
            coalesce(col("with_orders"), lit(0L)).as("with_orders"),
            coalesce(col("without_orders"), lit(0L)).as("without_orders"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""WITH w AS (
             |  SELECT c_mktsegment, count(*) AS with_orders FROM customer
             |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |  GROUP BY 1),
             |wo AS (
             |  SELECT c_mktsegment, count(*) AS without_orders FROM customer
             |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |  GROUP BY 1)
             |SELECT coalesce(w.c_mktsegment, wo.c_mktsegment) AS c_mktsegment,
             |  coalesce(with_orders, 0) AS with_orders,
             |  coalesce(without_orders, 0) AS without_orders
             |FROM w FULL OUTER JOIN wo ON w.c_mktsegment = wo.c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin)),

    // SCD2 history build: per-user click "state" changelog → versioned
    // intervals, no-op updates collapsed. Open intervals take a sentinel
    // valid_to (Long.MaxValue) so the compare has no nullable numerics.
    "q_scd2_history" -> QueryDef(
      (s, d) => {
        val ch = Tables.events(s, d)
          .where(col("event_type") === "click")
          // parquet ts is TIMESTAMP(NANOS); DuckDB truncates to micros —
          // compare in micros on both sides
          .select(col("user_id"), col("event_id"), expr("ts div 1000").as("ts"),
            floor(col("value") / 20).cast("long").as("state"))
        graft.operators.Scd2.fromChangelog(ch, "user_id",
            Seq("ts", "event_id"), Seq("state"))
          .select(col("user_id"), col("state"), col("valid_from"),
            coalesce(col("valid_to"), lit(Long.MaxValue)).as("valid_to"),
            col("is_current").cast("long").as("is_current"))
          .orderBy(col("user_id"), col("valid_from"))
      },
      Some("""WITH ch AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS ts,
             |    CAST(floor(value / 20) AS BIGINT) AS state
             |  FROM events WHERE event_type = 'click'),
             |dedup AS (
             |  SELECT user_id, ts, state FROM (
             |    SELECT user_id, ts, state,
             |      lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
             |    FROM ch)
             |  WHERE next_ts IS NULL OR next_ts <> ts),
             |marked AS (
             |  SELECT user_id, ts, state,
             |    lag(state) OVER (PARTITION BY user_id ORDER BY ts) AS prev
             |  FROM dedup),
             |runs AS (
             |  SELECT user_id, state, ts AS valid_from FROM marked
             |  WHERE prev IS NULL OR prev <> state)
             |SELECT user_id, state, valid_from,
             |  coalesce(lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from),
             |           9223372036854775807) AS valid_to,
             |  CAST(lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) IS NULL
             |       AS BIGINT) AS is_current
             |FROM runs ORDER BY user_id, valid_from""".stripMargin)),

    // SCD2 point-in-time lookup (round 8): the asOf snapshot at the
    // changelog's midpoint — one version per user live at T, the
    // valid_from <= T < valid_to comparison a static pushable filter.
    "q_scd2_asof" -> QueryDef(
      (s, d) => {
        val ch = Tables.events(s, d)
          .where(col("event_type") === "click")
          .select(col("user_id"), col("event_id"), expr("ts div 1000").as("ts"),
            floor(col("value") / 20).cast("long").as("state"))
        val hist = graft.operators.Scd2.fromChangelog(ch, "user_id",
          Seq("ts", "event_id"), Seq("state"))
        val r = ch.agg(min(col("ts")), max(col("ts"))).head()
        val mid = (r.getLong(0) + r.getLong(1)) / 2
        graft.operators.Scd2.asOf(hist, lit(mid))
          .select(col("user_id"), col("state"), col("valid_from"))
          .orderBy(col("user_id"))
      },
      Some("""WITH ch AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS ts,
             |    CAST(floor(value / 20) AS BIGINT) AS state
             |  FROM events WHERE event_type = 'click'),
             |mid AS (SELECT (min(ts) + max(ts)) // 2 AS m FROM ch),
             |dedup AS (
             |  SELECT user_id, ts, state FROM (
             |    SELECT user_id, ts, state,
             |      lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
             |    FROM ch)
             |  WHERE next_ts IS NULL OR next_ts <> ts),
             |marked AS (
             |  SELECT user_id, ts, state,
             |    lag(state) OVER (PARTITION BY user_id ORDER BY ts) AS prev
             |  FROM dedup),
             |runs AS (
             |  SELECT user_id, state, ts AS valid_from FROM marked
             |  WHERE prev IS NULL OR prev <> state),
             |versions AS (
             |  SELECT user_id, state, valid_from,
             |    lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) AS valid_to
             |  FROM runs)
             |SELECT user_id, state, valid_from
             |FROM versions CROSS JOIN mid
             |WHERE valid_from <= m AND (valid_to IS NULL OR valid_to > m)
             |ORDER BY user_id""".stripMargin)),

    // Incremental SCD2 MERGE: build history on the first half of the
    // changelog (global time split), fold the second half in with
    // applyChanges — the daily-batch maintenance path. Under a time-split
    // boundary the fold provably equals the full rebuild, so it shares
    // the full-history oracle: the gate proves incremental == replay.
    "q_scd2_apply" -> QueryDef(
      (s, d) => {
        val ch = Tables.events(s, d)
          .where(col("event_type") === "click")
          .select(col("user_id"), col("event_id"), expr("ts div 1000").as("ts"),
            floor(col("value") / 20).cast("long").as("state"))
        val r = ch.agg(min(col("ts")), max(col("ts"))).head()
        val cutoff = (r.getLong(0) + r.getLong(1)) / 2
        val h1 = graft.operators.Scd2.fromChangelog(
          ch.where(col("ts") < cutoff), "user_id", Seq("ts", "event_id"), Seq("state"))
        graft.operators.Scd2.applyChanges(h1, ch.where(col("ts") >= cutoff),
            "user_id", Seq("ts", "event_id"), Seq("state"))
          .select(col("user_id"), col("state"), col("valid_from"),
            coalesce(col("valid_to"), lit(Long.MaxValue)).as("valid_to"),
            col("is_current").cast("long").as("is_current"))
          .orderBy(col("user_id"), col("valid_from"))
      },
      Some("""WITH ch AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS ts,
             |    CAST(floor(value / 20) AS BIGINT) AS state
             |  FROM events WHERE event_type = 'click'),
             |dedup AS (
             |  SELECT user_id, ts, state FROM (
             |    SELECT user_id, ts, state,
             |      lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
             |    FROM ch)
             |  WHERE next_ts IS NULL OR next_ts <> ts),
             |marked AS (
             |  SELECT user_id, ts, state,
             |    lag(state) OVER (PARTITION BY user_id ORDER BY ts) AS prev
             |  FROM dedup),
             |runs AS (
             |  SELECT user_id, state, ts AS valid_from FROM marked
             |  WHERE prev IS NULL OR prev <> state)
             |SELECT user_id, state, valid_from,
             |  coalesce(lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from),
             |           9223372036854775807) AS valid_to,
             |  CAST(lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) IS NULL
             |       AS BIGINT) AS is_current
             |FROM runs ORDER BY user_id, valid_from""".stripMargin)),

    // Hot-key-safe SCD2: same history, built with (key, time-bucket)
    // windows + bounded carries (Scd2.fromChangelogBucketed). Output is
    // row-identical to q_scd2_history, so it shares that oracle — the
    // gate proves bucketing is invisible (convention: q_bm25_index).
    // Day-sized buckets split each user's changelog across tasks.
    "q_scd2_bucketed" -> QueryDef(
      (s, d) => {
        val ch = Tables.events(s, d)
          .where(col("event_type") === "click")
          .select(col("user_id"), col("event_id"), expr("ts div 1000").as("ts"),
            floor(col("value") / 20).cast("long").as("state"))
        graft.operators.Scd2.fromChangelogBucketed(ch, "user_id",
            Seq("ts", "event_id"), Seq("state"), bucketSize = 86400000000L)
          .select(col("user_id"), col("state"), col("valid_from"),
            coalesce(col("valid_to"), lit(Long.MaxValue)).as("valid_to"),
            col("is_current").cast("long").as("is_current"))
          .orderBy(col("user_id"), col("valid_from"))
      },
      Some("""WITH ch AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS ts,
             |    CAST(floor(value / 20) AS BIGINT) AS state
             |  FROM events WHERE event_type = 'click'),
             |dedup AS (
             |  SELECT user_id, ts, state FROM (
             |    SELECT user_id, ts, state,
             |      lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
             |    FROM ch)
             |  WHERE next_ts IS NULL OR next_ts <> ts),
             |marked AS (
             |  SELECT user_id, ts, state,
             |    lag(state) OVER (PARTITION BY user_id ORDER BY ts) AS prev
             |  FROM dedup),
             |runs AS (
             |  SELECT user_id, state, ts AS valid_from FROM marked
             |  WHERE prev IS NULL OR prev <> state)
             |SELECT user_id, state, valid_from,
             |  coalesce(lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from),
             |           9223372036854775807) AS valid_to,
             |  CAST(lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) IS NULL
             |       AS BIGINT) AS is_current
             |FROM runs ORDER BY user_id, valid_from""".stripMargin))
  )
}
