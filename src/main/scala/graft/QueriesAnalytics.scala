package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Queries.QueryDef

/** SURVEY.md §2.3 — the engine stays a full analytic query engine.
  * Scale notes: dimension sides of every join are `broadcast()`;
  * aggregations rely on map-side partial agg; windows partition on
  * high-cardinality keys (user_id, priority) so no single partition
  * dominates; every scan projects only needed columns (parquet pruning).
  */
object QueriesAnalytics {

  val defs: Map[String, QueryDef] = Map(

    "q3_top_orders" -> QueryDef(
      (s, d) => {
        val cust = Tables.customer(s, d).where(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        val ord = Tables.orders(s, d)
          .where(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
        val li = Tables.lineitem(s, d)
          .where(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
          .select(col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"), col("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      Some("""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1998-01-01'
             |  AND l_shipdate > TIMESTAMP '1998-01-01'
             |GROUP BY o_orderkey, o_orderdate
             |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)),

    // TPC-H Q6 shape: highly selective scan-level filters (pushdown demo)
    "q6_selective" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
          && col("l_discount") >= 0.05 && col("l_discount") <= 0.07
          && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
          count(lit(1)).cast("long").as("n"))
        .select(col("revenue"), col("n")),
      Some("""SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue, count(*) AS n
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
             |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin)),

    "q5_region_revenue" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
        val nat = Tables.nation(s, d).select(col("n_nationkey"), col("n_regionkey"))
        val reg = Tables.region(s, d).select(col("r_regionkey"), col("r_name"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
            countDistinct(col("o_orderkey")).cast("long").as("n_orders"))
          .orderBy(col("r_name"))
      },
      Some("""SELECT r_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             |  count(DISTINCT o_orderkey) AS n_orders
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    // TPC-H Q13 shape: customer order-count distribution (outer join + histogram)
    "q13_cust_dist" -> QueryDef(
      (s, d) => {
        val cust = Tables.customer(s, d).select(col("c_custkey"))
        val ord = Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"))
        cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy(col("c_custkey")).agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count")).agg(count(lit(1)).cast("long").as("custdist"))
          .select(col("c_count").cast("long").as("c_count"), col("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""SELECT CAST(c_count AS BIGINT) AS c_count, count(*) AS custdist
             |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
             |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |      GROUP BY c_custkey)
             |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // TPC-H Q17 shape: per-group average comparison (decorrelated as a window)
    "q17_small_qty" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy(col("l_partkey"))
        Tables.lineitem(s, d)
          .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
          // threshold rounded so the filter boundary is not sensitive to
          // engine-specific double summation order in avg()
          .withColumn("avg_qty", avg(col("l_quantity")).over(w))
          .where(col("l_quantity") < round(lit(0.2) * col("avg_qty"), 6))
          .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"),
            count(lit(1)).cast("long").as("n"))
          .select(col("avg_yearly"), col("n"))
      },
      Some("""SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly, count(*) AS n
             |FROM (SELECT l_extendedprice, l_quantity,
             |        avg(l_quantity) OVER (PARTITION BY l_partkey) AS avg_qty
             |      FROM lineitem)
             |WHERE l_quantity < round(0.2 * avg_qty, 6)""".stripMargin)),

    "q_window_topn" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, d)
          .select(col("o_orderpriority"), col("o_orderkey"),
            round(col("o_totalprice"), 2).as("o_totalprice"),
            row_number().over(w).cast("long").as("rn"))
          .where(col("rn") <= 3)
          .orderBy(col("o_orderpriority"), col("rn"))
      },
      Some("""SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
             |  CAST(rn AS BIGINT) AS rn
             |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
             |        row_number() OVER (PARTITION BY o_orderpriority
             |                           ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |      FROM orders)
             |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin)),

    "q_events_sessionize" -> QueryDef(
      (s, d) => {
        // ts arrives as long nanos (nanosAsLong); integer div keeps exactness
        val sec = expr("ts div 1000000000")
        val ord = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
        val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("value"), sec.as("sec"))
          .withColumn("prev", lag(col("sec"), 1).over(ord))
          .withColumn("new_s",
            when(col("prev").isNull || col("sec") - col("prev") > 1800, 1L).otherwise(0L))
          .withColumn("session_id", sum(col("new_s")).over(cum))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).cast("long").as("n_events"),
            min(col("sec")).as("start_sec"), max(col("sec")).as("end_sec"),
            round(sum(col("value")), 4).as("sum_value"))
          .orderBy(col("user_id"), col("session_id"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, value,
             |    CAST(floor(epoch(ts)) AS BIGINT) AS sec
             |  FROM events),
             |l AS (SELECT *, lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS prev FROM e),
             |f AS (SELECT *, CASE WHEN prev IS NULL OR sec - prev > 1800 THEN 1 ELSE 0 END AS new_s FROM l),
             |g AS (SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY sec, event_id
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM f)
             |SELECT user_id, session_id, count(*) AS n_events,
             |  min(sec) AS start_sec, max(sec) AS end_sec, round(sum(value), 4) AS sum_value
             |FROM g GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin)),

    // part/supplier dimensions: revenue by brand and supplier nation
    "q_brand_supplier" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
        val part = Tables.part(s, d).select(col("p_partkey"), col("p_brand"))
        val supp = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
        val nat = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
        li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("p_brand"), col("n_name"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
            count(lit(1)).cast("long").as("n_items"))
          .orderBy(col("p_brand"), col("n_name"))
      },
      Some("""SELECT p_brand, n_name,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             |  count(*) AS n_items
             |FROM lineitem
             |JOIN part ON l_partkey = p_partkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |GROUP BY p_brand, n_name ORDER BY p_brand, n_name""".stripMargin)),

    // semi-structured JSON column extraction (events.props)
    "q_json_extract" -> QueryDef(
      (s, d) => Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).cast("long").as("n"), round(avg(col("k")), 4).as("avg_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, count(*) AS n,
             |  round(avg(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
             |  min(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
             |  max(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // set operations (INTERSECT / EXCEPT) over derived keysets
    "q_set_ops" -> QueryDef(
      (s, d) => {
        val ord = Tables.orders(s, d).select(col("o_custkey"), year(col("o_orderdate")).as("y"))
        val a = ord.where(col("y") === 1995).select(col("o_custkey")).distinct()
        val b = ord.where(col("y") === 1996).select(col("o_custkey")).distinct()
        a.agg(count(lit(1)).cast("long").as("n95"))
          .crossJoin(b.agg(count(lit(1)).cast("long").as("n96")))
          .crossJoin(a.intersect(b).agg(count(lit(1)).cast("long").as("n_both")))
          .crossJoin(a.except(b).agg(count(lit(1)).cast("long").as("n_only95")))
      },
      Some("""WITH a AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
             |b AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
             |SELECT (SELECT count(*) FROM a) AS n95,
             |       (SELECT count(*) FROM b) AS n96,
             |       (SELECT count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)) AS n_both,
             |       (SELECT count(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b)) AS n_only95""".stripMargin)),

    // pivot shape: per-user event-type counts as columns (portable
    // CASE-sum formulation, identical in the oracle)
    "q_pivot" -> QueryDef(
      (s, d) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        def countOf(t: String) =
          sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t")
        Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(countOf(types.head), types.tail.map(countOf): _*)
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id,
             |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
             |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
             |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
             |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
             |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    "q_events_hourly" -> QueryDef(
      (s, d) => Tables.events(s, d)
        .select(expr("(ts div 1000000000) div 3600 * 3600").as("hour_sec"),
          col("event_type"), col("value"))
        .groupBy(col("hour_sec"), col("event_type"))
        .agg(count(lit(1)).cast("long").as("n"), round(sum(col("value")), 4).as("sum_value"))
        .orderBy(col("hour_sec"), col("event_type")),
      Some("""SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_sec,
             |  event_type, count(*) AS n, round(sum(value), 4) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY hour_sec, event_type""".stripMargin))
  )
}
