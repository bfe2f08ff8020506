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

    // TPC-H Q7 shape: cross-nation trade volume, both directions of one
    // nation pair, by ship year — the two-role nation join (supplier's
    // nation and customer's nation are separate dimension lookups).
    "q7_nation_volume" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
            && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("l_orderkey"), col("l_suppkey"),
            year(col("l_shipdate")).cast("long").as("l_year"),
            (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("volume"))
        val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        val n1 = Tables.nation(s, d).select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        val n2 = Tables.nation(s, d).select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .join(/* customer is SF-proportional: no forced broadcast, AQE decides */
            Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
          .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
          .where((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2")
            || (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
          .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
          .agg(round(sum(col("volume")), 2).as("revenue"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      },
      Some("""SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
             |FROM (
             |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
             |    l_extendedprice * (1 - l_discount) AS volume
             |  FROM lineitem
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
             |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
             |    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')))
             |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // TPC-H Q8 shape: one nation's market share inside a consuming
    // region for one product type, by order year (CASE-ratio over a
    // 6-way star join).
    "q8_market_share" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
            (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("volume"))
        val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        li.join(broadcast(Tables.part(s, d).where(col("p_type") === "ECONOMY")
            .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(/* customer is SF-proportional: no forced broadcast, AQE decides */
            Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d).select(col("n_nationkey").as("c_nk"),
            col("n_regionkey"))), col("c_nationkey") === col("c_nk"))
          .join(broadcast(Tables.region(s, d).where(col("r_name") === "ASIA")
            .select(col("r_regionkey"))), col("n_regionkey") === col("r_regionkey"))
          .join(broadcast(Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, d).select(col("n_nationkey").as("s_nk"),
            col("n_name").as("supp_nation"))), col("s_nationkey") === col("s_nk"))
          .groupBy(col("o_year"))
          .agg(round(
            sum(when(col("supp_nation") === "NATION_3", col("volume")).otherwise(lit(0.0)))
              / sum(col("volume")), 4).as("mkt_share"))
          .orderBy(col("o_year"))
      },
      Some("""SELECT o_year,
             |  round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
             |        / sum(volume), 4) AS mkt_share
             |FROM (
             |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             |    l_extendedprice * (1 - l_discount) AS volume, n2.n_name AS supp_nation
             |  FROM lineitem
             |  JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
             |  JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation n2 ON s_nationkey = n2.n_nationkey)
             |GROUP BY o_year ORDER BY o_year""".stripMargin)),

    // TPC-H Q9 shape (sans partsupp — the synthetic schema has no
    // supplycost): per supplier-nation per order-year profit over a
    // p_name substring filter.
    "q9_profit" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
            (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("amount"))
        li.join(broadcast(Tables.part(s, d).where(col("p_name").contains("red"))
            .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
          .join(Tables.orders(s, d).select(col("o_orderkey"),
            year(col("o_orderdate")).cast("long").as("o_year")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), col("o_year"))
          .agg(round(sum(col("amount")), 2).as("sum_profit"))
          .orderBy(col("n_name"), col("o_year").desc)
      },
      Some("""SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_profit
             |FROM lineitem
             |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |GROUP BY 1, 2 ORDER BY n_name, o_year DESC""".stripMargin)),

    // TPC-H Q10 shape: top-20 customers by returned-item revenue in one
    // quarter (join + group + TakeOrdered).
    "q10_returned" -> QueryDef(
      (s, d) => {
        val ord = Tables.orders(s, d)
          .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
            && col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"))
        val li = Tables.lineitem(s, d).where(col("l_returnflag") === "R")
          .select(col("l_orderkey"),
            (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("volume"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(/* SF-proportional: AQE decides */ Tables.customer(s, d)
            .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), round(col("c_acctbal"), 2).as("c_acctbal"),
            col("n_name"))
          // round-then-decimal per row: the sum (and the rank order it
          // feeds) is order-independent exact, where a double sum rounds
          // across a cent boundary differently per engine
          .agg(sum(round(col("volume").cast("double"), 4).cast("decimal(18,4)")).as("__rev"))
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"),
            round(col("__rev"), 2).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some("""SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal, n_name,
             |  CAST(round(sum(CAST(round(CAST(l_extendedprice * (1 - l_discount) AS DOUBLE), 4)
             |    AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE l_returnflag = 'R'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
             |GROUP BY 1, 2, 3, 4
             |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),

    // TPC-H Q12 shape (sans shipmode — synthetic schema): late-shipment
    // CASE aggregation — orders shipped >60 days after order date,
    // split by priority class.
    "q12_late_shipments" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
        val ord = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select(
            when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
              lit("late")).otherwise(lit("ontime")).as("ship_class"),
            col("o_orderpriority"))
          .groupBy(col("ship_class"))
          .agg(
            sum(when(col("o_orderpriority") === "1-URGENT"
              || col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L)).as("high_line_count"),
            sum(when(col("o_orderpriority") =!= "1-URGENT"
              && col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L)).as("low_line_count"))
          .orderBy(col("ship_class"))
      },
      Some("""SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
             |         THEN 'late' ELSE 'ontime' END AS ship_class,
             |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY 1 ORDER BY ship_class""".stripMargin)),

    // TPC-H Q14 shape: promo revenue ratio for one ship month
    // (conditional ratio over a part join).
    "q14_promo" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .where(col("l_shipdate") >= lit("1996-03-01").cast("timestamp")
          && col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg(round(
          sum(when(col("p_type") === "PROMO",
            col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(lit(0.0)))
            * lit(100.0)
            / sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("promo_revenue"))
        .select(col("promo_revenue")),
      Some("""SELECT round(
             |  100.0 * sum(CASE WHEN p_type = 'PROMO'
             |                   THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             |  / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin)),

    // TPC-H Q15 shape: top supplier(s) by quarter revenue — the
    // max-of-aggregate pattern. Per-row amounts are rounded THEN cast to
    // DECIMAL so the per-supplier sums (and the max, and the equality
    // against it) are order-independent exact on both engines; the
    // reported revenue is the usual rounded DOUBLE.
    "q15_top_supplier" -> QueryDef(
      (s, d) => {
        val rev = Tables.lineitem(s, d)
          .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
            && col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
          .groupBy(col("l_suppkey"))
          .agg(sum(round((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("double"), 4)
            .cast("decimal(18,4)")).as("total_rev"))
        val top = rev.agg(max(col("total_rev")).as("max_rev"))
        rev.crossJoin(broadcast(top))
          .where(col("total_rev") === col("max_rev"))
          .join(broadcast(Tables.supplier(s, d).select(col("s_suppkey"), col("s_name"))),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            round(col("total_rev").cast("double"), 2).as("total_revenue"))
          .orderBy(col("s_suppkey"))
      },
      Some("""WITH rev AS (
             |  SELECT l_suppkey,
             |    sum(CAST(round(CAST(l_extendedprice * (1 - l_discount) AS DOUBLE), 4)
             |        AS DECIMAL(18,4))) AS total_rev
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
             |  GROUP BY l_suppkey)
             |SELECT s_suppkey, s_name, round(CAST(total_rev AS DOUBLE), 2) AS total_revenue
             |FROM rev JOIN supplier ON l_suppkey = s_suppkey
             |WHERE total_rev = (SELECT max(total_rev) FROM rev)
             |ORDER BY s_suppkey""".stripMargin)),

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
             |FROM events GROUP BY 1, 2 ORDER BY hour_sec, event_type""".stripMargin)),

    // HOPPING (sliding) windows in batch: 1h windows every 30min — each
    // event lands in exactly 2 overlapping windows via a row-local
    // 2-element sequence explode (windowLen/slide instances; Spark's
    // streaming `window()` does the same expansion). Counts in
    // overlapping windows double-count by design. DECIMAL sums keep the
    // per-window aggregate engine-exact.
    "q_events_hopping" -> QueryDef(
      (s, d) => Tables.events(s, d)
        .select(expr("ts div 1000000000").as("sec"),
          col("value").cast("decimal(18,6)").as("v"))
        .select(explode(expr(
          "sequence((sec div 1800) * 1800 - 1800, (sec div 1800) * 1800, 1800)"))
          .as("win_start"), col("v"))
        .where(col("win_start") >= 0)
        .groupBy(col("win_start"))
        .agg(count(lit(1)).cast("long").as("n"),
          round(sum(col("v")), 4).cast("double").as("sum_value"))
        .orderBy(col("win_start")),
      Some("""WITH e AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             |                  CAST(value AS DECIMAL(18,6)) AS v FROM events),
             |w AS (SELECT unnest([ (sec // 1800) * 1800 - 1800,
             |                      (sec // 1800) * 1800 ]) AS win_start, v FROM e)
             |SELECT win_start, count(*) AS n,
             |  CAST(round(sum(v), 4) AS DOUBLE) AS sum_value
             |FROM w WHERE win_start >= 0
             |GROUP BY 1 ORDER BY win_start""".stripMargin)),

    // TPC-H Q4 shape: correlated EXISTS with a non-equi condition — planned
    // as a left-semi join (equi key + join-time filter), so the fact side
    // shuffles once and lineitem never materializes per-order groups.
    "q4_order_priority" -> QueryDef(
      (s, d) => {
        val ord = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
        ord.join(li,
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
            "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).cast("long").as("order_count"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders
             |WHERE EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey
             |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // TPC-H Q22 shape: scalar subquery (global average) + NOT EXISTS.
    // The 1-row aggregate broadcasts (no shuffle on the probe side); the
    // NOT EXISTS is a left-anti join on the order keys. The
    // above-average test is the division-free bal·cnt > sum form over
    // DECIMAL(18,2) — decimal sums are order-independent exact, so the
    // threshold cannot land on a float rounding boundary that differs
    // between Spark's partial-agg summation order and DuckDB's.
    "q22_idle_customers" -> QueryDef(
      (s, d) => {
        val cust = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
        val balStats = cust.where(col("c_acctbal") > 0)
          .agg(sum(col("c_acctbal").cast("decimal(18,2)")).as("sum_bal"),
            count(lit(1)).as("cnt_bal"))
        val ord = Tables.orders(s, d)
          .where(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
        cust.crossJoin(broadcast(balStats))
          .where(col("c_acctbal").cast("decimal(18,2)") * col("cnt_bal") > col("sum_bal"))
          .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).cast("long").as("numcust"),
            round(sum(col("c_acctbal")), 2).as("totacctbal"))
          .select(col("c_nationkey").cast("long").as("c_nationkey"),
            col("numcust"), col("totacctbal"))
          .orderBy(col("c_nationkey"))
      },
      Some("""SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, count(*) AS numcust,
             |  round(sum(c_acctbal), 2) AS totacctbal
             |FROM customer
             |WHERE CAST(c_acctbal AS DECIMAL(18,2))
             |      * (SELECT count(*) FROM customer WHERE c_acctbal > 0)
             |    > (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer WHERE c_acctbal > 0)
             |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
             |                  AND o_orderpriority = '1-URGENT')
             |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    // TPC-H Q21 shape: suppliers who were the ONLY delayed supplier on a
    // multi-supplier order (delayed = shipped >90 days after the order
    // date; the trimmed schema has no commit/receipt dates). The two
    // correlated EXISTS/NOT-EXISTS decorrelate into ONE per-order
    // aggregation (nsupp / ndelayed counts) joined back to the delayed
    // rows — single shuffle on orderkey, then a broadcast-dim group-by.
    "q21_waiting_suppliers" -> QueryDef(
      (s, d) => {
        // Aggregate lineitem to (orderkey, suppkey, max shipdate) BEFORE
        // the orders join (guide §2.3): max(l_shipdate) > threshold ⟺
        // any line is delayed, countDistinct(suppkey) = group count —
        // the fact table crosses the join exactly once (the old shape
        // computed the lineitem⋈orders join twice: per-order aggregate +
        // delayed-row listing) and map-side partial aggregation shrinks
        // it first. The per-order counts come from a window over the
        // join output, which is already partitioned by orderkey — no
        // extra exchange.
        // NO broadcast hint: orders is FACT-sized (a hint would override
        // the size threshold and OOM at scale; AQE picks the hash join)
        val perPair = Tables.lineitem(s, d)
          .groupBy(col("l_orderkey"), col("l_suppkey"))
          .agg(max(col("l_shipdate")).as("__max_ship"))
        val paired = perPair
          .join(Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          // INTERVAL, not date_add: date_add casts to DATE, flooring the
          // threshold to midnight — a timestamped orderdate would flip
          // delayed classification vs the oracle's + INTERVAL 90 DAY
          .withColumn("__delayed",
            col("__max_ship") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_orderkey"))
        val waiting = paired
          .withColumn("nsupp", count(lit(1)).over(w))
          .withColumn("ndelayed", count(when(col("__delayed"), lit(1))).over(w))
          .where(col("__delayed") && col("nsupp") > 1 && col("ndelayed") === 1)
          .select(col("l_suppkey"), col("l_orderkey"))
        waiting
          .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(20)
      },
      Some("""WITH li AS (
             |  SELECT l_orderkey, l_suppkey,
             |    l_shipdate > o_orderdate + INTERVAL 90 DAY AS delayed
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |per_order AS (
             |  SELECT l_orderkey,
             |    count(DISTINCT l_suppkey) AS nsupp,
             |    count(DISTINCT CASE WHEN delayed THEN l_suppkey END) AS ndelayed
             |  FROM li GROUP BY 1),
             |waiting AS (
             |  SELECT DISTINCT li.l_suppkey, li.l_orderkey
             |  FROM li JOIN per_order USING (l_orderkey)
             |  WHERE li.delayed AND nsupp > 1 AND ndelayed = 1)
             |SELECT s_name, count(*) AS numwait
             |FROM waiting JOIN supplier ON l_suppkey = s_suppkey
             |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin)),

    // Time-RANGE window frame: per-user rolling 1-hour event-value sum —
    // rangeBetween on the event-time axis (not row counts), the moving-
    // aggregate shape row-frame windows can't express. Sums in
    // DECIMAL(18,6): range-frame sums are engine-exact only when the
    // addition is order-independent.
    "q_rolling_window" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, d)
          .where(col("user_id") % 50 === 0)
          .select(col("event_id"), col("user_id"), expr("ts div 1000").as("tsu"),
            col("value").cast("decimal(18,6)").as("v"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("tsu"))
          .rangeBetween(-3600000000L, 0)
        ev.withColumn("rolling_1h",
            round(sum(col("v")).over(w), 4).cast("double"))
          .select(col("event_id"), col("user_id"), col("tsu"), col("rolling_1h"))
          .orderBy(col("user_id"), col("tsu"), col("event_id"))
      },
      Some("""SELECT event_id, user_id, epoch_us(ts) AS tsu,
             |  CAST(round(sum(CAST(value AS DECIMAL(18,6))) OVER (
             |    PARTITION BY user_id ORDER BY epoch_us(ts)
             |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             |  , 4) AS DOUBLE) AS rolling_1h
             |FROM events WHERE user_id % 50 = 0
             |ORDER BY user_id, tsu, event_id""".stripMargin)),

    // TPC-H Q18 shape: large-volume orders via a HAVING-subquery
    // (sum(l_quantity) > 250 per order) — decorrelates to one lineitem
    // aggregation reused as both the filter and the reported sum.
    "q18_large_orders" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val big = li.groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity")).cast("long").as("total_qty"))
          .where(col("total_qty") > 250)
        big.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(/* SF-proportional: AQE decides */ Tables.customer(s, d),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate").cast("string").as("o_orderdate"),
            round(col("o_totalprice"), 2).as("o_totalprice"), col("total_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
      },
      Some("""SELECT c_name, c_custkey, o_orderkey,
             |  CAST(o_orderdate AS VARCHAR) AS o_orderdate,
             |  round(o_totalprice, 2) AS o_totalprice, total_qty
             |FROM (SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
             |      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 250) big
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),

    // TPC-H Q19 shape: disjunctive OR-of-ANDs predicate across the
    // part dim and the fact row (brand × size-range × quantity-range).
    // The p_brand IN superset conjunct is pushable to both scans even
    // though the full disjunction is join-dependent — the plan keeps the
    // join a broadcast hash join with the residual OR as its condition.
    "q19_disjunctive" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val p = broadcast(Tables.part(s, d)
          .where(col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")))
        li.join(p, col("l_partkey") === col("p_partkey"))
          .where(
            (col("p_brand") === "Brand#12" && col("p_size").between(1, 5)
              && col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#23" && col("p_size").between(1, 10)
              && col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#34" && col("p_size").between(1, 15)
              && col("l_quantity").between(20, 30)))
          .agg(coalesce(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2),
            lit(0.0)).as("revenue"),
            count(lit(1)).as("n_rows"))
      },
      Some("""SELECT coalesce(round(sum(l_extendedprice * (1 - l_discount)), 2), 0.0) AS revenue,
             |  count(*) AS n_rows
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
             |       AND l_quantity BETWEEN 1 AND 11)
             |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
             |       AND l_quantity BETWEEN 10 AND 20)
             |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
             |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin)),

    // CUBE grouping sets: all 4 subtotal combinations in one pass
    // (Spark expands grouping sets before the single aggregation shuffle).
    "q_cube" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).cast("long").as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("(all)")).as("rflag"),
          coalesce(col("l_linestatus"), lit("(all)")).as("lstatus"),
          col("n"), col("sum_qty"))
        .orderBy(col("rflag"), col("lstatus")),
      Some("""SELECT coalesce(l_returnflag, '(all)') AS rflag,
             |  coalesce(l_linestatus, '(all)') AS lstatus,
             |  count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
             |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
             |ORDER BY rflag, lstatus""".stripMargin)),

    // Time-series gap filling: a dense hourly spine from the observed
    // min/max (bounded: one 2-value row, sequence() generated driver-free)
    // left-joined to the sparse hourly aggregate, missing hours as zeros.
    // At 100 TB the spine stays tiny (hours, not rows) and broadcasts.
    "q_gapfill" -> QueryDef(
      (s, d) => {
        val purchases = Tables.events(s, d)
          .where(col("event_type") === "purchase")
          .select(expr("(ts div 1000000000) div 3600 * 3600").as("hour_sec"), col("value"))
        val hourly = purchases.groupBy(col("hour_sec"))
          .agg(count(lit(1)).cast("long").as("n"), round(sum(col("value")), 4).as("sum_value"))
        val bounds = purchases.agg(min(col("hour_sec")).as("mn"), max(col("hour_sec")).as("mx"))
        val spine = bounds
          .select(explode(sequence(col("mn"), col("mx"), lit(3600L))).as("hour_sec"))
        spine.join(hourly, Seq("hour_sec"), "left_outer")
          .select(col("hour_sec"), coalesce(col("n"), lit(0L)).as("n"),
            coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
          .orderBy(col("hour_sec"))
      },
      Some("""WITH p AS (
             |  SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_sec, value
             |  FROM events WHERE event_type = 'purchase'),
             |hourly AS (
             |  SELECT hour_sec, count(*) AS n, round(sum(value), 4) AS sum_value
             |  FROM p GROUP BY hour_sec),
             |spine AS (
             |  SELECT unnest(generate_series((SELECT min(hour_sec) FROM p),
             |                                (SELECT max(hour_sec) FROM p), 3600)) AS hour_sec)
             |SELECT spine.hour_sec, coalesce(n, 0) AS n, coalesce(sum_value, 0.0) AS sum_value
             |FROM spine LEFT JOIN hourly ON spine.hour_sec = hourly.hour_sec
             |ORDER BY spine.hour_sec""".stripMargin)),

    // Ordered funnel (view -> click -> purchase): each stage's entry time
    // is the earliest event of that type AFTER the previous stage's entry.
    // Both window layers share the user_id partitioning, so the whole
    // funnel costs ONE shuffle of events regardless of stage count.
    "q_funnel" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
        val staged = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("ts"))
          .withColumn("t_view", min(when(col("event_type") === "view", col("ts"))).over(w))
          .withColumn("t_click",
            min(when(col("event_type") === "click" && col("ts") > col("t_view"), col("ts"))).over(w))
          .withColumn("t_purchase",
            min(when(col("event_type") === "purchase" && col("ts") > col("t_click"), col("ts"))).over(w))
        staged.groupBy(col("user_id"))
          .agg(max(col("t_view")).as("t_view"), max(col("t_click")).as("t_click"),
            max(col("t_purchase")).as("t_purchase"))
          .agg(count(col("t_view")).cast("long").as("n_view"),
            count(col("t_click")).cast("long").as("n_click"),
            count(col("t_purchase")).cast("long").as("n_purchase"))
          .select(col("n_view"), col("n_click"), col("n_purchase"))
      },
      Some("""WITH staged AS (
             |  SELECT user_id,
             |    min(CASE WHEN event_type = 'view' THEN ts END)
             |      OVER (PARTITION BY user_id) AS t_view,
             |    ts, event_type
             |  FROM events),
             |staged2 AS (
             |  SELECT user_id, t_view,
             |    min(CASE WHEN event_type = 'click' AND ts > t_view THEN ts END)
             |      OVER (PARTITION BY user_id) AS t_click,
             |    ts, event_type
             |  FROM staged),
             |staged3 AS (
             |  SELECT user_id, t_view, t_click,
             |    min(CASE WHEN event_type = 'purchase' AND ts > t_click THEN ts END)
             |      OVER (PARTITION BY user_id) AS t_purchase
             |  FROM staged2),
             |per_user AS (
             |  SELECT user_id, max(t_view) AS t_view, max(t_click) AS t_click,
             |    max(t_purchase) AS t_purchase
             |  FROM staged3 GROUP BY user_id)
             |SELECT count(t_view) AS n_view, count(t_click) AS n_click,
             |  count(t_purchase) AS n_purchase
             |FROM per_user""".stripMargin)),

    // Cohort retention matrix: users grouped by first-activity day,
    // counted per day-offset of later activity — the classic retention
    // triangle. Integer day arithmetic (ts is epoch-nanos via
    // Tables.events), so the gate is hash-exact. Two user-keyed
    // aggregations share one shuffle key; the cohort frame joins back on
    // user_id co-partitioned (at 100 TB the first-seen side is
    // user-dimension-sized, not event-sized).
    "q_cohort_retention" -> QueryDef(
      (s, d) => {
        val days = Tables.events(s, d)
          .select(col("user_id"), expr("ts div 1000000000 div 86400").as("day"))
        val activity = days.distinct()
        val cohort = days.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
        activity.join(cohort, Seq("user_id"))
          .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
          .agg(count(lit(1)).cast("long").as("n_users"))
          .orderBy(col("cohort_day"), col("day_offset"))
      },
      Some("""WITH days AS (
             |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day FROM events),
             |activity AS (SELECT DISTINCT user_id, day FROM days),
             |cohort AS (SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id)
             |SELECT c.cohort_day, a.day - c.cohort_day AS day_offset,
             |  count(*)::BIGINT AS n_users
             |FROM activity a JOIN cohort c ON a.user_id = c.user_id
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))
  )
}
