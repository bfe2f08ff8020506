package graft

import org.apache.spark.sql.functions._
import graft.Queries.QueryDef

/** The TPC-H partsupp quartet (round 10, VERDICT r9 #4): Q2 / Q11 /
  * Q16 / Q20 — the four classic analytics shapes that were blocked on
  * the driver's missing partsupp table, now running against
  * [[Tables.partsupp]]'s deterministic synthesis (the DuckDB oracle
  * re-derives the identical table as a CTE from the same integer
  * congruences — both engines agg in exact integer space wherever a
  * float mass is summed).
  *
  * Columns adapted to the driver's slimmer dims (no p_mfgr/s_comment/
  * s_address): Q16's "complaint suppliers" analog is `s_acctbal < 0`,
  * Q2's region predicate uses the real r_name values. */
object QueriesPartsupp {

  /** Shared oracle prefix: the synthesized partsupp, formula-identical
    * to [[Tables.partsupp]] (`//` in DuckDB == Spark `div`, both
    * truncating; non-negative operands make `%` identical too). */
  private val psCte: String =
    """WITH sc AS (SELECT count(*)::BIGINT AS s_cnt FROM supplier),
      |partsupp AS (
      |  SELECT p_partkey AS ps_partkey,
      |    (p_partkey + i * (s_cnt // 4 + 1)) % s_cnt AS ps_suppkey,
      |    (p_partkey * 11 + i * 131) % 9999 + 1 AS ps_availqty,
      |    (p_partkey * 37 + i * 991) % 90000 + 10000 AS ps_supplycost_cents,
      |    ((p_partkey * 37 + i * 991) % 90000 + 10000) / 100.0 AS ps_supplycost
      |  FROM part CROSS JOIN sc CROSS JOIN unnest([0, 1, 2, 3]) AS t(i))""".stripMargin

  val defs: Map[String, QueryDef] = Map(

    // TPC-H Q2 — minimum-cost supplier: correlated min-subquery over a
    // 5-way dim join, re-expressed as groupBy-min + equality join on the
    // EXACT integer cents (float-equality joins are a cross-engine
    // hazard). Scale shape: partsupp is the only big side; every dim
    // (supplier/nation/region/filtered part) broadcasts, the min is one
    // shuffle on ps_partkey, and the min-row join reuses that partition.
    "q2_min_cost_supp" -> QueryDef(
      (s, d) => {
        val ps = Tables.partsupp(s, d)
        val supp = Tables.supplier(s, d)
        val euNations = Tables.nation(s, d)
          .join(broadcast(Tables.region(s, d).where(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))
        val elig = ps
          .join(broadcast(supp.join(broadcast(euNations),
              col("s_nationkey") === col("n_nationkey"))
            .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))),
            col("ps_suppkey") === col("s_suppkey"))
        // self-lineage join: rename the grouped key so the min frame's
        // columns can't be mistaken for the candidate side's
        val minCost = elig.groupBy(col("ps_partkey").as("mc_partkey"))
          .agg(min(col("ps_supplycost_cents")).as("min_cents"))
        elig.join(minCost, col("ps_partkey") === col("mc_partkey") &&
            col("ps_supplycost_cents") === col("min_cents"))
          .join(broadcast(Tables.part(s, d)
              .where(col("p_size") <= 10 && col("p_type") === "STANDARD")
              .select(col("p_partkey"))),
            col("ps_partkey") === col("p_partkey"))
          .select(col("s_acctbal"), col("s_name"), col("n_name"),
            col("p_partkey"), col("ps_supplycost"))
          .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
          .limit(100)
      },
      Some(psCte +
        """,
          |elig AS (
          |  SELECT ps.*, s.s_name, s.s_acctbal, n.n_name
          |  FROM partsupp ps
          |  JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
          |  JOIN nation n ON s.s_nationkey = n.n_nationkey
          |  JOIN region r ON n.n_regionkey = r.r_regionkey
          |  WHERE r.r_name = 'EUROPE'),
          |mc AS (SELECT ps_partkey, min(ps_supplycost_cents) AS min_cents
          |       FROM elig GROUP BY 1)
          |SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, e.ps_supplycost
          |FROM elig e
          |JOIN mc ON e.ps_partkey = mc.ps_partkey
          |       AND e.ps_supplycost_cents = mc.min_cents
          |JOIN part p ON p.p_partkey = e.ps_partkey
          |WHERE p.p_size <= 10 AND p.p_type = 'STANDARD'
          |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin)),

    // TPC-H Q11 — important stock: per-part inventory value vs a
    // fraction of the TOTAL, both sides summed as exact BIGINT cents
    // (sum order never matters) and compared in integer space
    // (sum·2000 > total); the single division to a double happens once,
    // identically, per output row. Scale: one groupBy shuffle + a
    // broadcast 1-row total.
    "q11_important_stock" -> QueryDef(
      (s, d) => {
        val ps = Tables.partsupp(s, d)
        val suppN = Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d).where(col("n_nationkey") < 5)),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"))
        val scoped = ps.join(broadcast(suppN), col("ps_suppkey") === col("s_suppkey"))
          .select(col("ps_partkey"),
            (col("ps_supplycost_cents") * col("ps_availqty")).as("v_cents"))
        val perPart = scoped.groupBy(col("ps_partkey"))
          .agg(sum(col("v_cents")).as("part_cents"))
        // total from the per-part frame (sum of integer sums is exact and
        // identical), not a second scan of the scoped subtree — halves
        // the partsupp derivation work, same value bit-for-bit
        val total = perPart.agg(sum(col("part_cents")).as("total_cents"))
        perPart.crossJoin(broadcast(total))
          .where(col("part_cents") * 2000 > col("total_cents"))
          .select(col("ps_partkey"), (col("part_cents") / 100.0).as("value"))
          .orderBy(col("value").desc, col("ps_partkey"))
      },
      Some(psCte +
        """,
          |scoped AS (
          |  SELECT ps.ps_partkey, ps.ps_supplycost_cents * ps.ps_availqty AS v_cents
          |  FROM partsupp ps
          |  JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
          |  JOIN nation n ON s.s_nationkey = n.n_nationkey
          |  WHERE n.n_nationkey < 5),
          |per_part AS (SELECT ps_partkey, sum(v_cents)::BIGINT AS part_cents
          |             FROM scoped GROUP BY 1),
          |tot AS (SELECT sum(v_cents)::BIGINT AS total_cents FROM scoped)
          |SELECT ps_partkey, part_cents / 100.0 AS value
          |FROM per_part CROSS JOIN tot
          |WHERE part_cents * 2000 > total_cents
          |ORDER BY value DESC, ps_partkey""".stripMargin)),

    // TPC-H Q16 — parts/supplier relationship: distinct-supplier counts
    // per (brand, type, size) bucket, minus the "complaint" suppliers
    // (s_acctbal < 0 — the driver's schema has no s_comment) via a
    // LEFT ANTI join (the NOT IN shape, null-free keys). All integer/
    // string arithmetic — bitwise-portable.
    "q16_parts_supp" -> QueryDef(
      (s, d) => {
        val ps = Tables.partsupp(s, d)
        val excluded = Tables.supplier(s, d).where(col("s_acctbal") < 0)
          .select(col("s_suppkey"))
        ps.join(broadcast(excluded), col("ps_suppkey") === col("s_suppkey"), "left_anti")
          .join(broadcast(Tables.part(s, d)
              .where(col("p_type") =!= "PROMO" &&
                col("p_size").isin(1, 5, 9, 14, 23, 36, 45, 49))
              .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))),
            col("ps_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
      },
      Some(psCte +
        """
          |SELECT p.p_brand, p.p_type, p.p_size,
          |  count(DISTINCT ps.ps_suppkey)::BIGINT AS supplier_cnt
          |FROM partsupp ps
          |JOIN part p ON ps.ps_partkey = p.p_partkey
          |WHERE p.p_type <> 'PROMO' AND p.p_size IN (1, 5, 9, 14, 23, 36, 45, 49)
          |  AND ps.ps_suppkey NOT IN
          |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
          |GROUP BY 1, 2, 3
          |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)),

    // TPC-H Q20 — potential part promotion: suppliers whose stock of
    // 'small%' parts exceeds half of what they actually shipped in 1996
    // (correlated scalar subquery → groupBy-join; l_quantity is
    // integer-valued so the half-sum is exact). Scale: lineitem is the
    // only big side, aggregated BEFORE the join; partsupp joins on the
    // composite key; supplier broadcasts.
    "q20_potential_promo" -> QueryDef(
      (s, d) => {
        val smallParts = Tables.part(s, d).where(col("p_name").startsWith("small"))
          .select(col("p_partkey"))
        val shipped = Tables.lineitem(s, d)
          .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum(col("l_quantity")).as("qty"))
        val candidates = Tables.partsupp(s, d)
          .join(broadcast(smallParts), col("ps_partkey") === col("p_partkey"))
          .join(shipped, col("ps_partkey") === col("l_partkey") &&
            col("ps_suppkey") === col("l_suppkey"), "left")
          .where(col("ps_availqty") > coalesce(col("qty"), lit(0.0)) * 0.5)
          .select(col("ps_suppkey")).distinct()
        Tables.supplier(s, d)
          .join(broadcast(candidates), col("s_suppkey") === col("ps_suppkey"))
          .select(col("s_name"), col("s_acctbal"))
          .orderBy(col("s_name"))
      },
      Some(psCte +
        """,
          |shipped AS (
          |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
          |  FROM lineitem
          |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          |    AND l_shipdate < TIMESTAMP '1997-01-01'
          |  GROUP BY 1, 2),
          |cand AS (
          |  SELECT DISTINCT ps.ps_suppkey
          |  FROM partsupp ps
          |  JOIN part p ON ps.ps_partkey = p.p_partkey AND p.p_name LIKE 'small%'
          |  LEFT JOIN shipped sh
          |    ON ps.ps_partkey = sh.l_partkey AND ps.ps_suppkey = sh.l_suppkey
          |  WHERE ps.ps_availqty > coalesce(sh.qty, 0) * 0.5)
          |SELECT s.s_name, s.s_acctbal
          |FROM supplier s JOIN cand c ON s.s_suppkey = c.ps_suppkey
          |ORDER BY s_name""".stripMargin))
  )
}
