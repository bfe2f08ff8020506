package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Table loading helpers for the driver-generated parquet test tables
  * (TESTDATA.md). All graft queries take `(SparkSession, sfDir)` and load
  * through here so scans stay prunable (parquet column pruning + filter
  * pushdown apply to these reads).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  /** `events.ts` arrives either as int64 epoch-nanos (timestamp[ns]
    * parquet, which Spark surfaces as LongType) or as timestamp[us]
    * (TIMESTAMP_NTZ). Downstream queries do integer arithmetic on
    * epoch-nanos (`ts div 1e9` → seconds, `ts div 1e3` → micros), so
    * normalize the timestamp encoding back to nanos here — one cast at
    * the scan, session timezone is pinned to UTC so the NTZ wall-clock
    * maps to the same epoch DuckDB's `epoch(ts)` computes.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df
      case _ => df.withColumn("ts", expr("unix_micros(cast(ts as timestamp)) * 1000L"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** SYNTHESIZED `partsupp` (documented deviation — the driver's testdata
    * has no partsupp parquet, SURVEY §7.6): the TPC-H shape derived
    * DETERMINISTICALLY from `part` × the supplier count, dbgen-style —
    * 4 suppliers per part at a coprime-ish stride, availqty/supplycost
    * from integer congruences — so the four classic partsupp queries
    * (Q2/Q11/Q16/Q20) get REAL oracle gates: the DuckDB side re-derives
    * the identical table as a CTE from the same formulas. The extra
    * `ps_supplycost_cents` BIGINT column carries the cost exactly, so
    * aggregates can run in integer space (sum-order-independent) and
    * divide once at the end.
    *
    * Scale shape: one narrow projection of `part` exploded ×4 with a
    * broadcast 1-row supplier count — no shuffle, no driver loop; at
    * 100 TB this generates partsupp co-partitioned with whatever `part`
    * scan feeds it. */
  def partsupp(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{array, broadcast, col, count, explode, lit}
    val p = part(s, d).select(col("p_partkey"))
    val sCnt = broadcast(supplier(s, d).agg(count(lit(1)).as("s_cnt")))
    p.crossJoin(sCnt)
      .select(col("p_partkey"), col("s_cnt"),
        explode(array((0 to 3).map(lit): _*)).as("i"))
      .selectExpr(
        "p_partkey AS ps_partkey",
        "(p_partkey + i * (s_cnt div 4 + 1)) % s_cnt AS ps_suppkey",
        "(p_partkey * 11 + i * 131) % 9999 + 1 AS ps_availqty",
        "(p_partkey * 37 + i * 991) % 90000 + 10000 AS ps_supplycost_cents",
        // D suffix: a bare 100.0 parses DECIMAL(4,1) and BIGINT/DECIMAL
        // lands DECIMAL(27,6) in the output parquet, which the driver's
        // hasher serializes differently from the oracle's DOUBLE
        // (round-10 q2 hash mismatch); 100.0D keeps IEEE double division,
        // bit-identical to DuckDB's `/ 100.0` on the same integers.
        "((p_partkey * 37 + i * 991) % 90000 + 10000) / 100.0D AS ps_supplycost")
  }
}
