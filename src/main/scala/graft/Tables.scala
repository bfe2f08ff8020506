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
}
