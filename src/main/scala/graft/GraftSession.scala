package graft

import org.apache.spark.sql.SparkSession

/** Canonical session configuration for graft workloads — one place for
  * the settings every entry point (Verify, Bench, user apps) needs:
  * AQE (coalesce + skew-join), UTC, nanos-as-long for TIMESTAMP(NANOS)
  * parquet, shuffle partitions sized to cores (not 200), and graft's SQL
  * functions registered. */
object GraftSession {

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")

  /** Build + register the SQL function surface. */
  def create(master: String, shufflePartitions: Int): SparkSession = {
    val spark = builder(master, shufflePartitions).getOrCreate()
    GraftFunctions.register(spark)
    spark
  }
}
