package graft

import org.apache.spark.sql.SparkSession

/** Canonical session configuration for graft workloads — one place for
  * the settings every entry point (Verify, Bench, user apps) needs:
  * AQE (coalesce + skew-join), UTC, nanos-as-long for TIMESTAMP(NANOS)
  * parquet, shuffle partitions sized to cores (not 200), graft's SQL
  * functions registered, and graft's optimizer rules active (the
  * levenshtein length guard and the IVF ANN index-scan rewrite) — so
  * Verify and Bench exercise the engine exactly as a
  * `spark.sql.extensions=graft.GraftExtensions` user would get it. */
object GraftSession {

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(new GraftExtensions().apply)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")

  /** Build + register the SQL function surface. (Registration is also
    * handled by the extensions, but getOrCreate may return an EXISTING
    * session built without them — e.g. the shared test JVM — and the
    * explicit register keeps the function surface present either way.) */
  def create(master: String, shufflePartitions: Int): SparkSession = {
    val spark = builder(master, shufflePartitions).getOrCreate()
    GraftFunctions.register(spark)
    spark
  }
}
