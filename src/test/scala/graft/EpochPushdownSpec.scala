package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.EpochPushdownRule

/** [[graft.plans.EpochPushdownRule]]: time predicates on derived
  * epoch-integer chains must transpose onto the raw parquet timestamp
  * column (so row-group pruning fires) without changing any result —
  * including truncating-division chains over pre-1970 instants, where
  * Spark's `div` (trunc) and floor division disagree. */
class EpochPushdownSpec extends SparkSpec {

  private def withRule[A](f: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ EpochPushdownRule
    try f finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq EpochPushdownRule)
    }
  }

  /** Temp NTZ-timestamp parquet spanning 1969–1970 (negative + positive
    * epoch micros), one row per `step` seconds. */
  private lazy val ntzPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("epoch_ntz").toString
    spark.range(-500, 500)
      .selectExpr("id", "cast(cast(id * 3600 as timestamp) as timestamp_ntz) as ts")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def derived(df: DataFrame): DataFrame =
    df.withColumn("ts", expr("unix_micros(cast(ts as timestamp)) * 1000L"))

  test("guard lands in PushedFilters on the raw ts column; results unchanged") {
    def q = derived(spark.read.parquet(ntzPath))
      .select(expr("ts div 1000").as("tsu"), col("id"))
      .where(col("tsu") < 600000000L) // micros
    val expect = q.collect().map(_.getLong(1)).toSet
    withRule {
      val pushed = q.queryExecution.executedPlan.toString
      assert(pushed.contains("LessThanOrEqual(ts"), pushed)
      assert(q.collect().map(_.getLong(1)).toSet == expect)
      assert(expect.nonEmpty)
    }
  }

  test("equivalence over chain × comparison grid incl. negative epochs") {
    val raw = spark.read.parquet(ntzPath)
    val chains = Seq(
      "ts div 1000", // nanos → micros
      "ts div 1000000000", // nanos → seconds (trunc: differs from floor pre-1970)
      "(ts div 1000000000) div 3600 * 3600", // hour bucket then re-scale
      "ts div 1000 + 42", // shifted
      "ts") // bare nanos chain
    // bounds that land exactly ON a row value and between rows, both signs
    val lits = Seq(-1800000000000L, -3600L, -1L, 0L, 1L, 3600L, 1799999999999L)
    for (c <- chains; l <- lits; cmp <- Seq("<", "<=", ">", ">=", "=")) {
      def q = derived(raw).where(expr(s"($c) $cmp ${l}L")).select("id")
      val base = q.collect().map(_.getLong(0)).toSet
      val got = withRule(q.collect().map(_.getLong(0)).toSet)
      assert(got == base, s"chain=$c cmp=$cmp lit=$l: ${got.size} vs ${base.size}")
    }
  }

  test("rule is idempotent and leaves unrelated filters alone") {
    val q = derived(spark.read.parquet(ntzPath))
      .where(expr("ts div 1000 >= 0"))
    val once = EpochPushdownRule(q.queryExecution.optimizedPlan)
    assert(once.toString != q.queryExecution.optimizedPlan.toString)
    assert(EpochPushdownRule(once).toString == once.toString)
    val plain = spark.read.parquet(ntzPath).where(col("id") > 3)
    val p = plain.queryExecution.optimizedPlan
    assert(EpochPushdownRule(p).toString == p.toString)
  }

  test("stands down under a non-UTC session zone") {
    val q = derived(spark.read.parquet(ntzPath)).where(expr("ts div 1000 >= 0"))
    val plan = q.queryExecution.optimizedPlan
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try assert(EpochPushdownRule(plan).toString == plan.toString)
    finally spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert(EpochPushdownRule(plan).toString != plan.toString)
  }

  test("stands down under non-ANSI arithmetic (forward-chain wrap would be unsound)") {
    // a year-9999 sentinel through `unix_micros * 1000` WRAPS when ANSI
    // is off; a wrapped value can satisfy the original predicate while
    // the mathematical value does not, so the planted guard would drop a
    // row the unrewritten plan keeps — the rule must not fire there
    val q = derived(spark.read.parquet(ntzPath)).where(expr("ts div 1000 >= 0"))
    val plan = q.queryExecution.optimizedPlan
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try assert(EpochPushdownRule(plan).toString == plan.toString)
    finally spark.conf.set("spark.sql.ansi.enabled", "true")
    assert(EpochPushdownRule(plan).toString != plan.toString)
  }

  test("fires on the live events table shape (q_drift slice)") {
    val ev = Tables.events(spark, sfDir)
      .select(expr("ts div 1000").as("tsu"), col("value"))
    if (ev.schema("tsu").dataType == org.apache.spark.sql.types.LongType) {
      val r = ev.agg(min(col("tsu")), max(col("tsu"))).head()
      val cutoff = (r.getLong(0) + r.getLong(1)) / 2
      def q = ev.where(col("tsu") < cutoff)
      val n = q.count()
      withRule {
        val phys = q.queryExecution.executedPlan.toString
        // raw events.ts is TIMESTAMP_NTZ parquet in current testdata →
        // the guard must reach PushedFilters; if the driver ever reverts
        // to int64 nanos the column is already native and nothing to do
        if (Tables.load(spark, sfDir, "events").schema("ts").dataType !=
            org.apache.spark.sql.types.LongType) {
          assert(phys.contains("PushedFilters") && phys.contains("LessThanOrEqual(ts"), phys)
        }
        assert(q.count() == n)
      }
    }
  }
}
