package graft

import org.apache.spark.sql.functions._
import graft.plans.LevenshteinPrefilterRule

class LevenshteinRuleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(("kitten", "sitten"), ("kitten", "sittin"),
    ("a", "abcdefgh"), ("xy", "yx")).toDF("a", "b")

  test("rule plants the implied length guard in front of levenshtein bounds; idempotent") {
    val plan = df.where(levenshtein($"a", $"b") <= 1).queryExecution.analyzed
    val rewritten = LevenshteinPrefilterRule(plan)
    val s = rewritten.toString
    assert(s.contains("abs(") && s.contains("length("), s)
    assert(LevenshteinPrefilterRule(rewritten).toString == s) // no second guard
    // plain filters untouched
    val plain = df.where(length($"a") > 1).queryExecution.analyzed
    assert(LevenshteinPrefilterRule(plain).toString == plain.toString)
  }

  test("thresholded 3-arg levenshtein is NOT rewritten (the -1 sentinel breaks the bound)") {
    // levenshtein(a, b, t) returns -1 when distance > t, and -1 <= d is
    // TRUE — a row with a huge length gap passes via the sentinel, so
    // the length guard would wrongly prune it
    val plan = df.where(levenshtein($"a", $"b", 1) <= 5).queryExecution.analyzed
    assert(LevenshteinPrefilterRule(plan).toString == plan.toString)
    // end-to-end: the sentinel row ("a" vs "abcdefgh", distance 7 > 1 →
    // -1) must remain in the result under the installed rule
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ LevenshteinPrefilterRule
    try {
      val got = df.where(levenshtein($"a", $"b", 1) <= 5).count()
      assert(got == df.count(), s"sentinel rows pruned: $got")
    } finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq LevenshteinPrefilterRule)
  }

  test("installed on a live session the rewrite fires and preserves results") {
    // parquet-backed source: a LocalRelation would be constant-folded
    // away before the plan shape can be observed
    def q0 = Tables.customer(spark, sfDir)
      .where(levenshtein(col("c_name"), lit("Customer#000000001")) <= 2)
      .select("c_custkey")
    val expect = q0.collect().map(_.getLong(0)).toSet
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ LevenshteinPrefilterRule
    try {
      val optimized = q0.queryExecution.optimizedPlan.toString
      assert(optimized.contains("abs(") && optimized.contains("length("), optimized)
      assert(q0.collect().map(_.getLong(0)).toSet == expect && expect.nonEmpty)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq LevenshteinPrefilterRule)
    }
  }
}
