package graft

import org.apache.spark.sql.functions._
import graft.operators.HeavyHitters

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish corpus: key k appears ~N/k times — a fat head and a long
    * tail of singletons, the shape heavy-hitter detection exists for. */
  private def zipf(n: Int) = spark.range(1, n.toLong)
    .select(explode(sequence(lit(1), (lit(n) / col("id")).cast("int"))).as("rep"),
      concat(lit("k"), col("id")).as("word"))
    .select("word")

  test("exact() == plain groupBy-having (string keys, Zipf corpus)") {
    val df = zipf(2000).cache()
    val expected = df.groupBy("word").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= 50).as[(String, Long)].collect().toSet
    val got = HeavyHitters.exact(df, "word", 50).as[(String, Long)].collect().toSet
    assert(got == expected && got.nonEmpty)
    df.unpersist()
  }

  test("long keys agree with the plain formulation too") {
    val df = spark.range(3000).select((col("id") % 7).as("k"))
      .union(spark.range(500).select(lit(3L).as("k")))
    val expected = df.groupBy("k").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= 600).as[(Long, Long)].collect().toSet
    val got = HeavyHitters.exact(df, "k", 600).as[(Long, Long)].collect().toSet
    assert(got == expected && got.nonEmpty)
  }

  test("a deliberately coarse sketch still yields the exact answer") {
    // eps=0.5 → width 4: massive collisions, maximal false positives —
    // the exact verify must absorb them all
    val df = zipf(500)
    val expected = df.groupBy("word").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= 20).as[(String, Long)].collect().toSet
    val got = HeavyHitters.exact(df, "word", 20, eps = 0.5)
      .as[(String, Long)].collect().toSet
    assert(got == expected)
  }

  test("the CMS pre-filter prunes the tail before the aggregation") {
    // the shuffle/aggregate-state cost is sized by DISTINCT keys — that
    // is what the pre-filter must shrink: of 5000 distinct keys only
    // k1..k50 have count >= 100; eps=1e-3 leaves collisions negligible
    val df = zipf(5000).cache()
    val keysTotal = df.distinct().count()
    val cms = HeavyHitters.sketch(df, "word")
    val keysLeft = df.where(HeavyHitters.estimate(col("word"), cms) >= 100)
      .distinct().count()
    assert(keysLeft < keysTotal / 10,
      s"pre-filter kept $keysLeft of $keysTotal distinct keys")
    df.unpersist()
  }

  test("estimates never undercount (the lossless-prune invariant)") {
    val df = zipf(300).cache()
    val cms = HeavyHitters.sketch(df, "word")
    val under = df.groupBy("word").agg(count(lit(1)).as("cnt"))
      .where(HeavyHitters.estimate(col("word"), cms) < col("cnt")).count()
    assert(under == 0)
    df.unpersist()
  }

  test("exactByRate thresholds off the sketch's own totalCount") {
    val df = zipf(1000).cache()
    val n = df.count()
    val minCount = math.max(1L, math.ceil(0.01 * n).toLong)
    val expected = df.groupBy("word").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount).as[(String, Long)].collect().toSet
    val got = HeavyHitters.exactByRate(df, "word", 0.01)
      .as[(String, Long)].collect().toSet
    assert(got == expected && got.nonEmpty)
    df.unpersist()
  }

  test("NULL keys are dropped, empty input yields empty output") {
    val df = Seq(Some("a"), Some("a"), None, None, None).toDF("word")
    val got = HeavyHitters.exact(df, "word", 2).as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 2L)))
    val empty = HeavyHitters.exact(df.where(lit(false)), "word", 1)
    assert(empty.count() == 0)
  }

  test("the probe stays inside whole-stage codegen") {
    val df = zipf(100)
    val cms = HeavyHitters.sketch(df, "word")
    val plan = df.where(HeavyHitters.estimate(col("word"), cms) >= 5)
      .queryExecution.executedPlan.toString
    // a codegen'd node is printed with a "*(stageId)" prefix; a
    // CodegenFallback probe would leave the Filter line bare
    val filterLine = plan.linesIterator
      .find(l => l.contains("Filter") && l.contains("cms_estimate")).getOrElse("")
    assert(filterLine.matches(""".*\*\(\d+\) Filter .*"""), plan.take(800))
  }
}
