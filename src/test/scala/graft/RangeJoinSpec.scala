package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private def fixtures = {
    val ev = Tables.events(spark, sfDir)
    val sec = expr("ts div 1000000000")
    val pts = ev.where(col("event_type") === "click")
      .select(col("event_id").as("pid"), sec.as("p"))
    val ivs = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("iid"), sec.as("s"), (sec + 3600).as("e"))
    (pts, ivs)
  }

  test("bucketized range join equals the nested-loop join, each pair once") {
    val (pts, ivs) = fixtures
    val naive = pts.crossJoin(ivs).where(col("p").between(col("s"), col("e")))
      .select("pid", "iid")
    for (w <- Seq(600L, 3600L, 7200L)) { // narrower/equal/wider than the span
      val got = RangeJoin.pointInInterval(pts, "p", ivs, "s", "e", bucketWidth = w)
        .select("pid", "iid")
      assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
        s"bucketWidth=$w")
    }
    assert(naive.count() > 0)
  }

  test("equi-keys scope the range condition per key") {
    val pts = Seq((1L, 10L, "a"), (2L, 10L, "b")).toDF("pid", "p", "k")
    val ivs = Seq((100L, 0L, 20L, "a")).toDF("iid", "s", "e", "k")
    val got = RangeJoin.pointInInterval(pts, "p", ivs, "s", "e",
      bucketWidth = 16, equiKeys = Seq("k")).select("pid").as[Long].collect().toSeq
    assert(got == Seq(1L)) // same instant, wrong key → no match
  }

  test("colliding interval columns need a suffix, and get one") {
    val pts = Seq((1L, 10L)).toDF("id", "p")
    val ivs = Seq((9L, 0L, 20L)).toDF("id", "s", "e")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pts, "p", ivs, "s", "e", bucketWidth = 8)
    }
    val ok = RangeJoin.pointInInterval(pts, "p", ivs, "s", "e", bucketWidth = 8,
      intervalSuffix = "_iv")
    assert(ok.columns.contains("id") && ok.columns.contains("id_iv"))
    assert(ok.count() == 1)
  }

  test("interval-overlap join equals nested-loop overlap, each pair once") {
    val ev = Tables.events(spark, sfDir)
    val sec = expr("ts div 1000000000")
    val a = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("aid"), sec.as("as_"), (sec + 3600).as("ae"))
    val b = ev.where(col("event_type") === "error")
      .select(col("event_id").as("bid"), sec.as("bs"), (sec + 1800).as("be"))
    val naive = a.crossJoin(b)
      .where(col("as_") <= col("be") && col("bs") <= col("ae"))
      .select("aid", "bid")
    for (w <- Seq(900L, 3600L)) {
      val got = RangeJoin.intervalOverlap(a, "as_", "ae", b, "bs", "be", bucketWidth = w)
        .select("aid", "bid")
      assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
        s"bucketWidth=$w")
    }
    assert(naive.count() > 0)
  }

  test("range join plans as a hash join — no nested loop, no cartesian") {
    val (pts, ivs) = fixtures
    val plan = RangeJoin.pointInInterval(pts, "p", ivs, "s", "e", bucketWidth = 3600)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan.take(1200))
  }

  test("NULL interval bounds drop the row (plain-join semantics), not the job") {
    val pts = Seq((1L, 10L)).toDF("pid", "p")
    val ivs = Seq((100L, Some(0L), Some(20L)), (101L, None, Some(20L)), (102L, Some(0L), None))
      .toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(pts, "p", ivs, "s", "e", bucketWidth = 8)
      .select("iid").as[Long].collect().toSeq
    assert(got == Seq(100L))
  }

  test("an inverted interval (end < start) fails fast, not silently explodes") {
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val pts = Seq((1L, 10L)).toDF("pid", "p")
    for (iv <- Seq(
        (100L, 1000000000L, 0L), // inversion spanning many buckets
        (100L, 100L, 50L))) {    // inversion INSIDE one bucket — must
                                 // still fire: the guard is on values,
                                 // not bucket ids
      val ivs = Seq(iv).toDF("iid", "s", "e")
      val ex = intercept[Exception] {
        RangeJoin.pointInInterval(pts, "p", ivs, "s", "e", bucketWidth = 3600).count()
      }
      assert(msgs(ex).exists(_.contains("inverted")), s"for $iv: $ex")
    }
  }

  test("an interval spanning too many buckets fails fast instead of exploding") {
    val pts = Seq((1L, 10L)).toDF("pid", "p")
    val ivs = Seq((100L, 0L, 10000000L)).toDF("iid", "s", "e")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(pts, "p", ivs, "s", "e",
        bucketWidth = 10, maxSpanBuckets = 1000).count()
    }
    assert(ex.getMessage.contains("widen bucketWidth") ||
      Option(ex.getCause).exists(_.getMessage.contains("widen bucketWidth")))
  }
}
