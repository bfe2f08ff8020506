package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Bucketing

class BucketingSpec extends SparkSpec {

  test("bucketed-by-key tables join with ZERO shuffle exchanges, result exact") {
    val tmp = Files.createTempDirectory("graft-bucketing").toString
    val items = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
    val ords = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    // co-location pays off on LARGE×LARGE joins; at spec scale the
    // planner would rightly broadcast instead, hiding what we assert —
    // pin the sort-merge path for the plan check
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      Bucketing.writeBucketed(items, "b_items", s"$tmp/items", "l_orderkey", 8)
      Bucketing.writeBucketed(ords, "b_ords", s"$tmp/ords", "l_orderkey", 8)

      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.colocatedJoin(spark, "b_items", "b_ords", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join, got:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free join, got:\n$plan")

      // same rows as the plain (shuffled) join of the source frames
      val plain = items.join(ords, Seq("l_orderkey"))
      assert(joined.exceptAll(plain).isEmpty && plain.exceptAll(joined).isEmpty)
      assert(joined.count() == plain.count() && plain.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_items")
      spark.sql("DROP TABLE IF EXISTS b_ords")
    }
  }

  test("aggregation on the bucket key also skips the exchange") {
    val tmp = Files.createTempDirectory("graft-bucketing-agg").toString
    val items = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"))
    try {
      Bucketing.writeBucketed(items, "b_agg_items", s"$tmp/items", "l_orderkey", 8)
      // the scan already satisfies the groupBy distribution: partial and
      // final aggregation fuse into one stage, no Exchange in between
      val agg = spark.table("b_agg_items")
        .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("qty"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free agg, got:\n$plan")
      val expect = items.groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("qty"))
      assert(agg.exceptAll(expect).isEmpty && expect.exceptAll(agg).isEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_agg_items")
    }
  }
}
