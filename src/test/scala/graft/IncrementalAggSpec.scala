package graft

import org.apache.spark.sql.functions._
import graft.operators.IncrementalAgg

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("k")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy($"k").collect().map(r => (r.getString(0), r.getLong(1),
      r.getDecimal(2).toPlainString, r.getDecimal(3).toPlainString,
      r.getDecimal(4).toPlainString)).toSeq

  test("fold of batch summaries equals the one-shot summary; order-independent; empty is identity") {
    val b1 = Seq(("a", 1.5), ("a", 2.25), ("b", -1.0)).toDF("k", "v")
    val b2 = Seq(("a", 10.0), ("c", 7.125)).toDF("k", "v")
    val s1 = IncrementalAgg.summarize(b1, keys, "v")
    val s2 = IncrementalAgg.summarize(b2, keys, "v")
    val oneShot = rows(IncrementalAgg.summarize(b1.unionByName(b2), keys, "v"))
    assert(rows(IncrementalAgg.fold(s1, s2, keys)) == oneShot)
    assert(rows(IncrementalAgg.fold(s2, s1, keys)) == oneShot)     // commutative
    val empty = IncrementalAgg.summarize(b1.limit(0), keys, "v")
    assert(rows(IncrementalAgg.fold(s1, empty, keys)) == rows(s1)) // identity
  }

  test("streaming materialized view: per-batch summaries fold to the one-shot truth; replay converges") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("mview").toString
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Double)]
    val q = input.toDF().toDF("k", "v").writeStream
      .foreachBatch(IncrementalAgg.viewBatch(dir, keys, "v") _)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("mview_ckpt").toString)
      .start()
    try {
      input.addData(("a", 1.5), ("b", 2.0)); q.processAllAvailable()
      input.addData(("a", 3.25), ("c", -4.0)); q.processAllAvailable()
      val view = rows(IncrementalAgg.readView(spark, dir, keys))
      val truth = rows(IncrementalAgg.summarize(
        Seq(("a", 1.5), ("b", 2.0), ("a", 3.25), ("c", -4.0)).toDF("k", "v"), keys, "v"))
      assert(view == truth)
      // crash replay: re-running a committed batch overwrites, not doubles
      IncrementalAgg.viewBatch(dir, keys, "v")(
        Seq(("a", 3.25), ("c", -4.0)).toDF("k", "v"), 1L)
      assert(rows(IncrementalAgg.readView(spark, dir, keys)) == truth)
    } finally q.stop()
  }

  test("hierarchical merge (partials of partials) stays exact on real data") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type").as("k"), col("value").as("v"))
    val parts = (0 until 4).map(i => ev.where(abs(hash(col("v"))) % 4 === i))
    val folded = parts.map(IncrementalAgg.summarize(_, keys, "v"))
      .reduce(IncrementalAgg.fold(_, _, keys))
    assert(rows(folded) == rows(IncrementalAgg.summarize(ev, keys, "v")))
    // derived average is the exact decimal ratio
    val avg = IncrementalAgg.withAverage(folded).select($"k", $"avg_v")
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val direct = ev.groupBy($"k").agg(
      round(sum($"v".cast("decimal(18,6)")) / count(lit(1)), 6).as("a"))
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    assert(avg.keySet == direct.keySet)
    avg.keys.foreach(k => assert(avg(k).compareTo(direct(k)) == 0, s"$k: ${avg(k)} vs ${direct(k)}"))
  }
}
