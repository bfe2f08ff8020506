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

  test("KLL quantile view: merged sketch estimates track exact quantiles within rank error") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type").as("k"),
        (col("value") * 1000).cast("bigint").as("v"))
    // three batches by value hash, summarized independently, folded
    val batches = (0 until 3).map(i => ev.where(pmod(col("v"), lit(3)) === i))
    val folded = IncrementalAgg.foldQuantile(
      batches.map(b => IncrementalAgg.summarizeQuantile(b, Seq("k"), "v"))
        .reduce(_ unionByName _), Seq("k"))
    val est = IncrementalAgg.quantilesOf(folded, Seq(0.5, 0.95))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(est.nonEmpty)
    // exact ranks of the estimates in the full per-group data
    val data = ev.collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    est.foreach { case (k, (q50, q95)) =>
      val xs = data(k)
      def rankOf(x: Long): Double = xs.count(_ <= x).toDouble / xs.length
      assert(math.abs(rankOf(q50) - 0.5) <= 0.05, s"$k q50=$q50 rank=${rankOf(q50)}")
      assert(math.abs(rankOf(q95) - 0.95) <= 0.05, s"$k q95=$q95 rank=${rankOf(q95)}")
    }
    // fold shape: history never rescanned — the fold input is sketches,
    // and a hierarchical fold estimates within tolerance of the flat one
    val hier = IncrementalAgg.foldQuantile(
      IncrementalAgg.foldQuantile(
        batches.take(2).map(b => IncrementalAgg.summarizeQuantile(b, Seq("k"), "v"))
          .reduce(_ unionByName _), Seq("k"))
        .unionByName(IncrementalAgg.summarizeQuantile(batches(2), Seq("k"), "v")),
      Seq("k"))
    val hierEst = IncrementalAgg.quantilesOf(hier, Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    hierEst.foreach { case (k, q50) =>
      val xs = data(k)
      val r = xs.count(_ <= q50).toDouble / xs.length
      assert(math.abs(r - 0.5) <= 0.05, s"hier $k q50=$q50 rank=$r")
    }
  }

  test("quantilesOf derives collision-free names from the full decimal and rejects duplicates") {
    val s = IncrementalAgg.summarizeQuantile(
      (1L to 100L).map(i => ("a", i)).toDF("k", "v"), Seq("k"), "v")
    val f = IncrementalAgg.foldQuantile(s, Seq("k"))
    // 0.954 and 0.9551 used to both round to q95/q96-adjacent integer
    // names; now they must coexist, and double noise (0.95*100) must
    // still yield the clean q95
    val cols = IncrementalAgg.quantilesOf(f, Seq(0.5, 0.95, 0.954, 0.9551)).columns.toSeq
    assert(cols.contains("q50") && cols.contains("q95") &&
      cols.contains("q95_4") && cols.contains("q95_51"), cols.toString)
    val e = intercept[IllegalArgumentException] {
      IncrementalAgg.quantilesOf(f, Seq(0.95, 0.95))
    }
    assert(e.getMessage.contains("colliding"))
  }

}
