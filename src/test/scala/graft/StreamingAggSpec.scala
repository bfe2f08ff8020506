package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, hour}
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStream
import graft.streaming.EventStream.{Event, SessionSnapshot}

class StreamingAggSpec extends SparkSpec {

  test("watermarked tumbling-window aggregation over a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = EventStream.hourlyCounts(events).writeStream
      .format("memory").queryName("hourly_test").outputMode("complete").start()
    try {
      def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      // same event type in two different hours — asserts the WINDOW key,
      // not just the type grouping
      input.addData((t(10, 5), "click", 1.0), (t(10, 40), "click", 2.0),
        (t(11, 10), "click", 4.0), (t(11, 20), "view", 3.0))
      q.processAllAvailable()
      val rows = spark.table("hourly_test")
        .select(hour($"hour_start"), $"event_type", $"n", $"sum_value").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(rows == Set((10, "click", 2L, 3.0), (11, "click", 1L, 4.0), (11, "view", 1L, 3.0)))
    } finally q.stop()
  }

  test("stream-static enrichment joins a live stream to a broadcast dimension") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val events = input.toDF().toDF("user_id", "value")
    val dim = Tables.customer(spark, sfDir).select(col("c_custkey"), col("c_mktsegment"))
    val q = EventStream.enrich(events, dim, "user_id", "c_custkey").writeStream
      .format("memory").queryName("enrich_test").outputMode("append").start()
    try {
      input.addData((1L, 10.0), (2L, 20.0), (999999L, 1.0))
      q.processAllAvailable()
      val rows = spark.table("enrich_test").collect()
      assert(rows.length == 3)
      assert(rows.count(_.isNullAt(3)) == 1)   // unmatched key keeps the event
      assert(rows.filter(_.getLong(0) == 1L).forall(!_.isNullAt(3)))
    } finally q.stop()
  }

  test("embedder usage accumulator tallies prompt tokens") {
    val acc = spark.sparkContext.longAccumulator("graft.embed.tokens")
    val docs = Tables.documents(spark, sfDir).limit(10).select(col("doc_id"), col("text"))
    graft.pipeline.Embedder.embed(docs, textCol = "text", usageTokens = Some(acc)).count()
    assert(acc.value > 0)
  }

  test("stateful sessionization (mapGroupsWithState) splits on gap across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.sessionize(input.toDS(), gapSec = 100).writeStream
      .format("memory").queryName("sessions_test").outputMode(OutputMode.Update()).start()
    try {
      input.addData(Event(1, 1000, 1.0), Event(1, 1050, 2.0), Event(2, 1000, 5.0))
      q.processAllAvailable()
      input.addData(Event(1, 1120, 3.0))   // within gap of 1050+100? 1120-1050=70 → same session
      q.processAllAvailable()
      input.addData(Event(1, 5000, 4.0))   // new session
      q.processAllAvailable()
      val snaps = spark.table("sessions_test").as[SessionSnapshot].collect()
      val lastUser1 = snaps.filter(_.user_id == 1).maxBy(_.end_sec)
      assert(lastUser1.start_sec == 5000 && lastUser1.n_events == 1)
      val mid = snaps.filter(s => s.user_id == 1 && s.end_sec == 1120)
      assert(mid.nonEmpty && mid.head.n_events == 3 && mid.head.start_sec == 1000)
      assert(snaps.exists(s => s.user_id == 2 && s.n_events == 1))
    } finally q.stop()
  }

  test("stream-stream attribution join matches within the gap, drops beyond it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val joined = EventStream.attributionJoin(
      views.toDF().toDF("user_id", "ts"),
      clicks.toDF().toDF("user_id", "ts"), maxGapSec = 600)
    val q = joined.writeStream.format("memory")
      .queryName("attrib_test").outputMode("append").start()
    try {
      def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      views.addData((1L, t(0)), (2L, t(0)))
      clicks.addData((1L, t(5)),   // within 10 min → match
        (1L, t(20)),               // beyond gap → no match
        (3L, t(2)))                // other user → no match
      q.processAllAvailable()
      val rows = spark.table("attrib_test")
        .select(col("user_id"), col("l_ts"), col("r_ts")).collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)))
      assert(rows.toSeq == Seq((1L, t(0), t(5))))
      // a later batch can still match an earlier buffered view
      clicks.addData((2L, t(9)))
      q.processAllAvailable()
      assert(spark.table("attrib_test").count() == 2)
    } finally q.stop()
  }

  test("sessionize: a late event beyond start - gap closes as its own session, never fuses") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // wide watermark so the late event is legal; narrow gap so it's disjoint
    val q = EventStream.sessionize(input.toDS(), gapSec = 100, watermarkDelaySec = 100000)
      .writeStream.format("memory").queryName("sessions_late_test")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(Event(1, 8000, 1.0), Event(1, 8050, 2.0))
      q.processAllAvailable()
      // legal late event 7900s BEFORE the open session — the batch
      // sessionizer would emit it as its own [100,100] session; fusing
      // would produce one session spanning a super-gap hole
      input.addData(Event(1, 100, 9.0))
      q.processAllAvailable()
      val snaps = spark.table("sessions_late_test").as[SessionSnapshot].collect()
      assert(snaps.exists(s => s.start_sec == 100 && s.end_sec == 100 && s.n_events == 1),
        snaps.mkString(", "))
      // the open session is untouched by the stray
      val open = snaps.filter(s => s.end_sec == 8050)
      assert(open.nonEmpty && open.forall(s => s.start_sec == 8000 && s.n_events == 2))
      // and an in-batch forward gap emits BOTH the closed and new session
      input.addData(Event(1, 8060, 1.0), Event(1, 20000, 7.0))
      q.processAllAvailable()
      val snaps2 = spark.table("sessions_late_test").as[SessionSnapshot].collect()
      assert(snaps2.exists(s => s.end_sec == 8060 && s.n_events == 3)) // closed emission
      assert(snaps2.exists(s => s.start_sec == 20000 && s.n_events == 1))
    } finally q.stop()
  }

  test("sessionize evicts idle state via event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.sessionize(input.toDS(), gapSec = 100, watermarkDelaySec = 10)
      .writeStream.format("memory").queryName("sessions_evict_test")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(Event(1, 1000, 1.0))
      q.processAllAvailable()
      // advancing the watermark past user1's end+gap (1100) evicts its
      // state: the final snapshot is re-emitted by the timeout path
      input.addData(Event(2, 5000, 1.0))
      q.processAllAvailable()
      def user1Rows = spark.table("sessions_evict_test")
        .as[SessionSnapshot].collect().count(_.user_id == 1)
      val deadline = System.currentTimeMillis + 30000
      while (user1Rows < 2 && System.currentTimeMillis < deadline) Thread.sleep(250)
      assert(user1Rows == 2)
    } finally q.stop()
  }

  test("streaming drift gate: in-distribution batches pass, a shifted batch trips the breaker") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val reportDir = java.nio.file.Files.createTempDirectory("drift_report").toString
    // baseline: uniform over [0, 100) in 10 buckets
    val baseline = graft.operators.Drift.histogram(
      (0 until 1000).map(i => (i % 100).toDouble).toDF("value"), "value", 0, 100, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val input = MemoryStream[Double]
    val q = input.toDF().toDF("value").writeStream
      .foreachBatch(EventStream.driftGateBatch(baseline, reportDir, "value", 0, 100, 10) _)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("drift_ckpt").toString)
      .start()
    try {
      input.addData((0 until 200).map(i => (i % 100).toDouble): _*)   // in-distribution
      q.processAllAvailable()
      assert(!EventStream.anyDrift(spark, reportDir))
      input.addData((0 until 200).map(_ => 7.0): _*)                  // mass collapses to one bucket
      q.processAllAvailable()
      assert(EventStream.anyDrift(spark, reportDir))
    } finally q.stop()
    // replay convergence: re-running batch 0 leaves the report unchanged
    val before = spark.read.parquet(reportDir).count()
    EventStream.driftGateBatch(baseline, reportDir, "value", 0, 100, 10)(
      (0 until 200).map(i => (i % 100).toDouble).toDF("value"), 0L)
    assert(spark.read.parquet(reportDir).count() == before)
  }
}
