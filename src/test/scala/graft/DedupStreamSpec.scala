package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.DedupIndex
import graft.streaming.DocStream

class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, text: String) =
    (id, text, "en", "spec", text.length.toLong)

  // arriving files = new part-files appended into the watched directory
  private def writeBatch(dir: String, rows: Seq[(Long, String, String, String, Long)]): Unit =
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("append").parquet(dir)

  test("cross-batch near-dups are dropped; the index grows batch over batch") {
    val in = Files.createTempDirectory("didx_stream_in").toString
    val corpus = Files.createTempDirectory("didx_stream_corpus").toString
    val ckpt = Files.createTempDirectory("didx_stream_ckpt").toString
    val idx = Files.createTempDirectory("didx_stream_idx").toString
    try {
      // cold start: empty index
      val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
      DedupIndex.writeIndex(empty, "t_sdidx", s"$idx/t", numBuckets = 4)

      val a = doc(1, "the quick brown fox jumps over the lazy dog near the river bank")
      val b = doc(2, "an entirely different second document about training data curation at scale")
      // batch 1: a, b, plus an exact within-batch duplicate of a
      writeBatch(in, Seq(a, b, doc(3, a._2)))
      DocStream.startIncrementalDedup(spark, in, corpus, ckpt, "t_sdidx", numBuckets = 4,
        availableNow = true).awaitTermination(120000)

      val kept1 = spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
      // within-batch exact dup dropped by fingerprint (keeps one of 1/3)
      assert(kept1.size == 2 && kept1.contains(2L), s"batch1 kept $kept1")

      // batch 2: a re-crawl of `a` under a new id (cross-batch near-dup:
      // must be dropped via the INDEX) + one genuinely new doc
      val c = doc(20, "novel third topic with completely fresh vocabulary for the second batch")
      writeBatch(in, Seq(doc(10, a._2), c))
      DocStream.startIncrementalDedup(spark, in, corpus, ckpt, "t_sdidx", numBuckets = 4,
        availableNow = true).awaitTermination(120000)

      val kept2 = spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
      assert(kept2 == kept1 + 20L, s"batch2 kept $kept2")

      // batch 3: re-crawls of BOTH prior batches' docs — nothing survives
      writeBatch(in, Seq(doc(30, b._2), doc(31, c._2)))
      DocStream.startIncrementalDedup(spark, in, corpus, ckpt, "t_sdidx", numBuckets = 4,
        availableNow = true).awaitTermination(120000)

      val kept3 = spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
      assert(kept3 == kept2, s"batch3 kept $kept3")

      // the index holds bands for every ACCEPTED doc only
      val indexed = spark.table("t_sdidx").select("doc_id").distinct()
        .as[Long].collect().toSet
      assert(indexed == kept3, s"index holds $indexed, corpus holds $kept3")

      // the foreachBatch corpus is laid out (batch_id, id_bucket) so the
      // per-trigger verification read prunes at the file listing
      val batchDirs = new java.io.File(corpus).listFiles
        .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
      assert(batchDirs.nonEmpty &&
        batchDirs.forall(_.listFiles.exists(_.getName.startsWith("id_bucket="))),
        batchDirs.map(_.getName).mkString(", "))
      // and the exact verification read the batch fn issues carries a
      // static id_bucket partition filter — never a full corpus scan
      val probe = Seq(doc(40, a._2)).toDF("doc_id", "text", "lang", "source", "n_chars")
      val plan = DedupIndex.searchIndex(spark, "t_sdidx", probe,
          spark.read.parquet(corpus), 0.8, idBucketCol = Some(("id_bucket", 16)))
        .queryExecution.executedPlan.toString
      val pfs = "PartitionFilters: \\[([^\\]]*)\\]".r.findAllMatchIn(plan).map(_.group(1)).toSeq
      assert(pfs.exists(_.contains("id_bucket")), plan.take(3000))
    } finally spark.sql("DROP TABLE IF EXISTS t_sdidx")
  }

  test("watermarked dedup: duplicates drop within the horizon, state evicts after it") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, java.sql.Timestamp)]
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q = DocStream.dedupByFingerprintWithinWatermark(docs, "ts", "10 minutes")
      .writeStream.format("memory").queryName("wm_dedup_test").outputMode("append").start()
    try {
      input.addData((1L, "alpha beta", ts(0)))
      q.processAllAvailable()
      input.addData((2L, "alpha beta", ts(1)))    // duplicate inside the horizon
      q.processAllAvailable()
      // far-future row advances the watermark past 10:00 + 10min,
      // evicting the "alpha beta" fingerprint from the state store
      input.addData((3L, "unrelated gamma", ts(40)))
      q.processAllAvailable()
      input.addData((4L, "alpha beta", ts(41)))   // after eviction: passes
      q.processAllAvailable()
      val kept = spark.table("wm_dedup_test").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 3L, 4L), s"kept $kept")
    } finally q.stop()
  }

  test("a replayed batch converges: same partition content, no data loss") {
    val corpus = Files.createTempDirectory("didx_replay_corpus").toString
    val idx = Files.createTempDirectory("didx_replay_idx").toString
    try {
      val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
      DedupIndex.writeIndex(empty, "t_rdidx", s"$idx/t", numBuckets = 4)
      val batch = Seq(doc(1, "a document whose batch gets replayed after a partial commit"))
        .toDF("doc_id", "text", "lang", "source", "n_chars")

      // first attempt commits corpus partition AND index append, then
      // "fails" before the checkpoint records batch 5 — rerun it
      DocStream.incrementalDedupBatch("t_rdidx", corpus, 0.8, numBuckets = 4)(batch, 5L)
      val afterFirst = spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
      DocStream.incrementalDedupBatch("t_rdidx", corpus, 0.8, numBuckets = 4)(batch, 5L)
      val afterReplay = spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
      assert(afterFirst == Set(1L) && afterReplay == Set(1L),
        s"first=$afterFirst replay=$afterReplay")
    } finally spark.sql("DROP TABLE IF EXISTS t_rdidx")
  }
}
