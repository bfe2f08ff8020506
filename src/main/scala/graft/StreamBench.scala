package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.pipeline.PdfPipeline
import graft.streaming.{DocStream, ServeStream}

/** STREAMING latency bench axis (VERDICT r9 #9): the batch sweep floors
  * every batch query, but the serve tier's per-trigger latency had no
  * committed floor — a regression in the foreachBatch serving plan (or
  * the ingest chunk+embed pipeline) would ride invisibly under batch
  * timings. This harness drives a FIXED workload through the two
  * streaming entry points and reports per-trigger p50/p95:
  *
  *  - `serve`: 12 micro-batches × 8 queries through [[ServeStream.serve]]
  *    (embed → KNN → per-hit summary events → idempotent sink);
  *  - `docs`: 6 file-arrival batches × 50 documents through
  *    [[DocStream.start]] (chunk → embed → parquet vector store).
  *
  * Per-trigger latency is wall time around `processAllAvailable()` for a
  * batch of known size — the figure a serve SLO would target (includes
  * planning + sink commit, which `durationMs` alone under-counts). One
  * warm-up trigger per axis is excluded (codegen + sink init). Results
  * feed the same 1.75× regression gate as batch queries, under the
  * `stream_*` floor keys in BENCH_BASELINE.json. */
object StreamBench {

  /** Nearest-rank percentile (p in (0,1]) of a latency sample. */
  private[graft] def pct(xs: Seq[Double], p: Double): Double = {
    require(xs.nonEmpty, "StreamBench.pct: empty sample")
    val s = xs.sorted
    s(math.max(0, math.min(s.length - 1, math.ceil(p * s.length).toInt - 1)))
  }

  def run(spark: SparkSession, sfDir: String): Map[String, Double] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // ── serve axis ─────────────────────────────────────────────────
    val chunks = PdfPipeline.chunkRows(Tables.documents(spark, sfDir), 200, 60)
    val corpus = ServeStream.corpusIndex(chunks).cache()
    corpus.count() // materialize untimed — the caller-owned long-lived cache
    val input = MemoryStream[(Long, String)]
    val sink = Files.createTempDirectory("bench_serve_sink").toString
    val ck = Files.createTempDirectory("bench_serve_ck").toString
    // zero-interval triggers: the metric is PROCESSING latency per
    // trigger, not the configured poll interval (10 s ingest / 1 s serve
    // production defaults would dominate the measurement with waiting)
    val now = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L)
    val sq = ServeStream.serve(input.toDF().toDF("qid", "text"), corpus, k = 3, sink, ck,
      trigger = now)
    val serveLat = scala.collection.mutable.ArrayBuffer.empty[Double]
    try {
      val words = Seq("spark table", "customer order", "region nation",
        "lineitem price", "shipment date", "supplier account",
        "query vector", "chunk text")
      input.addData((0L, "warmup query"))
      sq.processAllAvailable() // warm-up trigger: codegen + sink init, untimed
      for (b <- 1 to 12) {
        input.addData((0 until 8).map(i => (b * 100L + i, s"${words(i % words.length)} $b")): _*)
        val t0 = System.nanoTime()
        sq.processAllAvailable()
        serveLat += (System.nanoTime() - t0) / 1e9
      }
    } finally { sq.stop(); corpus.unpersist() }

    // ── index-backed serve axis ────────────────────────────────────
    // the production scale path: per-trigger cost is the probed-cell
    // fraction of a persisted IVF store, not a corpus scan
    val corpus2 = ServeStream.corpusIndex(chunks).cache()
    corpus2.count()
    val idxDir = Files.createTempDirectory("bench_serve_idx").toString
    ServeStream.buildServeIndex(corpus2, idxDir, cells = 16, iters = 2)
    val input2 = MemoryStream[(Long, String)]
    val sink2 = Files.createTempDirectory("bench_serve_idx_sink").toString
    val ck3 = Files.createTempDirectory("bench_serve_idx_ck").toString
    val sq2 = ServeStream.serveFromIndex(input2.toDF().toDF("qid", "text"), corpus2,
      idxDir, k = 3, nprobe = 4, sink2, ck3, trigger = now)
    val idxLat = scala.collection.mutable.ArrayBuffer.empty[Double]
    try {
      val words = Seq("spark table", "customer order", "region nation",
        "lineitem price", "shipment date", "supplier account",
        "query vector", "chunk text")
      input2.addData((0L, "warmup query"))
      sq2.processAllAvailable()
      for (b <- 1 to 12) {
        input2.addData((0 until 8).map(i => (b * 100L + i, s"${words(i % words.length)} $b")): _*)
        val t0 = System.nanoTime()
        sq2.processAllAvailable()
        idxLat += (System.nanoTime() - t0) / 1e9
      }
    } finally { sq2.stop(); corpus2.unpersist() }

    // ── ingest axis ────────────────────────────────────────────────
    val in = Files.createTempDirectory("bench_docs_in").toString
    val outp = Files.createTempDirectory("bench_docs_out").toString
    val ck2 = Files.createTempDirectory("bench_docs_ck").toString
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .limit(350).collect() // bounded batch payloads, replayed as arriving files
    def feed(rows: Array[org.apache.spark.sql.Row]): Unit =
      spark.createDataFrame(
          scala.jdk.CollectionConverters.SeqHasAsJava(rows.toSeq).asJava,
          org.apache.spark.sql.types.StructType.fromDDL(DocStream.inputSchema))
        .coalesce(1).write.mode("append").parquet(in)
    val dq = DocStream.start(spark, in, outp, ck2, trigger = now)
    val docLat = scala.collection.mutable.ArrayBuffer.empty[Double]
    try {
      feed(docs.take(50))
      dq.processAllAvailable() // warm-up trigger, untimed
      for (b <- 1 to 6) {
        feed(docs.slice(50 * b, 50 * b + 50))
        val t0 = System.nanoTime()
        dq.processAllAvailable()
        docLat += (System.nanoTime() - t0) / 1e9
      }
    } finally dq.stop()

    Map(
      "stream_serve_p50" -> pct(serveLat.toSeq, 0.50),
      "stream_serve_p95" -> pct(serveLat.toSeq, 0.95),
      "stream_serve_idx_p50" -> pct(idxLat.toSeq, 0.50),
      "stream_serve_idx_p95" -> pct(idxLat.toSeq, 0.95),
      "stream_docs_p50" -> pct(docLat.toSeq, 0.50),
      "stream_docs_p95" -> pct(docLat.toSeq, 0.95))
  }
}
