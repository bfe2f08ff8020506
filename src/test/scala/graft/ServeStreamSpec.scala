package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.pipeline.{PdfPipeline, Summarizer}
import graft.streaming.ServeStream

class ServeStreamSpec extends SparkSpec {

  test("streaming serve loop: query stream → knn → per-hit summary events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val chunks = PdfPipeline.chunkRows(Tables.documents(spark, sfDir), 200, 60)
    val corpus = ServeStream.corpusIndex(chunks).cache()   // caller owns the cache
    val input = MemoryStream[(Long, String)]
    val queries = input.toDF().toDF("qid", "text")
    val sink = Files.createTempDirectory("serve_sink").toString
    val ck = Files.createTempDirectory("serve_ck").toString
    val q = ServeStream.serve(queries, corpus, k = 3, sink, ck)
    try {
      input.addData((1L, "spark table"), (2L, "customer order"))
      q.processAllAvailable()
      val out = spark.read.parquet(sink).cache()
      // 2 queries × 3 hits × 3 events
      assert(out.count() == 2 * 3 * 3)
      // the reference emission order per hit: create → createLink → addMessage
      val ev = out.where(col("qid") === 1 && col("rn") === 1)
        .orderBy(col("ev_seq")).select("payload").collect().map(_.getString(0))
      assert(ev.length == 3)
      assert(ev(0).startsWith("""{"type":"create","""))
      assert(ev(1).contains(""""type":"createLink"""") && ev(1).contains("#page="))
      assert(ev(2).contains(""""type":"addMessage""""))
      // a second micro-batch serves new queries without disturbing the sink
      input.addData((3L, "region nation"))
      q.processAllAvailable()
      assert(spark.read.parquet(sink).count() == 3 * 3 * 3)
      out.unpersist()
    } finally { q.stop(); corpus.unpersist() }
  }

  test("index-backed serve: probed-cell pruning, recall vs the exact path, live stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.{IvfIndex, Knn}
    val chunks = PdfPipeline.chunkRows(Tables.documents(spark, sfDir), 200, 60)
    val corpus = ServeStream.corpusIndex(chunks).cache()
    val idx = Files.createTempDirectory("serve_ivf").toString
    ServeStream.buildServeIndex(corpus, idx, cells = 8, iters = 2)

    val qv = Seq((1L, "spark table"), (2L, "customer order")).toDF("qid", "text")
      .select(col("qid"),
        graft.functions.EmbedExpressions.md5EmbedVotes(lower(trim(col("text"))), 16, dense = true)
          .as("votes"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Knn.topKBatch(corpus.select("cid", "votes"), qv, Knn.Cosine, 3,
      idCol = "cid", embCol = "votes"))

    // nprobe = cells ⇒ the index path degrades to the exact result
    val full = pairs(IvfIndex.searchIndex(spark, idx, qv, k = 3, nprobe = 8,
      idCol = "cid", embCol = "votes"))
    assert(full == exact, s"full=$full exact=$exact")

    // nprobe < cells: the index scan must carry a static cell partition
    // filter (pruning at listing), and recall stays useful
    val prunedDf = IvfIndex.searchIndex(spark, idx, qv, k = 3, nprobe = 3,
      idCol = "cid", embCol = "votes")
    val plan = prunedDf.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r.findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(pf.exists(_.contains("cell")), plan.take(2000))
    val recall = pairs(prunedDf).intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall=$recall")

    // and the streaming loop serves events from the index
    val input = MemoryStream[(Long, String)]
    val sink = Files.createTempDirectory("serve_ivf_sink").toString
    val ck = Files.createTempDirectory("serve_ivf_ck").toString
    val q = ServeStream.serveFromIndex(input.toDF().toDF("qid", "text"), corpus, idx,
      k = 3, nprobe = 8, sink, ck)
    try {
      input.addData((1L, "spark table"))
      q.processAllAvailable()
      val out = spark.read.parquet(sink)
      assert(out.count() == 3 * 3) // 1 query × 3 hits × 3 events
      assert(pairs(out.select(col("qid"), col("cid"))) == exact.filter(_._1 == 1L))
    } finally { q.stop(); corpus.unpersist() }
  }

  test("dynamic per-row-query summarizer equals the fixed-query stub") {
    import spark.implicits._
    val df = Seq((1L, "a b spark c d", "spark"), (2L, "x table y", "table"))
      .toDF("id", "text", "query")
    val dyn = Summarizer.summarizeDynamic(df, "text", "query")
      .select("id", "summary").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(dyn(1L) == Summarizer.summarizeText("a b spark c d", "spark"))
    assert(dyn(2L) == Summarizer.summarizeText("x table y", "table"))
  }
}
