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
