package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.{EmbedExpressions, PromptFunctions, VectorExpressions}
import graft.operators.{IvfIndex, Knn}
import graft.pipeline.Summarizer

/** The reference's SSE serving loop as a STREAM: user queries arrive
  * continuously (the `openaiGpt4Sse` POST endpoint,
  * PDF-Summarizer/src/main/java/com/yoshio3/SSEOpenAIController.java:137-148),
  * each is embedded, searched against the static chunk corpus, and every
  * hit emits the create → createLink → addMessage event sequence with a
  * per-hit summary.
  *
  * Implemented as `foreachBatch` + the batch serving plan: per-query
  * top-k needs a rank window, which no streaming operator computes
  * incrementally, so each micro-batch runs `Knn.topKBatch` (corpus
  * static and never shuffled; the scored exchange is (corpus × batch
  * queries) pre-projected to ids) — the standard
  * stream-against-static-retrieval pattern. The summary stage uses the
  * batched per-row-query call shape ([[Summarizer.summarizeDynamic]]),
  * i.e. exactly what a live chat endpoint would see.
  */
object ServeStream {

  /** Corpus side: (cid, chunk, filename, pagenumber, id, url, votes) —
    * precompute once, reuse across micro-batches. */
  def corpusIndex(chunks: DataFrame): DataFrame = {
    val (fileName, page, chunkId) = graft.pipeline.PdfPipeline.chunkIdCols()
    chunks.select(col("doc_id"), col("source"), col("chunk_idx"), col("chunk"),
        graft.pipeline.PdfPipeline.chunkCid().as("cid"))
      .select(col("cid"), col("chunk"),
        fileName.as("filename"), page.as("pagenumber"), chunkId.as("id"),
        PromptFunctions.blobPageUrl(lit("documentsearch1"), lit("pdfs"), fileName, page).as("url"),
        EmbedExpressions.md5EmbedVotes(lower(trim(col("chunk"))), 16, dense = true).as("votes"))
  }

  /** Start the serving stream: `queries` is a streaming frame with
    * (qid: long, text: string); events land in `sinkPath` as parquet
    * partitioned by micro-batch — (qid, cid, rn, ev_seq, payload,
    * batch_id).
    *
    * Exactly-once sink: foreachBatch is at-least-once on recovery, so
    * each batch dynamically OVERWRITES its own `batch_id=` partition —
    * a replayed batch replaces its previous (possibly partial) output
    * instead of appending duplicates.
    *
    * `corpus` (from [[corpusIndex]]) is scanned once per micro-batch;
    * the caller owns its lifecycle — `.cache()` it for a long-lived
    * stream (serve() deliberately does not, so stopping one query can't
    * leak pinned storage). */
  def serve(queries: DataFrame, corpus: DataFrame, k: Int,
            sinkPath: String, checkpoint: String,
            trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery = {
    queries.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val q = embedQueries(batch)
          val hits = Knn.topKBatch(
            corpus.select(col("cid"), col("votes")), q,
            Knn.Cosine, k, idCol = "cid", embCol = "votes")
          emitEvents(q, hits, corpus, sinkPath, batchId)
        }
      }
      .start()
  }

  /** Train + persist the IVF index over a [[corpusIndex]] frame — the
    * offline half of [[serveFromIndex]]. Rebuild when the corpus grows
    * enough to unbalance cells (the standard IVF maintenance cadence). */
  def buildServeIndex(corpus: DataFrame, path: String, cells: Int = 16,
                      iters: Int = 3, samplePercent: Int = 100): Unit = {
    val model = IvfIndex.train(corpus, cells, iters,
      idCol = "cid", embCol = "votes", samplePercent = samplePercent)
    IvfIndex.writeIndex(corpus, model, path, idCol = "cid", embCol = "votes")
  }

  /** The serving stream against a PERSISTED IVF index
    * ([[buildServeIndex]]) instead of an exact per-batch scan: each
    * micro-batch embeds its queries, probes the `nprobe` nearest cells
    * (a STATIC `cell IN` partition filter — only the probed fraction of
    * the index is ever read, so per-trigger cost is sublinear in corpus
    * size), and exact-reranks within the probed cells. `corpus` (from
    * [[corpusIndex]]) supplies the chunk text/metadata for the hit ids —
    * a candidate-bounded join, not a scan driver. The approximation is
    * IVF's usual recall-for-cost trade; `nprobe = cells` degrades to the
    * exact result. */
  def serveFromIndex(queries: DataFrame, corpus: DataFrame, indexPath: String,
                     k: Int, nprobe: Int, sinkPath: String, checkpoint: String,
                     trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery = {
    queries.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val q = embedQueries(batch)
          val hits = IvfIndex.searchIndex(batch.sparkSession, indexPath, q,
            k, nprobe, idCol = "cid", embCol = "votes", queryIdCol = "qid")
          emitEvents(q, hits, corpus, sinkPath, batchId)
        }
      }
      .start()
  }

  private def embedQueries(batch: DataFrame): DataFrame =
    batch.select(col("qid"), col("text"),
      EmbedExpressions.md5EmbedVotes(lower(trim(col("text"))), 16, dense = true).as("votes"))

  /** Shared serve tail: enrich hit ids with chunk metadata, summarize
    * per hit, emit the create → createLink → addMessage event rows into
    * the batch's own (idempotently overwritten) sink partition. */
  private def emitEvents(q: DataFrame, hits: DataFrame, corpus: DataFrame,
                         sinkPath: String, batchId: Long): Unit = {
    val enriched = hits
      .join(corpus.drop("votes"), "cid")
      .join(broadcast(q.select(col("qid"), col("text"))), "qid")
    val summarized = Summarizer.summarizeDynamic(enriched, "chunk", "text")
    Summarizer.serveEvents(summarized)
      .select(col("qid"), col("cid"), col("rn"), col("ev_seq"), col("payload"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(sinkPath)
  }
}
