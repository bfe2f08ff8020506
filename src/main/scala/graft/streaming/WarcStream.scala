package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.pipeline.WarcPipeline

/** Streaming WARC crawl ingest (round 19) — the crawl edge of the
  * ingest family ([[ImageStream]]/[[VectorStream]]): `.warc(.gz)`
  * blobs landing in a directory are walked FOR REAL per micro-batch —
  * record framing, per-member gzip with CRC/ISIZE verification,
  * HTTP splitting, payload-digest checks, HTML→text extraction — and
  * the extracted response rows appended to a document store, ready
  * for the dedup/quality/tokenize stages. Mirrors the reference's
  * blob trigger (Function.java:71-88) with crawl payloads in place of
  * PDFs.
  *
  * Replay idempotence (the family convention): each batch writes its
  * own `batch_id=` partition under dynamic partition overwrite, so a
  * replayed batch overwrites itself instead of doubling rows. A
  * corrupt member or digest mismatch fails its batch LOUD before the
  * write — poison inputs never half-commit. */
object WarcStream {

  /** Source schema: one row per arriving WARC file. */
  val inputSchema = "doc_id long, content binary"

  /** foreachBatch body — public so specs can drive replay directly. */
  def extractBatch(storePath: String)(batch: DataFrame, batchId: Long): Unit = {
    WarcPipeline.extractWarcs(batch)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(storePath)
  }

  /** Start the ingest stream: WARC files in `inputDir` → extracted
    * response rows appended to `storePath`. */
  def start(spark: SparkSession, inputDir: String, storePath: String,
            checkpointDir: String, availableNow: Boolean = false): StreamingQuery =
    IngestScaffold.start(spark, inputDir,
      org.apache.spark.sql.types.StructType.fromDDL(inputSchema),
      extractBatch(storePath) _, checkpointDir, availableNow)
}
