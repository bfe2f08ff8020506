package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.pipeline.ArchivePipeline

/** Streaming archive ingest (round 20) — the dump edge of the ingest
  * family ([[WarcStream]]/[[ImageStream]]): ZIP / TAR / .tar.gz blobs
  * landing in a directory are walked FOR REAL per micro-batch — EOCD +
  * central-directory (and ZIP64) walks with per-entry CRC-32
  * verification, USTAR header checksums, the strict CRC/ISIZE gunzip
  * for .tar.gz — and the extracted member rows appended to a store,
  * ready for the per-file decode stages. Mirrors the reference's blob
  * trigger (Function.java:71-88) with corpus dumps in place of PDFs.
  *
  * Replay idempotence (the family convention): each batch writes its
  * own `batch_id=` partition under dynamic partition overwrite, so a
  * replayed batch overwrites itself instead of doubling rows. A
  * corrupt entry (CRC/checksum mismatch) fails its batch LOUD before
  * the write — poison inputs never half-commit. */
object ArchiveStream {

  /** Source schema: one row per arriving archive blob. */
  val inputSchema = "doc_id long, content binary"

  /** foreachBatch body — public so specs can drive replay directly. */
  def extractBatch(storePath: String)(batch: DataFrame, batchId: Long): Unit = {
    ArchivePipeline.extractArchives(batch)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(storePath)
  }

  /** Start the ingest stream: archive blobs in `inputDir` → extracted
    * member rows appended to `storePath`. */
  def start(spark: SparkSession, inputDir: String, storePath: String,
            checkpointDir: String, availableNow: Boolean = false): StreamingQuery =
    IngestScaffold.start(spark, inputDir,
      org.apache.spark.sql.types.StructType.fromDDL(inputSchema),
      extractBatch(storePath) _, checkpointDir, availableNow)
}
