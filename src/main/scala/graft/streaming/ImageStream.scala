package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.multimodal.BinaryPipeline

/** Streaming IMAGE ingest — the multimodal twin of [[VectorStream]]:
  * new image files landing in a directory are decoded FOR REAL per
  * micro-batch — the format-SNIFFED dispatch, so one stream ingests a
  * mixed PNG/JPEG/GIF/TIFF corpus into one feature space (round 15) —
  * and their grid-pooled tile features + true geometry appended to a
  * feature store, ready for the KNN/ANN serve tier. Mirrors the
  * reference's blob trigger (Function.java:71-88) with image payloads
  * in place of PDFs.
  *
  * Replay idempotence (the [[VectorStream]] convention): each batch
  * writes under its own `batch_id=` partition with dynamic partition
  * overwrite, so a replayed batch — restart after a crash between write
  * and checkpoint commit — overwrites its own partition instead of
  * doubling rows. A non-image payload fails its batch LOUD before the
  * write (the sniffed dispatch's contract), leaving the store untouched
  * and the checkpoint unadvanced — poison inputs never half-commit.
  *
  * Grid defaults FOLLOW [[BinaryPipeline.imageTileFeatures]]' — a
  * streamed batch must produce vectors the same shape as a batch build
  * of the same store, or cosine KNN over the mixed store breaks on
  * dimension mismatch with no error at ingest time. */
object ImageStream {

  /** Source schema: one row per arriving image. */
  val inputSchema = "doc_id long, content binary"

  /** foreachBatch body — public so specs can drive replay directly. */
  def featuresBatch(storePath: String, gx: Int = 4, gy: Int = 4)
                   (batch: DataFrame, batchId: Long): Unit = {
    BinaryPipeline.imageTileFeatures(batch, gx, gy)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(storePath)
  }

  /** Start the ingest stream: image files in `inputDir` → decoded tile
    * features appended to `storePath`. `AvailableNow` drains the
    * backlog and stops (the batch-test / catch-up mode); the default
    * trigger polls like the reference's blob listener. */
  def start(spark: SparkSession, inputDir: String, storePath: String,
            checkpointDir: String, availableNow: Boolean = false,
            gx: Int = 4, gy: Int = 4): StreamingQuery =
    IngestScaffold.start(spark, inputDir,
      org.apache.spark.sql.types.StructType.fromDDL(inputSchema),
      featuresBatch(storePath, gx, gy) _, checkpointDir, availableNow)
}
