package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.operators.{IvfIndex, Quantize}

/** Streaming ingest into a quantized IVF vector store — the serving-side
  * loop that keeps an IVF-SQ index current as new embeddings arrive:
  * each micro-batch is assigned to cells and encoded UNDER THE SIDECAR
  * model/range (so appended rows are scan-compatible with the initial
  * build), and written with dynamic partition overwrite keyed by
  * `batch_id` — a replayed batch (restart after a crash between write
  * and checkpoint commit) OVERWRITES its own partitions instead of
  * duplicating vectors, the same exactly-once recipe as
  * `DocStream.startIncrementalDedup`.
  *
  * Store layout: `batch_id=N/cell=C/` two-level partitions.
  * `IvfIndex.searchIndexQuantized` works unchanged — partition discovery
  * surfaces both columns, the static `cell IN` filter prunes at the cell
  * level across every batch directory, and the projection drops
  * `batch_id`. Centroid drift under a shifting distribution is the
  * usual `needsRebuild` maintenance trigger. */
object VectorStream {

  val inputSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** Create the store: sidecars + the existing corpus as `batch_id=-1`
    * (same layout as streamed batches, so the directory scheme is
    * uniform from the first file). `corpus` may be empty (cold start). */
  def initQuantizedStore(corpus: DataFrame, model: IvfIndex.Model, path: String,
                         mn: Double, mx: Double): Unit = {
    writeBatch(corpus, model, path, mn, mx, batchId = -1L, overwriteAll = true)
    val json = model.centroids.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    writeSidecarVia(corpus.sparkSession, path, "_centroids.json", json)
    writeSidecarVia(corpus.sparkSession, path, "_quantize.json", s"""{"mn":$mn,"mx":$mx}""")
  }

  private def writeBatch(vecs: DataFrame, model: IvfIndex.Model, path: String,
                         mn: Double, mx: Double, batchId: Long,
                         overwriteAll: Boolean = false): Unit = {
    val w = vecs.select(col("vec_id"), col("embedding"),
        Quantize.quantizeExpr(col("embedding"), mn, mx).as("qvec"),
        IvfIndex.cellOf(col("embedding"), model).as("cell"))
      .withColumn("batch_id", lit(batchId))
      .repartition(col("cell"))
      .write.mode("overwrite")
      .partitionBy("batch_id", "cell")
    (if (overwriteAll) w else w.option("partitionOverwriteMode", "dynamic"))
      .parquet(path)
  }

  /** foreachBatch body — public so specs can drive replay directly. */
  def quantizedIngestBatch(indexPath: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val model = IvfIndex.readModel(spark, indexPath)
    val (mn, mx) = IvfIndex.readQuantRange(spark, indexPath)
    writeBatch(batch, model, indexPath, mn, mx, batchId)
  }

  /** Start the ingest stream: new embedding files in `inputDir` append
    * into the quantized store at `indexPath` (created by
    * [[initQuantizedStore]]). Searches see each batch as soon as its
    * write commits. */
  def startQuantizedIngest(spark: SparkSession, inputDir: String, indexPath: String,
                           checkpointDir: String,
                           availableNow: Boolean = false): StreamingQuery = {
    val raw = spark.readStream
      .schema(inputSchema)
      .option("maxFilesPerTrigger", "16")
      .parquet(inputDir)
    val writer = raw.writeStream
      .foreachBatch(quantizedIngestBatch(indexPath) _)
      .option("checkpointLocation", checkpointDir)
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
     else writer.trigger(Trigger.ProcessingTime("10 seconds"))).start()
  }

  private def writeSidecarVia(spark: SparkSession, path: String, name: String,
                              content: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }
}
