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

  /** Shared (vec_id, embedding, derived…, cell) batch write — the
    * batch_id/cell layout and the replay-idempotent dynamic partition
    * overwrite live here once, for the same reason as
    * [[startIngestStream]]. */
  private def writeDerivedBatch(vecs: DataFrame,
                                derived: Seq[org.apache.spark.sql.Column],
                                path: String, batchId: Long,
                                overwriteAll: Boolean): Unit = {
    val w = vecs.select(Seq(col("vec_id"), col("embedding")) ++ derived: _*)
      .withColumn("batch_id", lit(batchId))
      .repartition(col("cell"))
      .write.mode("overwrite")
      .partitionBy("batch_id", "cell")
    (if (overwriteAll) w else w.option("partitionOverwriteMode", "dynamic"))
      .parquet(path)
  }

  private def writeBatch(vecs: DataFrame, model: IvfIndex.Model, path: String,
                         mn: Double, mx: Double, batchId: Long,
                         overwriteAll: Boolean = false): Unit =
    writeDerivedBatch(vecs, Seq(
      Quantize.quantizeExpr(col("embedding"), mn, mx).as("qvec"),
      IvfIndex.cellOf(col("embedding"), model).as("cell")), path, batchId, overwriteAll)

  /** foreachBatch body — public so specs can drive replay directly. */
  def quantizedIngestBatch(indexPath: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val model = IvfIndex.readModel(spark, indexPath)
    val (mn, mx) = IvfIndex.readQuantRange(spark, indexPath)
    writeBatch(batch, model, indexPath, mn, mx, batchId)
  }

  /** Shared file-source → foreachBatch → checkpointed-trigger scaffold
    * of every ingest stream here — one definition so a fix to the
    * trigger cadence, file batching, or checkpointing cannot miss a
    * twin. */
  private def startIngestStream(spark: SparkSession, inputDir: String,
                                body: (DataFrame, Long) => Unit,
                                checkpointDir: String,
                                availableNow: Boolean): StreamingQuery =
    IngestScaffold.start(spark, inputDir, inputSchema, body, checkpointDir, availableNow)

  /** Start the ingest stream: new embedding files in `inputDir` append
    * into the quantized store at `indexPath` (created by
    * [[initQuantizedStore]]). Searches see each batch as soon as its
    * write commits. */
  def startQuantizedIngest(spark: SparkSession, inputDir: String, indexPath: String,
                           checkpointDir: String,
                           availableNow: Boolean = false): StreamingQuery =
    startIngestStream(spark, inputDir, quantizedIngestBatch(indexPath) _,
      checkpointDir, availableNow)

  /** Create a streaming MATRYOSHKA store: the [[initQuantizedStore]]
    * layout (batch_id=-1 corpus + sidecars) with the prefix `sub`
    * column instead of integer codes — searches go through
    * [[graft.operators.IvfIndex.searchIndexSub]] unchanged (cell is the
    * second-level partition, so `cell IN` pruning survives the
    * batch_id layer). `model` must be subDim-dimensional (trainSub). */
  def initSubStore(corpus: DataFrame, model: IvfIndex.Model, path: String,
                   subDim: Int): Unit = {
    require(model.centroids.headOption.forall(_.length == subDim),
      s"initSubStore: model dim ${model.centroids.headOption.map(_.length)} != subDim $subDim")
    writeBatchSub(corpus, model, path, subDim, batchId = -1L, overwriteAll = true)
    val json = model.centroids.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    writeSidecarVia(corpus.sparkSession, path, "_centroids.json", json)
    writeSidecarVia(corpus.sparkSession, path, "_matryoshka.json", s"""{"subDim":$subDim}""")
  }

  private def writeBatchSub(vecs: DataFrame, model: IvfIndex.Model, path: String,
                            subDim: Int, batchId: Long,
                            overwriteAll: Boolean = false): Unit = {
    val sub = slice(col("embedding"), 1, subDim)
    writeDerivedBatch(vecs, Seq(sub.as("sub"),
      IvfIndex.cellOf(sub, model).as("cell")), path, batchId, overwriteAll)
  }

  /** foreachBatch body for Matryoshka ingest — replay-idempotent via the
    * dynamic batch_id partition overwrite, like [[quantizedIngestBatch]]. */
  def subIngestBatch(indexPath: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val model = IvfIndex.readModel(spark, indexPath)
    val subDim = IvfIndex.readSubDim(spark, indexPath)
    writeBatchSub(batch, model, indexPath, subDim, batchId)
  }

  /** Start the Matryoshka ingest stream: new embedding files in
    * `inputDir` append into the sub store at `indexPath` (created by
    * [[initSubStore]]). */
  def startSubIngest(spark: SparkSession, inputDir: String, indexPath: String,
                     checkpointDir: String,
                     availableNow: Boolean = false): StreamingQuery =
    startIngestStream(spark, inputDir, subIngestBatch(indexPath) _,
      checkpointDir, availableNow)

  /** foreachBatch body for STREAMING SEMANTIC DEDUP — SemDeDup in the
    * ingest stream: a micro-batch is first deduped against ITSELF
    * (cell-blocked cosine pairs under the store's own sidecar quantizer,
    * [[graft.operators.Dedup.semanticDedup]]), then against the STORE
    * (each batch vector probes its `nprobe` nearest cells; store rows in
    * those cells are cosine-checked against the BROADCAST batch — the
    * corpus never shuffles and never leaves its partitions), and only
    * semantic novelties are appended. Batch N+1 therefore dedups against
    * batch N's survivors.
    *
    * Replay convergence (same recipe as `DocStream.incrementalDedupBatch`):
    * the store read EXCLUDES this batch's own `batch_id` partition — a
    * crash-replayed batch would otherwise match its own partial commit
    * and append nothing — and the write is dynamic partition overwrite
    * keyed by batch_id, so the replay overwrites itself. Identical
    * vectors can never split across cells (same argument as batch
    * SemDeDup), so exact duplicates are always caught; near-dups the
    * quantizer separates beyond nprobe cells are the accepted recall
    * trade. */
  def semanticDedupBatch(indexPath: String, threshold: Double, nprobe: Int = 4,
                         maxCell: Int = 10000, scale: Int = 4)
                        (batch: DataFrame, batchId: Long): Unit = {
    import graft.functions.VectorFunctions
    val spark = batch.sparkSession
    val model = IvfIndex.readModel(spark, indexPath)
    val (mn, mx) = IvfIndex.readQuantRange(spark, indexPath)
    val b = graft.operators.Dedup.semanticDedup(batch, model, threshold, maxCell = maxCell)
    val store =
      try Some(spark.read.parquet(indexPath)
        .where(col("batch_id") =!= lit(batchId))
        .select(col("vec_id").as("__sid"), col("embedding").as("__semb"), col("cell")))
      catch { case _: org.apache.spark.sql.AnalysisException => None } // cold store
    val survivors = store.fold(b) { s =>
      val probes = b.select(col("vec_id"), col("embedding"),
        explode(IvfIndex.cellsOf(col("embedding"), model, nprobe)).as("cell"))
      val dups = s.join(broadcast(probes), Seq("cell"))
        .where(round(VectorFunctions.cosineSimilarity(col("__semb"), col("embedding")),
          scale) >= threshold)
        .select(col("vec_id")).distinct()
      b.join(dups, Seq("vec_id"), "left_anti")
    }
    writeBatch(survivors, model, indexPath, mn, mx, batchId)
  }

  /** Start the semantic-dedup ingest stream over a store created by
    * [[initQuantizedStore]]: new embedding files in `inputDir` →
    * within-batch SemDeDup → cell-probed cosine check against the store
    * → novelties appended (searchable immediately, and the dedup corpus
    * for every later batch). */
  def startSemanticDedup(spark: SparkSession, inputDir: String, indexPath: String,
                         checkpointDir: String, threshold: Double,
                         nprobe: Int = 4, availableNow: Boolean = false): StreamingQuery =
    startIngestStream(spark, inputDir,
      semanticDedupBatch(indexPath, threshold, nprobe) _, checkpointDir, availableNow)

  private def writeSidecarVia(spark: SparkSession, path: String, name: String,
                              content: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }
}
