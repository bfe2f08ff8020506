package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.pipeline.{Embedder, PdfPipeline}

/** The reference's blob-trigger ingest (`@BlobTrigger` on `pdfs/{name}` —
  * BlobUploadDetector/src/main/java/com/yoshio3/Function.java:71-88)
  * re-expressed as Structured Streaming over a file source: new files
  * landing in a directory are discovered per micro-batch, run through the
  * same extract→normalize→chunk→embed pipeline, and appended to the
  * vector store, with checkpointed exactly-once file tracking (the role
  * Cosmos DB status rows play in the reference).
  */
object DocStream {

  /** Source schema: one row per arriving document file. */
  val inputSchema = "doc_id long, text string, lang string, source string, n_chars long"

  /** Build the streaming pipeline: directory → chunk rows + embeddings.
    * `globFilter` mirrors the reference's extension gate
    * (`fileName.endsWith(".pdf")`, Function.java:83) at the source. */
  def pipeline(spark: SparkSession, inputDir: String,
               maxLen: Int = 7500, lookback: Int = 300, dim: Int = 64,
               globFilter: String = "*.parquet"): DataFrame = {
    val raw = spark.readStream
      .schema(inputSchema)
      .option("maxFilesPerTrigger", "16")
      .option("pathGlobFilter", globFilter)
      .parquet(inputDir)
    val chunks = PdfPipeline.chunkRows(raw, maxLen, lookback)
    Embedder.embed(chunks, textCol = "chunk", dim = dim)
      .select(
        md5(concat(col("source"), lit("_"), col("doc_id"), lit(".pdf"), lit("#"), col("chunk_idx") + 1)).as("id"),
        col("embedding"),
        col("chunk").as("origntext"),
        concat(col("source"), lit("_"), col("doc_id"), lit(".pdf")).as("filename"),
        (col("chunk_idx") + 1).cast("long").as("pagenumber"))
  }

  /** Streaming dedup: drop re-uploaded documents across micro-batches by
    * content fingerprint — `dropDuplicates` on a stream keeps seen keys
    * in the state store (the role the Cosmos status table plays for
    * re-processing avoidance in the reference).
    *
    * State note: keyed on fingerprint ALONE, state grows with the number
    * of distinct documents forever — a watermark does NOT evict here
    * (eviction requires the event-time column in the key set, or
    * `dropDuplicatesWithinWatermark`). That is the correct semantic for
    * ingest dedup ("never re-process, ever"); for bounded-window dedup
    * use `dropDuplicatesWithinWatermark(\"__fp\")` on a watermarked
    * stream instead. */
  def dedupByFingerprint(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("__fp", graft.functions.TextFunctions.fingerprint(col(textCol)))
      .dropDuplicates("__fp")
      .drop("__fp")

  /** BOUNDED-STATE streaming dedup: drop re-uploads only within the
    * watermark horizon — the state store holds a fingerprint until the
    * watermark passes its event time plus `delay`, then evicts it, so
    * state size follows the arrival rate × horizon instead of growing
    * with every distinct document forever (the [[dedupByFingerprint]]
    * trade, inverted). A duplicate arriving after eviction passes — by
    * contract: this is "collapse re-upload bursts", not "never
    * re-process"; spec pins both behaviors. */
  def dedupByFingerprintWithinWatermark(docs: DataFrame, eventTimeCol: String,
                                        delay: String,
                                        textCol: String = "text"): DataFrame =
    docs.withWatermark(eventTimeCol, delay)
      .withColumn("__fp", graft.functions.TextFunctions.fingerprint(col(textCol)))
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Streaming curation gates — the batch curation chain's stateless
    * subset, applied per arriving document: language allow-list, length
    * floor, and boilerplate-ratio filter against a BATCH-DERIVED
    * vocabulary (refresh `Curation.boilerplateNgrams` offline, hand the
    * collected set here — it is bounded by construction: at most
    * total_ngrams / minDf entries, so a driver literal is safe).
    *
    * Everything is row-local (no streaming aggregation, no watermark
    * needed): the ratio is |shingles ∩ vocab| / |shingles| via
    * array_intersect against the literal array. Matches the batch
    * `Curation.boilerplateRatio` formula on per-doc-distinct shingles. */
  def curate(docs: DataFrame, boilerplate: Seq[String], maxRatio: Double,
             minChars: Int = 0, langs: Set[String] = Set.empty,
             n: Int = 2, textCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions.wordShingles
    val langGate =
      if (langs.isEmpty) lit(true) else col("lang").isin(langs.toSeq: _*)
    val sh = wordShingles(col(textCol), n)
    val ratio = size(array_intersect(sh, typedlit(boilerplate.sorted))).cast("double") /
      greatest(size(sh), lit(1))
    docs
      .where(langGate)
      .where(length(col(textCol)) >= minChars)
      .where(round(ratio, 4) <= maxRatio)
  }

  /** Streaming INCREMENTAL dedup against the persisted LSH index
    * ([[graft.operators.DedupIndex]]): each micro-batch is (1) exact-
    * deduped within itself by content fingerprint, (2) searched against
    * the index — near-dups of anything already accepted are dropped,
    * (3) the novel remainder is written to the corpus and its band keys
    * appended to the index, so batch N+1 dedups against batch N without
    * any reprocessing of accepted text.
    *
    * Idempotence under foreachBatch's at-least-once contract: the
    * corpus write is keyed by `batch_id` with dynamic partition
    * overwrite — a replayed batch REPLACES its own partition, never
    * duplicates it. The index append is not keyed (bucketBy tables
    * cannot partition-overwrite); a replay appends duplicate band rows,
    * which is benign for correctness — candidates are `distinct`ed in
    * the search — and is reclaimed at the next [[graft.operators
    * .DedupIndex.writeIndex]] rebuild/compaction.
    *
    * Verification text for candidate ids is read back from the corpus
    * directory itself — the accepted-documents store IS the index's
    * text side. The corpus is laid out partitioned by `(batch_id,
    * id_bucket = pmod(xxhash64(doc_id), idBuckets))`, and the search is
    * told so (`idBucketCol`): each micro-batch's verification read
    * prunes to the candidate ids' buckets at the FILE LISTING — the
    * corpus is never full-scanned per trigger, regardless of its size.
    * (The replayed-batch overwrite stays correct under the nested
    * layout: the novel set is deterministic given the batch data — see
    * the replay note above — so a replay rewrites exactly the same
    * `(batch_id, id_bucket)` partitions.)
    *
    * Within-batch NEAR-dups (two similar-but-not-identical docs arriving
    * in one batch) pass: cross-batch near-dup is this stream's contract;
    * run the batch LSH pass on the accepted corpus for full closure. */
  def incrementalDedupBatch(indexTable: String, corpusDir: String,
                            threshold: Double, numBuckets: Int = 16,
                            idBuckets: Int = 16)
                           (batch: DataFrame, batchId: Long): Unit = {
    import graft.operators.DedupIndex
    val spark = batch.sparkSession
    val b = dedupByFingerprint(batch)
    // exclude this batch's OWN partition from the verification corpus: a
    // replayed batch whose previous attempt partially committed would
    // otherwise match itself and overwrite its partition with nothing.
    // (Orphan index rows from such an attempt find no verification text
    // here and drop out of the candidate join — the replay converges.)
    val corpus = try spark.read.parquet(corpusDir)
      .where(col("batch_id") =!= lit(batchId)) catch {
      case _: org.apache.spark.sql.AnalysisException => // first batch
        b.limit(0).withColumn("id_bucket", lit(0L))
    }
    val novel = DedupIndex.novel(spark, indexTable, b, corpus, threshold,
        idBucketCol = Some(("id_bucket", idBuckets)))
      .localCheckpoint(true) // feeds two sinks; don't run the search twice
    novel.withColumn("batch_id", lit(batchId))
      .withColumn("id_bucket", DedupIndex.idBucket(col("doc_id"), idBuckets))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id", "id_bucket").parquet(corpusDir)
    DedupIndex.appendIndex(novel, indexTable, numBuckets = numBuckets)
  }

  /** Start the incremental-dedup ingest stream: new document files in
    * `inputDir` → fingerprint dedup → LSH search against `indexTable` →
    * novel docs land in `corpusDir` (partitioned by batch) and the
    * index. Call [[graft.operators.DedupIndex.writeIndex]] first (on
    * the existing corpus, or an empty frame to start cold);
    * `numBuckets` must match that index's bucket count — appends to a
    * bucketed table are rejected on a spec mismatch. */
  def startIncrementalDedup(spark: SparkSession, inputDir: String,
                            corpusDir: String, checkpointDir: String,
                            indexTable: String, threshold: Double = 0.8,
                            numBuckets: Int = 16, idBuckets: Int = 16,
                            availableNow: Boolean = false): StreamingQuery = {
    val raw = spark.readStream
      .schema(inputSchema)
      .option("maxFilesPerTrigger", "16")
      .parquet(inputDir)
    val writer = raw.writeStream
      .foreachBatch(
        incrementalDedupBatch(indexTable, corpusDir, threshold, numBuckets, idBuckets) _)
      .option("checkpointLocation", checkpointDir)
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
     else writer.trigger(Trigger.ProcessingTime("10 seconds"))).start()
  }

  /** Start the ingest stream into a parquet vector store. `availableNow`
    * processes the backlog then stops (used by specs); production runs
    * with a processing-time trigger. */
  def start(spark: SparkSession, inputDir: String, outputDir: String,
            checkpointDir: String, availableNow: Boolean = false,
            trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery = {
    val writer = pipeline(spark, inputDir).writeStream
      .format("parquet")
      .option("path", outputDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
     else writer.trigger(trigger)).start()
  }
}
