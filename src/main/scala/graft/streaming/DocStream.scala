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

  /** Start the ingest stream into a parquet vector store. `availableNow`
    * processes the backlog then stops (used by specs); production runs
    * with a processing-time trigger. */
  def start(spark: SparkSession, inputDir: String, outputDir: String,
            checkpointDir: String, availableNow: Boolean = false): StreamingQuery = {
    val writer = pipeline(spark, inputDir).writeStream
      .format("parquet")
      .option("path", outputDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
     else writer.trigger(Trigger.ProcessingTime("10 seconds"))).start()
  }
}
