package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3

/** Embedding generation stage — the Spark re-expression of the reference's
  * per-chunk `client.getEmbeddings("text-embedding-ada-002", …)` call
  * (BlobUploadDetector/src/main/java/com/yoshio3/Function.java:181-210).
  *
  * The model call goes through the pluggable [[EmbeddingClient]] seam:
  * the default [[DeterministicClient]] is a hashing-trick embedding
  * (token buckets + L2 normalize) so every oracle gate replays offline;
  * a deployment passes [[OpenAiCompatClient]] — the swap changes no
  * plan (spec-asserted in ModelClientSpec). The Spark plumbing is the
  * real thing either way:
  * batched `mapPartitions` (one "API request" per `batchSize` texts — the
  * pattern a live endpoint needs, vs. the reference's one-call-per-chunk
  * with a sleep), retry hook, no shuffle, output column typed
  * `array<float>` to match the corpus embedding schema.
  */
object Embedder {

  /** Deterministic stand-in for the embedding model: bag-of-tokens hashing
    * trick into `dim` buckets, L2-normalized. */
  def embedText(text: String, dim: Int): Array[Float] = {
    val v = new Array[Float](dim)
    var i = 0
    // Locale.ROOT: default-locale lowercasing (e.g. tr_TR dotless-i)
    // would make the embedding JVM-locale-dependent
    val tokens = text.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    while (i < tokens.length) {
      val h = MurmurHash3.stringHash(tokens(i))
      val b = ((h % dim) + dim) % dim
      v(b) += (if ((h & 1) == 0) 1f else -1f)
      i += 1
    }
    val n = math.sqrt(v.map(x => x.toDouble * x).sum)
    if (n > 0) v.map(x => (x / n).toFloat) else v
  }

  /** Model invocation for one batch through the pluggable client seam
    * ([[EmbeddingClient]]) — the default [[DeterministicClient]] is the
    * offline stub; a deployment passes [[OpenAiCompatClient]]. The
    * retry loop lives HERE (engine-side), mirroring
    * Function.java:186-208's catch-sleep-retry, so every client gets
    * the same failure semantics. */
  def invokeModel(batch: Seq[String], dim: Int, maxRetries: Int = 3,
                  client: EmbeddingClient = DeterministicClient): Seq[Array[Float]] = {
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt < maxRetries) {
      try {
        val out = client.embedBatch(batch, dim)
        require(out.length == batch.length,
          s"EmbeddingClient returned ${out.length} vectors for ${batch.length} texts")
        return out
      } catch {
        // task cancellation (kill / speculation) must propagate, not retry
        case ie: InterruptedException => Thread.currentThread().interrupt(); throw ie
        case e: Exception =>
          lastErr = e
          attempt += 1
          // linear backoff — hammering a live endpoint back-to-back is
          // what the reference's sleep avoided (Function.java:195-199)
          if (attempt < maxRetries) Thread.sleep(50L * attempt)
      }
    }
    // zero-vector degradation is the documented contract (a poisoned
    // batch must not kill a 100 TB job), but it must never be SILENT —
    // an operator reading executor logs sees exactly what was lost
    System.err.println(s"[graft.Embedder] batch of ${batch.length} texts degraded to " +
      s"zero vectors after $maxRetries failed attempts: ${lastErr}")
    batch.map(_ => new Array[Float](dim))
  }

  /** Append an `embedding array<float>` column. Narrow, batched.
    * `usageTokens` (optional accumulator) tallies whitespace tokens sent
    * to the "model" — the reference logs prompt-token usage per call
    * (Function.java:192-194); an accumulator is the distributed
    * equivalent. NOTE: updated inside a transformation, so task retries /
    * speculative duplicates can over-count — treat as telemetry (an upper
    * bound), not billing-grade accounting. */
  def embed(df: DataFrame, textCol: String = "chunk", dim: Int = 64,
            batchSize: Int = 32, outCol: String = "embedding",
            usageTokens: Option[org.apache.spark.util.LongAccumulator] = None,
            client: EmbeddingClient = DeterministicClient): DataFrame = {
    val spark = df.sparkSession
    val schema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+ org.apache.spark.sql.types.StructField(outCol,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, false)))
    val textIdx = df.schema.fieldIndex(textCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val texts = batch.map(r => Option(r.getString(textIdx)).getOrElse(""))
        usageTokens.foreach(acc =>
          acc.add(texts.map(t => t.split("\\s+").count(_.nonEmpty).toLong).sum))
        val embs = invokeModel(texts, dim, client = client)
        batch.iterator.zip(embs.iterator).map { case (r, e) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ e.toSeq)
        }
      }
    }(enc)
  }

  /** Sum-pool chunk embeddings to parent-document vectors — the
    * chunk→document aggregation a doc-level retrieval index needs on top
    * of the reference's per-chunk store. Exploded form: one
    * map-side-combined groupBy on (doc, dim); sums run in DECIMAL so the
    * pool is order-independent exact (sum-pool ∝ mean-pool at fixed
    * chunk count; L2 normalization downstream cancels the factor
    * anyway, and a float mean would not hash-gate cross-engine). */
  def poolToDocuments(chunks: DataFrame, docCol: String,
                      embCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.functions._
    chunks
      .select(col(docCol), posexplode(col(embCol)).as(Seq("dim", "__v")))
      .groupBy(col(docCol), col("dim"))
      // round the DOUBLE value before decimal-izing: float→decimal cast
      // paths differ between engines at 1 ulp (shortest-repr vs widened),
      // while round(double, 6) is the same half-up on the same double
      .agg(sum(round(col("__v").cast("double"), 6).cast("decimal(18,6)")).as("pooled"))
  }

  /** [[poolToDocuments]] re-assembled to one vector row per document
    * (`array<double>`, dim-ordered). */
  def pooledVectors(chunks: DataFrame, docCol: String,
                    embCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.functions._
    poolToDocuments(chunks, docCol, embCol)
      .groupBy(col(docCol))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("pooled")))),
        x => x.getField("pooled").cast("double")).as(embCol))
  }
}
