package graft

import org.apache.spark.sql.functions._
import graft.pipeline._

/** Counts batches and fails the first `failFirst` calls — exercises the
  * engine-side retry loop with a client that is equivalent to the
  * deterministic one once it succeeds. Top-level (not spec-inner) so the
  * task closure doesn't capture the non-serializable suite. NOTE: Spark
  * serializes a COPY per task, so the counter is per-task state — exactly
  * what the retry semantics operate on. */
private class FlakyEmbeddingClient(failFirst: Int) extends EmbeddingClient {
  private var calls = 0
  override def embedBatch(texts: Seq[String], dim: Int): Seq[Array[Float]] = {
    calls += 1
    if (calls <= failFirst) throw new RuntimeException("simulated transport failure")
    DeterministicClient.embedBatch(texts, dim)
  }
}

private class FlakyChatClient(failFirst: Int) extends ChatClient {
  private var calls = 0
  override def completeBatch(pairs: Seq[(String, String)], ctx: Int, maxLen: Int): Seq[String] = {
    calls += 1
    if (calls <= failFirst) throw new RuntimeException("simulated transport failure")
    DeterministicClient.completeBatch(pairs, ctx, maxLen)
  }
}

/** Returns one vector too few — a misbehaving client the engine must
  * refuse to zip against the batch (silent misalignment would attach
  * embeddings to the wrong rows). */
private class TruncatingEmbeddingClient extends EmbeddingClient {
  override def embedBatch(texts: Seq[String], dim: Int): Seq[Array[Float]] =
    DeterministicClient.embedBatch(texts.drop(1), dim)
}

/** The pluggable model-client seam (VERDICT r8 #5): the pipeline must be
  * client-agnostic — swapping the embedding/chat client changes neither
  * results (for an equivalent client) nor the Spark plan, and the
  * engine-side retry loop gives every client the reference's
  * catch-sleep-retry failure semantics (Function.java:186-208,
  * SSEOpenAIController.java:176-181). */
class ModelClientSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sfDir).limit(40)

  test("embed: client swap changes neither the result nor the plan shape") {
    val a = Embedder.embed(docs, textCol = "text", dim = 16)
    val b = Embedder.embed(docs, textCol = "text", dim = 16,
      client = new FlakyEmbeddingClient(0))
    // the client lives inside the task closure — invisible to Catalyst
    assert(a.queryExecution.optimizedPlan.getClass ==
      b.queryExecution.optimizedPlan.getClass)
    assert(a.schema == b.schema)
    val ra = a.select(col("doc_id"), col("embedding")).collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1)).toMap
    val rb = b.select(col("doc_id"), col("embedding")).collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(ra == rb)
  }

  test("embed: transient client failures are retried engine-side") {
    val flaky = new FlakyEmbeddingClient(failFirst = 1)
    val out = Embedder.embed(docs.coalesce(1), textCol = "text", dim = 16,
      client = flaky).select("embedding").collect()
    assert(out.length == 40)
    // first attempt failed, retry succeeded — vectors are the real ones
    assert(out.exists(_.getSeq[Float](0).exists(_ != 0f)))
  }

  test("embed: a client that fails all retries degrades to zero vectors, not an abort") {
    val dead = new FlakyEmbeddingClient(failFirst = Int.MaxValue)
    val out = Embedder.embed(docs.coalesce(1), textCol = "text", dim = 8, client = dead)
      .select("embedding").collect()
    assert(out.length == 40)
    assert(out.forall(_.getSeq[Float](0).forall(_ == 0f)))
  }

  test("summarize: client swap is result-invariant and matches the column oracle formula") {
    val q = "the"
    val a = Summarizer.summarize(docs, textCol = "text", query = q)
    val b = Summarizer.summarize(docs, textCol = "text", query = q,
      client = new FlakyChatClient(0))
    assert(a.schema == b.schema)
    val ra = a.select("doc_id", "summary").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rb = b.select("doc_id", "summary").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ra == rb)
    val c = docs.select(col("doc_id"),
      Summarizer.extractiveSummary(col("text"), q).as("summary"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ra == c)
  }

  test("chat retry: flaky client converges to the deterministic result") {
    val flaky = new FlakyChatClient(failFirst = 2) // 2 failures < 3 retries
    val out = Summarizer.summarize(docs.coalesce(1).limit(8), textCol = "text",
      query = "the", client = flaky).select("summary").collect().map(_.getString(0))
    val ref = Summarizer.summarize(docs.coalesce(1).limit(8), textCol = "text",
      query = "the").select("summary").collect().map(_.getString(0))
    assert(out.toSeq == ref.toSeq)
  }

  test("client misbehavior (wrong batch size) is refused, not silently misaligned") {
    // every retry sees the same misalignment -> the require inside
    // invokeModel rejects it each time -> zero-vector degradation
    val out = Embedder.embed(docs.coalesce(1).limit(4), textCol = "text", dim = 8,
      client = new TruncatingEmbeddingClient).select("embedding").collect()
    assert(out.forall(_.getSeq[Float](0).forall(_ == 0f)))
  }

  test("OpenAiCompatClient is constructible and serializable (offline: no I/O)") {
    val c = new OpenAiCompatClient("https://example.invalid/v1", "test-key")
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(c) // must not drag the non-serializable HttpClient along
    oos.close()
    val in = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    assert(in.readObject().isInstanceOf[OpenAiCompatClient])
  }

  test("embeddings response parse honors the index field (out-of-order data)") {
    // the JSON contract carries "index" because order is NOT promised —
    // entries arriving out of order must reattach to the right rows
    val resp =
      """{"object":"list","data":[
        |{"object":"embedding","index":1,"embedding":[1.0,1.5]},
        |{"embedding":[0.0,0.5],"index":0},
        |{"object":"embedding","index":2,"embedding":[2.0,2.5]}],
        |"model":"m","usage":{"prompt_tokens":3}}""".stripMargin
    val vs = OpenAiCompatClient.parseEmbeddingsResponse(resp, 3, 2)
    assert(vs.map(_.toSeq) == Seq(Seq(0.0f, 0.5f), Seq(1.0f, 1.5f), Seq(2.0f, 2.5f)))
    // no index fields → document order (lenient fallback)
    val bare = """{"data":[{"embedding":[9.0]},{"embedding":[8.0]}]}"""
    assert(OpenAiCompatClient.parseEmbeddingsResponse(bare, 2, 1)
      .map(_.toSeq) == Seq(Seq(9.0f), Seq(8.0f)))
    // wrong count still refused
    val e = intercept[IllegalArgumentException](
      OpenAiCompatClient.parseEmbeddingsResponse(bare, 3, 1))
    assert(e.getMessage.contains("expected 3"))
    // wrong dim still refused
    val e2 = intercept[IllegalArgumentException](
      OpenAiCompatClient.parseEmbeddingsResponse(bare, 2, 4))
    assert(e2.getMessage.contains("dim"))
  }

  test("a stray index key outside the data entries cannot desync the reorder") {
    // per-object pairing (ADVICE r10): an extra "index" in the usage
    // block used to make the flat global passes count 4 indices for 3
    // embeddings and silently fall back to document order — the
    // mis-ordering hazard the index field exists to close
    val resp =
      """{"object":"list","data":[
        |{"object":"embedding","index":1,"embedding":[1.0,1.5]},
        |{"embedding":[0.0,0.5],"index":0},
        |{"object":"embedding","index":2,"embedding":[2.0,2.5]}],
        |"model":"m","usage":{"prompt_tokens":3,"index":7}}""".stripMargin
    val vs = OpenAiCompatClient.parseEmbeddingsResponse(resp, 3, 2)
    assert(vs.map(_.toSeq) == Seq(Seq(0.0f, 0.5f), Seq(1.0f, 1.5f), Seq(2.0f, 2.5f)))
  }

  test("indices present but unusable fail loud instead of guessing an order") {
    // duplicate index inside the data array: not a permutation — the
    // provider broke the contract, and document order would be a guess
    val dup =
      """{"data":[{"index":0,"embedding":[1.0]},{"index":0,"embedding":[2.0]}]}"""
    val e = intercept[IllegalArgumentException](
      OpenAiCompatClient.parseEmbeddingsResponse(dup, 2, 1))
    assert(e.getMessage.contains("unusable index"), e.getMessage)
    // partial indices (one entry missing its index) likewise
    val partial =
      """{"data":[{"index":1,"embedding":[1.0]},{"embedding":[2.0]}]}"""
    val e2 = intercept[IllegalArgumentException](
      OpenAiCompatClient.parseEmbeddingsResponse(partial, 2, 1))
    assert(e2.getMessage.contains("unusable index"), e2.getMessage)
  }

  // ───────────────────────────── learned-sparse featurizer seam (r14)

  test("sparse seam: spladeExpandWith(DeterministicSparseClient) == spladeExpand row-for-row") {
    import graft.operators.SparseKnn
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text")).limit(60)
    def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Seq[Long], Seq[Double])] =
      df.select(col("doc_id").cast("long"), col("indices"), col("values"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Double](2))).toSet
    val declarative = canon(SparseKnn.spladeExpand(docs, dim = 256))
    val seam = canon(SparseKnn.spladeExpandWith(docs, new DeterministicSparseClient(),
      dim = 256))
    assert(seam == declarative,
      "seam featurization diverged from the declarative oracle path")
    // ...and the index machinery downstream is weight-agnostic: the
    // seam's output builds the same postings table writeIndex expects
    val tmp = java.nio.file.Files.createTempDirectory("splade_seam").toString
    spark.sql("DROP TABLE IF EXISTS t_splade_seam")
    SparseKnn.writeIndex(SparseKnn.spladeExpandWith(docs, new DeterministicSparseClient(),
      dim = 256), "t_splade_seam", s"$tmp/idx", numBuckets = 4)
    val q = SparseKnn.spladeExpand(docs.limit(3), dim = 256)
      .select(col("doc_id").as("qid"), col("indices"), col("values"))
    val hits = SparseKnn.topKFromIndex(spark, "t_splade_seam", q, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // every doc's own expansion is its best match (self-similarity 1)
    assert(hits.forall { case (qid, hit) => qid == hit }, hits.toSeq.toString)
    spark.sql("DROP TABLE IF EXISTS t_splade_seam")
  }

  test("sparse seam: engine-side retry converges; misbehaving clients are refused") {
    import graft.operators.SparseKnn
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text")).limit(8)
    val flaky = new SparseEmbeddingClient {
      private var calls = 0
      override def expandBatch(texts: Seq[String], dim: Int) = {
        calls += 1
        if (calls <= 2) throw new RuntimeException("simulated transport failure")
        new DeterministicSparseClient().expandBatch(texts, dim)
      }
    }
    val viaFlaky = SparseKnn.spladeExpandWith(docs, flaky, dim = 128, batchSize = 64)
    assert(viaFlaky.count() ==
      SparseKnn.spladeExpandWith(docs, new DeterministicSparseClient(), dim = 128).count())
    // unsorted indices violate the sparsevec invariant — refused loud
    val unsorted = new SparseEmbeddingClient {
      override def expandBatch(texts: Seq[String], dim: Int) =
        texts.map(_ => (Array(5L, 3L), Array(1.0, 2.0)))
    }
    val e = intercept[Exception](
      SparseKnn.spladeExpandWith(docs, unsorted, dim = 128, maxRetries = 1).count())
    assert(e.getMessage != null)
  }

  test("TEI /embed_sparse response parse: index-sorted, validated, fail-loud") {
    // entries deliberately unsorted within each vector; whitespace varies
    val resp =
      """[[{"index": 7, "value": 0.5}, {"index": 2, "value": 1.25}],
        |[{"index":0,"value":3.0}]]""".stripMargin
    val out = HttpSparseClient.parseSparseResponse(resp, 2, 16)
    assert(out(0)._1.toSeq == Seq(2L, 7L) && out(0)._2.toSeq == Seq(1.25, 0.5))
    assert(out(1)._1.toSeq == Seq(0L) && out(1)._2.toSeq == Seq(3.0))
    // count mismatch
    val eN = intercept[IllegalArgumentException](
      HttpSparseClient.parseSparseResponse(resp, 3, 16))
    assert(eN.getMessage.contains("expected 3"), eN.getMessage)
    // duplicate index inside one vector
    val eDup = intercept[IllegalArgumentException](HttpSparseClient.parseSparseResponse(
      """[[{"index":1,"value":1.0},{"index":1,"value":2.0}]]""", 1, 16))
    assert(eDup.getMessage.contains("duplicate"), eDup.getMessage)
    // out-of-range index for the engine's dim
    val eRange = intercept[IllegalArgumentException](HttpSparseClient.parseSparseResponse(
      """[[{"index":99,"value":1.0}]]""", 1, 16))
    assert(eRange.getMessage.contains("out of"), eRange.getMessage)
    // empty vector for an input is legal (a stopword-only text)
    val empty = HttpSparseClient.parseSparseResponse("""[[],[{"index":3,"value":2.0}]]""", 2, 16)
    assert(empty(0)._1.isEmpty && empty(1)._1.toSeq == Seq(3L))
  }

  test("HttpSparseClient is constructible and serializable (offline: no I/O)") {
    val c = new HttpSparseClient("http://localhost:9", "key")
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(c)
    assert(bos.size() > 0)
  }
}
