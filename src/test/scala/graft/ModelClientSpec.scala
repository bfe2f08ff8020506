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
}
