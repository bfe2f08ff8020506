package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** Text pipeline primitives. Everything except the iterative chunker is
  * built from codegen'd builtins (`regexp_replace`/`regexp_extract_all`/
  * `split`/`transform`), and every formula here is reproducible in ANSI
  * SQL for the DuckDB oracle (cross-engine-stable primitives only: md5,
  * regexp, arithmetic).
  */
object TextFunctions {

  /** The reference's page-text normalization: newline → space, then
    * collapse runs of whitespace
    * (BlobUploadDetector/src/main/java/com/yoshio3/Function.java:106-107). */
  def normalizeText(c: Column): Column =
    regexp_replace(regexp_replace(c, "\n", " "), "[\\s\\x0B]{2,}", " ")

  /** The reference's chunk-splitting punctuation set (Function.java:248-251). */
  val PunctSet: Set[Char] = Set('.', '。', ';', '；', '!', '！', '?', '？')

  /** Reference chunking algorithm (Function.java:214-245): while the text
    * exceeds `maxLen`, scan backwards from index `maxLen` down to
    * `maxLen - lookback` (exclusive) for a punctuation char; split just
    * BEFORE it (the punctuation char starts the next chunk — a quirk of
    * `substring(0, splitIndex)` in the reference); if none found, split at
    * `maxLen - lookback`. Reference defaults: maxLen=7500, lookback=300.
    *
    * Iterative by nature → implemented as a Scala function used via UDF at
    * ingest (cold path, once per document); the DuckDB oracle replays the
    * identical recursion as a recursive CTE.
    */
  def chunkText(text: String, maxLen: Int, lookback: Int): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    var rest = text
    while (rest.length > maxLen) {
      // clamp: the reference always has lookback < maxLen (300 < 7500);
      // guard degenerate params instead of indexing below 0
      val start = math.max(maxLen - lookback, 0)
      var i = maxLen
      while (i > start && !PunctSet(rest.charAt(i))) i -= 1
      var split = if (i > start) i else start
      if (split == 0) split = maxLen
      out += rest.substring(0, split)
      rest = rest.substring(split)
    }
    out += rest
    out.toSeq
  }

  /** Lowercased, trimmed, normalized text — canonical form for dedup /
    * token ops. */
  def canonicalText(c: Column): Column = lower(trim(normalizeText(c)))

  /** Whitespace token count over canonical text. */
  def wsTokenCount(c: Column): Column = size(split(canonicalText(c), " "))

  /** BPE-ish token count: word pieces + isolated punctuation. */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(canonicalText(c), lit("\\w+|[^\\w\\s]"), lit(0)))

  /** Content fingerprint: md5 of canonical text (+ 16-hex-char short form). */
  def fingerprint(c: Column): Column = md5(canonicalText(c))
  def fingerprintShort(c: Column): Column = substring(fingerprint(c), 1, 16)

  /** Word n-gram shingles over canonical text (distinct), the unit for
    * Jaccard/MinHash dedup. Short texts (< n words) fall back to a single
    * whole-text shingle. Computed row-local (no shuffle) by a native
    * expression — see WordShinglesExpr for why not HOFs.
    */
  def wordShingles(c: Column, n: Int = 3): Column =
    ShingleExpressions.wordShingles(canonicalText(c), n)

  /** English-ish stopword hit count (language-ID / quality features).
    * Formula is replicated verbatim in the oracle SQL. */
  def stopwordHits(c: Column, words: Seq[String]): Column =
    size(regexp_extract_all(canonicalText(c),
      lit("\\b(" + words.mkString("|") + ")\\b"), lit(0)))

  /** PII scrubbing (training-data curation): emails, phone numbers, URLs
    * → typed placeholders. Patterns are RE2/Java-portable (no lookaround)
    * so the oracle replays them byte-for-byte. */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val PhoneRe = "\\b[0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{4}\\b"
  val UrlRe = "https?://[^ ]+"

  def redactPii(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      UrlRe, "<URL>"), EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")

  /** Gopher-style repetition signal: fraction of duplicate word 3-grams
    * (1 - distinct/total). High values flag boilerplate / looped text. */
  def duplicateShingleRatio(c: Column, n: Int = 3): Column = {
    val words = split(canonicalText(c), " ")
    val total = greatest(size(words) - (n - 1), lit(1)).cast("double")
    round(lit(1.0) - size(wordShingles(c, n)).cast("double") / total, 6)
  }
}
