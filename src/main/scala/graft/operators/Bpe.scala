package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.canonicalText

/** Byte-pair-encoding trainer + tokenizer (Sennrich et al. 2016,
  * arXiv:1508.07909) as distributed operators.
  *
  * Scale design — the whole trick is WHERE each stage runs:
  *  - The merge loop runs over the DISTINCT-WORD VOCABULARY (word, freq),
  *    not the corpus: one corpus-wide shuffle builds the weighted vocab,
  *    after which every Lloyd-style iteration shuffles only vocab-sized
  *    data (≪ corpus; bounded by the Heaps'-law vocabulary curve, not the
  *    100 TB of text).
  *  - Each iteration: adjacent symbol pairs are expanded ROW-LOCAL from
  *    the symbol array, one map-side-combined groupBy sums pair
  *    frequencies, and only the single argmax pair reaches the driver.
  *    The merge is then applied row-local (a fold over the symbol array).
  *  - Iteration state is localCheckpoint'd: the symbols DataFrame feeds
  *    itself, so without truncation the plan doubles per merge.
  *  - Tokenizing the corpus afterwards is a broadcast join: the merged
  *    vocabulary (word → tokens) is small; documents never shuffle.
  */
object Bpe {

  /** End-of-word marker (keeps word-final merges distinct from mid-word). */
  val Eow = "</w>"

  /** Weighted word vocabulary of a corpus: one shuffle, map-side combined. */
  def wordVocab(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(canonicalText(col(textCol)), " ")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).cast("long").as("freq"))

  /** Initial symbol sequence of a word: characters + end-of-word marker. */
  private def initSymbols(word: Column): Column =
    concat(split(word, ""), array(lit(Eow)))

  /** Adjacent symbol pairs of one row's symbol array — row-local. A
    * fully-merged word (single symbol) has no pairs: sequence(0, -1)
    * would count DOWN ([0,-1]), so guard explicitly. */
  private def adjacentPairs(syms: Column): Column =
    when(size(syms) >= 2,
      transform(sequence(lit(0), size(syms) - 2), i =>
        struct(element_at(syms, i + 1).as("a"), element_at(syms, i + 2).as("b"))))
      .otherwise(array().cast("array<struct<a:string,b:string>>"))

  /** One greedy left-to-right merge pass of (a, b) → ab over a symbol
    * array (a fold; matches the reference BPE semantics: an element just
    * produced by a merge does not re-merge within the same pass). */
  private def mergeOnce(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Learn `k` merges from a (word, freq) vocabulary. Ties on pair
    * frequency break lexicographically, so the merge list is
    * deterministic on any engine/partitioning. Returns ≤ k merges
    * (fewer if the vocabulary runs out of adjacent pairs). */
  def trainMergesFromVocab(vocab: DataFrame, k: Int): Seq[(String, String)] = {
    require(k >= 1, s"trainMergesFromVocab: k must be >= 1, got $k")
    var syms = vocab.select(col("freq"), initSymbols(col("word")).as("syms"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var i = 0
    while (i < k && !done) {
      val top = syms
        .select(col("freq"), explode(adjacentPairs(col("syms"))).as("p"))
        .groupBy(col("p.a"), col("p.b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(desc("cnt"), col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        syms = syms.select(col("freq"), mergeOnce(col("syms"), a, b).as("syms"))
          .localCheckpoint(true)
      }
      i += 1
    }
    merges.result()
  }

  /** Learn `k` merges from a document corpus. */
  def trainMerges(docs: DataFrame, k: Int, textCol: String = "text"): Seq[(String, String)] =
    trainMergesFromVocab(wordVocab(docs, textCol), k)

  /** Tokenization of each distinct word under an ordered merge list —
    * the fold over merges runs on the vocabulary only. */
  def vocabTokens(vocab: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val merged = merges.foldLeft(initSymbols(col("word"))) {
      case (c, (a, b)) => mergeOnce(c, a, b)
    }
    vocab.select(col("word"), merged.as("tokens"))
  }

  /** Tokenize a corpus: per-doc BPE tokens + counts via a BROADCAST join
    * of the merged vocabulary — the expensive merge fold never touches
    * corpus-sized data. Pass the `vocab` you already built for training
    * to avoid paying the corpus-wide vocabulary shuffle twice. */
  def tokenize(docs: DataFrame, merges: Seq[(String, String)],
               idCol: String = "doc_id", textCol: String = "text",
               vocab: Option[DataFrame] = None): DataFrame = {
    val vt = vocabTokens(vocab.getOrElse(wordVocab(docs, textCol)), merges)
    docs.select(col(idCol), explode(split(canonicalText(col(textCol)), " ")).as("word"))
      .where(length(col("word")) > 0)
      .join(broadcast(vt), Seq("word"))
      .groupBy(col(idCol))
      .agg(sum(size(col("tokens"))).cast("long").as("n_bpe_tokens"),
           count(lit(1)).cast("long").as("n_words"))
  }

  /** UTF-8 byte sequence as a lexicographically comparable key (unsigned). */
  private def utf8(s: String): Seq[Int] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).toSeq.map(_ & 0xff)

  private implicit val seqIntOrdering: Ordering[Seq[Int]] =
    Ordering.Implicits.seqOrdering[Seq, Int]

  /** Spark-free replay of train + tokenize for spec ground truth. */
  private[graft] def referenceMerges(vocab: Map[String, Long], k: Int): Seq[(String, String)] = {
    var state: Map[Vector[String], Long] =
      vocab.groupMapReduce { case (w, _) => w.map(_.toString).toVector :+ Eow }(_._2)(_ + _)
    val out = Seq.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < k && !done) {
      val counts = state.toSeq.flatMap { case (syms, f) =>
        syms.sliding(2).collect { case Vector(a, b) => (a, b) -> f }.toSeq
      }.groupMapReduce(_._1)(_._2)(_ + _)
      if (counts.isEmpty) done = true
      else {
        // tie-break on UTF-8 bytes (Spark's binary string order), not JVM
        // UTF-16 code units — they disagree on supplementary-plane chars
        val ((a, b), _) = counts.minBy { case ((a, b), c) => (-c, utf8(a), utf8(b)) }
        out += ((a, b))
        state = state.groupMapReduce { case (syms, _) =>
          syms.foldLeft(Vector.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
            else acc :+ x
          }
        }(_._2)(_ + _)
      }
      i += 1
    }
    out.result()
  }
}
