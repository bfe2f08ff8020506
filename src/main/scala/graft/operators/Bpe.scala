package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import graft.functions.TextFunctions.canonicalText

/** Byte-pair-encoding trainer + tokenizer (Sennrich et al. 2016,
  * arXiv:1508.07909) as distributed operators.
  *
  * Scale design — the whole trick is WHERE each stage runs:
  *  - Spark does the CORPUS-sized passes: the weighted word vocabulary
  *    (one map-side-combined shuffle, [[wordVocab]]) and the final
  *    corpus tokenization (broadcast join, [[tokenize]] — documents
  *    never shuffle).
  *  - The merge loop runs DRIVER-LOCAL over the collected vocabulary
  *    ([[localMerges]]): the distinct-word vocabulary is bounded by the
  *    Heaps'-law curve (≪ corpus) and Zipf-truncatable (`minFreq`),
  *    while a realistic tokenizer needs ~30k merges — an iterative
  *    cluster loop pays one Spark job PER MERGE, a driver-scheduling
  *    wall that dominates regardless of data size. Pair counts are
  *    maintained incrementally (inverted pair → word index + lazy
  *    max-heap), so each merge costs the affected words, not a recount.
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

  /** Learn `k` merges from a (word, freq) vocabulary.
    *
    * The vocabulary is COLLECTED and the Sennrich loop runs driver-local
    * ([[localMerges]]): the distinct-word vocabulary is Heaps'-law
    * bounded (millions of entries at 100 TB of text, not billions), and
    * a realistic tokenizer needs ~30k merges — as one Spark job per
    * merge that is 30k sequential job schedules, a driver-side wall no
    * amount of data parallelism amortizes. Spark does the corpus-sized
    * work ([[wordVocab]], one map-side-combined shuffle) and the
    * corpus-sized tokenization afterwards ([[tokenize]], broadcast
    * join); the merge loop itself touches only the vocabulary.
    *
    * `minFreq` truncates the Zipf tail BEFORE the collect: minFreq = 1
    * is exact; a larger floor bounds driver memory with a documented
    * approximation (dropped tail words contribute vanishing pair mass).
    *
    * Ties on pair frequency break on UTF-8 bytes (Spark's binary string
    * order), so the merge list is deterministic on any
    * engine/partitioning. Returns ≤ k merges (fewer if the vocabulary
    * runs out of adjacent pairs). */
  def trainMergesFromVocab(vocab: DataFrame, k: Int, minFreq: Long = 1): Seq[(String, String)] = {
    require(k >= 1, s"trainMergesFromVocab: k must be >= 1, got $k")
    require(minFreq >= 1, s"trainMergesFromVocab: minFreq must be >= 1, got $minFreq")
    val rows = vocab.where(col("freq") >= minFreq)
      .select(col("word"), col("freq").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    localMerges(rows, k)
  }

  /** Learn `k` merges from a document corpus. */
  def trainMerges(docs: DataFrame, k: Int, textCol: String = "text",
                  minFreq: Long = 1): Seq[(String, String)] =
    trainMergesFromVocab(wordVocab(docs, textCol), k, minFreq)

  /** One greedy merge pass over a symbol array — the driver-side twin of
    * [[mergeOnce]] (same semantics: a symbol just produced by a merge
    * does not re-merge within the pass). */
  private def mergePass(s: Array[String], a: String, b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      if (out.nonEmpty && out(out.length - 1) == a && s(i) == b)
        out(out.length - 1) = a + b
      else out += s(i)
      i += 1
    }
    out.toArray
  }

  private def compareUtf8(s: String, t: String): Int =
    java.util.Arrays.compareUnsigned(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      t.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Max-heap order: highest count first; ties → smallest UTF-8 key. */
  private val heapOrd: Ordering[(Long, String, String)] =
    new Ordering[(Long, String, String)] {
      def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(x._1, y._1)
        if (c != 0) c
        else {
          val a = compareUtf8(y._2, x._2)
          if (a != 0) a else compareUtf8(y._3, x._3)
        }
      }
    }

  /** Code-point symbolization — a supplementary-plane character
    * (emoji etc.) stays ONE symbol. Plain `String#map(_.toString)` would
    * split it into two lone UTF-16 surrogates, training merges that
    * tokenization can never apply. Shared by training, the reference
    * replay, and [[BpeTokenizeExpr]] — one symbolization everywhere. */
  private def codePointSymbols(w: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** The Sennrich merge loop over a collected vocabulary, with
    * INCREMENTALLY maintained pair counts: selecting a merge updates
    * only the words that contain the merged pair (an inverted
    * pair → word-set index), and the argmax comes from a lazy-deletion
    * max-heap — every count change pushes a fresh entry, stale entries
    * are discarded on pop by comparing against the live count. Per
    * merge: O(Σ affected word lengths + log heap), NOT a full recount —
    * the shape that makes k ≈ 30k merges feasible. Semantics are pinned
    * to [[referenceMerges]] (same greedy pass, same UTF-8 tie-break). */
  private[graft] def localMerges(vocab: Seq[(String, Long)], k: Int): Seq[(String, String)] = {
    import scala.collection.mutable
    val words: Array[Array[String]] =
      vocab.map { case (w, _) => codePointSymbols(w) :+ Eow }.toArray
    val freqs: Array[Long] = vocab.map(_._2).toArray
    val counts = mutable.HashMap.empty[(String, String), Long]
    val occur = mutable.HashMap.empty[(String, String), mutable.Set[Int]]

    def retract(i: Int, touched: mutable.Set[(String, String)]): Unit = {
      val s = words(i); val f = freqs(i); var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val c = counts.getOrElse(p, 0L) - f
        if (c <= 0) counts.remove(p) else counts(p) = c
        occur.get(p).foreach(_ -= i)
        touched += p
        j += 1
      }
    }
    def insert(i: Int, touched: mutable.Set[(String, String)]): Unit = {
      val s = words(i); val f = freqs(i); var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        counts(p) = counts.getOrElse(p, 0L) + f
        occur.getOrElseUpdate(p, mutable.Set.empty) += i
        touched += p
        j += 1
      }
    }

    val init = mutable.Set.empty[(String, String)]
    words.indices.foreach(insert(_, init))
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](heapOrd)
    counts.foreach { case ((a, b), c) => heap.enqueue((c, a, b)) }

    val out = Seq.newBuilder[(String, String)]
    var produced = 0
    while (produced < k && heap.nonEmpty) {
      val (c, a, b) = heap.dequeue()
      if (counts.getOrElse((a, b), 0L) == c && c > 0) {
        out += ((a, b))
        produced += 1
        val affected = occur.getOrElse((a, b), mutable.Set.empty).toArray
        val touched = mutable.Set.empty[(String, String)]
        affected.foreach { i =>
          retract(i, touched)
          words(i) = mergePass(words(i), a, b)
          insert(i, touched)
        }
        touched.foreach { p =>
          val c2 = counts.getOrElse(p, 0L)
          if (c2 > 0) heap.enqueue((c2, p._1, p._2))
        }
      }
    }
    out.result()
  }

  /** Native tokenizer expression: the ordered merge list applied in ONE
    * JVM pass per word. The previous formulation folded k nested
    * `aggregate()` HOFs — a ~30k-merge tokenizer (the file's own stated
    * target) built a 30k-deep Catalyst tree whose analysis recursion
    * blew the driver stack before touching data. Merges whose pair is
    * not currently adjacent are skipped via a present-pair set
    * (mergePass on an absent pair is the identity), so per-word cost is
    * O(symbols + k hash lookups + applied merges · symbols); semantics
    * are exactly the training-side [[mergePass]] (greedy left-to-right,
    * a just-produced symbol does not re-merge within its pass). */
  case class BpeTokenizeExpr(child: Expression, merges: Seq[(String, String)])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "bpe_tokenize"

    override protected def nullSafeEval(input: Any): Any = {
      var syms: Array[String] = codePointSymbols(input.toString) :+ Eow
      val present = scala.collection.mutable.HashSet.empty[(String, String)]
      def rebuild(): Unit = {
        present.clear()
        var i = 0
        while (i + 1 < syms.length) { present += ((syms(i), syms(i + 1))); i += 1 }
      }
      rebuild()
      merges.foreach { case (a, b) =>
        if (present((a, b))) { syms = mergePass(syms, a, b); rebuild() }
      }
      new GenericArrayData(syms.map(x =>
        org.apache.spark.unsafe.types.UTF8String.fromString(x).asInstanceOf[Any]))
    }

    override protected def withNewChildInternal(c: Expression): BpeTokenizeExpr =
      copy(child = c)
  }

  /** Tokenization of each distinct word under an ordered merge list —
    * runs on the vocabulary only, one native expression per word. */
  def vocabTokens(vocab: DataFrame, merges: Seq[(String, String)]): DataFrame =
    vocab.select(col("word"), ColumnBridge.column(
      BpeTokenizeExpr(ColumnBridge.expression(col("word")), merges)).as("tokens"))

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
      vocab.groupMapReduce { case (w, _) => codePointSymbols(w).toVector :+ Eow }(_._2)(_ + _)
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
