package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

class BpeSpec extends SparkSpec {

  import spark.implicits._

  // the Sennrich et al. (2016) worked example vocabulary
  private val paperVocab: Map[String, Long] =
    Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("trainMergesFromVocab reproduces the reference BPE merge sequence") {
    val vocab = paperVocab.toSeq.toDF("word", "freq")
    val got = Bpe.trainMergesFromVocab(vocab, 6)
    assert(got == Bpe.referenceMerges(paperVocab, 6))
    // hand-derived head of the sequence: ("e","s") wins at freq 9 by
    // lexicographic tiebreak over ("s","t")/("t","</w>"), then chains
    assert(got.take(3) == Seq(("e", "s"), ("es", "t"), ("est", Bpe.Eow)))
  }

  test("merge application is greedy left-to-right without intra-pass re-merge") {
    val vocab = Seq(("aaa", 1L)).toDF("word", "freq")
    // first merge must be (a,a) at count 2; one pass turns a|a|a|</w>
    // into aa|a|</w> (the fresh "aa" does not immediately re-merge)
    val merges = Bpe.trainMergesFromVocab(vocab, 1)
    assert(merges == Seq(("a", "a")))
    val toks = Bpe.vocabTokens(vocab, merges).collect().head.getSeq[String](1)
    assert(toks == Seq("aa", "a", Bpe.Eow))
  }

  test("training survives words collapsing to a single symbol") {
    // "ab" merges to one symbol after 2 merges; iteration 3 must see an
    // empty pair list for it (sequence(0,-1) counts DOWN — regression)
    val vocab = Seq(("ab", 1L)).toDF("word", "freq")
    val merges = Bpe.trainMergesFromVocab(vocab, 5)
    assert(merges == Bpe.referenceMerges(Map("ab" -> 1L), 5))
    assert(merges.size == 2) // (a,b), (ab,</w>) — then no pairs remain
    val toks = Bpe.vocabTokens(vocab, merges).collect().head.getSeq[String](1)
    assert(toks == Seq("ab" + Bpe.Eow))
  }

  test("corpus training is deterministic under repartitioning") {
    val docs = Tables.documents(spark, sfDir)
    val a = Bpe.trainMerges(docs, 5)
    val b = Bpe.trainMerges(docs.repartition(17), 5)
    assert(a.size == 5)
    assert(a == b)
  }

  test("supplementary-plane chars are single symbols — training matches tokenization") {
    // an emoji is one code point but two UTF-16 units: training must see
    // it as ONE symbol, like Spark-side split(word, "") does, or it
    // learns lone-surrogate merges tokenization can never apply
    val vocab = Seq(("😀😀", 3L)).toDF("word", "freq") // 😀😀
    val merges = Bpe.trainMergesFromVocab(vocab, 5)
    assert(merges == Bpe.referenceMerges(Map("😀😀" -> 3L), 5))
    // ties at freq 3 break on UTF-8 bytes: "</w>" (0x3c…) < "😀" (0xf0…)
    assert(merges == Seq(("😀", Bpe.Eow), ("😀", "😀" + Bpe.Eow)), merges)
    val toks = Bpe.vocabTokens(vocab, merges).collect().head.getSeq[String](1)
    assert(toks == Seq("😀😀" + Bpe.Eow), toks)
  }

  test("realistic k: 1000 merges over the corpus vocabulary in seconds") {
    val vocabDf = Bpe.wordVocab(Tables.documents(spark, sfDir))
    val vocab = vocabDf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val t0 = System.nanoTime()
    val merges = Bpe.trainMergesFromVocab(vocabDf, 1000)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 30, s"1000 merges took $secs s")
    // greedy prefix property: the head of a k=1000 run IS the k=200 run —
    // pin it against the naive Spark-free reference implementation
    assert(merges.take(200) == Bpe.referenceMerges(vocab, 200))
    assert(merges.size == 1000 || merges.size == merges.distinct.size,
      s"ran out at ${merges.size} merges")
  }

  test("tokenize counts BPE tokens per document via the merged vocab") {
    val docs = Seq((1L, "low low lower"), (2L, "newest")).toDF("doc_id", "text")
    val merges = Bpe.trainMergesFromVocab(Bpe.wordVocab(docs), 3)
    val res = Bpe.tokenize(docs, merges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(res(1L)._2 == 3L && res(2L)._2 == 1L) // word counts exact
    // token counts must equal the sum of per-word reference tokenizations
    val vt = Bpe.vocabTokens(Bpe.wordVocab(docs), merges).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).size).toMap
    assert(res(1L)._1 == (2 * vt("low") + vt("lower")).toLong)
    assert(res(2L)._1 == vt("newest").toLong)
  }
}
