package graft

import org.apache.spark.sql.functions._
import graft.operators.Unigram

/** Unigram-LM tokenizer: planted-piece recovery, Viterbi optimality vs
  * brute-force enumeration, coverage/reconstruction invariants,
  * determinism, and the corpus tokenization shape. */
class UnigramSpec extends SparkSpec {

  import spark.implicits._

  test("planted pieces are learned and drive segmentation") {
    // words built from the units "ab" / "cd" — the model must keep those
    // units and segment compositions into them, not characters
    val vocab = Seq(("abcd", 50L), ("abab", 40L), ("cdcd", 30L), ("abcdab", 20L))
    val model = Unigram.trainFromVocab(vocab, vocabSize = 8, maxPieceLen = 4)
    assert(model.logProb.contains("ab") || model.logProb.contains("abcd"),
      s"expected a planted unit in ${model.logProb.keys.toSeq.sorted}")
    val seg = Unigram.viterbi("abcdab", model)
    assert(seg.mkString == "abcdab", "segmentation must reconstruct the word")
    assert(seg.length < 6, s"planted units unused: $seg")
    // singles always survive → any string over the alphabet segments
    assert(Unigram.viterbi("dcba", model).mkString == "dcba")
  }

  test("viterbi score equals brute-force max over all segmentations") {
    val docs = Tables.documents(spark, sfDir)
    val model = Unigram.train(docs.limit(100), vocabSize = 400, maxPieceLen = 4)
    val words = graft.operators.Bpe.wordVocab(docs.limit(100)).select(col("word"))
      .collect().map(_.getString(0)).filter(w => w.length >= 2 && w.length <= 10).take(40)
    assert(words.nonEmpty)
    def score(pieces: Seq[String]): Double = pieces.map(p =>
      model.logProb.getOrElse(p,
        if (p.length == 1) Unigram.UnkLogProb else Double.NegativeInfinity)).sum
    def allSegs(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to math.min(model.maxPieceLen, w.length)).flatMap { l =>
        allSegs(w.drop(l)).map(w.take(l) +: _)
      }
    words.foreach { w =>
      val got = Unigram.viterbi(w, model)
      assert(got.mkString == w, s"'$w': pieces don't reconstruct")
      val best = allSegs(w).map(score).max
      assert(math.abs(score(got) - best) < 1e-9,
        s"'$w': viterbi ${score(got)} vs brute-force best $best (got $got)")
    }
  }

  test("training is deterministic and respects the vocab-size bound") {
    val vocab = Seq(("hello", 10L), ("help", 8L), ("world", 6L), ("word", 5L), ("held", 3L))
    val m1 = Unigram.trainFromVocab(vocab, vocabSize = 15, maxPieceLen = 5)
    val m2 = Unigram.trainFromVocab(vocab, vocabSize = 15, maxPieceLen = 5)
    assert(m1 == m2)
    assert(m1.logProb.size <= 15 ||
      m1.logProb.keys.forall(p => p.codePointCount(0, p.length) == 1),
      s"vocab ${m1.logProb.size} over bound and not singles-only")
    // probabilities are a distribution
    val mass = m1.logProb.values.map(math.exp).sum
    assert(math.abs(mass - 1.0) < 1e-9, s"probability mass $mass")
  }

  test("corpus tokenization: every word covered, piece counts bounded sanely") {
    val docs = Tables.documents(spark, sfDir).limit(200)
    val model = Unigram.train(docs, vocabSize = 500)
    val out = Unigram.tokenize(docs, model).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (tokens, words) = (r.getLong(1), r.getLong(2))
      assert(tokens >= words, s"doc ${r.get(0)}: $tokens pieces < $words words")
    }
  }
}
