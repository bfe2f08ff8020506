package graft

import org.apache.spark.sql.functions._
import graft.operators.Mmr

/** MMR rerank: hand-computed tiny case, diversity vs plain top-k,
  * lambda extremes, the bounded-candidates guard, determinism. */
class MmrSpec extends SparkSpec {

  import spark.implicits._

  // four unit-ish vectors: a ≈ b (near-dups), c orthogonal, d opposite-ish
  private def cands = Seq(
    (1L, 0.99, Seq(1.0, 0.0)),
    (2L, 0.98, Seq(0.999, 0.01)),
    (3L, 0.50, Seq(0.0, 1.0)),
    (4L, 0.40, Seq(-0.5, 0.5))
  ).toDF("vec_id", "rel", "embedding")

  test("greedy picks relevance first, then diversity beats a redundant near-dup") {
    val out = Mmr.rerank(cands, lambda = 0.5, k = 3)
      .orderBy(col("rn")).collect().map(_.getLong(0)).toSeq
    // hand computation: pick 1 = id 1 (max rel). pick 2: the near-dup 2
    // scores 0.5·0.98 − 0.5·1.0 ≈ −0.01, orthogonal 3 scores 0.25, and
    // the ANTI-similar 4 scores 0.5·0.4 − 0.5·(−0.7071) ≈ 0.554 —
    // negative similarity is a diversity bonus, so 4 wins. pick 3: 2 at
    // −0.01 beats 3 at 0.25 − 0.5·cos(3,4)= −0.10.
    assert(out == Seq(1L, 4L, 2L), s"greedy order: $out")
    assert(!out.take(2).contains(2L), "the near-dup must not rank in the top 2")
  }

  test("lambda = 1 degenerates to plain relevance order") {
    val out = Mmr.rerank(cands, lambda = 1.0, k = 4)
      .orderBy(col("rn")).collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 2L, 3L, 4L))
  }

  test("bounded-candidates guard refuses a corpus-sized frame; determinism holds") {
    val big = (0L until 50L).map(i => (i, 1.0 - i * 0.01, Seq(i.toDouble, 1.0)))
      .toDF("vec_id", "rel", "embedding")
    intercept[IllegalArgumentException] {
      Mmr.rerank(big, lambda = 0.7, k = 5, maxCandidates = 10)
    }
    val a = Mmr.rerank(big, lambda = 0.7, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val b = Mmr.rerank(big.repartition(7), lambda = 0.7, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(a.sortBy(_._3) == b.sortBy(_._3))
  }

  test("NaN/null relevance or embeddings fail loud with the offending id") {
    val bad = Seq((1L, Double.NaN, Seq(1.0, 0.0)), (2L, 0.5, Seq(0.0, 1.0)))
      .toDF("vec_id", "rel", "embedding")
    val e1 = intercept[IllegalArgumentException] { Mmr.rerank(bad, 0.7, 1) }
    assert(e1.getMessage.contains("vec_id=1"))
    val badEmb = Seq((3L, 0.9, Seq(Double.NaN, 1.0))).toDF("vec_id", "rel", "embedding")
    val e2 = intercept[IllegalArgumentException] { Mmr.rerank(badEmb, 0.7, 1) }
    assert(e2.getMessage.contains("vec_id=3"))
  }

}
