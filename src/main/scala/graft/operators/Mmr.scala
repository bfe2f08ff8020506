package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998) —
  * the serve-side diversification step RAG stacks run between retrieval
  * and prompting: greedily pick the candidate maximizing
  * `λ·relevance − (1−λ)·max-similarity-to-already-picked`, so near-
  * duplicate hits stop crowding the context window.
  *
  * Scale contract: the input is the RETRIEVED candidate set (a KNN/BM25
  * top-m), bounded by the serve contract like every post-retrieval step
  * ([[graft.pipeline.Summarizer]] convention) — enforced with a
  * `maxCandidates` limit probe, never an unbounded collect. The greedy
  * loop is inherently sequential (each pick changes the next argmax), so
  * it runs driver-local over the bounded set; everything upstream (the
  * retrieval that produced the candidates) stays distributed.
  *
  * Determinism: relevance and pairwise similarities are rounded to
  * `scale` BEFORE the combination, the mmr score after it, ties break on
  * id — the greedy replays exactly in the DuckDB oracle as unrolled
  * argmax stages. */
object Mmr {

  /** Re-rank `candidates` — columns (idCol: long, relCol: double,
    * embCol: array<float|double>) — to the top `k` by MMR. Output:
    * (idCol, mmr, rn), rn 1-based pick order. */
  def rerank(candidates: DataFrame, lambda: Double, k: Int,
             idCol: String = "vec_id", relCol: String = "rel",
             embCol: String = "embedding", maxCandidates: Int = 10000,
             scale: Int = 4): DataFrame = {
    require(lambda >= 0.0 && lambda <= 1.0, s"Mmr.rerank: lambda must be in [0,1], got $lambda")
    require(k >= 1, s"Mmr.rerank: k must be >= 1, got $k")
    val spark = candidates.sparkSession
    val probe = candidates.limit(maxCandidates + 1)
      .select(col(idCol), col(relCol).cast("double"),
        col(embCol).cast("array<double>"))
      .collect()
    require(probe.length <= maxCandidates,
      s"Mmr.rerank: candidate set exceeds maxCandidates=$maxCandidates — MMR re-ranks a " +
        "bounded retrieval result, not a corpus; retrieve first, then diversify")
    // validate the serve rows up front: a null/NaN relevance or a null
    // embedding would otherwise poison the greedy argmax (all NaN
    // comparisons are false, so bestIdx never advances past -1 and the
    // failure surfaces as an unrelated BitSet error) — fail loud with
    // the offending id instead
    probe.foreach { r =>
      require(!r.isNullAt(1) && java.lang.Double.isFinite(r.getDouble(1)),
        s"Mmr.rerank: null/non-finite $relCol for $idCol=${r.getLong(0)}")
      require(!r.isNullAt(2) && !r.getSeq[Any](2).exists(v =>
          v == null || !java.lang.Double.isFinite(v.asInstanceOf[Double])),
        s"Mmr.rerank: null/non-finite $embCol for $idCol=${r.getLong(0)}")
    }
    val ids = probe.map(_.getLong(0))
    val rels = probe.map(r => roundAt(r.getDouble(1), scale))
    val embs = probe.map(_.getSeq[Double](2).toArray)

    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val d = math.sqrt(na) * math.sqrt(nb)
      if (d == 0.0) 0.0 else dot / d
    }

    val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
    val picked = scala.collection.mutable.BitSet.empty
    while (selected.length < math.min(k, probe.length)) {
      var bestIdx = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < probe.length) {
        if (!picked(i)) {
          val score =
            if (selected.isEmpty) rels(i)
            else {
              var maxSim = Double.NegativeInfinity
              selected.foreach { j =>
                val s = roundAt(cos(embs(i), embs(j)), scale)
                if (s > maxSim) maxSim = s
              }
              roundAt(lambda * rels(i) - (1.0 - lambda) * maxSim, scale)
            }
          val better = score > bestScore ||
            (score == bestScore && (bestIdx < 0 || ids(i) < ids(bestIdx)))
          if (better) { bestScore = score; bestIdx = i }
        }
        i += 1
      }
      picked += bestIdx
      selected += bestIdx
    }
    import spark.implicits._
    selected.toSeq.zipWithIndex.map { case (i, r) =>
      val score = if (r == 0) rels(i) else {
        var maxSim = Double.NegativeInfinity
        selected.take(r).foreach { j =>
          val s = roundAt(cos(embs(i), embs(j)), scale)
          if (s > maxSim) maxSim = s
        }
        roundAt(lambda * rels(i) - (1.0 - lambda) * maxSim, scale)
      }
      (ids(i), score, (r + 1).toLong)
    }.toDF(idCol, "mmr", "rn")
  }

  /** HALF_UP at `scale` decimals — Spark's `round` and DuckDB's `round`
    * (both away-from-zero on ties), so all three engines agree. */
  private def roundAt(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble
}
