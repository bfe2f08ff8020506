package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.CountMinSketchAgg
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.util.sketch.CountMinSketch

import graft.functions.CmsEstimateExpr

/** EXACT heavy-hitter (hot-key) detection with a Count-Min-sketch
  * pre-filter — find every key whose frequency reaches a threshold
  * without shuffling the long tail.
  *
  * The naive formulation (`GROUP BY key HAVING count >= t`) shuffles one
  * record per DISTINCT key: fine for small vocabularies, but a token /
  * URL / user-id column at 100 TB has billions of distinct keys, the
  * map-side hash aggregates overflow and spill, and the exchange carries
  * the entire tail — which the HAVING then throws away. Here:
  *
  *  1. one narrow pass builds a CMS over the key (each partition a
  *     partial sketch, merged up the tree; only depth×width counters
  *     reach the driver — ~100 KB regardless of input size);
  *  2. rows whose CMS estimate is below the threshold are dropped
  *     BEFORE the aggregation. CMS never undercounts, so no heavy key
  *     is lost; collisions only let some tail rows through;
  *  3. the exact count-and-filter runs on the survivors — a shuffle
  *     sized by the heavy keys (plus CMS false positives), not by the
  *     vocabulary. The result is EXACT.
  *
  * Same two-pass regime as [[BloomJoin]] (the input is scanned twice, so
  * the win requires the avoided aggregate state + exchange to outweigh a
  * second narrow scan — true exactly when the vocabulary is too big to
  * aggregate comfortably, the case this operator exists for).
  *
  * NULL keys never count toward any heavy hitter (the sketch aggregate
  * skips them, the probe filter drops them) — same as the plain
  * formulation, where a NULL group can be heavy but is not a key.
  *
  * Training-pipeline uses: stopword / boilerplate-token discovery
  * (vocabulary heavy hitters), hot-domain detection before a crawl join,
  * skew diagnosis feeding [[SkewJoin.saltedJoin]]'s salt choice.
  */
object HeavyHitters {

  /** Build a Count-Min sketch over `df(key)` (string or integral).
    * `eps` bounds the overcount (≤ eps×N with probability `confidence`)
    * and sizes the sketch at width 2/eps — smaller eps = sharper
    * pre-filter, bigger sketch. */
  def sketch(df: DataFrame, key: String, eps: Double = 1e-3,
             confidence: Double = 0.99, seed: Int = 42): CountMinSketch = {
    require(eps > 0 && eps < 1, s"sketch: eps must be in (0,1), got $eps")
    require(confidence > 0 && confidence < 1,
      s"sketch: confidence must be in (0,1), got $confidence")
    val agg = new CountMinSketchAgg(ColumnBridge.expression(col(key)),
      Literal(eps), Literal(confidence), Literal(seed))
    val row = df.select(ColumnBridge.column(agg.toAggregateExpression()).as("s")).head()
    if (row.isNullAt(0)) CountMinSketch.create(eps, confidence, seed)
    else CountMinSketch.readFrom(row.getAs[Array[Byte]](0))
  }

  /** Frequency-estimate column against a built sketch (overestimate-only;
    * codegen'd probe). */
  def estimate(key: Column, cms: CountMinSketch): Column =
    ColumnBridge.column(CmsEstimateExpr(ColumnBridge.expression(key), cms.toByteArray))

  /** Every key with frequency >= `minCount`, exactly: `(key, cnt)`. */
  def exact(df: DataFrame, key: String, minCount: Long, eps: Double = 1e-3,
            confidence: Double = 0.99, seed: Int = 42): DataFrame = {
    require(minCount >= 1, s"exact: minCount must be >= 1, got $minCount")
    exactWith(df, key, minCount, sketch(df, key, eps, confidence, seed))
  }

  /** Rate-thresholded variant: heavy = frequency >= ceil(frac × N).
    * N is the sketch's own totalCount (number of non-null keys added),
    * so no extra counting pass — and the SAME `frac` is selective at
    * sf0.001 and at 100 TB (Zipf tails are scale-free). */
  def exactByRate(df: DataFrame, key: String, frac: Double, eps: Double = 1e-3,
                  confidence: Double = 0.99, seed: Int = 42): DataFrame = {
    require(frac > 0 && frac <= 1, s"exactByRate: frac must be in (0,1], got $frac")
    val cms = sketch(df, key, eps, confidence, seed)
    val minCount = math.max(1L, math.ceil(frac * cms.totalCount()).toLong)
    exactWith(df, key, minCount, cms)
  }

  private def exactWith(df: DataFrame, key: String, minCount: Long,
                        cms: CountMinSketch): DataFrame =
    df.where(estimate(col(key), cms) >= minCount)
      .groupBy(col(key))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
}
