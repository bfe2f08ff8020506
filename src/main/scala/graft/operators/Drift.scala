package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot drift monitoring — the data-quality gate a recurring
  * training-data pipeline needs: "did today's corpus move away from
  * yesterday's?" run as a cheap scheduled check before expensive
  * downstream stages (embedding, dedup, training) consume a bad drop.
  *
  * The monitor is an equi-width histogram diff with an ALL-INTEGER
  * drift test: bucket b drifts when the relative frequency change
  * exceeds `thresholdPct`, evaluated as
  * `100·|n_a·N_b − n_b·N_a| > thresholdPct · n_a · N_b` (plus "new
  * mass" when n_a = 0 < n_b) — cross-multiplied so no division, no
  * floats, no engine-dependent rounding anywhere. Fractional scores
  * (PSI/KL) need logs and would not replay bit-for-bit across engines;
  * the integer test gates hash-exact and the raw per-bucket counts ride
  * along for any offline scoring.
  *
  * Scale shape: each snapshot contributes ONE map-side-combined
  * groupBy on a codegen'd bucket id (counts, k+2 rows out), totals are
  * 1-row aggregates broadcast back — the corpora are scanned once each
  * and never joined row-to-row. */
object Drift {

  /** Bucket id for `x` over [lo, hi) in `buckets` equal widths, with
    * -1 / `buckets` as the underflow / overflow edge buckets. Integer
    * bucket math over a scaled value keeps engines bit-identical. */
  def bucketExpr(x: Column, lo: Double, hi: Double, buckets: Int): Column = {
    require(buckets >= 1 && hi > lo, s"Drift: bad histogram [$lo, $hi) × $buckets")
    val w = (hi - lo) / buckets
    when(x < lo, lit(-1L))
      .when(x >= hi, lit(buckets.toLong))
      .otherwise(floor((x.cast("double") - lit(lo)) / lit(w)).cast("long"))
  }

  /** Histogram counts `(bucket, n)` — one groupBy, k+2 rows out. */
  def histogram(df: DataFrame, colName: String, lo: Double, hi: Double,
                buckets: Int): DataFrame =
    df.select(bucketExpr(col(colName), lo, hi, buckets).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))

  /** Per-bucket drift report between snapshots `a` (baseline) and `b`:
    * `(bucket, n_a, n_b, drifted)`, every bucket present in either side.
    * `drifted` is the exact cross-multiplied relative test above. */
  def histogramDrift(a: DataFrame, b: DataFrame, colName: String,
                     lo: Double, hi: Double, buckets: Int,
                     thresholdPct: Int = 20): DataFrame = {
    require(thresholdPct >= 1, s"Drift: thresholdPct must be >= 1, got $thresholdPct")
    val ha = histogram(a, colName, lo, hi, buckets).withColumnRenamed("n", "n_a")
    val hb = histogram(b, colName, lo, hi, buckets).withColumnRenamed("n", "n_b")
    val na = ha.agg(sum(col("n_a")).as("tot_a"))
    val nb = hb.agg(sum(col("n_b")).as("tot_b"))
    ha.join(hb, Seq("bucket"), "full_outer")
      .select(col("bucket"), coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
      .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .select(col("bucket"), col("n_a"), col("n_b"),
        when(col("n_a") === 0, col("n_b") > 0)
          .otherwise(lit(100) * abs(col("n_a") * col("tot_b") - col("n_b") * col("tot_a"))
            > lit(thresholdPct.toLong) * col("n_a") * col("tot_b"))
          .as("drifted"))
  }
}
