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
    // least() clamp: when w rounds DOWN in binary (e.g. (0.7−0)/7),
    // an in-range x just below hi can floor to `buckets` — genuine
    // max-bucket mass must not leak into the overflow edge bucket
    when(x < lo, lit(-1L))
      .when(x >= hi, lit(buckets.toLong))
      .otherwise(least(floor((x.cast("double") - lit(lo)) / lit(w)).cast("long"),
        lit(buckets - 1L)))
  }

  /** Histogram counts `(bucket, n)` — one groupBy, k+2 rows out. */
  def histogram(df: DataFrame, colName: String, lo: Double, hi: Double,
                buckets: Int): DataFrame =
    df.select(bucketExpr(col(colName), lo, hi, buckets).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))

  /** Per-group outlier flags with an EXACT deviation test: row x of
    * group g is anomalous when `|x − μ_g| > (kNum/kDen)·σ_g`, evaluated
    * cross-multiplied in fixed-point integers —
    * `kDen²·(x·n − Σx)² > kNum²·(n·Σx² − (Σx)²)` — so there is no float
    * mean, no float variance, no sqrt, and the flag replays hash-exact
    * in any engine. Values are scaled by 10⁶ and floored (both engines
    * floor the same IEEE product identically); the squares live in
    * DECIMAL(38,0) (Spark) / HUGEINT (DuckDB), exact to 10³⁸.
    *
    * Scale shape: one map-side-combined groupBy builds the per-group
    * (n, Σx, Σx²) moments — group-cardinality-sized — broadcast back
    * over the corpus for a row-local flag; the corpus shuffles never. */
  def anomalies(df: DataFrame, groupCol: String, valueCol: String,
                kNum: Int = 3, kDen: Int = 1): DataFrame = {
    require(kNum >= 1 && kDen >= 1, s"Drift: bad sigma ratio $kNum/$kDen")
    val x6 = floor(col(valueCol).cast("double") * 1e6).cast("decimal(38,0)")
    val scaled = df.withColumn("__x6", x6)
    val moments = scaled.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("decimal(38,0)").as("__n"),
        sum(col("__x6")).as("__s"),
        sum(col("__x6") * col("__x6")).as("__ss"))
    scaled.join(broadcast(moments), Seq(groupCol))
      .withColumn("anomalous",
        lit(kDen.toLong * kDen) * (col("__x6") * col("__n") - col("__s"))
          * (col("__x6") * col("__n") - col("__s"))
          > lit(kNum.toLong * kNum) * (col("__n") * col("__ss") - col("__s") * col("__s")))
      .drop("__x6", "__n", "__s", "__ss")
  }

  /** Per-bucket drift report between snapshots `a` (baseline) and `b`:
    * `(bucket, n_a, n_b, drifted)`, every bucket present in either side.
    * `drifted` is the exact cross-multiplied relative test above. */
  def histogramDrift(a: DataFrame, b: DataFrame, colName: String,
                     lo: Double, hi: Double, buckets: Int,
                     thresholdPct: Int = 20): DataFrame =
    histogramDriftVs(histogram(a, colName, lo, hi, buckets),
      b, colName, lo, hi, buckets, thresholdPct)

  /** [[histogramDrift]] against a PRE-COMPUTED baseline histogram
    * (`(bucket, n)` as [[histogram]] emits) — the shape a streaming gate
    * needs: the baseline is built once and reused per micro-batch
    * instead of rescanning the reference corpus on every trigger. */
  def histogramDriftVs(baseline: DataFrame, b: DataFrame, colName: String,
                       lo: Double, hi: Double, buckets: Int,
                       thresholdPct: Int = 20): DataFrame = {
    require(thresholdPct >= 1, s"Drift: thresholdPct must be >= 1, got $thresholdPct")
    val ha = baseline.withColumnRenamed("n", "n_a")
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
