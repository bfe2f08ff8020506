package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-independent sampling — the production idiom for
  * reproducible corpus subsets: bucket every row by a hash of its key and
  * keep buckets below the rate cutoff. Unlike `df.sample()` (RNG-seeded,
  * partitioning-sensitive), the same row lands in the same bucket on any
  * engine, any partitioning, any day — which is what makes train/test
  * splits and debugging subsets reproducible at 100 TB.
  *
  * Bucket = first 8 md5 hex digits of (salt ++ key) mod `buckets` — the
  * exact construction is replayable in the DuckDB oracle.
  */
object Sampling {

  /** Bucket in [0, buckets) from md5(salt ++ key) — pure column math. */
  def hashBucket(key: Column, salt: String, buckets: Int = 100): Column =
    pmod(conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 8), 16, 10)
      .cast("long"), lit(buckets))

  /** Keep ~`percent`% of rows, deterministically by key. */
  def deterministicSample(df: DataFrame, keyCol: String, percent: Int,
                          salt: String = "graft", buckets: Int = 100): DataFrame =
    df.where(hashBucket(col(keyCol), salt, buckets) < percent)

  /** Reproducible train/test split: (train, test) with ~`testPercent`%
    * held out, stable under any repartitioning. */
  def trainTestSplit(df: DataFrame, keyCol: String, testPercent: Int,
                     salt: String = "graft-split"): (DataFrame, DataFrame) = {
    val bucket = hashBucket(col(keyCol), salt)
    (df.where(bucket >= testPercent), df.where(bucket < testPercent))
  }

  /** Stratified (per-stratum rate) sampling — the domain-mixture weighting
    * step of a training-data pipeline: keep ~`rates(stratum)`% of each
    * stratum (`defaultPercent` for unlisted strata), deterministically by
    * key. One narrow filter — the rate lookup is a CASE chain, no join —
    * so re-weighting a 100 TB corpus is a scan. */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
                       rates: Map[String, Int], defaultPercent: Int = 100,
                       salt: String = "strata", buckets: Int = 100): DataFrame = {
    require((rates.values ++ Seq(defaultPercent)).forall(r => r >= 0 && r <= buckets),
      s"stratifiedSample: rates (incl. defaultPercent) must be within [0, $buckets]")
    val rateCol = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultPercent)) {
      case (acc, (k, r)) => when(col(strataCol) === k, lit(r)).otherwise(acc)
    }
    df.where(hashBucket(col(keyCol), salt, buckets) < rateCol)
  }
}
