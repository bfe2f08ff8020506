package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-dimensional clustering
  * trick behind Delta/Iceberg OPTIMIZE ZORDER BY: interleave the bits of
  * two range-bucketed columns and range-partition + sort the data by the
  * interleaved value. Every output file then covers a small rectangle of
  * the (x, y) space, so parquet footer min/max stats prune scans filtered
  * on EITHER or BOTH columns — a plain sort clusters only its leading
  * column; at 100 TB the difference is reading one file vs every file for
  * a `y BETWEEN …` predicate.
  *
  * Everything is closed-form column math (shift/mask/add — all
  * whole-stage-codegen'd builtins), deterministic, and replayable in the
  * DuckDB oracle bit-for-bit. The write path is `repartitionByRange(z)`
  * (sampled range boundaries — scales out) + in-partition sort.
  */
object ZOrder {

  /** Bucket a numeric column into [0, 2^bits) by linear scaling over the
    * CLOSED domain [minV, maxV] (caller supplies domain bounds — at scale
    * these come from table stats, not an extra pass). Out-of-domain
    * values clamp to the edge buckets. */
  def rangeId(c: Column, minV: Long, maxV: Long, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"rangeId: bits must be in [1, 31], got $bits")
    require(maxV > minV, s"rangeId: need maxV > minV, got [$minV, $maxV]")
    val buckets = 1L << bits
    // clamp BEFORE scaling (so a far out-of-domain value lands on the
    // edge bucket instead of overflowing), then scale in double: the
    // clamped offset is <= the domain span, and long×long could overflow
    // for wide domains (e.g. nanosecond timestamps × 2^16 buckets)
    val clamped = least(lit(maxV), greatest(lit(minV), c.cast("long")))
    val scaled = floor((clamped - minV).cast("double") * buckets / (maxV - minV + 1.0)).cast("long")
    least(lit(buckets - 1), greatest(lit(0L), scaled)).cast("long")
  }

  /** Morton interleave of two `bits`-wide bucket ids: x gets the even bit
    * positions, y the odd. An unrolled sum of non-overlapping shifted
    * masks — pure codegen'd arithmetic. */
  def interleave(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"interleave: bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      (shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
  }

  /** N-column Morton interleave: bit j of column c lands at position
    * j·N + c. Total bits (bits × N) must fit a signed long. Two columns
    * reduce to [[interleave]]. */
  def interleaveN(cols: Seq[Column], bits: Int): Column = {
    require(cols.size >= 2, s"interleaveN: need >= 2 columns, got ${cols.size}")
    require(bits >= 1 && bits * cols.size <= 62,
      s"interleaveN: bits*cols must fit a long, got $bits x ${cols.size}")
    val n = cols.size
    (for { i <- 0 until bits; (c, ci) <- cols.zipWithIndex } yield
      shiftright(c, i).bitwiseAND(lit(1L)) * lit(1L << (i * n + ci)))
      .reduce(_ + _)
  }

  /** Lay `df` out along the Z-curve of (xCol, yCol): range-partition into
    * `numPartitions` by the interleaved value and sort within partitions.
    * Writing the result gives files whose min/max footers cover small
    * (x, y) rectangles. */
  def zorder(df: DataFrame, xCol: Column, yCol: Column, bits: Int,
             numPartitions: Int): DataFrame =
    zorderN(df, Seq(xCol, yCol), bits, numPartitions)

  /** N-dimensional [[zorder]]. */
  def zorderN(df: DataFrame, cols: Seq[Column], bits: Int,
              numPartitions: Int): DataFrame = {
    require(!df.columns.contains("__z"),
      "zorderN: input may not contain a __z column (internal sort key)")
    df.withColumn("__z", interleaveN(cols, bits))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
