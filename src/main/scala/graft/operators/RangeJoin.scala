package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: points ⋈ intervals on `start <= point <= end`,
  * optionally alongside equi-keys — the attribution-window / IP-range /
  * validity-interval workhorse Spark only plans as a broadcast
  * nested-loop (or worse, a cartesian product) out of the box.
  *
  * Algorithm — bucketized equi-join: choose a bucket width `w`; an
  * interval [s, e] is exploded to every bucket it touches
  * (⌊s/w⌋ … ⌊e/w⌋), a point belongs to exactly ONE bucket (⌊p/w⌋), and
  * the join runs as a plain hash equi-join on (equiKeys…, bucket)
  * followed by the exact containment filter. Each matching pair meets in
  * exactly one bucket — the point's — so no dedup pass is needed. Cost:
  * |intervals| × avg-span/w exploded rows + one shuffle, vs the
  * nested-loop's |P|×|I| comparisons; pick `w` near the typical interval
  * span so the explosion factor stays small. Intervals wider than
  * `maxSpanBuckets` buckets fail fast (per-row assert on the interval
  * side) — the caller should widen `w` rather than silently explode.
  */
object RangeJoin {

  private val Reserved = Set("__b", "__span")

  /** Explode an interval frame into its buckets. NULL-bounded rows are
    * dropped first (a NULL bound can never satisfy the containment
    * predicate — same as the plain join). Per-row fail-fast guards: an
    * INVERTED interval (end < start — the data-corruption signal; also
    * what would make sequence() count DOWN) throws on the VALUES, not
    * the bucket ids, so it fires regardless of bucketWidth; an interval
    * touching MORE than `maxSpanBuckets` buckets throws before it can
    * explode (`__span` is bucket_count − 1, so the keep-condition
    * `__span < maxSpanBuckets` ⇔ bucket_count ≤ maxSpanBuckets). */
  private def bucketed(opName: String, df: DataFrame, s: String, e: String,
                       bucketWidth: Long, maxSpanBuckets: Int): DataFrame = df
    .where(col(s).isNotNull && col(e).isNotNull)
    .where(coalesce(assert_true(col(s) <= col(e),
      lit(s"$opName: interval inverted (end < start) — fix the data")),
      lit(true)))
    .withColumn("__span",
      (floor(col(e) / bucketWidth) - floor(col(s) / bucketWidth)).cast("long"))
    .where(coalesce(assert_true(col("__span") < maxSpanBuckets,
      lit(s"$opName: interval spans more than $maxSpanBuckets buckets — " +
        "widen bucketWidth or raise maxSpanBuckets")),
      lit(true)))
    .withColumn("__b", explode(sequence(
      floor(col(s) / bucketWidth).cast("long"),
      floor(col(e) / bucketWidth).cast("long"))))
    .drop("__span")

  /** Join each point row to every interval row containing it.
    * `pointCol`/`startCol`/`endCol` are numeric (cast your timestamps to
    * epoch seconds first); intervals are CLOSED on both ends. Colliding
    * interval-side column names require `intervalSuffix`. */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketWidth: Long, equiKeys: Seq[String] = Nil,
                      maxSpanBuckets: Int = 1024,
                      intervalSuffix: String = ""): DataFrame = {
    require(bucketWidth > 0, s"pointInInterval: bucketWidth must be > 0, got $bucketWidth")
    require(maxSpanBuckets >= 1, s"pointInInterval: maxSpanBuckets must be >= 1")
    val pCols = points.columns.toSet
    require(pCols.intersect(Reserved).isEmpty && intervals.columns.toSet.intersect(Reserved).isEmpty,
      s"pointInInterval: inputs may not contain ${Reserved.mkString("/")}")
    val joinCols = equiKeys :+ "__b"
    val collide = intervals.columns.filterNot(equiKeys.contains).filter(pCols.contains)
    require(collide.isEmpty || intervalSuffix.nonEmpty,
      s"pointInInterval: both sides have ${collide.mkString(", ")}; pass intervalSuffix")
    val renamed = collide.foldLeft(intervals)((df, c) =>
      df.withColumnRenamed(c, c + intervalSuffix))
    val (s, e) = (if (collide.contains(startCol)) startCol + intervalSuffix else startCol,
      if (collide.contains(endCol)) endCol + intervalSuffix else endCol)

    val iv = bucketed("pointInInterval", renamed, s, e, bucketWidth, maxSpanBuckets)
    val pt = points.withColumn("__b", floor(col(pointCol) / bucketWidth).cast("long"))
    pt.join(iv, joinCols, "inner")
      .where(col(pointCol) >= col(s) && col(pointCol) <= col(e))
      .drop("__b")
  }

  /** Interval-OVERLAP join: left ⋈ right on `[ls, le] ∩ [rs, re] ≠ ∅`
    * (closed intervals: overlap iff ls <= re AND rs <= le). Both sides
    * explode to their buckets; an overlapping pair shares every bucket of
    * the intersection, so the join would emit it multiple times — the
    * dedup is FREE instead: keep a pair only in the bucket that contains
    * max(ls, rs), the intersection's first bucket. One hash equi-join, no
    * distinct pass, no nested loop. */
  def intervalOverlap(left: DataFrame, lStart: String, lEnd: String,
                      right: DataFrame, rStart: String, rEnd: String,
                      bucketWidth: Long, equiKeys: Seq[String] = Nil,
                      maxSpanBuckets: Int = 1024,
                      rightSuffix: String = ""): DataFrame = {
    require(bucketWidth > 0, s"intervalOverlap: bucketWidth must be > 0, got $bucketWidth")
    val lCols = left.columns.toSet
    require(lCols.intersect(Reserved).isEmpty && right.columns.toSet.intersect(Reserved).isEmpty,
      s"intervalOverlap: inputs may not contain ${Reserved.mkString("/")}")
    val collide = right.columns.filterNot(equiKeys.contains).filter(lCols.contains)
    require(collide.isEmpty || rightSuffix.nonEmpty,
      s"intervalOverlap: both sides have ${collide.mkString(", ")}; pass rightSuffix")
    val renamed = collide.foldLeft(right)((df, c) => df.withColumnRenamed(c, c + rightSuffix))
    val (rs, re) = (if (collide.contains(rStart)) rStart + rightSuffix else rStart,
      if (collide.contains(rEnd)) rEnd + rightSuffix else rEnd)

    bucketed("intervalOverlap", left, lStart, lEnd, bucketWidth, maxSpanBuckets)
      .join(bucketed("intervalOverlap", renamed, rs, re, bucketWidth, maxSpanBuckets),
        equiKeys :+ "__b", "inner")
      .where(col(lStart) <= col(re) && col(rs) <= col(lEnd))
      .where(col("__b") === floor(greatest(col(lStart), col(rs)) / bucketWidth).cast("long"))
      .drop("__b")
  }
}
