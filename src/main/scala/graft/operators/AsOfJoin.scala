package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * `rightTime <= leftTime` on the same key (inclusive, inner semantics).
  *
  * Algorithm: tag-and-union, one shuffle, NO per-key pair blowup —
  * both sides are unioned, sorted within key by (time, tag right-first so
  * an equal-time right row is visible to the left row), and a running
  * `last(right_payload, ignoreNulls)` window carries the latest right row
  * forward onto each left row. This is the merge-join formulation: cost is
  * one shuffle + one sort of |L|+|R| rows, vs. the naive join+filter's
  * |L|×|R| rows per key. Right rows must be unique per (key, time) for
  * determinism — callers pre-aggregate.
  */
object AsOfJoin {

  private val Reserved = Set("__key", "__time", "__tag", "__bucket", "__l", "__r")

  /** Shared input validation: returns right-side OUTPUT names (suffixed
    * where they collide with a left column). */
  private def validated(opName: String, lCols: Array[String], rCols: Array[String],
                        rightSuffix: String): Array[String] = {
    val overlap = lCols.toSet.intersect(rCols.toSet)
    require(overlap.isEmpty || rightSuffix.nonEmpty,
      s"$opName: left and right share column names ${overlap.mkString(", ")}; " +
        "pass rightSuffix to disambiguate the right-side outputs")
    val rOut = rCols.map(c => if (overlap(c)) c + rightSuffix else c)
    require(lCols.toSet.intersect(rOut.toSet).isEmpty,
      s"$opName: rightSuffix '$rightSuffix' still collides with left columns " +
        lCols.toSet.intersect(rOut.toSet).mkString(", "))
    require((lCols ++ rCols).forall(!Reserved(_)),
      s"$opName: input columns may not use reserved internal names ${Reserved.mkString(", ")}")
    rOut
  }

  /** Timestamp inputs must keep sub-second precision — casting them to
    * long truncates to whole seconds and can match a right row up to 1s
    * AFTER the left time. Integral inputs stay long (casting 64-bit
    * nanos to double would lose precision instead). */
  private def timeTypeOf(left: DataFrame, right: DataFrame,
                         leftTime: String, rightTime: String): String = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val timey = Set[org.apache.spark.sql.types.DataType](TimestampType, TimestampNTZType)
    if (timey.contains(left.schema(leftTime).dataType) ||
        timey.contains(right.schema(rightTime).dataType)) "double" else "long"
  }

  /** Final projection: left columns by name, right columns as `rOut`. */
  private def project(df: DataFrame, lCols: Array[String], rCols: Array[String],
                      rOut: Array[String]): DataFrame =
    df.select((lCols.toSeq.map(c => col(s"__l.$c").as(c)) ++
               rCols.toSeq.zip(rOut).map { case (c, out) => col(s"__last_r.$c").as(out) }): _*)

  /** @param rightSuffix appended to right-side output columns that would
    *         collide with a left-side name (pandas `merge_asof` style,
    *         e.g. both sides having `ts`); with the default empty suffix,
    *         overlapping schemas are rejected up front instead of emitting
    *         duplicate names that throw AMBIGUOUS_REFERENCE downstream. */
  def asOf(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           rightSuffix: String = ""): DataFrame = {
    val lCols = left.columns
    val rCols = right.columns
    val rOut = validated("asOf", lCols, rCols, rightSuffix)
    val timeType = timeTypeOf(left, right, leftTime, rightTime)
    val l2 = left.select(col(leftKey).as("__key"), col(leftTime).cast(timeType).as("__time"),
      lit(1).as("__tag"), struct(lCols.toSeq.map(col): _*).as("__l"))
    // a NULL right event time sorts FIRST under the ascending window and
    // would become the as-of match for every left row ("time −∞") — a
    // row with no event time can never be anyone's predecessor, drop it
    val r2 = right.where(col(rightTime).isNotNull)
      .select(col(rightKey).as("__key"), col(rightTime).cast(timeType).as("__time"),
      lit(0).as("__tag"), struct(rCols.toSeq.map(col): _*).as("__r"))
    val unioned = l2.withColumn("__r", lit(null).cast(r2.schema("__r").dataType))
      .unionByName(r2.withColumn("__l", lit(null).cast(l2.schema("__l").dataType)))
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__time"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    project(unioned
      .withColumn("__last_r", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1 && col("__last_r").isNotNull),
      lCols, rCols, rOut)
  }

  /** Range-bucketed as-of join — the fact-fact SCALE variant of [[asOf]].
    *
    * [[asOf]]'s window partitions by key alone, so one hot key's entire
    * history lands in one partition (fine for bounded keys, a straggler
    * at 100 TB). Here time is additionally bucketed into `bucketSec`
    * ranges and the merge window partitions by (key, bucket), splitting a
    * hot key across partitions. Correctness needs one extra ingredient:
    * each (key, bucket) imports a CARRY-IN row — the latest right row
    * from any earlier bucket — so a left row early in its bucket still
    * sees the most recent right row even when that row is buckets away.
    * The carry-in is computed on per-bucket SUMMARIES (one row per
    * (key, bucket) of the right side), so its window is over bucket
    * counts, not row counts.
    *
    * Shuffles: right-side per-bucket latest (small), carry window on
    * summaries (tiny), and the (key, bucket) merge — same volume as
    * [[asOf]]'s single shuffle but with `timespan/bucketSec`-way finer
    * partitioning on hot keys. Pick `bucketSec` ≈ span/parallelism.
    */
  def asOfBucketed(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTime: String, rightTime: String,
                   bucketSec: Long, rightSuffix: String = ""): DataFrame = {
    require(bucketSec > 0, s"asOfBucketed: bucketSec must be positive, got $bucketSec")
    val lCols = left.columns
    val rCols = right.columns
    val rOut = validated("asOfBucketed", lCols, rCols, rightSuffix)
    val timeType = timeTypeOf(left, right, leftTime, rightTime)
    def bucketOf(t: Column): Column = floor(t / lit(bucketSec.toDouble)).cast("long")

    val l2 = left.select(col(leftKey).as("__key"), col(leftTime).cast(timeType).as("__time"),
      lit(1).as("__tag"), struct(lCols.toSeq.map(col): _*).as("__l"))
      .withColumn("__bucket", bucketOf(col("__time")))
    // NULL right event times drop for the same reason as [[asOf]]: a
    // NULL bucket sorts first in the carry window and would become the
    // carry-in for every real bucket
    val r2 = right.where(col(rightTime).isNotNull)
      .select(col(rightKey).as("__key"), col(rightTime).cast(timeType).as("__time"),
      lit(0).as("__tag"), struct(rCols.toSeq.map(col): _*).as("__r"))
      .withColumn("__bucket", bucketOf(col("__time")))

    // per (key, bucket) latest right row — max of (time, payload) structs
    // picks the row with the greatest time (payload breaks exact ties)
    val rLatest = r2.groupBy(col("__key"), col("__bucket"))
      .agg(max(struct(col("__time"), col("__r"))).as("__m"))
      .select(col("__key"), col("__bucket"),
        col("__m.__time").as("__time"), col("__m.__r").as("__r"))

    // carry-in per LEFT bucket: latest right summary from any STRICTLY
    // earlier bucket. Summaries (tag 1) sort before needs (tag 2) at the
    // same bucket would be wrong — a same-bucket right row is already an
    // in-bucket candidate — so needs sort FIRST at their bucket.
    val lBuckets = l2.select(col("__key"), col("__bucket")).distinct()
      .withColumn("__ctag", lit(0))
      .withColumn("__ctime", lit(null).cast(timeType))
      .withColumn("__cr", lit(null).cast(r2.schema("__r").dataType))
    val rSummaries = rLatest.select(col("__key"), col("__bucket"),
      lit(1).as("__ctag"), col("__time").as("__ctime"), col("__r").as("__cr"))
    val cw = Window.partitionBy(col("__key"))
      .orderBy(col("__bucket"), col("__ctag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carries = lBuckets.unionByName(rSummaries)
      .withColumn("__carry_t", last(col("__ctime"), ignoreNulls = true).over(cw))
      .withColumn("__carry_r", last(col("__cr"), ignoreNulls = true).over(cw))
      .where(col("__ctag") === 0 && col("__carry_r").isNotNull)
      .select(col("__key"), col("__bucket"),
        col("__carry_t").as("__time"), lit(0).as("__tag"),
        col("__carry_r").as("__r"))

    // merge per (key, bucket): left rows + in-bucket right rows + carry-in
    val rIn = r2.select(col("__key"), col("__bucket"), col("__time"), col("__tag"), col("__r"))
    val lIn = l2.select(col("__key"), col("__bucket"), col("__time"), col("__tag"),
      col("__l"), lit(null).cast(r2.schema("__r").dataType).as("__r"))
    val unioned = lIn.unionByName(
      rIn.unionByName(carries).withColumn("__l", lit(null).cast(l2.schema("__l").dataType)),
      allowMissingColumns = false)
    val w = Window.partitionBy(col("__key"), col("__bucket"))
      .orderBy(col("__time"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    project(unioned
      .withColumn("__last_r", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1 && col("__last_r").isNotNull),
      lCols, rCols, rOut)
  }
}
