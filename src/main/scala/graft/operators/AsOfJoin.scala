package graft.operators

import org.apache.spark.sql.DataFrame
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

  def asOf(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String): DataFrame = {
    val lCols = left.columns
    val rCols = right.columns
    // Timestamp inputs must keep sub-second precision — casting them to
    // long truncates to whole seconds and can match a right row up to 1s
    // AFTER the left time. Integral inputs stay long (casting 64-bit
    // nanos to double would lose precision instead).
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val timey = Set[org.apache.spark.sql.types.DataType](TimestampType, TimestampNTZType)
    val timeType =
      if (timey.contains(left.schema(leftTime).dataType) ||
          timey.contains(right.schema(rightTime).dataType)) "double" else "long"
    val l2 = left.select(col(leftKey).as("__key"), col(leftTime).cast(timeType).as("__time"),
      lit(1).as("__tag"), struct(lCols.toSeq.map(col): _*).as("__l"))
    val r2 = right.select(col(rightKey).as("__key"), col(rightTime).cast(timeType).as("__time"),
      lit(0).as("__tag"), struct(rCols.toSeq.map(col): _*).as("__r"))
    val unioned = l2.withColumn("__r", lit(null).cast(r2.schema("__r").dataType))
      .unionByName(r2.withColumn("__l", lit(null).cast(l2.schema("__l").dataType)))
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__time"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__last_r", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1 && col("__last_r").isNotNull)
      .select((lCols.toSeq.map(c => col(s"__l.$c").as(c)) ++
               rCols.toSeq.map(c => col(s"__last_r.$c").as(c))): _*)
  }
}
