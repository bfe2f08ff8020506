package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension history — the versioning layer a
  * training-data pipeline needs for provenance: "which version of this
  * record was live when that snapshot was taken?"
  *
  * `fromChangelog` turns an append-only change log (key, order, state)
  * into versioned intervals: consecutive no-op updates collapse (classic
  * SCD2 — a new version only when the tracked state actually changes),
  * `valid_from` is the change's own order value, `valid_to` the next
  * change's (null while current). `asOf` then answers point-in-time
  * lookups, which together with the interval layout makes snapshot
  * reproduction a plain filter.
  *
  * Scale design: both window passes (run-collapse lag, interval lead)
  * partition on the key, so the whole build is ONE shuffle of the
  * changelog — the post-filter lead window reuses the lag window's hash
  * partitioning and only re-sorts. No driver-side state, no join.
  */
object Scd2 {

  /** Build the history. `ordCols` orders changes within a key (include a
    * unique tiebreaker: exactly-once semantics need a total order);
    * `stateCols` are the tracked attributes. Output: key, stateCols,
    * `valid_from` (first ord col's value), `valid_to` (next version's
    * valid_from, null while current), `is_current`.
    *
    * Ties on the timeline column (`ordCols.head`): `valid_from` is that
    * value, so two surviving changes sharing it would produce zero-width,
    * ambiguously-ordered intervals. They are resolved BEFORE the run
    * collapse by keeping only the change that is live at the end of the
    * instant — the last by the full ord tuple; intermediate states within
    * one instant were never observable. The dedupe is a `lead` over the
    * same key-partitioned window as the collapse (not a
    * (key, instant)-partitioned one), so the build stays one shuffle and
    * `valid_from` comes out strictly increasing within each key. */
  def fromChangelog(changes: DataFrame, keyCol: String,
                    ordCols: Seq[String], stateCols: Seq[String]): DataFrame = {
    require(ordCols.nonEmpty && stateCols.nonEmpty, "Scd2: ordCols and stateCols required")
    val ord = ordCols.map(col)
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val state = struct(stateCols.map(col): _*)
    val deduped = changes
      .withColumn("__next_ord", lead(col(ordCols.head), 1).over(w))
      .where(col("__next_ord").isNull || col("__next_ord") =!= col(ordCols.head))
      .drop("__next_ord")
    val runs = deduped
      .withColumn("__prev_state", lag(state, 1).over(w))
      .where(col("__prev_state").isNull || col("__prev_state") =!= state)
      .withColumn("valid_from", col(ordCols.head))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol) +: stateCols.map(col) :+
        col("valid_from") :+ col("valid_to") :+ col("is_current"): _*)
  }

  /** Versions live at `at`: valid_from <= at < valid_to (open = current).
    * A static comparison, so it pushes into the history's file scan. */
  def asOf(history: DataFrame, at: Column): DataFrame =
    history.where(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))
}
