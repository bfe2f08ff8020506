package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Column profiling — the corpus-QA pass a curation pipeline runs before
  * and after every transform: per column, row/null counts, exact distinct
  * cardinality, and the modal value. One groupBy per profiled column
  * (map-side combined; the per-column result is value-cardinality-sized,
  * not corpus-sized), then a single-row agg folds it to the summary. The
  * modal value ties break upward (max count, then max value) so the
  * profile is deterministic on any engine.
  *
  * Values are reported as strings so heterogeneous columns stack into one
  * result frame.
  */
object Profile {

  /** Profile `cols` of `df`: one output row per column —
    * (column, n_rows, n_null, n_distinct, top_value, top_count). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: need at least one column")
    cols.map { c =>
      val v = col(c).cast("string")
      df.select(v.as("v"))
        .groupBy(col("v"))
        .agg(count(lit(1)).cast("long").as("cnt"))
        .agg(
          coalesce(sum(col("cnt")), lit(0L)).cast("long").as("n_rows"),
          coalesce(sum(when(col("v").isNull, col("cnt"))), lit(0L)).cast("long").as("n_null"),
          count(when(col("v").isNotNull, lit(1))).cast("long").as("n_distinct"),
          max(when(col("v").isNotNull, struct(col("cnt"), col("v")))).as("__top"))
        .select(lit(c).as("column"), col("n_rows"), col("n_null"), col("n_distinct"),
          col("__top.v").as("top_value"), col("__top.cnt").as("top_count"))
    }.reduce(_ unionAll _)
  }

  /** Key-skew report — the shuffle-health diagnostic to run BEFORE a big
    * join/groupBy on `keyCol`: the `topN` heaviest keys with exact counts
    * and integer basis-point shares (`n·10000 div total` — no float
    * division, hash-exact cross-engine). A top key at thousands of basis
    * points is the signal to reach for `SkewJoin`/salting/AQE skew
    * handling. One map-side-combined groupBy + a `TakeOrderedAndProject`
    * over key-cardinality-sized counts; the 1-row total broadcasts. */
  def keySkew(df: DataFrame, keyCol: String, topN: Int = 10): DataFrame = {
    require(topN >= 1, s"keySkew: topN must be >= 1, got $topN")
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("total"))
    counts.crossJoin(broadcast(total))
      .select(col("key"), col("n"), col("total"),
        expr("(n * 10000) div total").as("share_bp"))
      .orderBy(col("n").desc, col("key"))
      .limit(topN)
  }
}
