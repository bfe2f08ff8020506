package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate (materialized-view) maintenance: keep a
  * per-group summary table up to date by folding in new batches, never
  * re-scanning history — the pattern behind every "daily metrics" table
  * a 100 TB pipeline maintains.
  *
  * The summary carries MERGEABLE state — (n, sum, min, max) — the
  * algebraic aggregates whose merge is itself a groupBy: counts and sums
  * add, min/max fold. Averages are derived at read time (`sum/n`); sums
  * run in DECIMAL so the fold is order-independent exact, which is what
  * makes `fold(fold(s, b1), b2) == summarize(b1 ∪ b2)` an IDENTITY
  * rather than an approximation — and that identity is the oracle gate
  * (`q_incr_agg`).
  *
  * Scale shape: each fold shuffles only the NEW batch (map-side combined
  * to group cardinality) plus the group-cardinality-sized summary —
  * history never moves. With the summary bucketed by group key the fold
  * join is co-located too. */
object IncrementalAgg {

  private val stateCols = Seq("n", "sum_v", "min_v", "max_v")

  /** Collapse a batch to summary shape: (keys*, n, sum_v, min_v, max_v). */
  def summarize(batch: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    require(keys.nonEmpty, "IncrementalAgg: need at least one group key")
    batch.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,6)")).as("sum_v"),
        min(col(valueCol).cast("decimal(18,6)")).as("min_v"),
        max(col(valueCol).cast("decimal(18,6)")).as("max_v"))
  }

  /** Fold new summary rows into an existing summary (both in
    * [[summarize]]'s schema). Commutative and associative — spec-pinned —
    * so batches can arrive in any order and partial summaries can merge
    * hierarchically (per-partition → per-day → total). */
  def fold(summary: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "IncrementalAgg: need at least one group key")
    require(stateCols.forall(summary.columns.contains) &&
      stateCols.forall(delta.columns.contains),
      s"IncrementalAgg: both sides need state columns $stateCols")
    summary.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"), max(col("max_v")).as("max_v"))
  }

  /** Read-time derived view: adds `avg_v` (exact decimal ratio rounded to
    * `scale`). */
  def withAverage(summary: DataFrame, scale: Int = 6): DataFrame =
    summary.withColumn("avg_v",
      round(col("sum_v") / col("n"), scale).cast(s"decimal(28,$scale)"))

  /** MERGEABLE QUANTILE summaries — the state (n, sum, min, max) can't
    * answer "p95 latency per group without rescanning history"; a KLL
    * sketch can (Karnin–Lang–Liberty 2016, via Spark 4's built-in
    * DataSketches functions). [[summarizeQuantile]] collapses a batch to
    * one KLL sketch per group; [[foldQuantile]] merges sketches —
    * `kll_merge_agg` is the sketch family's whole point: merging two
    * sketches bounds error exactly like sketching the union, so the view
    * folds hierarchically without ever touching raw history;
    * [[quantilesOf]] reads quantile estimates out. Approximation
    * contract: KLL normalized rank error (~1.7% at the default k), and
    * sketch BYTES depend on partition order — estimates are stable
    * within the error bound, not bit-stable, hence spec-gated against
    * exact quantiles rather than oracle-hashed. Values sketch as BIGINT
    * (the drift/outlier convention: integer metrics). */
  def summarizeQuantile(batch: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    require(keys.nonEmpty, "IncrementalAgg: need at least one group key")
    batch.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        expr(s"kll_sketch_agg_bigint(cast($valueCol as bigint))").as("kll"))
  }

  /** Merge per-batch sketch rows to one sketch per group (commutative /
    * associative up to the sketch's own merge semantics). */
  def foldQuantile(summaries: DataFrame, keys: Seq[String]): DataFrame =
    summaries.groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), expr("kll_merge_agg_bigint(kll)").as("kll"))

  /** Read quantile estimates from a folded sketch summary: one column per
    * requested quantile — `q50`, `q95`, and `q95_5` for fractional
    * percents (the name is derived from the full decimal, so 0.954 and
    * 0.9551 cannot silently overwrite each other; a residual collision,
    * e.g. a literally duplicated quantile, fails loud). */
  def quantilesOf(summary: DataFrame, quantiles: Seq[Double]): DataFrame = {
    def nameOf(q: Double): String = {
      // 6dp then strip: double noise (0.95*100 = 95.00000000000001) must
      // not leak into column names
      val pct = BigDecimal(q * 100).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .underlying.stripTrailingZeros.toPlainString
      "q" + pct.replace("-", "neg").replace(".", "_")
    }
    val names = quantiles.map(nameOf)
    require(names.distinct.length == names.length,
      s"IncrementalAgg.quantilesOf: quantiles map to colliding column names " +
        s"${names.mkString(", ")} — deduplicate the requested quantiles")
    quantiles.zip(names).foldLeft(summary) { case (df, (q, n)) =>
      df.withColumn(n, expr(s"kll_sketch_get_quantile_bigint(kll, cast($q as double))"))
    }.drop("kll")
  }

  /** Streaming materialized view, exactly-once: each micro-batch writes
    * ITS OWN summary under `batch_id=N` with dynamic partition overwrite
    * (a crash-replayed batch overwrites itself — `fold`ing into a single
    * mutable summary would double-count on replay, which is why the
    * store is per-batch), and [[readView]] folds the batch summaries at
    * read time. The fold input is batches × group cardinality — summary-
    * sized, not data-sized — and associativity (spec-pinned) makes the
    * read-time fold equal the one-shot aggregation of everything
    * ingested. */
  def viewBatch(viewDir: String, keys: Seq[String], valueCol: String)(
      batch: DataFrame, batchId: Long): Unit =
    summarize(batch, keys, valueCol)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(viewDir)

  /** Current state of a [[viewBatch]]-maintained view. */
  def readView(spark: org.apache.spark.sql.SparkSession, viewDir: String,
               keys: Seq[String]): DataFrame = {
    val batches = spark.read.parquet(viewDir)
    batches.groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"), max(col("max_v")).as("max_v"))
  }
}
