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

  /** Incremental history maintenance: fold a batch of new changes into an
    * existing [[fromChangelog]] history WITHOUT replaying the full
    * changelog — the SCD2 MERGE step a daily pipeline runs.
    *
    * Only the keys present in `changes` are rebuilt: their versions are
    * converted back to changes (a collapsed history is a lossless summary
    * of the *observable* states), merged with the batch, and re-collapsed;
    * untouched keys pass through an anti join untouched. At scale the
    * rebuild windows over |affected history| + |batch| rows, never the
    * full table, and with key-partitioned history storage the two joins
    * prune to affected partitions.
    *
    * Contract (standard SCD2 append semantics): a key's new changes land
    * at-or-after its last RAW change. A batch change at the exact instant
    * of an existing version start wins the instant (the batch is the
    * later knowledge — `__src` tiebreak, spec-pinned). True late
    * arrivals — a change BETWEEN two historical raw changes of the same
    * key — need the raw changelog and a [[fromChangelog]] rebuild: the
    * collapsed history cannot distinguish `(t1,A),(t2,A)` from `(t1,A)`,
    * but an interleaved insert `(t1.5,B)` makes the reversion at `t2`
    * observable again. Under the contract (e.g. any global time-split
    * batch boundary) the fold is EXACTLY `fromChangelog` of the combined
    * changelog — that identity is the oracle gate (`q_scd2_apply`). */
  def applyChanges(history: DataFrame, changes: DataFrame, keyCol: String,
                   ordCols: Seq[String], stateCols: Seq[String]): DataFrame = {
    require(ordCols.nonEmpty && stateCols.nonEmpty, "Scd2: ordCols and stateCols required")
    val affected = changes.select(col(keyCol)).distinct()
    val untouched = history.join(affected, Seq(keyCol), "left_anti")
    val oldAsChanges = history.join(affected, Seq(keyCol), "left_semi")
      .select(col(keyCol) +: stateCols.map(col) :+
        col("valid_from").as("__ord") :+ lit(0).as("__src"): _*)
    // batch ties collapse to the last change per instant (full ord tuple)
    // BEFORE the merge, so the merged stream orders cleanly on
    // (instant, source)
    val w = Window.partitionBy(col(keyCol)).orderBy(ordCols.map(col): _*)
    val newAsChanges = changes
      .withColumn("__next_ord", lead(col(ordCols.head), 1).over(w))
      .where(col("__next_ord").isNull || col("__next_ord") =!= col(ordCols.head))
      .select(col(keyCol) +: stateCols.map(col) :+
        col(ordCols.head).as("__ord") :+ lit(1).as("__src"): _*)
    val rebuilt = fromChangelog(oldAsChanges.unionByName(newAsChanges),
      keyCol, Seq("__ord", "__src"), stateCols)
    untouched.unionByName(rebuilt)
  }

  /** Bucketed history build — the hot-key SCALE variant of
    * [[fromChangelog]], mirroring `AsOfJoin.asOfBucketed`.
    *
    * [[fromChangelog]]'s windows partition by key alone, so one
    * pathological key's entire changelog serializes into a single task.
    * Here the timeline column is additionally bucketed into `bucketSize`
    * ranges and every window partitions by (key, bucket), splitting a hot
    * key across `span/bucketSize` tasks. Cross-bucket correctness needs
    * two bounded carries, both computed on per-(key, bucket) SUMMARIES
    * (one row per non-empty bucket, so their windows are over bucket
    * counts, not row counts):
    *
    *  - carry-IN: each bucket's first change compares against the LAST
    *    state of the previous non-empty bucket (else a state continuing
    *    across the boundary would fail to collapse);
    *  - carry-FORWARD: each bucket's last version takes `valid_to` from
    *    the FIRST `valid_from` of the next bucket that still has a
    *    version after collapsing (skipping buckets that collapsed empty).
    *
    * Timeline ties never cross buckets (same instant ⇒ same bucket), so
    * the per-bucket tie-dedupe is exact. Requires a numeric
    * `ordCols.head` (epoch seconds/micros, sequence number) — same
    * contract as `asOfBucketed`. Output is row-identical to
    * [[fromChangelog]] (equality spec on a skewed changelog). */
  def fromChangelogBucketed(changes: DataFrame, keyCol: String,
                            ordCols: Seq[String], stateCols: Seq[String],
                            bucketSize: Long): DataFrame = {
    require(ordCols.nonEmpty && stateCols.nonEmpty, "Scd2: ordCols and stateCols required")
    require(bucketSize > 0, s"Scd2: bucketSize must be positive, got $bucketSize")
    val ord = ordCols.map(col)
    val state = struct(stateCols.map(col): _*)
    val base = changes.withColumn("__bucket",
      floor(col(ordCols.head).cast("double") / lit(bucketSize.toDouble)).cast("long"))
    val wkb = Window.partitionBy(col(keyCol), col("__bucket")).orderBy(ord: _*)

    // per-bucket tie dedupe (last change of each instant wins; instants
    // cannot straddle buckets)
    val deduped = base
      .withColumn("__next_ord", lead(col(ordCols.head), 1).over(wkb))
      .where(col("__next_ord").isNull || col("__next_ord") =!= col(ordCols.head))
      .drop("__next_ord")

    // carry-IN: previous non-empty bucket's final state, via summaries
    val summaries = deduped.groupBy(col(keyCol), col("__bucket"))
      .agg(max(struct(ord :+ state.as("__st"): _*)).as("__m"))
      .select(col(keyCol), col("__bucket"), col("__m.__st").as("__last_state"))
    val cw = Window.partitionBy(col(keyCol)).orderBy(col("__bucket"))
    val carries = summaries
      .withColumn("__carry_state", lag(col("__last_state"), 1).over(cw))
      .where(col("__carry_state").isNotNull)
      .select(col(keyCol), col("__bucket"), col("__carry_state"))

    // run collapse; the carry is the virtual previous row for a bucket's
    // first change
    val runs = deduped.join(carries, Seq(keyCol, "__bucket"), "left")
      .withColumn("__prev_state", coalesce(lag(state, 1).over(wkb), col("__carry_state")))
      .where(col("__prev_state").isNull || col("__prev_state") =!= state)
      .withColumn("valid_from", col(ordCols.head))

    // carry-FORWARD: the next surviving bucket's first valid_from closes
    // each bucket's last interval (buckets that collapsed to nothing are
    // skipped by construction — they are absent from the summaries)
    val vsum = runs.groupBy(col(keyCol), col("__bucket"))
      .agg(min(col("valid_from")).as("__first_from"))
    val nexts = vsum
      .withColumn("__next_from", lead(col("__first_from"), 1).over(cw))
      .select(col(keyCol), col("__bucket"), col("__next_from"))
    runs.join(nexts, Seq(keyCol, "__bucket"), "left")
      .withColumn("valid_to",
        coalesce(lead(col("valid_from"), 1).over(wkb), col("__next_from")))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol) +: stateCols.map(col) :+
        col("valid_from") :+ col("valid_to") :+ col("is_current"): _*)
  }
}
