package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance self-join (fuzzy matching) for entity resolution over
  * short keys — names, titles, codes. Finds every pair of rows whose
  * strings are within Levenshtein distance `maxDist` (1 or 2), without
  * the quadratic all-pairs comparison.
  *
  * Blocking is the FastSS deletion neighborhood (Bocek et al. 2007):
  * each string emits every variant reachable by up to `maxDist`
  * character deletions (including itself). Two strings within edit
  * distance k ALWAYS share a variant in their k-deletion neighborhoods
  * — substitutions delete both sides' positions, insertions/deletions
  * delete the longer side's — so the candidate set is complete. Sharing
  * a variant does NOT imply closeness (e.g. "ab"/"ba" share "b" at
  * distance 2), so every candidate pair is verified with
  * `levenshtein()` before it is returned. Verification also absolves
  * xxhash64 bucket collisions.
  *
  * Scale design: ONE shuffle builds the variant buckets (groupBy on a
  * fixed-width xxhash64 of the variant — narrow keys, strings ride once
  * per (row, variant)), and candidate pairs are expanded ROW-LOCALLY
  * inside each bucket (`Σ|bucket|²` work, the SemDeDup cell pattern —
  * `Dedup.semanticNearDup`), so the explode/bucket subtree is computed
  * once, not once per join side. Amplification is the neighborhood
  * size: `L+1` variants per row at d=1, `O(L²/2)` at d=2 — the reason
  * this operator targets short key columns, not document bodies
  * (near-dup text belongs to MinHash-LSH / SimHash in [[Dedup]]).
  * A hot variant bucket (shared prefix/suffix boilerplate, very short
  * strings) would produce B² candidate pairs; `maxBucket` fails fast
  * with a clear message instead of letting one bucket dominate the
  * stage — same production guard as `Dedup.banded`, but erroring rather
  * than dropping because dropping would silently lose true matches.
  * Its safe value scales with data volume: buckets grow with corpus
  * size, so surface it from the query definition and raise it
  * proportionally at larger SFs rather than treating 10k as universal.
  */
object FuzzyJoin {

  /** Single-deletion neighborhood as one row-local array column:
    * position i in 0..len-1 deletes character i+1; position len keeps
    * the string itself (the 0-deletion variant). */
  private val d1Sql =
    "transform(sequence(0, length(__fz_s)), i -> " +
      "concat(substring(__fz_s, 1, i), substring(__fz_s, i + 2, 2147483646)))"

  /** Two-deletion variants: delete 1-based positions i < j. Guarded for
    * len < 2 (Spark's `sequence(a, b)` runs DESCENDING when a > b, so an
    * unguarded range would fabricate variants). */
  private val d2Sql =
    "CASE WHEN length(__fz_s) < 2 THEN array() " +
      "ELSE flatten(transform(sequence(1, length(__fz_s) - 1), i -> " +
      "transform(sequence(i + 1, length(__fz_s)), j -> " +
      "concat(substring(__fz_s, 1, i - 1), substring(__fz_s, i + 1, j - i - 1), " +
      "substring(__fz_s, j + 1, 2147483646))))) END"

  private def neighborhoodSql(maxDist: Int): String = maxDist match {
    case 1 => s"array_distinct($d1Sql)"
    case 2 => s"array_distinct(concat($d1Sql, $d2Sql))"
    case d => throw new IllegalArgumentException(
      s"FuzzyJoin: maxDist=$d unsupported (1 or 2; larger neighborhoods explode combinatorially)")
  }

  /** All pairs (a, b) with a.id < b.id and levenshtein <= `maxDist`.
    * Output: `a_id, b_id, a_str, b_str, dist` — exact, ordered by the
    * caller if needed.
    *
    * @param maxBucket fail-fast ceiling on a single variant bucket
    *                  (candidate pairs per bucket grow quadratically);
    *                  scale with corpus size. */
  def selfJoin(df: DataFrame, idCol: String, strCol: String, maxDist: Int,
               maxBucket: Int = 10000): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("__fz_id"), col(strCol).as("__fz_s"))
      .where(col("__fz_s").isNotNull)
    val exploded = base
      .select(col("__fz_id"), col("__fz_s"),
        explode(expr(neighborhoodSql(maxDist))).as("__fz_v"))
      .select(col("__fz_id"), col("__fz_s"), xxhash64(col("__fz_v")).as("__fz_h"))
    // one shuffle: variants → buckets. The size guard is woven into the
    // rows column itself (not a side column) so pruning can never
    // optimize the check away; >= 2 drops the (dominant) singleton mass
    // before any pair work.
    val buckets = exploded
      .groupBy(col("__fz_h"))
      .agg(collect_list(struct(col("__fz_id").as("id"), col("__fz_s").as("s"))).as("__rows"))
      .where(size(col("__rows")) >= 2)
      .select(
        when(size(col("__rows")) <= maxBucket, col("__rows"))
          .otherwise(raise_error(
            lit(s"FuzzyJoin: variant bucket exceeds maxBucket=$maxBucket" +
              " — raise maxBucket or restrict the key column")))
          .as("__rows"))
    // row-local i<j expansion within the bucket (bounded by maxBucket²),
    // via the native streaming generator (PairExpressions) — the HOF
    // chain it replaces paid interpreted dispatch + O(|bucket|) slice
    // copies per outer index
    val pairs = buckets
      .select(graft.functions.PairExpressions.pairSelf(col("__rows")).as(Seq("__x", "__y")))
      .select(when(col("__x.id") < col("__y.id"),
          struct(col("__x.id").as("id1"), col("__y.id").as("id2"),
            col("__x.s").as("s1"), col("__y.s").as("s2")))
        .otherwise(struct(col("__y.id").as("id1"), col("__x.id").as("id2"),
          col("__y.s").as("s1"), col("__x.s").as("s2"))).as("p"))
      .select(col("p.id1").as("a_id"), col("p.id2").as("b_id"),
        col("p.s1").as("a_str"), col("p.s2").as("b_str"))
      .where(col("a_id") =!= col("b_id"))
    // length filter BEFORE the distinct: it's row-local and cheap, so
    // incompatible candidates never enter the dedup shuffle. The DP runs
    // once per surviving pair (filtering on a separate levenshtein call
    // would evaluate it twice — subexpression elimination does not span
    // Filter and Project) and is THRESHOLDED: the 3-arg levenshtein
    // computes a banded O(maxDist·L) DP with early exit, returning the
    // exact distance when ≤ maxDist and -1 past it — identical output
    // for every kept row, a fraction of the full O(L²) table per
    // candidate.
    pairs
      .where(abs(length(col("a_str")) - length(col("b_str"))) <= maxDist)
      .distinct()
      .withColumn("dist", levenshtein(col("a_str"), col("b_str"), maxDist).cast("long"))
      .where(col("dist").between(0, maxDist))
  }

  /** Record linkage across TWO tables: all (a, b) pairs with
    * `levenshtein(a.str, b.str) <= maxDist` — the A-vs-B variant of
    * [[selfJoin]] (match a dirty feed against a clean reference, not a
    * table against itself). Same FastSS blocking and same single
    * groupBy-collect shuffle: both sides' variants land in one bucket
    * frame tagged by side, pairs expand row-locally across the tag split
    * only (|A-side|·|B-side| per bucket, never within a side).
    * Output: `a_id, b_id, a_str, b_str, dist`. */
  def linkJoin(left: DataFrame, right: DataFrame,
               leftId: String, leftStr: String, rightId: String, rightStr: String,
               maxDist: Int, maxBucket: Int = 10000): DataFrame = {
    def sided(df: DataFrame, idCol: String, strCol: String, tag: Int): DataFrame = df
      .select(col(idCol).cast("long").as("__fz_id"), col(strCol).as("__fz_s"),
        lit(tag).as("__fz_t"))
      .where(col("__fz_s").isNotNull)
      .select(col("__fz_id"), col("__fz_s"), col("__fz_t"),
        explode(expr(neighborhoodSql(maxDist))).as("__fz_v"))
      .select(col("__fz_id"), col("__fz_s"), col("__fz_t"),
        xxhash64(col("__fz_v")).as("__fz_h"))
    val exploded = sided(left, leftId, leftStr, 0)
      .unionByName(sided(right, rightId, rightStr, 1))
    val buckets = exploded
      .groupBy(col("__fz_h"))
      .agg(
        collect_list(when(col("__fz_t") === 0,
          struct(col("__fz_id").as("id"), col("__fz_s").as("s")))).as("__as"),
        collect_list(when(col("__fz_t") === 1,
          struct(col("__fz_id").as("id"), col("__fz_s").as("s")))).as("__bs"))
      .where(size(col("__as")) >= 1 && size(col("__bs")) >= 1)
      .select(
        when(size(col("__as")) + size(col("__bs")) <= maxBucket,
          struct(col("__as"), col("__bs")))
          .otherwise(raise_error(
            lit(s"FuzzyJoin: variant bucket exceeds maxBucket=$maxBucket" +
              " — raise maxBucket or restrict the key columns")))
          .as("__ab"))
    buckets
      // native A×B cross generator (PairExpressions) — same emission
      // order as the nested-transform chain it replaces
      .select(graft.functions.PairExpressions.pairCross(
        col("__ab.__as"), col("__ab.__bs")).as(Seq("__x", "__y")))
      .select(col("__x.id").as("a_id"), col("__y.id").as("b_id"),
        col("__x.s").as("a_str"), col("__y.s").as("b_str"))
      .where(abs(length(col("a_str")) - length(col("b_str"))) <= maxDist)
      .distinct()
      // one banded thresholded DP per pair (see selfJoin)
      .withColumn("dist", levenshtein(col("a_str"), col("b_str"), maxDist).cast("long"))
      .where(col("dist").between(0, maxDist))
  }

  /** Distance-1 fuzzy self-join (typo-level entity resolution). */
  def selfJoinDist1(df: DataFrame, idCol: String, strCol: String,
                    maxBucket: Int = 10000): DataFrame =
    selfJoin(df, idCol, strCol, maxDist = 1, maxBucket)

  /** Distance-2 fuzzy self-join — realistic typo distance; the
    * neighborhood is O(L²/2) variants per row, so keep the key short. */
  def selfJoinDist2(df: DataFrame, idCol: String, strCol: String,
                    maxBucket: Int = 10000): DataFrame =
    selfJoin(df, idCol, strCol, maxDist = 2, maxBucket)
}
