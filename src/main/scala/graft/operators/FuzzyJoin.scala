package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Edit-distance self-join (fuzzy matching) for entity resolution over
  * short keys — names, titles, codes. Finds every pair of rows whose
  * strings are within Levenshtein distance 1, without the quadratic
  * all-pairs comparison.
  *
  * Blocking is the FastSS deletion neighborhood (Bocek et al. 2007):
  * each string emits itself plus every single-character deletion. Two
  * strings within edit distance 1 ALWAYS share a variant —
  * substitution at i: both i-deletions are equal; insertion/deletion:
  * the longer string's deletion equals the shorter string itself — so
  * the candidate set is complete. Sharing a variant does NOT imply
  * distance <= 1 (e.g. "ab"/"ba" share "b" at distance 2), so every
  * candidate pair is verified with `levenshtein()` before it is
  * returned. Verification also absolves xxhash64 bucket collisions.
  *
  * Scale design: the only shuffle is the variant-bucket self-join, and
  * buckets are joined on a fixed-width xxhash64 of the variant (narrow
  * shuffle keys, strings ride once per side). Amplification is
  * `length + 1` rows per input row — the reason this operator targets
  * short key columns, not document bodies (near-dup text belongs to
  * MinHash-LSH / SimHash in [[Dedup]]). A hot variant bucket (shared
  * prefix/suffix boilerplate, very short strings) would produce B^2
  * candidate pairs; `maxBucket` fails fast with a clear message instead
  * of letting one bucket dominate the stage — same production guard as
  * `Dedup.banded`, but erroring rather than dropping because dropping
  * would silently lose true matches.
  */
object FuzzyJoin {

  /** The deletion neighborhood as one row-local array column:
    * position i in 0..len-1 deletes character i+1; position len keeps
    * the string itself (the 0-deletion variant). */
  private val neighborhoodSql =
    "transform(sequence(0, length(__fz_s)), i -> " +
      "concat(substring(__fz_s, 1, i), substring(__fz_s, i + 2, 2147483646)))"

  /** All pairs (a, b) with a.id < b.id and levenshtein <= 1.
    * Output: `a_id, b_id, a_str, b_str, dist` — exact, ordered by the
    * caller if needed.
    *
    * @param maxBucket fail-fast ceiling on a single variant bucket
    *                  (candidate pairs per bucket grow quadratically). */
  def selfJoinDist1(df: DataFrame, idCol: String, strCol: String,
                    maxBucket: Int = 10000): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("__fz_id"), col(strCol).as("__fz_s"))
      .where(col("__fz_s").isNotNull)
    val exploded = base
      .select(col("__fz_id"), col("__fz_s"),
        explode(expr(neighborhoodSql)).as("__fz_v"))
      .select(col("__fz_id"), col("__fz_s"), xxhash64(col("__fz_v")).as("__fz_h"))
    // bucket-size guard rides the same hash partitioning as the join —
    // a window count adds a sort, not a second exchange. The guard is
    // woven INTO the join key (not a side column) so column pruning can
    // never optimize the check away.
    val guarded = exploded
      .withColumn("__fz_n", count(lit(1)).over(Window.partitionBy(col("__fz_h"))))
      .select(col("__fz_id"), col("__fz_s"),
        when(col("__fz_n") <= maxBucket, col("__fz_h"))
          .otherwise(raise_error(
            lit(s"FuzzyJoin: variant bucket exceeds maxBucket=$maxBucket" +
              " — raise maxBucket or restrict the key column")))
          .as("__fz_h"))
    val a = guarded.select(col("__fz_h"),
      col("__fz_id").as("a_id"), col("__fz_s").as("a_str"))
    val b = guarded.select(col("__fz_h"),
      col("__fz_id").as("b_id"), col("__fz_s").as("b_str"))
    a.join(b, Seq("__fz_h"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("a_str"), col("b_str"))
      .distinct()
      .where(abs(length(col("a_str")) - length(col("b_str"))) <= 1 &&
        levenshtein(col("a_str"), col("b_str")) <= 1)
      .withColumn("dist", levenshtein(col("a_str"), col("b_str")).cast("long"))
  }
}
