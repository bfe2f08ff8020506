package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions

/** Deduplication family for training-data pipelines: exact content-hash,
  * MinHash+LSH near-dup, exact n-gram Jaccard (LSH-blocked), and
  * embedding-cosine near-dup.
  *
  * Cross-engine reproducibility: MinHash permutations are
  * `min(md5(shingle || '#' || seed))` under lexicographic string order —
  * md5 is identical everywhere, so the DuckDB oracle replays signatures
  * bit-for-bit. (xxhash64 would be ~2× faster but is Spark-private; the
  * md5 variant keeps the correctness gate honest. Both run row-local.)
  *
  * Scale design: signatures and bands are computed row-local in one
  * projection (no explode-before-hash shuffle). The ONLY shuffle is the
  * band-bucket self-join; degenerate buckets are capped by `maxBucket`
  * (drop + count, the standard production guard against quadratic blowup
  * on boilerplate-heavy corpora).
  */
object Dedup {

  /** Exact dedup: group by content fingerprint, keep the smallest id as
    * canonical. Map-side partial aggregation makes this one shuffle of
    * (hash → id) pairs only. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol), fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).cast("long").as("canonical_id"),
           count(lit(1)).cast("long").as("n_copies"))

  /** Row-local MinHash signature columns for `numPerm` permutations. */
  def minhashSignature(shingles: Column, numPerm: Int): Seq[Column] =
    (0 until numPerm).map { j =>
      array_min(transform(shingles, s => md5(concat(s, lit("#" + j)))))
    }

  /** (band_id, band_key) pairs for LSH banding: `bands` bands of
    * `numPerm / bands` signature rows each, keyed by md5 of the
    * concatenated band slice. */
  def bandKeys(sig: Seq[Column], bands: Int): Column = {
    val r = sig.length / bands
    array((0 until bands).map { b =>
      struct(lit(b).cast("long").as("band_id"),
        md5(concat_ws("|", sig.slice(b * r, b * r + r): _*)).as("band_key"))
    }: _*)
  }

  /** doc_id → exploded (band_id, band_key) rows. */
  def banded(docs: DataFrame, idCol: String, textCol: String,
             shingleN: Int, numPerm: Int, bands: Int): DataFrame = {
    val sh = wordShingles(col(textCol), shingleN)
    docs.select(col(idCol),
        explode(bandKeys(minhashSignature(sh, numPerm), bands)).as("band"))
      .select(col(idCol), col("band.band_id").as("band_id"), col("band.band_key").as("band_key"))
  }

  /** Candidate pairs from LSH banding (distinct, id1 < id2). The self-join
    * shuffles only (id, band_key) rows; `maxBucket` drops degenerate
    * buckets to bound the quadratic pair fanout. */
  def candidatePairs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                     shingleN: Int = 3, numPerm: Int = 16, bands: Int = 8,
                     maxBucket: Int = 1000): DataFrame = {
    val b = banded(docs, idCol, textCol, shingleN, numPerm, bands)
    val guarded = b.withColumn("__n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("band_id"), col("band_key"))))
      .where(col("__n") <= maxBucket).drop("__n")
    val l = guarded.select(col("band_id"), col("band_key"), col(idCol).as("id1"))
    val r = guarded.select(col("band_id"), col("band_key"), col(idCol).as("id2"))
    l.join(r, Seq("band_id", "band_key"))
      .where(col("id1") < col("id2"))
      .select(col("id1"), col("id2"))
      .distinct()
  }

  /** Exact word-shingle Jaccard for given pairs (sets are distinct, so
    * |a∪b| = |a|+|b|−|a∩b| — one array_intersect per pair). */
  def jaccardVerify(pairs: DataFrame, docs: DataFrame,
                    idCol: String = "doc_id", textCol: String = "text",
                    shingleN: Int = 3, scale: Int = 4): DataFrame = {
    val sh = docs.select(col(idCol).as("__id"), wordShingles(col(textCol), shingleN).as("__sh"))
    pairs
      .join(sh.select(col("__id").as("id1"), col("__sh").as("sh1")), Seq("id1"))
      .join(sh.select(col("__id").as("id2"), col("__sh").as("sh2")), Seq("id2"))
      .withColumn("__inter", size(array_intersect(col("sh1"), col("sh2"))).cast("double"))
      .select(col("id1"), col("id2"),
        round(col("__inter") / (size(col("sh1")) + size(col("sh2")) - col("__inter")), scale).as("jaccard"))
  }

  /** MinHash-LSH near-dup pairs with exact-Jaccard verification ≥ threshold. */
  def minhashLsh(docs: DataFrame, threshold: Double,
                 idCol: String = "doc_id", textCol: String = "text",
                 shingleN: Int = 3, numPerm: Int = 16, bands: Int = 8): DataFrame =
    jaccardVerify(candidatePairs(docs, idCol, textCol, shingleN, numPerm, bands),
        docs, idCol, textCol, shingleN)
      .where(col("jaccard") >= threshold)

  /** Embedding-cosine near-dup pairs. `exhaustive = true` scores all pairs
    * (oracle-exact; fine at verification SF). The scale path feeds LSH
    * candidate buckets (AnnLsh) into the same verify. */
  def embeddingNearDup(emb: DataFrame, threshold: Double,
                       idCol: String = "vec_id", embCol: String = "embedding",
                       scale: Int = 4): DataFrame = {
    val l = emb.select(col(idCol).as("id1"), col(embCol).as("e1"))
    val r = emb.select(col(idCol).as("id2"), col(embCol).as("e2"))
    l.crossJoin(r).where(col("id1") < col("id2"))
      .withColumn("cos", round(VectorFunctions.cosineSimilarity(col("e1"), col("e2")), scale))
      .where(col("cos") >= threshold)
      .select(col("id1"), col("id2"), col("cos"))
  }
}
