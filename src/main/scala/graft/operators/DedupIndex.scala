package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.wordShingles

/** Persisted MinHash-LSH dedup index — near-dup detection for
  * INCREMENTAL ingest. [[Dedup.minhashLsh]] dedups a corpus against
  * itself; production curation ingests a new batch every day and must
  * answer "which of these documents already exist in the 100 TB
  * corpus?" without touching the corpus text again. The index persists
  * what the corpus pass already computed:
  *
  *  - rows `(bucket_key, doc_id)` where `bucket_key` folds the LSH
  *    (band_id, band_key) pair into ONE column: md5 of the corpus
  *    document's signature slice per band. The expensive part — the
  *    shingle + md5-signature loop over corpus text — is paid once, at
  *    index build;
  *  - written `bucketBy(bucket_key)`: the metastore records the hash
  *    partitioning, so the candidate join reads the index IN PLACE —
  *    only the (small) batch shuffles into the bucket layout, the
  *    corpus-sized side has no exchange (plan-asserted in spec);
  *  - degenerate buckets (boilerplate bands shared by > `maxBucket`
  *    docs) are dropped at write, mirroring
  *    [[Dedup.candidatePairs]]'s quadratic-blowup guard.
  *
  * Search computes the batch's bands row-local, equi-joins the index on
  * `bucket_key`, then verifies candidates with exact word-shingle
  * Jaccard — corpus text is fetched ONLY for candidate ids (a semi
  * join), so the whole check is proportional to the batch and its
  * collision set, never to the corpus.
  */
object DedupIndex {

  /** Row-local banding → the single join/bucket column:
    * `(bucket_key = md5(band_id ':' band_key), <outId>)`. */
  private def keyed(docs: DataFrame, idCol: String, textCol: String, outId: String,
                    shingleN: Int, numPerm: Int, bands: Int): DataFrame =
    Dedup.banded(docs, idCol, textCol, shingleN, numPerm, bands)
      .select(md5(concat(col("band_id").cast("string"), lit(":"), col("band_key")))
        .as("bucket_key"), col(idCol).as(outId))

  /** The shared write body: band once, drop hot buckets with a WINDOW
    * count (ONE evaluation of the expensive banding pipeline — a
    * groupBy+anti-join formulation would compute shingles+signatures
    * twice, once per join branch), bucketed write. */
  private def writeBands(docs: DataFrame, table: String, mode: SaveMode,
                         path: Option[String], idCol: String, textCol: String,
                         shingleN: Int, numPerm: Int, bands: Int,
                         numBuckets: Int, maxBucket: Int): Unit = {
    require(numBuckets >= 1, s"writeIndex: numBuckets must be >= 1, got $numBuckets")
    require(maxBucket >= 1, s"writeIndex: maxBucket must be >= 1, got $maxBucket")
    val k = keyed(docs, idCol, textCol, "doc_id", shingleN, numPerm, bands)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("bucket_key"))
    val writer = k
      .withColumn("__n", count(lit(1)).over(w))
      .where(col("__n") <= maxBucket)
      .drop("__n")
      .write.mode(mode)
      .bucketBy(numBuckets, "bucket_key").sortBy("bucket_key")
      .format("parquet")
    path.fold(writer)(p => writer.option("path", p)).saveAsTable(table)
  }

  /** Build and persist the index for `docs` as bucketed table `table` at
    * `path`. LSH parameters are baked into the index — searches must use
    * the same (shingleN, numPerm, bands), or band keys cannot match. */
  def writeIndex(docs: DataFrame, table: String, path: String,
                 idCol: String = "doc_id", textCol: String = "text",
                 shingleN: Int = 3, numPerm: Int = 16, bands: Int = 8,
                 numBuckets: Int = 16, maxBucket: Int = 1000): Unit =
    writeBands(docs, table, SaveMode.Overwrite, Some(path), idCol, textCol,
      shingleN, numPerm, bands, numBuckets, maxBucket)

  /** Append a (already-deduped) batch's bands to an existing index. The
    * hot-bucket guard applies to THIS batch only; cumulative hot buckets
    * accrete until the next full [[writeIndex]] rebuild — the standard
    * compaction trade of append-only indexes. */
  def appendIndex(docs: DataFrame, table: String,
                  idCol: String = "doc_id", textCol: String = "text",
                  shingleN: Int = 3, numPerm: Int = 16, bands: Int = 8,
                  numBuckets: Int = 16, maxBucket: Int = 1000): Unit =
    writeBands(docs, table, SaveMode.Append, None, idCol, textCol,
      shingleN, numPerm, bands, numBuckets, maxBucket)

  /** LSH candidate pairs `(batch_id, corpus_id)` of `batch` against the
    * index — the index side reads in place (no exchange). */
  def candidates(spark: SparkSession, table: String, batch: DataFrame,
                 idCol: String = "doc_id", textCol: String = "text",
                 shingleN: Int = 3, numPerm: Int = 16, bands: Int = 8): DataFrame =
    keyed(batch, idCol, textCol, "batch_id", shingleN, numPerm, bands)
      .join(spark.table(table).withColumnRenamed("doc_id", "corpus_id"), Seq("bucket_key"))
      .select(col("batch_id"), col("corpus_id"))
      .distinct()

  /** The corpus-partitioning hash used to co-locate verification text
    * with its candidate pruning: `pmod(xxhash64(id), n)`. The SAME Spark
    * expression computes the bucket at corpus-write time
    * ([[graft.streaming.DocStream.incrementalDedupBatch]]) and at
    * search time (over the collected candidate ids), so the two can
    * never disagree on hash function or input type. */
  def idBucket(id: Column, n: Int): Column = pmod(xxhash64(id), lit(n))

  /** Near-dup matches of `batch` against the indexed corpus:
    * `(batch_id, corpus_id, jaccard)` with exact word-shingle Jaccard >=
    * `threshold`. `corpusDocs` supplies text for verification.
    *
    * The candidate set is bounded by construction (≤ batch rows × bands
    * × the index's write-time `maxBucket`), so its corpus-id set is
    * collected and pushed into `corpusDocs` as a STATIC `id IN (...)`
    * filter — it reaches the parquet scan as a pushed data filter
    * (row-group min/max pruning), instead of a semi-join that still
    * SCANS the whole corpus per search. When `idBucketCol = Some((name,
    * n))` and the corpus is written partitioned by
    * `name = idBucket(id, n)`, the candidates' bucket set is also
    * applied as a static partition filter — pruning at the FILE LISTING,
    * the same guarantee [[IvfIndex.searchIndex]] gets from its `cell IN`
    * filter. Above `maxPushdownIds` candidates (a degenerate index —
    * raise `maxBucket` discipline instead) it falls back to the
    * semi-join, which stays correct at any cardinality. */
  def searchIndex(spark: SparkSession, table: String, batch: DataFrame,
                  corpusDocs: DataFrame, threshold: Double,
                  idCol: String = "doc_id", textCol: String = "text",
                  shingleN: Int = 3, numPerm: Int = 16, bands: Int = 8,
                  scale: Int = 4,
                  idBucketCol: Option[(String, Int)] = None,
                  maxPushdownIds: Int = 100000): DataFrame = {
    // materialized once (localCheckpoint, like Dedup.components): the
    // pair set feeds BOTH the result spine and the corpus-id pushdown —
    // left lazy, the banding + index join would run twice. Candidates
    // are collision-set-sized by design, so the checkpoint is small.
    val cand = candidates(spark, table, batch, idCol, textCol, shingleN, numPerm, bands)
      .localCheckpoint(true)
    // one driver fetch covers both prunes: (corpus_id, its bucket). The
    // limit caps what the driver materializes BEFORE the cardinality
    // check — a degenerate index can produce millions of candidates, and
    // the fallback must engage without first collecting them all.
    val candIds = cand.select(col("corpus_id")).distinct()
      .select(col("corpus_id"),
        idBucketCol.fold(lit(0L))(bc => idBucket(col("corpus_id"), bc._2)))
      .limit(maxPushdownIds + 1).collect()
    val verifyDocs =
      if (candIds.length <= maxPushdownIds) {
        val bucketPruned = idBucketCol.fold(corpusDocs) { case (name, _) =>
          corpusDocs.where(col(name).isin(candIds.map(_.get(1)).distinct.toSeq: _*))
        }
        bucketPruned.where(col(idCol).isin(candIds.map(_.get(0)).toSeq: _*))
      } else corpusDocs.join(
        cand.select(col("corpus_id").as(idCol)).distinct(), Seq(idCol), "left_semi")
    val bSh = batch.select(col(idCol).as("batch_id"),
      wordShingles(col(textCol), shingleN).as("__sh1"))
    val cSh = verifyDocs
      .select(col(idCol).as("corpus_id"), wordShingles(col(textCol), shingleN).as("__sh2"))
    cand.join(bSh, Seq("batch_id")).join(cSh, Seq("corpus_id"))
      .withColumn("__inter", size(array_intersect(col("__sh1"), col("__sh2"))).cast("double"))
      .select(col("batch_id"), col("corpus_id"),
        round(col("__inter") /
          (size(col("__sh1")) + size(col("__sh2")) - col("__inter")), scale).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Batch documents with NO near-dup in the index — the rows an
    * incremental ingest keeps (and may then [[appendIndex]]). */
  def novel(spark: SparkSession, table: String, batch: DataFrame,
            corpusDocs: DataFrame, threshold: Double,
            idCol: String = "doc_id", textCol: String = "text",
            shingleN: Int = 3, numPerm: Int = 16, bands: Int = 8,
            idBucketCol: Option[(String, Int)] = None): DataFrame =
    batch.join(
      searchIndex(spark, table, batch, corpusDocs, threshold,
          idCol, textCol, shingleN, numPerm, bands, idBucketCol = idBucketCol)
        .select(col("batch_id").as(idCol)).distinct(),
      Seq(idCol), "left_anti")
}
