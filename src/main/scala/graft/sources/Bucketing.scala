package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Native Spark bucketing for co-located joins — the layout decision that
  * kills the biggest shuffle at 100 TB: write both fact tables bucketed
  * (and sorted) by the join key with the SAME bucket count, and every
  * subsequent equi-join on that key is shuffle-free — each task zips
  * bucket i of one table with bucket i of the other. For a pipeline that
  * repeatedly joins chunks ↔ embeddings ↔ scores on doc_id, paying one
  * bucketed write amortizes the exchange out of every downstream join.
  *
  * (VectorStore keeps its explicit hash-bucket COLUMN for partition-dir
  * pruning of KNN probes; this is the complementary Spark-native layout
  * for join co-location — metastore-tracked, so Catalyst proves the
  * partitioning and drops the Exchange at plan time.)
  */
object Bucketing {

  /** Write `df` as a bucketed external table, bucketed AND sorted by
    * `key` into `numBuckets` buckets at `path`. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, numBuckets: Int): Unit = {
    require(numBuckets >= 1, s"writeBucketed: numBuckets must be >= 1, got $numBuckets")
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Equi-join two tables previously written by [[writeBucketed]] with
    * matching bucket counts on `key` — plans with zero shuffle exchanges
    * (asserted in BucketingSpec). */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
