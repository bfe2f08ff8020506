package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Ad-hoc stage timing probe (not part of the driver contract). */
object Perf {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[perf] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, d)
    val emb = Tables.embeddings(spark, d)

    time("warmup (scan+count)") { docs.count(); emb.count() }
    time("shingles.count") {
      docs.select(graft.functions.TextFunctions.wordShingles(col("text")).as("sh"))
        .selectExpr("size(sh)").agg(sum(col("size(sh)"))).head()
    }
    val banded = Dedup.banded(docs, "doc_id", "text", 3, 16, 8)
    time("banded.count")(banded.count())
    val cand = Dedup.candidatePairs(docs)
    time("candidatePairs.count")(cand.count())
    time("minhashLsh.count")(Dedup.minhashLsh(docs, 0.8).count())
    time("embNearDup.count")(Dedup.embeddingNearDup(emb, 0.4).count())
    spark.stop()
  }
}
