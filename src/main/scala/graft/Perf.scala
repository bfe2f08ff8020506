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

    // scale probe: 20x replicated corpus (10k docs, every doc a 20-way
    // exact-dup cluster → heavy pair load) through the full LSH dedup
    val big = (0 until 20).map(i =>
        docs.select((col("doc_id") + i * 100000).as("doc_id"), col("text")))
      .reduce(_ unionAll _)
    time("minhashLsh.20x (10k docs)")(Dedup.minhashLsh(big, 0.8).count())
    time("knn.20x (10k vectors)") {
      val bigE = (0 until 20).map(i =>
          emb.select((col("vec_id") + i * 100000).as("vec_id"), col("embedding")))
        .reduce(_ unionAll _)
      graft.operators.Knn.topK(bigE, bigE.where(col("vec_id") === 0), graft.operators.Knn.L2, 5).count()
    }
    // throughput probes: replicate via crossJoin(range) — one scan, one
    // codegen span — then score through the kernel (TakeOrderedAndProject)
    for (copies <- Seq(200, 2000)) {
      time(s"knn.${copies}x (${copies / 2}k vectors)") {
        val bigE = emb.crossJoin(spark.range(copies))
          .select((col("vec_id") + col("id") * 100000).as("vec_id"), col("embedding"))
        graft.operators.Knn.topK(bigE, emb.where(col("vec_id") === 0),
          graft.operators.Knn.L2, 5).count()
      }
    }
    spark.stop()
  }
}
