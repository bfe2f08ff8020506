package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship on /root/testdata/sf0.001: the reference's end-to-end path —
    * KNN L2 top-5 over the embedding corpus joined back to document text
    * (the Spark-native `ORDER BY embedding <-> q LIMIT 5`,
    * SSEOpenAIController.findMostSimilarString), plus the summary prompt
    * the reference would send per hit (createChatMessages). */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val e = Tables.embeddings(spark, d)
    val hits = operators.Knn.topK(e, e.where(col("vec_id") === 0), operators.Knn.L2, 5)
    hits.join(Tables.documents(spark, d), col("vec_id") === col("doc_id"), "left")
      .select(col("vec_id"), col("dist"), col("text"), col("source"),
        functions.PromptFunctions.summaryPrompt(
          functions.TextFunctions.normalizeText(col("text")), lit("vector search")).as("prompt"))
      .orderBy(col("dist"), col("vec_id"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
