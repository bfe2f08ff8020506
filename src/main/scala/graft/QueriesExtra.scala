package graft

import org.apache.spark.sql.functions._
import graft.Queries.QueryDef
import graft.multimodal.BinaryPipeline
import graft.operators.{AnnLsh, SimHash}

/** SURVEY.md §2.2 approximate operators (rows-only gates — semantics not
  * portable to ANSI SQL; accuracy is spec-gated against exact ground
  * truth) + multimodal metadata (oracle-gated). */
object QueriesExtra {

  val defs: Map[String, QueryDef] = Map(

    "q_dedup_simhash" -> QueryDef(
      (s, d) => SimHash.nearDupPairs(Tables.documents(s, d), maxHamming = 3)
        .orderBy(col("id1"), col("id2")),
      None),

    "q_ann_lsh" -> QueryDef(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val q = e.where(col("vec_id") < 4).select(col("vec_id").as("qid"), col("embedding"))
        AnnLsh.topK(e, q, k = 3).orderBy(col("qid"), col("rn"))
      },
      None),

    // HLL++ sketch — engine-specific estimator, so no cross-engine oracle;
    // relative-error bound is spec-gated (ApproxOpsSpec).
    "q_approx_distinct" -> QueryDef(
      (s, d) => Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), 0.02).cast("long").as("approx_users"),
          count(lit(1)).cast("long").as("n_events"))
        .orderBy(col("event_type")),
      None),

    "q_multimodal_meta" -> QueryDef(
      (s, d) => BinaryPipeline.extractFeatures(BinaryPipeline.asMedia(Tables.documents(s, d)))
        .select(col("doc_id"), col("byte_len"), col("content_md5"), col("width"), col("media_type"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, CAST(strlen(text) AS BIGINT) AS byte_len, md5(text) AS content_md5,
             |  CAST(64 + strlen(text) % 1024 AS BIGINT) AS width,
             |  'application/pdf' AS media_type
             |FROM documents ORDER BY doc_id""".stripMargin))
  )
}
