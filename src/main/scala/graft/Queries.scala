package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.operators.{Dedup, Knn}

/** The query registry behind SparkEntry: every SURVEY.md §2 row with an
  * `oracle` gate appears here as a (Spark query, DuckDB oracle SQL) pair.
  *
  * Oracle-parity rules (see SURVEY.md §4): cross-engine-stable primitives
  * only (md5 / regexp / arithmetic); doubles rounded before compare;
  * every result explicitly ordered with key tiebreaks; numeric outputs
  * cast to BIGINT/DOUBLE on both sides.
  */
object Queries {

  final case class QueryDef(run: (SparkSession, String) => DataFrame, oracle: Option[String])

  /** Canonical-text expression, oracle side (mirrors TextFunctions.canonicalText). */
  private val canonSql =
    """lower(trim(regexp_replace(replace(text, chr(10), ' '), '[\s\x0b]{2,}', ' ', 'g')))"""

  def defs: Map[String, QueryDef] =
    coreDefs ++ QueriesPipeline.defs ++ QueriesAnalytics.defs ++ QueriesExtra.defs ++
      QueriesAdvanced.defs ++ QueriesSearch.defs ++ QueriesCuration.defs ++
      QueriesPartsupp.defs

  private val coreDefs: Map[String, QueryDef] = Map(

    // ── §2.3 analytics ────────────────────────────────────────────────
    "q1_agg" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).cast("long").as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  round(sum(l_extendedprice), 2) AS sum_base_price,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
             |  round(avg(l_quantity), 4) AS avg_qty,
             |  round(avg(l_extendedprice), 4) AS avg_price,
             |  round(avg(l_discount), 4) AS avg_disc,
             |  count(*) AS count_order
             |FROM lineitem
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ── §2.1 KNN (pgvector <-> / <=> / <#>) ──────────────────────────
    "q_knn_l2" -> QueryDef(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Knn.topK(e, e.where(col("vec_id") === 0), Knn.L2, 5)
      },
      Some("""SELECT e.vec_id, round(list_distance(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) AS dist
             |FROM embeddings e CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
             |ORDER BY dist, vec_id LIMIT 5""".stripMargin)),

    "q_knn_cosine" -> QueryDef(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Knn.topK(e, e.where(col("vec_id") === 0), Knn.Cosine, 5)
      },
      Some("""SELECT e.vec_id, round(1 - list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) AS dist
             |FROM embeddings e CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
             |ORDER BY dist, vec_id LIMIT 5""".stripMargin)),

    "q_knn_ip" -> QueryDef(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Knn.topK(e, e.where(col("vec_id") === 0), Knn.InnerProduct, 5)
      },
      Some("""SELECT e.vec_id, round(-list_inner_product(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) AS dist
             |FROM embeddings e CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
             |ORDER BY dist, vec_id LIMIT 5""".stripMargin)),

    // pgvector 0.7 <+> (vector_l1_ops): Manhattan-distance KNN — the
    // last of pgvector's dense distance opclasses. Exact sum of absolute
    // differences on both engines, rounded 4dp, ties by id.
    "q_knn_l1" -> QueryDef(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Knn.topK(e, e.where(col("vec_id") === 0), Knn.L1, 5)
      },
      Some("""SELECT e.vec_id,
             |  round(list_sum([abs(e.embedding[i] - q.embedding[i])
             |    for i in range(1, len(e.embedding) + 1)]), 4) AS dist
             |FROM embeddings e CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
             |ORDER BY dist, vec_id LIMIT 5""".stripMargin)),

    // ── §2.1 text normalization ──────────────────────────────────────
    "q_text_normalize" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          length(normalizeText(col("text"))).cast("long").as("norm_len"),
          md5(normalizeText(col("text"))).as("norm_md5"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  length(regexp_replace(replace(text, chr(10), ' '), '[\s\x0b]{2,}', ' ', 'g')) AS norm_len,
             |  md5(regexp_replace(replace(text, chr(10), ' '), '[\s\x0b]{2,}', ' ', 'g')) AS norm_md5
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ── §2.2 exact dedup (corpus ∪ re-crawled copy) ──────────────────
    "q_dedup_exact" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val dup = docs.unionAll(docs.select((col("doc_id") + 100000).as("doc_id"), col("text")))
        Dedup.exact(dup)
          .select(col("fp"), col("canonical_id"), col("n_copies"))
          .orderBy(col("canonical_id"))
      },
      Some(s"""WITH input AS (
              |  SELECT doc_id, text FROM documents
              |  UNION ALL SELECT doc_id + 100000, text FROM documents)
              |SELECT md5($canonSql) AS fp, min(doc_id) AS canonical_id, count(*) AS n_copies
              |FROM input GROUP BY 1 ORDER BY canonical_id""".stripMargin)),

    // ── §2.2 token counting ──────────────────────────────────────────
    "q_token_count" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          wsTokenCount(col("text")).cast("long").as("ws_tokens"),
          bpeTokenCount(col("text")).cast("long").as("bpe_tokens"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
              |  len(string_split($canonSql, ' ')) AS ws_tokens,
              |  len(regexp_extract_all($canonSql, '\\w+|[^\\w\\s]')) AS bpe_tokens
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // ── §2.2 fingerprinting ──────────────────────────────────────────
    "q_fingerprint" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          fingerprint(col("text")).as("fp"),
          fingerprintShort(col("text")).as("fp16"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id, md5($canonSql) AS fp, substr(md5($canonSql), 1, 16) AS fp16
              |FROM documents ORDER BY doc_id""".stripMargin))
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map { case (k, v) => k -> v.run }

  def oracleSql: Map[String, String] =
    defs.collect { case (k, v) if v.oracle.isDefined => k -> v.oracle.get }
}
