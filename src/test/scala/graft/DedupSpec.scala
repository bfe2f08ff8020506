package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpec {

  test("exact dedup collapses duplicated corpus to one canonical row per text") {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val doubled = docs.unionAll(docs.select((col("doc_id") + 10000).as("doc_id"), col("text")))
    val res = Dedup.exact(doubled).collect()
    assert(res.length == 500)
    assert(res.forall(_.getLong(2) == 2L))   // every group has the 2 copies
    assert(res.forall(_.getLong(1) < 10000)) // canonical id is the original
  }

  test("minhash-LSH finds exactly the high-Jaccard planted pairs (recall = exact)") {
    val docs = Tables.documents(spark, sfDir)
    val lsh = Dedup.minhashLsh(docs, threshold = 0.8).select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force ground truth over all pairs
    val exact = Dedup.jaccardVerify(
        docs.select(col("doc_id").as("id1")).crossJoin(docs.select(col("doc_id").as("id2")))
          .where(col("id1") < col("id2")), docs)
      .where(col("jaccard") >= 0.8)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(lsh == exact)
  }

  test("embedding near-dup is symmetric-free (id1 < id2) and thresholded") {
    val res = Dedup.embeddingNearDup(Tables.embeddings(spark, sfDir), 0.4).collect()
    assert(res.nonEmpty)
    assert(res.forall(r => r.getLong(0) < r.getLong(1)))
    assert(res.forall(_.getDouble(2) >= 0.4))
  }
}
