package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.SparseKnn
import graft.streaming.SparseStream

/** Streaming sparse postings ingest: streamed docs searchable as soon as
  * their batch commits, base+tail scoring identical to a one-shot index
  * over the full corpus, crash replay convergent. */
class SparseStreamSpec extends SparkSpec {

  private val featurize: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
    df => SparseKnn.hashingTf(df, dim = 256)

  test("stream into the tail; base+tail == one-shot rebuild; replay converges") {
    val docs = Tables.documents(spark, sfDir)
    val tail = Files.createTempDirectory("spstream_tail").toString
    val in = Files.createTempDirectory("spstream_in").toString
    val ckpt = Files.createTempDirectory("spstream_ckpt").toString
    try {
      // base index over docs 100+; stream the held-out 0..99 in
      SparseKnn.writeIndex(featurize(docs.where(col("doc_id") >= 100)),
        "t_spst_base", s"$tail/../base_idx", numBuckets = 4)
      docs.where(col("doc_id") < 100).select(col("doc_id"), col("text"))
        .write.mode("append").parquet(in)
      val q = SparseStream.startPostingsIngest(spark, in, tail, ckpt, featurize,
        availableNow = true)
      try q.awaitTermination() finally q.stop()

      // streamed docs are searchable: self-query ranks self first at cos 1
      val qs = featurize(docs.where(col("doc_id") < 3))
        .select(col("doc_id").as("qid"), col("indices"), col("values"))
      val withTail = SparseStream.topKWithTail(spark, "t_spst_base", tail, qs, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      withTail.filter(_._4 == 1L).foreach { case (qid, id, c, _) =>
        assert(id == qid && c == 1.0, s"streamed doc $qid not its own top hit")
      }

      // base+tail scores == one-shot index over the full corpus
      SparseKnn.writeIndex(featurize(docs), "t_spst_full", s"$tail/../full_idx",
        numBuckets = 4)
      val oneShot = SparseKnn.topKFromIndex(spark, "t_spst_full", qs, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      assert(withTail == oneShot && withTail.nonEmpty)

      // replay: the same batch id overwrites its own partition, twice ==
      // once — exercised on a fresh tail so convergence composes with
      // scoring (re-streaming ALREADY-INGESTED docs under a NEW batch id
      // is a producer duplicate, not a replay, and is out of contract)
      val tail2 = Files.createTempDirectory("spstream_tail2").toString
      val replay = docs.where(col("doc_id") < 50).select(col("doc_id"), col("text"))
      SparseStream.postingsIngestBatch(tail2, featurize)(replay, 99L)
      val afterOnce = spark.read.parquet(tail2).count()
      SparseStream.postingsIngestBatch(tail2, featurize)(replay, 99L)
      assert(spark.read.parquet(tail2).count() == afterOnce,
        "replayed batch must overwrite its partition, not append")
      // duplicate-free postings: every score is a valid cosine (a dup
      // posting row would push the self-hit past 1.0)
      val rep = SparseStream.topKWithTail(spark, "t_spst_base", tail2, qs, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      rep.filter(_._4 == 1L).foreach { case (qid, id, c, _) =>
        assert(id == qid && c == 1.0)
      }
      assert(rep.forall(_._3 <= 1.0))

      // cold tail degrades to base-only
      val baseOnly = SparseStream.topKWithTail(spark, "t_spst_base",
        s"$tail/../no_such_tail", qs, k = 5)
      assert(baseOnly.count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS t_spst_base")
      spark.sql("DROP TABLE IF EXISTS t_spst_full")
    }
  }
}
