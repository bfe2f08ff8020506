package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Embedder, PdfPipeline}

class PipelineSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sfDir)

  test("page extraction round-trips the document text") {
    val pages = PdfPipeline.extractPages(
      docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("content")), pageSize = 200)
    // every document must be covered (inner join below would hide drops)
    assert(pages.select(countDistinct(col("doc_id"))).head().getLong(0) == 500L)
    // rebuild in explicit page order — collect_list order is not contractual
    val joined = pages.groupBy(col("doc_id"))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("page_no"), col("page_text")))),
        s => s.getField("page_text")), "").as("rebuilt"))
      .join(docs, "doc_id")
      .where(col("rebuilt") =!= col("text"))
    assert(joined.count() == 0)
  }

  test("chunk rows cover every document, indices contiguous from 0") {
    val ch = PdfPipeline.chunkRows(docs, 200, 60)
    assert(ch.select(countDistinct(col("doc_id"))).head().getLong(0) == 500L)
    val bad = ch.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), max(col("chunk_idx")).as("mx"), min(col("chunk_idx")).as("mn"))
      .where(col("mn") =!= 0 || col("mx") =!= col("n") - 1)
    assert(bad.count() == 0)
  }

  test("status table: deterministic ids, lifecycle values only, registered+failed partition it") {
    val st = PdfPipeline.statusTable(PdfPipeline.chunkRows(docs, 200, 60)).cache()
    val n = st.count()
    assert(n > 500, s"expected one row per chunk of 500 multi-chunk docs, got $n")
    assert(st.select("id").distinct().count() == n)
    val statuses = st.select("status").distinct().collect().map(_.getString(0)).toSet
    assert(statuses.subsetOf(PdfPipeline.Statuses.toSet))
    assert(PdfPipeline.registered(st).count() + PdfPipeline.failed(st).count() == n)
    st.unpersist()
  }

  test("runWithStatus: transition log terminal == statusTable, store rows == inserted chunks") {
    val (store, transitions) = PdfPipeline.runWithStatus(docs, maxLen = 200, lookback = 60)
    val tr = transitions.cache()
    // coupling invariant: the LAST transition of every chunk's log is
    // exactly the current-status row statusTable derives
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("id")).orderBy(col("seq").desc)
    val terminal = tr.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("id"), col("status"))
    val st = PdfPipeline.statusTable(PdfPipeline.chunkRows(docs, 200, 60))
      .select(col("id"), col("status"))
    assert(terminal.exceptAll(st).isEmpty && st.exceptAll(terminal).isEmpty)
    // every log starts at page_separate_finished
    assert(tr.where(col("seq") === 0 && col("status") =!= "page_separate_finished").count() == 0)
    // store rows exist exactly for logs that reached finish_db_insertion
    val inserted = tr.where(col("status") === "finish_db_insertion")
      .select(col("id")).distinct()
    val stored = store.select(col("id")).distinct()
    assert(stored.exceptAll(inserted).isEmpty && inserted.exceptAll(stored).isEmpty)
    // store rows carry real embeddings at the configured dim
    assert(store.select(size(col("embedding"))).distinct().collect().map(_.getInt(0)).toSeq == Seq(64))
    tr.unpersist()
  }

  test("embedder: deterministic, unit-norm, dim-stable, batched") {
    val e1 = Embedder.embedText("the quick brown fox", 64)
    val e2 = Embedder.embedText("the quick brown fox", 64)
    assert(e1.toSeq == e2.toSeq)
    assert(math.abs(e1.map(x => x * x).sum - 1.0) < 1e-5)
    val emb = Embedder.embed(docs.select(col("doc_id"), col("text")), textCol = "text", dim = 32)
    val row = emb.select(size(col("embedding"))).distinct().collect()
    assert(row.map(_.getInt(0)).toSeq == Seq(32))
  }

  test("pooled document vectors are dim-ordered elementwise sums of their chunks") {
    import org.apache.spark.sql.functions._
    val chunks = Tables.embeddings(spark, sfDir)
      .select(expr("vec_id div 10").as("doc_id"), col("vec_id"), col("embedding"))
    val pooled = graft.pipeline.Embedder.pooledVectors(chunks, "doc_id")
      .where(col("doc_id") === 0)
      .select("embedding").head().getSeq[Double](0)
    val manual: Seq[Seq[Double]] = chunks.where(col("doc_id") === 0)
      .select(col("embedding").cast("array<decimal(18,6)>")).collect().toSeq
      .map(_.getSeq[java.math.BigDecimal](0).toSeq.map(_.doubleValue))
    val expect = manual.transpose.map(_.sum)
    assert(pooled.length == expect.length)
    pooled.zip(expect).foreach { case (a, b) => assert(math.abs(a - b) < 1e-6, s"$a vs $b") }
  }
}
