package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.pipeline.WarcPipeline
import graft.streaming.WarcStream

/** Streaming WARC ingest: real record walk per micro-batch, parity
  * with the batch extraction path, replay idempotence, and the
  * poison-input loud-failure contract. */
class WarcStreamSpec extends SparkSpec {

  test("streamed WARCs extract; replay converges; poison fails loud") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).where(col("doc_id") < 40)
    val media = WarcPipeline.synthesizeWarcs(docs).localCheckpoint(true)
    val in = Files.createTempDirectory("wstream_in").toString
    val store = Files.createTempDirectory("wstream_store").toString + "/docs"
    val ckpt = Files.createTempDirectory("wstream_ckpt").toString
    media.coalesce(1).write.mode("append").parquet(in)

    val q = WarcStream.start(spark, in, store, ckpt, availableNow = true)
    try q.awaitTermination() finally q.stop()

    // parity with the batch path, exact
    val got = spark.read.parquet(store)
      .select(col("doc_id"), col("url"), col("title"), col("text_md5"))
      .collect().map(r => (r.getLong(0),
        (r.getString(1), r.getString(2), r.getString(3)))).toMap
    val want = WarcPipeline.extractWarcs(media)
      .collect().map(r => (r.getLong(0),
        (r.getString(3), r.getString(5), r.getString(7)))).toMap
    assert(got == want && got.size == 40)

    // crash replay: batch 0 re-run overwrites its own partition
    val before = spark.read.parquet(store).count()
    WarcStream.extractBatch(store)(media, 0L)
    assert(spark.read.parquet(store).count() == before, "replayed batch doubled rows")

    // poison: a tampered payload (digest mismatch) fails LOUD, store untouched
    import spark.implicits._
    val onewarc = media.head().getAs[Array[Byte]](1)
    // bare (odd-id) files are uncompressed WARC text: flip one body byte
    val bare = media.where(col("doc_id") % 2 === 1).head()
    val buf = bare.getAs[Array[Byte]](1).clone()
    val bodyAt = new String(buf, "ISO-8859-1").indexOf("</p></div></body>")
    assert(bodyAt > 0)
    buf(bodyAt - 1) = (buf(bodyAt - 1) ^ 1).toByte
    val poison = Seq((999L, buf)).toDF("doc_id", "content")
    val err = intercept[Exception](WarcStream.extractBatch(store)(poison, 7L))
    val msgs = Iterator.iterate[Throwable](err)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("digest") || msgs.contains("CRC"), msgs)
    assert(spark.read.parquet(store).count() == before, "poison batch half-committed")
    assert(onewarc.length > 0)
  }
}
