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

    // parity with the batch path, exact (one row per response record:
    // 40 html + the binary/plain extras on id%3 in (0,1))
    def keyed(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("rec_idx"), col("url"), col("kind"),
        col("title"), col("text_md5"), col("byte_sum"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getString(3), r.getString(4), r.getString(5),
          r.getLong(6))).toMap
    val got = keyed(spark.read.parquet(store))
    val want = keyed(WarcPipeline.extractWarcs(media))
    assert(got == want && got.size == 67)

    // crash replay: batch 0 re-run overwrites its own partition
    val before = spark.read.parquet(store).count()
    WarcStream.extractBatch(store)(media, 0L)
    assert(spark.read.parquet(store).count() == before, "replayed batch doubled rows")

    // poison: a tampered payload digest (stored value corrupted — the
    // header region, so chunk framing can't shift it) fails LOUD,
    // store untouched
    import spark.implicits._
    val onewarc = media.head().getAs[Array[Byte]](1)
    // bare (odd-id) files are uncompressed WARC text
    val bare = media.where(col("doc_id") % 2 === 1).head()
    val buf = bare.getAs[Array[Byte]](1).clone()
    val digAt = new String(buf, "ISO-8859-1").indexOf("sha1:")
    assert(digAt > 0)
    val tamperAt = digAt + 7
    buf(tamperAt) = (if (buf(tamperAt) == 'A') 'B' else 'A').toByte
    val poison = Seq((999L, buf)).toDF("doc_id", "content")
    val err = intercept[Exception](WarcStream.extractBatch(store)(poison, 7L))
    val msgs = Iterator.iterate[Throwable](err)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("digest") || msgs.contains("CRC"), msgs)
    assert(spark.read.parquet(store).count() == before, "poison batch half-committed")
    assert(onewarc.length > 0)
  }
}
