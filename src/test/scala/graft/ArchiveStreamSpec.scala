package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.pipeline.ArchivePipeline
import graft.streaming.ArchiveStream

/** Streaming archive ingest: real ZIP/TAR/tar.gz walks per
  * micro-batch, parity with the batch extraction path, replay
  * idempotence, and the poison-input loud-failure contract. */
class ArchiveStreamSpec extends SparkSpec {

  test("streamed archives extract; replay converges; poison fails loud") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).where(col("doc_id") < 40)
    val media = ArchivePipeline.synthesizeArchives(docs).localCheckpoint(true)
    val in = Files.createTempDirectory("astream_in").toString
    val store = Files.createTempDirectory("astream_store").toString + "/docs"
    val ckpt = Files.createTempDirectory("astream_ckpt").toString
    media.coalesce(1).write.mode("append").parquet(in)

    val q = ArchiveStream.start(spark, in, store, ckpt, availableNow = true)
    try q.awaitTermination() finally q.stop()

    // parity with the batch path, exact (1 + id%3 members per doc)
    def keyed(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("entry_idx"), col("name"), col("size"),
        col("content_md5"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3), r.getString(4))).toMap
    val got = keyed(spark.read.parquet(store))
    val want = keyed(ArchivePipeline.extractArchives(media))
    assert(got == want)
    assert(got.size == (0 until 40).map(id => 1 + id % 3).sum)

    // crash replay: batch 0 re-run overwrites its own partition
    val before = spark.read.parquet(store).count()
    ArchiveStream.extractBatch(store)(media, 0L)
    assert(spark.read.parquet(store).count() == before, "replayed batch doubled rows")

    // poison: a flipped member byte (ZIP CRC / TAR checksum mismatch)
    // fails LOUD, store untouched
    import spark.implicits._
    val one = media.where(col("doc_id") === 2).head() // ZIP64 leg
    val buf = one.getAs[Array[Byte]](1).clone()
    val at = new String(buf, "ISO-8859-1").indexOf("doc2/part0.txt")
    assert(at > 0)
    buf(at) = 'X' // corrupt the central-directory name vs local header
    val poison = Seq((999L, buf)).toDF("doc_id", "content")
    val err = intercept[Exception](ArchiveStream.extractBatch(store)(poison, 7L))
    val msgs = Iterator.iterate[Throwable](err)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("disagrees") || msgs.contains("CRC") ||
      msgs.contains("checksum"), msgs)
    assert(spark.read.parquet(store).count() == before, "poison batch half-committed")
  }
}
