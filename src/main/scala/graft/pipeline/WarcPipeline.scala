package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC ingest stages (round 19): synthesize structurally-real
  * `.warc(.gz)` crawl files from the documents table and extract them
  * back through the full WarcCodec + HtmlText path — record walk, gzip
  * members, HTTP split, payload-digest verification, HTML→text — as
  * batched narrow mapPartitions (the codec contract: row-local,
  * zero-shuffle, scales with partitions). */
object WarcPipeline {

  /** Per-document WARC file: a warcinfo record plus one request +
    * response pair whose HTML body wraps the document text (escaped)
    * under a deterministic head (title, style, script, comment) so the
    * extraction path has real tags to strip. Transport rotates:
    * member-per-record GZIP on even ids (the Common Crawl shape), bare
    * on odd; WARC/1.1 on id%3 == 0, 1.0 otherwise — all
    * results-invisible under the oracle. */
  def synthesizeWarcs(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .repartition(spark.sparkContext.defaultParallelism, col(idCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        val html =
          s"<!DOCTYPE html><html><head><title>Doc $id</title>" +
            "<style>p { color: #333; }</style>" +
            "<script>if (1 < 2) { var x = \"<p>\"; }</script></head>" +
            s"<body><!-- synthesized --><div><p>${HtmlText.escape(text)}" +
            "</p></div></body></html>"
        val bytes = WarcCodec.encode(
          Seq(WarcCodec.Page(s"https://example.org/doc/$id", 200, html)),
          gzip = id % 2 == 0,
          version = if (id % 3 == 0) "WARC/1.1" else "WARC/1.0")
        (id, bytes)
      }
      .toDF(idCol, "content")
  }

  /** Extract every response record: record counts, HTTP status, target
    * URI, digest verification, HTML title and the extracted text's
    * length + md5 — one row per response. */
  def extractWarcs(warcs: DataFrame, idCol: String = "doc_id",
                   batchSize: Int = 16): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("n_records", LongType, nullable = false),
      StructField("status", LongType, nullable = false),
      StructField("url", StringType, nullable = false),
      StructField("digest_ok", BooleanType, nullable = false),
      StructField("title", StringType, nullable = false),
      StructField("text_len", LongType, nullable = false),
      StructField("text_md5", StringType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    warcs.select(col(idCol), col("content")).mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val id = r.getLong(0)
          val recs = WarcCodec.records(r.getAs[Array[Byte]](1))
          recs.filter(_.warcType == "response").map { rec =>
            val (text, title) = HtmlText.extractWithTitle(
              new String(rec.payload, java.nio.charset.StandardCharsets.UTF_8))
            // CODE-POINT length (SQL length() semantics), not UTF-16 units
            Row(id, recs.length.toLong,
              rec.httpStatus.getOrElse(-1).toLong,
              rec.targetUri.getOrElse(""), rec.digestVerified, title,
              text.codePointCount(0, text.length).toLong,
              org.apache.commons.codec.digest.DigestUtils.md5Hex(
                text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
          }
        }
      }
    }(enc)
  }
}
