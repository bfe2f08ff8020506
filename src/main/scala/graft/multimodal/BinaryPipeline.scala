package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video travel as opaque
  * `binary` columns with a typed metadata struct; decode / feature
  * extraction runs as batched `mapPartitions` (the shape a GPU/codec
  * worker wants: fixed-size batches, no shuffle, schema known up front).
  *
  * The decoders themselves are STUBBED (this container has no image/audio
  * libs): `decodeStub` derives deterministic pseudo-features from the
  * bytes. Swapping in a real decoder changes only `decodeStub`'s body —
  * schema, batching, partitioning are the real, tested plumbing.
  */
object BinaryPipeline {

  final case class MediaMeta(media_type: String, declared_bytes: Long)

  /** Attach a metadata struct + content column to raw document rows
    * (binary = UTF-8 bytes here; a real corpus reads binaryFile /
    * parquet-binary). */
  def asMedia(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
              mediaType: String = "application/pdf"): DataFrame =
    docs.select(col(idCol),
      encode(col(textCol), "UTF-8").as("content"),
      struct(lit(mediaType).as("media_type"),
        expr(s"octet_length($textCol)").cast("long").as("declared_bytes")).as("meta"))

  /** STUB decode: deterministic features from bytes (byte length, digest,
    * coarse "dimensions" derived from content — stands in for
    * width/height/duration a real decoder returns). */
  private def decodeStub(content: Array[Byte]): (Long, String, Long, Long) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(content).map("%02x".format(_)).mkString
    val w = 64L + (content.length % 1024)
    val h = 64L + (java.lang.Long.remainderUnsigned(SimpleHash.of(content), 1024))
    (content.length.toLong, digest, w, h)
  }

  private object SimpleHash {
    def of(bytes: Array[Byte]): Long = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
      h
    }
  }

  /** Frame sampling: emit frames of `frameLen` bytes at every `stride`
    * offset (stride > frameLen ⇒ sparse sampling, the video-keyframe
    * shape). One row per frame, batched narrow pass — no shuffle. */
  def frameSample(media: DataFrame, frameLen: Int = 100, stride: Int = 150,
                  idCol: String = "doc_id", batchSize: Int = 16): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("byte_offset", LongType, nullable = false),
      StructField("frame_md5", StringType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idIdx = media.schema.fieldIndex(idCol)
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val id = r.getLong(idIdx)
          val content = r.getAs[Array[Byte]](contentIdx)
          val nFrames = math.max(1, math.ceil(content.length.toDouble / stride).toInt)
          (0 until nFrames).iterator.map { i =>
            val off = i * stride
            val len = math.min(frameLen, content.length - off)
            md.reset(); md.update(content, off, len)
            Row(id, i.toLong, off.toLong, md.digest().map("%02x".format(_)).mkString)
          }
        }
      }
    }(enc)
  }

  /** Audio-style segmentation: OVERLAPPING windows of `segLen` bytes
    * every `hop` bytes (hop < segLen ⇒ each byte lands in segLen/hop
    * windows — the STFT/feature-window shape, vs [[frameSample]]'s
    * sparse keyframes) plus a per-segment stub feature (`energy` = sum
    * of unsigned byte values — stands in for RMS loudness; a real codec
    * replaces the loop body only). Same batched narrow `mapPartitions`
    * contract: no shuffle, schema up front. */
  def segmentAudio(media: DataFrame, segLen: Int = 200, hop: Int = 100,
                   idCol: String = "doc_id", batchSize: Int = 16): DataFrame = {
    require(segLen >= 1 && hop >= 1 && hop <= segLen,
      s"segmentAudio: need 1 <= hop <= segLen, got hop=$hop segLen=$segLen")
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("seg_idx", LongType, nullable = false),
      StructField("byte_offset", LongType, nullable = false),
      StructField("seg_len", LongType, nullable = false),
      StructField("energy", LongType, nullable = false),
      StructField("seg_md5", StringType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idIdx = media.schema.fieldIndex(idCol)
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val id = r.getLong(idIdx)
          val content = r.getAs[Array[Byte]](contentIdx)
          val nSegs = math.max(1, math.ceil(content.length.toDouble / hop).toInt)
          (0 until nSegs).iterator.map { i =>
            val off = i * hop
            val len = math.max(0, math.min(segLen, content.length - off))
            var e = 0L; var j = off
            while (j < off + len) { e += content(j) & 0xff; j += 1 }
            md.reset(); md.update(content, off, len)
            Row(id, i.toLong, off.toLong, len.toLong, e,
              md.digest().map("%02x".format(_)).mkString)
          }
        }
      }
    }(enc)
  }

  /** Batched feature extraction over (id, content, meta) rows.
    * Output: id, byte_len, content_md5, width, height, media_type. */
  def extractFeatures(media: DataFrame, idCol: String = "doc_id",
                      batchSize: Int = 16): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("byte_len", LongType, nullable = false),
      StructField("content_md5", StringType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("media_type", StringType, nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idIdx = media.schema.fieldIndex(idCol)
    val contentIdx = media.schema.fieldIndex("content")
    val metaIdx = media.schema.fieldIndex("meta")
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one "decoder call" per batch — mirrors GPU/codec batch shape
        batch.iterator.map { r =>
          val id = r.getLong(idIdx)
          val content = r.getAs[Array[Byte]](contentIdx)
          val meta = r.getStruct(metaIdx)
          val (len, digest, w, h) = decodeStub(content)
          Row(id, len, digest, w, h, meta.getString(0))
        }
      }
    }(enc)
  }
}
