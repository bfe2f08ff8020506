package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video travel as opaque
  * `binary` columns with a typed metadata struct; decode / feature
  * extraction runs as batched `mapPartitions` (the shape a GPU/codec
  * worker wants: fixed-size batches, no shuffle, schema known up front).
  *
  * IMAGE decode is REAL: [[PngCodec]] parses PNG (CRC-checked chunks,
  * zlib inflate, the full Sub/Up/Average/Paeth filter set, palette
  * expansion) and [[JpegCodec]] parses baseline JPEG (Huffman → dequant
  * → IDCT → chroma upsample → YCbCr→RGB); [[decodeImages]] /
  * [[decodeJpegs]] / [[extractFeatures]] emit true dimensions and pixel
  * statistics for both. AUDIO decode is REAL too (round 15):
  * [[WavCodec]] parses RIFF/PCM WAV and [[decodeWavSegments]] emits
  * per-window energy/zero-crossing features from actual samples. VIDEO
  * containers decode for real as well (rounds 15-17): [[AviCodec]] /
  * [[Mp4Codec]] / [[GifCodec]] walk the container structure and the
  * MJPEG/GIF frame payloads run through the real image codecs.
  * `decodeStub` survives only as the opaque-bytes fallback in
  * [[extractFeatures]] for media with no recognized container.
  */
object BinaryPipeline {

  final case class MediaMeta(media_type: String, declared_bytes: Long)

  /** The (id, content, meta) schema every synthesizer emits — one
    * definition so schema evolution is a single edit (round-17 review:
    * the per-synthesizer copies had grown into dozens). */

  /** Spread a corpus-synthesis input over the session's shuffle
    * parallelism before the heavy per-row codec work: the id column is
    * bytes-trivial to shuffle, while encode/decode is the dominant
    * cost — on a single-file local parquet scan (one partition) the
    * codec work would otherwise run single-threaded, and at corpus
    * scale the hash repartition also levels file-skewed inputs. */
  private def spreadIds(docs: DataFrame, idCol: String): DataFrame = {
    // EXPLICIT partition count: an advisory repartition(col) would be
    // AQE-coalesced back to one partition (the id shuffle is a few KB)
    // and the codec work would serialize again
    val n = docs.sparkSession.sparkContext.defaultParallelism
    docs.select(col(idCol)).repartition(n, col(idCol))
  }

  private def mediaSchema(idCol: String): StructType = StructType(Seq(
    StructField(idCol, LongType, nullable = false),
    StructField("content", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("media_type", StringType, nullable = false),
      StructField("declared_bytes", LongType, nullable = false))), nullable = false)))

  /** One row in the [[mediaSchema]] shape. */
  private def mediaRow(id: Long, bytes: Array[Byte], mediaType: String): Row =
    Row(id, bytes, Row(mediaType, bytes.length.toLong))

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

  /** Deterministic in-engine WAV synthesis over document rows — the
    * [[synthesizeImages]] recipe for the audio leg ([[WavCodec]] writes
    * REAL RIFF/PCM files). Every parameter and sample derives from
    * `doc_id` alone so a SQL oracle can replay the decoded features
    * without ever seeing the bytes:
    *   channels = 1 + doc_id % 2 (mono/stereo)
    *   bits = 8 if doc_id % 3 == 0 else 16
    *   sampleRate = 8000 + (doc_id % 4) · 4000
    *   frames = 400 + doc_id % 257
    *   sample(frame i, channel c) =
    *     8-bit:  (doc_id·31 + i·7 + c·13) mod 256 − 128
    *     16-bit: (doc_id·31 + i·7 + c·13) mod 4001 − 2000
    * Output: (idCol, content binary, meta struct) — the [[asMedia]] shape. */
  /** Shared shell of every synthesize*Wavs generator: one WAV per doc
    * id through `build`, wrapped in the (id, content, meta) media
    * schema — the per-format generators carry only their formulas. */
  private def synthesizeAudio(docs: DataFrame, idCol: String, batchSize: Int,
                              mediaType: String = "audio/wav")
                             (build: Long => Array[Byte]): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema(idCol))
    spreadIds(docs, idCol).mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val bytes = build(id)
          mediaRow(id, bytes, mediaType)
        }
      }
    }(enc)
  }

  def synthesizeWavs(docs: DataFrame, idCol: String = "doc_id",
                     batchSize: Int = 16): DataFrame =
    synthesizeAudio(docs, idCol, batchSize) { id =>
      val channels = (1 + id % 2).toInt
      val bits = if (id % 3 == 0) 8 else 16
      val sampleRate = (8000 + (id % 4) * 4000).toInt
      val frames = (400 + id % 257).toInt
      val samples = new Array[Int](frames * channels)
      var i = 0
      while (i < frames) {
        var c = 0
        while (c < channels) {
          val raw = id * 31 + i * 7L + c * 13L
          samples(i * channels + c) =
            if (bits == 8) (raw % 256).toInt - 128 else (raw % 4001).toInt - 2000
          c += 1
        }
        i += 1
      }
      WavCodec.encode(sampleRate, channels, bits, samples)
    }

  /** [[synthesizeWavs]]'s FLAC sibling (round 18): the SAME sample
    * formula per doc_id — channels 1+id%2, bits 8 on id%3==0 else 16,
    * rate 8000+(id%4)·4000, frames 400+id%257, sample(i, c) as in
    * synthesizeWavs — losslessly FLAC-encoded, so `q_audio_flac`
    * carries `q_audio_wav`'s oracle VERBATIM (lossless invariance).
    * Block size and subframe/stereo strategy rotate by id so the corpus
    * exercises CONSTANT/VERBATIM/FIXED subframes, rice partitions, and
    * the left/side, right/side and mid/side decorrelations. */
  def synthesizeFlacs(docs: DataFrame, idCol: String = "doc_id",
                      batchSize: Int = 16): DataFrame =
    synthesizeAudio(docs, idCol, batchSize, mediaType = "audio/flac") { id =>
      val channels = (1 + id % 2).toInt
      val bits = if (id % 3 == 0) 8 else 16
      val sampleRate = (8000 + (id % 4) * 4000).toInt
      val frames = (400 + id % 257).toInt
      val samples = new Array[Int](frames * channels)
      var i = 0
      while (i < frames) {
        var c = 0
        while (c < channels) {
          val raw = id * 31 + i * 7L + c * 13L
          samples(i * channels + c) =
            if (bits == 8) (raw % 256).toInt - 128 else (raw % 4001).toInt - 2000
          c += 1
        }
        i += 1
      }
      FlacCodec.encode(sampleRate, channels, bits, samples,
        blockSize = if (id % 2 == 0) 192 else 256, strategy = id)
    }

  /** MP3 corpus (round 18 — metadata-first leg): structurally-real
    * files with an ID3v2.3/2.4 tag (v2.4+syncsafe frame sizes on odd
    * ids, UTF-8 text on id%4==2), MPEG-1 Layer III VBR frame headers
    * (bitrate index 1 + (id+f)%14 per frame, padding on odd frames at
    * 44.1 kHz), and a trailing ID3v1 block on id%5==0:
    *   title "Title"+(id%7), artist "Artist"+(id%5), album "Album"+(id%3)
    *   sampleRateIdx id%3 → 44100/48000/32000, mono on odd ids,
    *   frames 20 + id%17. */
  def synthesizeMp3s(docs: DataFrame, idCol: String = "doc_id",
                     batchSize: Int = 16): DataFrame =
    synthesizeAudio(docs, idCol, batchSize, mediaType = "audio/mpeg") { id =>
      Mp3Codec.encode(
        title = s"Title${id % 7}", artist = s"Artist${id % 5}",
        album = s"Album${id % 3}",
        sampleRateIdx = (id % 3).toInt, mono = id % 2 == 1,
        bitrateIdxOf = f => (1 + ((id + f) % 14)).toInt,
        nFrames = (20 + id % 17).toInt,
        // tag-version rotation: id%3 → v2.3 / v2.4 (footer on id%6==1) /
        // v2.2 — all three wire forms decode to the same formula fields,
        // so the oracle carries verbatim; v2.2 has no UTF-8 encoding
        v24 = id % 3 == 1, v22 = id % 3 == 2, footer = id % 6 == 1,
        utf8 = id % 4 == 2 && id % 3 != 2, utf16 = id % 4 == 1,
        id3v1 = id % 5 == 0, payloadSeed = id)
    }

  /** Ogg corpus (round 19, VERDICT r18 #6): codec rotates id%3 →
    * Vorbis / Opus / FLAC-in-Ogg, sample rate id%4 →
    * 44100/48000/32000/22050, channels 1 + id%2, terminal granule
    * samples = 9600 + (id%7)·480 over 2 + id%5 audio pages,
    * tags ("OggTitle"+id%7, "OggArtist"+id%5, "OggAlbum"+id%3). Every
    * page CRC-verified on decode; the oracle replays the formulas
    * byte-blind (opus durations run at 48 kHz by spec). */
  def synthesizeOggs(docs: DataFrame, idCol: String = "doc_id",
                     batchSize: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema(idCol))
    spreadIds(docs, idCol).mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val codec = (id % 3) match {
            case 0 => "vorbis"; case 1 => "opus"; case _ => "flac"
          }
          val rate = Seq(44100, 48000, 32000, 22050)((id % 4).toInt)
          val bytes = OggCodec.encode(
            codec, rate, channels = (1 + id % 2).toInt,
            samples = 9600 + (id % 7) * 480,
            audioPages = (2 + id % 5).toInt,
            title = s"OggTitle${id % 7}", artist = s"OggArtist${id % 5}",
            album = s"OggAlbum${id % 3}", payloadSeed = id)
          mediaRow(id, bytes, "audio/ogg")
        }
      }
    }(enc)
  }

  /** Ogg container metadata over (id, content) rows —
    * [[OggCodec.decodeMeta]] per row, batched narrow mapPartitions. */
  def decodeOggMeta(media: DataFrame, idCol: String = "doc_id",
                    batchSize: Int = 16): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("codec", StringType, nullable = false),
      StructField("sample_rate", LongType, nullable = false),
      StructField("channels", LongType, nullable = false),
      StructField("duration_ms", LongType, nullable = false),
      StructField("page_count", LongType, nullable = false),
      StructField("title", StringType, nullable = false),
      StructField("artist", StringType, nullable = false),
      StructField("album", StringType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select(col(idCol), col("content")).mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val m = OggCodec.decodeMeta(r.getAs[Array[Byte]](1))
          Row(id, m.codec, m.sampleRate.toLong, m.channels.toLong,
            m.durationMs, m.pageCount, m.title.getOrElse(""),
            m.artist.getOrElse(""), m.album.getOrElse(""))
        }
      }
    }(enc)
  }

  /** MP3 tag + frame-geometry extraction over (id, content) rows —
    * [[Mp3Codec.decodeMeta]] per row, batched narrow mapPartitions. */
  def decodeMp3Meta(media: DataFrame, idCol: String = "doc_id",
                    batchSize: Int = 16): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("sample_rate", LongType, nullable = false),
      StructField("channels", LongType, nullable = false),
      StructField("frame_count", LongType, nullable = false),
      StructField("audio_bytes", LongType, nullable = false),
      StructField("duration_ms", LongType, nullable = false),
      StructField("title", StringType, nullable = false),
      StructField("artist", StringType, nullable = false),
      StructField("album", StringType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select(col(idCol), col("content")).mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val m = Mp3Codec.decodeMeta(r.getAs[Array[Byte]](1))
          Row(id, m.sampleRate.toLong, m.channels.toLong, m.frameCount,
            m.audioBytes, m.durationMs, m.title.getOrElse(""),
            m.artist.getOrElse(""), m.album.getOrElse(""))
        }
      }
    }(enc)
  }

  /** [[synthesizeWavs]]'s µ-law sibling: mono format-7 files whose raw
    * G.711 codes derive from doc_id —
    *   frames = 300 + doc_id % 257, sampleRate 8000,
    *   code(i) = (doc_id·31 + i·7) mod 256
    * — so the oracle replays the DECODED linear samples (16-bit scale)
    * through the expansion formula (u = 255−code; mag = (8·(u mod 16) +
    * 132)·2^((u div 16) mod 8) − 132; negative when u ≥ 128)
    * byte-blind. */
  def synthesizeMulawWavs(docs: DataFrame, idCol: String = "doc_id",
                          batchSize: Int = 16): DataFrame =
    synthesizeAudio(docs, idCol, batchSize) { id =>
      val frames = (300 + id % 257).toInt
      val codes = new Array[Byte](frames)
      var i = 0
      while (i < frames) { codes(i) = ((id * 31 + i * 7L) % 256).toByte; i += 1 }
      WavCodec.encodeMulaw(8000, 1, codes)
    }

  /** [[synthesizeMulawWavs]]'s A-law twin: mono format-6 files, codes
    * code(i) = (doc_id·29 + i·13) mod 256, frames = 300 + doc_id % 257.
    * The oracle replays the A-law expansion (a = code XOR 0x55; seg 0
    * linear mag = 16·mant + 8, else (16·mant + 264)·2^(seg−1); POSITIVE
    * when a ≥ 128 — A-law's sign convention is µ-law's mirror). */
  def synthesizeAlawWavs(docs: DataFrame, idCol: String = "doc_id",
                         batchSize: Int = 16): DataFrame =
    synthesizeAudio(docs, idCol, batchSize) { id =>
      val frames = (300 + id % 257).toInt
      val codes = new Array[Byte](frames)
      var i = 0
      while (i < frames) { codes(i) = ((id * 29 + i * 13L) % 256).toByte; i += 1 }
      WavCodec.encodeMulaw(8000, 1, codes, format = 6)
    }

  /** [[synthesizeMulawWavs]]'s IMA-ADPCM sibling: mono format-0x11
    * files whose WIRE content (block headers + nibble stream) derives
    * from doc_id, so the oracle can replay the decoder's predictor
    * recursion exactly (a recursive CTE over the public step table):
    *   blockAlign 36 → 65 samples/block, nBlocks = 4 + doc_id % 5
    *   block b: header predictor = (doc_id·37 + b·101) mod 4001 − 2000
    *            header step index = (doc_id + b·7) mod 89
    *   nibble k (0-63, low nibble of byte k/2 first) =
    *            (doc_id·31 + b·17 + k·7) mod 16 */
  def synthesizeAdpcmWavs(docs: DataFrame, idCol: String = "doc_id",
                          batchSize: Int = 16): DataFrame =
    synthesizeAudio(docs, idCol, batchSize) { id =>
      val nBlocks = (4 + id % 5).toInt
      val blocks = (0 until nBlocks).map { b =>
        val pred = ((id * 37 + b * 101L) % 4001).toInt - 2000
        val idx = ((id + b * 7L) % 89).toInt
        val payload = new Array[Byte](32)
        var j = 0
        while (j < 32) {
          val lo = ((id * 31 + b * 17 + (2 * j) * 7L) % 16).toInt
          val hi = ((id * 31 + b * 17 + (2 * j + 1) * 7L) % 16).toInt
          payload(j) = ((hi << 4) | lo).toByte
          j += 1
        }
        (Array(pred), Array(idx), payload)
      }
      WavCodec.encodeAdpcm(8000, 1, 36, blocks)
    }

  /** REAL audio-window features over (id, content) rows: every content
    * blob must be a WAV or a FLAC (format-dispatched on the stream
    * marker, round 18 — the same op takes both, like the format-agnostic
    * image ops; [[WavCodec]]/[[FlacCodec]] fail loud otherwise). Decodes
    * the PCM frames, then cuts OVERLAPPING windows of `winFrames` frames
    * every `hopFrames` (hop < win = the STFT shape [[segmentAudio]]
    * models on bytes) and emits per-window INTEGER features — the sum of
    * squared samples over all channels (the energy the stub's byte sum
    * stood in for) and the zero-crossing count on channel 0 — plus the
    * decoded stream parameters. All integers, so the features are
    * hash-exact against a SQL replay. Batched narrow `mapPartitions`:
    * no shuffle, decode cost parallelizes embarrassingly. */
  def decodeWavSegments(media: DataFrame, winFrames: Int = 160, hopFrames: Int = 80,
                        idCol: String = "doc_id", batchSize: Int = 16): DataFrame = {
    require(winFrames >= 1 && hopFrames >= 1 && hopFrames <= winFrames,
      s"decodeWavSegments: need 1 <= hopFrames <= winFrames, got $hopFrames/$winFrames")
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("seg_idx", LongType, nullable = false),
      StructField("sample_rate", LongType, nullable = false),
      StructField("channels", LongType, nullable = false),
      StructField("bits", LongType, nullable = false),
      StructField("n_frames", LongType, nullable = false),
      StructField("sq_sum", LongType, nullable = false),
      StructField("zero_crossings", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val slim = media.select(col(idCol), col("content"))
    slim.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val id = r.getLong(0)
          val content = r.getAs[Array[Byte]](1)
          val a =
            if (FlacCodec.isFlac(content)) FlacCodec.decode(content)
            else WavCodec.decode(content)
          val nWins = math.max(1, math.ceil(a.frames.toDouble / hopFrames).toInt)
          (0 until nWins).iterator.map { w =>
            val start = w * hopFrames
            val stop = math.min(a.frames, start + winFrames)
            var sq = 0L
            var zc = 0L
            var i = start
            while (i < stop) {
              var c = 0
              while (c < a.channels) {
                val v = a.samples(i * a.channels + c).toLong
                sq += v * v
                c += 1
              }
              if (i > start) {
                val prev = a.samples((i - 1) * a.channels) >= 0
                val cur = a.samples(i * a.channels) >= 0
                if (prev != cur) zc += 1
              }
              i += 1
            }
            Row(id, w.toLong, a.sampleRate.toLong, a.channels.toLong,
              a.bitsPerSample.toLong, (stop - start).toLong, sq, zc)
          }
        }
      }
    }(enc)
  }

  /** True iff `content` starts with the 8-byte PNG signature. */
  private def isPng(content: Array[Byte]): Boolean =
    content.length >= 8 &&
      (content(0) & 0xff) == 0x89 && content(1) == 'P' && content(2) == 'N' &&
      content(3) == 'G' && content(4) == 0x0d && content(5) == 0x0a &&
      (content(6) & 0xff) == 0x1a && content(7) == 0x0a

  /** Deterministic in-engine PNG synthesis over document rows — the
    * fixture generator for the image-decode gate (the
    * [[graft.pipeline.PdfCodec.encodePdf]] convention: the engine
    * fabricates REAL files so decode parity exercises the whole codec).
    * Geometry, color type and every pixel derive from `doc_id` alone, so
    * a SQL oracle can replay the expected decode output without ever
    * seeing the bytes:
    *   colorType = (0, 2, 6)(doc_id % 3)  — gray / RGB / RGBA
    *   width = 4 + doc_id % 13, height = 3 + doc_id % 11
    *   pixel(i) = (doc_id·31 + i·7) mod 256, channel-interleaved.
    * Output: (idCol, content binary, meta struct) — the [[asMedia]] shape. */
  def synthesizeImages(docs: DataFrame, idCol: String = "doc_id",
                       batchSize: Int = 16, variantLayout: Boolean = false): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema(idCol))
    // project BEFORE the imperative pass: mapPartitions consumes whole
    // rows, so without this the parquet scan deserializes every document
    // column for a synthesis that needs only the id
    val ids = spreadIds(docs, idCol)
    ids.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val colorType = (id % 3) match { case 0 => 0; case 1 => 2; case _ => 6 }
          val ch = colorType match { case 0 => 1; case 2 => 3; case _ => 4 }
          val w = (4 + id % 13).toInt
          val h = (3 + id % 11).toInt
          val px = new Array[Byte](w * h * ch)
          var i = 0
          while (i < px.length) { px(i) = ((id * 31 + i * 7L) % 256).toByte; i += 1 }
          // variantLayout: same pixels in the Adam7 interlaced layout,
          // 16-bit on odd ids (v·257 widening) — the DECODED buffer is
          // byte-identical to the plain layout, so an oracle written
          // against the pixel formulas gates layout-invariance for free
          val bytes =
            if (variantLayout)
              PngCodec.encode(w, h, colorType, px, interlace = true,
                bitDepth = if (id % 2 == 1) 16 else 8)
            else PngCodec.encode(w, h, colorType, px)
          mediaRow(id, bytes, "image/png")
        }
      }
    }(enc)
  }

  /** SUB-BYTE-depth PNG corpus (round 17 — the icon/screenshot/scan
    * shapes): depth rotates 1/2/4 by id, gray on even ids (samples the
    * spec's exact 255/(2^d−1) multiples) and PALETTE on odd (2^d
    * entries from the j·37/j·59+17/j·83+29 formulas), every fifth file
    * Adam7-interlaced:
    *   w = 6 + id%13, h = 5 + id%11, q(i) = (id·31 + i·7) mod 2^d */
  def synthesizeLowDepthPngs(docs: DataFrame, idCol: String = "doc_id",
                             batchSize: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema(idCol))
    spreadIds(docs, idCol).mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val d = (id % 3) match { case 0 => 1; case 1 => 2; case _ => 4 }
          val pal = id % 2 == 1
          val w = (6 + id % 13).toInt
          val h = (5 + id % 11).toInt
          val lim = (1 << d) - 1
          val px = new Array[Byte](w * h)
          var i = 0
          while (i < px.length) {
            val q = ((id * 31 + i * 7L) % (1 << d)).toInt
            px(i) = (if (pal) q else q * (255 / lim)).toByte
            i += 1
          }
          val palette =
            if (!pal) None
            else Some(Array.tabulate[Byte]((lim + 1) * 3) { k =>
              val j = k / 3
              (k % 3 match {
                case 0 => (j * 37) % 256
                case 1 => (j * 59 + 17) % 256
                case _ => (j * 83 + 29) % 256
              }).toByte
            })
          val bytes = PngCodec.encode(w, h, if (pal) 3 else 0, px,
            palette = palette, interlace = id % 5 == 0, bitDepth = d)
          mediaRow(id, bytes, "image/png")
        }
      }
    }(enc)
  }

  /** REAL image decode over (id, content) rows: every content blob must
    * be a PNG ([[PngCodec]] fails loud otherwise — no silent
    * pseudo-features on a path that promises real decode). Emits true
    * geometry plus deterministic pixel statistics: per-channel sums
    * (channel slots assigned by color semantics — gray lands in `r_sum`,
    * alpha in `a_sum`, absent channels report 0) and the md5 of the
    * unfiltered pixel buffer. Batched narrow `mapPartitions`: no shuffle,
    * schema up front — the decode cost parallelizes embarrassingly. */
  def decodeImages(media: DataFrame, idCol: String = "doc_id",
                   batchSize: Int = 16): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("bit_depth", LongType, nullable = false),
      StructField("color_type", LongType, nullable = false),
      StructField("channels", LongType, nullable = false),
      StructField("r_sum", LongType, nullable = false),
      StructField("g_sum", LongType, nullable = false),
      StructField("b_sum", LongType, nullable = false),
      StructField("a_sum", LongType, nullable = false),
      StructField("pixel_md5", StringType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idIdx = media.schema.fieldIndex(idCol)
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(idIdx)
          val img = PngCodec.decode(r.getAs[Array[Byte]](contentIdx))
          // channel slot by decoded-buffer semantics: 1 = gray(r);
          // 2 = gray(r) + alpha(a); 3 = rgb; 4 = rgba
          val sums = new Array[Long](4)
          val slots: Array[Int] = img.channels match {
            case 1 => Array(0)
            case 2 => Array(0, 3)
            case 3 => Array(0, 1, 2)
            case _ => Array(0, 1, 2, 3)
          }
          var i = 0
          while (i < img.pixels.length) {
            sums(slots(i % img.channels)) += img.pixels(i) & 0xff
            i += 1
          }
          md.reset()
          val digest = md.digest(img.pixels).map("%02x".format(_)).mkString
          Row(id, img.width.toLong, img.height.toLong, img.bitDepth.toLong,
            img.colorType.toLong, img.channels.toLong,
            sums(0), sums(1), sums(2), sums(3), digest)
        }
      }
    }(enc)
  }

  /** Deterministic in-engine JPEG synthesis over document rows — the
    * [[synthesizeImages]] recipe for the lossy leg ([[JpegCodec]]
    * encodes REAL baseline JFIF files). The fixtures are built from the
    * codec's determinism contract so the SQL oracle can replay the
    * DECODE output exactly despite the lossy format:
    *   - every 8×8 luma block is FLAT at a value ≡ 128 (mod 3) — at
    *     quality 90 the luma DC quantizer is 3, so flat blocks survive
    *     quantization exactly;
    *   - color images are gray (R=G=B), so chroma is neutral 128 and
    *     the YCbCr round trip is exact.
    * Formulas (all from doc_id alone):
    *   width = 24 + doc_id % 13, height = 16 + doc_id % 11
    *   components = 1 if doc_id % 2 == 0 else 3 (RGB)
    *   4:2:0 subsampling when components == 3 and doc_id % 4 == 3
    *   restart interval 2 when doc_id % 5 == 0
    *   blockValue(bx, by) = 128 + 3·(((doc_id·31 + bx·7 + by·13) mod 53) − 26)
    * Output: (idCol, content binary, meta struct) — the [[asMedia]] shape. */
  def synthesizeJpegs(docs: DataFrame, idCol: String = "doc_id",
                      batchSize: Int = 16, progressive: Boolean = false): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema(idCol))
    val ids = spreadIds(docs, idCol)
    ids.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val w = (24 + id % 13).toInt
          val h = (16 + id % 11).toInt
          val comps = if (id % 2 == 0) 1 else 3
          val px = new Array[Byte](w * h * comps)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = (128 + 3 * ((id * 31 + (x / 8) * 7 + (y / 8) * 13) % 53 - 26)).toByte
              var c = 0
              while (c < comps) { px((y * w + x) * comps + c) = v; c += 1 }
              x += 1
            }
            y += 1
          }
          // progressive files carry the full successive-approximation
          // scan script; every fifth file also carries restart markers
          // (per MCU in the DC scans, per block in the AC scans)
          val bytes = JpegCodec.encode(w, h, comps, px, quality = 90,
            subsample = comps == 3 && id % 4 == 3,
            restartInterval = if (id % 5 == 0) 2 else 0,
            progressive = progressive)
          Row(id, bytes, Row("image/jpeg", bytes.length.toLong))
        }
      }
    }(enc)
  }

  /** EXIF-tagged JPEG corpus (round 18, VERDICT r17 #5): the SAME JPEG
    * recipe as [[synthesizeJpegs]] with an APP1/`Exif\0\0` segment
    * spliced after SOI — orientation 1 + id%8 (so half the corpus is
    * the transposed 5-8 family), Make "Maker"+(id%5),
    * Model "Model"+(id%7), DateTime "2024:01:01 00:00:SS" with
    * SS = id%60, Exif-IFD pixel dims = the true w x h, byte order
    * alternating on id%3. */
  def synthesizeExifJpegs(docs: DataFrame, idCol: String = "doc_id",
                          batchSize: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema(idCol))
    spreadIds(docs, idCol).mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val w = (24 + id % 13).toInt
          val h = (16 + id % 11).toInt
          val comps = if (id % 2 == 0) 1 else 3
          val px = new Array[Byte](w * h * comps)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = (128 + 3 * ((id * 31 + (x / 8) * 7 + (y / 8) * 13) % 53 - 26)).toByte
              var c = 0
              while (c < comps) { px((y * w + x) * comps + c) = v; c += 1 }
              x += 1
            }
            y += 1
          }
          val jpeg = JpegCodec.encode(w, h, comps, px, quality = 90,
            subsample = comps == 3 && id % 4 == 3,
            restartInterval = if (id % 5 == 0) 2 else 0)
          val exif = ExifParser.encodeTiff(
            orientation = (1 + id % 8).toInt,
            make = s"Maker${id % 5}",
            model = s"Model${id % 7}",
            dateTime = f"2024:01:01 00:00:${id % 60}%02d",
            pixelX = w.toLong, pixelY = h.toLong,
            bigEndian = id % 3 == 0)
          val bytes = ExifParser.spliceApp1(jpeg, exif)
          mediaRow(id, bytes, "image/jpeg")
        }
      }
    }(enc)
  }

  /** EXIF + geometry extraction over (id, content) JPEG rows: real
    * JPEG decode for the true raster dims, APP1 parse for the tag
    * surface, and the ORIENTATION-NORMALIZED effective dimensions —
    * the shape every geometry feature downstream must use (a reader
    * ignoring orientation 5-8 transposes the image silently). Batched
    * narrow mapPartitions, all-integer/string columns → hash-exact. */
  def decodeExif(media: DataFrame, idCol: String = "doc_id",
                 batchSize: Int = 16): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("orientation", LongType, nullable = false),
      StructField("oriented_width", LongType, nullable = false),
      StructField("oriented_height", LongType, nullable = false),
      StructField("make", StringType, nullable = false),
      StructField("model", StringType, nullable = false),
      StructField("date_time", StringType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select(col(idCol), col("content")).mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val content = r.getAs[Array[Byte]](1)
          val img = JpegCodec.decode(content)
          val exif = ExifParser.fromJpeg(content).getOrElse(
            throw new IllegalArgumentException(
              s"decodeExif: doc $id carries no EXIF APP1"))
          val (ow, oh) = ExifParser.orientedDims(
            img.width.toLong, img.height.toLong, exif.orientation)
          Row(id, img.width.toLong, img.height.toLong, exif.orientation.toLong,
            ow, oh, exif.make.getOrElse(""), exif.model.getOrElse(""),
            exif.dateTime.getOrElse(""))
        }
      }
    }(enc)
  }

  /** Deterministic in-engine TIFF synthesis over document rows — the
    * [[synthesizeImages]] recipe for the scan/print-corpus leg
    * ([[TiffCodec]] writes REAL baseline TIFF). Formulas (all from
    * doc_id alone):
    *   width = 9 + doc_id % 13, height = 7 + doc_id % 11
    *   channels = 1 if doc_id % 2 == 0 else 3
    *   pixel(i) = (doc_id·37 + i·11) mod 256, channel-interleaved
    *   big-endian (MM) when doc_id % 3 == 0; PackBits when doc_id % 4 < 2;
    *   RowsPerStrip = 1 + doc_id % 5 (multi-strip assembly);
    *   WhiteIsZero storage when channels == 1 and doc_id % 5 == 3
    * Byte order, compression, strip split and photometric inversion are
    * all LAYOUT — the decoded buffer is identical across them, so one
    * formula oracle gates layout invariance for free (the
    * q_image_interlaced convention). */
  /** Deterministic in-engine BMP synthesis (round 16, the fifth raster
    * leg): per doc, mode = doc_id % 3 —
    *   0: 8-bit PALETTED, index i = (id·37 + i·13) % 250 over w·h,
    *      250-entry palette j = ((j·37)%256, (j·59+17)%256, (j·83+29)%256)
    *   1: 24-bit bottom-up, RGB byte i = (id·37 + i·11) % 256
    *   2: 24-bit TOP-DOWN (negative height), same bytes
    *   w = 11 + id%13, h = 9 + id%11
    * The decoded buffer is always packed RGB, so the oracle replays the
    * formulas directly — and the position-weighted checksum makes a
    * missed bottom-up row flip fatal. */
  def synthesizeBmps(docs: DataFrame, idCol: String = "doc_id",
                     batchSize: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema(idCol))
    // the palette is a pure constant — build it once, not per document
    val bmpPalette: Array[Byte] = {
      val palette = new Array[Byte](250 * 3)
      var j = 0
      while (j < 250) {
        palette(3 * j) = ((j * 37) % 256).toByte
        palette(3 * j + 1) = ((j * 59 + 17) % 256).toByte
        palette(3 * j + 2) = ((j * 83 + 29) % 256).toByte
        j += 1
      }
      palette
    }
    val ids = spreadIds(docs, idCol)
    ids.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val w = (11 + id % 13).toInt
          val h = (9 + id % 11).toInt
          val mode = (id % 3).toInt
          val bytes =
            if (mode == 0) {
              val idx = new Array[Byte](w * h)
              var i = 0
              while (i < idx.length) {
                idx(i) = ((id * 37 + i * 13L) % 250).toByte
                i += 1
              }
              // half the paletted rows ship BI_RLE8 (round 17): the
              // pixel formula is IDENTICAL, so the oracle is untouched —
              // compression must be results-invisible (the TIFF
              // LZW/Deflate convention)
              BmpCodec.encode(w, h, idx, bmpPalette, rle8 = id % 2 == 1)
            } else {
              val px = new Array[Byte](w * h * 3)
              var i = 0
              while (i < px.length) {
                px(i) = ((id * 37 + i * 11L) % 256).toByte
                i += 1
              }
              // header-variant rotation (round 17): the 24-bit rows ship
              // V5 (124) / OS/2-core (12) / V4 (108) / plain-40 headers
              // by id — pixels identical, oracle untouched (headers must
              // be results-invisible; core is bottom-up only)
              val dib =
                if (mode == 1) (if (id % 2 == 0) 124 else 12)
                else if (id % 2 == 0) 108 else 40
              BmpCodec.encode(w, h, px, topDown = mode == 2, dib = dib)
            }
          mediaRow(id, bytes, "image/bmp")
        }
      }
    }(enc)
  }

  /** [[synthesizeTiffs]] with LZW compression (round 16): the SAME
    * pixel formulas wired through compression 5, predictor 2 on odd
    * ids — so q_image_tiff_lzw carries the uncompressed gate's oracle
    * VERBATIM (compression is pure layout, the container-invariance
    * convention). */
  def synthesizeLzwTiffs(docs: DataFrame, idCol: String = "doc_id",
                         batchSize: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema(idCol))
    val ids = spreadIds(docs, idCol)
    ids.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val w = (9 + id % 13).toInt
          val h = (7 + id % 11).toInt
          val ch = if (id % 2 == 0) 1 else 3
          val px = new Array[Byte](w * h * ch)
          var i = 0
          while (i < px.length) { px(i) = ((id * 37 + i * 11L) % 256).toByte; i += 1 }
          val bytes = TiffCodec.encode(w, h, ch, px,
            bigEndian = id % 3 == 0,
            rowsPerStrip = (1 + id % 5).toInt,
            lzw = true, predictor2 = id % 2 == 1)
          mediaRow(id, bytes, "image/tiff")
        }
      }
    }(enc)
  }

  /** TILED-layout corpus (round 17): the SAME pixel corpus as
    * [[synthesizeTiffs]] in the §15 tile layout (16x16 tiles — the
    * small geometries force edge tiles on both axes and 2x2 grids on
    * the larger ids), under mixed compressions (none/LZW/Deflate),
    * predictor 2 on compressed odd ids, both byte orders. Decoded
    * results must be byte-identical to the striped corpus. */
  def synthesizeTiledTiffs(docs: DataFrame, idCol: String = "doc_id",
                           batchSize: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema(idCol))
    spreadIds(docs, idCol).mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val w = (9 + id % 13).toInt
          val h = (7 + id % 11).toInt
          val ch = if (id % 2 == 0) 1 else 3
          val px = new Array[Byte](w * h * ch)
          var i = 0
          while (i < px.length) { px(i) = ((id * 37 + i * 11L) % 256).toByte; i += 1 }
          val comp = (id % 3).toInt // 0 none, 1 LZW, 2 Deflate
          val bytes = TiffCodec.encode(w, h, ch, px,
            bigEndian = id % 4 == 0,
            lzw = comp == 1, deflate = comp == 2,
            predictor2 = comp != 0 && id % 2 == 1,
            tileSize = 16)
          mediaRow(id, bytes, "image/tiff")
        }
      }
    }(enc)
  }

  /** BILEVEL (1-bit) corpus (round 17 — the fax/document-scan sample
    * format): per doc a w x h bit raster, STRIPED on even ids and
    * 16x16-TILED on odd, photometric WhiteIsZero on id%5<2 (the fax
    * default), compression rotating none/PackBits/Deflate:
    *   w = 17 + id%16, h = 13 + id%12
    *   gray(x, y) = 255 if (id·37 + x·7 + y·13) mod 5 < 2 else 0 */
  def synthesizeBilevelTiffs(docs: DataFrame, idCol: String = "doc_id",
                             batchSize: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema(idCol))
    spreadIds(docs, idCol).mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val w = (17 + id % 16).toInt
          val h = (13 + id % 12).toInt
          val px = new Array[Byte](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              px(y * w + x) =
                (if ((id * 37 + x * 7L + y * 13L) % 5 < 2) 255 else 0).toByte
              x += 1
            }
            y += 1
          }
          val comp = (id % 3).toInt // 0 none, 1 PackBits, 2 Deflate
          val bytes = TiffCodec.encode(w, h, 1, px,
            bigEndian = id % 4 == 0,
            packBits = comp == 1, deflate = comp == 2,
            rowsPerStrip = if (id % 2 == 0) (2 + id % 7).toInt else 0,
            whiteIsZero = id % 5 < 2,
            tileSize = if (id % 2 == 1) 16 else 0,
            bilevel = true)
          mediaRow(id, bytes, "image/tiff")
        }
      }
    }(enc)
  }

  /** CCITT fax corpus (round 18 — THE scanned-document compressions):
    * the SAME bit raster as [[synthesizeBilevelTiffs]] (w = 17 + id%16,
    * h = 13 + id%12, gray(x, y) = 255 if (id·37 + x·7 + y·13) mod 5 < 2
    * else 0), so `q_image_tiff_g4` carries `q_image_tiff_bilevel`'s
    * oracle VERBATIM — compression invariance, the LZW/Deflate
    * convention. Rotation: G4 MMR on id%4 ∈ {0,1} (the dominant wild
    * form), MH ("CCITT RLE", compression 2) on id%4 == 2, G3 with EOLs
    * (compression 3) on id%4 == 3 — the 2-D stream form (T4Options 1,
    * EOL + tag-bit rows, K = 2) on id%8 == 3 and plain 1-D on
    * id%8 == 7; STRIPED on even ids and 16x16-TILED on odd (per-chunk
    * reference-line reset both ways); WhiteIsZero (the fax default) on
    * id%5<2; FillOrder 2 (LSB-first codestream bytes — where real fax
    * files live, round 19) on id%7 == 3, results-invisible under the
    * same oracle. */
  def synthesizeCcittTiffs(docs: DataFrame, idCol: String = "doc_id",
                           batchSize: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema(idCol))
    spreadIds(docs, idCol).mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val w = (17 + id % 16).toInt
          val h = (13 + id % 12).toInt
          val px = new Array[Byte](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              px(y * w + x) =
                (if ((id * 37 + x * 7L + y * 13L) % 5 < 2) 255 else 0).toByte
              x += 1
            }
            y += 1
          }
          val mode = (id % 4) match {
            case 0 | 1 => 4 // G4 MMR
            case 2 => 2 // MH byte-aligned rows
            case _ => 3 // G3 with EOLs (1-D, or the 2-D tagged form)
          }
          val bytes = TiffCodec.encode(w, h, 1, px,
            bigEndian = id % 4 == 0,
            rowsPerStrip = if (id % 2 == 0) (2 + id % 7).toInt else 0,
            whiteIsZero = id % 5 < 2,
            tileSize = if (id % 2 == 1) 16 else 0,
            bilevel = true,
            ccitt = mode,
            ccittT4TwoD = id % 8 == 3,
            fillOrder2 = id % 7 == 3)
          mediaRow(id, bytes, "image/tiff")
        }
      }
    }(enc)
  }

  /** Image-XObject PDF corpus (round 19, VERDICT r18 #3 — the scanned-
    * document carrier: image-only PDFs whose text extraction is
    * legitimately empty): nPages = 1 + id%3 pages per doc; page p
    * (k = id + p) rotates the carrier k%3 → /FlateDecode raw samples
    * (RGB pages further rotating the /Indexed palette wire on k%12),
    * /DCTDecode (the flat-8x8-block JPEG recipe whose quality-90
    * reconstruction is provably exact — the q_image_jpeg gate), and
    * the bilevel family by k%12 — /CCITTFaxDecode G4 (2) and
    * byte-aligned MH (5), /JBIG2Decode generic region MQ (8;
    * TPGDON typical prediction on k%24==20) and MMR (11).
    * Geometry and pixels are pure formulas of (id, p), so the oracle
    * replays them byte-blind:
    *  - Flate: w = 4+k%13, h = 3+k%11, ch = 1|3 by k%2,
    *    v(i) = (id·31 + p·11 + i·7) mod 256
    *  - DCT: w = 24+k%13, h = 16+k%11, ch = 1|3 by k%2, all channels
    *    v(x,y) = 128 + 3·((k·31 + (x/8)·7 + (y/8)·13) mod 53 − 26)
    *  - CCITT: w = 17+k%16, h = 13+k%12, gray 0 (black) iff
    *    (k·37 + x·7 + y·13) mod 5 < 2 else 255 */
  def synthesizeImagePdfs(docs: DataFrame, idCol: String = "doc_id",
                          batchSize: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema(idCol))
    spreadIds(docs, idCol).mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val nPages = (1 + id % 3).toInt
          val specs = (0 until nPages).map { p =>
            val k = id + p
            (k % 3) match {
              case 0 =>
                val w = (4 + k % 13).toInt
                val h = (3 + k % 11).toInt
                val ch = if (k % 2 == 0) 1 else 3
                val px = Array.tabulate[Byte](w * h * ch)(i =>
                  ((id * 31 + p * 11 + i * 7L) % 256).toByte)
                // RGB Flate pages re-express as /Indexed palettes
                // (round 20, VERDICT r19 #6): hex-string lookup on
                // k%12==3, stream lookup on k%12==9 — identical decoded
                // pixels, so the oracle is untouched and a palette slip
                // breaks the hash (the v(i) stride-3 triples are keyed
                // by 3j mod 256, so ≤256 distinct colors by design).
                // GRAY pages rotate the BI…ID…EI INLINE-IMAGE wire on
                // k%12==6 (raw on k%24==6, /AHx on k%24==18) — the
                // fax-era in-content-stream shape, same pixels again
                val indexed =
                  if (ch == 3) (if (k % 12 == 3) "hex" else "stream") else ""
                val filter =
                  if (ch == 1 && k % 12 == 6)
                    (if (k % 24 == 6) "INLINE" else "INLINEAHX")
                  else "Flate"
                graft.pipeline.PdfCodec.ImagePageSpec(w, h, ch, px, filter,
                  indexed = indexed)
              case 1 =>
                val w = (24 + k % 13).toInt
                val h = (16 + k % 11).toInt
                val ch = if (k % 2 == 0) 1 else 3
                val px = new Array[Byte](w * h * ch)
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    val v = (128 + 3 * ((k * 31 + (x / 8) * 7 + (y / 8) * 13L) % 53 - 26)).toByte
                    var c = 0
                    while (c < ch) { px((y * w + x) * ch + c) = v; c += 1 }
                    x += 1
                  }
                  y += 1
                }
                graft.pipeline.PdfCodec.ImagePageSpec(w, h, ch, px, "DCT")
              case _ =>
                val w = (17 + k % 16).toInt
                val h = (13 + k % 12).toInt
                val px = Array.tabulate[Byte](w * h) { i =>
                  val x = i % w; val y = i / w
                  (if ((k * 37 + x * 7L + y * 13L) % 5 < 2) 0 else 255).toByte
                }
                // bilevel carrier rotates by k%12 (round 20, VERDICT
                // r19 #4): the same pixels ride CCITT G4 (k%12==2),
                // JBIG2 generic region via the MQ coder (k%12==8),
                // CCITT byte-aligned MH (k%12==5) and JBIG2 MMR
                // (k%12==11) — wire rotation results-invisible, so the
                // oracle is untouched and an MQ/template slip breaks
                // the hash
                val filter = (k % 12) match {
                  case 8 => if (k % 24 == 20) "JBIG2TP" else "JBIG2"
                  case 11 => "JBIG2MMR"
                  case _ => "CCITT"
                }
                // k%24==23: the MMR leg ships STRIPED (two full-width
                // region segments at row offsets, OR-composited — the
                // real large-scan shape); decoded pixels identical
                graft.pipeline.PdfCodec.ImagePageSpec(w, h, 1, px, filter,
                  ccittG4 = k % 2 == 0,
                  jbig2Stripes = if (k % 24 == 23) 2 else 1)
            }
          }
          val bytes = graft.pipeline.PdfCodec.encodeImagePdf(specs)
          mediaRow(id, bytes, "application/pdf")
        }
      }
    }(enc)
  }

  /** Image extraction over scanned-page PDFs — [[graft.pipeline.PdfCodec.extractImages]]
    * per row (batched narrow mapPartitions, the codec contract), each
    * image reduced to geometry + per-channel pixel sums (the
    * q_image_decode feature convention). */
  def decodePdfImages(media: DataFrame, idCol: String = "doc_id",
                      batchSize: Int = 16): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("page", LongType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("channels", LongType, nullable = false),
      StructField("r_sum", LongType, nullable = false),
      StructField("g_sum", LongType, nullable = false),
      StructField("b_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select(col(idCol), col("content")).mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val id = r.getLong(0)
          graft.pipeline.PdfCodec.extractImages(r.getAs[Array[Byte]](1)).map { im =>
            val sums = new Array[Long](3)
            var i = 0
            while (i < im.pixels.length) {
              sums(i % im.channels) += im.pixels(i) & 0xff
              i += 1
            }
            Row(id, im.page.toLong, im.width.toLong, im.height.toLong,
              im.channels.toLong, sums(0), sums(1), sums(2))
          }
        }
      }
    }(enc)
  }

  /** 4-BIT BMP corpus (round 17 — the legacy clip-art shape): 16-entry
    * palette from the mode-0 formulas, indices (id·37 + i·13) mod 16,
    * uncompressed on even ids and BI_RLE4 on odd — the wire form must
    * be results-invisible, so ONE oracle covers both. */
  def synthesizeBmp4s(docs: DataFrame, idCol: String = "doc_id",
                      batchSize: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema(idCol))
    val pal16: Array[Byte] = {
      val t = new Array[Byte](16 * 3)
      var j = 0
      while (j < 16) {
        t(3 * j) = ((j * 37) % 256).toByte
        t(3 * j + 1) = ((j * 59 + 17) % 256).toByte
        t(3 * j + 2) = ((j * 83 + 29) % 256).toByte
        j += 1
      }
      t
    }
    spreadIds(docs, idCol).mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val w = (11 + id % 13).toInt
          val h = (9 + id % 11).toInt
          val idx = new Array[Byte](w * h)
          var i = 0
          while (i < idx.length) { idx(i) = ((id * 37 + i * 13L) % 16).toByte; i += 1 }
          val bytes = BmpCodec.encode(w, h, idx, pal16,
            bpp4 = true, rle4 = id % 2 == 1)
          mediaRow(id, bytes, "image/bmp")
        }
      }
    }(enc)
  }

  /** 16-BIT-sample corpus (round 17 — the scientific/medical scan
    * depth): the SAME pixel corpus as [[synthesizeTiffs]], each 8-bit
    * sample widened to v·257 (the spec scaling) in the file's byte
    * order, striped or 16x16-tiled by id, none/LZW/Deflate rotation.
    * Decoded results (high-byte reduction) must equal the 8-bit
    * corpus's exactly. */
  def synthesize16BitTiffs(docs: DataFrame, idCol: String = "doc_id",
                           batchSize: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema(idCol))
    spreadIds(docs, idCol).mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val w = (9 + id % 13).toInt
          val h = (7 + id % 11).toInt
          val ch = if (id % 2 == 0) 1 else 3
          val px = new Array[Byte](w * h * ch)
          var i = 0
          while (i < px.length) { px(i) = ((id * 37 + i * 11L) % 256).toByte; i += 1 }
          val comp = (id % 3).toInt
          val bytes = TiffCodec.encode(w, h, ch, px,
            bigEndian = id % 4 == 0,
            lzw = comp == 1, deflate = comp == 2,
            rowsPerStrip = if (id % 5 < 3) (1 + id % 4).toInt else 0,
            tileSize = if (id % 5 >= 3) 16 else 0,
            bits16 = true)
          mediaRow(id, bytes, "image/tiff")
        }
      }
    }(enc)
  }

  /** SUB-BYTE GRAY corpus (round 17): 2-bit on even ids, 4-bit (the
    * 16-level scanner setting) on odd; striped or 16x16-tiled by id%4,
    * WhiteIsZero on id%5<2, none/LZW/Deflate rotation:
    *   w = 15 + id%14, h = 11 + id%10
    *   gray(x, y) = ((id·31 + x·5 + y·11) mod 2^d) · 255/(2^d−1) */
  def synthesizeGrayTiffs(docs: DataFrame, idCol: String = "doc_id",
                          batchSize: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema(idCol))
    spreadIds(docs, idCol).mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val d = if (id % 2 == 0) 2 else 4
          val lim = (1 << d) - 1
          val w = (15 + id % 14).toInt
          val h = (11 + id % 10).toInt
          val px = new Array[Byte](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              px(y * w + x) =
                (((id * 31 + x * 5L + y * 11L) % (lim + 1)) * (255 / lim)).toByte
              x += 1
            }
            y += 1
          }
          val comp = (id % 3).toInt
          val bytes = TiffCodec.encode(w, h, 1, px,
            bigEndian = id % 7 < 3,
            lzw = comp == 1, deflate = comp == 2,
            rowsPerStrip = if (id % 4 < 2) (2 + id % 5).toInt else 0,
            whiteIsZero = id % 5 < 2,
            tileSize = if (id % 4 >= 2) 16 else 0,
            grayBits = d)
          mediaRow(id, bytes, "image/tiff")
        }
      }
    }(enc)
  }

  /** [[synthesizeLzwTiffs]]' Deflate sibling (round 17): the SAME pixel
    * corpus compressed with Deflate — both the modern tag 8 and the
    * older 32946 alias appear (by id), half the rows under Predictor 2,
    * mixed byte orders and strip splits. Decoded results must be
    * byte-identical to the LZW and uncompressed corpora. */
  def synthesizeDeflateTiffs(docs: DataFrame, idCol: String = "doc_id",
                             batchSize: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema(idCol))
    val ids = spreadIds(docs, idCol)
    ids.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val w = (9 + id % 13).toInt
          val h = (7 + id % 11).toInt
          val ch = if (id % 2 == 0) 1 else 3
          val px = new Array[Byte](w * h * ch)
          var i = 0
          while (i < px.length) { px(i) = ((id * 37 + i * 11L) % 256).toByte; i += 1 }
          val bytes = TiffCodec.encode(w, h, ch, px,
            bigEndian = id % 3 == 0,
            rowsPerStrip = (1 + id % 5).toInt,
            deflate = true, predictor2 = id % 2 == 1,
            oldDeflateTag = id % 4 == 1)
          mediaRow(id, bytes, "image/tiff")
        }
      }
    }(enc)
  }

  /** [[decodeTiffs]]' BMP sibling: decode through [[BmpCodec]] and emit
    * the same integer features (per-channel sums + the position-weighted
    * checksum over the RGB buffer). */
  def decodeBmps(media: DataFrame, idCol: String = "doc_id",
                 batchSize: Int = 16): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("r_sum", LongType, nullable = false),
      StructField("g_sum", LongType, nullable = false),
      StructField("b_sum", LongType, nullable = false),
      StructField("weighted_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idIdx = media.schema.fieldIndex(idCol)
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(idIdx)
          val img = BmpCodec.decode(r.getAs[Array[Byte]](contentIdx))
          val sums = new Array[Long](3)
          var weighted = 0L
          var p = 0
          while (p < img.pixels.length) {
            val v = img.pixels(p) & 0xff
            sums(p % 3) += v
            weighted += (p + 1).toLong * v
            p += 1
          }
          Row(id, img.width.toLong, img.height.toLong,
            sums(0), sums(1), sums(2), weighted)
        }
      }
    }(enc)
  }

  def synthesizeTiffs(docs: DataFrame, idCol: String = "doc_id",
                      batchSize: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema(idCol))
    val ids = spreadIds(docs, idCol)
    ids.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val w = (9 + id % 13).toInt
          val h = (7 + id % 11).toInt
          val ch = if (id % 2 == 0) 1 else 3
          val px = new Array[Byte](w * h * ch)
          var i = 0
          while (i < px.length) { px(i) = ((id * 37 + i * 11L) % 256).toByte; i += 1 }
          val bytes = TiffCodec.encode(w, h, ch, px,
            bigEndian = id % 3 == 0,
            packBits = id % 4 < 2,
            rowsPerStrip = (1 + id % 5).toInt,
            whiteIsZero = ch == 1 && id % 5 == 3)
          mediaRow(id, bytes, "image/tiff")
        }
      }
    }(enc)
  }

  /** REAL TIFF decode over (id, content) rows ([[TiffCodec]] fails loud
    * on non-TIFF bytes): true geometry, per-channel sums and the
    * POSITION-WEIGHTED checksum Σ (p+1)·buffer[p] (order-sensitive, so
    * a strip-assembly or PackBits bug breaks the gate even though plain
    * sums wouldn't). All integers — hash-exact against a SQL replay. */
  def decodeTiffs(media: DataFrame, idCol: String = "doc_id",
                  batchSize: Int = 16): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("channels", LongType, nullable = false),
      StructField("r_sum", LongType, nullable = false),
      StructField("g_sum", LongType, nullable = false),
      StructField("b_sum", LongType, nullable = false),
      StructField("weighted_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idIdx = media.schema.fieldIndex(idCol)
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(idIdx)
          val img = TiffCodec.decode(r.getAs[Array[Byte]](contentIdx))
          val ch = img.channels
          val sums = new Array[Long](3)
          var weighted = 0L
          var p = 0
          while (p < img.pixels.length) {
            val v = img.pixels(p) & 0xff
            sums(p % ch) += v
            weighted += (p + 1).toLong * v
            p += 1
          }
          Row(id, img.width.toLong, img.height.toLong, ch.toLong,
            sums(0), sums(1), sums(2), weighted)
        }
      }
    }(enc)
  }

  /** WebP VP8L corpus (round 18 — a top-3 web-crawl image format):
    * w = 10 + id%11, h = 8 + id%9, RGB. Wire mode rotates id%7 through
    * plain literals / subtract-green / 16-color PALETTE (bundled
    * sub-byte indices) / LZ77+color-cache / PREDICTOR (mode id%14) /
    * COLOR transform / META PREFIX CODES (two huffman groups).
    * Pixel formulas (oracle-replayable):
    *   palette ids (id%7 == 2): idx(p) = (id·37 + p·13) mod 16,
    *     rgb(j) = (j·37 mod 256, (j·59+17) mod 256, (j·83+29) mod 256)
    *   all other modes: byte i of interleaved RGB = (id·37 + i·11) mod 256
    * — the wire mode must be results-INVISIBLE (lossless invariance),
    * so ONE oracle covers all six shapes. */
  def synthesizeWebps(docs: DataFrame, idCol: String = "doc_id",
                      batchSize: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema(idCol))
    spreadIds(docs, idCol).mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val w = (10 + id % 11).toInt
          val h = (8 + id % 9).toInt
          val mode = (id % 7).toInt
          val px = new Array[Byte](w * h * 3)
          if (mode == 2) {
            var p = 0
            while (p < w * h) {
              val j = ((id * 37 + p * 13L) % 16).toInt
              px(3 * p) = ((j * 37) % 256).toByte
              px(3 * p + 1) = ((j * 59 + 17) % 256).toByte
              px(3 * p + 2) = ((j * 83 + 29) % 256).toByte
              p += 1
            }
          } else {
            var i = 0
            while (i < px.length) {
              px(i) = ((id * 37 + i * 11L) % 256).toByte
              i += 1
            }
          }
          // VP8X still-container rotation (round 19): every third file
          // wraps the same VP8L stream in an extended container —
          // results-invisible, so the oracle carries verbatim
          val bytes = WebpCodec.encode(w, h, 3, px, mode = mode,
            predMode = (id % 14).toInt, vp8x = id % 3 == 1)
          mediaRow(id, bytes, "image/webp")
        }
      }
    }(enc)
  }

  /** WebP feature decode — the [[decodeTiffs]] shape (dims + per-channel
    * sums + the position-weighted sum) over [[WebpCodec]] rows. */
  def decodeWebps(media: DataFrame, idCol: String = "doc_id",
                  batchSize: Int = 16): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("channels", LongType, nullable = false),
      StructField("r_sum", LongType, nullable = false),
      StructField("g_sum", LongType, nullable = false),
      StructField("b_sum", LongType, nullable = false),
      StructField("weighted_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idIdx = media.schema.fieldIndex(idCol)
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(idIdx)
          val img = WebpCodec.decode(r.getAs[Array[Byte]](contentIdx))
          val ch = img.channels
          val sums = new Array[Long](4)
          var weighted = 0L
          var p = 0
          while (p < img.pixels.length) {
            val v = img.pixels(p) & 0xff
            sums(p % ch) += v
            weighted += (p + 1).toLong * v
            p += 1
          }
          Row(id, img.width.toLong, img.height.toLong, ch.toLong,
            sums(0), sums(1), sums(2), weighted)
        }
      }
    }(enc)
  }

  /** [[synthesizeTiffs]]' MULTI-PAGE sibling (round 16 — scanned
    * documents are routinely multi-page): one TIFF per doc whose IFD
    * chain carries 2 + id%3 pages of DIFFERENT geometry:
    *   page p: w = 9 + (id+p)%13, h = 7 + (id+p)%11,
    *           ch = 1 if (id+p)%2 == 0 else 3
    *   pixel i of page p: (id·37 + p·53 + i·11) mod 256
    * byte order / PackBits / strips cycle by id like the single-page
    * corpus. */
  def synthesizeMultiTiffs(docs: DataFrame, idCol: String = "doc_id",
                           batchSize: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema(idCol))
    val ids = spreadIds(docs, idCol)
    ids.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val nPages = (2 + id % 3).toInt
          val pages = (0 until nPages).map { p =>
            val w = (9 + (id + p) % 13).toInt
            val h = (7 + (id + p) % 11).toInt
            val ch = if ((id + p) % 2 == 0) 1 else 3
            val px = new Array[Byte](w * h * ch)
            var i = 0
            while (i < px.length) {
              px(i) = ((id * 37 + p * 53 + i * 11L) % 256).toByte
              i += 1
            }
            (w, h, ch, px)
          }
          val bytes = TiffCodec.encodeMulti(pages,
            bigEndian = id % 3 == 0,
            packBits = id % 4 < 2,
            rowsPerStrip = (1 + id % 5).toInt)
          mediaRow(id, bytes, "image/tiff")
        }
      }
    }(enc)
  }

  /** [[decodeTiffs]] per PAGE ([[TiffCodec.pages]] walks the IFD
    * chain): one row per (doc, page) with the same integer features. */
  def decodeTiffPages(media: DataFrame, idCol: String = "doc_id",
                      batchSize: Int = 16): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("page_no", LongType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("channels", LongType, nullable = false),
      StructField("r_sum", LongType, nullable = false),
      StructField("g_sum", LongType, nullable = false),
      StructField("b_sum", LongType, nullable = false),
      StructField("weighted_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idIdx = media.schema.fieldIndex(idCol)
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val id = r.getLong(idIdx)
          TiffCodec.pages(r.getAs[Array[Byte]](contentIdx)).zipWithIndex
            .map { case (img, pageNo) =>
              val ch = img.channels
              val sums = new Array[Long](3)
              var weighted = 0L
              var p = 0
              while (p < img.pixels.length) {
                val v = img.pixels(p) & 0xff
                sums(p % ch) += v
                weighted += (p + 1).toLong * v
                p += 1
              }
              Row(id, pageNo.toLong, img.width.toLong, img.height.toLong,
                ch.toLong, sums(0), sums(1), sums(2), weighted)
            }
        }
      }
    }(enc)
  }

  /** Deterministic in-engine MOTION-JPEG synthesis: the video leg —
    * each document becomes a concatenated-JPEG stream (the classic
    * MJPEG container: complete SOI..EOI frames back to back), every
    * frame a REAL flat-block JPEG from the [[synthesizeJpegs]] recipe
    * with a per-frame term so frames differ deterministically:
    *   frames = 3 + doc_id % 4
    *   per frame f: width = 24 + doc_id % 13, height = 16 + doc_id % 11,
    *   comps = 1 if doc_id % 2 == 0 else 3,
    *   blockValue(bx, by, f) =
    *     128 + 3·(((doc_id·31 + bx·7 + by·13 + f·11) mod 53) − 26)
    * Output: (idCol, content binary, meta struct) — the [[asMedia]] shape. */
  def synthesizeMjpegs(docs: DataFrame, idCol: String = "doc_id",
                       batchSize: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema(idCol))
    val ids = spreadIds(docs, idCol)
    ids.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val w = (24 + id % 13).toInt
          val h = (16 + id % 11).toInt
          val comps = if (id % 2 == 0) 1 else 3
          val nFrames = (3 + id % 4).toInt
          val bos = new java.io.ByteArrayOutputStream()
          var f = 0
          while (f < nFrames) {
            val px = new Array[Byte](w * h * comps)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val v = (128 + 3 * ((id * 31 + (x / 8) * 7 + (y / 8) * 13 + f * 11) % 53 - 26)).toByte
                var c = 0
                while (c < comps) { px((y * w + x) * comps + c) = v; c += 1 }
                x += 1
              }
              y += 1
            }
            val frame = JpegCodec.encode(w, h, comps, px, quality = 90)
            bos.write(frame, 0, frame.length)
            f += 1
          }
          val bytes = bos.toByteArray
          Row(id, bytes, Row("video/x-motion-jpeg", bytes.length.toLong))
        }
      }
    }(enc)
  }

  /** [[synthesizeMjpegs]]' AVI-wrapped twin ([[AviCodec]] writes a
    * conforming RIFF/AVI — avih + MJPG strl headers, movi 00dc chunks,
    * idx1): the SAME frame formulas, so the container is pure LAYOUT
    * and q_frame_decode's oracle gates AVI container-invariance the way
    * the interlaced-PNG oracle gates layout. */
  /** Matroska corpus (round 19, VERDICT r18 #5): the SAME flat-block
    * MJPEG frame recipe as [[synthesizeAvis]], wrapped in a real
    * EBML/Matroska file — V_MJPEG video track, keyframe SimpleBlocks
    * split across clusters of 1-3 frames, an audio track the walk must
    * skip on every third doc — so the q_frame_decode oracle carries
    * VERBATIM (container invariance, the AVI/MP4 convention). */
  def synthesizeMkvs(docs: DataFrame, idCol: String = "doc_id",
                     batchSize: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema(idCol))
    spreadIds(docs, idCol).mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val w = (24 + id % 13).toInt
          val h = (16 + id % 11).toInt
          val comps = if (id % 2 == 0) 1 else 3
          val nFrames = (3 + id % 4).toInt
          val frames = (0 until nFrames).map { f =>
            val px = new Array[Byte](w * h * comps)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val v = (128 + 3 * ((id * 31 + (x / 8) * 7 + (y / 8) * 13 + f * 11) % 53 - 26)).toByte
                var c = 0
                while (c < comps) { px((y * w + x) * comps + c) = v; c += 1 }
                x += 1
              }
              y += 1
            }
            JpegCodec.encode(w, h, comps, px, quality = 90)
          }
          val bytes = MkvCodec.encode(frames, w, h,
            perCluster = (1 + id % 3).toInt,
            withAudioTrack = id % 3 == 0)
          mediaRow(id, bytes, "video/x-matroska")
        }
      }
    }(enc)
  }

  def synthesizeAvis(docs: DataFrame, idCol: String = "doc_id",
                     batchSize: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema(idCol))
    val ids = spreadIds(docs, idCol)
    ids.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val w = (24 + id % 13).toInt
          val h = (16 + id % 11).toInt
          val comps = if (id % 2 == 0) 1 else 3
          val nFrames = (3 + id % 4).toInt
          val frames = (0 until nFrames).map { f =>
            val px = new Array[Byte](w * h * comps)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val v = (128 + 3 * ((id * 31 + (x / 8) * 7 + (y / 8) * 13 + f * 11) % 53 - 26)).toByte
                var c = 0
                while (c < comps) { px((y * w + x) * comps + c) = v; c += 1 }
                x += 1
              }
              y += 1
            }
            JpegCodec.encode(w, h, comps, px, quality = 90)
          }
          val bytes = AviCodec.encode(frames, w, h)
          Row(id, bytes, Row("video/x-msvideo", bytes.length.toLong))
        }
      }
    }(enc)
  }

  /** [[synthesizeMjpegs]]' MP4-wrapped twin ([[Mp4Codec]] writes a
    * conforming ISO-BMFF file — ftyp/mdat/moov, a vide track with a
    * `jpeg` VisualSampleEntry and full stts/stsc/stsz/stco tables):
    * the SAME frame formulas, so q_frame_mp4 carries q_frame_decode's
    * oracle VERBATIM — container invariance, the q_frame_avi
    * convention. */
  def synthesizeMp4s(docs: DataFrame, idCol: String = "doc_id",
                     batchSize: Int = 16, fragmented: Boolean = false): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema(idCol))
    val ids = spreadIds(docs, idCol)
    ids.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val w = (24 + id % 13).toInt
          val h = (16 + id % 11).toInt
          val comps = if (id % 2 == 0) 1 else 3
          val nFrames = (3 + id % 4).toInt
          val frames = (0 until nFrames).map { f =>
            val px = new Array[Byte](w * h * comps)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val v = (128 + 3 * ((id * 31 + (x / 8) * 7 + (y / 8) * 13 + f * 11) % 53 - 26)).toByte
                var c = 0
                while (c < comps) { px((y * w + x) * comps + c) = v; c += 1 }
                x += 1
              }
              y += 1
            }
            JpegCodec.encode(w, h, comps, px, quality = 90)
          }
          // fragmented: 1-3 frames per moof so multi-fragment AND
          // multi-sample-per-trun shapes both appear in the corpus
          val bytes = Mp4Codec.encode(frames, w, h,
            framesPerFragment = if (fragmented) (1 + id % 3).toInt else 0)
          mediaRow(id, bytes, "video/mp4")
        }
      }
    }(enc)
  }

  /** ANIMATED-GIF synthesis for the frame-sampling gate: one GIF89a per
    * doc whose frames exercise REAL compositing —
    *   w = 16 + id%9, h = 16 + id%7, frames = 3 + id%4
    *   palette entry i: ((i·37)%256, (i·59+17)%256, (i·83+29)%256),
    *   256 entries, background index 0, transparent index 250
    *   EVEN frames: fully opaque, index (id·31+f·11+x·7+y·13) % 250,
    *     disposal 1 when id is even else 2 (restore-to-background)
    *   ODD frames: TRANSPARENT holes where (x+y)%2 == 0, disposal 1
    * so an odd composited frame shows, in its holes, the PREVIOUS
    * frame's pixel (id even) or the background color (id odd) — both
    * closed-form replayable by the oracle. */
  def synthesizeAnimGifs(docs: DataFrame, idCol: String = "doc_id",
                         batchSize: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema(idCol))
    val ids = spreadIds(docs, idCol)
    ids.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val w = (16 + id % 9).toInt
          val h = (16 + id % 7).toInt
          val nf = (3 + id % 4).toInt
          val palette = new Array[Byte](256 * 3)
          var i = 0
          while (i < 256) {
            palette(3 * i) = ((i * 37) % 256).toByte
            palette(3 * i + 1) = ((i * 59 + 17) % 256).toByte
            palette(3 * i + 2) = ((i * 83 + 29) % 256).toByte
            i += 1
          }
          val frames = (0 until nf).map { f =>
            val idx = new Array[Byte](w * h)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                idx(y * w + x) =
                  if (f % 2 == 1 && (x + y) % 2 == 0) 250.toByte
                  else ((id * 31 + f * 11 + x * 7 + y * 13) % 250).toByte
                x += 1
              }
              y += 1
            }
            val transparent = if (f % 2 == 1) Some(250) else None
            val disposal = if (f % 2 == 1) 1 else if (id % 2 == 0) 1 else 2
            (idx, transparent, disposal)
          }
          val bytes = GifCodec.encodeAnim(w, h, palette, frames)
          mediaRow(id, bytes, "image/gif")
        }
      }
    }(enc)
  }

  /** [[synthesizeWavs]]' IEEE-FLOAT sibling (round 16): format-3 files
    * whose float samples are exactly-representable k/32768 values with
    *   k(i, c) = (doc_id·31 + i·7 + c·13) mod 4001 − 2000,
    *   channels = 1 + doc_id % 2, frames = 350 + doc_id % 257, 16 kHz
    * so the decode contract (rint(f·32768), clamp) recovers k exactly
    * and the oracle replays the integer formulas byte-blind. */
  def synthesizeFloatWavs(docs: DataFrame, idCol: String = "doc_id",
                          batchSize: Int = 16): DataFrame =
    synthesizeAudio(docs, idCol, batchSize) { id =>
      val channels = (1 + id % 2).toInt
      val frames = (350 + id % 257).toInt
      val samples = new Array[Int](frames * channels)
      var i = 0
      while (i < frames) {
        var c = 0
        while (c < channels) {
          samples(i * channels + c) =
            ((id * 31 + i * 7L + c * 13L) % 4001).toInt - 2000
          c += 1
        }
        i += 1
      }
      WavCodec.encodeFloat(16000, channels, samples)
    }

  /** WAVE_FORMAT_EXTENSIBLE corpus (round 17): every file wears the
    * 0xFFFE wrapper with the KSDATAFORMAT_SUBTYPE_PCM GUID, two thirds
    * at 24-bit depth (native-scale samples in the millions) and one
    * third 16-bit — the wrapper and the depth must both be
    * results-invisible to the window features the oracle replays:
    *   channels = 1 + doc_id % 2, frames = 350 + doc_id % 257
    *   bits = 16 if doc_id % 3 = 0 else 24
    *   sample(i,c) = (doc_id·131 + i·29 + c·71) mod 10000001 − 5000000   (24-bit)
    *               = (doc_id·31 + i·7 + c·13) mod 4001 − 2000            (16-bit) */
  def synthesize24BitWavs(docs: DataFrame, idCol: String = "doc_id",
                          batchSize: Int = 16): DataFrame =
    synthesizeAudio(docs, idCol, batchSize) { id =>
      val channels = (1 + id % 2).toInt
      val bits = if (id % 3 == 0) 16 else 24
      val frames = (350 + id % 257).toInt
      val samples = new Array[Int](frames * channels)
      var i = 0
      while (i < frames) {
        var c = 0
        while (c < channels) {
          samples(i * channels + c) =
            if (bits == 24)
              ((id * 131 + i * 29L + c * 71L) % 10000001).toInt - 5000000
            else ((id * 31 + i * 7L + c * 13L) % 4001).toInt - 2000
          c += 1
        }
        i += 1
      }
      WavCodec.encode(16000, channels, bits, samples, extensible = true)
    }

  /** [[synthesizeAdpcmWavs]]' MS-ADPCM sibling (round 16): mono
    * format-0x02 files under the standard coefficient table, wire
    * content formula-derived so the oracle replays the two-tap
    * prediction recursion exactly:
    *   blockAlign 39 → 66 samples/block, nBlocks = 3 + doc_id % 4
    *   block b: predictor = (doc_id + b) mod 7
    *            delta0 = 16 + (doc_id·13 + b·7) mod 1000
    *            iSamp1 = (doc_id·37 + b·101) mod 4001 − 2000
    *            iSamp2 = (doc_id·41 + b·59) mod 4001 − 2000
    *   nibble k (0-63, HIGH nibble of byte k/2 first) =
    *            REMAP[(doc_id·31 + b·17 + k·7) mod 16]
    * where REMAP = [0,1,2,3,13,14,15,0,4,1,12,2,6,3,10,15] biases the
    * nibble multiset toward small adaptation factors (twelve 230s, two
    * 307s, two 512s → ×1.59 per 16 nibbles): a uniform multiset grows
    * delta ~107× per cycle — a stream shape no real encoder emits and
    * one that overflows any fixed-width decoder state (the decoder
    * fail-louds past 2^30 for exactly that reason). */
  def synthesizeMsAdpcmWavs(docs: DataFrame, idCol: String = "doc_id",
                            batchSize: Int = 16): DataFrame =
    synthesizeAudio(docs, idCol, batchSize) { id =>
      val nBlocks = (3 + id % 4).toInt
      val blocks = (0 until nBlocks).map { b =>
        val pred = ((id + b) % 7).toInt
        val delta = (16 + (id * 13 + b * 7L) % 1000).toInt
        val s1 = ((id * 37 + b * 101L) % 4001).toInt - 2000
        val s2 = ((id * 41 + b * 59L) % 4001).toInt - 2000
        val remap = Array(0, 1, 2, 3, 13, 14, 15, 0, 4, 1, 12, 2, 6, 3, 10, 15)
        val payload = new Array[Byte](32)
        var j = 0
        while (j < 32) {
          val hi = remap(((id * 31 + b * 17 + (2 * j) * 7L) % 16).toInt)
          val lo = remap(((id * 31 + b * 17 + (2 * j + 1) * 7L) % 16).toInt)
          payload(j) = ((hi << 4) | lo).toByte
          j += 1
        }
        (Array(pred), Array(delta), Array(s1), Array(s2), payload)
      }
      WavCodec.encodeMsAdpcm(8000, 1, 39, blocks)
    }

  /** ANIMATED-WEBP corpus (round 19 — the VP8X/ANIM/ANMF wire shape):
    * frame 0 full-canvas, frames 1-4 8x8 patches at EVEN formula
    * offsets (the wire stores offsets in 2-px units), all opaque RGB,
    * D = 0 (keep) — so a composited frame f shows, at each pixel, the
    * MOST RECENT frame whose rect covers it (the patch-GIF closed
    * form). Blend bit rotates B = 1 / B = 0 per frame (identical
    * results over opaque pixels — results-invisible), and each frame's
    * VP8L stream rotates the wire mode (id+g)%7, so all seven encoder
    * shapes ride the animation path too:
    *   w = 16 + id%9, h = 16 + id%7, frames = 5
    *   patch g ≥ 1: left = 2·((id·7 + g·5) mod ((w−8)/2 + 1)),
    *                top  = 2·((id·3 + g·11) mod ((h−8)/2 + 1))
    *   index at GLOBAL (x,y) of frame g: i = (id·31 + g·11 + x·7 + y·13) % 250
    *   channel values: ((i·37)%256, (i·59+17)%256, (i·83+29)%256) */
  def synthesizeAnimWebps(docs: DataFrame, idCol: String = "doc_id",
                          batchSize: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema(idCol))
    spreadIds(docs, idCol).mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val w = (16 + id % 9).toInt
          val h = (16 + id % 7).toInt
          def px(g: Int, fw: Int, fh: Int, ox: Int, oy: Int): Array[Byte] = {
            val out = new Array[Byte](fw * fh * 3)
            var y = 0
            while (y < fh) {
              var x = 0
              while (x < fw) {
                val i = ((id * 31 + g * 11 + (ox + x) * 7L + (oy + y) * 13L) % 250).toInt
                out((y * fw + x) * 3) = ((i * 37) % 256).toByte
                out((y * fw + x) * 3 + 1) = ((i * 59 + 17) % 256).toByte
                out((y * fw + x) * 3 + 2) = ((i * 83 + 29) % 256).toByte
                x += 1
              }
              y += 1
            }
            out
          }
          val frames = (0 until 5).map { g =>
            val (ox, oy, fw, fh) =
              if (g == 0) (0, 0, w, h)
              else (2 * (((id * 7 + g * 5) % ((w - 8) / 2 + 1)).toInt),
                    2 * (((id * 3 + g * 11) % ((h - 8) / 2 + 1)).toInt), 8, 8)
            WebpCodec.AnimFrameSpec(ox, oy, fw, fh, 3,
              px(g, fw, fh, ox, oy), durationMs = 40 + g,
              noBlend = g % 2 == 0, disposeBg = false,
              mode = ((id + g) % 7).toInt)
          }
          val bytes = WebpCodec.encodeAnim(w, h, frames, loop = (id % 4).toInt)
          mediaRow(id, bytes, "image/webp")
        }
      }
    }(enc)
  }

  /** [[synthesizeAnimGifs]]' PATCH-FRAME sibling (round 16): the wire
    * shape real animated GIFs use — frame 0 full-screen, frames 1..2
    * 8×8 patches at formula positions, all opaque, disposal 1 — so a
    * composited frame f shows, at each pixel, the MOST RECENT frame
    * whose rect covers it:
    *   w = 16 + id%9, h = 16 + id%7, frames = 3 (0 full + 2 patches)
    *   patch g ≥ 1: left = (id·7 + g·5) % (w−8), top = (id·3 + g·11) % (h−8)
    *   index at GLOBAL (x,y) of frame g: (id·31 + g·11 + x·7 + y·13) % 250
    *   palette entry i: ((i·37)%256, (i·59+17)%256, (i·83+29)%256) */
  def synthesizePatchGifs(docs: DataFrame, idCol: String = "doc_id",
                          batchSize: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema(idCol))
    val ids = spreadIds(docs, idCol)
    ids.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val w = (16 + id % 9).toInt
          val h = (16 + id % 7).toInt
          val palette = new Array[Byte](256 * 3)
          var i = 0
          while (i < 256) {
            palette(3 * i) = ((i * 37) % 256).toByte
            palette(3 * i + 1) = ((i * 59 + 17) % 256).toByte
            palette(3 * i + 2) = ((i * 83 + 29) % 256).toByte
            i += 1
          }
          def cell(g: Int, x: Int, y: Int): Byte =
            ((id * 31 + g * 11 + x * 7 + y * 13) % 250).toByte
          val full = {
            val idx = new Array[Byte](w * h)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { idx(y * w + x) = cell(0, x, y); x += 1 }
              y += 1
            }
            GifCodec.AnimFrame(0, 0, w, h, idx, None, 1)
          }
          // frames 1/2/4 keep (disposal 1); frame 3 is RESTORE-TO-PREVIOUS
          // (disposal 3, round 17): its pixels appear in its own snapshot
          // but must vanish from frame 4's — the oracle's cover set
          // excludes g = 3 except at f = 3
          val patches = (1 to 4).map { g =>
            val left = ((id * 7 + g * 5) % (w - 8)).toInt
            val top = ((id * 3 + g * 11) % (h - 8)).toInt
            val idx = new Array[Byte](8 * 8)
            var fy = 0
            while (fy < 8) {
              var fx = 0
              while (fx < 8) {
                idx(fy * 8 + fx) = cell(g, left + fx, top + fy)
                fx += 1
              }
              fy += 1
            }
            GifCodec.AnimFrame(left, top, 8, 8, idx, None, if (g == 3) 3 else 1)
          }
          val bytes = GifCodec.encodeAnimFrames(w, h, palette, full +: patches)
          mediaRow(id, bytes, "image/gif")
        }
      }
    }(enc)
  }

  /** REAL frame sampling + decode over video (id, content) rows: the
    * container is SNIFFED per row — RIFF/AVI streams split via
    * [[AviCodec.videoFrames]], ISO-BMFF/MP4 via [[Mp4Codec.videoFrames]]
    * (jpeg/mjpa sample entries), bare concatenated-JPEG (MJPEG) via
    * [[JpegCodec.frameOffsets]]'s marker walk — then every `stride`-th
    * frame decodes through the real codec and runs the EXISTING
    * grid-pooled tile featurizer, so the video path emits the same
    * feature space the image KNN/dedup operators consume. One row per
    * (doc, sampled frame): frame_idx, true geometry, and the
    * gx·gy·channels tile feature vector. Batched narrow
    * `mapPartitions`, no shuffle — the [[frameSample]] byte-window op
    * stays for opaque containers; this is its decoding twin. */
  def decodeFrameTiles(media: DataFrame, stride: Int = 2, gx: Int = 2, gy: Int = 2,
                       idCol: String = "doc_id", batchSize: Int = 16): DataFrame = {
    require(stride >= 1, s"decodeFrameTiles: stride must be >= 1, got $stride")
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("components", LongType, nullable = false),
      StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val slim = media.select(col(idCol), col("content"))
    slim.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val id = r.getLong(0)
          val content = r.getAs[Array[Byte]](1)
          // stride filter runs on OFFSETS/indices, before any payload
          // copy — skipped frames cost nothing beyond the marker walk
          val images: Iterator[(PngCodec.PngImage, Int)] =
            if (WebpCodec.isWebp(content))
              // animated WebP (round 19): composited ANMF frames, the
              // GifCodec.frames contract
              WebpCodec.frames(content).iterator.zipWithIndex
                .filter(_._2 % stride == 0)
            else if (GifCodec.isGif(content))
              // animated GIF (round 16): frames arrive COMPOSITED
              // (disposal 1/2 over the background canvas) — the stride
              // filter still runs on indices before feature work, but
              // compositing is inherently sequential so skipped frames
              // cost their canvas paint, not their feature pass
              GifCodec.frames(content).iterator.zipWithIndex
                .filter(_._2 % stride == 0)
            else {
              val payloads: Iterator[(Array[Byte], Int)] =
                if (AviCodec.isAvi(content))
                  AviCodec.videoFrames(content).iterator.zipWithIndex
                    .filter(_._2 % stride == 0)
                else if (MkvCodec.isMkv(content))
                  MkvCodec.videoFrames(content).iterator.zipWithIndex
                    .filter(_._2 % stride == 0)
                else if (Mp4Codec.isMp4(content))
                  Mp4Codec.videoFrames(content).iterator.zipWithIndex
                    .filter(_._2 % stride == 0)
                else JpegCodec.frameOffsets(content).iterator.zipWithIndex
                  .filter(_._2 % stride == 0)
                  .map { case ((start, stop), f) =>
                    (java.util.Arrays.copyOfRange(content, start, stop), f)
                  }
              payloads.map { case (payload, f) =>
                val j = JpegCodec.decode(payload)
                require(j.components <= 3,
                  s"decodeFrameTiles: doc $id frame $f is ${j.components}-component " +
                    "(CMYK) — out of the gray/RGB frame scope")
                (PngCodec.PngImage(j.width, j.height, 8,
                  if (j.components == 1) 0 else 2, j.components, j.pixels), f)
              }
            }
          images
            .map { case (img, f) =>
              Row(id, f.toLong, img.width.toLong, img.height.toLong,
                img.channels.toLong, PngCodec.tileFeatures(img, gx, gy).toSeq)
            }
        }
      }
    }(enc)
  }

  /** Deterministic in-engine CMYK/YCCK JPEG synthesis — the
    * [[synthesizeJpegs]] recipe for the Adobe print-corpus leg. The
    * flat-block determinism contract applies PER CHANNEL (all four
    * planes ride the luma quant table at quality 90, and YCCK files use
    * equal C=M=Y so the chroma legs are neutral-128 exact):
    *   width = 24 + doc_id % 13, height = 16 + doc_id % 11
    *   transform = 0 (CMYK) when doc_id % 2 == 0 else 2 (YCCK)
    *   channel c value(bx, by) =
    *     127 + 3·(((doc_id·31 + bx·7 + by·13 + t·17) mod 53) − 26)
    *   where t = c for transform 0 and t = (0,0,0,3)(c) for YCCK
    *   (C=M=Y share the t=0 value; K uses t=3).
    * The base is 127 (not 128): the Adobe convention STORES 255−v, and
    * quality-90 exactness needs the STORED flat value ≡ 128 (mod 3) —
    * so the TRUE value must be ≡ 127 (mod 3).
    * Output: (idCol, content binary, meta struct) — the [[asMedia]] shape. */
  def synthesizeCmykJpegs(docs: DataFrame, idCol: String = "doc_id",
                          batchSize: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema(idCol))
    val ids = spreadIds(docs, idCol)
    ids.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val w = (24 + id % 13).toInt
          val h = (16 + id % 11).toInt
          val transform = if (id % 2 == 0) 0 else 2
          val px = new Array[Byte](w * h * 4)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              var c = 0
              while (c < 4) {
                val t = if (transform == 0) c else if (c == 3) 3 else 0
                px((y * w + x) * 4 + c) =
                  (127 + 3 * ((id * 31 + (x / 8) * 7 + (y / 8) * 13 + t * 17) % 53 - 26)).toByte
                c += 1
              }
              x += 1
            }
            y += 1
          }
          val bytes = JpegCodec.encode(w, h, 4, px, quality = 90,
            adobeTransform = transform)
          Row(id, bytes, Row("image/jpeg", bytes.length.toLong))
        }
      }
    }(enc)
  }

  /** REAL CMYK JPEG decode over (id, content) rows: emits true geometry,
    * the APP14 transform actually decoded, and per-channel TRUE-CMYK
    * sums. Batched narrow `mapPartitions`, the [[decodeJpegs]] shape. */
  def decodeCmykJpegs(media: DataFrame, idCol: String = "doc_id",
                      batchSize: Int = 16): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("components", LongType, nullable = false),
      StructField("c_sum", LongType, nullable = false),
      StructField("m_sum", LongType, nullable = false),
      StructField("y_sum", LongType, nullable = false),
      StructField("k_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idIdx = media.schema.fieldIndex(idCol)
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(idIdx)
          val img = JpegCodec.decode(r.getAs[Array[Byte]](contentIdx))
          require(img.components == 4,
            s"decodeCmykJpegs: doc $id decoded ${img.components} components (want 4)")
          val sums = new Array[Long](4)
          var i = 0
          while (i < img.pixels.length) {
            sums(i % 4) += img.pixels(i) & 0xff
            i += 1
          }
          Row(id, img.width.toLong, img.height.toLong, 4L,
            sums(0), sums(1), sums(2), sums(3))
        }
      }
    }(enc)
  }

  /** REAL JPEG decode over (id, content) rows: every content blob must
    * be a JPEG ([[JpegCodec]] fails loud otherwise). Emits true geometry
    * plus deterministic pixel statistics — per-channel sums (gray lands
    * in `r_sum`; absent channels report 0) and the md5 of the decoded
    * pixel buffer. Batched narrow `mapPartitions`: no shuffle, the
    * decode cost parallelizes embarrassingly. */
  def decodeJpegs(media: DataFrame, idCol: String = "doc_id",
                  batchSize: Int = 16): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("components", LongType, nullable = false),
      StructField("r_sum", LongType, nullable = false),
      StructField("g_sum", LongType, nullable = false),
      StructField("b_sum", LongType, nullable = false),
      StructField("pixel_md5", StringType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idIdx = media.schema.fieldIndex(idCol)
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(idIdx)
          val img = JpegCodec.decode(r.getAs[Array[Byte]](contentIdx))
          // this op's schema is gray/RGB; a CMYK file (decodable since
          // round 15) must go through decodeCmykJpegs, not crash here
          require(img.components <= 3,
            s"decodeJpegs: doc $id is ${img.components}-component (CMYK) — " +
              "use decodeCmykJpegs")
          val sums = new Array[Long](3)
          var i = 0
          while (i < img.pixels.length) {
            sums(i % img.components) += img.pixels(i) & 0xff
            i += 1
          }
          md.reset()
          val digest = md.digest(img.pixels).map("%02x".format(_)).mkString
          Row(id, img.width.toLong, img.height.toLong, img.components.toLong,
            sums(0), sums(1), sums(2), digest)
        }
      }
    }(enc)
  }

  /** REAL image resize over (id, content) rows — PNG or JPEG in,
    * sniffed per row: decode → nearest-neighbor resample
    * ([[PngCodec.resizeNearest]]) → re-ENCODE as PNG, so the output
    * column is one normalized lossless format regardless of the input
    * wire format (thumbnail normalization, the standard pre-training
    * image pass). Batched narrow `mapPartitions` —
    * the decode+encode cost parallelizes embarrassingly, no shuffle.
    * Output: (idCol, content, width, height). */
  def resizeImages(media: DataFrame, outW: Int, outH: Int,
                   idCol: String = "doc_id", batchSize: Int = 16): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("content", BinaryType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    // project first (the synthesizeImages convention): mapPartitions
    // deserializes whole rows, and this pass reads only (id, content)
    val slim = media.select(col(idCol), col("content"))
    slim.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val img = PngCodec.resizeNearest(
            decodeAnyImage(r.getAs[Array[Byte]](1)), outW, outH)
          Row(id, PngCodec.encode(img.width, img.height, img.colorType, img.pixels),
            img.width.toLong, img.height.toLong)
        }
      }
    }(enc)
  }

  /** Decode PNG, JPEG, GIF, TIFF or BMP content by magic sniff into the shared
    * decoded-image shape (JPEG adapts: bit depth 8, gray→colorType 0,
    * RGB→2; GIF decodes straight to the shape); anything else fails
    * loud — the image OPS below are format-agnostic, the codecs stay
    * format-specific. */
  private def decodeAnyImage(content: Array[Byte]): PngCodec.PngImage =
    if (isPng(content)) PngCodec.decode(content)
    else if (JpegCodec.isJpeg(content)) {
      val j = JpegCodec.decode(content)
      // the shared decoded-image shape has no CMYK color type — a
      // 4-component file here would masquerade as RGB with 4 channels,
      // breaking the (colorType, channels)-agree invariant downstream
      require(j.components <= 3,
        "BinaryPipeline: CMYK JPEG in a format-agnostic image op — " +
          "decode it via decodeCmykJpegs")
      PngCodec.PngImage(j.width, j.height, 8,
        if (j.components == 1) 0 else 2, j.components, j.pixels)
    } else if (GifCodec.isGif(content)) GifCodec.decode(content)
    else if (TiffCodec.isTiff(content)) TiffCodec.decode(content)
    else if (BmpCodec.isBmp(content)) BmpCodec.decode(content)
    else if (WebpCodec.isWebp(content)) WebpCodec.decode(content)
    else throw new IllegalArgumentException(
      "BinaryPipeline: content is not PNG/JPEG/GIF/TIFF/BMP/WebP (image op on non-image bytes)")

  /** Deterministic in-engine GIF synthesis over document rows — the
    * [[synthesizeImages]] recipe for the palette/LZW leg ([[GifCodec]]
    * writes REAL GIF89a files). Formulas (all from doc_id alone):
    *   width = 10 + doc_id % 13, height = 8 + doc_id % 11
    *   nColors-entry palette: entry j = ((id·17 + j·29) % 256,
    *     (id·19 + j·31) % 256, (id·23 + j·37) % 256)
    *   index(i) = (id·31 + i·7) % nColors, row-major pixel i
    *   interlaced when id % 4 == 1; GCE transparent index 0 when
    *   id % 5 == 2 (decodes to RGBA)
    * `nColors` trades palette realism against feature entropy: 8 (the
    * default) is the classic small-palette web GIF, but its mod-8 index
    * cycle makes tile MEANS collapse to the palette mean (every 8
    * consecutive pixels hit all entries once), so features are near-
    * parallel across ids — fine for decode gates, fatal for a cosine
    * dedup gate. 250 gives PNG-like quasi-random tile features.
    * Output: (idCol, content binary, meta struct) — the [[asMedia]] shape. */
  def synthesizeGifs(docs: DataFrame, idCol: String = "doc_id",
                     batchSize: Int = 16, nColors: Int = 8): DataFrame = {
    require(nColors >= 2 && nColors <= 256, s"synthesizeGifs: nColors $nColors (2-256)")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema(idCol))
    val ids = spreadIds(docs, idCol)
    ids.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val w = (10 + id % 13).toInt
          val h = (8 + id % 11).toInt
          val pal = new Array[Byte](3 * nColors)
          var j = 0
          while (j < nColors) {
            pal(3 * j) = ((id * 17 + j * 29) % 256).toByte
            pal(3 * j + 1) = ((id * 19 + j * 31) % 256).toByte
            pal(3 * j + 2) = ((id * 23 + j * 37) % 256).toByte
            j += 1
          }
          val idx = new Array[Byte](w * h)
          var i = 0
          while (i < idx.length) { idx(i) = ((id * 31 + i * 7L) % nColors).toByte; i += 1 }
          val bytes = GifCodec.encode(w, h, pal, idx,
            interlace = id % 4 == 1,
            transparentIdx = if (id % 5 == 2) Some(0) else None)
          mediaRow(id, bytes, "image/gif")
        }
      }
    }(enc)
  }

  /** REAL GIF decode over (id, content) rows ([[GifCodec]] fails loud on
    * non-GIF bytes). Emits true geometry, per-channel sums, and a
    * POSITION-WEIGHTED checksum Σ (p+1)·buffer[p] over the decoded
    * row-major buffer — order-sensitive, so an interlace or LZW
    * reordering bug breaks the gate even though plain sums wouldn't.
    * All integers: hash-exact against a SQL replay. */
  def decodeGifs(media: DataFrame, idCol: String = "doc_id",
                 batchSize: Int = 16): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("channels", LongType, nullable = false),
      StructField("r_sum", LongType, nullable = false),
      StructField("g_sum", LongType, nullable = false),
      StructField("b_sum", LongType, nullable = false),
      StructField("a_sum", LongType, nullable = false),
      StructField("weighted_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idIdx = media.schema.fieldIndex(idCol)
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(idIdx)
          val img = GifCodec.decode(r.getAs[Array[Byte]](contentIdx))
          val ch = img.channels
          val sums = new Array[Long](4)
          var weighted = 0L
          var p = 0
          while (p < img.pixels.length) {
            val v = img.pixels(p) & 0xff
            sums(p % ch) += v
            weighted += (p + 1).toLong * v
            p += 1
          }
          Row(id, img.width.toLong, img.height.toLong, ch.toLong,
            sums(0), sums(1), sums(2), sums(3), weighted)
        }
      }
    }(enc)
  }

  /** GRID-POOLED image features over (id, content) rows — PNG or JPEG,
    * sniffed per row: decode → [[PngCodec.tileFeatures]] — a
    * gx·gy·channels double vector per image, the cheap deterministic
    * "image embedding" that drops into the engine's KNN/ANN/dedup
    * operators (brute, IVF, HNSW, SemDeDup) unchanged regardless of the
    * wire format.
    * Output: (idCol, features array<double>, width, height, channels). */
  def imageTileFeatures(media: DataFrame, gx: Int = 4, gy: Int = 4,
                        idCol: String = "doc_id", batchSize: Int = 16): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("channels", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    // project first (the synthesizeImages convention)
    val slim = media.select(col(idCol), col("content"))
    slim.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val img = decodeAnyImage(r.getAs[Array[Byte]](1))
          Row(id, PngCodec.tileFeatures(img, gx, gy).toSeq,
            img.width.toLong, img.height.toLong, img.channels.toLong)
        }
      }
    }(enc)
  }

  /** Tile features for every image a PDF's pages paint (round 19 —
    * the scanned-corpus modality joining the KNN feature space):
    * [[graft.pipeline.PdfCodec.extractImages]] per row, each image
    * grid-pooled exactly like [[imageTileFeatures]]. */
  def pdfImageTileFeatures(media: DataFrame, gx: Int = 4, gy: Int = 4,
                           idCol: String = "doc_id",
                           batchSize: Int = 16): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("page", LongType, nullable = false),
      StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("channels", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select(col(idCol), col("content")).mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val id = r.getLong(0)
          graft.pipeline.PdfCodec.extractImages(r.getAs[Array[Byte]](1)).map { im =>
            val img = PngCodec.PngImage(im.width, im.height, 8,
              if (im.channels == 1) 0 else 2, im.channels, im.pixels)
            Row(id, im.page.toLong, PngCodec.tileFeatures(img, gx, gy).toSeq,
              im.width.toLong, im.height.toLong, im.channels.toLong)
          }
        }
      }
    }(enc)
  }

  /** Batched feature extraction over (id, content, meta) rows.
    * PNG content gets REAL dimensions from [[PngCodec]]; other media
    * stays on the documented deterministic pseudo-features.
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
          val (len, digest, w, h) =
            if (isPng(content)) {
              val img = PngCodec.decode(content)
              val md = java.security.MessageDigest.getInstance("MD5")
              (content.length.toLong,
                md.digest(content).map("%02x".format(_)).mkString,
                img.width.toLong, img.height.toLong)
            } else if (JpegCodec.isJpeg(content)) {
              // header-only geometry — SOF0 parse, no scan decode
              val (jw, jh, _) = JpegCodec.dimensions(content)
              val md = java.security.MessageDigest.getInstance("MD5")
              (content.length.toLong,
                md.digest(content).map("%02x".format(_)).mkString,
                jw.toLong, jh.toLong)
            } else decodeStub(content)
          Row(id, len, digest, w, h, meta.getString(0))
        }
      }
    }(enc)
  }
}
