package graft.multimodal

import java.io.ByteArrayOutputStream

/** MP3 container/metadata extraction (the public ID3v2.3/2.4, ID3v1 and
  * MPEG-1 audio frame-header layouts) — round 18, VERDICT r17 #8's
  * metadata-first leg: MP3 is the dominant crawled-audio format; the
  * TAG SURFACE and FRAME GEOMETRY (bitrate/sample-rate/channel mode,
  * frame walk, duration) decode for real, while full Layer III audio
  * decode (hybrid filterbank) stays out of scope and REJECTS BY NAME —
  * never silent garbage.
  *
  * Scope:
  *  - ID3v2.2, v2.3 and v2.4 leading tags: syncsafe tag size, optional
  *    extended header skipped by its declared size, v2.4 trailing
  *    footer (flag 0x10, 10-byte '3DI' block) skipped, text frames
  *    (TIT2/TPE1/TALB; v2.2's three-char TT2/TP1/TAL with 3-byte
  *    sizes) in ISO-8859-1 (enc 0), UTF-16 with BOM (enc 1),
  *    UTF-16BE (enc 2) and UTF-8 (enc 3; v2.3+ only);
  *    unsynchronisation and compressed/encrypted frames reject loud
  *  - ID3v1 trailing "TAG" block (128 bytes): title/artist surfaced
  *    when no v2 tag carries them; the frame walk stops before it
  *  - MPEG-1 Layer III frames: 11-bit sync, version/layer/bitrate/
  *    sample-rate/padding/channel-mode fields, the V1L3 bitrate table,
  *    144·bitrate/rate + padding frame length, optional CRC-16 slot;
  *    VBR (per-frame bitrate changes) supported; free-format bitrate,
  *    reserved codes, MPEG-2/2.5 and Layers I/II reject by name
  *  - STRICT accounting: every byte belongs to a tag or a frame; a
  *    truncated final frame or trailing garbage rejects
  */
object Mp3Codec {

  /** MPEG-1 Layer III bitrate table (kbit/s), index 1-14. */
  private val BitrateV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val SampleRates = Array(44100, 48000, 32000) // MPEG-1 indices 0-2

  final case class Mp3Meta(sampleRate: Int, channels: Int, frameCount: Long,
                           audioBytes: Long, durationMs: Long,
                           title: Option[String], artist: Option[String],
                           album: Option[String])

  /** True iff `b` starts with an ID3v2 tag or an MPEG frame sync. */
  def isMp3(b: Array[Byte]): Boolean =
    (b.length >= 3 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') ||
      (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xe0) == 0xe0)

  def decodeMeta(bytes: Array[Byte]): Mp3Meta = {
    require(isMp3(bytes), "Mp3Codec: not an MP3 (no ID3v2 tag or frame sync)")
    var at = 0
    var title: Option[String] = None
    var artist: Option[String] = None
    var album: Option[String] = None

    // ---- leading ID3v2 tag ----
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      val major = bytes(3) & 0xff
      require(major == 2 || major == 3 || major == 4,
        s"Mp3Codec: ID3v2.$major unsupported (v2.2 / v2.3 / v2.4)")
      val flags = bytes(5) & 0xff
      require((flags & 0x80) == 0,
        "Mp3Codec: ID3v2 unsynchronisation unsupported")
      val tagSize = syncsafe(bytes, 6)
      val tagEnd = 10 + tagSize
      require(tagEnd <= bytes.length, "Mp3Codec: ID3v2 tag runs past EOF")
      var p = 10
      if (major == 2) {
        // v2.2: flag 0x40 means whole-tag COMPRESSION (undefined scheme)
        require((flags & 0x40) == 0,
          "Mp3Codec: ID3v2.2 compression flag unsupported")
        // three-char frame ids with 3-byte big-endian sizes, no frame flags
        while (p + 6 <= tagEnd && bytes(p) != 0) {
          val id = new String(bytes, p, 3, java.nio.charset.StandardCharsets.US_ASCII)
          val size = ((bytes(p + 3) & 0xff) << 16) | ((bytes(p + 4) & 0xff) << 8) |
            (bytes(p + 5) & 0xff)
          require(p + 6 + size <= tagEnd, s"Mp3Codec: frame $id past tag end")
          if (id.startsWith("T") && size >= 1) {
            val enc = bytes(p + 6) & 0xff
            require(enc <= 1,
              s"Mp3Codec: text encoding $enc in $id unsupported for v2.2 " +
                "(0 latin-1, 1 utf-16+BOM)")
            val body = java.util.Arrays.copyOfRange(bytes, p + 7, p + 6 + size)
            val clean = decodeText(id, enc, body).takeWhile(_ != '\u0000')
            id match {
              case "TT2" => title = Some(clean)
              case "TP1" => artist = Some(clean)
              case "TAL" => album = Some(clean)
              case _ => ()
            }
          }
          p += 6 + size
        }
        require((flags & 0x10) == 0,
          "Mp3Codec: ID3v2.2 flag 0x10 undefined")
        at = tagEnd
      } else {
      if ((flags & 0x40) != 0) { // extended header: skip by declared size
        val ext =
          if (major == 4) syncsafe(bytes, p)
          else be32(bytes, p) + 4 // v2.3 size EXCLUDES its own 4 size bytes
        // be32 is SIGNED: a hostile negative size would walk backwards
        require(ext >= 4 && p + ext <= tagEnd,
          "Mp3Codec: extended header size out of the tag")
        p += ext
      }
      while (p + 10 <= tagEnd && bytes(p) != 0) {
        val id = new String(bytes, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val size = if (major == 4) syncsafe(bytes, p + 4) else be32(bytes, p + 4)
        // be32 is SIGNED: without this, a 0xFFFFFFF6 v2.3 frame size makes
        // p += 10 + size stand still (or walk backwards) — an infinite
        // loop instead of the codec family's loud reject
        require(size >= 0, s"Mp3Codec: frame $id declares negative size $size")
        val fflags = ((bytes(p + 8) & 0xff) << 8) | (bytes(p + 9) & 0xff)
        require(p + 10 + size <= tagEnd, s"Mp3Codec: frame $id past tag end")
        require((fflags & 0x00ff) == 0,
          s"Mp3Codec: frame $id carries format flags (compression/encryption " +
            "/unsync) — unsupported")
        if (id.startsWith("T") && size >= 1) {
          val enc = bytes(p + 10) & 0xff
          val body = java.util.Arrays.copyOfRange(bytes, p + 11, p + 10 + size)
          val clean = decodeText(id, enc, body).takeWhile(_ != '\u0000')
          id match {
            case "TIT2" => title = Some(clean)
            case "TPE1" => artist = Some(clean)
            case "TALB" => album = Some(clean)
            case _ => ()
          }
        }
        p += 10 + size
      }
      at = tagEnd
      // v2.4 footer flag (0x10): a 10-byte '3DI' footer follows the tag
      // body (its size is NOT in the syncsafe tag size) — skip it, or
      // the frame walk hits it and misreports 'lost frame sync'
      if (major == 4 && (flags & 0x10) != 0) {
        require(at + 10 <= bytes.length &&
          bytes(at) == '3' && bytes(at + 1) == 'D' && bytes(at + 2) == 'I',
          "Mp3Codec: ID3v2.4 footer flag set but no 3DI footer at tag end")
        at += 10
      } else require((flags & 0x10) == 0,
        s"Mp3Codec: ID3v2.$major footer flag unsupported")
      }
    }

    // ---- trailing ID3v1 block, if any: frames end before it ----
    var end = bytes.length
    if (bytes.length >= at + 128 &&
        bytes(bytes.length - 128) == 'T' && bytes(bytes.length - 127) == 'A' &&
        bytes(bytes.length - 126) == 'G') {
      end = bytes.length - 128
      def v1field(off: Int, len: Int): Option[String] = {
        val s = new String(bytes, bytes.length - 128 + off, len,
          java.nio.charset.StandardCharsets.ISO_8859_1)
          .takeWhile(_ != '\u0000').trim
        if (s.isEmpty) None else Some(s)
      }
      if (title.isEmpty) title = v1field(3, 30)
      if (artist.isEmpty) artist = v1field(33, 30)
      if (album.isEmpty) album = v1field(63, 30)
    }

    // ---- MPEG-1 Layer III frame walk ----
    var sampleRate = 0
    var channels = 0
    var frames = 0L
    val audioStart = at
    while (at < end) {
      require(at + 4 <= end, "Mp3Codec: truncated frame header")
      val h = be32(bytes, at)
      require((h >>> 21) == 0x7ff, f"Mp3Codec: lost frame sync at $at (0x$h%08x)")
      val version = (h >>> 19) & 3
      require(version == 3, version match {
        case 2 => "Mp3Codec: MPEG-2 unsupported (MPEG-1 Layer III only)"
        case 0 => "Mp3Codec: MPEG-2.5 unsupported (MPEG-1 Layer III only)"
        case _ => "Mp3Codec: reserved MPEG version"
      })
      val layer = (h >>> 17) & 3
      require(layer == 1, layer match {
        case 3 => "Mp3Codec: Layer I unsupported (Layer III only)"
        case 2 => "Mp3Codec: Layer II unsupported (Layer III only)"
        case _ => "Mp3Codec: reserved layer code"
      })
      val brIdx = ((h >>> 12) & 0xf).toInt
      require(brIdx >= 1 && brIdx <= 14,
        if (brIdx == 0) "Mp3Codec: free-format bitrate unsupported"
        else "Mp3Codec: bad bitrate index 15")
      val srIdx = ((h >>> 10) & 3).toInt
      require(srIdx <= 2, "Mp3Codec: reserved sample-rate index")
      val sr = SampleRates(srIdx)
      val padding = ((h >>> 9) & 1).toInt
      val mode = ((h >>> 6) & 3).toInt
      val ch = if (mode == 3) 1 else 2
      require((h & 3) != 2, "Mp3Codec: reserved emphasis code")
      if (frames == 0L) { sampleRate = sr; channels = ch }
      else require(sr == sampleRate && ch == channels,
        s"Mp3Codec: frame ${frames} changes sample rate/channels mid-stream")
      val frameLen = 144000 * BitrateV1L3(brIdx) / sr + padding
      require(frameLen > 4, "Mp3Codec: degenerate frame length")
      require(at + frameLen <= end,
        s"Mp3Codec: frame at $at ($frameLen bytes) runs past the audio region")
      at += frameLen
      frames += 1
    }
    require(frames > 0, "Mp3Codec: no MPEG frames")
    Mp3Meta(sampleRate, channels, frames, (end - audioStart).toLong,
      frames * 1152L * 1000L / sampleRate, title, artist, album)
  }

  /** Full audio DECODE is out of scope — fail by name, never garbage. */
  def decode(bytes: Array[Byte]): Nothing =
    throw new IllegalArgumentException(
      "Mp3Codec: Layer III audio decode (hybrid filterbank) unsupported — " +
        "decodeMeta extracts the tag and frame-geometry surface")

  /** ID3v2 text-frame payload decode, shared by the v2.2 (enc 0/1) and
    * v2.3/2.4 (enc 0-3) walks; the BOM requirement on enc 1 keeps a
    * BOM-less file a loud reject rather than mojibake. */
  private def decodeText(id: String, enc: Int, body: Array[Byte]): String =
    enc match {
      case 0 => new String(body, java.nio.charset.StandardCharsets.ISO_8859_1)
      case 1 => // UTF-16 with BOM (the common wild form)
        require(body.length >= 2 && body.length % 2 == 0 &&
          ((body(0) == 0xff.toByte && body(1) == 0xfe.toByte) ||
           (body(0) == 0xfe.toByte && body(1) == 0xff.toByte)),
          s"Mp3Codec: $id UTF-16 text without a BOM / odd byte count")
        new String(body, java.nio.charset.StandardCharsets.UTF_16)
      case 2 => new String(body, java.nio.charset.StandardCharsets.UTF_16BE)
      case 3 => new String(body, java.nio.charset.StandardCharsets.UTF_8)
      case e => throw new IllegalArgumentException(
        s"Mp3Codec: text encoding $e in $id unsupported " +
          "(0 latin-1, 1 utf-16+BOM, 2 utf-16be, 3 utf-8)")
    }

  private def syncsafe(b: Array[Byte], i: Int): Int = {
    require(i + 4 <= b.length, "Mp3Codec: truncated syncsafe int")
    (0 until 4).foreach(k => require((b(i + k) & 0x80) == 0,
      "Mp3Codec: syncsafe byte with bit 7 set"))
    ((b(i) & 0x7f) << 21) | ((b(i + 1) & 0x7f) << 14) |
      ((b(i + 2) & 0x7f) << 7) | (b(i + 3) & 0x7f)
  }

  private def be32(b: Array[Byte], i: Int): Int = {
    require(i + 4 <= b.length, "Mp3Codec: truncated field")
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  }

  /** Fixture writer: a structurally-real MP3 — ID3v2.2/2.3/2.4 tag with
    * TIT2/TPE1/TALB (TT2/TP1/TAL for v2.2), MPEG-1 Layer III frame
    * headers with per-frame bitrate indices (VBR), deterministic payload
    * bytes, optional v2.4 footer and trailing ID3v1 block. The PAYLOAD
    * is not Layer III audio (decode is out of scope); the container
    * geometry is exact. */
  def encode(title: String, artist: String, album: String,
             sampleRateIdx: Int, mono: Boolean,
             bitrateIdxOf: Int => Int, nFrames: Int,
             v24: Boolean = false, v22: Boolean = false,
             footer: Boolean = false, utf8: Boolean = false,
             utf16: Boolean = false,
             id3v1: Boolean = false, payloadSeed: Long = 0): Array[Byte] = {
    require(!(utf8 && utf16), "Mp3Codec.encode: utf8 and utf16 are exclusive")
    require(!(v22 && v24), "Mp3Codec.encode: v22 and v24 are exclusive")
    require(!(v22 && utf8), "Mp3Codec.encode: ID3v2.2 has no UTF-8 encoding")
    require(!footer || v24, "Mp3Codec.encode: footer is a v2.4 feature")
    require(sampleRateIdx >= 0 && sampleRateIdx <= 2,
      s"Mp3Codec.encode: sample-rate index $sampleRateIdx")
    require(nFrames >= 1, "Mp3Codec.encode: no frames")
    val out = new ByteArrayOutputStream()
    // ID3v2 tag
    val frames =
      if (v22) Seq("TT2" -> title, "TP1" -> artist, "TAL" -> album)
      else Seq("TIT2" -> title, "TPE1" -> artist, "TALB" -> album)
    val body = new ByteArrayOutputStream()
    frames.foreach { case (id, text) =>
      val enc = if (utf8) 3 else if (utf16) 1 else 0
      val data =
        if (utf16) Array[Byte](0xff.toByte, 0xfe.toByte) ++
          text.getBytes("UTF-16LE")
        else text.getBytes(if (utf8) "UTF-8" else "ISO-8859-1")
      id.foreach(c => body.write(c))
      val size = 1 + data.length
      if (v22) { // 3-byte big-endian size, no frame flags
        body.write((size >> 16) & 0xff); body.write((size >> 8) & 0xff)
        body.write(size & 0xff)
      } else if (v24) {
        body.write((size >> 21) & 0x7f); body.write((size >> 14) & 0x7f)
        body.write((size >> 7) & 0x7f); body.write(size & 0x7f)
      } else {
        body.write(size >> 24); body.write((size >> 16) & 0xff)
        body.write((size >> 8) & 0xff); body.write(size & 0xff)
      }
      if (!v22) { body.write(0); body.write(0) } // frame flags
      body.write(enc)
      body.write(data, 0, data.length)
    }
    val tag = body.toByteArray
    val hdrFlags = if (footer) 0x10 else 0
    out.write('I'); out.write('D'); out.write('3')
    out.write(if (v22) 2 else if (v24) 4 else 3); out.write(0)
    out.write(hdrFlags)
    out.write((tag.length >> 21) & 0x7f); out.write((tag.length >> 14) & 0x7f)
    out.write((tag.length >> 7) & 0x7f); out.write(tag.length & 0x7f)
    out.write(tag, 0, tag.length)
    if (footer) { // 10-byte v2.4 footer: '3DI', version, flags, size
      out.write('3'); out.write('D'); out.write('I')
      out.write(4); out.write(0); out.write(hdrFlags)
      out.write((tag.length >> 21) & 0x7f); out.write((tag.length >> 14) & 0x7f)
      out.write((tag.length >> 7) & 0x7f); out.write(tag.length & 0x7f)
    }
    // MPEG-1 Layer III frames
    val sr = SampleRates(sampleRateIdx)
    var f = 0
    while (f < nFrames) {
      val brIdx = bitrateIdxOf(f)
      require(brIdx >= 1 && brIdx <= 14, s"Mp3Codec.encode: bitrate index $brIdx")
      val padding = if (sampleRateIdx == 0 && f % 2 == 1) 1 else 0
      val mode = if (mono) 3 else 0
      val h = (0x7ff << 21) | (3 << 19) | (1 << 17) | (1 << 16) |
        (brIdx << 12) | (sampleRateIdx << 10) | (padding << 9) | (mode << 6)
      out.write((h >>> 24) & 0xff); out.write((h >>> 16) & 0xff)
      out.write((h >>> 8) & 0xff); out.write(h & 0xff)
      val frameLen = 144000 * BitrateV1L3(brIdx) / sr + padding
      var k = 4
      while (k < frameLen) {
        out.write(((payloadSeed * 31 + f * 17 + k * 7) % 256).toInt)
        k += 1
      }
      f += 1
    }
    if (id3v1) {
      val block = new Array[Byte](128)
      block(0) = 'T'; block(1) = 'A'; block(2) = 'G'
      def put(off: Int, s: String, len: Int): Unit = {
        val b = s.getBytes("ISO-8859-1")
        System.arraycopy(b, 0, block, off, math.min(b.length, len))
      }
      put(3, title, 30); put(33, artist, 30); put(63, album, 30)
      out.write(block, 0, 128)
    }
    out.toByteArray
  }
}
