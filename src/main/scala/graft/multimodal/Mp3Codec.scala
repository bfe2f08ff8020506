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
  *  - ID3v2.3 and v2.4 leading tags: syncsafe tag size, optional
  *    extended header skipped by its declared size, text frames
  *    (TIT2/TPE1/TALB) in ISO-8859-1 (enc 0), UTF-16 with BOM (enc 1),
  *    UTF-16BE (enc 2) and UTF-8 (enc 3);
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
      require(major == 3 || major == 4,
        s"Mp3Codec: ID3v2.$major unsupported (v2.3 / v2.4)")
      val flags = bytes(5) & 0xff
      require((flags & 0x80) == 0,
        "Mp3Codec: ID3v2 unsynchronisation unsupported")
      val tagSize = syncsafe(bytes, 6)
      val tagEnd = 10 + tagSize
      require(tagEnd <= bytes.length, "Mp3Codec: ID3v2 tag runs past EOF")
      var p = 10
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
          val text = enc match {
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
          val clean = text.takeWhile(_ != '\u0000')
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

  /** Fixture writer: a structurally-real MP3 — ID3v2.3/2.4 tag with
    * TIT2/TPE1/TALB, MPEG-1 Layer III frame headers with per-frame
    * bitrate indices (VBR), deterministic payload bytes, optional
    * trailing ID3v1 block. The PAYLOAD is not Layer III audio (decode
    * is out of scope); the container geometry is exact. */
  def encode(title: String, artist: String, album: String,
             sampleRateIdx: Int, mono: Boolean,
             bitrateIdxOf: Int => Int, nFrames: Int,
             v24: Boolean = false, utf8: Boolean = false,
             utf16: Boolean = false,
             id3v1: Boolean = false, payloadSeed: Long = 0): Array[Byte] = {
    require(!(utf8 && utf16), "Mp3Codec.encode: utf8 and utf16 are exclusive")
    require(sampleRateIdx >= 0 && sampleRateIdx <= 2,
      s"Mp3Codec.encode: sample-rate index $sampleRateIdx")
    require(nFrames >= 1, "Mp3Codec.encode: no frames")
    val out = new ByteArrayOutputStream()
    // ID3v2 tag
    val frames = Seq("TIT2" -> title, "TPE1" -> artist, "TALB" -> album)
    val body = new ByteArrayOutputStream()
    frames.foreach { case (id, text) =>
      val enc = if (utf8) 3 else if (utf16) 1 else 0
      val data =
        if (utf16) Array[Byte](0xff.toByte, 0xfe.toByte) ++
          text.getBytes("UTF-16LE")
        else text.getBytes(if (utf8) "UTF-8" else "ISO-8859-1")
      id.foreach(c => body.write(c))
      val size = 1 + data.length
      if (v24) {
        body.write((size >> 21) & 0x7f); body.write((size >> 14) & 0x7f)
        body.write((size >> 7) & 0x7f); body.write(size & 0x7f)
      } else {
        body.write(size >> 24); body.write((size >> 16) & 0xff)
        body.write((size >> 8) & 0xff); body.write(size & 0xff)
      }
      body.write(0); body.write(0) // frame flags
      body.write(enc)
      body.write(data, 0, data.length)
    }
    val tag = body.toByteArray
    out.write('I'); out.write('D'); out.write('3')
    out.write(if (v24) 4 else 3); out.write(0); out.write(0)
    out.write((tag.length >> 21) & 0x7f); out.write((tag.length >> 14) & 0x7f)
    out.write((tag.length >> 7) & 0x7f); out.write(tag.length & 0x7f)
    out.write(tag, 0, tag.length)
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
