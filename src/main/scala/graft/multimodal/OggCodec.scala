package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

/** Ogg container metadata extraction (round 19, VERDICT r18 #6 — the
  * other big crawled-audio family next to MP3): the PAGE STRUCTURE
  * (RFC 3533 — capture pattern, page CRC, lacing/packet assembly,
  * granule positions) and the three common stream mappings' header
  * packets decode for real —
  *
  *  - Vorbis (Xiph Vorbis I spec §4.2): `\x01vorbis` identification
  *    header (channels, sample rate) + `\x03vorbis` comment header;
  *    duration from the terminal granule position (PCM samples)
  *  - Opus (RFC 7845): `OpusHead` (channels, pre-skip, input rate) +
  *    `OpusTags`; granules run at 48 kHz minus pre-skip
  *  - FLAC-in-Ogg (the Xiph FLAC-to-Ogg mapping): `\x7fFLAC` header
  *    with the embedded STREAMINFO, VORBIS_COMMENT metadata block in
  *    the second packet; granule = samples
  *
  * while AUDIO decode stays out of scope and REJECTS BY NAME (the
  * Mp3Codec precedent). Every page's CRC-32 (poly 0x04c11db7, the
  * unreflected zero-init Ogg variant) is verified — the format's own
  * integrity oracle. Strict accounting: one logical stream (grouped /
  * chained files reject loud), contiguous page sequence numbers,
  * BOS/EOS discipline. */
object OggCodec {

  final case class OggMeta(codec: String, sampleRate: Int, channels: Int,
                           durationMs: Long, pageCount: Long,
                           title: Option[String], artist: Option[String],
                           album: Option[String])

  def isOgg(b: Array[Byte]): Boolean =
    b.length >= 4 && b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S'

  // RFC 3533 §6: CRC-32, generator 0x04c11db7, no reflection, init 0,
  // no final xor — NOT the zlib CRC
  private val CrcTable: Array[Int] = Array.tabulate(256) { i =>
    var r = i << 24
    var k = 0
    while (k < 8) {
      r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
      k += 1
    }
    r
  }

  private def crc(b: Array[Byte], off: Int, len: Int): Int = {
    var c = 0
    var i = off
    while (i < off + len) {
      c = (c << 8) ^ CrcTable(((c >>> 24) ^ (b(i) & 0xff)) & 0xff)
      i += 1
    }
    c
  }

  private final case class Page(headerType: Int, granule: Long, serial: Int,
                                seq: Int, payload: Array[Byte],
                                lacing: Array[Int])

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) |
      ((b(i + 3) & 0xff) << 24)
  private def le64(b: Array[Byte], i: Int): Long =
    (le32(b, i) & 0xffffffffL) | ((le32(b, i + 4) & 0xffffffffL) << 32)

  /** Walk all pages with CRC + sequencing checks. */
  private def pages(b: Array[Byte]): Seq[Page] = {
    val out = scala.collection.mutable.Buffer.empty[Page]
    var at = 0
    while (at < b.length) {
      require(at + 27 <= b.length, s"OggCodec: truncated page header at $at")
      require(b(at) == 'O' && b(at + 1) == 'g' && b(at + 2) == 'g' &&
        b(at + 3) == 'S', s"OggCodec: lost OggS capture pattern at $at")
      require(b(at + 4) == 0, s"OggCodec: stream structure version ${b(at + 4)}")
      val headerType = b(at + 5) & 0xff
      val granule = le64(b, at + 6)
      val serial = le32(b, at + 14)
      val seq = le32(b, at + 18)
      val declaredCrc = le32(b, at + 22)
      val nsegs = b(at + 26) & 0xff
      require(at + 27 + nsegs <= b.length, s"OggCodec: segment table at $at truncated")
      val lacing = Array.tabulate(nsegs)(k => b(at + 27 + k) & 0xff)
      val bodyLen = lacing.sum
      val pageLen = 27 + nsegs + bodyLen
      require(at + pageLen <= b.length, s"OggCodec: page at $at runs past EOF")
      // CRC over the whole page with the CRC field zeroed
      val copy = java.util.Arrays.copyOfRange(b, at, at + pageLen)
      copy(22) = 0; copy(23) = 0; copy(24) = 0; copy(25) = 0
      val actual = crc(copy, 0, pageLen)
      require(actual == declaredCrc,
        f"OggCodec: page $seq CRC mismatch (stored 0x$declaredCrc%08x, " +
          f"computed 0x$actual%08x)")
      out += Page(headerType, granule, serial,
        seq, java.util.Arrays.copyOfRange(b, at + 27 + nsegs, at + pageLen),
        lacing)
      at += pageLen
    }
    require(out.nonEmpty, "OggCodec: no pages")
    val first = out.head
    require((first.headerType & 0x02) != 0, "OggCodec: first page is not BOS")
    require(out.drop(1).forall(p => (p.headerType & 0x02) == 0),
      "OggCodec: secondary BOS page — grouped/chained Ogg unsupported")
    require(out.forall(_.serial == first.serial),
      "OggCodec: multiple stream serials — grouped Ogg unsupported")
    out.zipWithIndex.foreach { case (p, i) =>
      require(p.seq == i, s"OggCodec: page sequence hole (${p.seq} at index $i)") }
    require((out.last.headerType & 0x04) != 0, "OggCodec: last page is not EOS")
    out.toSeq
  }

  /** Assemble the first `want` packets from the page stream (lacing
    * value 255 = segment continues, < 255 ends the packet; packets span
    * pages via the continued flag). */
  private def firstPackets(ps: Seq[Page], want: Int): Seq[Array[Byte]] = {
    val packets = scala.collection.mutable.Buffer.empty[Array[Byte]]
    val cur = new ByteArrayOutputStream()
    var open = false
    ps.iterator.takeWhile(_ => packets.length < want).foreach { p =>
      require(((p.headerType & 0x01) != 0) == open && (open || cur.size == 0),
        s"OggCodec: page ${p.seq} continued flag contradicts packet state")
      var off = 0
      p.lacing.foreach { l =>
        if (packets.length < want) {
          cur.write(p.payload, off, l)
          if (l < 255) { packets += cur.toByteArray; cur.reset(); open = false }
          else open = true
        }
        off += l
      }
    }
    require(packets.length >= want,
      s"OggCodec: stream ends inside header packet ${packets.length + 1}")
    packets.toSeq
  }

  /** Vorbis-comment block: vendor string + KEY=value list (the tag
    * format all three mappings share). Returns (title, artist, album). */
  private def vorbisComments(b: Array[Byte], off0: Int, what: String):
      (Option[String], Option[String], Option[String]) = {
    var off = off0
    def u32(): Int = {
      require(off + 4 <= b.length, s"OggCodec: $what comment header truncated")
      val v = le32(b, off); off += 4; v
    }
    val vendorLen = u32()
    // Long math: a hostile 0x7fffffff length would wrap `off + len`
    require(vendorLen >= 0 && off.toLong + vendorLen <= b.length,
      s"OggCodec: $what vendor string runs past the packet")
    off += vendorLen
    val n = u32()
    require(n >= 0 && n <= 1024, s"OggCodec: $what declares $n comments")
    var title, artist, album: Option[String] = None
    var i = 0
    while (i < n) {
      val len = u32()
      require(len >= 0 && off.toLong + len <= b.length,
        s"OggCodec: $what comment $i runs past the packet")
      val c = new String(b, off, len, UTF_8)
      off += len
      val eq = c.indexOf('=')
      require(eq > 0, s"OggCodec: $what comment $i has no '='")
      val key = c.substring(0, eq).toUpperCase
      val value = c.substring(eq + 1)
      key match {
        case "TITLE" => title = Some(value)
        case "ARTIST" => artist = Some(value)
        case "ALBUM" => album = Some(value)
        case _ => ()
      }
      i += 1
    }
    (title, artist, album)
  }

  def decodeMeta(bytes: Array[Byte]): OggMeta = {
    require(isOgg(bytes), "OggCodec: not an Ogg stream (no OggS)")
    val ps = pages(bytes)
    val id = firstPackets(ps, 1).head
    def str(b: Array[Byte], off: Int, len: Int) = new String(b, off, len, ISO_8859_1)
    if (id.length >= 7 && (id(0) & 0xff) == 0x01 && str(id, 1, 6) == "vorbis") {
      // Vorbis I identification header: 30 bytes fixed
      require(id.length >= 30, "OggCodec: vorbis id header truncated")
      require(le32(id, 7) == 0, s"OggCodec: vorbis version ${le32(id, 7)}")
      val channels = id(11) & 0xff
      val rate = le32(id, 12)
      require(channels >= 1 && rate > 0,
        s"OggCodec: vorbis ${channels}ch @ $rate Hz")
      require((id(29) & 0x01) == 1, "OggCodec: vorbis id framing bit unset")
      val cmt = firstPackets(ps, 2)(1)
      require(cmt.length >= 7 && (cmt(0) & 0xff) == 0x03 &&
        str(cmt, 1, 6) == "vorbis", "OggCodec: second packet is not the " +
          "vorbis comment header")
      val (t, a, al) = vorbisComments(cmt, 7, "vorbis")
      val granule = ps.last.granule
      require(granule >= 0, s"OggCodec: terminal granule $granule")
      OggMeta("vorbis", rate, channels, granule * 1000L / rate, ps.length,
        t, a, al)
    } else if (id.length >= 8 && str(id, 0, 8) == "OpusHead") {
      // RFC 7845 §5.1
      require(id.length >= 19, "OggCodec: OpusHead truncated")
      require((id(8) & 0xff) == 1, s"OggCodec: OpusHead version ${id(8) & 0xff}")
      val channels = id(9) & 0xff
      val preSkip = le16(id, 10)
      val inputRate = le32(id, 12)
      require((id(18) & 0xff) == 0,
        s"OggCodec: Opus channel mapping family ${id(18) & 0xff} unsupported (0)")
      require(channels >= 1 && channels <= 2,
        s"OggCodec: Opus mapping family 0 with $channels channels")
      val cmt = firstPackets(ps, 2)(1)
      require(cmt.length >= 8 && str(cmt, 0, 8) == "OpusTags",
        "OggCodec: second packet is not OpusTags")
      val (t, a, al) = vorbisComments(cmt, 8, "opus")
      val granule = ps.last.granule
      require(granule >= preSkip, s"OggCodec: terminal granule $granule < pre-skip $preSkip")
      // Opus granules always run at 48 kHz regardless of input rate
      OggMeta("opus", inputRate, channels, (granule - preSkip) * 1000L / 48000L,
        ps.length, t, a, al)
    } else if (id.length >= 5 && (id(0) & 0xff) == 0x7f && str(id, 1, 4) == "FLAC") {
      // Xiph FLAC-to-Ogg mapping: \x7fFLAC major minor nhdr(2 BE) fLaC STREAMINFO
      // 9 mapping bytes + "fLaC" + 4-byte block header + 34-byte STREAMINFO
      require(id.length >= 51, "OggCodec: FLAC-in-Ogg header truncated")
      require((id(5) & 0xff) == 1, s"OggCodec: FLAC-in-Ogg major version ${id(5) & 0xff}")
      require(str(id, 9, 4) == "fLaC", "OggCodec: FLAC-in-Ogg missing fLaC magic")
      // STREAMINFO: block header at 13 (type 0), body at 17
      require((id(13) & 0x7f) == 0, "OggCodec: first FLAC block is not STREAMINFO")
      val si = 17
      val rate = ((id(si + 10) & 0xff) << 12) | ((id(si + 11) & 0xff) << 4) |
        ((id(si + 12) & 0xff) >> 4)
      val channels = ((id(si + 12) >> 1) & 0x07) + 1
      require(rate > 0, "OggCodec: STREAMINFO sample rate 0")
      val cmt = firstPackets(ps, 2)(1)
      // the second packet is a bare FLAC metadata block; type 4 = VORBIS_COMMENT
      require(cmt.length >= 4 && (cmt(0) & 0x7f) == 4,
        "OggCodec: second FLAC-in-Ogg packet is not a VORBIS_COMMENT block")
      val (t, a, al) = vorbisComments(cmt, 4, "flac")
      val granule = ps.last.granule
      OggMeta("flac", rate, channels, granule * 1000L / rate, ps.length, t, a, al)
    } else throw new IllegalArgumentException(
      "OggCodec: unknown stream mapping (vorbis / opus / FLAC-in-Ogg)")
  }

  /** Full audio DECODE is out of scope — fail by name, never garbage. */
  def decode(bytes: Array[Byte]): Nothing =
    throw new IllegalArgumentException(
      "OggCodec: Vorbis/Opus audio decode (MDCT/CELT synthesis) unsupported — " +
        "decodeMeta extracts the container and tag surface")

  // ── fixture writer ───────────────────────────────────────────────────

  private def writePage(out: ByteArrayOutputStream, headerType: Int,
                        granule: Long, serial: Int, seq: Int,
                        packets: Seq[Array[Byte]],
                        continuedTail: Boolean = false): Unit = {
    val lacing = scala.collection.mutable.Buffer.empty[Int]
    packets.zipWithIndex.foreach { case (p, i) =>
      var rest = p.length
      while (rest >= 255) { lacing += 255; rest -= 255 }
      // a packet CONTINUING on the next page omits its terminator
      if (!(continuedTail && i == packets.length - 1)) lacing += rest
      else require(rest == 0,
        "OggCodec.writePage: continued tail must be a 255-multiple prefix")
    }
    require(lacing.length <= 255, "OggCodec.writePage: > 255 segments")
    val page = new ByteArrayOutputStream()
    def w8(v: Int): Unit = page.write(v & 0xff)
    def w32(v: Int): Unit = { w8(v); w8(v >> 8); w8(v >> 16); w8(v >> 24) }
    page.write("OggS".getBytes(ISO_8859_1))
    w8(0); w8(headerType)
    (0 until 8).foreach(k => w8((granule >> (8 * k)).toInt))
    w32(serial); w32(seq); w32(0) // CRC placeholder
    w8(lacing.length)
    lacing.foreach(w8)
    packets.foreach(p => page.write(p, 0, p.length))
    val bytes = page.toByteArray
    val c = crc(bytes, 0, bytes.length)
    bytes(22) = (c & 0xff).toByte; bytes(23) = ((c >> 8) & 0xff).toByte
    bytes(24) = ((c >> 16) & 0xff).toByte; bytes(25) = ((c >> 24) & 0xff).toByte
    out.write(bytes, 0, bytes.length)
  }

  private def comments(vendor: String, title: String, artist: String,
                       album: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    def s(str: String): Unit = {
      val b = str.getBytes(UTF_8); w32(b.length); out.write(b, 0, b.length)
    }
    s(vendor)
    w32(3)
    s(s"TITLE=$title"); s(s"ARTIST=$artist"); s(s"ALBUM=$album")
    out.toByteArray
  }

  /** Fixture writer: a structurally-real Ogg stream — CRC'd pages,
    * proper lacing, BOS/EOS discipline — for `codec` ∈ vorbis / opus /
    * flac. Audio page payloads are deterministic filler (decode is out
    * of scope); granules and headers are exact. `samples` is the
    * terminal PCM-sample granule (for opus the writer adds the
    * pre-skip so the DURATION comes out at samples/48000). */
  def encode(codec: String, sampleRate: Int, channels: Int, samples: Long,
             audioPages: Int, title: String, artist: String, album: String,
             serial: Int = 0x6772616f, payloadSeed: Long = 0): Array[Byte] = {
    require(audioPages >= 1, "OggCodec.encode: no audio pages")
    require(samples >= 0 && sampleRate > 0 && channels >= 1)
    val out = new ByteArrayOutputStream()
    val preSkip = 312
    val idPacket: Array[Byte] = codec match {
      case "vorbis" =>
        val b = new ByteArrayOutputStream()
        b.write(0x01); b.write("vorbis".getBytes(ISO_8859_1))
        def w32(v: Int): Unit = { b.write(v & 0xff); b.write((v >> 8) & 0xff)
          b.write((v >> 16) & 0xff); b.write((v >> 24) & 0xff) }
        w32(0); b.write(channels); w32(sampleRate)
        w32(0); w32(128000); w32(0) // bitrates
        b.write(0x88) // blocksizes 2^8 / 2^8
        b.write(0x01) // framing bit
        b.toByteArray
      case "opus" =>
        require(channels <= 2, "OggCodec.encode: opus mapping family 0")
        val b = new ByteArrayOutputStream()
        b.write("OpusHead".getBytes(ISO_8859_1))
        b.write(1); b.write(channels)
        b.write(preSkip & 0xff); b.write((preSkip >> 8) & 0xff)
        def w32(v: Int): Unit = { b.write(v & 0xff); b.write((v >> 8) & 0xff)
          b.write((v >> 16) & 0xff); b.write((v >> 24) & 0xff) }
        w32(sampleRate)
        b.write(0); b.write(0) // output gain
        b.write(0) // mapping family
        b.toByteArray
      case "flac" =>
        val b = new ByteArrayOutputStream()
        b.write(0x7f); b.write("FLAC".getBytes(ISO_8859_1))
        b.write(1); b.write(0) // mapping 1.0
        b.write(0); b.write(1) // one more header packet (the comments)
        b.write("fLaC".getBytes(ISO_8859_1))
        b.write(0x00) // STREAMINFO, not last
        b.write(0); b.write(0); b.write(34)
        val si = new Array[Byte](34)
        si(0) = 0x10; si(1) = 0; si(2) = 0x10; si(3) = 0 // block sizes 4096
        // frame sizes 0 (unknown): bytes 4-9 zero
        si(10) = ((sampleRate >> 12) & 0xff).toByte
        si(11) = ((sampleRate >> 4) & 0xff).toByte
        si(12) = (((sampleRate & 0x0f) << 4) | ((channels - 1) << 1) |
          (15 >> 4)).toByte // bps-1 = 15 (16-bit): high bit here
        si(13) = (((15 & 0x0f) << 4) | ((samples >> 32) & 0x0f).toInt).toByte
        si(14) = ((samples >> 24) & 0xff).toByte
        si(15) = ((samples >> 16) & 0xff).toByte
        si(16) = ((samples >> 8) & 0xff).toByte
        si(17) = (samples & 0xff).toByte
        // MD5 left zero (unknown) — bytes 18-33
        b.write(si, 0, 34)
        b.toByteArray
      case other => throw new IllegalArgumentException(
        s"OggCodec.encode: codec $other (vorbis / opus / flac)")
    }
    writePage(out, 0x02, 0, serial, 0, Seq(idPacket))
    val tags: Array[Byte] = codec match {
      case "vorbis" =>
        val b = new ByteArrayOutputStream()
        b.write(0x03); b.write("vorbis".getBytes(ISO_8859_1))
        val c = comments("graft", title, artist, album)
        b.write(c, 0, c.length)
        b.write(0x01) // framing bit
        b.toByteArray
      case "opus" =>
        val b = new ByteArrayOutputStream()
        b.write("OpusTags".getBytes(ISO_8859_1))
        val c = comments("graft", title, artist, album)
        b.write(c, 0, c.length)
        b.toByteArray
      case _ =>
        val c = comments("graft", title, artist, album)
        val b = new ByteArrayOutputStream()
        b.write(0x84) // VORBIS_COMMENT, last metadata block
        b.write((c.length >> 16) & 0xff); b.write((c.length >> 8) & 0xff)
        b.write(c.length & 0xff)
        b.write(c, 0, c.length)
        b.toByteArray
    }
    // for vorbis a real stream also carries a SETUP header packet;
    // decode is out of scope, so a small placeholder keeps the packet
    // count honest without codebook synthesis
    val headerPackets =
      if (codec == "vorbis")
        Seq(tags, Array[Byte](0x05) ++ "vorbis".getBytes(ISO_8859_1) ++
          Array.fill[Byte](9)(0x55))
      else Seq(tags)
    writePage(out, 0x00, 0, serial, 1, headerPackets)
    // audio pages: deterministic filler packets, granules advancing to
    // the terminal position
    val granuleEnd = if (codec == "opus") samples + preSkip else samples
    var pg = 0
    while (pg < audioPages) {
      val body = Array.tabulate[Byte](24 + (payloadSeed % 7).toInt)(i =>
        ((payloadSeed * 31 + pg * 17 + i * 7) % 256).toByte)
      val granule = granuleEnd * (pg + 1) / audioPages
      writePage(out, if (pg == audioPages - 1) 0x04 else 0x00, granule,
        serial, 2 + pg, Seq(body))
      pg += 1
    }
    out.toByteArray
  }
}
