package graft.multimodal

import java.io.ByteArrayOutputStream

/** EXIF metadata extraction from JPEG APP1 segments (the public EXIF
  * 2.x / TIFF 6.0 specifications — round 18, VERDICT r17 #5). The APP1
  * payload after the `Exif\0\0` identifier IS a TIFF structure (II/MM
  * header, IFD0, optional Exif sub-IFD), walked with the same
  * discipline as [[TiffCodec]]'s page walker: entries sorted/unique by
  * tag, SHORT/LONG scalars value-left-justified, out-of-line values at
  * offsets RELATIVE TO THE TIFF HEADER, every offset bounds-checked —
  * truncated IFDs, bad byte-order marks and malformed ASCII values all
  * reject loud.
  *
  * Orientation (tag 274) is the load-bearing field: values 5-8 swap the
  * effective width/height, so any geometry feature downstream (tiles,
  * resize, KNN over grid features) reads the wrong shape if it is
  * ignored. [[orientedDims]] is the normalization the pipeline applies.
  *
  * Reference analogue: PDFBox/JDK readers surface orientation-corrected
  * dimensions transparently (Function.java:90-132's decode path);
  * graft's image columns get the same treatment. */
object ExifParser {

  /** Parsed EXIF fields (the core-tag surface). `pixelX`/`pixelY` come
    * from the Exif sub-IFD when present. */
  final case class Exif(littleEndian: Boolean, orientation: Int,
                        make: Option[String], model: Option[String],
                        dateTime: Option[String],
                        pixelX: Option[Long], pixelY: Option[Long])

  /** Effective (width, height) after applying EXIF orientation:
    * orientations 5-8 are the transposed family (90°/270° rotations),
    * so width and height swap. */
  def orientedDims(w: Long, h: Long, orientation: Int): (Long, Long) = {
    require(orientation >= 1 && orientation <= 8,
      s"ExifParser: orientation $orientation outside 1-8")
    if (orientation >= 5) (h, w) else (w, h)
  }

  /** Walk a JPEG's marker segments for APP1/`Exif\0\0` and parse the
    * embedded TIFF structure. Returns None when the file carries no
    * EXIF APP1 (a plain JPEG is not an error); malformed EXIF in a
    * present APP1 rejects loud. */
  def fromJpeg(bytes: Array[Byte]): Option[Exif] = {
    require(bytes.length >= 2 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8, "ExifParser: not a JPEG (no SOI)")
    var i = 2
    while (i + 2 <= bytes.length) {
      require((bytes(i) & 0xff) == 0xff, f"ExifParser: lost marker sync at $i")
      // spec-legal 0xFF fill bytes may pad between segments: the marker
      // id is the first non-0xFF byte after the sync run
      while (i + 1 < bytes.length && (bytes(i + 1) & 0xff) == 0xff) i += 1
      require(i + 2 <= bytes.length, "ExifParser: trailing fill bytes at EOF")
      val marker = bytes(i + 1) & 0xff
      if (marker == 0xd9 || marker == 0xda) return None // EOI / SOS: no APP1
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
        // TEM / RSTn are standalone (length-less) 2-byte markers
        i += 2
      } else {
        require(i + 4 <= bytes.length, s"ExifParser: segment $marker truncated")
        val len = ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
        require(len >= 2 && i + 2 + len <= bytes.length,
          s"ExifParser: segment $marker runs past EOF")
        if (marker == 0xe1 && len >= 8 &&
            bytes(i + 4) == 'E' && bytes(i + 5) == 'x' && bytes(i + 6) == 'i' &&
            bytes(i + 7) == 'f' && bytes(i + 8) == 0 && bytes(i + 9) == 0) {
          val tiff = java.util.Arrays.copyOfRange(bytes, i + 10, i + 2 + len)
          return Some(parseTiff(tiff))
        }
        i += 2 + len
      }
    }
    None
  }

  /** Parse the APP1 payload's TIFF structure (offsets relative to its
    * own header, per the EXIF spec). */
  def parseTiff(b: Array[Byte]): Exif = {
    require(b.length >= 8, "ExifParser: truncated TIFF header")
    val le =
      if (b(0) == 'I' && b(1) == 'I') true
      else if (b(0) == 'M' && b(1) == 'M') false
      else throw new IllegalArgumentException(
        "ExifParser: bad byte-order mark (want II or MM)")
    def u8(i: Int): Int = {
      require(i >= 0 && i < b.length, "ExifParser: truncated IFD")
      b(i) & 0xff
    }
    def u16(i: Int): Int = if (le) u8(i) | (u8(i + 1) << 8) else (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      if (le) u16(i).toLong | (u16(i + 2).toLong << 16)
      else (u16(i).toLong << 16) | u16(i + 2).toLong
    require(u16(2) == 42, "ExifParser: TIFF magic is not 42")
    val ifd0 = u32(4)
    require(ifd0 >= 8 && ifd0 < b.length, s"ExifParser: IFD0 offset $ifd0 out of payload")

    // one IFD's entries as tag -> (type, count, valueFieldPos)
    def entriesOf(at: Long): Map[Int, (Int, Long, Int)] = {
      val n = u16(at.toInt)
      require(n > 0 && at + 2 + 12L * n + 4 <= b.length,
        s"ExifParser: IFD at $at with $n entries runs past the payload")
      val list = (0 until n).map { k =>
        val off = at.toInt + 2 + 12 * k
        u16(off) -> ((u16(off + 2), u32(off + 4), off + 8))
      }
      val m = list.toMap
      require(m.size == list.size, "ExifParser: duplicate IFD tag")
      m
    }

    def scalar(es: Map[Int, (Int, Long, Int)], tag: Int): Option[Long] =
      es.get(tag).map { case (tpe, count, at) =>
        require(count == 1, s"ExifParser: tag $tag count $count (want 1)")
        tpe match {
          case 3 => u16(at).toLong
          case 4 => u32(at)
          case t => throw new IllegalArgumentException(
            s"ExifParser: tag $tag type $t (want SHORT or LONG)")
        }
      }

    def ascii(es: Map[Int, (Int, Long, Int)], tag: Int): Option[String] =
      es.get(tag).map { case (tpe, count, at) =>
        require(tpe == 2, s"ExifParser: tag $tag type $tpe (want ASCII)")
        require(count >= 1, s"ExifParser: tag $tag empty ASCII")
        val base = if (count <= 4) at.toLong else u32(at)
        require(base >= 0 && base + count <= b.length,
          s"ExifParser: tag $tag ASCII value runs past the payload")
        require(b((base + count - 1).toInt) == 0,
          s"ExifParser: tag $tag ASCII not NUL-terminated")
        new String(b, base.toInt, count.toInt - 1,
          java.nio.charset.StandardCharsets.US_ASCII)
      }

    val ifd = entriesOf(ifd0)
    val orientation = scalar(ifd, 274).getOrElse(1L).toInt
    require(orientation >= 1 && orientation <= 8,
      s"ExifParser: orientation $orientation outside 1-8")
    val (px, py) = scalar(ifd, 34665) match {
      case Some(exifAt) =>
        require(exifAt >= 8 && exifAt < b.length,
          s"ExifParser: Exif sub-IFD offset $exifAt out of payload")
        val sub = entriesOf(exifAt)
        (scalar(sub, 40962), scalar(sub, 40963))
      case None => (None, None)
    }
    Exif(le, orientation, ascii(ifd, 271), ascii(ifd, 272), ascii(ifd, 306), px, py)
  }

  /** Build an EXIF TIFF payload (IFD0 with Make/Model/Orientation/
    * DateTime + Exif sub-IFD with pixel dimensions) — the fixture
    * writer's mirror of [[parseTiff]]. */
  def encodeTiff(orientation: Int, make: String, model: String,
                 dateTime: String, pixelX: Long, pixelY: Long,
                 bigEndian: Boolean = false): Array[Byte] = {
    require(orientation >= 1 && orientation <= 8,
      s"ExifParser.encodeTiff: orientation $orientation")
    val out = new ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit =
      if (bigEndian) { w8(v >> 8); w8(v) } else { w8(v); w8(v >> 8) }
    def w32(v: Long): Unit =
      if (bigEndian) { w16((v >> 16).toInt); w16(v.toInt) }
      else { w16(v.toInt); w16((v >> 16).toInt) }
    if (bigEndian) { w8('M'); w8('M') } else { w8('I'); w8('I') }
    w16(42)
    w32(8) // IFD0 right after the header
    // ASCII payloads (NUL-terminated); out-of-line when > 4 bytes
    val mk = make + "\u0000"
    val md = model + "\u0000"
    val dt = dateTime + "\u0000"
    val ifd0Tags = 5 // 271, 272, 274, 306, 34665
    val ifd0End = 8 + 2 + 12 * ifd0Tags + 4
    var dataAt = ifd0End.toLong
    def place(s: String): Long =
      if (s.length <= 4) -1L else { val o = dataAt; dataAt += s.length; o }
    val mkAt = place(mk)
    val mdAt = place(md)
    val dtAt = place(dt)
    if (dataAt % 2 == 1) dataAt += 1 // word-align the sub-IFD
    val exifAt = dataAt
    // IFD0
    w16(ifd0Tags)
    def asciiTag(tag: Int, s: String, at: Long): Unit = {
      w16(tag); w16(2); w32(s.length.toLong)
      if (at < 0) {
        var k = 0
        while (k < 4) { w8(if (k < s.length) s.charAt(k) else 0); k += 1 }
      } else w32(at)
    }
    asciiTag(271, mk, mkAt)
    asciiTag(272, md, mdAt)
    w16(274); w16(3); w32(1); w16(orientation); w16(0)
    asciiTag(306, dt, dtAt)
    w16(34665); w16(4); w32(1); w32(exifAt)
    w32(0) // no IFD1
    // out-of-line ASCII data
    Seq((mkAt, mk), (mdAt, md), (dtAt, dt)).foreach { case (at, s) =>
      if (at >= 0) s.foreach(c => w8(c))
    }
    if (out.size() < exifAt) w8(0) // alignment pad
    require(out.size() == exifAt, "ExifParser.encodeTiff: internal layout drift")
    // Exif sub-IFD: PixelXDimension, PixelYDimension
    w16(2)
    w16(40962); w16(4); w32(1); w32(pixelX)
    w16(40963); w16(4); w32(1); w32(pixelY)
    w32(0)
    out.toByteArray
  }

  /** Splice an APP1/EXIF segment right after a JPEG's SOI marker — a
    * valid transformation of any JPEG (readers skip unknown APP
    * segments; [[JpegCodec]] already does). */
  def spliceApp1(jpeg: Array[Byte], tiffPayload: Array[Byte]): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff &&
      (jpeg(1) & 0xff) == 0xd8, "ExifParser.spliceApp1: not a JPEG")
    val segLen = 2 + 6 + tiffPayload.length
    require(segLen <= 0xffff, "ExifParser.spliceApp1: APP1 payload too large")
    val out = new ByteArrayOutputStream(jpeg.length + segLen + 2)
    out.write(0xff); out.write(0xd8)
    out.write(0xff); out.write(0xe1)
    out.write(segLen >> 8); out.write(segLen & 0xff)
    out.write('E'); out.write('x'); out.write('i'); out.write('f')
    out.write(0); out.write(0)
    out.write(tiffPayload, 0, tiffPayload.length)
    out.write(jpeg, 2, jpeg.length - 2)
    out.toByteArray
  }
}
