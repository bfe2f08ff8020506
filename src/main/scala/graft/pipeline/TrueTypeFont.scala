package graft.pipeline

/** Embedded TrueType font program — the `cmap` table, the one part text
  * extraction needs (reference behavior: PDFBox reads the embedded
  * program inside Function.java:90-132 to decode subset fonts that ship
  * with NO /ToUnicode and NO usable /Encoding; this module re-expresses
  * that against the public TrueType/OpenType `cmap` spec).
  *
  * Scope (fail-loud beyond it):
  *   - sfnt version 0x00010000 or 'true'; table directory with in-file
  *     bounds and the 'head' magic number (directory CHECKSUMS are not
  *     verified — wild subset fonts routinely carry stale ones and
  *     PDFBox/FreeType ignore them; the cmap parse is independently
  *     bounds-checked);
  *   - `cmap` subtable formats 0, 4, 6 and 12 — the formats real subset
  *     fonts carry; other formats fail loud with their number;
  *   - [[symbolCodeToUnicode]]: the (3,0) Microsoft Symbol subtable
  *     supplies code→glyph (codes stored raw or 0xF000-masked, the MS
  *     convention), and a Unicode-platform subtable — (3,1) BMP,
  *     (3,10) full repertoire, or (0,*) Apple Unicode — supplies
  *     glyph→Unicode by INVERSION (the smallest code point wins when a
  *     glyph serves several, a deterministic choice). A font with no
  *     Unicode-platform subtable is symbol-only: its text is genuinely
  *     unrecoverable and fails loud, never guessed.
  *
  * Plain JVM code — runs inside `mapPartitions` with zero task-side
  * dependencies, like the rest of the PDF stack. */
private[graft] object TrueTypeFont {

  private final val MaxMapEntries = 1 << 21 // crafted-coverage guard

  private final class Reader(bytes: Array[Byte], fontNum: Int) {
    def len: Int = bytes.length
    def u8(i: Int): Int = {
      require(i >= 0 && i < bytes.length,
        s"PdfCodec: font $fontNum: TrueType read past EOF at $i")
      bytes(i) & 0xff
    }
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def s16(i: Int): Int = u16(i).toShort.toInt
    def u32(i: Int): Long = (u16(i).toLong << 16) | u16(i + 2).toLong
  }

  /** (tag → (offset, length)) of the sfnt table directory, with bounds
    * validation and the 'head' magic check — directory checksums are
    * deliberately NOT verified (see the comment in the body). */
  private def directory(r: Reader, fontNum: Int): Map[String, (Int, Int)] = {
    val ver = r.u32(0)
    // 0x00010000 / 'true' = TrueType outlines; 'OTTO' = an OpenType
    // wrapper around CFF outlines — the cmap (all this module reads)
    // lives in the sfnt directory either way
    require(ver == 0x00010000L || ver == 0x74727565L || ver == 0x4f54544fL,
      f"PdfCodec: font $fontNum: sfnt version 0x$ver%08x is not a " +
        "TrueType/OpenType font")
    val numTables = r.u16(4)
    require(numTables > 0 && 12 + 16 * numTables <= r.len,
      s"PdfCodec: font $fontNum: TrueType directory ($numTables tables) truncated")
    val entries = (0 until numTables).map { k =>
      val o = 12 + 16 * k
      val tag = new String(Array(r.u8(o), r.u8(o + 1), r.u8(o + 2), r.u8(o + 3))
        .map(_.toByte), "US-ASCII")
      val sum = r.u32(o + 4)
      val off = r.u32(o + 8)
      val n = r.u32(o + 12)
      require(off + n <= r.len && n <= Int.MaxValue - 4,
        s"PdfCodec: font $fontNum: TrueType table '$tag' at $off+$n runs past EOF")
      (tag, sum, off.toInt, n.toInt)
    }
    // Directory checksums are deliberately NOT verified: real-world
    // subset fonts routinely carry zeroed or stale checksums, and the
    // readers this path mirrors (PDFBox/FreeType) ignore them — a
    // mandatory check would reject decodable corpora wholesale. The
    // cmap parse below is independently bounds-checked; structural
    // sanity comes from the directory bounds and the 'head' magic.
    val dir = entries.map { case (tag, _, off, n) => tag -> (off, n) }.toMap
    require(dir.size == entries.size,
      s"PdfCodec: font $fontNum: TrueType directory repeats a table tag")
    dir.get("head").foreach { case (off, n) =>
      require(n >= 54 && r.u32(off + 12) == 0x5f0f3cf5L,
        s"PdfCodec: font $fontNum: TrueType 'head' magic number wrong")
    }
    dir
  }

  /** Parse one cmap subtable at `at` into charCode → glyphId (glyph 0 =
    * .notdef entries dropped). Every read is bounds-checked against the
    * cmap TABLE's end (`tableEnd`, ADVICE r16) — file-level bounds alone
    * would let a malformed subset font silently decode adjacent tables'
    * bytes as mappings. */
  private def subtable(r: Reader, at: Int, tableEnd: Int,
                       fontNum: Int): Map[Int, Int] = {
    def chk(i: Int, w: Int): Int = {
      require(i >= at && i + w <= tableEnd,
        s"PdfCodec: font $fontNum: cmap subtable read at $i+$w outside the " +
          s"cmap table (ends $tableEnd) — malformed subtable geometry")
      i
    }
    def u8(i: Int): Int = r.u8(chk(i, 1))
    def u16(i: Int): Int = r.u16(chk(i, 2))
    def s16(i: Int): Int = r.s16(chk(i, 2))
    def u32(i: Int): Long = r.u32(chk(i, 4))
    val out = Map.newBuilder[Int, Int]
    var n = 0
    def put(code: Int, gid: Int): Unit = if (gid != 0) {
      n += 1
      require(n <= MaxMapEntries,
        s"PdfCodec: font $fontNum: cmap subtable exceeds $MaxMapEntries mappings")
      out += code -> gid
    }
    u16(at) match {
      case 0 => // byte encoding table: 256 glyph bytes
        for (c <- 0 until 256) put(c, u8(at + 6 + c))
      case 4 => // segment mapping to delta values (BMP)
        val segCount = u16(at + 6) / 2
        require(segCount > 0, s"PdfCodec: font $fontNum: cmap format 4 with 0 segments")
        val endAt = at + 14
        val startAt = endAt + 2 * segCount + 2 // +2: reservedPad
        val deltaAt = startAt + 2 * segCount
        val rangeAt = deltaAt + 2 * segCount
        for (s <- 0 until segCount) {
          val end = u16(endAt + 2 * s)
          val start = u16(startAt + 2 * s)
          val delta = s16(deltaAt + 2 * s)
          val rangeOff = u16(rangeAt + 2 * s)
          require(start <= end,
            s"PdfCodec: font $fontNum: cmap format 4 segment $s start $start > end $end")
          var c = start
          while (c <= end) {
            if (c != 0xffff) { // the required sentinel segment maps nothing
              val gid =
                if (rangeOff == 0) (c + delta) & 0xffff
                else {
                  val g = u16(rangeAt + 2 * s + rangeOff + 2 * (c - start))
                  if (g == 0) 0 else (g + delta) & 0xffff
                }
              put(c, gid)
            }
            c += 1
          }
        }
      case 6 => // trimmed table mapping
        val first = u16(at + 6)
        val count = u16(at + 8)
        for (i <- 0 until count) put(first + i, u16(at + 10 + 2 * i))
      case 12 => // segmented coverage (full Unicode repertoire)
        val nGroups = u32(at + 12)
        require(nGroups <= MaxMapEntries,
          s"PdfCodec: font $fontNum: cmap format 12 declares $nGroups groups")
        for (g <- 0 until nGroups.toInt) {
          val o = at + 16 + 12 * g
          val start = u32(o)
          val end = u32(o + 4)
          val gid0 = u32(o + 8)
          require(start <= end && end <= 0x10ffffL,
            s"PdfCodec: font $fontNum: cmap format 12 group $g range " +
              s"[$start,$end] invalid")
          var c = start
          while (c <= end) {
            put(c.toInt, ((gid0 + (c - start)) & 0xffffL).toInt)
            c += 1
          }
        }
      case f => throw new IllegalArgumentException(
        s"PdfCodec: font $fontNum: cmap subtable format $f unsupported " +
          "(formats 0, 4, 6, 12)")
    }
    out.result()
  }

  /** All cmap encoding records: (platformID, encodingID) → subtable
    * offset (absolute), in record order. */
  private def cmapRecords(r: Reader, dir: Map[String, (Int, Int)],
                          fontNum: Int): Seq[(Int, Int, Int)] = {
    val (cmapAt, cmapLen) = dir.getOrElse("cmap", throw new IllegalArgumentException(
      s"PdfCodec: font $fontNum: TrueType program has no 'cmap' table — " +
        "no code→glyph mapping to extract text through"))
    val nRec = r.u16(cmapAt + 2)
    require(nRec > 0 && 4 + 8 * nRec <= cmapLen,
      s"PdfCodec: font $fontNum: cmap declares $nRec encoding records ($cmapLen bytes)")
    (0 until nRec).map { k =>
      val o = cmapAt + 4 + 8 * k
      val off = r.u32(o + 4)
      require(off >= 4 && off < cmapLen,
        s"PdfCodec: font $fontNum: cmap record $k offset $off outside the table")
      (r.u16(o), r.u16(o + 2), cmapAt + off.toInt)
    }
  }

  /** code → Unicode for a SYMBOLIC simple TrueType font (see the object
    * Scaladoc for the two-leg derivation and its fail-loud boundary). */
  def symbolCodeToUnicode(font: Array[Byte], fontNum: Int): Map[Int, String] = {
    val r = new Reader(font, fontNum)
    val dir = directory(r, fontNum)
    val recs = cmapRecords(r, dir, fontNum)
    val cmapEnd = dir("cmap") match { case (off, len) => off + len }
    val symAt = recs.collectFirst { case (3, 0, at) => at }.getOrElse(
      throw new IllegalArgumentException(
        s"PdfCodec: font $fontNum: no (3,0) Microsoft Symbol cmap subtable — " +
          "the code→glyph leg for a symbolic simple font is missing"))
    val uniAt = recs.collectFirst { case (3, 1, at) => at }
      .orElse(recs.collectFirst { case (3, 10, at) => at })
      .orElse(recs.collectFirst { case (0, _, at) => at })
      .getOrElse(throw new IllegalArgumentException(
        s"PdfCodec: font $fontNum: symbol-only cmap — no Unicode-platform " +
          "subtable ((3,1), (3,10) or (0,*)) to recover text through"))
    val sym = subtable(r, symAt, cmapEnd, fontNum)
    val uni = subtable(r, uniAt, cmapEnd, fontNum)
    // invert glyph→Unicode: smallest code point wins (deterministic)
    val inv = uni.toSeq.groupBy(_._2).map { case (gid, hits) =>
      gid -> hits.map(_._1).min
    }
    val out = Map.newBuilder[Int, String]
    sym.foreach { case (codeKey, gid) =>
      // MS symbol convention stores byte codes at 0xF0xx; raw bytes legal
      val code = if ((codeKey & 0xff00) == 0xf000) codeKey & 0xff else codeKey
      require(code <= 0xff,
        f"PdfCodec: font $fontNum: (3,0) cmap code 0x$codeKey%04x is neither a " +
          "byte code nor 0xF000-masked (not a simple-font symbol table)")
      require(!(sym.contains(code) && sym.contains(0xf000 | code) && code != codeKey),
        f"PdfCodec: font $fontNum: (3,0) cmap maps both 0x$code%02x and " +
          f"0xF0${code}%02x — ambiguous after unmasking")
      // a glyph absent from the Unicode subtable only fails text that
      // SHOWS it (decodeShown), not the whole document — the
      // DifferencesFont convention
      inv.get(gid).foreach(cp => out += code -> new String(Character.toChars(cp)))
    }
    out.result()
  }

  // ── writer (fixture generator for the oracle gates) ────────────────

  /** Write a minimal REAL TrueType program for a symbolic subset font:
    * an sfnt with `cmap`/`head`/`maxp` tables, correct directory
    * checksums and checkSumAdjustment. `entries` are (byteCode,
    * codePoint) pairs; glyph ids are assigned 1..n in entry order (0 =
    * .notdef). The cmap carries the two legs [[symbolCodeToUnicode]]
    * reads: a (3,0) format-4 subtable keyed 0xF000|code (the MS symbol
    * convention) and a Unicode subtable — (3,1) format 4 for a BMP-only
    * repertoire, or (3,10) format 12 when `format12` is set or any code
    * point is supplementary. Glyph outlines are not written (extraction
    * never reads them); the directory, checksums and cmap structures
    * are the real wire format. */
  private[graft] def encodeProgram(entries: Seq[(Int, Int)],
                                   format12: Boolean = false,
                                   otto: Boolean = false): Array[Byte] = {
    require(entries.nonEmpty, "TrueTypeFont.encodeProgram: empty repertoire")
    require(entries.map(_._1).distinct.length == entries.length,
      "TrueTypeFont.encodeProgram: duplicate byte codes")
    require(entries.map(_._2).distinct.length == entries.length,
      "TrueTypeFont.encodeProgram: duplicate code points")
    entries.foreach { case (code, cp) =>
      require(code >= 0 && code <= 0xff, s"byte code $code out of range")
      require(cp >= 0 && cp <= 0x10ffff, s"code point $cp out of range")
    }
    // ≥ 0xFFFF: supplementary planes need format 12, and U+FFFF itself
    // would collide with format 4's sentinel segment
    val useF12 = format12 || entries.exists(_._2 >= 0xffff)

    def be16(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
      b.write((v >> 8) & 0xff); b.write(v & 0xff)
    }
    def be32(b: java.io.ByteArrayOutputStream, v: Long): Unit = {
      b.write(((v >> 24) & 0xff).toInt); b.write(((v >> 16) & 0xff).toInt)
      b.write(((v >> 8) & 0xff).toInt); b.write((v & 0xff).toInt)
    }

    /** Format 4 with one segment per code + the required sentinel. */
    def fmt4(pairs: Seq[(Int, Int)]): Array[Byte] = {
      val segs = pairs.sortBy(_._1) :+ (0xffff, 0)
      val segCount = segs.length
      val b = new java.io.ByteArrayOutputStream()
      be16(b, 4)
      be16(b, 16 + 8 * segCount) // length
      be16(b, 0) // language
      be16(b, 2 * segCount)
      val floorLog = 31 - Integer.numberOfLeadingZeros(segCount)
      be16(b, 2 * (1 << floorLog)) // searchRange
      be16(b, floorLog) // entrySelector
      be16(b, 2 * segCount - 2 * (1 << floorLog)) // rangeShift
      segs.foreach { case (c, _) => be16(b, c) } // endCode
      be16(b, 0) // reservedPad
      segs.foreach { case (c, _) => be16(b, c) } // startCode
      segs.foreach { case (c, gid) => // idDelta: sentinel maps FFFF→0
        be16(b, if (c == 0xffff) 1 else (gid - c) & 0xffff)
      }
      segs.foreach(_ => be16(b, 0)) // idRangeOffset
      b.toByteArray
    }
    /** Format 12 with one group per code point. */
    def fmt12(pairs: Seq[(Int, Int)]): Array[Byte] = {
      val sorted = pairs.sortBy(_._1)
      val b = new java.io.ByteArrayOutputStream()
      be16(b, 12); be16(b, 0)
      be32(b, 16L + 12L * sorted.length) // length
      be32(b, 0) // language
      be32(b, sorted.length.toLong)
      sorted.foreach { case (cp, gid) =>
        be32(b, cp.toLong); be32(b, cp.toLong); be32(b, gid.toLong)
      }
      b.toByteArray
    }

    val symPairs = entries.zipWithIndex.map { case ((code, _), i) =>
      (0xf000 | code, i + 1) }
    val uniPairs = entries.zipWithIndex.map { case ((_, cp), i) => (cp, i + 1) }
    val symTab = fmt4(symPairs)
    val uniTab = if (useF12) fmt12(uniPairs) else fmt4(uniPairs)
    val cmap = {
      val b = new java.io.ByteArrayOutputStream()
      be16(b, 0); be16(b, 2) // version, numTables
      be16(b, 3); be16(b, 0); be32(b, 4 + 8 * 2)
      be16(b, 3); be16(b, if (useF12) 10 else 1); be32(b, 4 + 8 * 2 + symTab.length)
      b.write(symTab, 0, symTab.length)
      b.write(uniTab, 0, uniTab.length)
      b.toByteArray
    }
    val head = {
      val b = new java.io.ByteArrayOutputStream()
      be32(b, 0x00010000L); be32(b, 0x00010000L)
      be32(b, 0) // checkSumAdjustment — patched below
      be32(b, 0x5f0f3cf5L)
      be16(b, 0); be16(b, 1000) // flags, unitsPerEm
      be32(b, 0); be32(b, 0); be32(b, 0); be32(b, 0) // created, modified
      be16(b, 0); be16(b, 0); be16(b, 1000); be16(b, 1000) // bbox
      be16(b, 0); be16(b, 8) // macStyle, lowestRecPPEM
      be16(b, 2); be16(b, 0); be16(b, 0) // directionHint, locFormat, glyphFormat
      b.toByteArray
    }
    val maxp = {
      val b = new java.io.ByteArrayOutputStream()
      be32(b, 0x00010000L)
      be16(b, entries.length + 1) // numGlyphs incl. .notdef
      (0 until 13).foreach(_ => be16(b, 0))
      b.toByteArray
    }

    def pad4(a: Array[Byte]): Array[Byte] =
      if (a.length % 4 == 0) a else a ++ new Array[Byte](4 - a.length % 4)
    def checksum(a: Array[Byte]): Long = {
      val p = pad4(a)
      var acc = 0L
      var i = 0
      while (i < p.length) {
        acc = (acc + (((p(i) & 0xffL) << 24) | ((p(i + 1) & 0xffL) << 16) |
          ((p(i + 2) & 0xffL) << 8) | (p(i + 3) & 0xffL))) & 0xffffffffL
        i += 4
      }
      acc
    }

    val tables = Seq("cmap" -> cmap, "head" -> head, "maxp" -> maxp) // tag-sorted
    val out = new java.io.ByteArrayOutputStream()
    be32(out, if (otto) 0x4f54544fL else 0x00010000L) // 'OTTO' wraps CFF outlines
    be16(out, tables.length)
    val floorLog = 31 - Integer.numberOfLeadingZeros(tables.length)
    be16(out, 16 * (1 << floorLog))
    be16(out, floorLog)
    be16(out, 16 * tables.length - 16 * (1 << floorLog))
    var off = 12 + 16 * tables.length
    tables.foreach { case (tag, data) =>
      out.write(tag.getBytes("US-ASCII"), 0, 4)
      be32(out, checksum(data))
      be32(out, off.toLong)
      be32(out, data.length.toLong)
      off += pad4(data).length
    }
    tables.foreach { case (_, data) => out.write(pad4(data), 0, pad4(data).length) }
    val font = out.toByteArray
    // checkSumAdjustment = 0xB1B0AFBA − checksum(whole font with the
    // field itself still 0); head starts after the directory
    val headAt = 12 + 16 * tables.length + pad4(cmap).length
    val adj = (0xb1b0afbaL - checksum(font)) & 0xffffffffL
    font(headAt + 8) = ((adj >> 24) & 0xff).toByte
    font(headAt + 9) = ((adj >> 16) & 0xff).toByte
    font(headAt + 10) = ((adj >> 8) & 0xff).toByte
    font(headAt + 11) = (adj & 0xff).toByte
    font
  }
}
