package graft.pipeline

/** Embedded CFF / Type1C font program (PDF /FontFile3 /Subtype /Type1C)
  * — the charset/encoding tables, the part text extraction needs
  * (reference behavior: PDFBox reads the embedded program inside
  * Function.java:90-132; this module re-expresses the WHAT against the
  * public CFF spec, Adobe TN #5176). The companion of [[TrueTypeFont]]:
  * where an sfnt recovers text through its `cmap`, a CFF font recovers
  * it through code → glyph (Encoding) → SID (charset) → NAME (String
  * INDEX / standard strings) → Unicode ([[PdfCodec.glyphToUnicode]]'s
  * AGL + uniXXXX machinery).
  *
  * Scope (fail-loud beyond it):
  *   - plain (non-CID-keyed) fonts — a /ROS Top DICT entry refuses
  *     with the reason (CID-keyed CFFs map gid → CID, not names);
  *   - EMBEDDED Encoding formats 0 and 1 (+ supplements); the
  *     predefined Standard/Expert encodings refuse — a font using them
  *     is nonsymbolic by construction and belongs to the simple-font
  *     path, not glyph-program recovery;
  *   - charset formats 0, 1, 2, and the predefined ISOAdobe charset
  *     (SID = gid identity); Expert/ExpertSubset refuse;
  *   - SID → name via the String INDEX (custom SIDs ≥ 391) or the
  *     standard strings' ASCII repertoire (SIDs 0-95, restated from
  *     Appendix A); standard SIDs 96-390 refuse loud rather than risk
  *     a misremembered table silently garbling text.
  *
  * Plain JVM code — runs inside `mapPartitions` with zero task-side
  * dependencies, like the rest of the PDF stack. */
private[graft] object CffFont {

  /** CFF standard strings 0-95 (Appendix A) — the ASCII repertoire,
    * aligned with Adobe StandardEncoding's name order. */
  private val StdStrings: Array[String] = {
    val letters = ('A' to 'Z').map(_.toString) // SIDs 34-59
    val lowers = ('a' to 'z').map(_.toString)  // SIDs 66-91
    (Seq(".notdef", "space", "exclam", "quotedbl", "numbersign", "dollar",
      "percent", "ampersand", "quoteright", "parenleft", "parenright",
      "asterisk", "plus", "comma", "hyphen", "period", "slash",
      "zero", "one", "two", "three", "four", "five", "six", "seven",
      "eight", "nine", "colon", "semicolon", "less", "equal", "greater",
      "question", "at") ++ letters ++
      Seq("bracketleft", "backslash", "bracketright", "asciicircum",
        "underscore", "quoteleft") ++ lowers ++
      Seq("braceleft", "bar", "braceright", "asciitilde")).toArray
  }

  private final class Reader(bytes: Array[Byte], fontNum: Int) {
    def len: Int = bytes.length
    def u8(i: Int): Int = {
      require(i >= 0 && i < bytes.length,
        s"PdfCodec: font $fontNum: CFF read past EOF at $i")
      bytes(i) & 0xff
    }
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long = (u16(i).toLong << 16) | u16(i + 2).toLong
    def uOff(i: Int, offSize: Int): Int = {
      require(offSize >= 1 && offSize <= 4,
        s"PdfCodec: font $fontNum: CFF offSize $offSize out of 1-4")
      var v = 0L
      var j = 0
      while (j < offSize) { v = (v << 8) | u8(i + j); j += 1 }
      require(v <= Int.MaxValue, s"PdfCodec: font $fontNum: CFF offset $v overflows")
      v.toInt
    }
  }

  /** An INDEX at `at`: (entry byte ranges, position after the INDEX). */
  private def index(r: Reader, at: Int, what: String,
                    fontNum: Int): (IndexedSeq[(Int, Int)], Int) = {
    val count = r.u16(at)
    if (count == 0) return (IndexedSeq.empty, at + 2)
    val offSize = r.u8(at + 2)
    val offsets = IndexedSeq.tabulate(count + 1)(k => r.uOff(at + 3 + k * offSize, offSize))
    require(offsets.head == 1 && offsets.iterator.sliding(2).withPartial(false)
        .forall(w => w(0) <= w(1)),
      s"PdfCodec: font $fontNum: CFF $what INDEX offsets not ascending from 1")
    val dataAt = at + 3 + (count + 1) * offSize - 1 // offsets are 1-based
    val end = dataAt + offsets.last
    require(end <= r.len,
      s"PdfCodec: font $fontNum: CFF $what INDEX data runs past EOF")
    (IndexedSeq.tabulate(count)(k => (dataAt + offsets(k), dataAt + offsets(k + 1))),
      end)
  }

  /** DICT parse: operator → operands (integer operands only; reals are
    * consumed and dropped — none of the keys this module reads is
    * real-valued). */
  private def dict(r: Reader, from: Int, to: Int,
                   fontNum: Int): Map[Int, Seq[Int]] = {
    val out = Map.newBuilder[Int, Seq[Int]]
    var operands = List.empty[Int]
    var pos = from
    while (pos < to) {
      val b0 = r.u8(pos)
      if (b0 <= 21) { // operator (12 = escape → two-byte op 1200 + b1)
        val (op, w) = if (b0 == 12) (1200 + r.u8(pos + 1), 2) else (b0, 1)
        out += op -> operands.reverse
        operands = Nil
        pos += w
      } else if (b0 == 28) { operands ::= r.u16(pos + 1).toShort.toInt; pos += 3 }
      else if (b0 == 29) { operands ::= r.u32(pos + 1).toInt; pos += 5 }
      else if (b0 == 30) { // real: nibble stream until 0xF terminator
        pos += 1
        var done = false
        while (!done) {
          val b = r.u8(pos); pos += 1
          if ((b & 0xf0) == 0xf0 || (b & 0x0f) == 0x0f) done = true
        }
        operands ::= 0
      }
      else if (b0 >= 32 && b0 <= 246) { operands ::= b0 - 139; pos += 1 }
      else if (b0 >= 247 && b0 <= 250) {
        operands ::= (b0 - 247) * 256 + r.u8(pos + 1) + 108; pos += 2
      } else if (b0 >= 251 && b0 <= 254) {
        operands ::= -(b0 - 251) * 256 - r.u8(pos + 1) - 108; pos += 2
      } else throw new IllegalArgumentException(
        s"PdfCodec: font $fontNum: CFF DICT byte $b0 reserved")
    }
    out.result()
  }

  /** code → Unicode for a SYMBOLIC simple font with an embedded Type1C
    * program (see the object Scaladoc for the four-hop derivation). */
  def codeToUnicode(cff: Array[Byte], fontNum: Int): Map[Int, String] = {
    val r = new Reader(cff, fontNum)
    require(r.u8(0) == 1,
      s"PdfCodec: font $fontNum: CFF major version ${r.u8(0)} (want 1)")
    val hdrSize = r.u8(2)
    require(hdrSize >= 4, s"PdfCodec: font $fontNum: CFF hdrSize $hdrSize < 4")
    val (_, afterName) = index(r, hdrSize, "Name", fontNum)
    val (topDicts, afterTop) = index(r, afterName, "Top DICT", fontNum)
    require(topDicts.length == 1,
      s"PdfCodec: font $fontNum: CFF carries ${topDicts.length} fonts (want 1)")
    val (strings, _) = index(r, afterTop, "String", fontNum)
    val top = dict(r, topDicts.head._1, topDicts.head._2, fontNum)
    require(!top.contains(1230), // 12 30 = ROS
      s"PdfCodec: font $fontNum: CID-keyed CFF (/ROS) — glyphs map to CIDs, " +
        "not names; out of the glyph-program text scope")
    val charStringsAt = top.getOrElse(17, throw new IllegalArgumentException(
      s"PdfCodec: font $fontNum: CFF Top DICT has no CharStrings offset")).head
    val (charStrings, _) = index(r, charStringsAt, "CharStrings", fontNum)
    val nGlyphs = charStrings.length
    require(nGlyphs >= 1, s"PdfCodec: font $fontNum: CFF has no glyphs")

    // charset: gid → SID (gid 0 is always .notdef / SID 0)
    val charsetOff = top.get(15).map(_.head).getOrElse(0)
    val gidToSid: Array[Int] = charsetOff match {
      case 0 => Array.tabulate(nGlyphs)(identity) // ISOAdobe: SID = gid
      case 1 | 2 => throw new IllegalArgumentException(
        s"PdfCodec: font $fontNum: predefined Expert charset $charsetOff out of scope")
      case at =>
        val out = new Array[Int](nGlyphs)
        r.u8(at) match {
          case 0 =>
            for (g <- 1 until nGlyphs) out(g) = r.u16(at + 1 + 2 * (g - 1))
          case f @ (1 | 2) =>
            val nLeftW = if (f == 1) 1 else 2
            var g = 1
            var p = at + 1
            while (g < nGlyphs) {
              val first = r.u16(p)
              val nLeft = if (f == 1) r.u8(p + 2) else r.u16(p + 2)
              var k = 0
              while (k <= nLeft && g < nGlyphs) { out(g) = first + k; g += 1; k += 1 }
              p += 2 + nLeftW
            }
          case f => throw new IllegalArgumentException(
            s"PdfCodec: font $fontNum: CFF charset format $f unsupported (0-2)")
        }
        out
    }

    // encoding: code → gid (embedded formats only; supplements map
    // code → SID directly)
    val encodingOff = top.get(16).map(_.head).getOrElse(0)
    require(encodingOff > 1,
      s"PdfCodec: font $fontNum: predefined ${if (encodingOff == 0) "Standard"
        else "Expert"} encoding — a font on a standard encoding is " +
        "nonsymbolic and out of the glyph-program scope")
    val fmt = r.u8(encodingOff)
    val codeToGid = Map.newBuilder[Int, Int]
    val supplements = Map.newBuilder[Int, Int] // code → SID
    var supAt = (fmt & 0x7f) match {
      case 0 =>
        val n = r.u8(encodingOff + 1)
        require(n < nGlyphs,
          s"PdfCodec: font $fontNum: CFF encoding names $n codes for $nGlyphs glyphs")
        for (i <- 0 until n) codeToGid += (r.u8(encodingOff + 2 + i) -> (i + 1))
        encodingOff + 2 + n
      case 1 =>
        val nRanges = r.u8(encodingOff + 1)
        var gid = 1
        var p = encodingOff + 2
        for (_ <- 0 until nRanges) {
          val first = r.u8(p)
          val nLeft = r.u8(p + 1)
          for (k <- 0 to nLeft) {
            require(gid < nGlyphs,
              s"PdfCodec: font $fontNum: CFF encoding ranges exceed $nGlyphs glyphs")
            codeToGid += ((first + k) -> gid)
            gid += 1
          }
          p += 2
        }
        p
      case f => throw new IllegalArgumentException(
        s"PdfCodec: font $fontNum: CFF encoding format $f unsupported (0 or 1)")
    }
    if ((fmt & 0x80) != 0) {
      val nSups = r.u8(supAt)
      supAt += 1
      for (_ <- 0 until nSups) {
        supplements += (r.u8(supAt) -> r.u16(supAt + 1))
        supAt += 3
      }
    }

    def sidToName(sid: Int): String =
      if (sid < StdStrings.length) StdStrings(sid)
      else if (sid < 391) throw new IllegalArgumentException(
        s"PdfCodec: font $fontNum: CFF standard SID $sid beyond the carried " +
          "ASCII repertoire (0-95) — refused rather than risk a wrong name")
      else {
        val k = sid - 391
        require(k < strings.length,
          s"PdfCodec: font $fontNum: CFF SID $sid outside the String INDEX " +
            s"(${strings.length} custom strings)")
        val (s, e) = strings(k)
        new String(cff, s, e - s, "US-ASCII")
      }

    val out = Map.newBuilder[Int, String]
    codeToGid.result().foreach { case (code, gid) =>
      require(gid < nGlyphs,
        s"PdfCodec: font $fontNum: CFF encoding code $code names glyph $gid " +
          s"of $nGlyphs")
      out += code -> PdfCodec.glyphToUnicode(sidToName(gidToSid(gid)), fontNum)
    }
    supplements.result().foreach { case (code, sid) =>
      out += code -> PdfCodec.glyphToUnicode(sidToName(sid), fontNum)
    }
    out.result()
  }

  // ── writer (fixture generator for the oracle gate) ─────────────────

  /** Write a minimal REAL Type1C program: header, Name/Top DICT/String/
    * Global Subr INDEX structures, an embedded format-0 Encoding, a
    * format-0 charset of custom SIDs, and a CharStrings INDEX of
    * `endchar` stubs (extraction never reads outlines; the container
    * structures are the real wire format). `entries` are (byteCode,
    * codePoint): glyph i+1 carries custom SID 391+i whose string is the
    * uniXXXX / uXXXXX name of its code point — the four-hop derivation
    * [[codeToUnicode]] walks. */
  private[graft] def encodeProgram(entries: Seq[(Int, Int)]): Array[Byte] = {
    require(entries.nonEmpty, "CffFont.encodeProgram: empty repertoire")
    require(entries.map(_._1).distinct.length == entries.length,
      "CffFont.encodeProgram: duplicate byte codes")
    entries.foreach { case (code, cp) =>
      require(code >= 0 && code <= 0xff, s"byte code $code out of range")
      require(cp >= 0 && cp <= 0x10ffff, s"code point $cp out of range")
    }
    val n = entries.length
    def be16(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
      b.write((v >> 8) & 0xff); b.write(v & 0xff)
    }
    def bytesOf(f: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream(); f(b); b.toByteArray
    }
    /** INDEX with offSize 2 (covers every fixture size). */
    def mkIndex(items: Seq[Array[Byte]]): Array[Byte] = bytesOf { b =>
      be16(b, items.length)
      if (items.nonEmpty) {
        b.write(2) // offSize
        var off = 1
        be16(b, off)
        items.foreach { it => off += it.length; be16(b, off) }
        items.foreach(it => b.write(it, 0, it.length))
      }
    }
    def int5(v: Int): Array[Byte] = bytesOf { b =>
      b.write(29); b.write((v >> 24) & 0xff); b.write((v >> 16) & 0xff)
      b.write((v >> 8) & 0xff); b.write(v & 0xff)
    }

    val nameIdx = mkIndex(Seq("GraftSubset".getBytes("US-ASCII")))
    val names = entries.map { case (_, cp) =>
      (if (cp <= 0xffff) f"uni$cp%04X" else f"u$cp%05X").getBytes("US-ASCII")
    }
    val stringIdx = mkIndex(names)
    val gsubrIdx = mkIndex(Seq.empty)
    val encoding = bytesOf { b =>
      b.write(0); b.write(n) // format 0, nCodes
      entries.foreach { case (code, _) => b.write(code) }
    }
    val charset = bytesOf { b =>
      b.write(0) // format 0: SIDs for gids 1..n
      (0 until n).foreach(i => be16(b, 391 + i))
    }
    val charStringsIdx = mkIndex(Seq.fill(n + 1)(Array[Byte](14))) // endchar
    // Top DICT: three absolute offsets in fixed 5-byte form, so the
    // dict length (18) is known before the offsets are
    val topDictLen = 3 * 6
    val topIdxLen = 2 + 1 + 2 * 2 + topDictLen
    val header = Array[Byte](1, 0, 4, 2) // major, minor, hdrSize, offSize
    val encodingAt = header.length + nameIdx.length + topIdxLen +
      stringIdx.length + gsubrIdx.length
    val charsetAt = encodingAt + encoding.length
    val charStringsAt = charsetAt + charset.length
    val topDict = bytesOf { b =>
      b.write(int5(charsetAt), 0, 5); b.write(15)
      b.write(int5(encodingAt), 0, 5); b.write(16)
      b.write(int5(charStringsAt), 0, 5); b.write(17)
    }
    val topIdx = mkIndex(Seq(topDict))
    require(topIdx.length == topIdxLen, s"top INDEX ${topIdx.length} != $topIdxLen")
    val out = new java.io.ByteArrayOutputStream()
    Seq(header, nameIdx, topIdx, stringIdx, gsubrIdx, encoding, charset,
      charStringsIdx).foreach(x => out.write(x, 0, x.length))
    out.toByteArray
  }
}
