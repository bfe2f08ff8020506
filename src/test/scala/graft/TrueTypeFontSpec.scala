package graft

import graft.pipeline.{PdfCodec, TrueTypeFont}
import org.scalatest.funsuite.AnyFunSuite

/** Glyph-program text extraction (reference Function.java:90-132 —
  * PDFBox resolves subset fonts with no /ToUnicode through the embedded
  * TrueType program): [[TrueTypeFont]] encode→decode round trips over
  * both cmap-format legs, stale-checksum tolerance, the fail-loud
  * boundary (symbol-only cmaps, missing tables, corrupt bytes), and the
  * PDF-level path through [[PdfCodec.encodeFontProgPdf]] /
  * `extractText`. */
class TrueTypeFontSpec extends AnyFunSuite {

  private val entries = Seq(
    (0x20, 'h'.toInt), (0x21, 'e'.toInt), (0x22, 'l'.toInt), (0x23, 'o'.toInt),
    (0x24, 'α'.toInt), (0x25, '→'.toInt), (0x26, ' '.toInt))

  test("encodeProgram → symbolCodeToUnicode round trip (format 4 Unicode leg)") {
    val font = TrueTypeFont.encodeProgram(entries)
    val map = TrueTypeFont.symbolCodeToUnicode(font, fontNum = 7)
    assert(map == entries.map { case (c, cp) => c -> new String(Character.toChars(cp)) }.toMap)
  }

  test("OTTO (OpenType/CFF-outline) sfnt: same cmap read path") {
    val font = TrueTypeFont.encodeProgram(entries, otto = true)
    assert(new String(font, 0, 4, "ISO-8859-1") == "OTTO")
    assert(TrueTypeFont.symbolCodeToUnicode(font, 7) ==
      TrueTypeFont.symbolCodeToUnicode(TrueTypeFont.encodeProgram(entries), 7))
  }

  test("format 12 Unicode leg: forced, and auto-selected by a supplementary char") {
    val forced = TrueTypeFont.encodeProgram(entries, format12 = true)
    assert(TrueTypeFont.symbolCodeToUnicode(forced, 7) ==
      entries.map { case (c, cp) => c -> new String(Character.toChars(cp)) }.toMap)
    // U+1F600 needs format 12 (and a surrogate-pair destination string)
    val supp = entries :+ (0x27, 0x1f600)
    val font = TrueTypeFont.encodeProgram(supp)
    val map = TrueTypeFont.symbolCodeToUnicode(font, 7)
    assert(map(0x27) == new String(Character.toChars(0x1f600)))
    assert(map(0x24) == "α")
  }

  test("fail-loud: missing cmap, symbol-only cmap, bad format, not-sfnt; stale checksums tolerated") {
    val font = TrueTypeFont.encodeProgram(entries)
    // STALE directory checksums must be tolerated (wild subset fonts
    // routinely carry them; PDFBox/FreeType ignore them): zero every
    // directory checkSum field and the decode is unchanged
    val stale = font.clone()
    for (k <- 0 until 3; j <- 0 until 4) stale(12 + 16 * k + 4 + j) = 0
    assert(TrueTypeFont.symbolCodeToUnicode(stale, 7) ==
      TrueTypeFont.symbolCodeToUnicode(font, 7))
    // rename the cmap tag
    val noCmap = font.clone()
    val tagAt = (0 until 3).map(12 + 16 * _)
      .find(o => new String(noCmap, o, 4, "US-ASCII") == "cmap").get
    noCmap(tagAt + 3) = 'x'.toByte
    val eCmap = intercept[IllegalArgumentException](
      TrueTypeFont.symbolCodeToUnicode(noCmap, 7))
    assert(eCmap.getMessage.contains("no 'cmap'"), eCmap.getMessage)
    // demote the (3,1) Unicode record to Macintosh (1,0): symbol-only
    val symOnly = font.clone()
    val cmapOff = {
      def u16(i: Int) = ((symOnly(i) & 0xff) << 8) | (symOnly(i + 1) & 0xff)
      def u32(i: Int) = (u16(i).toLong << 16) | u16(i + 2).toLong
      val k = (0 until 3).find(k =>
        new String(symOnly, 12 + 16 * k, 4, "US-ASCII") == "cmap").get
      u32(12 + 16 * k + 8).toInt
    }
    // second encoding record starts at cmap+4+8: platformID u16, encodingID u16
    symOnly(cmapOff + 4 + 8) = 0; symOnly(cmapOff + 4 + 8 + 1) = 1 // platform 1
    symOnly(cmapOff + 4 + 8 + 3) = 0 // encoding 0
    val eSym = intercept[IllegalArgumentException](
      TrueTypeFont.symbolCodeToUnicode(symOnly, 7))
    assert(eSym.getMessage.contains("symbol-only"), eSym.getMessage)
    // unsupported subtable format: overwrite the symbol subtable's
    // format word (it sits at cmap+4+16, after the two records)
    val badFmt = font.clone()
    badFmt(cmapOff + 4 + 16) = 0; badFmt(cmapOff + 4 + 16 + 1) = 2 // format 2
    val eFmt = intercept[IllegalArgumentException](
      TrueTypeFont.symbolCodeToUnicode(badFmt, 7))
    assert(eFmt.getMessage.contains("format 2"), eFmt.getMessage)
    // not an sfnt at all ('OTTO' became a VALID wrapper in round 16,
    // so the probe needs a genuinely unknown version tag)
    val eVer = intercept[IllegalArgumentException](
      TrueTypeFont.symbolCodeToUnicode("wOF21234".getBytes("US-ASCII"), 7))
    assert(eVer.getMessage.contains("sfnt"), eVer.getMessage)
  }

  test("cmap formats 0 and 6: hand-patched subtables decode like their format-4 twins") {
    // build a format-4 program, then hand-replace the (3,0) SYMBOL
    // subtable with a format-0 byte table / format-6 trimmed table
    // mapping the same codes to the same gids — the derived map must
    // be identical (the decoder treats subtable formats uniformly)
    val font = TrueTypeFont.encodeProgram(entries)
    val want = TrueTypeFont.symbolCodeToUnicode(font, 7)
    def u16(b: Array[Byte], i: Int) = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    def u32(b: Array[Byte], i: Int) = (u16(b, i).toLong << 16) | u16(b, i + 2)
    val cmapAt = {
      val k = (0 until 3).find(k =>
        new String(font, 12 + 16 * k, 4, "US-ASCII") == "cmap").get
      u32(font, 12 + 16 * k + 8).toInt
    }
    val symOff = u32(font, cmapAt + 4 + 4).toInt // record 0's offset
    val uniOff = u32(font, cmapAt + 4 + 8 + 4).toInt
    val symAbs = cmapAt + symOff
    val uniAbs = cmapAt + uniOff
    val symLen = uniOff - symOff
    // format 0: 256 glyph bytes; the symbol table keys are 0xF000|code,
    // but format 0 only indexes 0-255 — so key the RAW codes (legal per
    // the decoder's dual-convention unmasking)
    val fmt0 = new java.io.ByteArrayOutputStream()
    def be16(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
      b.write((v >> 8) & 0xff); b.write(v & 0xff)
    }
    be16(fmt0, 0); be16(fmt0, 262); be16(fmt0, 0)
    val glyphBytes = new Array[Byte](256)
    entries.zipWithIndex.foreach { case ((code, _), i) => glyphBytes(code) = (i + 1).toByte }
    fmt0.write(glyphBytes, 0, 256)
    def spliceSym(replacement: Array[Byte]): Array[Byte] = {
      val delta = replacement.length - symLen
      val out = font.take(symAbs) ++ replacement ++ font.drop(symAbs + symLen)
      // the Unicode record's offset moves by delta (it FOLLOWS the
      // symbol table in the encoder's layout); cmap is the last... no —
      // head/maxp follow, but their DIRECTORY offsets are absolute and
      // cmap grew/shrank: patch the directory offsets of head/maxp and
      // the cmap length, plus record 1's subtable offset
      val b = out.clone()
      // record 1 offset
      val no = uniOff + delta
      b(cmapAt + 4 + 8 + 4) = ((no >> 24) & 0xff).toByte
      b(cmapAt + 4 + 8 + 5) = ((no >> 16) & 0xff).toByte
      b(cmapAt + 4 + 8 + 6) = ((no >> 8) & 0xff).toByte
      b(cmapAt + 4 + 8 + 7) = (no & 0xff).toByte
      for (k <- 0 until 3) {
        val tag = new String(b, 12 + 16 * k, 4, "US-ASCII")
        if (tag == "head" || tag == "maxp") {
          val at = 12 + 16 * k + 8
          val old = u32(b, at)
          val nv = old + delta
          b(at) = ((nv >> 24) & 0xff).toByte; b(at + 1) = ((nv >> 16) & 0xff).toByte
          b(at + 2) = ((nv >> 8) & 0xff).toByte; b(at + 3) = (nv & 0xff).toByte
        } else if (tag == "cmap") {
          val at = 12 + 16 * k + 12
          val old = u32(b, at)
          val nv = old + delta
          b(at) = ((nv >> 24) & 0xff).toByte; b(at + 1) = ((nv >> 16) & 0xff).toByte
          b(at + 2) = ((nv >> 8) & 0xff).toByte; b(at + 3) = (nv & 0xff).toByte
        }
      }
      b
    }
    assert(TrueTypeFont.symbolCodeToUnicode(spliceSym(fmt0.toByteArray), 7) == want,
      "format 0 twin")
    // format 6: trimmed table over the contiguous code range 0x20..0x26
    val fmt6 = new java.io.ByteArrayOutputStream()
    be16(fmt6, 6); be16(fmt6, 10 + 2 * 7); be16(fmt6, 0)
    be16(fmt6, 0xf020); be16(fmt6, 7)
    (1 to 7).foreach(g => be16(fmt6, g))
    assert(TrueTypeFont.symbolCodeToUnicode(spliceSym(fmt6.toByteArray), 7) == want,
      "format 6 twin")
  }

  test("PDF round trip: symbolic subset font with no ToUnicode, codes private to the font") {
    val pages = Seq(
      "hello glyph program world",
      "Greek αβγ and arrows →← mixed with ascii",
      "third page repeats hello")
    for (compress <- Seq(true, false); f12 <- Seq(false, true)) {
      val pdf = PdfCodec.encodeFontProgPdf(pages, compress, f12)
      assert(PdfCodec.extractText(pdf) == pages, s"compress=$compress format12=$f12")
    }
    // the shown bytes really are remapped: an uncompressed file must NOT
    // contain the plaintext (a Latin-1 pass-through decoder garbles)
    val plain = new String(PdfCodec.encodeFontProgPdf(pages, compress = false), "ISO-8859-1")
    assert(!plain.contains("hello"), "content bytes leak the plaintext — codes not remapped")
  }

  test("symbolic TrueType without a font program fails loud; ToUnicode takes precedence") {
    val pages = Seq("abc abc")
    val pdf = new String(PdfCodec.encodeFontProgPdf(pages, compress = false), "ISO-8859-1")
    // strip /FontFile2 from the descriptor: text becomes unrecoverable
    val noProg = pdf.replaceFirst("""/FontFile2 \d+ 0 R """, "")
    val eNo = intercept[IllegalArgumentException](
      PdfCodec.extractText(noProg.getBytes("ISO-8859-1")))
    assert(eNo.getMessage.contains("no embedded /FontFile"), eNo.getMessage)
    // splice a /ToUnicode that maps the codes to UPPERCASE: the author's
    // explicit map must win over the glyph-program derivation (§9.10.3)
    // ('a'→0x20, 'b'→0x21, 'c'→0x22, ' '→0x23 by first appearance)
    val tu = "2 beginbfchar\n<20> <0041>\n<21> <0042>\nendbfchar\n" +
      "2 beginbfchar\n<22> <0043>\n<23> <0020>\nendbfchar\n"
    val tuObj = s"99 0 obj\n<< /Length ${tu.length} >>\nstream\n$tu\nendstream\nendobj\n"
    val withTu = pdf
      .replaceFirst("/FontDescriptor", "/ToUnicode 99 0 R /FontDescriptor")
      .replaceFirst("xref\n", tuObj + "xref\n")
    assert(PdfCodec.extractText(withTu.getBytes("ISO-8859-1")) == Seq("ABC ABC"))
  }
}
