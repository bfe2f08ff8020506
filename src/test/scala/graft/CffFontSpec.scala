package graft

import graft.pipeline.{CffFont, PdfCodec}
import org.scalatest.funsuite.AnyFunSuite

/** CFF / Type1C glyph-program text extraction ([[CffFont]] — the
  * companion of the TrueType path, reference Function.java:90-132):
  * encode→decode round trips over the four-hop code→gid→SID→name→
  * Unicode derivation, standard-SID ASCII names, charset/encoding
  * format coverage, the fail-loud boundary (CID-keyed, predefined
  * encodings, Expert charsets, unknown SIDs), and the PDF-level path
  * through /FontFile3. */
class CffFontSpec extends AnyFunSuite {

  private val entries = Seq(
    (0x20, 'h'.toInt), (0x21, 'e'.toInt), (0x22, 'l'.toInt), (0x23, 'o'.toInt),
    (0x24, 'α'.toInt), (0x25, '→'.toInt), (0x26, ' '.toInt))

  test("encodeProgram → codeToUnicode round trip (custom uniXXXX SIDs)") {
    val cff = CffFont.encodeProgram(entries)
    val map = CffFont.codeToUnicode(cff, fontNum = 7)
    assert(map == entries.map { case (c, cp) =>
      c -> new String(Character.toChars(cp)) }.toMap)
    // supplementary code points ride the uXXXXX name form
    val supp = entries :+ (0x27, 0x1f600)
    val map2 = CffFont.codeToUnicode(CffFont.encodeProgram(supp), 7)
    assert(map2(0x27) == new String(Character.toChars(0x1f600)))
  }

  test("hand-patched variants: format-1 encoding ranges, supplements, standard-SID names") {
    val cff = CffFont.encodeProgram(entries)
    val s = cff.map(_ & 0xff).toArray
    // locate the format-0 encoding (format 0, nCodes 7, codes 0x20,0x21…)
    val encAt = (0 until cff.length - 9).find(i =>
      s(i) == 0 && s(i + 1) == 7 && s(i + 2) == 0x20 && s(i + 3) == 0x21).get
    // the charset/CharStrings tables FOLLOW the encoding, so resizing it
    // must shift their Top DICT offsets (ops 15 and 17; 5-byte ints)
    def shiftOffsets(b: Array[Byte], delta: Int): Unit = {
      var i = 0
      while (i < b.length - 5) {
        if ((b(i) & 0xff) == 29 &&
            ((b(i + 5) & 0xff) == 15 || (b(i + 5) & 0xff) == 17)) {
          val v = ((b(i + 1) & 0xff) << 24) | ((b(i + 2) & 0xff) << 16) |
            ((b(i + 3) & 0xff) << 8) | (b(i + 4) & 0xff)
          val nv = v + delta
          b(i + 1) = (nv >> 24).toByte; b(i + 2) = (nv >> 16).toByte
          b(i + 3) = (nv >> 8).toByte; b(i + 4) = nv.toByte
        }
        i += 1
      }
    }
    // format 1: codes 0x20..0x26 are consecutive → ONE range (4 bytes
    // replace 9), decoding identically to the format-0 original
    val ranged = cff.take(encAt) ++
      Array[Byte](1, 1, 0x20, 6) ++ cff.drop(encAt + 9)
    shiftOffsets(ranged, -5)
    assert(CffFont.codeToUnicode(ranged, 7) == CffFont.codeToUnicode(cff, 7),
      "format-1 ranges must decode like the format-0 original")
    // supplements: set the format's high bit and append one (code 0x30 →
    // standard SID 34 = 'A'), mapping through the ASCII standard strings
    val withSup = cff.take(encAt + 9) ++
      Array[Byte](1, 0x30, 0, 34) ++ cff.drop(encAt + 9)
    withSup(encAt) = 0x80.toByte
    shiftOffsets(withSup, 4)
    val map = CffFont.codeToUnicode(withSup, 7)
    assert(map(0x30) == "A", "supplement entry must map through the standard SID")
    assert(map(0x20) == "h", "base encoding survives the supplement")
  }

  test("fail-loud: CID-keyed, predefined encodings, Expert charset, unknown standard SID") {
    val cff = CffFont.encodeProgram(entries)
    // predefined Standard encoding: zero the Top DICT's op-16 operand
    def setOp16(b: Array[Byte], v: Int): Unit = {
      var i = 0
      while (i < b.length - 5) {
        if ((b(i) & 0xff) == 29 && (b(i + 5) & 0xff) == 16) {
          b(i + 1) = (v >> 24).toByte; b(i + 2) = (v >> 16).toByte
          b(i + 3) = (v >> 8).toByte; b(i + 4) = v.toByte
          return
        }
        i += 1
      }
      fail("op 16 not found")
    }
    val std = cff.clone(); setOp16(std, 0)
    val eStd = intercept[IllegalArgumentException](CffFont.codeToUnicode(std, 7))
    assert(eStd.getMessage.contains("Standard"), eStd.getMessage)
    // a standard SID beyond the carried ASCII repertoire refuses: point
    // the charset's first SID at 200
    val charsetAt = {
      // op 15 operand in the Top DICT
      var at = -1
      var i = 0
      while (at < 0 && i < cff.length - 5) {
        if ((cff(i) & 0xff) == 29 && (cff(i + 5) & 0xff) == 15)
          at = ((cff(i + 1) & 0xff) << 24) | ((cff(i + 2) & 0xff) << 16) |
            ((cff(i + 3) & 0xff) << 8) | (cff(i + 4) & 0xff)
        i += 1
      }
      at
    }
    val midSid = cff.clone()
    midSid(charsetAt + 1) = 0; midSid(charsetAt + 2) = 200.toByte
    val eMid = intercept[IllegalArgumentException](CffFont.codeToUnicode(midSid, 7))
    assert(eMid.getMessage.contains("ASCII repertoire"), eMid.getMessage)
    // Expert charset refuses
    val expert = cff.clone()
    def setOp15(b: Array[Byte], v: Int): Unit = {
      var i = 0
      while (i < b.length - 5) {
        if ((b(i) & 0xff) == 29 && (b(i + 5) & 0xff) == 15) {
          b(i + 1) = (v >> 24).toByte; b(i + 2) = (v >> 16).toByte
          b(i + 3) = (v >> 8).toByte; b(i + 4) = v.toByte
          return
        }
        i += 1
      }
    }
    setOp15(expert, 1)
    assert(intercept[IllegalArgumentException](CffFont.codeToUnicode(expert, 7))
      .getMessage.contains("Expert"))
    // not a CFF
    assert(intercept[IllegalArgumentException](
      CffFont.codeToUnicode(Array[Byte](2, 0, 4, 2, 0, 0), 7))
      .getMessage.contains("major version"))
  }

  test("PDF round trip: symbolic Type1 font with /FontFile3 Type1C, codes private to the font") {
    val pages = Seq(
      "cff glyph program page one",
      "Greek αβγ and arrows →← in compact font format",
      "third page repeats cff")
    for (compress <- Seq(true, false)) {
      val pdf = PdfCodec.encodeFontProgPdf(pages, compress, cff = true)
      assert(PdfCodec.extractText(pdf) == pages, s"compress=$compress")
    }
    val plain = new String(
      PdfCodec.encodeFontProgPdf(pages, compress = false, cff = true), "ISO-8859-1")
    assert(!plain.contains("cff glyph"), "content bytes leak the plaintext")
    // a /FontFile3 relabeled /OpenType routes to the sfnt reader, which
    // rejects the CFF payload loud (not an sfnt)
    val otf = plain.replace("/Subtype /Type1C", "/Subtype /OpenType")
    val eOtf = intercept[IllegalArgumentException](
      PdfCodec.extractText(otf.getBytes("ISO-8859-1")))
    assert(eOtf.getMessage.contains("sfnt"), eOtf.getMessage)
    // a REAL OpenType-wrapped program (OTTO sfnt) round-trips through
    // the same pages — the third program format under one oracle
    assert(PdfCodec.extractText(
      PdfCodec.encodeFontProgPdf(pages, compress = false, otto = true)) == pages)
    // …but an OTTO program MISLABELED as /FontFile2 (spec Table 126
    // wants TrueType outlines there) fails loud, not silent decode
    val ottoPdf = new String(
      PdfCodec.encodeFontProgPdf(pages, compress = false, otto = true), "ISO-8859-1")
    val mislabel = ottoPdf
      .replace("/FontFile3", "/FontFile2")
      .replace(" /Subtype /OpenType", "")
    val eMis = intercept[IllegalArgumentException](
      PdfCodec.extractText(mislabel.getBytes("ISO-8859-1")))
    assert(eMis.getMessage.contains("OTTO"), eMis.getMessage)
  }
}
