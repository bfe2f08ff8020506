package graft

import java.nio.charset.StandardCharsets.ISO_8859_1
import graft.pipeline.{PdfCodec, Type1Font}
import org.scalatest.funsuite.AnyFunSuite

/** Type 1 (/FontFile) glyph-program text extraction ([[Type1Font]] —
  * the fourth and last program format, completing the TrueType / CFF /
  * OpenType matrix; reference Function.java:90-132 gets it from
  * PDFBox): eexec encrypt/decrypt identity, encode→decode round trips
  * over raw, PFB-segmented and hex-form programs, the binary-skipping
  * CharStrings tokenizer, the fail-loud boundary (StandardEncoding,
  * absent glyphs, truncation, corrupt eexec), and the PDF-level path
  * through /FontFile with /Length1/2/3. */
class Type1FontSpec extends AnyFunSuite {

  private val entries = Seq(
    (0x20, 'h'.toInt), (0x21, 'e'.toInt), (0x22, 'l'.toInt), (0x23, 'o'.toInt),
    (0x24, 'α'.toInt), (0x25, '→'.toInt), (0x26, ' '.toInt))
  private def expected(es: Seq[(Int, Int)]): Map[Int, String] =
    es.map { case (c, cp) => c -> new String(Character.toChars(cp)) }.toMap

  test("eexec decrypt(encrypt(x)) is the identity after the lead bytes") {
    val plain = "the quick brown /CharStrings 0 dict".getBytes(ISO_8859_1)
    val lead = Array[Byte](1, 2, 3, 4)
    Seq(55665, 4330).foreach { r0 =>
      val cipher = Type1Font.encrypt(plain, lead, r0)
      val back = Type1Font.decrypt(cipher, 0, cipher.length, r0)
      assert(back.drop(4).sameElements(plain), s"r0=$r0")
    }
  }

  test("encodeProgram → codeToUnicode round trip (raw /Length form)") {
    val (prog, l1, l2, l3) = Type1Font.encodeProgram(entries)
    assert(l1 + l2 + l3 == prog.length, "section lengths must tile the program")
    val map = Type1Font.codeToUnicode(prog, l1, l2, fontNum = 7)
    assert(map == expected(entries))
    // supplementary code points ride the uXXXXX name form
    val supp = entries :+ (0x27, 0x1f600)
    val (p2, a, b, _) = Type1Font.encodeProgram(supp)
    assert(Type1Font.codeToUnicode(p2, a, b, 7)(0x27) ==
      new String(Character.toChars(0x1f600)))
  }

  test("PFB segmented form decodes identically (lengths from the headers)") {
    val pfb = Type1Font.encodeProgramPfb(entries)
    assert((pfb(0) & 0xff) == 0x80 && (pfb(1) & 0xff) == 1)
    // Length1/Length2 args are ignored for PFB — pass zeros
    assert(Type1Font.codeToUnicode(pfb, 0, 0, 7) == expected(entries))
  }

  test("hex-form eexec section decodes identically (spec §7.2 step-1 heuristic)") {
    val (prog, l1, l2, l3) = Type1Font.encodeProgram(entries)
    val hex = new StringBuilder
    (l1 until l1 + l2).foreach { i =>
      hex.append(f"${prog(i) & 0xff}%02x")
      if ((i - l1) % 32 == 31) hex.append('\n')
    }
    val hexed = prog.take(l1) ++ hex.toString.getBytes(ISO_8859_1) ++
      prog.drop(l1 + l2)
    assert(Type1Font.codeToUnicode(hexed, l1, hex.length, 7) == expected(entries))
    // non-hex garbage inside a detected hex section fails loud
    val bad = hexed.clone()
    bad(l1 + 10) = 'z'.toByte
    val e = intercept[IllegalArgumentException] {
      Type1Font.codeToUnicode(bad, l1, hex.length, 7)
    }
    assert(e.getMessage.contains("non-hex"))
  }

  test("first four ciphertext bytes are never all-hex (binary/hex detection)") {
    // the writer varies its lead byte to keep binary sections detectable
    Seq(entries, entries.take(1), entries :+ (0x30, 'Z'.toInt)).foreach { es =>
      val (prog, l1, _, _) = Type1Font.encodeProgram(es)
      val first4 = prog.slice(l1, l1 + 4)
      assert(!first4.forall(b => Character.digit((b & 0xff).toChar, 16) >= 0))
    }
  }

  test("tokenizer: binary runs cannot fake /CharStrings or glyph names") {
    // a Subrs-style RD block whose BYTES spell '/CharStrings 1 dict
    // /fake 1 RD x ND end' — a regex scanner would hallucinate a
    // CharStrings dict from inside the binary; the byte-count skip
    // must sail past it and find the REAL one after
    val fakeBin = "/CharStrings 1 dict /fake 4 RD abcd ND end"
    val plain = ("XXXX" + // the 4 random lead bytes
      s"/Subrs 1 array dup 0 ${fakeBin.length} RD $fakeBin NP\n" +
      "/CharStrings 2 dict dup begin\n" +
      "/uni0041 3 RD \u0001\u0002\u0003 ND\n" +
      "/.notdef 1 RD \u0000 ND\nend\nend\n").getBytes(ISO_8859_1)
    val names = Type1Font.charStringNames(plain, 7)
    assert(names == Set("uni0041", ".notdef"))
  }

  test("fail-loud: StandardEncoding, no encoding, absent glyph, truncation, corrupt eexec") {
    val (prog, l1, l2, _) = Type1Font.encodeProgram(entries)
    val clear = new String(prog, 0, l1, ISO_8859_1)

    // StandardEncoding → nonsymbolic, refused (the CffFont convention)
    val std = clear.replaceAll("""(?s)/Encoding 256 array.*?readonly def""",
      "/Encoding StandardEncoding def")
    val stdProg = std.getBytes(ISO_8859_1) ++ prog.drop(l1)
    val e1 = intercept[IllegalArgumentException] {
      Type1Font.codeToUnicode(stdProg, std.length, l2, 7)
    }
    assert(e1.getMessage.contains("StandardEncoding"))

    // no /Encoding array at all
    val none = clear.replaceAll("""(?s)/Encoding 256 array.*?readonly def""",
      "% no encoding")
    val noneProg = none.getBytes(ISO_8859_1) ++ prog.drop(l1)
    val e2 = intercept[IllegalArgumentException] {
      Type1Font.codeToUnicode(noneProg, none.length, l2, 7)
    }
    assert(e2.getMessage.contains("no builtin /Encoding"))

    // an /Encoding entry naming a glyph the CharStrings don't carry
    val ghost = clear.replace("readonly def",
      "dup 200 /uni4E00 put\nreadonly def")
    val ghostProg = ghost.getBytes(ISO_8859_1) ++ prog.drop(l1)
    val e3 = intercept[IllegalArgumentException] {
      Type1Font.codeToUnicode(ghostProg, ghost.length, l2, 7)
    }
    assert(e3.getMessage.contains("absent from"))

    // /Length1 + /Length2 past EOF
    val e4 = intercept[IllegalArgumentException] {
      Type1Font.codeToUnicode(prog, l1, prog.length, 7)
    }
    assert(e4.getMessage.contains("exceeds"))

    // corrupt ciphertext (flip a byte near the front) → the decrypted
    // stream carries no /CharStrings → loud, never silent garbage
    val corrupt = prog.clone()
    corrupt(l1 + 8) = (corrupt(l1 + 8) ^ 0x55).toByte
    // the decrypted stream is garbage from byte 8 on: whichever guard
    // trips first (no /CharStrings, binary run past end, corrupt digit
    // token, RD spacing) must be THIS module's loud error
    val e5 = intercept[IllegalArgumentException] {
      Type1Font.codeToUnicode(corrupt, l1, l2, 7)
    }
    assert(e5.getMessage.contains("PdfCodec: font 7"))
  }

  test("fail-loud: PFB segment truncation and bad markers") {
    val pfb = Type1Font.encodeProgramPfb(entries)
    val e1 = intercept[IllegalArgumentException] {
      Type1Font.codeToUnicode(pfb.dropRight(3), 0, 0, 7) // into the EOF marker
    }
    assert(e1.getMessage.toLowerCase.contains("pfb"))
    val bad = pfb.clone()
    bad(1) = 9 // segment type 9
    val e2 = intercept[IllegalArgumentException] {
      Type1Font.codeToUnicode(bad, 0, 0, 7)
    }
    assert(e2.getMessage.contains("segment type 9"))
  }

  test("PDF path: /FontFile + /Length1/2/3 extracts byte-code-private text") {
    val pages = Seq("hello αβγ →", "second πλ page")
    val pdf = PdfCodec.encodeFontProgPdf(pages, type1 = true)
    assert(PdfCodec.extractText(pdf) == pages)
    // uncompressed variant too (direct /Length1 reads from the raw dict)
    val pdf2 = PdfCodec.encodeFontProgPdf(pages, compress = false, type1 = true)
    assert(PdfCodec.extractText(pdf2) == pages)
  }

  test("INDIRECT /Length1 and /Length2 resolve through scalar objects") {
    // "9 0 obj 1549 endobj" is the legal §7.3.10 shape for any numeric
    // entry; the sequential scan must capture the scalar body so
    // dictInt can read it (round-17 review: it previously threw
    // "holds no integer" on every conforming indirect length)
    val pages = Seq("hi αβ")
    val pdf = new String(
      PdfCodec.encodeFontProgPdf(pages, compress = false, type1 = true),
      ISO_8859_1)
    val m = """/Length1 (\d+) /Length2 (\d+)""".r.findFirstMatchIn(pdf)
      .getOrElse(fail("no /Length1 /Length2 in the fixture"))
    val patched = pdf.replace(
      s"/Length1 ${m.group(1)} /Length2 ${m.group(2)}",
      "/Length1 90 0 R /Length2 91 0 R")
    val withObjs = patched.replace("xref\n",
      s"90 0 obj ${m.group(1)} endobj\n91 0 obj ${m.group(2)} endobj\nxref\n")
    assert(PdfCodec.extractText(withObjs.getBytes(ISO_8859_1)) == pages)
    // a REAL-valued target must refuse loud — yielding its first digit
    // run as the length would truncate the font program silently
    val real = patched.replace("xref\n",
      s"90 0 obj 3.7 endobj\n91 0 obj ${m.group(2)} endobj\nxref\n")
    assert(intercept[IllegalArgumentException](
      PdfCodec.extractText(real.getBytes(ISO_8859_1)))
      .getMessage.contains("holds no integer"))
  }

  test("four program formats agree page-for-page on the same text") {
    val pages = Seq("graft λμν engine", "τεστ page two")
    val t1 = PdfCodec.extractText(PdfCodec.encodeFontProgPdf(pages, type1 = true))
    val tt = PdfCodec.extractText(PdfCodec.encodeFontProgPdf(pages))
    val cf = PdfCodec.extractText(PdfCodec.encodeFontProgPdf(pages, cff = true))
    val ot = PdfCodec.extractText(PdfCodec.encodeFontProgPdf(pages, otto = true))
    assert(t1 == pages && tt == pages && cf == pages && ot == pages)
  }
}
