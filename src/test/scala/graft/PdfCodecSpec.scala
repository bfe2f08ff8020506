package graft

import graft.pipeline.{PdfCodec, PdfCrypto, PdfPipeline}
import org.apache.spark.sql.functions._

/** PDF text extraction (reference Function.java:90-132, PDFBox per-page
  * getText) against (a) a COMMITTED hand-authored fixture exercising
  * features the writer never emits — TJ arrays with kerning numbers, hex
  * strings, octal escapes, ' next-line show, T*, nested parens, an
  * indirect /Length, an UNcompressed stream, out-of-order object
  * numbering — and (b) encode→extract round trips over adversarial
  * text. The fixture is an independent test vector: decoder bugs can't
  * hide behind encoder symmetry. */
class PdfCodecSpec extends SparkSpec {

  private def fixtureBytes: Array[Byte] = {
    val in = getClass.getResourceAsStream("/graft-fixture.pdf")
    assert(in != null, "committed fixture /graft-fixture.pdf missing from test resources")
    try in.readAllBytes() finally in.close()
  }

  test("fixture: page order from the Kids tree, both filters, all text ops") {
    val pages = PdfCodec.extractText(fixtureBytes)
    assert(pages.length == 2)
    assert(pages(0) ==
      "Hello, world\nTab\there (and) octal: AB\ncontinued (nested) run")
    assert(pages(1) == "second page first line\nsecond line")
  }

  test("round trip: encode → extract is lossless, compressed and not") {
    val pages = Seq(
      "plain ascii text over one page",
      "escapes: back\\slash (parens) and\nnewline\ttab",
      "latin-1 bytes: café naïve ÿ")
    for (compress <- Seq(true, false)) {
      val pdf = PdfCodec.encodePdf(pages, compress)
      assert(new String(pdf.take(5), "ISO-8859-1") == "%PDF-")
      assert(PdfCodec.extractText(pdf) == pages, s"compress=$compress")
    }
  }

  test("empty document and empty page") {
    assert(PdfCodec.extractText(PdfCodec.encodePdf(Seq.empty)) == Seq.empty)
    assert(PdfCodec.extractText(PdfCodec.encodePdf(Seq(""))) == Seq(""))
  }

  test("string decode corners: octal, continuation, raw EOL, odd hex") {
    assert(PdfCodec.decodeLiteral("\\101\\102\\103") == "ABC")
    assert(PdfCodec.decodeLiteral("one\\\ntwo") == "onetwo") // backslash-EOL continuation
    assert(PdfCodec.decodeLiteral("a\rb\r\nc") == "a\nb\nc") // raw EOL → \n
    assert(PdfCodec.decodeLiteral("\\q") == "q")             // lone escape drops backslash
    assert(PdfCodec.decodeHex("4 86 56C 6C6F") == "Hello")   // whitespace ignored
    assert(PdfCodec.decodeHex("7") == "p")                   // odd length pads 0
  }

  test("non-Latin-1 text refused at encode (simple-font scope)") {
    val e = intercept[IllegalArgumentException](PdfCodec.encodePdf(Seq("世界")))
    assert(e.getMessage.contains("non-Latin-1"))
  }

  test("unsupported filter fails loud, not garbage") {
    val pdf = new String(PdfCodec.encodePdf(Seq("x"), compress = true), "ISO-8859-1")
    val broken = pdf.replace("/FlateDecode", "/DCTDecode")
    val e = intercept[IllegalArgumentException](
      PdfCodec.extractText(broken.getBytes("ISO-8859-1")))
    assert(e.getMessage.contains("DCTDecode"))
  }

  // ── stream filter chains ───────────────────────────────────────────

  /** Test-side ASCII85 encoder (spec §7.4.3) — 4 bytes → 5 chars, short
    * final group, no 'z' shortcut; exercises the decoder. */
  private def a85enc(data: Array[Byte]): String = {
    val sb = new StringBuilder
    data.grouped(4).foreach { g =>
      var t = 0L
      (0 until 4).foreach(i => t = (t << 8) | (if (i < g.length) g(i) & 0xffL else 0L))
      val cs = new Array[Char](5)
      var v = t
      (4 to 0 by -1).foreach { i => cs(i) = ('!' + (v % 85).toInt).toChar; v /= 85 }
      sb.appendAll(cs, 0, g.length + 1)
    }
    sb.append("~>").toString
  }

  /** Test-side LZW encoder: all-literal codes with the same
    * early-change width schedule the decoder uses — legal, suboptimal. */
  private def lzwEnc(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0; var width = 9; var dictSize = 258
    def emit(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code; bitCnt += width
      while (bitCnt >= 8) { out.write(((bitBuf >> (bitCnt - 8)) & 0xff).toInt); bitCnt -= 8 }
    }
    emit(256)
    var first = true
    data.foreach { b =>
      emit(b & 0xff)
      // the decoder adds one dict entry per code AFTER the first
      if (first) first = false else dictSize += 1
      if (dictSize + 1 >= (1 << width) && width < 12) width += 1
    }
    emit(257)
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    out.toByteArray
  }

  test("ASCIIHex / ASCII85 / LZW filters round-trip, incl. width bumps and short groups") {
    val payloads = Seq(
      "hello world".getBytes("ISO-8859-1"),
      Array.tabulate(700)(i => (i % 251).toByte), // LZW width 9→10 bump
      Array[Byte](0, 0, 0, 0, 1),                 // a85 short final group
      Array.emptyByteArray)
    payloads.foreach { p =>
      assert(PdfCodec.asciiHexDecode(
        (p.map(b => f"${b & 0xff}%02x").mkString + ">").getBytes("ISO-8859-1")).sameElements(p))
      assert(PdfCodec.ascii85Decode(a85enc(p).getBytes("ISO-8859-1")).sameElements(p), p.length)
      assert(PdfCodec.lzwDecode(lzwEnc(p)).sameElements(p), p.length)
    }
    // 'z' shorthand for four zero bytes
    assert(PdfCodec.ascii85Decode("z~>".getBytes("ISO-8859-1")).sameElements(Array[Byte](0, 0, 0, 0)))
  }

  test("RunLengthDecode: hand fixture, round trip, fail-loud corners, writer chain") {
    // §7.4.5 hand fixture: literal(3: a b c), repeat(4 x 'z'), literal(1: Q), EOD
    val hand = Array[Byte](2, 'a'.toByte, 'b'.toByte, 'c'.toByte,
      (257 - 4).toByte, 'z'.toByte, 0, 'Q'.toByte, 128.toByte)
    assert(new String(PdfCodec.runLengthDecode(hand), "ISO-8859-1") == "abczzzzQ")
    // round trips across shapes incl. long runs and 128+ literals
    val payloads = Seq(
      "hello world".getBytes("ISO-8859-1"),
      Array.fill[Byte](300)(7),                    // repeat runs > 128
      Array.tabulate(400)(i => (i % 251).toByte),  // literal runs > 128
      Array.emptyByteArray)
    payloads.foreach { p =>
      assert(PdfCodec.runLengthDecode(PdfCodec.runLengthEncode(p)).sameElements(p), p.length)
    }
    // fail-loud: missing EOD, literal overrun
    assert(intercept[IllegalArgumentException](PdfCodec.runLengthDecode(
      Array[Byte](2, 'a'.toByte, 'b'.toByte, 'c'.toByte))).getMessage.contains("EOD"))
    assert(intercept[IllegalArgumentException](PdfCodec.runLengthDecode(
      Array[Byte](5, 'a'.toByte, 'b'.toByte, 128.toByte))).getMessage.contains("overruns"))
    // bytes after EOD are TOLERATED (spec only requires stopping at EOD;
    // wild PDFs pad after it) — decode stops at the terminator
    assert(new String(PdfCodec.runLengthDecode(
      Array[Byte](0, 'a'.toByte, 128.toByte, 'x'.toByte)), "ISO-8859-1") == "a")
    // writer chain: runLength over Flate declares [ /RunLengthDecode
    // /FlateDecode ] and extracts losslessly; uncompressed runLength too
    val text = "run length chained page"
    val viaChain = PdfCodec.encodePdf(Seq(text), compress = true, runLength = true)
    assert(new String(viaChain, "ISO-8859-1")
      .contains("/Filter [ /RunLengthDecode /FlateDecode ]"))
    assert(PdfCodec.extractText(viaChain) == Seq(text))
    val viaPlain = PdfCodec.encodePdf(Seq(text), compress = false, runLength = true)
    assert(new String(viaPlain, "ISO-8859-1").contains("/Filter /RunLengthDecode"))
    assert(PdfCodec.extractText(viaPlain) == Seq(text))
  }

  test("filter CHAIN [/ASCII85Decode /FlateDecode] decodes left to right") {
    // take a clean 1-page PDF, re-wrap its compressed content stream in
    // ASCII85, and declare the chain — a reader that honors only the
    // first array entry mis-decodes this file
    val text = "chained filters page"
    val plain = new String(PdfCodec.encodePdf(Seq(text), compress = true), "ISO-8859-1")
    val m = """<< /Length (\d+) /Filter /FlateDecode >>\nstream\n""".r.findFirstMatchIn(plain).get
    val len = m.group(1).toInt
    val start = m.end
    val deflated = plain.substring(start, start + len).getBytes("ISO-8859-1")
    val wrapped = a85enc(deflated)
    val rebuilt = plain.substring(0, m.start) +
      s"<< /Length ${wrapped.length} /Filter [ /ASCII85Decode /FlateDecode ] >>\nstream\n" +
      wrapped + plain.substring(start + len)
    assert(PdfCodec.extractText(rebuilt.getBytes("ISO-8859-1")) == Seq(text))
  }

  test("Form XObject text extracts through Do (the LaTeX/Quartz page-wrapping layout)") {
    // page content is just `q /Fm0 Do Q`; the text lives in the form's
    // own stream with its own resources — a reader ignoring Do returns
    // an empty page
    val form = "BT /F1 12 Tf 72 720 Td (form body text) Tj ET"
    val page = "q /Fm0 Do Q BT /F1 12 Tf (after form) Tj ET"
    val pdf =
      s"""%PDF-1.4
         |1 0 obj
         |<< /Type /Catalog /Pages 2 0 R >>
         |endobj
         |2 0 obj
         |<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>
         |endobj
         |3 0 obj
         |<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 6 0 R >> /XObject << /Fm0 5 0 R >> >> /Contents 4 0 R >>
         |endobj
         |4 0 obj
         |<< /Length ${page.length} >>
         |stream
         |$page
         |endstream
         |endobj
         |5 0 obj
         |<< /Subtype /Form /Resources << /Font << /F1 6 0 R >> >> /Length ${form.length} >>
         |stream
         |$form
         |endstream
         |endobj
         |6 0 obj
         |<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>
         |endobj
         |trailer
         |<< /Root 1 0 R >>
         |""".stripMargin
    assert(PdfCodec.extractText(pdf.getBytes("ISO-8859-1")) ==
      Seq("form body textafter form"))
  }

  test("cyclic Form XObjects fail loud at the depth cap, no infinite recursion") {
    val form = "q /Fm0 Do Q" // the form invokes ITSELF
    val pdf =
      s"""%PDF-1.4
         |1 0 obj
         |<< /Type /Catalog /Pages 2 0 R >>
         |endobj
         |2 0 obj
         |<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>
         |endobj
         |3 0 obj
         |<< /Type /Page /Parent 2 0 R /Resources << /XObject << /Fm0 5 0 R >> >> /Contents 4 0 R >>
         |endobj
         |4 0 obj
         |<< /Length ${form.length} >>
         |stream
         |$form
         |endstream
         |endobj
         |5 0 obj
         |<< /Subtype /Form /Length ${form.length} >>
         |stream
         |$form
         |endstream
         |endobj
         |trailer
         |<< /Root 1 0 R >>
         |""".stripMargin
    val e = intercept[IllegalArgumentException](
      PdfCodec.extractText(pdf.getBytes("ISO-8859-1")))
    assert(e.getMessage.contains("depth"), e.getMessage)
  }

  test("inline image BI..ID..EI is skipped, surrounding text survives") {
    // binary payload contains parens, backslashes, and a bare 'E' —
    // tokenizing it would corrupt the scan
    val img = "BI /W 4 /H 2 /BPC 8 /CS /DeviceGray ID  (\\ÿE I EI"
    val content = s"BT (before ) Tj ET $img BT (after) Tj ET"
    assert(PdfCodec.extractFromContent(content) == "before after")
  }

  test("inline image: 'ID' inside a BI dict value is not the ID operator") {
    // the two bytes I-D appear standalone inside a string value and as a
    // suffix of a name — a substring search would start the payload scan
    // inside the dict; only the standalone keyword token counts
    val img = "BI /W 4 /XID (fake ID here) /DP << /Predictor 1 >> ID  xÿy EI"
    val content = s"BT (before ) Tj ET $img BT (after) Tj ET"
    assert(PdfCodec.extractFromContent(content) == "before after")
    // and a BI with no real ID still fails loud, not hang
    val bad = "BT (t) Tj ET BI /W 4 /XID (fake ID here)"
    val e = intercept[IllegalArgumentException](PdfCodec.extractFromContent(bad))
    assert(e.getMessage.contains("BI without ID"))
  }

  test("broken /Encrypt reference fails loud; benign text mention is fine") {
    val pdf = new String(PdfCodec.encodePdf(Seq("x")), "ISO-8859-1")
    val broken = pdf.replace("trailer\n<< /Size", "trailer\n<< /Encrypt 9 0 R /Size")
    val e = intercept[IllegalArgumentException](
      PdfCodec.extractText(broken.getBytes("ISO-8859-1")))
    assert(e.getMessage.contains("Encrypt"), e.getMessage)
    // a document whose page TEXT mentions the token is NOT rejected
    val benign = PdfCodec.encodePdf(Seq("the /Encrypt entry is documented here"))
    assert(PdfCodec.extractText(benign).head.contains("/Encrypt"))
  }

  test("simple-font /Encoding /Differences: glyph-name remap, Latin-1 base survives") {
    val pdf = new String(PdfCodec.encodePdf(Seq("ABa bc"), compress = true), "ISO-8859-1")
    val enc = "/Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
      "/Encoding << /Differences [ 65 /Euro /bullet 97 /adieresis /uni0042 ] >>"
    val patched = pdf.replace(
      "/Type /Font /Subtype /Type1 /BaseFont /Helvetica", enc)
    // 65 'A'→€, 66 'B'→• (name list advances the code), 97 'a'→ä,
    // 98 'b'→B (uniXXXX form); unlisted codes keep the Latin-1 base
    assert(PdfCodec.extractText(patched.getBytes("ISO-8859-1")) == Seq("€•ä Bc"))
    // an /Encoding that is only a base-encoding NAME keeps the simple scope
    val named = pdf.replace("/BaseFont /Helvetica",
      "/BaseFont /Helvetica /Encoding /WinAnsiEncoding")
    assert(PdfCodec.extractText(named.getBytes("ISO-8859-1")) == Seq("ABa bc"))
    // unknown glyph names fail loud with the name, never silent garbage
    val bad = pdf.replace("/Type /Font /Subtype /Type1 /BaseFont /Helvetica",
      "/Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
        "/Encoding << /Differences [ 65 /notarealglyph ] >>")
    val e = intercept[IllegalArgumentException](
      PdfCodec.extractText(bad.getBytes("ISO-8859-1")))
    assert(e.getMessage.contains("notarealglyph"), e.getMessage)
    // .notdef maps to empty, single-letter and digit names to themselves
    assert(PdfCodec.glyphToUnicode(".notdef", -1) == "")
    assert(PdfCodec.glyphToUnicode("Q", -1) == "Q")
    assert(PdfCodec.glyphToUnicode("u1F600", -1) == new String(Character.toChars(0x1F600)))
  }

  // ── standard security handler (spec §7.6) ─────────────────────────

  test("encrypted PDFs with an empty user password decode transparently") {
    val pages = Seq("secret page one", "page (two) \\ with specials",
      "a third page to give the cipher some length " * 3)
    for (mode <- Seq("rc4-40", "rc4-128", "aes-128", "aes-256")) {
      val pdf = PdfCodec.encodePdf(pages, compress = true,
        encryption = Some(PdfCrypto.EncryptSpec(mode)))
      val s = new String(pdf, "ISO-8859-1")
      assert(s.contains("/Encrypt") && s.contains("/O <") && s.contains("/U <"), mode)
      assert(PdfCodec.extractText(pdf) == pages, mode)
      // decryption is genuinely required: dropping the /Encrypt ref makes
      // the ciphertext hit the Flate decoder raw and fail
      val stripped = s.replaceFirst("""/Encrypt \d+ 0 R """, "")
      intercept[Exception](PdfCodec.extractText(stripped.getBytes("ISO-8859-1")))
    }
    // uncompressed + encrypted also round-trips (cipher over raw bytes)
    val pdfU = PdfCodec.encodePdf(pages, compress = false,
      encryption = Some(PdfCrypto.EncryptSpec("aes-128")))
    assert(PdfCodec.extractText(pdfU) == pages)
  }

  test("a real (non-empty) user password fails loud with the real reason") {
    for (mode <- Seq("rc4-40", "rc4-128", "aes-128", "aes-256")) {
      val pdf = PdfCodec.encodePdf(Seq("locked"), compress = true,
        encryption = Some(PdfCrypto.EncryptSpec(mode, userPw = "hunter2")))
      val e = intercept[IllegalArgumentException](PdfCodec.extractText(pdf))
      assert(e.getMessage.contains("password"), s"$mode: ${e.getMessage}")
    }
  }

  test("AES-256 (V5/R6): PDF 1.5 layout, R5 rejects, missing /UE//Perms and tampering fail loud") {
    val pages = Seq("pdf two point oh", "hardened 2.B keying " * 4)
    // the 1.5 layout (encrypted ObjStm + xref-stream trailer) under V5
    val pdf15 = PdfCodec.encodePdf15(pages, compress = true,
      encryption = Some(PdfCrypto.EncryptSpec("aes-256")))
    assert(PdfCodec.extractText(pdf15) == pages)
    val s = new String(PdfCodec.encodePdf(pages, compress = true,
      encryption = Some(PdfCrypto.EncryptSpec("aes-256"))), "ISO-8859-1")
    assert(s.contains("/V 5 /R 6") && s.contains("/AESV3") &&
      s.contains("/OE <") && s.contains("/UE <") && s.contains("/Perms <"))
    // interim R5 (unhardened SHA-256, deprecated by ISO 32000-2) rejects
    val r5 = s.replace("/V 5 /R 6", "/V 5 /R 5")
    val eR5 = intercept[IllegalArgumentException](
      PdfCodec.extractText(r5.getBytes("ISO-8859-1")))
    assert(eR5.getMessage.contains("R 6"), eR5.getMessage)
    // /UE is where the file key lives — its absence is loud, not garbage
    val noUe = s.replaceFirst("""/UE <[0-9A-F]+>""", "")
    val eUe = intercept[IllegalArgumentException](
      PdfCodec.extractText(noUe.getBytes("ISO-8859-1")))
    assert(eUe.getMessage.contains("/UE"), eUe.getMessage)
    // /Perms is required at V5 and must validate under the recovered key
    val noPerms = s.replaceFirst("""/Perms <[0-9A-F]+>""", "")
    val ePerms = intercept[IllegalArgumentException](
      PdfCodec.extractText(noPerms.getBytes("ISO-8859-1")))
    assert(ePerms.getMessage.contains("/Perms"), ePerms.getMessage)
    val permsHex = """/Perms <([0-9A-F]+)>""".r.findFirstMatchIn(s).get.group(1)
    val flipped = f"${Integer.parseInt(permsHex.take(2), 16) ^ 0xff}%02X" +
      permsHex.drop(2)
    val tampered = s.replace(s"/Perms <$permsHex>", s"/Perms <$flipped>")
    val eTamper = intercept[IllegalArgumentException](
      PdfCodec.extractText(tampered.getBytes("ISO-8859-1")))
    assert(eTamper.getMessage.contains("Perms"), eTamper.getMessage)
    // a dict P contradicting the sealed /Perms P is tampering too
    val badP = s.replace("/P -4 ", "/P -44 ")
    val eP = intercept[IllegalArgumentException](
      PdfCodec.extractText(badP.getBytes("ISO-8859-1")))
    assert(eP.getMessage.contains("contradicts"), eP.getMessage)
    // bytes 4-7 must be 0xFF and byte 8 exactly 'T'/'F' (ISO 32000-2
    // §7.6.4.4.12): rebuild the blob under the KNOWN fixture key with a
    // targeted corruption that keeps 'adb' and P intact, so only the
    // tighter seal can catch it
    val fk = java.security.MessageDigest.getInstance("SHA-256")
      .digest("graft-aes256-filekey".getBytes("ISO-8859-1"))
    def sealPerms(mut: Array[Byte] => Unit): String = {
      val c = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
      c.init(javax.crypto.Cipher.DECRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(fk, "AES"))
      val plain = c.doFinal(permsHex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
      mut(plain)
      val e = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
      e.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(fk, "AES"))
      e.doFinal(plain).map(b => f"${b & 0xff}%02X").mkString
    }
    val zeroByte8 = s.replace(s"/Perms <$permsHex>",
      s"/Perms <${sealPerms(_(8) = 0)}>")
    val e8 = intercept[IllegalArgumentException](
      PdfCodec.extractText(zeroByte8.getBytes("ISO-8859-1")))
    assert(e8.getMessage.contains("neither 'T' nor 'F'"), e8.getMessage)
    val zeroByte5 = s.replace(s"/Perms <$permsHex>",
      s"/Perms <${sealPerms(_(5) = 0)}>")
    val e5 = intercept[IllegalArgumentException](
      PdfCodec.extractText(zeroByte5.getBytes("ISO-8859-1")))
    assert(e5.getMessage.contains("not 0xFF"), e5.getMessage)
  }

  test("hash2B matches its spec shape: ≥64 rounds, owner hash binds the /U vector") {
    // the OWNER validation hash includes the 48-byte /U value — swapping
    // it must change the verdict (catches a user/owner path mix-up)
    val spec = PdfCrypto.EncryptSpec("aes-256", ownerPw = "owner-secret")
    val pdf = PdfCodec.encodePdf(Seq("owner door"), compress = true,
      encryption = Some(spec))
    // empty USER password opens (the file's user pw is empty)...
    assert(PdfCodec.extractText(pdf) == Seq("owner door"))
    // ...and the spec's own verify finds the same 32-byte key both ways
    val viaUser = PdfCrypto.verifyV5("", spec.o, spec.u,
      spec.dict.split("/OE <")(1).takeWhile(_ != '>').grouped(2)
        .map(Integer.parseInt(_, 16).toByte).toArray,
      spec.dict.split("/UE <")(1).takeWhile(_ != '>').grouped(2)
        .map(Integer.parseInt(_, 16).toByte).toArray)
    assert(viaUser.exists(_.sameElements(spec.key)), "user path lost the file key")
  }

  test("Differences names with #-escapes/digits don't corrupt the code counter; unknown names fail lazily") {
    val pdf = new String(PdfCodec.encodePdf(Seq("Bc"), compress = true), "ISO-8859-1")
    // /g3 is a real-world subset glyph name: its digit must NOT reset the
    // code counter (a char-class regex would split it), so /Euro still
    // lands at code 66 'B'; /g3 itself sits at 65, which is never shown —
    // lazy resolution keeps the document extractable
    val patched = pdf.replace("/Type /Font /Subtype /Type1 /BaseFont /Helvetica",
      "/Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
        "/Encoding << /Differences [ 65 /g3 /Euro ] >>")
    assert(PdfCodec.extractText(patched.getBytes("ISO-8859-1")) == Seq("€c"))
    // #xx name escapes decode per §7.3.5: /Eur#6f == /Euro
    val esc = pdf.replace("/Type /Font /Subtype /Type1 /BaseFont /Helvetica",
      "/Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
        "/Encoding << /Differences [ 66 /Eur#6f ] >>")
    assert(PdfCodec.extractText(esc.getBytes("ISO-8859-1")) == Seq("€c"))
    // the unknown name DOES fail loud when its code is actually shown
    val shown = pdf.replace("/Type /Font /Subtype /Type1 /BaseFont /Helvetica",
      "/Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
        "/Encoding << /Differences [ 66 /g3 ] >>")
    val e = intercept[IllegalArgumentException](
      PdfCodec.extractText(shown.getBytes("ISO-8859-1")))
    assert(e.getMessage.contains("g3"), e.getMessage)
  }

  test("EncryptMetadata false derives the 0xFFFFFFFF-salted key (R4)") {
    val pages = Seq("metadata-unencrypted variant")
    val pdf = PdfCodec.encodePdf(pages, compress = true,
      encryption = Some(PdfCrypto.EncryptSpec("aes-128", encryptMetadata = false)))
    assert(new String(pdf, "ISO-8859-1").contains("/EncryptMetadata false"))
    assert(PdfCodec.extractText(pdf) == pages)
  }

  test("V4 dict quirks: nested CF /Length ignored, omitted top-level /Length, literal-form /ID") {
    val pages = Seq("robust encrypt-dict parsing")
    val pdf = new String(PdfCodec.encodePdf(pages, compress = true,
      encryption = Some(PdfCrypto.EncryptSpec("aes-128"))), "ISO-8859-1")
    // a V4 dict may legally omit the top-level /Length (the CF governs);
    // a flat regex would then pick the NESTED /Length 16 (bytes) — the
    // top-level scan plus the AESV2-is-128-bit rule must survive this
    val noLen = pdf.replace("/V 4 /R 4 /Length 128", "/V 4 /R 4")
    assert(PdfCodec.extractText(noLen.getBytes("ISO-8859-1")) == pages)
    // /ID in literal-string form (legal byte-string syntax) must feed the
    // same key salt as the hex form
    val idHex = """/ID \[ <([0-9A-Fa-f]+)>""".r.findFirstMatchIn(pdf).get.group(1)
    val idBytes = idHex.grouped(2).map(h => Integer.parseInt(h, 16).toChar).mkString
    val lit = "(" + idBytes.flatMap {
      case c @ ('(' | ')' | '\\') => "\\" + c
      case '\r' => "\\r"
      case '\n' => "\\n"
      case c => c.toString
    } + ")"
    val idLit = pdf.replace(s"/ID [ <$idHex> <$idHex> ]", s"/ID [ $lit $lit ]")
    assert(idLit != pdf, "trailer /ID patch did not apply")
    assert(PdfCodec.extractText(idLit.getBytes("ISO-8859-1")) == pages)
  }

  test("encrypted PDF 1.5: encrypted ObjStm + /Encrypt in the xref-stream dict") {
    val pages = Seq("modern encrypted page one", "page (two) with \\ specials")
    for (mode <- Seq("rc4-40", "rc4-128", "aes-128")) {
      val pdf = PdfCodec.encodePdf15(pages, compress = true,
        encryption = Some(PdfCrypto.EncryptSpec(mode)))
      val s = new String(pdf, "ISO-8859-1")
      // 1.5 layout: no classic trailer — /Encrypt and /ID ride the xref
      // stream's dict, and the catalog hides inside the ENCRYPTED ObjStm
      assert(!s.contains("trailer"), mode)
      assert(s.contains("/Encrypt") && s.contains("/ID"), mode)
      assert(!s.contains("/Catalog"), mode)
      assert(PdfCodec.extractText(pdf) == pages, mode)
    }
    // the full modern stack at once: predictor-coded AND encrypted
    val both = PdfCodec.encodePdf15(pages, compress = true, predictor = 12,
      encryption = Some(PdfCrypto.EncryptSpec("aes-128")))
    assert(PdfCodec.extractText(both) == pages)
    // decryption is load-bearing: strip the xref dict's /Encrypt ref and
    // the ObjStm ciphertext hits the Flate decoder raw
    val stripped = new String(both, "ISO-8859-1").replaceFirst("/Encrypt \\d+ 0 R ", "")
    intercept[Exception](PdfCodec.extractText(stripped.getBytes("ISO-8859-1")))
  }

  test("V4 /CFM /V2 with /CF /Length 40 reads as BITS (5-byte key), not bytes") {
    // a spec-legal writer stores 40 (bits = a 5-byte RC4 key) inside
    // /CF; reading it as bytes would derive a 16-byte key (MD5-capped)
    // and reject the valid file — the PDFBox disambiguation: 40 bytes
    // would be an illegal 320-bit RC4 key, so bits is the only reading
    val pages = Seq("v4 rc4-40 crypt filter page")
    val pdf = PdfCodec.encodePdf(pages, compress = true,
      encryption = Some(PdfCrypto.EncryptSpec("rc4-40-v4")))
    val s = new String(pdf, "ISO-8859-1")
    assert(s.contains("/CFM /V2") && s.contains("/Length 40"), s.take(2000))
    assert(PdfCodec.extractText(pdf) == pages)
  }

  test("encrypted 1.5 file with the xref dict beyond the 4096-byte tail still finds /ID") {
    // a large trailing increment pushes the xref-stream dict (which
    // holds BOTH /Encrypt and /ID — there is no classic trailer) outside
    // the tail window; /ID must then come from that same dict, or the
    // file key derives with an empty salt and a valid file is rejected
    val pages = Seq("deep xref dict page")
    for (mode <- Seq("rc4-128", "aes-128")) {
      val pdf = PdfCodec.encodePdf15(pages, compress = true,
        encryption = Some(PdfCrypto.EncryptSpec(mode)))
      val junk = ("% trailing incremental-update padding line\n" * 150).getBytes("ISO-8859-1")
      assert(junk.length > 4096)
      val padded = pdf ++ junk
      assert(PdfCodec.extractText(padded) == pages, mode)
    }
  }

  test("incremental update that REMOVES encryption: stale /Encrypt in superseded dicts ignored") {
    // scenario (ADVICE r11): an old revision's xref dict carries
    // /Encrypt, a later update decrypted the file and appended a trailer
    // WITHOUT it. The live trailer is the newest — resolving the stale
    // /Encrypt would treat a now-plaintext file as encrypted and either
    // throw or feed ciphertext keys to plaintext streams.
    val pages = Seq("plaintext after decryption update")
    // 1.5 layout: the live xref dict (with /Root, no /Encrypt) is LAST in
    // file order; plant a superseded xref dict with a stale /Encrypt ref
    // ahead of it (object number far above any real one — never parsed
    // as the trailer once staleness is handled right)
    val pdf15 = new String(PdfCodec.encodePdf15(pages, compress = true), "ISO-8859-1")
    assert(!pdf15.contains("/Encrypt"))
    val staleObj = "90 0 obj\n<< /Type /XRef /Size 91 /Root 1 0 R /Encrypt 91 0 R " +
      "/W [1 2 1] /Length 0 >>\nstream\n\nendstream\nendobj\n"
    val hdrEnd = pdf15.indexOf("\n", pdf15.indexOf("%PDF")) + 1
    // place after the binary-marker comment line so the header stays intact
    val insertAt = pdf15.indexOf("\n", hdrEnd) + 1
    val doctored15 = pdf15.substring(0, insertAt) + staleObj + pdf15.substring(insertAt)
    assert(PdfCodec.extractText(doctored15.getBytes("ISO-8859-1")) == pages,
      "stale /Encrypt from a superseded xref dict was resolved")
    // classic layout: two trailers inside the tail window, the OLDER one
    // carrying the stale /Encrypt — only the newest trailer is live
    val classic = new String(PdfCodec.encodePdf(pages, compress = true), "ISO-8859-1")
    val t = classic.lastIndexOf("trailer")
    val staleTrailer = "trailer\n<< /Size 90 /Root 1 0 R /Encrypt 91 0 R >>\nstartxref\n0\n%%EOF\n"
    val doctored = classic.substring(0, t) + staleTrailer + classic.substring(t)
    assert(PdfCodec.extractText(doctored.getBytes("ISO-8859-1")) == pages,
      "stale /Encrypt from a superseded classic trailer was resolved")
  }

  test("trailer arbitration is by PARSER offset: dict text echoed later can't flip the winner") {
    // scenario (ADVICE r12): the classic-vs-xref arbitration asks which
    // revision sits LATER in the file. Re-finding the xref dict by its
    // TEXT (lastIndexOf) mis-positions it when the same text also occurs
    // after the classic trailer — e.g. echoed in a comment or string by
    // a sloppy writer — and the stale xref /Encrypt then beats a newer
    // classic trailer that legitimately removed encryption. The byte
    // offset carried from the parser is immune.
    val pages = Seq("decrypted by the final classic update")
    val pdf15 = new String(PdfCodec.encodePdf15(pages, compress = true), "ISO-8859-1")
    // revision 2: a superseded xref dict carrying a stale /Encrypt (the
    // newest TRAILER-BEARING /XRef dict — it must win any xref-only scan)
    val staleDict = "<< /Type /XRef /Size 91 /Root 1 0 R /Encrypt 91 0 R " +
      "/W [1 2 1] /Length 0 >>"
    val staleObj = s"90 0 obj\n$staleDict\nstream\n\nendstream\nendobj\n"
    // revision 3 (live): a classic trailer WITHOUT /Encrypt — encryption
    // removed; then the stale dict's text echoed once more after it
    val classicUpdate = "trailer\n<< /Size 92 /Root 1 0 R >>\nstartxref\n0\n%%EOF\n"
    val echo = s"% writer log: replaced $staleDict\n"
    val doctored = pdf15 + staleObj + classicUpdate + echo
    // offset arbitration: stale obj (rev 2) < classic trailer (rev 3) →
    // the classic trailer is live, no /Encrypt resolves, text extracts.
    // The lastIndexOf arbitration would position rev 2 at the echo —
    // AFTER the classic trailer — and die resolving /Encrypt 91 0 R.
    assert(PdfCodec.extractText(doctored.getBytes("ISO-8859-1")) == pages,
      "echoed xref-dict text flipped the trailer arbitration")
  }

  test("hybrid trailer (/XRefStm) without /Encrypt still decrypts via its revision's xref dict") {
    // non-conforming-but-seen hybrid: the classic trailer carries
    // /XRefStm and /Root but parks /Encrypt only in the xref stream
    // dict of the SAME revision — the /XRefStm marker licenses the
    // fallback; without it a missing /Encrypt means encryption was
    // genuinely removed and no stale dict may be consulted
    val pages = Seq("hybrid encrypted page")
    val pdf = new String(PdfCodec.encodePdf15(pages, compress = true,
      encryption = Some(PdfCrypto.EncryptSpec("aes-128"))), "ISO-8859-1")
    val hybridTrailer =
      "trailer\n<< /Size 99 /Root 1 0 R /XRefStm 17 >>\nstartxref\n0\n%%EOF\n"
    assert(PdfCodec.extractText((pdf + hybridTrailer).getBytes("ISO-8859-1")) == pages,
      "hybrid trailer should fall back to its revision's xref-dict /Encrypt")
    // the SAME layout without /XRefStm reads as encryption-removed: the
    // ciphertext then fails loud downstream, never decrypts via a stale dict
    val plainTrailer = "trailer\n<< /Size 99 /Root 1 0 R >>\nstartxref\n0\n%%EOF\n"
    intercept[Exception](
      PdfCodec.extractText((pdf + plainTrailer).getBytes("ISO-8859-1")))
  }

  test("differences writer refuses remaps that would corrupt existing text") {
    // the text already contains É (0xC9 = 201) — remapping 'e' onto that
    // byte would route the original É through /Euro on decode
    val e = intercept[IllegalArgumentException](
      PdfCodec.encodePdf(Seq("cafÉ menu"), differences = Seq(('e', 201, "Euro"))))
    assert(e.getMessage.contains("corrupt"), e.getMessage)
    // duplicate codes and duplicate source chars are refused
    val e2 = intercept[IllegalArgumentException](
      PdfCodec.encodePdf(Seq("x"), differences = Seq(('a', 200, "Euro"), ('b', 200, "bullet"))))
    assert(e2.getMessage.contains("duplicate"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](
      PdfCodec.encodePdf(Seq("x"), differences = Seq(('a', 200, "Euro"), ('a', 201, "bullet"))))
    assert(e3.getMessage.contains("duplicate"), e3.getMessage)
  }

  test("AES stream of only an IV (no padded payload) fails loud, not NoSuchElement") {
    val dec = new graft.pipeline.PdfCrypto.Decryptor(Array.fill(16)(7.toByte), aes = true)
    val e = intercept[IllegalArgumentException](dec.decrypt(5, 0, new Array[Byte](16)))
    assert(e.getMessage.contains("AES stream length"), e.getMessage)
  }

  test("unsupported security handlers and versions fail loud") {
    val pdf = new String(PdfCodec.encodePdf(Seq("x"), compress = true,
      encryption = Some(PdfCrypto.EncryptSpec("rc4-128"))), "ISO-8859-1")
    val pub = pdf.replace("/Filter /Standard", "/Filter /Adobe.PubSec")
    val e = intercept[IllegalArgumentException](
      PdfCodec.extractText(pub.getBytes("ISO-8859-1")))
    assert(e.getMessage.contains("Standard"), e.getMessage)
    val v5 = pdf.replace("/V 2 /R 3", "/V 5 /R 6")
    val e2 = intercept[IllegalArgumentException](
      PdfCodec.extractText(v5.getBytes("ISO-8859-1")))
    assert(e2.getMessage.contains("/V 5"), e2.getMessage)
  }

  test("out-of-scope predictors still fail loud (value 5, sub-byte depth)") {
    val pdf = new String(PdfCodec.encodePdf(Seq("x"), compress = true), "ISO-8859-1")
    // 3-9 are not assigned by the spec's table 10
    val e = intercept[IllegalArgumentException](
      PdfCodec.extractText(pdf.replace("/Filter /FlateDecode",
        "/Filter /FlateDecode /DecodeParms << /Predictor 5 /Columns 4 >>")
        .getBytes("ISO-8859-1")))
    assert(e.getMessage.contains("Predictor"), e.getMessage)
    // sub-byte component depths are out of decoder scope — loud, not shifted garbage
    val e2 = intercept[IllegalArgumentException](
      PdfCodec.extractText(pdf.replace("/Filter /FlateDecode",
        "/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 4 /BitsPerComponent 4 >>")
        .getBytes("ISO-8859-1")))
    assert(e2.getMessage.contains("BitsPerComponent"), e2.getMessage)
    // data that is not a whole number of predictor rows: loud
    val e3 = intercept[IllegalArgumentException](
      PdfCodec.extractText(pdf.replace("/Filter /FlateDecode",
        "/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 1000 >>")
        .getBytes("ISO-8859-1")))
    assert(e3.getMessage.contains("rows"), e3.getMessage)
  }

  test("PNG predictor unpredict: hand-computed Sub/Up/Average/Paeth rows") {
    // 2 columns, 1 color, bpc 8. Raw image rows: (10, 20), (30, 45)
    // Sub row 1: f=1 → (10, 20-10)=(10,10); Up row 2: f=2 → (30-10, 45-20)=(20,25)
    val coded = Array[Byte](1, 10, 10, 2, 20, 25)
    assert(PdfCodec.unpredict(coded, 12, 1, 8, 2).toSeq ==
      Seq[Byte](10, 20, 30, 45))
    // Average then Paeth, with modular wraparound: rows (200, 250), (100, 7)
    // Avg row1: (200-0, 250-(200+0)/2=150)
    // Paeth row2: i=0: left=0,up=200,ul=0 → p=200: pb=0 wins → up=200
    //             i=1: left=100,up=250,ul=200 → p=150: pa=50=pc → left=100
    val fixed = Array[Byte](3, 200.toByte, 150.toByte, 4, (100 - 200 & 0xff).toByte,
      (7 - 100 & 0xff).toByte)
    assert(PdfCodec.unpredict(fixed, 12, 1, 8, 2).toSeq ==
      Seq(200.toByte, 250.toByte, 100.toByte, 7.toByte))
    // TIFF predictor 2: cumulative along the row
    assert(PdfCodec.unpredict(Array[Byte](5, 3, 250.toByte), 2, 1, 8, 3).toSeq ==
      Seq[Byte](5, 8, 2))
  }

  test("predictor encoders round-trip through unpredict (all PNG filter types)") {
    val rnd = new scala.util.Random(7)
    val data = Array.fill(32 * 7)(rnd.nextInt(256).toByte) // 7 rows → cycles all 5 filters
    assert(PdfCodec.unpredict(PdfCodec.pngPredictEncode(data, 1, 32), 12, 1, 8, 32)
      .toSeq == data.toSeq)
    assert(PdfCodec.unpredict(PdfCodec.tiffPredictEncode(data, 1, 32), 2, 1, 8, 32)
      .toSeq == data.toSeq)
  }

  test("PDF 1.5 with predictor-coded streams round-trips (PNG 12 and TIFF 2)") {
    // long pages → many 32-byte rows → Up/Sub/Paeth/Average all exercised
    val pages = Seq("A" + ("lorem ipsum dolor sit amet " * 8), "short (page) \\ two")
    for (p <- Seq(12, 2)) {
      val pdf = PdfCodec.encodePdf15(pages, compress = true, predictor = p)
      val s = new String(pdf, "ISO-8859-1")
      assert(s.contains(s"/Predictor $p"), s"predictor=$p dict missing")
      // padded payloads: extraction strips nothing — trailing spaces are
      // content-stream whitespace, invisible to text assembly
      assert(PdfCodec.extractText(pdf) == pages, s"predictor=$p")
    }
    val e = intercept[IllegalArgumentException](
      PdfCodec.encodePdf15(Seq("x"), compress = false, predictor = 12))
    assert(e.getMessage.contains("compress"), e.getMessage)
  }

  // ── PDF 1.5 object streams ─────────────────────────────────────────

  test("PDF 1.5 round trip: structure dicts in an ObjStm, xref stream layout") {
    val pages = Seq("first page body", "second page (with) \\ specials", "third")
    for (compress <- Seq(true, false)) {
      val pdf = PdfCodec.encodePdf15(pages, compress)
      assert(new String(pdf.take(8), "ISO-8859-1") == "%PDF-1.5")
      assert(PdfCodec.extractText(pdf) == pages, s"compress=$compress")
    }
  }

  test("PDF 1.5 layout really packs the catalog: classic scan alone finds no pages") {
    val pdf = new String(PdfCodec.encodePdf15(Seq("x"), compress = true), "ISO-8859-1")
    // the only /Type /Catalog and /Type /Page occurrences live inside
    // the compressed object stream — invisible to a byte scan
    assert(!pdf.contains("/Catalog") && !"""(?s)/Type\s*/Page[^s]""".r.findFirstIn(pdf).isDefined)
    assert(pdf.contains("/ObjStm") && pdf.contains("/XRef"))
  }

  test("truncated ObjStm header fails loud") {
    val pdf = new String(PdfCodec.encodePdf15(Seq("x"), compress = false), "ISO-8859-1")
    val broken = pdf.replace("/N 4", "/N 40") // claims 40 packed objects
    val e = intercept[IllegalArgumentException](
      PdfCodec.extractText(broken.getBytes("ISO-8859-1")))
    assert(e.getMessage.contains("header has"))
  }

  test("empty document in 1.5 layout") {
    assert(PdfCodec.extractText(PdfCodec.encodePdf15(Seq.empty)) == Seq.empty)
  }

  // ── composite (Type0/CID) fonts — VERDICT r8 #4 ────────────────────

  test("CID round trip: CJK text through Type0 font + ToUnicode CMap") {
    val pages = Seq(
      "こんにちは世界、PDFのテストです。",        // kana + kanji + ASCII mix
      "第二ページ：漢字abcと数字123。",
      "한국어 텍스트와 中文混排")                   // Hangul + Chinese
    for (compress <- Seq(true, false)) {
      val pdf = PdfCodec.encodeCidPdf(pages, compress)
      assert(PdfCodec.extractText(pdf) == pages, s"compress=$compress")
    }
  }

  test("CID encoding is genuinely code-mapped, not code-point pass-through") {
    // if the decoder ignored the CMap and read codes as chars, the text
    // would come back as control chars (codes start at 1) — assert the
    // raw content stream does NOT contain the text's code points
    val pdf = PdfCodec.encodeCidPdf(Seq("漢字"), compress = false)
    val s = new String(pdf, "ISO-8859-1")
    assert(!s.contains("漢")) // no code-point leak anywhere in the bytes
    assert(s.contains("<00010002>")) // sequential subset codes
    assert(PdfCodec.extractText(pdf) == Seq("漢字"))
  }

  test("bfchar and bfrange (array + incremented dst) all parse") {
    val cmap = """
      |2 beginbfchar
      |<0003> <0041>
      |<0005> <3042>
      |endbfchar
      |1 beginbfrange
      |<0010> <0012> <0061>
      |endbfrange
      |1 beginbfrange
      |<0020> <0022> [ <0058> <0059> <005A> ]
      |endbfrange""".stripMargin
    val m = PdfCodec.parseToUnicode(cmap)
    assert(m(3) == "A" && m(5) == "あ")
    assert(m(0x10) == "a" && m(0x11) == "b" && m(0x12) == "c")
    assert(m(0x20) == "X" && m(0x21) == "Y" && m(0x22) == "Z")
  }

  test("ToUnicode dst can be multi-unit: ligatures and surrogate pairs") {
    val cmap = """
      |2 beginbfchar
      |<0001> <00660066>
      |<0002> <D83DDE00>
      |endbfchar""".stripMargin
    val m = PdfCodec.parseToUnicode(cmap)
    assert(m(1) == "ff")          // two code units
    assert(m(2) == "😀") // surrogate pair = one astral char
  }

  test("generated CMap uses both bfchar and bfrange forms") {
    // "abcdef" = 6 consecutive chars → a range; "z09" breaks runs → bfchar
    val cmap = PdfCodec.toUnicodeCmap("abcdefz09".zipWithIndex.map {
      case (c, i) => (c, i + 1) })
    assert(cmap.contains("beginbfrange") && cmap.contains("beginbfchar"))
    assert(cmap.contains("[")) // the first range is emitted in array form
    val m = PdfCodec.parseToUnicode(cmap)
    assert("abcdefz09".zipWithIndex.forall { case (c, i) => m(i + 1) == c.toString })
  }

  test("composite font without ToUnicode fails loud") {
    val pdf = new String(PdfCodec.encodeCidPdf(Seq("字")), "ISO-8859-1")
    val broken = pdf.replace("/ToUnicode", "/ToUnicorn")
    val e = intercept[IllegalArgumentException](
      PdfCodec.extractText(broken.getBytes("ISO-8859-1")))
    assert(e.getMessage.contains("ToUnicode"))
  }

  test("UNCARRIED predefined encoding names still fail loud") {
    val pdf = new String(PdfCodec.encodeCidPdf(Seq("字")), "ISO-8859-1")
    // 78-RKSJ-H is a real registered CMap this engine does NOT carry
    // (UniJIS-UTF16-H moved to the carried set in round 16)
    val broken = pdf.replace("/Identity-H", "/78-RKSJ-H")
    val e = intercept[IllegalArgumentException](
      PdfCodec.extractText(broken.getBytes("ISO-8859-1")))
    assert(e.getMessage.contains("predefined CMap"), e.getMessage)
  }

  test("PREDEFINED CMaps decode: 90ms-RKSJ-H (Shift-JIS bytes) and UniJIS-UCS2-H (UCS-2)") {
    val pages = Seq(
      "Hello 世界! mixed ascii and 日本語 text",
      "カタカナ and ｶﾀｶﾅ halfwidth",   // halfwidth katakana = RKSJ 1-byte A1-DF
      "pure ascii page",
      "亜江意尾宇 jis level one")
    // Ext-RKSJ-H (round 17): the other common Japanese registration —
    // identical codespaces, table-shared with 90ms under the JDK
    // construction, so the same corpus must round-trip under both names
    for (cmap <- Seq("90ms-RKSJ-H", "Ext-RKSJ-H", "UniJIS-UCS2-H");
         compress <- Seq(true, false)) {
      val pdf = PdfCodec.encodeCmapPredefPdf(pages, cmap, compress)
      assert(PdfCodec.extractText(pdf) == pages, s"$cmap compress=$compress")
    }
    import graft.pipeline.PredefCmaps
    assert(PredefCmaps.orderingOf("Ext-RKSJ-H") == ("Japan1", 2))
    assert(PredefCmaps.forName("Ext-RKSJ-V").exists(_.vertical),
      "the -V vertical alias rides the same table")
    // the Chinese and Korean locale tables (round 15): GBK bytes and
    // Unified Hangul Code bytes round-trip through their own codespaces
    val zh = Seq("中文数据检索 mixed with ascii", "简体字 page two")
    for (cmap <- Seq("GBK-EUC-H", "UniGB-UCS2-H")) {
      val pdf = PdfCodec.encodeCmapPredefPdf(zh, cmap, compress = true)
      assert(PdfCodec.extractText(pdf) == zh, cmap)
    }
    val ko = Seq("한국어 텍스트 and ascii", "벡터 검색 page two")
    for (cmap <- Seq("KSCms-UHC-H", "UniKS-UCS2-H")) {
      val pdf = PdfCodec.encodeCmapPredefPdf(ko, cmap, compress = true)
      assert(PdfCodec.extractText(pdf) == ko, cmap)
    }
    // cross-locale repertoire refusal: hangul has no GBK encoding
    val eXLoc = intercept[IllegalArgumentException](
      PdfCodec.encodeCmapPredefPdf(Seq("한"), "GBK-EUC-H"))
    assert(eXLoc.getMessage.contains("GBK"), eXLoc.getMessage)
    // a font-supplied /ToUnicode would take precedence; absent one, a code
    // CP932 leaves undefined fails loud (splice a hole code 0x8200 —
    // second byte 0x00 is outside <8140><9FFC>'s per-byte range, so the
    // TOKENIZER rejects it; 0x81AD is inside the codespace but unmapped
    // in CP932, so the TABLE rejects it)
    val pdf = new String(
      PdfCodec.encodeCmapPredefPdf(Seq("字A"), "90ms-RKSJ-H", compress = false),
      "ISO-8859-1")
    assert(pdf.contains("<8E9A41>"), "content shape changed") // 字 = 0x8E9A SJIS, A 1-byte
    val holeCodespace = pdf.replace("<8E9A41>", "<820041>")
    val e1 = intercept[IllegalArgumentException](
      PdfCodec.extractText(holeCodespace.getBytes("ISO-8859-1")))
    assert(e1.getMessage.contains("codespace"), e1.getMessage)
    val holeTable = pdf.replace("<8E9A41>", "<81AD41>")
    val e2 = intercept[IllegalArgumentException](
      PdfCodec.extractText(holeTable.getBytes("ISO-8859-1")))
    assert(e2.getMessage.contains("not in the font's ToUnicode CMap"), e2.getMessage)
    // writer refuses chars outside the repertoire rather than emitting
    // undecodable bytes (U+20AC € has no CP932 encoding; note JIS X 0208
    // DOES carry Cyrillic/Greek, so a Ж would encode fine)
    val e3 = intercept[IllegalArgumentException](
      PdfCodec.encodeCmapPredefPdf(Seq("€"), "90ms-RKSJ-H"))
    assert(e3.getMessage.contains("windows-31j"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException](
      PdfCodec.encodeCmapPredefPdf(Seq("€"), "UniJIS-UCS2-H"))
    assert(e4.getMessage.contains("subset"), e4.getMessage)
    // CIDSystemInfo pairings per Adobe's registrations (ISO 32000-1
    // Table 118): the UniJIS/UniGB UCS2 forms are Japan1-4 / GB1-4,
    // the locale-encoding forms Japan1-2 / GB1-2 / Korea1-1
    import graft.pipeline.PredefCmaps
    assert(PredefCmaps.orderingOf("90ms-RKSJ-H") == ("Japan1", 2))
    assert(PredefCmaps.orderingOf("UniJIS-UCS2-H") == ("Japan1", 4))
    assert(PredefCmaps.orderingOf("GBK-EUC-H") == ("GB1", 2))
    assert(PredefCmaps.orderingOf("UniGB-UCS2-H") == ("GB1", 4))
    assert(PredefCmaps.orderingOf("KSCms-UHC-H") == ("Korea1", 1))
    assert(PredefCmaps.orderingOf("UniKS-UCS2-H") == ("Korea1", 1))
  }

  test("UTF16 predefined CMaps: surrogate-aware codes incl. Extension B; -V verticals alias") {
    import graft.pipeline.PredefCmaps
    // supplementary chars (CJK Ext B): 𠮷 U+20BB7, 𠀋 U+2000B, 𠀃 U+20003
    val pages = Seq("Hello 世界 mixed 𠮷野家 with ExtB 𠀋", "second page カタカナ")
    for (cmap <- Seq("UniJIS-UTF16-H", "UniJIS-UTF16-V")) {
      val pdf = PdfCodec.encodeCmapPredefPdf(pages, cmap, compress = true)
      assert(PdfCodec.extractText(pdf) == pages, cmap)
    }
    val zh = Seq("中文 𠀃 ext b")
    assert(PdfCodec.extractText(PdfCodec.encodeCmapPredefPdf(zh, "UniGB-UTF16-H")) == zh)
    val ko = Seq("한국어 𠀃")
    assert(PdfCodec.extractText(PdfCodec.encodeCmapPredefPdf(ko, "UniKS-UTF16-H")) == ko)
    // -V verticals are TABLE-SHARING aliases with the mode surfaced
    val v = PredefCmaps.forName("90ms-RKSJ-V").get
    assert(v.vertical && v.name == "90ms-RKSJ-V")
    assert(v.toUni eq PredefCmaps.forName("90ms-RKSJ-H").get.toUni)
    assert(!PredefCmaps.forName("UniJIS-UTF16-H").get.vertical)
    assert(PdfCodec.extractText(
      PdfCodec.encodeCmapPredefPdf(Seq("縦書き page"), "90ms-RKSJ-V")) == Seq("縦書き page"))
    // writer refusals: supplementary outside Ext B (emoji), and any
    // supplementary under a UCS2 form
    val eSupp = intercept[IllegalArgumentException](PdfCodec.encodeCmapPredefPdf(
      Seq(new String(Character.toChars(0x1f600))), "UniJIS-UTF16-H"))
    assert(eSupp.getMessage.contains("Extension B"), eSupp.getMessage)
    val eUcs2 = intercept[IllegalArgumentException](
      PdfCodec.encodeCmapPredefPdf(Seq("𠮷"), "UniJIS-UCS2-H"))
    assert(eUcs2.getMessage.contains("UTF16"), eUcs2.getMessage)
    // decoder: the 2-byte codespaces EXCLUDE the surrogate gap, so a
    // spliced lone-high-surrogate code fails the tokenizer loud
    val pdf = new String(
      PdfCodec.encodeCmapPredefPdf(Seq("字A"), "UniJIS-UTF16-H", compress = false),
      "ISO-8859-1")
    assert(pdf.contains("<5B570041>"), "content shape changed")
    val broken = pdf.replace("<5B570041>", "<D8400041>")
    val eTok = intercept[IllegalArgumentException](
      PdfCodec.extractText(broken.getBytes("ISO-8859-1")))
    assert(eTok.getMessage.contains("codespace"), eTok.getMessage)
    // registrations (Adobe cmap-resources): UTF16 forms are Japan1-6 /
    // GB1-5 / Korea1-2; -V shares its -H twin's registration
    assert(PredefCmaps.orderingOf("UniJIS-UTF16-H") == ("Japan1", 6))
    assert(PredefCmaps.orderingOf("UniGB-UTF16-V") == ("GB1", 5))
    assert(PredefCmaps.orderingOf("UniKS-UTF16-H") == ("Korea1", 2))
  }

  test("EMBEDDED /Encoding CMap: mixed 1/2-byte codes round-trip (the RKSJ shape)") {
    // ASCII runs show as 1-byte codes, CJK as 2-byte — a decoder that
    // pairs bytes blindly (the Identity assumption) garbles every page
    val pages = Seq(
      "Hello 世界! mixed ascii and 日本語 text",
      "second page: こんにちは world",
      "pure ascii page",
      "字字字 repeated plus spaces   and (parens)")
    for (compress <- Seq(true, false)) {
      val pdf = PdfCodec.encodeCmapPdf(pages, compress)
      assert(PdfCodec.extractText(pdf) == pages, s"compress=$compress")
    }
  }

  test("embedded CMap fail-loud: usecmap, out-of-codespace bytes, missing ToUnicode code") {
    val pdf = new String(PdfCodec.encodeCmapPdf(Seq("Hi 字"), compress = false), "ISO-8859-1")
    // usecmap (predefined base) refuses — pad to preserve stream /Length
    assert(pdf.contains("/CMapType 1 def"))
    val used = pdf.replace("/CMapType 1 def\n", "usecmap %pad1234\n")
    val eUse = intercept[IllegalArgumentException](
      PdfCodec.extractText(used.getBytes("ISO-8859-1")))
    assert(eUse.getMessage.contains("usecmap"), eUse.getMessage)
    // a byte below <20> (outside both codespaces) in the shown string —
    // patch the CONTENT hex run "<4869…" ("Hi"), not the bare "<48",
    // which would ALSO rewrite the ToUnicode bfchar source and remap
    // instead of unmapping (length-preserving either way)
    assert(pdf.contains("<4869"), "content hex changed — update the patch anchors")
    val stray = pdf.replace("<4869", "<0169")
    val eSpace = intercept[IllegalArgumentException](
      PdfCodec.extractText(stray.getBytes("ISO-8859-1")))
    assert(eSpace.getMessage.contains("codespace"), eSpace.getMessage)
    // in-codespace 1-byte code with no ToUnicode entry ('z' = 0x7A unused)
    val unmapped = pdf.replace("<4869", "<7A69")
    val eMap = intercept[IllegalArgumentException](
      PdfCodec.extractText(unmapped.getBytes("ISO-8859-1")))
    assert(eMap.getMessage.contains("ToUnicode"), eMap.getMessage)
  }

  test("2-byte code allocation walks PER-BYTE ranges: >191 distinct chars wrap the low byte") {
    // spec §9.7.6.2: codespace containment is per byte, so <8140><FEFE>
    // does NOT include 0x81FF or 0x8200-0x823F — after 191 codes the
    // allocator must wrap to 0x8240, and the round trip must survive the
    // wrap (a linear integer increment would emit codes a conformant
    // reader rejects; the decoder's own byte-wise matcher would fail
    // loud on them too, keeping the two sides honest together)
    val chars = (0x4E00 until 0x4E00 + 300).map(_.toChar).mkString // 300 CJK chars
    val pages = Seq(chars.take(150) + " mid ascii " + chars.drop(150))
    val pdf = PdfCodec.encodeCmapPdf(pages, compress = false)
    assert(PdfCodec.extractText(pdf) == pages)
    // the wrapped code really appears: char #192 carries first byte 0x82
    val s = new String(pdf, "ISO-8859-1")
    assert(s.contains("<8240>"), "allocation did not wrap at the per-byte boundary")
    assert(!s.contains("<81FF>") && !s.contains("<8200>"),
      "allocator emitted codes outside the per-byte codespace")
  }

  test("byte-wise codespace matching: integer-in-range but byte-out-of-range code refuses") {
    // 0x8230: integer-inside <8140><FEFE> under interval semantics, but
    // its SECOND byte 0x30 < 0x40 — per-byte semantics must reject it
    val pdf = new String(PdfCodec.encodeCmapPdf(Seq("字A"), compress = false), "ISO-8859-1")
    assert(pdf.contains("<8140 41>") || pdf.contains("<814041>"), "content shape changed")
    val patched = pdf.replace("<814041>", "<823041>")
    val e = intercept[IllegalArgumentException](
      PdfCodec.extractText(patched.getBytes("ISO-8859-1")))
    assert(e.getMessage.contains("codespace"), e.getMessage)
  }

  test("width-keyed ToUnicode: a 1-byte <41> and a 2-byte <0041> are distinct codes") {
    val cmap =
      """2 begincodespacerange
        |<00> <7F>
        |<0000> <FFFF>
        |endcodespacerange
        |2 beginbfchar
        |<41> <0058>
        |<0041> <0059>
        |endbfchar""".stripMargin
    val m = PdfCodec.parseToUnicodeWide(cmap)
    assert(m((1, 0x41L)) == "X" && m((2, 0x41L)) == "Y")
    // ...but THAT cmap's codespaces overlap in first byte across widths
    // (<00><7F> vs <0000><FFFF>): shortest-match tokenization would
    // silently diverge from the spec's byte-incremental prefix match on
    // such a file, so parseCodespaces rejects it loud
    val eOverlap = intercept[IllegalArgumentException](
      PdfCodec.parseCodespaces(cmap, -1))
    assert(eOverlap.getMessage.contains("overlapping first-byte"), eOverlap.getMessage)
    // first-byte-DISJOINT widths (the RKSJ shape) parse fine
    val spaces = PdfCodec.parseCodespaces(
      "2 begincodespacerange\n<00> <7F>\n<8000> <FFFF>\nendcodespacerange", -1)
    assert(spaces == Seq((1, 0x00L, 0x7fL), (2, 0x8000L, 0xffffL)))
  }

  test("code missing from the CMap fails loud, not silent drop") {
    // splice an extra unmapped code into the (uncompressed) content
    // stream — the "Td … Tj" context is unique to it, so the CMap stays
    // intact; the now-stale /Length exercises the endstream fallback too
    val pdf = new String(PdfCodec.encodeCidPdf(Seq("字"), compress = false), "ISO-8859-1")
    val broken = pdf.replace("Td <0001> Tj", "Td <00010099> Tj")
    val e = intercept[IllegalArgumentException](
      PdfCodec.extractText(broken.getBytes("ISO-8859-1")))
    assert(e.getMessage.contains("not in the font's ToUnicode CMap"))
  }

  test("INLINE composite font dict (not a ref) is resolved — and fails loud without ToUnicode") {
    // legal per spec: /Font maps the name to an inline dict; a reader
    // matching only `/F1 N 0 R` silently falls back to SimpleFont and
    // emits garbage for the CID codes
    val content = "BT /F1 12 Tf <0001> Tj ET"
    val pdf =
      s"""%PDF-1.4
         |1 0 obj
         |<< /Type /Catalog /Pages 2 0 R >>
         |endobj
         |2 0 obj
         |<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>
         |endobj
         |3 0 obj
         |<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 << /Subtype /Type0 /Encoding /Identity-H /BaseFont /Inline >> >> >> /Contents 4 0 R >>
         |endobj
         |4 0 obj
         |<< /Length ${content.length} >>
         |stream
         |$content
         |endstream
         |endobj
         |trailer
         |<< /Root 1 0 R >>
         |""".stripMargin
    val e = intercept[IllegalArgumentException](
      PdfCodec.extractText(pdf.getBytes("ISO-8859-1")))
    assert(e.getMessage.contains("ToUnicode"), e.getMessage)
  }

  test("simple and composite fonts mix on one page via Tf tracking") {
    val decs: Map[String, PdfCodec.FontDec] = Map(
      "F1" -> PdfCodec.CompositeFont(
        PdfCodec.parseToUnicode("1 beginbfchar\n<0001> <4E2D>\nendbfchar")),
      "F2" -> PdfCodec.SimpleFont)
    val content = "BT /F2 12 Tf (latin ) Tj /F1 12 Tf <0001> Tj ET"
    assert(PdfCodec.extractFromContent(content, decs) == "latin 中")
  }

  test("extractPagesPdf: distributed decode equals local decode (CID path)") {
    import spark.implicits._
    val docs = Seq((0L, "日本語テキスト" * 40), (1L, "短い"), (2L, ""))
      .toDF("doc_id", "text")
    val pdfs = PdfPipeline.synthesizeCidPdfs(docs, pageSize = 200)
    val rows = PdfPipeline.extractPagesPdf(pdfs)
      .orderBy("doc_id", "page_no").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val long = "日本語テキスト" * 40 // 280 chars → 2 pages
    assert(rows.toSeq == Seq(
      (0L, 1L, long.substring(0, 200)), (0L, 2L, long.substring(200)),
      (1L, 1L, "短い")))
  }

  test("extractPagesPdf: distributed decode equals local decode") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha " * 50),    // 300 chars → 2 pages at 200
      (1L, "beta"),
      (2L, "")                // zero pages
    ).toDF("doc_id", "text")
    val pdfs = PdfPipeline.synthesizePdfs(docs, pageSize = 200)
    val rows = PdfPipeline.extractPagesPdf(pdfs)
      .orderBy("doc_id", "page_no")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val expected = Seq(
      (0L, 1L, ("alpha " * 50).substring(0, 200)),
      (0L, 2L, ("alpha " * 50).substring(200)),
      (1L, 1L, "beta"))
    assert(rows.toSeq == expected)
  }
}
