package graft.pipeline

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1

/** Embedded Type 1 font program (PDF /FontFile — the eexec-encrypted
  * PostScript dialect, public Adobe Type 1 Font Format spec). The LAST
  * glyph-program class [[PdfCodec]] refused: PDFBox decodes these
  * transparently inside the reference's extraction loop
  * (BlobUploadDetector Function.java:90-132), and pre-2005 corpora are
  * full of them. Completes the program matrix: TrueType ([[TrueTypeFont]]),
  * CFF/Type1C and OpenType-wrapped ([[CffFont]]), Type 1 (here).
  *
  * Text recovery is code → glyph NAME → Unicode:
  *   - the builtin /Encoding lives in the program's CLEAR-TEXT section
  *     (`dup <code> /<name> put` entries; spec §2.3). A font on
  *     `StandardEncoding` refuses — it is nonsymbolic by construction
  *     and belongs to the simple-font path, the [[CffFont]] convention;
  *   - the eexec-ENCRYPTED section (r = 55665, spec §7.2; binary or the
  *     spec's hex form, detected by the first-four-bytes heuristic of
  *     §7.2's step 1) is decrypted and its /CharStrings dict scanned for
  *     the glyph names the font actually carries — every encoded name
  *     must be among them, so a wrong key / corrupt program fails LOUD
  *     here instead of silently emitting text for absent glyphs. The
  *     scan is a sequential tokenizer that skips `RD`/`-|` binary runs
  *     by their byte counts (charstring bytes may contain any value,
  *     including `/` and `end` lookalikes — a regex over the whole
  *     plaintext would misparse them);
  *   - names map to text through [[PdfCodec.glyphToUnicode]]'s AGL +
  *     uniXXXX machinery, the same leg CFF uses.
  *
  * Accepts both the PDF-native raw form (/Length1 clear + /Length2
  * encrypted + /Length3 trailer, spec Table 127) and the PFB segmented
  * form (0x80-tagged ASCII/binary segments) some writers embed verbatim.
  * Plain JVM code — runs inside `mapPartitions` with zero task-side
  * dependencies, like the rest of the PDF stack. */
private[graft] object Type1Font {

  private val EexecR = 55665
  private val CharstringR = 4330
  private val C1 = 52845
  private val C2 = 22719

  /** Type 1 decryption (spec §7.2): same recurrence for eexec (r=55665)
    * and charstrings (r=4330). The first `lead` plaintext bytes are the
    * spec's random lead and are dropped by the CALLER (they are part of
    * the plaintext, not the key schedule). */
  private[graft] def decrypt(data: Array[Byte], from: Int, len: Int,
                                r0: Int): Array[Byte] = {
    var r = r0
    val out = new Array[Byte](len)
    var i = 0
    while (i < len) {
      val c = data(from + i) & 0xff
      out(i) = (c ^ (r >> 8)).toByte
      r = ((c + r) * C1 + C2) & 0xffff
      i += 1
    }
    out
  }

  /** Type 1 encryption (spec §7.2): `lead` deterministic lead bytes are
    * prepended as plaintext (spec says "random"; any values decrypt —
    * the fixture writer varies the first to satisfy the binary/hex
    * detection constraint). */
  private[graft] def encrypt(plain: Array[Byte], lead: Array[Byte],
                                r0: Int): Array[Byte] = {
    var r = r0
    val out = new Array[Byte](lead.length + plain.length)
    var i = 0
    while (i < out.length) {
      val p = (if (i < lead.length) lead(i) else plain(i - lead.length)) & 0xff
      val c = p ^ (r >> 8)
      out(i) = c.toByte
      r = ((c + r) * C1 + C2) & 0xffff
      i += 1
    }
    out
  }

  private def isHexChar(b: Byte): Boolean = {
    val c = (b & 0xff).toChar
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
  }

  private def isPsWs(c: Char): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0

  /** code → Unicode for a SYMBOLIC simple font with an embedded Type 1
    * program. `len1`/`len2` are the /FontFile stream's /Length1 and
    * /Length2 (ignored for the PFB segmented form, whose headers carry
    * their own lengths). */
  def codeToUnicode(program: Array[Byte], len1: Int, len2: Int,
                    fontNum: Int): Map[Int, String] = {
    val (clear, cipher) =
      if (program.length >= 2 && (program(0) & 0xff) == 0x80)
        pfbSegments(program, fontNum)
      else {
        require(len1 > 0 && len2 > 0,
          s"PdfCodec: font $fontNum: /FontFile needs positive /Length1 and " +
            s"/Length2 (got $len1/$len2)")
        require(len1 + len2 <= program.length,
          s"PdfCodec: font $fontNum: /FontFile /Length1+/Length2 = ${len1 + len2} " +
            s"exceeds the ${program.length}-byte program")
        (new String(program, 0, len1, ISO_8859_1),
          java.util.Arrays.copyOfRange(program, len1, len1 + len2))
      }

    // ── clear-text section: the builtin /Encoding ────────────────────
    require(clear.contains("eexec"),
      s"PdfCodec: font $fontNum: /FontFile clear-text section has no eexec " +
        "operator — not a Type 1 program (or /Length1 cuts it short)")
    if ("""/Encoding\s+StandardEncoding\s+def""".r.findFirstIn(clear).isDefined)
      throw new IllegalArgumentException(
        s"PdfCodec: font $fontNum: Type 1 program on StandardEncoding — a font " +
          "on a standard encoding is nonsymbolic and out of the glyph-program " +
          "scope")
    require("""/Encoding\s+\d+\s+array""".r.findFirstIn(clear).isDefined,
      s"PdfCodec: font $fontNum: Type 1 program has no builtin /Encoding array")
    val entries = """dup\s+(\d+)\s*/([^\s/{}()\[\]<>]+)\s+put""".r
      .findAllMatchIn(clear)
      .map(m => m.group(1).toInt -> m.group(2)).toSeq
    require(entries.nonEmpty,
      s"PdfCodec: font $fontNum: Type 1 /Encoding array assigns no codes")
    entries.foreach { case (code, _) =>
      require(code >= 0 && code <= 0xff,
        s"PdfCodec: font $fontNum: Type 1 /Encoding code $code out of 0-255")
    }

    // ── encrypted section: the /CharStrings glyph inventory ──────────
    // spec §7.2 step 1: if the first four ciphertext bytes are ASCII hex
    // the section is in the hex form — gather hex digits (whitespace
    // interleaved) and decrypt the decoded bytes instead
    val cipherBytes =
      if (cipher.length >= 4 && cipher.take(4).forall(isHexChar)) {
        val out = new ByteArrayOutputStream(cipher.length / 2)
        var hi = -1
        cipher.foreach { b =>
          if (isHexChar(b)) {
            val v = Character.digit((b & 0xff).toChar, 16)
            if (hi < 0) hi = v else { out.write((hi << 4) | v); hi = -1 }
          } else require(isPsWs((b & 0xff).toChar),
            s"PdfCodec: font $fontNum: non-hex byte 0x${(b & 0xff).toHexString} " +
              "in a hex-form eexec section")
        }
        out.toByteArray
      } else cipher
    val plain = decrypt(cipherBytes, 0, cipherBytes.length, EexecR)
    val names = charStringNames(plain, fontNum)

    val out = Map.newBuilder[Int, String]
    entries.foreach { case (code, name) =>
      if (name != ".notdef") {
        require(names.contains(name),
          s"PdfCodec: font $fontNum: /Encoding names glyph /$name absent from " +
            "the program's /CharStrings — wrong eexec key or corrupt program")
        out += code -> PdfCodec.glyphToUnicode(name, fontNum)
      }
    }
    out.result()
  }

  /** PFB segmented form: 0x80 0x01 len32le ASCII / 0x80 0x02 len32le
    * binary / 0x80 0x03 EOF. Returns (concatenated ASCII, concatenated
    * binary). */
  private def pfbSegments(program: Array[Byte],
                          fontNum: Int): (String, Array[Byte]) = {
    val ascii = new ByteArrayOutputStream()
    val binary = new ByteArrayOutputStream()
    var at = 0
    var done = false
    while (!done) {
      require(at + 2 <= program.length,
        s"PdfCodec: font $fontNum: PFB truncated at segment header (offset $at)")
      require((program(at) & 0xff) == 0x80,
        s"PdfCodec: font $fontNum: PFB segment marker 0x${(program(at) & 0xff).toHexString} " +
          s"at $at (want 0x80)")
      (program(at + 1) & 0xff) match {
        case 3 => done = true
        case t @ (1 | 2) =>
          require(at + 6 <= program.length,
            s"PdfCodec: font $fontNum: PFB truncated in segment length at $at")
          val len = ((program(at + 2) & 0xffL) | ((program(at + 3) & 0xffL) << 8) |
            ((program(at + 4) & 0xffL) << 16) | ((program(at + 5) & 0xffL) << 24)).toInt
          require(len >= 0 && at + 6 + len <= program.length,
            s"PdfCodec: font $fontNum: PFB segment at $at declares $len bytes " +
              s"past EOF (${program.length})")
          (if (t == 1) ascii else binary).write(program, at + 6, len)
          at += 6 + len
        case t => throw new IllegalArgumentException(
          s"PdfCodec: font $fontNum: PFB segment type $t (want 1/2/3)")
      }
    }
    require(binary.size > 0,
      s"PdfCodec: font $fontNum: PFB carries no binary (eexec) segment")
    (new String(ascii.toByteArray, ISO_8859_1), binary.toByteArray)
  }

  /** Glyph names defined in the decrypted private section's /CharStrings
    * dict. Sequential tokenizer: `RD` / `-|` binary runs are skipped by
    * the preceding integer's byte count (both the /Subrs entries before
    * CharStrings and the charstrings themselves), so charstring bytes
    * can never be misread as tokens. */
  private[graft] def charStringNames(plain: Array[Byte],
                                        fontNum: Int): Set[String] = {
    val s = new String(plain, ISO_8859_1)
    val names = Set.newBuilder[String]
    var found = false
    var inCharStrings = false
    var lastInt = -1
    var lastName: String = null
    var i = 4 // the spec's four random lead bytes
    var stop = false
    while (i < s.length && !stop) {
      val c = s.charAt(i)
      if (isPsWs(c)) i += 1
      else if (c == '{' || c == '}' || c == '[' || c == ']') { i += 1 }
      else {
        val start = i
        while (i < s.length && !isPsWs(s.charAt(i)) &&
          s.charAt(i) != '{' && s.charAt(i) != '}' &&
          s.charAt(i) != '[' && s.charAt(i) != ']') i += 1
        val tok = s.substring(start, i)
        if (tok == "RD" || tok == "-|") {
          require(lastInt >= 0,
            s"PdfCodec: font $fontNum: Type 1 $tok with no preceding byte count")
          // exactly one space separates the operator from the binary run
          require(i < s.length && s.charAt(i) == ' ',
            s"PdfCodec: font $fontNum: Type 1 $tok not followed by a space")
          require(i.toLong + 1 + lastInt <= s.length,
            s"PdfCodec: font $fontNum: Type 1 binary run of $lastInt bytes " +
              "past the decrypted section's end")
          i += 1 + lastInt
          if (inCharStrings && lastName != null) { names += lastName; lastName = null }
          lastInt = -1
        } else if (tok == "/CharStrings") { inCharStrings = true; found = true }
        else if (tok == "end") { if (inCharStrings) stop = true }
        else if (tok.startsWith("/")) { if (inCharStrings) lastName = tok.drop(1) }
        else if (tok.nonEmpty && tok.forall(_.isDigit)) {
          // a corrupt decrypt can produce arbitrarily long digit runs —
          // cap before toInt so the failure is this module's loud error,
          // not a NumberFormatException from garbage
          require(tok.length <= 8,
            s"PdfCodec: font $fontNum: Type 1 integer token of ${tok.length} " +
              "digits — corrupt program (or wrong eexec key)")
          lastInt = tok.toInt
        }
        // dup / begin / dict / ND / |- / NP / noaccess / def … — inert here
      }
    }
    require(found,
      s"PdfCodec: font $fontNum: eexec decrypt yielded no /CharStrings dict — " +
        "wrong key, hex/binary misdetection, or corrupt program")
    val out = names.result()
    require(out.nonEmpty,
      s"PdfCodec: font $fontNum: Type 1 /CharStrings defines no glyphs")
    out
  }

  // ── writer (fixture generator for the oracle gate) ─────────────────

  /** A minimal REAL Type 1 program: clear-text header with a builtin
    * /Encoding array (`entries` are (byteCode, codePoint); glyph names
    * are the uniXXXX / uXXXXX forms [[PdfCodec.glyphToUnicode]] maps
    * back), an eexec-encrypted private section whose /CharStrings carry
    * one r=4330-encrypted `hsbw endchar` charstring per glyph, and the
    * spec's 512-zeros + cleartomark trailer. Returns (bytes, Length1,
    * Length2, Length3) for the /FontFile stream dict. */
  private[graft] def encodeProgram(entries: Seq[(Int, Int)]): (Array[Byte], Int, Int, Int) = {
    require(entries.nonEmpty, "Type1Font.encodeProgram: empty repertoire")
    require(entries.map(_._1).distinct.length == entries.length,
      "Type1Font.encodeProgram: duplicate byte codes")
    entries.foreach { case (code, cp) =>
      require(code >= 0 && code <= 0xff, s"byte code $code out of range")
      require(cp >= 0 && cp <= 0x10ffff, s"code point $cp out of range")
    }
    def nameOf(cp: Int): String = if (cp <= 0xffff) f"uni$cp%04X" else f"u$cp%05X"

    val clear = {
      val sb = new StringBuilder
      sb.append("%!FontType1-1.0: GraftSubset 001.001\n")
      sb.append("/FontName /GraftSubset def\n")
      sb.append("/PaintType 0 def\n/FontType 1 def\n")
      sb.append("/FontMatrix [0.001 0 0 0.001 0 0] readonly def\n")
      sb.append("/FontBBox {0 0 1000 1000} readonly def\n")
      sb.append("/Encoding 256 array\n0 1 255 {1 index exch /.notdef put} for\n")
      entries.foreach { case (code, cp) =>
        sb.append(s"dup $code /${nameOf(cp)} put\n")
      }
      sb.append("readonly def\ncurrentdict end\ncurrentfile eexec\n")
      sb.toString.getBytes(ISO_8859_1)
    }

    // one minimal charstring for every glyph: 0 500 hsbw endchar,
    // charstring-encrypted with lenIV=4 lead bytes (r=4330)
    val csPlain = Array[Byte](139.toByte, 248.toByte, 136.toByte, 13, 14)
    val cs = encrypt(csPlain, Array[Byte]('c', 's', '0', '0'), CharstringR)
    val priv = {
      val sb = new StringBuilder
      sb.append("dup /Private 9 dict dup begin\n")
      sb.append("/RD {string currentfile exch readstring pop} executeonly def\n")
      sb.append("/ND {noaccess def} executeonly def\n")
      sb.append("/NP {noaccess put} executeonly def\n")
      sb.append("/lenIV 4 def\n/password 5839 def\n/MinFeature {16 16} def\n")
      sb.append("/BlueValues [] def\nend\n")
      sb.append(s"/CharStrings ${entries.length + 1} dict dup begin\n")
      val csStr = new String(cs, ISO_8859_1)
      sb.append(s"/.notdef ${cs.length} RD ").append(csStr).append(" ND\n")
      entries.foreach { case (_, cp) =>
        sb.append(s"/${nameOf(cp)} ${cs.length} RD ").append(csStr).append(" ND\n")
      }
      sb.append("end\nend\nmark currentfile closefile\n")
      sb.toString.getBytes(ISO_8859_1)
    }
    // spec §7.2: at least one of the first four CIPHERTEXT bytes must not
    // be ASCII hex, or readers take the section for the hex form. Lead
    // bytes are plaintext we control — vary the first until it holds
    // (deterministic: first qualifying value wins).
    val cipher = (0 to 0xff).iterator
      .map(b => encrypt(priv, Array[Byte](b.toByte, 'R', 'F', 'T'), EexecR))
      .find(c => !c.take(4).forall(isHexChar))
      .getOrElse(throw new IllegalStateException(
        "Type1Font.encodeProgram: no lead byte breaks the hex heuristic"))

    val trailer = {
      val sb = new StringBuilder
      (0 until 8).foreach(_ => sb.append("0" * 64).append("\n"))
      sb.append("cleartomark\n")
      sb.toString.getBytes(ISO_8859_1)
    }
    val out = new ByteArrayOutputStream(clear.length + cipher.length + trailer.length)
    out.write(clear, 0, clear.length)
    out.write(cipher, 0, cipher.length)
    out.write(trailer, 0, trailer.length)
    (out.toByteArray, clear.length, cipher.length, trailer.length)
  }

  /** The same program in PFB segmented form (0x80-tagged), exercising
    * the segment-walk leg of [[codeToUnicode]]. */
  private[graft] def encodeProgramPfb(entries: Seq[(Int, Int)]): Array[Byte] = {
    val (raw, len1, len2, len3) = encodeProgram(entries)
    val out = new ByteArrayOutputStream(raw.length + 24)
    def seg(t: Int, from: Int, len: Int): Unit = {
      out.write(0x80); out.write(t)
      out.write(len & 0xff); out.write((len >> 8) & 0xff)
      out.write((len >> 16) & 0xff); out.write((len >> 24) & 0xff)
      out.write(raw, from, len)
    }
    seg(1, 0, len1)
    seg(2, len1, len2)
    seg(1, len1 + len2, len3)
    out.write(0x80); out.write(3)
    out.toByteArray
  }
}
