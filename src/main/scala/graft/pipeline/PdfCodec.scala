package graft.pipeline

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.{Deflater, Inflater}
import scala.collection.mutable

/** Pure-Scala PDF text extraction (+ a minimal writer used to exercise
  * it end-to-end), replacing the fixed-width pagination stub that stood
  * in for the reference's PDFBox call for six rounds.
  *
  * Reference behavior: BlobUploadDetector Function.java:90-132 loads the
  * blob's PDF bytes and emits one text string per page
  * (`PDFTextStripper.getText` with page bounds). This implements the
  * same WHAT — PDF bytes in, ordered per-page text out — from the
  * public PDF 1.7 spec (ISO 32000-1), scoped to the common text-PDF
  * case:
  *
  *   - classic cross-reference layout (`N G obj … endobj`), parsed by a
  *     SEQUENTIAL cursor scan so object headers inside stream payloads
  *     can never be mistaken for real objects (xref offsets themselves
  *     are not trusted — linearized/appended files keep working);
  *   - page order from the /Root → /Pages → /Kids tree (document order
  *     of /Type /Page objects as the no-catalog fallback);
  *   - /Contents as one stream or an array (concatenated in order, the
  *     spec's multi-stream page semantics);
  *   - stream filters: none, /FlateDecode (zlib — `Inflater`),
  *     /ASCIIHexDecode, /ASCII85Decode, /LZWDecode (PDF early-change
  *     variant), /RunLengthDecode (§7.4.5, round 18), applied as the
  *     spec's left-to-right CHAIN when /Filter is an array; anything
  *     else (DCT, CCITT, crypt) raises a clear error rather than
  *     silently yielding garbage;
  *   - text operators inside BT…ET: Tj, ' (next-line show), " (spacing
  *     variant), TJ (array show — kerning numbers dropped); Td/TD/T*
  *     append a newline between text runs (the PDFTextStripper-like
  *     reading-order heuristic for the single-column PDFs in scope);
  *   - literal strings with the full escape set (\n \r \t \b \f \( \)
  *     \\, 1-3 digit octal, backslash-EOL continuation, raw-EOL → \n)
  *     and nested unescaped parens; hex strings <…> incl. odd-length
  *     padding; in a SIMPLE font byte values map through Latin-1 (the
  *     WinAnsi core);
  *   - COMPOSITE (/Subtype /Type0) fonts with /Identity-H|V encoding —
  *     the CJK case the reference's own Japanese corpus needs (PDFBox
  *     handles it inside Function.java:90-132): string bytes pair into
  *     2-byte codes mapped to text through the font's /ToUnicode CMap
  *     (spec §9.10.3 — bfchar, bfrange with incremented-dst and
  *     array-dst forms, multi-code-unit/surrogate destinations). Fonts
  *     resolve per page via /Resources → /Font (inherited through
  *     /Parent per §7.7.3.4), and the decoder tracks the current font
  *     across Tf operators, so simple and composite text can mix on
  *     one page. A Type0 font with a non-Identity encoding or without
  *     /ToUnicode fails loud — never garbage.
  *
  *   - object streams (/Type /ObjStm, PDF 1.5 §7.5.7) — modern writers
  *     pack the catalog/page-tree/font dicts into one compressed
  *     stream; these are expanded transparently after the sequential
  *     scan (and [[encodePdf15]] writes genuine PDF 1.5 files — object
  *     stream + binary cross-reference stream — to round-trip-gate the
  *     path).
  *
  *   - encryption (empty-user-password, the reference's blob corpus
  *     shape): RC4 + AES-128 (/V 1/2/4, §7.6.3) and AES-256 / PDF 2.0
  *     (/V 5 /R 6, hardened KDF) via [[PdfCrypto]]; inline images
  *     (BI…EI) are skipped as non-text content; and SYMBOLIC simple
  *     fonts with no /ToUnicode and no /Encoding decode through their
  *     EMBEDDED font program — a /FontFile2 sfnt's `cmap`
  *     ([[TrueTypeFont.symbolCodeToUnicode]]: the (3,0) symbol
  *     subtable's code→glyph leg inverted against a Unicode-platform
  *     subtable) or a /FontFile3 Type1C's encoding/charset/strings
  *     ([[CffFont.codeToUnicode]]).
  *
  * Out of scope (documented, fail-loud where detectable): symbol-only
  * TrueType programs whose cmap carries no Unicode-platform subtable,
  * and CID-keyed CFFs under a simple font (their text is genuinely
  * unrecoverable; PDFBox sometimes guesses — we refuse). All four
  * embedded-program formats decode: /FontFile Type 1 ([[Type1Font]]),
  * /FontFile2 TrueType ([[TrueTypeFont]]), /FontFile3 Type1C
  * ([[CffFont]]) and /FontFile3 /OpenType.
  * The 100 TB-relevant part — binary column in, bounded per-row
  * work, no driver involvement — lives in [[PdfPipeline.extractPagesPdf]];
  * this object is deliberately plain JVM code so it runs inside
  * `mapPartitions` with zero task-side dependencies. */
object PdfCodec {

  // ── decoder ────────────────────────────────────────────────────────

  /** `offset` is the byte position of the object's `N G obj` header in
    * the file (-1 for synthetic / ObjStm-inner objects, which have no
    * top-level position). The trailer arbitration needs it: "which
    * revision is newer" is a FILE-ORDER question, and re-finding a dict
    * by its text (`lastIndexOf`) mis-positions it when two revisions'
    * dicts serialize identically. */
  private[graft] final case class PdfObj(num: Int, dict: String, stream: Option[Array[Byte]],
                                         gen: Int = 0, offset: Int = -1)

  /** How shown-string bytes become text: simple fonts are byte = char
    * (Latin-1); composite (Type0/Identity) fonts pair bytes into 2-byte
    * codes looked up in the font's ToUnicode CMap. */
  private[graft] sealed trait FontDec
  private[graft] case object SimpleFont extends FontDec
  private[graft] final case class CompositeFont(toUnicode: Map[Int, String]) extends FontDec
  /** Composite font with an EMBEDDED /Encoding CMap stream (spec
    * §9.7.5.3) — the variable-width-code case (RKSJ-shaped mixed 1/2-byte
    * encodings): `codespaces` are the CMap's (byteLen, lo, hi) ranges and
    * govern how shown-string bytes tokenize into codes; `toUni` is the
    * font's ToUnicode map keyed by (byteLen, code) — codes of different
    * widths are DISTINCT per spec, so the width rides the key. The
    * embedded CMap's cid mappings steer glyph selection, which text
    * extraction never needs — only its codespace matters here. */
  private[graft] final case class CmapFont(codespaces: Seq[(Int, Long, Long)],
                                           toUni: Map[(Int, Long), String],
                                           fontNum: Int) extends FontDec
  /** Simple font with an /Encoding /Differences remap: listed byte codes
    * decode through their GLYPH NAMES (stored unresolved — resolution to
    * text happens per SHOWN code in [[decodeShown]], so a name outside
    * the glyph list only fails text that actually uses it, not the whole
    * document); unlisted codes keep the Latin-1 base (spec §9.6.6.3 —
    * Differences PATCHES the base encoding). */
  private[graft] final case class DifferencesFont(names: Map[Int, String],
                                                  fontNum: Int) extends FontDec
  /** SYMBOLIC simple font decoding through its EMBEDDED font program
    * (TrueType cmap inversion, CFF four-hop, Type 1 eexec — or an
    * author-supplied /ToUnicode). Codes the program leaves unmapped fail
    * loud per SHOWN code (the [[DifferencesFont]] convention — only text
    * that uses them fails, not the whole document); `via` names the
    * mapping's provenance so the per-code error points at the right
    * structure instead of always blaming a TrueType cmap. */
  private[graft] final case class GlyphProgFont(codeToUni: Map[Int, String],
                                                fontNum: Int,
                                                via: String) extends FontDec

  /** Extract per-page text from PDF bytes, in page-tree order. */
  def extractText(bytes: Array[Byte]): Seq[String] = {
    val s = new String(bytes, ISO_8859_1)
    require(s.startsWith("%PDF-"), "PdfCodec: not a PDF (missing %PDF- header)")
    val objs = scanObjects(s, bytes)
    val byNum = objs.map(o => o.num -> o).toMap
    val pageNums = pageOrder(objs, byNum)
    pageNums.map { pn =>
      val page = byNum(pn)
      val content = contentRefs(page.dict).map { ref =>
        val obj = byNum.getOrElse(ref,
          throw new IllegalArgumentException(s"PdfCodec: /Contents $ref 0 R not found"))
        decodeStream(obj, byNum)
      }
      val res = resourcesOf(page, byNum)
      // spec: multiple content streams form ONE logical stream, joined
      // with at least one whitespace byte between them
      extractFromContent(content.mkString("\n"),
        PageCtx(fontsOf(res, byNum), xobjectsOf(res, byNum), byNum, depth = 0))
    }
  }

  // ── image XObject extraction (round 19) ────────────────────────────

  /** One decoded image XObject: 0-based page index, resource name,
    * geometry and 8-bit channel-interleaved samples (gray or RGB). */
  final case class PdfImage(page: Int, name: String, width: Int, height: Int,
                            channels: Int, pixels: Array[Byte])

  /** Extract every image XObject the pages' content invokes with `Do`,
    * in page order then paint order — the scanned-document carrier
    * ([[extractText]] on an image-only PDF is legitimately EMPTY; the
    * page's payload is here). Reference behavior: the PDFBox stack
    * behind Function.java:90-132 renders these images when stripping;
    * this decodes the SAMPLES from the public spec (ISO 32000-1 §8.9):
    * /DCTDecode via JpegCodec, /CCITTFaxDecode via CcittCodec (K < 0
    * G4; K = 0 with /EncodedByteAlign byte-aligned MH or with
    * /EndOfLine G3 1-D), raw samples behind Flate/LZW(+predictors)/
    * AHx/A85/RunLength. Form XObjects recurse depth-capped; inline
    * images (BI), /ImageMask, custom /Decode arrays, K > 0 and
    * non-Device colorspaces reject BY NAME — never silent garbage. */
  def extractImages(bytes: Array[Byte]): Seq[PdfImage] = {
    val s = new String(bytes, ISO_8859_1)
    require(s.startsWith("%PDF-"), "PdfCodec: not a PDF (missing %PDF- header)")
    val objs = scanObjects(s, bytes)
    val byNum = objs.map(o => o.num -> o).toMap
    val out = mutable.Buffer.empty[PdfImage]
    pageOrder(objs, byNum).zipWithIndex.foreach { case (pn, pageIdx) =>
      val page = byNum(pn)
      val content = contentRefs(page.dict).map { ref =>
        val obj = byNum.getOrElse(ref,
          throw new IllegalArgumentException(s"PdfCodec: /Contents $ref 0 R not found"))
        decodeStream(obj, byNum)
      }
      val res = resourcesOf(page, byNum)
      collectImages(content.mkString("\n"), xobjectsOf(res, byNum), byNum,
        pageIdx, depth = 0, out)
    }
    out.toSeq
  }

  private def isSubtype(dict: String, sub: String): Boolean =
    (s"""/Subtype\\s*/$sub(?![a-zA-Z])""").r.findFirstIn(dict).isDefined

  /** The `Do`/`BI` walk of one content stream: the token rules mirror
    * [[extractFromContent]]'s operand scan (strings, dicts, arrays,
    * comments, names, numbers), but only XObject invocations matter. */
  private def collectImages(content: String, xobjects: Map[String, PdfObj],
                            byNum: Map[Int, PdfObj], pageIdx: Int, depth: Int,
                            out: mutable.Buffer[PdfImage]): Unit = {
    var lastName: String = null
    var p = 0
    val n = content.length
    while (p < n) {
      val c = content.charAt(p)
      if (c.isWhitespace) p += 1
      else if (c == '%') { while (p < n && content.charAt(p) != '\n') p += 1 }
      else if (c == '(') p = literalStringEnd(content, p)
      else if (c == '<' && p + 1 < n && content.charAt(p + 1) == '<')
        p = balancedDictEnd(content, p)
      else if (c == '<') {
        val end = content.indexOf('>', p)
        require(end >= 0, "PdfCodec: unterminated hex string")
        p = end + 1
      }
      else if (c == '[') p = parseArray(content, p)._2
      else if (c == '/') {
        val st = p + 1
        p = st
        while (p < n && !content.charAt(p).isWhitespace &&
          !"()<>[]/%".contains(content.charAt(p))) p += 1
        lastName = content.substring(st, p)
      }
      else if (c == '+' || c == '-' || c == '.' || c.isDigit) {
        p += 1
        while (p < n && !content.charAt(p).isWhitespace &&
          !"()<>[]/%".contains(content.charAt(p))) p += 1
      }
      else {
        val st = p
        while (p < n && !content.charAt(p).isWhitespace &&
          !"()<>[]/%".contains(content.charAt(p))) p += 1
        require(p > st, s"PdfCodec: unexpected delimiter '${content.charAt(p)}' " +
          s"at content offset $p — malformed content stream")
        content.substring(st, p) match {
          case "Do" if lastName != null =>
            xobjects.get(lastName) match {
              case Some(x) if isSubtype(x.dict, "Image") =>
                val (w, h, ch, px) = decodeImageXObject(x, byNum)
                out += PdfImage(pageIdx, lastName, w, h, ch, px)
              case Some(x) if isSubtype(x.dict, "Form") =>
                require(depth < 8,
                  s"PdfCodec: Form XObject nesting exceeds depth 8 (cycle?) at /$lastName")
                val res = resolveDict(x.dict, "Resources", byNum)
                collectImages(decodeStream(x, byNum),
                  if (res.isDefined) xobjectsOf(res, byNum) else xobjects,
                  byNum, pageIdx, depth + 1, out)
              case Some(x) => throw new IllegalArgumentException(
                s"PdfCodec: XObject /$lastName (object ${x.num}) has an " +
                  "unsupported /Subtype (Image or Form)")
              case None => throw new IllegalArgumentException(
                s"PdfCodec: /$lastName Do names no XObject in /Resources")
            }
          case "BI" =>
            p = parseInlineImage(content, p, pageIdx, out)
          case _ => ()
        }
      }
    }
  }

  /** BI…ID…EI inline image (§8.9.7 — round 20, the last by-name PDF
    * image gap: fax-era writers emit them). Scope: 8-bit DeviceGray/
    * DeviceRGB (abbreviated /G /RGB or full names) samples, RAW
    * (unfiltered — the data length is then EXACT, rowBytes·h, no EI
    * scanning heuristics) or /AHx ASCIIHex (self-terminating '>').
    * Filtered binary data (/Fl /DCT /CCF…), /IM stencils, /D decode
    * arrays, array values and other colorspaces reject BY NAME —
    * guessing where EI falls inside arbitrary compressed data is the
    * classic silent-corruption trap, so out-of-scope forms fail loud.
    * Returns the position just past the EI token. */
  private def parseInlineImage(content: String, at0: Int, pageIdx: Int,
                               out: mutable.Buffer[PdfImage]): Int = {
    val n = content.length
    var p = at0
    val kv = mutable.Map.empty[String, String]
    def skipWs(): Unit = { while (p < n && content.charAt(p).isWhitespace) p += 1 }
    def token(): String = {
      val st = p
      if (p < n && content.charAt(p) == '/') p += 1
      while (p < n && !content.charAt(p).isWhitespace &&
        !"()<>[]/%".contains(content.charAt(p))) p += 1
      require(p > st, s"PdfCodec: page $pageIdx inline image: empty token")
      content.substring(st, p)
    }
    var done = false
    while (!done) {
      skipWs()
      require(p < n, s"PdfCodec: page $pageIdx inline image: no ID token")
      if (content.startsWith("ID", p) &&
          (p + 2 >= n || !content.charAt(p + 2).isLetterOrDigit)) {
        p += 2
        done = true
      } else {
        require(content.charAt(p) == '/',
          s"PdfCodec: page $pageIdx inline image: expected a /key at " +
            s"'${content.charAt(p)}'")
        val key = token().stripPrefix("/")
        skipWs()
        require(p < n && content.charAt(p) != '[',
          s"PdfCodec: page $pageIdx inline image: array value for $key unsupported")
        kv(key) = token()
      }
    }
    // exactly one whitespace byte separates ID from the data
    require(p < n && content.charAt(p).isWhitespace,
      s"PdfCodec: page $pageIdx inline image: ID not followed by whitespace")
    p += 1
    def dim(short: String, long: String): Int = {
      val v = kv.get(short).orElse(kv.get(long)).getOrElse(
        throw new IllegalArgumentException(
          s"PdfCodec: page $pageIdx inline image has no /$short"))
      require(v.forall(_.isDigit),
        s"PdfCodec: page $pageIdx inline image /$short '$v' is not a number")
      v.toInt
    }
    val w = dim("W", "Width")
    val h = dim("H", "Height")
    require(w > 0 && h > 0 && w.toLong * h <= (1L << 30),
      s"PdfCodec: page $pageIdx inline image geometry ${w}x$h")
    val bpc = kv.get("BPC").orElse(kv.get("BitsPerComponent")).getOrElse("8")
    require(bpc == "8",
      s"PdfCodec: page $pageIdx inline image /BPC $bpc unsupported (8)")
    require(!kv.get("IM").orElse(kv.get("ImageMask")).contains("true"),
      s"PdfCodec: page $pageIdx inline image is an /IM stencil — unsupported")
    require(!kv.contains("D") && !kv.contains("Decode"),
      s"PdfCodec: page $pageIdx inline image /Decode array unsupported")
    val ch = kv.get("CS").orElse(kv.get("ColorSpace")) match {
      case Some("/G") | Some("/DeviceGray") => 1
      case Some("/RGB") | Some("/DeviceRGB") => 3
      case Some(other) => throw new IllegalArgumentException(
        s"PdfCodec: page $pageIdx inline image colorspace $other unsupported " +
          "(/G, /RGB)")
      case None => throw new IllegalArgumentException(
        s"PdfCodec: page $pageIdx inline image has no /CS")
    }
    val filter = kv.get("F").orElse(kv.get("Filter"))
    // LONG math: w·h ≤ 2^30 but ×3 channels can wrap an Int, and a
    // wrapped-negative count would slip the bounds check below
    val wantBytes = w.toLong * h * ch
    val pixels: Array[Byte] = filter match {
      case None =>
        require(p + wantBytes <= n,
          s"PdfCodec: page $pageIdx inline image: $wantBytes raw bytes run past EOF")
        val nBytes = wantBytes.toInt
        val px = new Array[Byte](nBytes)
        var i = 0
        while (i < nBytes) { px(i) = content.charAt(p + i).toByte; i += 1 }
        p += nBytes
        px
      case Some("/AHx") | Some("/ASCIIHexDecode") =>
        val end = content.indexOf('>', p)
        require(end >= 0,
          s"PdfCodec: page $pageIdx inline image: unterminated AHx data")
        val hex = content.substring(p, end + 1)
        p = end + 1
        val px = asciiHexDecode(hex.getBytes(ISO_8859_1))
        require(px.length.toLong == wantBytes,
          s"PdfCodec: page $pageIdx inline image: ${px.length} AHx bytes, " +
            s"geometry wants $wantBytes")
        px
      case Some(other) => throw new IllegalArgumentException(
        s"PdfCodec: page $pageIdx inline image filter $other unsupported " +
          "(raw samples or /AHx — EI inside compressed data is unscannable)")
    }
    skipWs()
    require(content.startsWith("EI", p) &&
      (p + 2 >= n || !content.charAt(p + 2).isLetterOrDigit),
      s"PdfCodec: page $pageIdx inline image: data not terminated by EI")
    out += PdfImage(pageIdx, "BI", w, h, ch, pixels)
    p + 2
  }

  /** Decode one image XObject to 8-bit channel-interleaved samples:
    * (width, height, channels, pixels). */
  private def decodeImageXObject(obj: PdfObj,
                                 byNum: Map[Int, PdfObj]): (Int, Int, Int, Array[Byte]) = {
    val dict = obj.dict
    val num = obj.num
    def need(name: String): Int = dictInt(dict, name, byNum).getOrElse(
      throw new IllegalArgumentException(s"PdfCodec: image object $num has no /$name"))
    val w = need("Width")
    val h = need("Height")
    require(w > 0 && h > 0, s"PdfCodec: image object $num geometry ${w}x$h")
    require(w.toLong * h <= (1L << 30),
      s"PdfCodec: image object $num ${w}x$h exceeds the 2^30 pixel guard")
    require("""/ImageMask\s+true""".r.findFirstIn(dict).isEmpty,
      s"PdfCodec: image object $num is an /ImageMask stencil — unsupported")
    require("""/Decode\s*\[""".r.findFirstIn(dict).isEmpty,
      s"PdfCodec: image object $num carries a custom /Decode array — unsupported")
    require("""/DecodeParms\s*\[""".r.findFirstIn(dict).isEmpty,
      s"PdfCodec: image object $num: array-form /DecodeParms unsupported")
    val bpc = need("BitsPerComponent")
    // /Indexed palette colorspace (round 20, VERDICT r19 #6 — the
    // common scanned-color shape): `[/Indexed base hival lookup]` with
    // base /DeviceRGB, the lookup a hex string or an indirect stream;
    // other bases and literal-string lookups reject by name
    val indexedM = """/ColorSpace\s*\[\s*/Indexed\s*/(\w+)\s+(\d+)\s+"""
      .r.findFirstMatchIn(dict)
    val (csName, ch, palette) = indexedM match {
      case Some(m) =>
        require(m.group(1) == "DeviceRGB",
          s"PdfCodec: image object $num /Indexed base /${m.group(1)} " +
            "unsupported (DeviceRGB)")
        val hival = m.group(2).toInt
        require(hival >= 0 && hival <= 255,
          s"PdfCodec: image object $num /Indexed hival $hival out of range")
        val rest = dict.substring(m.end)
        val pal: Array[Byte] =
          if (rest.startsWith("<")) {
            val end = rest.indexOf('>')
            require(end > 0,
              s"PdfCodec: image object $num: unterminated /Indexed hex lookup")
            val hex = rest.substring(1, end).filterNot(_.isWhitespace)
            require(hex.length % 2 == 0 &&
              hex.forall(c => Character.digit(c, 16) >= 0),
              s"PdfCodec: image object $num: malformed /Indexed hex lookup")
            hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
          } else """^(\d+)\s+\d+\s+R""".r.findFirstMatchIn(rest) match {
            case Some(ref) =>
              val palObj = byNum.getOrElse(ref.group(1).toInt,
                throw new IllegalArgumentException(
                  s"PdfCodec: image object $num: /Indexed lookup object " +
                    s"${ref.group(1)} missing"))
              decodeStream(palObj, byNum).getBytes(ISO_8859_1)
            case None => throw new IllegalArgumentException(
              s"PdfCodec: image object $num: /Indexed lookup form " +
                "unsupported (hex string or stream reference)")
          }
        require(pal.length == 3 * (hival + 1),
          s"PdfCodec: image object $num: /Indexed lookup holds " +
            s"${pal.length} bytes, hival $hival wants ${3 * (hival + 1)}")
        ("Indexed", 3, Some((pal, hival)))
      case None =>
        val name = """/ColorSpace\s*/([A-Za-z0-9]+)""".r.findFirstMatchIn(dict)
          .map(_.group(1)).getOrElse(throw new IllegalArgumentException(
            s"PdfCodec: image object $num has no direct name /ColorSpace " +
              "(DeviceGray / DeviceRGB / [Indexed DeviceRGB])"))
        name match {
          case "DeviceGray" => (name, 1, None)
          case "DeviceRGB" => (name, 3, None)
          case other => throw new IllegalArgumentException(
            s"PdfCodec: image object $num colorspace /$other unsupported " +
              "(DeviceGray / DeviceRGB / [Indexed DeviceRGB])")
        }
    }
    val raw = obj.stream.getOrElse(throw new IllegalArgumentException(
      s"PdfCodec: image object $num has no stream data"))
    val filters: Seq[String] = parseFilters(dict)
    val parms = resolveDict(dict, "DecodeParms", byNum)
      .orElse(resolveDict(dict, "DP", byNum)).getOrElse("")
    val pd = parms + " " + dict
    def parm(name: String, default: Int): Int =
      (s"""/$name\\s+(-?\\d+)""").r.findFirstMatchIn(pd)
        .map(_.group(1).toInt).getOrElse(default)
    def parmBool(name: String, default: Boolean): Boolean =
      (s"""/$name\\s+(true|false)""").r.findFirstMatchIn(pd)
        .map(_.group(1) == "true").getOrElse(default)
    // prefix filters run first; at most ONE terminal image filter ends
    // the chain (a filter AFTER DCT/CCITT/JBIG2 would re-encode pixels)
    val (pre, terminal) =
      filters.span(f => f != "DCTDecode" && f != "CCITTFaxDecode" &&
        f != "JBIG2Decode")
    require(terminal.length <= 1, s"PdfCodec: image object $num declares " +
      s"filters after the ${terminal.headOption.getOrElse("")} image filter")
    val preDecoded = pre.foldLeft(raw)((data, f) =>
      applyBaseFilter(f, data, num))
    terminal.headOption match {
      case None =>
        // raw samples (possibly predictor-coded under Flate/LZW)
        require(bpc == 8, s"PdfCodec: image object $num: raw samples at " +
          s"/BitsPerComponent $bpc unsupported (8 only)")
        val data =
          if (pre.exists(f => f == "FlateDecode" || f == "LZWDecode"))
            unpredict(preDecoded, parm("Predictor", 1), parm("Colors", 1),
              parm("BitsPerComponent", 8), parm("Columns", 1), num)
          else preDecoded
        palette match {
          case Some((pal, hival)) =>
            // samples are palette INDICES, one component each
            require(data.length == w * h,
              s"PdfCodec: image object $num: ${data.length} index bytes, " +
                s"geometry wants ${w * h}")
            val rgb = new Array[Byte](w * h * 3)
            var j = 0
            while (j < data.length) {
              // §8.6.6.3: out-of-range indices CLAMP (normative)
              val idx = math.min(data(j) & 0xff, hival)
              rgb(3 * j) = pal(3 * idx)
              rgb(3 * j + 1) = pal(3 * idx + 1)
              rgb(3 * j + 2) = pal(3 * idx + 2)
              j += 1
            }
            (w, h, 3, rgb)
          case None =>
            require(data.length == w * h * ch,
              s"PdfCodec: image object $num: ${data.length} sample bytes, " +
                s"geometry wants ${w * h * ch}")
            (w, h, ch, data)
        }
      case Some("DCTDecode") =>
        require(palette.isEmpty, s"PdfCodec: image object $num: /Indexed " +
          "palette with /DCTDecode unsupported")
        require(bpc == 8, s"PdfCodec: image object $num: /DCTDecode at " +
          s"/BitsPerComponent $bpc (8 only)")
        val img = graft.multimodal.JpegCodec.decode(preDecoded)
        require(img.width == w && img.height == h,
          s"PdfCodec: image object $num: JPEG is ${img.width}x${img.height}, " +
            s"dict declares ${w}x$h")
        require(img.components == ch,
          s"PdfCodec: image object $num: JPEG has ${img.components} components, " +
            s"/ColorSpace /$csName wants $ch")
        (w, h, ch, img.pixels)
      case Some("JBIG2Decode") =>
        require(palette.isEmpty, s"PdfCodec: image object $num: /Indexed " +
          "palette with /JBIG2Decode unsupported")
        require(bpc == 1 && ch == 1,
          s"PdfCodec: image object $num: /JBIG2Decode wants " +
            "/BitsPerComponent 1 /DeviceGray")
        require(!pd.contains("/JBIG2Globals"),
          s"PdfCodec: image object $num: /JBIG2Globals streams unsupported " +
            "(embedded segments only)")
        val (jw, jh, packed) = graft.multimodal.Jbig2Codec.decode(preDecoded)
        require(jw == w && jh == h,
          s"PdfCodec: image object $num: JBIG2 region is ${jw}x$jh, " +
            s"dict declares ${w}x$h")
        // JBIG2 bit 1 = black; DeviceGray sample 0 = black (the same
        // inversion every PDF JBIG2 consumer applies)
        val rowBytes = (w + 7) / 8
        val px = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val bit = (packed(y * rowBytes + (x >> 3)) >> (7 - (x & 7))) & 1
            px(y * w + x) = ((1 - bit) * 255).toByte
            x += 1
          }
          y += 1
        }
        (w, h, 1, px)
      case Some("CCITTFaxDecode") =>
        require(palette.isEmpty, s"PdfCodec: image object $num: /Indexed " +
          "palette with /CCITTFaxDecode unsupported")
        require(bpc == 1 && ch == 1,
          s"PdfCodec: image object $num: /CCITTFaxDecode wants " +
            "/BitsPerComponent 1 /DeviceGray")
        val k = parm("K", 0)
        val cols = parm("Columns", 1728)
        require(cols == w, s"PdfCodec: image object $num: /Columns $cols " +
          s"contradicts /Width $w")
        val rows = parm("Rows", h)
        require(rows == h, s"PdfCodec: image object $num: /Rows $rows " +
          s"contradicts /Height $h")
        val blackIs1 = parmBool("BlackIs1", default = false)
        val mode =
          if (k < 0) 4 // G4 / T.6 MMR (the wild scanned-document norm)
          else if (k == 0 && parmBool("EncodedByteAlign", default = false)) 2
          else if (k == 0 && parmBool("EndOfLine", default = false)) 3
          else throw new IllegalArgumentException(
            s"PdfCodec: image object $num: CCITT /K $k unsupported " +
              "(K < 0 G4; K = 0 with /EncodedByteAlign or /EndOfLine; " +
              "K > 0 mixed 2-D out of scope)")
        val packed = graft.multimodal.CcittCodec.decode(
          preDecoded, 0, preDecoded.length, cols, rows, mode)
        // filter sample = BlackIs1 ? blackBit : !blackBit; DeviceGray at
        // 1 bpc maps sample s to gray s·255 — with the default
        // BlackIs1 false, black pixels come out gray 0 as rendered
        val rowBytes = (cols + 7) / 8
        val px = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val blackBit = (packed(y * rowBytes + (x >> 3)) >> (7 - (x & 7))) & 1
            val sample = if (blackIs1) blackBit else 1 - blackBit
            px(y * w + x) = (sample * 255).toByte
            x += 1
          }
          y += 1
        }
        (w, h, 1, px)
      case Some(other) => throw new IllegalArgumentException(
        s"PdfCodec: image object $num filter /$other unsupported")
    }
  }

  /** One synthesized image page for [[encodeImagePdf]]: 8-bit gray (1)
    * or RGB (3) `pixels` carried as the page's sole image XObject under
    * `filter` — "Flate" (raw samples), "DCT" (JpegCodec quality 90) or
    * "CCITT" (G4 when `ccittG4`, else byte-aligned MH with
    * /EncodedByteAlign). CCITT pages must be bilevel 0/255 gray.
    * `indexed` ("hex" | "stream") re-expresses an RGB Flate page as an
    * `[/Indexed /DeviceRGB hival lookup]` palette image — same decoded
    * pixels, palette wire form (≤256 distinct colors required); the
    * lookup rides inline as a hex string or as an indirect stream. */
  final case class ImagePageSpec(width: Int, height: Int, channels: Int,
                                 pixels: Array[Byte], filter: String,
                                 ccittG4: Boolean = true,
                                 indexed: String = "",
                                 jbig2Stripes: Int = 1)

  /** Write a scanned-document-shaped PDF: one image XObject per page,
    * painted by a `cm`-scaled `Do` — the fixture writer that lets
    * [[extractImages]] be oracle-gated end-to-end on real bytes. */
  def encodeImagePdf(pages: Seq[ImagePageSpec]): Array[Byte] = {
    require(pages.nonEmpty, "PdfCodec.encodeImagePdf: no pages")
    val out = new ByteArrayOutputStream()
    val offsets = mutable.Buffer.empty[(Int, Int)]
    def w(str: String): Unit = out.write(str.getBytes(ISO_8859_1))
    w("%PDF-1.4\n%\u00e2\u00e3\u00cf\u00d3\n")
    def beginObj(num: Int): Unit = { offsets += (num -> out.size()); w(s"$num 0 obj\n") }
    beginObj(1); w("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    val nPages = pages.length
    val kids = (0 until nPages).map(i => s"${3 + 3 * i} 0 R").mkString(" ")
    beginObj(2); w(s"<< /Type /Pages /Kids [ $kids ] /Count $nPages >>\nendobj\n")
    // stream-form /Indexed palettes get object numbers past the pages
    var nextExtra = 3 + 3 * nPages
    val extraPalettes = mutable.Buffer.empty[(Int, Array[Byte])]
    pages.zipWithIndex.foreach { case (spec, i) =>
      val pw = spec.width; val ph = spec.height; val ch = spec.channels
      require(ch == 1 || ch == 3,
        s"PdfCodec.encodeImagePdf: $ch channels (1 or 3)")
      require(spec.pixels.length == pw * ph * ch,
        s"PdfCodec.encodeImagePdf: ${spec.pixels.length} pixel bytes for " +
          s"${pw}x$ph x$ch")
      val pageNum = 3 + 3 * i
      val contNum = pageNum + 1
      val imgNum = pageNum + 2
      // INLINE pages carry the image as a BI…ID…EI sequence in the
      // content stream itself (no XObject); the image object slot
      // becomes a null placeholder so numbering stays contiguous
      val inline = spec.filter == "INLINE" || spec.filter == "INLINEAHX"
      beginObj(pageNum)
      val res = if (inline) "<< >>"
        else s"<< /XObject << /Im0 $imgNum 0 R >> >>"
      w(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 $pw $ph] " +
        s"/Resources $res /Contents $contNum 0 R >>\nendobj\n")
      val content =
        if (!inline) s"q $pw 0 0 $ph 0 0 cm /Im0 Do Q"
        else {
          val cs = if (ch == 3) "/RGB" else "/G"
          val (fDecl, payload) =
            if (spec.filter == "INLINEAHX")
              (" /F /AHx", spec.pixels.map(b => f"${b & 0xff}%02X").mkString + ">")
            else ("", new String(spec.pixels, ISO_8859_1))
          s"q $pw 0 0 $ph 0 0 cm BI /W $pw /H $ph /CS $cs /BPC 8$fDecl ID " +
            payload + " EI Q"
        }
      beginObj(contNum)
      w(s"<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n")
      if (inline) {
        beginObj(imgNum)
        w("null\nendobj\n")
      }
      // /Indexed wire form: palette + indices in place of RGB samples
      val indexedWire: Option[(Array[Byte], Array[Byte])] =
        if (inline || spec.indexed.isEmpty) None
        else {
          require(ch == 3 && spec.filter == "Flate",
            "PdfCodec.encodeImagePdf: indexed pages are RGB Flate")
          require(spec.indexed == "hex" || spec.indexed == "stream",
            s"PdfCodec.encodeImagePdf: indexed form '${spec.indexed}'")
          val colorIdx = mutable.LinkedHashMap.empty[Int, Int]
          val indices = new Array[Byte](pw * ph)
          var j = 0
          while (j < pw * ph) {
            val key = ((spec.pixels(3 * j) & 0xff) << 16) |
              ((spec.pixels(3 * j + 1) & 0xff) << 8) |
              (spec.pixels(3 * j + 2) & 0xff)
            val idx = colorIdx.getOrElseUpdate(key, colorIdx.size)
            require(idx < 256,
              "PdfCodec.encodeImagePdf: indexed page exceeds 256 colors")
            indices(j) = idx.toByte
            j += 1
          }
          val pal = new Array[Byte](3 * colorIdx.size)
          colorIdx.foreach { case (key, idx) =>
            pal(3 * idx) = ((key >> 16) & 0xff).toByte
            pal(3 * idx + 1) = ((key >> 8) & 0xff).toByte
            pal(3 * idx + 2) = (key & 0xff).toByte
          }
          Some((pal, indices))
        }
      if (!inline) {
      val cs = indexedWire match {
        case Some((pal, _)) =>
          val hival = pal.length / 3 - 1
          if (spec.indexed == "hex")
            s"[/Indexed /DeviceRGB $hival <${pal.map(b => f"${b & 0xff}%02X").mkString}>]"
          else {
            val palNum = nextExtra
            nextExtra += 1
            extraPalettes += palNum -> pal
            s"[/Indexed /DeviceRGB $hival $palNum 0 R]"
          }
        case None => if (ch == 3) "/DeviceRGB" else "/DeviceGray"
      }
      val (data, filterDecl, bpc) = spec.filter match {
        case "Flate" => (deflate(indexedWire.map(_._2).getOrElse(spec.pixels)),
          " /Filter /FlateDecode", 8)
        case "DCT" =>
          (graft.multimodal.JpegCodec.encode(pw, ph, ch, spec.pixels, quality = 90),
            " /Filter /DCTDecode", 8)
        case "CCITT" =>
          require(ch == 1, "PdfCodec.encodeImagePdf: CCITT pages are gray")
          spec.pixels.foreach(b => require(b == 0 || b == -1,
            "PdfCodec.encodeImagePdf: CCITT pages must be bilevel 0/255"))
          val rowBytes = (pw + 7) / 8
          val packed = new Array[Byte](rowBytes * ph)
          var y = 0
          while (y < ph) {
            var x = 0
            while (x < pw) {
              if (spec.pixels(y * pw + x) == 0) // gray 0 = black = bit 1
                packed(y * rowBytes + (x >> 3)) =
                  (packed(y * rowBytes + (x >> 3)) | (1 << (7 - (x & 7)))).toByte
              x += 1
            }
            y += 1
          }
          val mode = if (spec.ccittG4) 4 else 2
          val coded = graft.multimodal.CcittCodec.encode(
            packed, rowBytes, pw, ph, mode)
          val dp =
            if (spec.ccittG4) s"<< /K -1 /Columns $pw /Rows $ph >>"
            else s"<< /K 0 /EncodedByteAlign true /Columns $pw /Rows $ph >>"
          (coded, s" /Filter /CCITTFaxDecode /DecodeParms $dp", 1)
        case "JBIG2" | "JBIG2MMR" | "JBIG2TP" =>
          require(ch == 1, "PdfCodec.encodeImagePdf: JBIG2 pages are gray")
          spec.pixels.foreach(b => require(b == 0 || b == -1,
            "PdfCodec.encodeImagePdf: JBIG2 pages must be bilevel 0/255"))
          val rowBytes = (pw + 7) / 8
          val packed = new Array[Byte](rowBytes * ph)
          var y = 0
          while (y < ph) {
            var x = 0
            while (x < pw) {
              if (spec.pixels(y * pw + x) == 0) // gray 0 = black = bit 1
                packed(y * rowBytes + (x >> 3)) =
                  (packed(y * rowBytes + (x >> 3)) | (1 << (7 - (x & 7)))).toByte
              x += 1
            }
            y += 1
          }
          (graft.multimodal.Jbig2Codec.encode(pw, ph, packed,
            mmr = spec.filter == "JBIG2MMR",
            tpgdon = spec.filter == "JBIG2TP",
            stripes = spec.jbig2Stripes),
            " /Filter /JBIG2Decode", 1)
        case other => throw new IllegalArgumentException(
          s"PdfCodec.encodeImagePdf: filter $other (Flate / DCT / CCITT / JBIG2)")
      }
      beginObj(imgNum)
      w(s"<< /Type /XObject /Subtype /Image /Width $pw /Height $ph " +
        s"/ColorSpace $cs /BitsPerComponent $bpc$filterDecl " +
        s"/Length ${data.length} >>\nstream\n")
      out.write(data)
      w("\nendstream\nendobj\n")
      }
    }
    // palette streams (deflated — the reader's decodeStream path)
    extraPalettes.foreach { case (palNum, pal) =>
      val palData = deflate(pal)
      beginObj(palNum)
      w(s"<< /Filter /FlateDecode /Length ${palData.length} >>\nstream\n")
      out.write(palData)
      w("\nendstream\nendobj\n")
    }
    val xrefAt = out.size()
    val total = nextExtra
    w(s"xref\n0 $total\n0000000000 65535 f \n")
    offsets.sortBy(_._1).foreach { case (_, off) => w(f"$off%010d 00000 n \n") }
    w(s"trailer\n<< /Size $total /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  // ── font resolution ────────────────────────────────────────────────

  /** Dict-valued entry `/key`: either an inline `<<…>>` or an indirect
    * reference resolved through `byNum`. */
  private def resolveDict(dict: String, key: String, byNum: Map[Int, PdfObj]): Option[String] =
    ("/" + key + """(?![A-Za-z0-9])""").r.findFirstMatchIn(dict).flatMap { mm =>
      var p = mm.end
      while (p < dict.length && dict.charAt(p).isWhitespace) p += 1
      if (dict.startsWith("<<", p)) Some(dict.substring(p, balancedDictEnd(dict, p)))
      else """^(\d+)\s+\d+\s+R""".r.findFirstMatchIn(dict.substring(p))
        .flatMap(r => byNum.get(r.group(1).toInt).map(_.dict))
    }

  /** Recursion context for one page's content extraction: resolved
    * fonts, resolved Form XObjects, the object table (for nested
    * resource resolution inside forms), and the form-nesting depth. */
  private[graft] final case class PageCtx(fonts: Map[String, FontDec],
                                          xobjects: Map[String, PdfObj],
                                          byNum: Map[Int, PdfObj], depth: Int)

  /** The page's /Resources dict, inherited through the /Parent chain
    * (spec §7.7.3.4). */
  private def resourcesOf(page: PdfObj, byNum: Map[Int, PdfObj]): Option[String] = {
    var node: Option[PdfObj] = Some(page)
    var res: Option[String] = None
    var depth = 0
    while (res.isEmpty && node.isDefined && depth < 32) {
      res = resolveDict(node.get.dict, "Resources", byNum)
      node = dictRef(node.get.dict, "/Parent").flatMap(byNum.get)
      depth += 1
    }
    res
  }

  /** Name → stream object for every XObject the content can invoke with
    * `Do` (XObjects are streams, so entries are always indirect refs). */
  private def xobjectsOf(res: Option[String], byNum: Map[Int, PdfObj]): Map[String, PdfObj] = {
    val xDict = res.flatMap(r => resolveDict(r, "XObject", byNum)).getOrElse("")
    """/([A-Za-z0-9.+_-]+)\s+(\d+)\s+\d+\s+R""".r.findAllMatchIn(xDict).flatMap { m =>
      byNum.get(m.group(2).toInt).map(m.group(1) -> _)
    }.toMap
  }

  /** Resource-name → decoder for every font the content can select with Tf. */
  private def fontsOf(res: Option[String], byNum: Map[Int, PdfObj]): Map[String, FontDec] = {
    val fontDict = res.flatMap(r => resolveDict(r, "Font", byNum)).getOrElse("")
    // entries are `/Name N 0 R` OR a legal INLINE dict `/Name << … >>` —
    // matching only the ref form would silently decode an inline
    // composite font as SimpleFont (garbage, violating the fail-loud
    // contract), so walk the dict with a cursor
    val out = mutable.Map.empty[String, FontDec]
    val nameRe = """/([A-Za-z0-9.+_-]+)""".r
    var cursor = if (fontDict.startsWith("<<")) 2 else 0
    while (cursor < fontDict.length) {
      nameRe.findFirstMatchIn(fontDict.substring(cursor)) match {
        case None => cursor = fontDict.length
        case Some(m) =>
          val name = m.group(1)
          var p = cursor + m.end
          while (p < fontDict.length && fontDict.charAt(p).isWhitespace) p += 1
          if (fontDict.startsWith("<<", p)) {
            val end = balancedDictEnd(fontDict, p)
            out(name) = fontFor(PdfObj(-1, fontDict.substring(p, end), None), byNum)
            cursor = end
          } else """^(\d+)\s+\d+\s+R""".r.findFirstMatchIn(fontDict.substring(p)) match {
            case Some(r) =>
              val ref = r.group(1).toInt
              out(name) = fontFor(byNum.getOrElse(ref, throw new IllegalArgumentException(
                s"PdfCodec: font object $ref 0 R not found")), byNum)
              cursor = p + r.end
            case None => cursor = p // not a font entry (stray name) — keep walking
          }
      }
    }
    out.toMap
  }

  private def fontFor(obj: PdfObj, byNum: Map[Int, PdfObj]): FontDec = {
    val d = obj.dict
    if ("""/Subtype\s*/Type0(?![A-Za-z0-9])""".r.findFirstIn(d).isEmpty) {
      // simple font: honor an /Encoding dict's /Differences array
      // (spec §9.6.6.3) — the glyph-name remap real subset fonts use
      // when they carry no /ToUnicode; codes decode through the glyph
      // list, unlisted codes keep the Latin-1 base. An /Encoding that is
      // just a base-encoding NAME keeps today's SimpleFont scope.
      resolveDict(d, "Encoding", byNum) match {
        case Some(encDict) if encDict.contains("/Differences") =>
          DifferencesFont(parseDifferences(encDict, obj.num), obj.num)
        case _ =>
          // SYMBOLIC TrueType with no /Encoding at all (the subset-font
          // shape whose byte codes are private to the font): Latin-1
          // would be silent garbage. With an embedded program, decode
          // through its cmap (TrueTypeFont); without one the text is
          // unrecoverable — fail loud. A nonsymbolic font, or one that
          // names a base encoding, keeps the SimpleFont scope.
          val isTrueType =
            """/Subtype\s*/TrueType(?![A-Za-z0-9])""".r.findFirstIn(d).isDefined
          val isType1 =
            """/Subtype\s*/Type1(?![A-Za-z0-9])""".r.findFirstIn(d).isDefined
          val hasEncodingEntry =
            """/Encoding(?![A-Za-z0-9])""".r.findFirstIn(d).isDefined
          val desc = resolveDict(d, "FontDescriptor", byNum)
          val symbolic = desc.exists { dd =>
            // /Flags may be stored INDIRECTLY ("/Flags 9 0 R" — legal
            // for any numeric entry, §7.3.10): a bare \d+ match would
            // read the OBJECT number as the flags value and misroute a
            // nonsymbolic font through the glyph-program path
            """/Flags\s+(\d+)(?:\s+(\d+)\s+R)?""".r.findFirstMatchIn(dd).exists { m =>
              val value =
                if (m.group(2) == null) m.group(1).toInt
                else {
                  // an unresolvable flags object must fail LOUD — a
                  // silent nonsymbolic default would Latin-1 the
                  // private byte codes (the exact garbage this path
                  // exists to prevent)
                  val ref = m.group(1).toInt
                  val o = byNum.getOrElse(ref, throw new IllegalArgumentException(
                    s"PdfCodec: /Flags $ref 0 R not found"))
                  """^\d+$""".r.findFirstIn(o.dict.trim).map(_.toInt).getOrElse(
                    throw new IllegalArgumentException(
                      s"PdfCodec: /Flags object $ref holds no integer"))
                }
              (value & 4) != 0
            }
          }
          if ((isTrueType || isType1) && symbolic && !hasEncodingEntry) {
            dictRef(d, "/ToUnicode") match {
              case Some(tuRef) =>
                // an author-supplied /ToUnicode takes precedence over the
                // glyph-program derivation (spec §9.10.3) — its byte
                // codes key the same map shape
                val tuObj = byNum.getOrElse(tuRef, throw new IllegalArgumentException(
                  s"PdfCodec: /ToUnicode $tuRef 0 R not found"))
                GlyphProgFont(parseToUnicode(decodeStream(tuObj, byNum)), obj.num,
                  "author-supplied /ToUnicode CMap")
              case None =>
                val ff1 = desc.flatMap(dd => dictRef(dd, "/FontFile(?![A-Za-z0-9])"))
                val ff2 = desc.flatMap(dd => dictRef(dd, "/FontFile2"))
                val ff3 = desc.flatMap(dd => dictRef(dd, "/FontFile3"))
                (ff1, ff2, ff3) match {
                  case (Some(ref), None, None) =>
                    // /FontFile holds a Type 1 program (spec Table 126):
                    // eexec-decrypted, builtin /Encoding + /CharStrings
                    // names → Unicode (Type1Font). /Length1 and /Length2
                    // locate the clear and encrypted sections; they may
                    // be stored indirectly (§7.3.10).
                    val ffObj = byNum.getOrElse(ref, throw new IllegalArgumentException(
                      s"PdfCodec: /FontFile $ref 0 R not found"))
                    val program = decodeStream(ffObj, byNum).getBytes(ISO_8859_1)
                    val isPfb = program.length >= 2 && (program(0) & 0xff) == 0x80
                    def ffLen(name: String): Int =
                      if (isPfb) 0 // segment headers carry their own lengths
                      else dictInt(ffObj.dict, name, byNum).getOrElse(
                        throw new IllegalArgumentException(
                          s"PdfCodec: font object ${obj.num}: /FontFile without " +
                            s"/$name — cannot locate the eexec section"))
                    GlyphProgFont(Type1Font.codeToUnicode(program,
                      ffLen("Length1"), ffLen("Length2"), obj.num), obj.num,
                      "Type 1 program's builtin /Encoding (eexec)")
                  case (None, Some(ref), None) =>
                    val ffObj = byNum.getOrElse(ref, throw new IllegalArgumentException(
                      s"PdfCodec: /FontFile2 $ref 0 R not found"))
                    val program = decodeStream(ffObj, byNum).getBytes(ISO_8859_1)
                    // spec Table 126: /FontFile2 holds a TRUETYPE-outline
                    // program; an OTTO wrapper belongs under /FontFile3
                    // /OpenType — since TrueTypeFont now accepts OTTO,
                    // gate the mislabeled shape here rather than decode
                    // it silently
                    require(!(program.length >= 4 && program(0) == 'O' &&
                        program(1) == 'T' && program(2) == 'T' && program(3) == 'O'),
                      s"PdfCodec: font object ${obj.num}: /FontFile2 holds an OTTO " +
                        "(OpenType/CFF) program — the spec shape is /FontFile3 " +
                        "/Subtype /OpenType")
                    GlyphProgFont(TrueTypeFont.symbolCodeToUnicode(program, obj.num),
                      obj.num, "embedded TrueType program's cmap")
                  case (None, None, Some(ref)) =>
                    // /FontFile3 carries either a bare CFF program
                    // (/Subtype /Type1C — the four-hop CffFont path) or
                    // an OpenType WRAPPER (/Subtype /OpenType — an sfnt
                    // whose cmap the TrueType path reads; the CFF
                    // outlines inside are irrelevant to extraction)
                    val ffObj = byNum.getOrElse(ref, throw new IllegalArgumentException(
                      s"PdfCodec: /FontFile3 $ref 0 R not found"))
                    val isType1C = """/Subtype\s*/Type1C(?![A-Za-z0-9])""".r
                      .findFirstIn(ffObj.dict).isDefined
                    val isOpenType = """/Subtype\s*/OpenType(?![A-Za-z0-9])""".r
                      .findFirstIn(ffObj.dict).isDefined
                    require(isType1C || isOpenType,
                      s"PdfCodec: font object ${obj.num}: /FontFile3 without " +
                        "/Subtype /Type1C or /OpenType")
                    val program = decodeStream(ffObj, byNum).getBytes(ISO_8859_1)
                    if (isType1C)
                      GlyphProgFont(CffFont.codeToUnicode(program, obj.num), obj.num,
                        "CFF program's encoding/charset (four-hop)")
                    else
                      GlyphProgFont(
                        TrueTypeFont.symbolCodeToUnicode(program, obj.num), obj.num,
                        "OpenType-wrapped program's cmap")
                  case (None, None, None) => throw new IllegalArgumentException(
                    s"PdfCodec: font object ${obj.num}: symbolic simple font with " +
                      "no /Encoding, no /ToUnicode and no embedded /FontFile " +
                      "(Type 1), /FontFile2 (TrueType) or /FontFile3 (Type1C/" +
                      "OpenType) program — codes cannot be mapped to text")
                  case _ => throw new IllegalArgumentException(
                    s"PdfCodec: font object ${obj.num}: FontDescriptor carries " +
                      "more than one /FontFile* program — ambiguous (spec " +
                      "Table 124 allows at most one)")
                }
            }
          } else SimpleFont
      }
    }
    else {
      def toUnicodeStream: String = {
        val tuRef = dictRef(d, "/ToUnicode").getOrElse(throw new IllegalArgumentException(
          s"PdfCodec: composite font object ${obj.num} has no /ToUnicode CMap — " +
            "codes cannot be mapped to text"))
        val tuObj = byNum.getOrElse(tuRef, throw new IllegalArgumentException(
          s"PdfCodec: /ToUnicode $tuRef 0 R not found"))
        decodeStream(tuObj, byNum)
      }
      val encName = """/Encoding\s*/([A-Za-z0-9-]+)""".r.findFirstMatchIn(d).map(_.group(1))
      val encRef = dictRef(d, "/Encoding")
      if (encName.exists(e => e == "Identity-H" || e == "Identity-V"))
        CompositeFont(parseToUnicode(toUnicodeStream))
      else encName.flatMap(PredefCmaps.forName) match {
        case Some(pc) =>
          // PREDEFINED CMap (spec §9.7.5.2): the built-in table supplies
          // the codespace ranges (tokenization) and, when the font
          // carries no /ToUnicode of its own, the code→Unicode mapping
          // too. A font-supplied /ToUnicode takes precedence (spec
          // §9.10.3) — it is the author's explicit extraction map.
          val toUni =
            if (dictRef(d, "/ToUnicode").isDefined) parseToUnicodeWide(toUnicodeStream)
            else pc.toUni
          CmapFont(pc.codespaces, toUni, obj.num)
        case None => encRef.flatMap(byNum.get) match {
        case Some(encObj) if encObj.stream.isDefined =>
          // EMBEDDED CMap (spec §9.7.5.3): variable-width codes per its
          // codespace ranges. `usecmap` pulls in a predefined base whose
          // tables we don't carry — refuse rather than garble.
          val cmap = decodeStream(encObj, byNum)
          require(!cmap.contains("usecmap"),
            s"PdfCodec: composite font object ${obj.num}: embedded /Encoding CMap " +
              "uses `usecmap` (predefined base CMap) — out of scope")
          val spaces = parseCodespaces(cmap, obj.num)
          require(spaces.nonEmpty,
            s"PdfCodec: composite font object ${obj.num}: embedded /Encoding CMap " +
              "declares no codespace ranges")
          CmapFont(spaces, parseToUnicodeWide(toUnicodeStream), obj.num)
        case Some(other) => throw new IllegalArgumentException(
          s"PdfCodec: composite font object ${obj.num}: /Encoding ${other.num} 0 R " +
            "is not a CMap stream")
        case None => throw new IllegalArgumentException(
          s"PdfCodec: composite font object ${obj.num}: only /Identity-H|V, the " +
            "built-in predefined CMaps (90ms-RKSJ, GBK-EUC, KSCms-UHC, the " +
            "Uni*-UCS2 and Uni*-UTF16 trios — -H and -V forms) or an EMBEDDED " +
            "/Encoding CMap stream supported" +
            encName.fold(" (no /Encoding)")(e =>
              s"; predefined CMap /$e would need tables this engine doesn't carry"))
        }
      }
    }
  }

  /** `begincodespacerange … endcodespacerange` blocks of an embedded
    * CMap: (byteLen, lo, hi) triples; lo/hi hex must agree on byte
    * length (that length IS the code width per spec §9.7.6.2).
    * Ranges of DIFFERENT widths must be first-byte disjoint: the
    * tokenizer's shortest-match rule is equivalent to the spec's
    * byte-incremental prefix match only under that assumption, and a
    * file outside it would silently mis-tokenize (the shorter match
    * always wins) — reject it loud instead. */
  private[graft] def parseCodespaces(cmap: String, fontNum: Int): Seq[(Int, Long, Long)] = {
    val hexPair = """<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>""".r
    val out = (for {
      blk <- """(?s)begincodespacerange(.*?)endcodespacerange""".r.findAllMatchIn(cmap)
      m <- hexPair.findAllMatchIn(blk.group(1))
    } yield {
      val (loHex, hiHex) = (m.group(1), m.group(2))
      require(loHex.length == hiHex.length && loHex.length % 2 == 0 && loHex.length <= 8,
        s"PdfCodec: font $fontNum: malformed codespace range <$loHex> <$hiHex>")
      val len = loHex.length / 2
      val lo = java.lang.Long.parseLong(loHex, 16)
      val hi = java.lang.Long.parseLong(hiHex, 16)
      require(hi >= lo, s"PdfCodec: font $fontNum: codespace hi < lo")
      (len, lo, hi)
    }).toSeq
    def firstByte(len: Int, v: Long): Long = (v >> (8 * (len - 1))) & 0xff
    for ((a @ (l1, lo1, hi1)) <- out; (b @ (l2, lo2, hi2)) <- out if l1 < l2) {
      val (a0, a1) = (firstByte(l1, lo1), firstByte(l1, hi1))
      val (b0, b1) = (firstByte(l2, lo2), firstByte(l2, hi2))
      require(a1 < b0 || b1 < a0,
        f"PdfCodec: font $fontNum: codespace ranges of widths $l1 and $l2 have " +
          f"overlapping first-byte prefixes [0x$a0%02x,0x$a1%02x] and " +
          f"[0x$b0%02x,0x$b1%02x] — prefix-overlapping codespaces tokenize " +
          "ambiguously under shortest-match (out of scope)")
    }
    out
  }

  /** /Differences array (spec §9.6.6.3): `[ code name name … code name … ]`
    * — each integer sets the next code, each name consumes one code.
    * Tokenized with a CURSOR, not a character-class regex: a PDF name
    * may contain `#xx` escapes or punctuation (spec §7.3.5), and a
    * partial-regex match would split such a name into a bogus
    * name-plus-code pair, silently shifting every later assignment.
    * Names are stored UNRESOLVED (see [[DifferencesFont]]); unexpected
    * tokens fail loud. */
  private[graft] def parseDifferences(encDict: String, fontNum: Int): Map[Int, String] = {
    val m = """/Differences\s*\[""".r.findFirstMatchIn(encDict).getOrElse(
      throw new IllegalArgumentException(
        s"PdfCodec: font object $fontNum: /Encoding dict has no /Differences array"))
    val start = m.end
    val end = encDict.indexOf(']', start)
    require(end >= 0, s"PdfCodec: font object $fontNum: unterminated /Differences array")
    val body = encDict.substring(start, end)
    val out = mutable.Map.empty[Int, String]
    var code = -1
    var p = 0
    while (p < body.length) {
      val c = body.charAt(p)
      if (c.isWhitespace) p += 1
      else if (c == '/') {
        // name token: runs to the next whitespace or delimiter; #xx hex
        // escapes decode per §7.3.5
        val st = p + 1
        var q = st
        while (q < body.length && !body.charAt(q).isWhitespace &&
          !"()<>[]{}/%".contains(body.charAt(q))) q += 1
        val rawName = body.substring(st, q)
        val name = if (!rawName.contains('#')) rawName else {
          val sb = new StringBuilder
          var i = 0
          while (i < rawName.length) {
            if (rawName.charAt(i) == '#' && i + 3 <= rawName.length) {
              sb.append(Integer.parseInt(rawName.substring(i + 1, i + 3), 16).toChar)
              i += 3
            } else { sb.append(rawName.charAt(i)); i += 1 }
          }
          sb.toString
        }
        require(code >= 0 && code <= 255,
          s"PdfCodec: font object $fontNum: /Differences name /$rawName " +
            s"at invalid code $code")
        out(code) = name
        code += 1
        p = q
      } else if (c.isDigit) {
        val st = p
        while (p < body.length && body.charAt(p).isDigit) p += 1
        code = body.substring(st, p).toInt
      } else throw new IllegalArgumentException(
        s"PdfCodec: font object $fontNum: unexpected '$c' in /Differences array")
    }
    out.toMap
  }

  /** Glyph name → text: uniXXXX/uXXXX forms, single-letter and digit
    * names, and the Adobe Glyph List subset covering the Standard/
    * WinAnsi repertoires (the names real simple-font subsets emit).
    * `.notdef` maps to empty; anything else fails loud. */
  private[graft] def glyphToUnicode(name: String, fontNum: Int): String = name match {
    case ".notdef" => ""
    case n if n.length == 1 && (n.charAt(0).isLetter || n.charAt(0).isDigit) => n
    case n if n.startsWith("uni") && n.length >= 7 && (n.length - 3) % 4 == 0 &&
        n.drop(3).forall(c => Character.digit(c, 16) >= 0) =>
      n.drop(3).grouped(4).map(h => Integer.parseInt(h, 16).toChar).mkString
    case n if n.startsWith("u") && n.length >= 5 && n.length <= 7 &&
        n.drop(1).forall(c => Character.digit(c, 16) >= 0) =>
      new String(Character.toChars(Integer.parseInt(n.drop(1), 16)))
    case n => AglSubset.getOrElse(n, throw new IllegalArgumentException(
      s"PdfCodec: font object $fontNum: glyph name /$n not in the supported " +
        "glyph list (AGL subset + uniXXXX) — cannot map to text"))
  }

  /** Adobe Glyph List subset: the Standard + WinAnsi repertoire (public
    * AGL data, restated; digits/letters handled in [[glyphToUnicode]]). */
  private val AglSubset: Map[String, String] = Map(
    "space" -> " ", "exclam" -> "!", "quotedbl" -> "\"", "numbersign" -> "#",
    "dollar" -> "$", "percent" -> "%", "ampersand" -> "&", "quotesingle" -> "'",
    "parenleft" -> "(", "parenright" -> ")", "asterisk" -> "*", "plus" -> "+",
    "comma" -> ",", "hyphen" -> "-", "period" -> ".", "slash" -> "/",
    "zero" -> "0", "one" -> "1", "two" -> "2", "three" -> "3", "four" -> "4",
    "five" -> "5", "six" -> "6", "seven" -> "7", "eight" -> "8", "nine" -> "9",
    "colon" -> ":", "semicolon" -> ";", "less" -> "<", "equal" -> "=",
    "greater" -> ">", "question" -> "?", "at" -> "@", "bracketleft" -> "[",
    "backslash" -> "\\", "bracketright" -> "]", "asciicircum" -> "^",
    "underscore" -> "_", "grave" -> "`", "braceleft" -> "{", "bar" -> "|",
    "braceright" -> "}", "asciitilde" -> "~",
    "exclamdown" -> "¡", "cent" -> "¢", "sterling" -> "£", "currency" -> "¤",
    "yen" -> "¥", "brokenbar" -> "¦", "section" -> "§", "dieresis" -> "¨",
    "copyright" -> "©", "ordfeminine" -> "ª", "guillemotleft" -> "«",
    "logicalnot" -> "¬", "registered" -> "®", "macron" -> "¯", "degree" -> "°",
    "plusminus" -> "±", "acute" -> "´", "mu" -> "µ", "paragraph" -> "¶",
    "periodcentered" -> "·", "cedilla" -> "¸", "ordmasculine" -> "º",
    "guillemotright" -> "»", "onequarter" -> "¼", "onehalf" -> "½",
    "threequarters" -> "¾", "questiondown" -> "¿", "multiply" -> "×",
    "divide" -> "÷",
    "Agrave" -> "À", "Aacute" -> "Á", "Acircumflex" -> "Â", "Atilde" -> "Ã",
    "Adieresis" -> "Ä", "Aring" -> "Å", "AE" -> "Æ", "Ccedilla" -> "Ç",
    "Egrave" -> "È", "Eacute" -> "É", "Ecircumflex" -> "Ê", "Edieresis" -> "Ë",
    "Igrave" -> "Ì", "Iacute" -> "Í", "Icircumflex" -> "Î", "Idieresis" -> "Ï",
    "Eth" -> "Ð", "Ntilde" -> "Ñ", "Ograve" -> "Ò", "Oacute" -> "Ó",
    "Ocircumflex" -> "Ô", "Otilde" -> "Õ", "Odieresis" -> "Ö", "Oslash" -> "Ø",
    "Ugrave" -> "Ù", "Uacute" -> "Ú", "Ucircumflex" -> "Û", "Udieresis" -> "Ü",
    "Yacute" -> "Ý", "Thorn" -> "Þ", "germandbls" -> "ß",
    "agrave" -> "à", "aacute" -> "á", "acircumflex" -> "â", "atilde" -> "ã",
    "adieresis" -> "ä", "aring" -> "å", "ae" -> "æ", "ccedilla" -> "ç",
    "egrave" -> "è", "eacute" -> "é", "ecircumflex" -> "ê", "edieresis" -> "ë",
    "igrave" -> "ì", "iacute" -> "í", "icircumflex" -> "î", "idieresis" -> "ï",
    "eth" -> "ð", "ntilde" -> "ñ", "ograve" -> "ò", "oacute" -> "ó",
    "ocircumflex" -> "ô", "otilde" -> "õ", "odieresis" -> "ö", "oslash" -> "ø",
    "ugrave" -> "ù", "uacute" -> "ú", "ucircumflex" -> "û", "udieresis" -> "ü",
    "yacute" -> "ý", "thorn" -> "þ", "ydieresis" -> "ÿ",
    "quoteleft" -> "‘", "quoteright" -> "’",
    "quotedblleft" -> "“", "quotedblright" -> "”",
    "quotesinglbase" -> "‚", "quotedblbase" -> "„",
    "endash" -> "–", "emdash" -> "—", "bullet" -> "•",
    "dagger" -> "†", "daggerdbl" -> "‡", "ellipsis" -> "…",
    "perthousand" -> "‰", "trademark" -> "™", "fi" -> "ﬁ",
    "fl" -> "ﬂ", "Euro" -> "€", "florin" -> "ƒ",
    "circumflex" -> "ˆ", "tilde" -> "˜", "scaron" -> "š",
    "Scaron" -> "Š", "oe" -> "œ", "OE" -> "Œ",
    "zcaron" -> "ž", "Zcaron" -> "Ž", "Ydieresis" -> "Ÿ",
    "guilsinglleft" -> "‹", "guilsinglright" -> "›",
    "minus" -> "−", "fraction" -> "⁄", "dotlessi" -> "ı",
    "breve" -> "˘", "dotaccent" -> "˙", "ring" -> "˚",
    "ogonek" -> "˛", "hungarumlaut" -> "˝", "caron" -> "ˇ")

  /** ToUnicode CMap (spec §9.10.3): code → UTF-16BE destination, from
    * bfchar pairs and bfrange entries (incremented single-dst and
    * array-dst forms). Destinations may be multiple code units
    * (ligatures, surrogate pairs). */
  private[graft] def parseToUnicode(cmap: String): Map[Int, String] = {
    val out = mutable.Map.empty[Int, String]
    val hexPair = """<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>""".r
    for {
      blk <- """(?s)beginbfchar(.*?)endbfchar""".r.findAllMatchIn(cmap)
      m <- hexPair.findAllMatchIn(blk.group(1))
    } out(Integer.parseInt(m.group(1), 16)) = utf16be(m.group(2))
    for (blk <- """(?s)beginbfrange(.*?)endbfrange""".r.findAllMatchIn(cmap))
      parseBfrangeBody(blk.group(1), out)
    out.toMap
  }

  /** [[parseToUnicode]] with WIDTH-KEYED codes — an embedded-CMap font
    * mixes 1- and 2-byte codes, and codes of different widths are
    * distinct (spec: a 1-byte <41> and a 2-byte <0041> are different
    * codes), so the source hex's byte length rides the key. */
  private[graft] def parseToUnicodeWide(cmap: String): Map[(Int, Long), String] = {
    val out = mutable.Map.empty[(Int, Long), String]
    val hexPair = """<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>""".r
    for {
      blk <- """(?s)beginbfchar(.*?)endbfchar""".r.findAllMatchIn(cmap)
      m <- hexPair.findAllMatchIn(blk.group(1))
    } {
      val src = m.group(1)
      require(src.length % 2 == 0 && src.length <= 8,
        s"PdfCodec: bfchar source <$src> is not 1-4 whole bytes")
      out((src.length / 2, java.lang.Long.parseLong(src, 16))) = utf16be(m.group(2))
    }
    for (blk <- """(?s)beginbfrange(.*?)endbfrange""".r.findAllMatchIn(cmap))
      parseBfrangeBodyWide(blk.group(1), out)
    out.toMap
  }

  private def parseBfrangeBodyWide(body: String,
                                   out: mutable.Map[(Int, Long), String]): Unit = {
    val toks = """<([0-9A-Fa-f]+)>|\[|\]""".r.findAllMatchIn(body).toVector
    var i = 0
    while (i < toks.length) {
      require(i + 2 < toks.length, "PdfCodec: truncated bfrange entry")
      val loHex = toks(i).group(1)
      val hiHex = toks(i + 1).group(1)
      require(loHex.length % 2 == 0 && loHex.length <= 8,
        s"PdfCodec: bfrange source <$loHex> is not 1-4 whole bytes")
      // hi must carry the SAME code width as lo — a wider hi would
      // silently enumerate a huge wrong-width range (hang/OOM on
      // malformed input the fail-loud contract must reject)
      require(hiHex.length == loHex.length,
        s"PdfCodec: bfrange <$loHex> <$hiHex> mix code widths")
      val w = loHex.length / 2
      val lo = java.lang.Long.parseLong(loHex, 16)
      val hi = java.lang.Long.parseLong(hiHex, 16)
      require(hi >= lo, s"PdfCodec: bfrange hi < lo ($hi < $lo)")
      require(hi - lo <= 0xFFFF,
        s"PdfCodec: bfrange spans ${hi - lo + 1} codes (cap 65536)")
      if (toks(i + 2).matched == "[") {
        var j = i + 3
        var c = lo
        while (j < toks.length && toks(j).matched != "]") {
          out((w, c)) = utf16be(toks(j).group(1)); c += 1; j += 1
        }
        require(j < toks.length, "PdfCodec: unterminated bfrange array")
        require(c == hi + 1,
          s"PdfCodec: bfrange array has ${c - lo} dsts for ${hi - lo + 1} codes")
        i = j + 1
      } else {
        val base = utf16be(toks(i + 2).group(1))
        var c = lo
        while (c <= hi) {
          out((w, c)) = base.dropRight(1) + (base.last + (c - lo)).toChar
          c += 1
        }
        i += 3
      }
    }
  }

  private def parseBfrangeBody(body: String, out: mutable.Map[Int, String]): Unit = {
    // ONE grammar implementation: delegate to the width-keyed parser and
    // re-key by code value alone (the Identity path's fixed 2-byte codes
    // never mix widths; insertion order preserves last-entry-wins)
    val wide = mutable.LinkedHashMap.empty[(Int, Long), String]
    parseBfrangeBodyWide(body, wide)
    wide.foreach { case ((_, code), dst) => out(code.toInt) = dst }
  }

  private def utf16be(hex: String): String = {
    require(hex.length % 4 == 0,
      s"PdfCodec: ToUnicode destination <$hex> is not UTF-16BE aligned")
    hex.grouped(4).map(h => Integer.parseInt(h, 16).toChar).mkString
  }

  /** Shown-string raw bytes (as Latin-1 chars) → text under `font`. */
  private def decodeShown(raw: String, font: FontDec): String = font match {
    case SimpleFont => raw
    case GlyphProgFont(map, fontNum, via) =>
      raw.map(c => map.getOrElse(c.toInt, throw new IllegalArgumentException(
        f"PdfCodec: font $fontNum: code 0x${c.toInt}%02x has no Unicode mapping " +
          s"in the $via"))).mkString
    case DifferencesFont(names, fontNum) =>
      raw.map(c => names.get(c.toInt) match {
        case Some(n) => glyphToUnicode(n, fontNum)
        case None => c.toString
      }).mkString
    case CompositeFont(map) =>
      require(raw.length % 2 == 0,
        s"PdfCodec: composite-font string has odd byte count ${raw.length}")
      raw.grouped(2).map { p =>
        val code = (p.charAt(0) << 8) | p.charAt(1)
        map.getOrElse(code, throw new IllegalArgumentException(
          f"PdfCodec: code 0x$code%04x not in the font's ToUnicode CMap"))
      }.mkString
    case CmapFont(spaces, map, fontNum) =>
      // variable-width tokenization: shortest matching codespace wins.
      // Range containment is PER BYTE (spec §9.7.6.2 / PostScript CMap
      // semantics: <8140> <FEFE> admits codes whose FIRST byte is in
      // [81,FE] AND second in [40,FE] — NOT the integer interval, which
      // would wrongly admit 0x8200-0x823F-style codes a conformant
      // reader rejects). Shortest-first is equivalent to the spec's
      // byte-incremental prefix match for first-byte-disjoint range
      // widths — an invariant parseCodespaces ENFORCES at parse time,
      // so no file reaches this loop outside it; bytes matching no
      // range fail loud, never resync-and-garble.
      def inSpace(len: Int, v: Long): Boolean = spaces.exists { case (l, lo, hi) =>
        l == len && (0 until len).forall { j =>
          val sh = 8 * (len - 1 - j)
          val b = (v >> sh) & 0xff
          b >= ((lo >> sh) & 0xff) && b <= ((hi >> sh) & 0xff)
        }
      }
      val sb = new StringBuilder
      var i = 0
      while (i < raw.length) {
        var len = 1
        var hit = -1
        var value = 0L
        while (hit < 0 && len <= 4) {
          if (i + len <= raw.length && spaces.exists(_._1 == len)) {
            var v = 0L
            var j = 0
            while (j < len) { v = (v << 8) | (raw.charAt(i + j) & 0xff).toLong; j += 1 }
            if (inSpace(len, v)) { hit = len; value = v }
          }
          len += 1
        }
        require(hit > 0,
          f"PdfCodec: font $fontNum: byte 0x${raw.charAt(i) & 0xff}%02x at string " +
            s"offset $i starts no codespace range")
        sb.append(map.getOrElse((hit, value), throw new IllegalArgumentException(
          f"PdfCodec: font $fontNum: code 0x$value%x ($hit-byte) not in the " +
            "font's ToUnicode CMap")))
        i += hit
      }
      sb.toString
  }

  /** [[scanTopLevel]] plus expansion of object streams (/Type /ObjStm,
    * PDF 1.5 §7.5.7): modern writers pack the document-structure dicts
    * (catalog, page tree, fonts) into one Flate-compressed stream whose
    * payload is `N` (objnum, offset) integer pairs followed by the
    * objects themselves. Contained objects carry no streams (the spec
    * forbids it), so each contributes its dict only. */
  private def scanObjects(s: String, bytes: Array[Byte]): Seq[PdfObj] = {
    val top0 = scanTopLevel(s, bytes)
    // DECRYPTION comes first (spec §7.6.2: encryption wraps everything
    // below it): open the standard security handler with the EMPTY user
    // password and decrypt every stream up front, so the rest of the
    // pipeline (ObjStm expansion included — inner objects are covered by
    // their container's encryption) reads plaintext. The /Encrypt dict
    // object and the xref stream are exempt per spec. A file keyed to a
    // real password fails loud inside decryptAll, never emits garbage.
    val top = decryptAll(s, top0)
    val topByNum = top.map(o => o.num -> o).toMap
    top.flatMap { o =>
      if ("""/Type\s*/ObjStm(?![a-zA-Z])""".r.findFirstIn(o.dict).isEmpty) Seq(o)
      else Seq(o) ++ expandObjStm(o, topByNum)
    }
  }

  /** Locate the trailer's /Encrypt reference (classic trailer or
    * xref-stream dict), verify the EMPTY user password, and return the
    * objects with every in-scope stream decrypted. No /Encrypt → the
    * objects pass through untouched. */
  private def decryptAll(s: String, top: Seq[PdfObj]): Seq[PdfObj] = {
    // the trailer/xref dict lives at the file TAIL; search there so a
    // page whose TEXT mentions "/Encrypt" is never false-matched
    val tail = s.substring(math.max(0, s.length - 4096))
    // PDF 1.5: the trailer entries ride the xref STREAM's dict, which can
    // sit anywhere in the file (a large body pushes it outside the tail
    // window). Scan ALL /XRef dicts — incremental updates append new ones
    // and only the newest (last in file order) carries the live trailer —
    // and remember which dict held /Encrypt so /ID can be parsed from the
    // SAME dict below: the tail-only /ID search would otherwise derive
    // the file key with an empty salt and loudly reject a valid file.
    val xrefObjs = top.filter(_.dict.contains("/XRef"))
    val xrefDicts = xrefObjs.map(_.dict)
    // /Encrypt must be read from the NEWEST trailer-bearing /XRef dict
    // (the live trailer — last in file order, /Root is the required
    // trailer key), NOT from the newest dict that happens to contain
    // /Encrypt: an incremental update that REMOVES encryption appends a
    // trailer without /Encrypt, and resolving a superseded dict's stale
    // /Encrypt would treat a now-plaintext file as encrypted (ADVICE
    // r11). Only when no trailer-bearing dict exists do older dicts get
    // scanned at all.
    val encInXref = xrefDicts.reverseIterator.find(_.contains("/Root")) match {
      case Some(live) =>
        """/Encrypt\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(live)
          .map(m => (m.group(1).toInt, live))
      case None => xrefDicts.reverseIterator.map { d =>
        """/Encrypt\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(d).map(m => (m.group(1).toInt, d))
      }.collectFirst { case Some(hit) => hit }
    }
    // same staleness guard for classic trailers: two revisions' trailers
    // can both sit inside the 4096-byte tail window, and first-match
    // would resolve the OLDER one's /Encrypt after an update removed it —
    // scan only from the LAST `trailer` keyword. When BOTH a classic
    // trailer and xref dicts exist (a classic→1.5 conversion update, or
    // a hybrid revision), the live trailer is whichever sits LATER in
    // FILE ORDER — a classic trailer that legitimately removed /Encrypt
    // must not fall back to a superseded xref dict's stale value, and a
    // newer xref dict must not lose to an old classic trailer still in
    // the window. The raw-tail scan survives only for classic files (no
    // /XRef dicts at all) whose trailer keyword fell outside the window.
    val classicTrailerAt = tail.lastIndexOf("trailer")
    val classicAbs =
      if (classicTrailerAt >= 0) (s.length - tail.length) + classicTrailerAt else -1
    // file-order position comes from the PARSER's byte offset, not a
    // lastIndexOf re-find of the dict text: two revisions whose xref
    // dicts serialize identically (or a dict whose text also appears
    // inside a string) would mis-position the newest one and let a
    // stale classic trailer win the arbitration below
    val liveXrefAbs = xrefObjs.reverseIterator.find(_.dict.contains("/Root"))
      .orElse(xrefObjs.lastOption)
      .map(_.offset).getOrElse(-1)
    // the live classic trailer is the BALANCED dict after the keyword,
    // not everything to EOF: trailing bytes (another revision's echoed
    // dict, writer comments) after the dict must not contribute an
    // /Encrypt the trailer itself doesn't carry
    val liveClassic: Option[String] =
      if (classicAbs < 0) None
      else {
        var p = classicAbs + "trailer".length
        while (p < s.length && s.charAt(p).isWhitespace) p += 1
        if (p + 1 < s.length && s.charAt(p) == '<' && s.charAt(p + 1) == '<')
          Some(s.substring(p, balancedDictEnd(s, p)))
        else Some(s.substring(classicAbs)) // malformed: keyword with no dict
      }
    val encRef =
      if (classicAbs >= 0 && classicAbs >= liveXrefAbs)
        """/Encrypt\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(liveClassic.get)
          .map(_.group(1).toInt)
          // a HYBRID-reference trailer (/XRefStm) shares its revision
          // with an xref stream dict; a writer that parked /Encrypt only
          // there (non-conforming but seen in the wild) must still
          // decrypt — without the marker, a missing /Encrypt means the
          // live trailer really removed encryption and NO fallback runs
          .orElse(
            if (liveClassic.get.contains("/XRefStm")) encInXref.map(_._1) else None)
      else if (xrefDicts.nonEmpty) encInXref.map(_._1)
      else """/Encrypt\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(tail).map(_.group(1).toInt)
    encRef match {
      case None => top
      case Some(encNum) =>
        val enc = top.find(_.num == encNum).getOrElse(throw new IllegalArgumentException(
          s"PdfCodec: trailer /Encrypt $encNum 0 R not found")).dict
        require("""/Filter\s*/Standard(?![a-zA-Z])""".r.findFirstIn(enc).isDefined,
          "PdfCodec: encrypted PDF: only the /Standard security handler is supported")
        // scalar fields must come from the TOP LEVEL of the dict: a flat
        // first-match regex can hit the NESTED /CF << /StdCF << /Length
        // 16 >> >> value (bytes, not bits) when a writer orders it first
        val topLevel = {
          val sb = new StringBuilder(enc)
          var depth = 0; var i = 0
          while (i < sb.length) {
            if (sb.startsWith("<<", i)) { depth += 1; i += 2 }
            else if (sb.startsWith(">>", i)) { depth -= 1; i += 2 }
            else { if (depth > 1) sb.setCharAt(i, ' '); i += 1 }
          }
          sb.toString
        }
        def num(key: String, default: => Int): Int =
          (s"""/$key\\s+(-?\\d+)""").r.findFirstMatchIn(topLevel).map(_.group(1).toInt)
            .getOrElse(default)
        val v = num("V", 0)
        val r = num("R", 2)
        val p = num("P", -1)
        require(v == 1 || v == 2 || v == 4 || v == 5,
          s"PdfCodec: encrypted PDF: /V $v unsupported (1, 2, 4 — RC4/AES-128; 5 — AES-256)")
        if (v == 5) {
          // PDF 2.0 AES-256: only the final R 6 revision; Adobe's interim
          // R 5 (unhardened SHA-256) is deprecated by ISO 32000-2 and
          // rejects loud rather than silently accepting weaker keying
          require(r == 6,
            s"PdfCodec: encrypted PDF: /V 5 /R $r unsupported (R 6 only; the interim " +
              "R 5 revision is deprecated by ISO 32000-2)")
          require("""/CFM\s*/AESV3(?![a-zA-Z])""".r.findFirstIn(enc).isDefined,
            "PdfCodec: encrypted PDF: /V 5 requires /CFM /AESV3")
        }
        val aes = v == 5 ||
          (v == 4 && """/CFM\s*/AESV2(?![a-zA-Z])""".r.findFirstIn(enc).isDefined)
        require(v != 4 || aes || """/CFM\s*/V2(?![a-zA-Z])""".r.findFirstIn(enc).isDefined,
          "PdfCodec: encrypted PDF: /V 4 requires /CFM /V2 or /AESV2 (AESV3/others unsupported)")
        // key length: AESV2 is 128-bit by definition; a V4 /V2 crypt
        // filter carries /Length inside /CF in BYTES or BITS depending
        // on the writer — values >= 40 can only be bits (40 bytes would
        // be an illegal 320-bit RC4 key), the PDFBox disambiguation;
        // V1 fixes 5; else the top-level /Length in bits
        val keyBytes =
          if (v == 1) 5
          else if (v == 5) 32
          else if (v == 4 && aes) 16
          else if (v == 4) {
            val cfLen = """/CFM\s*/V2[^>]*?/Length\s+(\d+)""".r.findFirstMatchIn(enc)
              .orElse("""/Length\s+(\d+)[^>]*?/CFM\s*/V2""".r.findFirstMatchIn(enc))
              .map(_.group(1).toInt)
            // >= 40: a spec-legal writer may store 40 (BITS, a 5-byte
            // key) inside /CF; 40 BYTES would be an illegal 320-bit RC4
            // key, so bits is the only valid reading — the PDFBox
            // disambiguation (ADVICE r10)
            cfLen.map(n => if (n >= 40) n / 8 else n).getOrElse(num("Length", 128) / 8)
          }
          else num("Length", 40) / 8
        val encryptMetadata =
          !"""/EncryptMetadata\s+false(?![a-zA-Z])""".r.findFirstIn(topLevel).isDefined
        val o = stringValue(enc, "O").getOrElse(throw new IllegalArgumentException(
          "PdfCodec: encrypted PDF: /Encrypt dict has no /O"))
        val u = stringValue(enc, "U").getOrElse(throw new IllegalArgumentException(
          "PdfCodec: encrypted PDF: /Encrypt dict has no /U"))
        val minOU = if (v == 5) 48 else 32
        require(o.length >= minOU && u.length >= minOU,
          s"PdfCodec: encrypted PDF: /O (${o.length}) or /U (${u.length}) shorter " +
            s"than $minOU bytes")
        val key =
          if (v == 5) {
            // AES-256: the key rides /UE (or /OE), not the /ID salt
            val oe = stringValue(enc, "OE").getOrElse(throw new IllegalArgumentException(
              "PdfCodec: encrypted PDF: /V 5 dict has no /OE"))
            val ue = stringValue(enc, "UE").getOrElse(throw new IllegalArgumentException(
              "PdfCodec: encrypted PDF: /V 5 dict has no /UE"))
            require(oe.length >= 32 && ue.length >= 32,
              "PdfCodec: encrypted PDF: /OE or /UE shorter than 32 bytes")
            val k = PdfCrypto.verifyV5("", o.take(48), u.take(48), oe.take(32), ue.take(32))
              .getOrElse(throw new IllegalArgumentException(
                "PdfCodec: encrypted PDF: the empty user password does not open this " +
                  "file (password-protected documents are out of scope)"))
            // /Perms is REQUIRED at V 5 (ISO 32000-2 table 20) and its
            // integrity check catches a wrong key before any stream
            // decrypt could emit garbage
            val perms = stringValue(enc, "Perms").getOrElse(
              throw new IllegalArgumentException(
                "PdfCodec: encrypted PDF: /V 5 dict has no /Perms"))
            PdfCrypto.validatePerms(perms, k, p, encryptMetadata)
            k
          } else {
            // /ID: tail trailer first, then the xref-stream dict that held
            // /Encrypt, then any other /XRef dict (newest first) — only a
            // file with no /ID anywhere falls back to the empty salt
            val idFirst = parseIdFirst(tail)
              .orElse(encInXref.flatMap { case (_, d) => parseIdFirst(d) })
              .orElse(xrefDicts.reverseIterator.map(parseIdFirst)
                .collectFirst { case Some(id) => id })
              .getOrElse(Array.emptyByteArray) // missing /ID: derive with an empty salt
            PdfCrypto.verifyUser("", o.take(32), u.take(32), p, idFirst, r,
                keyBytes, encryptMetadata)
              .getOrElse(throw new IllegalArgumentException(
                "PdfCodec: encrypted PDF: the empty user password does not open this " +
                  "file (password-protected documents are out of scope)"))
          }
        val dec = new PdfCrypto.Decryptor(key, aes, v5 = v == 5)
        top.map { obj =>
          if (obj.num == encNum || obj.stream.isEmpty ||
              """/Type\s*/XRef(?![a-zA-Z])""".r.findFirstIn(obj.dict).isDefined) obj
          else obj.copy(stream = obj.stream.map(dec.decrypt(obj.num, obj.gen, _)))
        }
    }
  }

  /** First element of the trailer's /ID array — a BYTE STRING in either
    * hex `<…>` or literal `(…)` form (both legal; a hex-only regex would
    * silently degrade literal-form IDs to an empty key salt and reject
    * valid encrypted files). */
  private def parseIdFirst(tail: String): Option[Array[Byte]] =
    """/ID\s*\[""".r.findFirstMatchIn(tail).flatMap { m =>
      var p = m.end
      while (p < tail.length && tail.charAt(p).isWhitespace) p += 1
      if (p >= tail.length) None
      else if (tail.charAt(p) == '<') {
        val e = tail.indexOf('>', p)
        if (e < 0) None else Some(decodeHex(tail.substring(p + 1, e)).getBytes(ISO_8859_1))
      } else if (tail.charAt(p) == '(') {
        val e = literalStringEnd(tail, p)
        Some(decodeLiteral(tail.substring(p + 1, e - 1)).getBytes(ISO_8859_1))
      } else None
    }

  /** String-valued dict entry `/key`, literal `(…)` or hex `<…>` form,
    * returned as Latin-1 bytes. */
  private def stringValue(dict: String, key: String): Option[Array[Byte]] =
    (s"""/$key(?![A-Za-z0-9])""").r.findFirstMatchIn(dict).flatMap { mm =>
      var p = mm.end
      while (p < dict.length && dict.charAt(p).isWhitespace) p += 1
      if (p >= dict.length) None
      else if (dict.charAt(p) == '(') {
        val end = literalStringEnd(dict, p)
        Some(decodeLiteral(dict.substring(p + 1, end - 1)).getBytes(ISO_8859_1))
      } else if (dict.charAt(p) == '<' && !dict.startsWith("<<", p)) {
        val end = dict.indexOf('>', p)
        if (end < 0) None
        else Some(decodeHex(dict.substring(p + 1, end)).getBytes(ISO_8859_1))
      } else None
    }

  private def expandObjStm(o: PdfObj, byNum: Map[Int, PdfObj]): Seq[PdfObj] = {
    val text = decodeStream(o, byNum)
    val n = """/N\s+(\d+)""".r.findFirstMatchIn(o.dict).map(_.group(1).toInt)
      .getOrElse(throw new IllegalArgumentException(
        s"PdfCodec: object stream ${o.num} has no /N"))
    val first = """/First\s+(\d+)""".r.findFirstMatchIn(o.dict).map(_.group(1).toInt)
      .getOrElse(throw new IllegalArgumentException(
        s"PdfCodec: object stream ${o.num} has no /First"))
    val header = text.substring(0, math.min(first, text.length))
    val nums = """\d+""".r.findAllIn(header).map(_.toInt).toVector
    require(nums.length >= 2 * n,
      s"PdfCodec: object stream ${o.num} header has ${nums.length} ints for /N $n pairs")
    (0 until n).map { i =>
      val objNum = nums(2 * i)
      val off = first + nums(2 * i + 1)
      require(off <= text.length,
        s"PdfCodec: object stream ${o.num}: offset $off past payload end")
      var p = off
      while (p < text.length && text.charAt(p).isWhitespace) p += 1
      val dict =
        if (text.startsWith("<<", p)) text.substring(p, balancedDictEnd(text, p))
        else {
          // SCALAR body inside the object stream — small non-stream
          // objects routinely live here in PDF 1.5+ layouts, and
          // indirect-value resolution (dictInt, /Flags) must be able
          // to read them (round-17 review: only the top-level scan
          // captured scalars). Bounded to the next object's offset.
          val end =
            if (i + 1 < n) math.min(text.length, first + nums(2 * i + 3))
            else text.length
          if (end - p <= 256) text.substring(p, end).trim else ""
        }
      PdfObj(objNum, dict, None)
    }
  }

  /** Sequential object scan: find `N G obj`, parse the balanced dict,
    * then (if present) skip the stream payload via /Length — or, when
    * /Length is an indirect reference, by searching `endstream` — so the
    * cursor never tokenizes inside binary stream data. */
  private def scanTopLevel(s: String, bytes: Array[Byte]): Seq[PdfObj] = {
    val matcher = """(\d+)\s+(\d+)\s+obj\b""".r.pattern.matcher(s)
    val out = mutable.Buffer.empty[PdfObj]
    var cur = 0
    while (cur < s.length && matcher.find(cur)) {
      val num = matcher.group(1).toInt
      var p = matcher.end
      while (p < s.length && s.charAt(p).isWhitespace) p += 1
      var dict = ""
      if (p + 1 < s.length && s.charAt(p) == '<' && s.charAt(p + 1) == '<') {
        val end = balancedDictEnd(s, p)
        dict = s.substring(p, end)
        p = end
      } else {
        // SCALAR body ("9 0 obj 1200 endobj" — legal for any value,
        // §7.3.10): capture the text so indirect-value resolution
        // (dictInt, the /Flags path) can read it; without this, a
        // conforming indirect /Length1 or /Flags always failed "holds
        // no integer" (round-17 review). Bounded to the next endobj.
        val e = s.indexOf("endobj", p)
        if (e >= 0 && e - p <= 256) dict = s.substring(p, e).trim
      }
      while (p < s.length && s.charAt(p).isWhitespace) p += 1
      var stream: Option[Array[Byte]] = None
      if (s.startsWith("stream", p)) {
        var ds = p + "stream".length
        if (ds < s.length && s.charAt(ds) == '\r') ds += 1
        if (ds < s.length && s.charAt(ds) == '\n') ds += 1
        val de = directLength(dict) match {
          case Some(len) if ds + len <= s.length && endstreamAt(s, ds + len) => ds + len
          // indirect or lying /Length: fall back to the next endstream
          // keyword (binary payloads containing the literal bytes
          // "endstream" are outside the bounded scope, documented)
          case _ =>
            val i = s.indexOf("endstream", ds)
            require(i >= 0, s"PdfCodec: object $num: unterminated stream")
            // spec: EOL before endstream is not part of the data
            var e = i
            if (e > ds && s.charAt(e - 1) == '\n') e -= 1
            if (e > ds && s.charAt(e - 1) == '\r') e -= 1
            e
        }
        stream = Some(java.util.Arrays.copyOfRange(bytes, ds, de))
        p = s.indexOf("endstream", de) + "endstream".length
      }
      val endobj = s.indexOf("endobj", p)
      cur = if (endobj >= 0) endobj + "endobj".length else p
      out += PdfObj(num, dict, stream, matcher.group(2).toInt, matcher.start)
    }
    out.toSeq
  }

  private def endstreamAt(s: String, pos: Int): Boolean = {
    var p = pos
    while (p < s.length && (s.charAt(p) == '\r' || s.charAt(p) == '\n')) p += 1
    s.startsWith("endstream", p)
  }

  /** End index (exclusive) of the `<<…>>` dict starting at `start`,
    * balancing nested dicts and skipping strings/hex-strings. */
  private def balancedDictEnd(s: String, start: Int): Int = {
    var depth = 0
    var p = start
    while (p < s.length) {
      if (s.startsWith("<<", p)) { depth += 1; p += 2 }
      else if (s.startsWith(">>", p)) { depth -= 1; p += 2; if (depth == 0) return p }
      else if (s.charAt(p) == '(') { p = literalStringEnd(s, p) }
      else if (s.charAt(p) == '<') {
        // hex string: skip to its '>' — otherwise `<AB>>>` (hex string
        // abutting the dict close) pairs the string terminator with the
        // first dict '>' and ends the dict one char early
        val e = s.indexOf('>', p + 1)
        require(e >= 0, "PdfCodec: unterminated hex string in dictionary")
        p = e + 1
      }
      else if (s.charAt(p) == '%') { while (p < s.length && s.charAt(p) != '\n') p += 1 }
      else p += 1
    }
    throw new IllegalArgumentException("PdfCodec: unbalanced dictionary")
  }

  private def literalStringEnd(s: String, start: Int): Int = {
    var depth = 0
    var p = start
    while (p < s.length) {
      s.charAt(p) match {
        case '\\' => p += 2
        case '(' => depth += 1; p += 1
        case ')' => depth -= 1; p += 1; if (depth == 0) return p
        case _ => p += 1
      }
    }
    throw new IllegalArgumentException("PdfCodec: unterminated literal string")
  }

  private def directLength(dict: String): Option[Int] =
    """/Length\s+(\d+)(?!\s+\d+\s+R)""".r.findFirstMatchIn(dict).map(_.group(1).toInt)

  private def dictRef(dict: String, key: String): Option[Int] =
    (key + """\s+(\d+)\s+\d+\s+R""").r.findFirstMatchIn(dict).map(_.group(1).toInt)

  /** Integer dict entry, direct or indirect ("/Length1 9 0 R" — legal
    * for any numeric entry, §7.3.10). An unresolvable indirect value
    * fails LOUD: callers use these to locate binary sections, where a
    * silent default means garbage. */
  private def dictInt(dict: String, name: String,
                      byNum: Map[Int, PdfObj]): Option[Int] =
    (s"""/$name\\s+(\\d+)(?:\\s+(\\d+)\\s+R)?""").r.findFirstMatchIn(dict).map { m =>
      if (m.group(2) == null) m.group(1).toInt
      else {
        val ref = m.group(1).toInt
        val o = byNum.getOrElse(ref, throw new IllegalArgumentException(
          s"PdfCodec: /$name $ref 0 R not found"))
        """^\d+$""".r.findFirstIn(o.dict.trim).map(_.toInt).getOrElse(
          throw new IllegalArgumentException(
            s"PdfCodec: /$name object $ref holds no integer"))
      }
    }

  /** Page object numbers in tree order: /Type /Catalog → /Pages → /Kids
    * (recursive); fallback = document order of /Type /Page objects. */
  private def pageOrder(objs: Seq[PdfObj], byNum: Map[Int, PdfObj]): Seq[Int] = {
    val pageType = """/Type\s*/Page(?![a-zA-Z])""".r
    def isPage(o: PdfObj) = pageType.findFirstIn(o.dict).isDefined
    val catalog = objs.find(o => """/Type\s*/Catalog(?![a-zA-Z])""".r.findFirstIn(o.dict).isDefined)
    val viaTree = for {
      cat <- catalog
      pagesRef <- dictRef(cat.dict, "/Pages")
    } yield {
      val acc = mutable.Buffer.empty[Int]
      def walk(num: Int): Unit = byNum.get(num).foreach { node =>
        if (isPage(node)) acc += num
        else kidsRefs(node.dict).foreach(walk)
      }
      walk(pagesRef)
      acc.toSeq
    }
    viaTree.filter(_.nonEmpty).getOrElse(objs.filter(isPage).map(_.num))
  }

  private def kidsRefs(dict: String): Seq[Int] =
    """/Kids\s*\[([^\]]*)\]""".r.findFirstMatchIn(dict) match {
      case Some(m) => """(\d+)\s+\d+\s+R""".r.findAllMatchIn(m.group(1)).map(_.group(1).toInt).toSeq
      case None => Seq.empty
    }

  /** /Contents as a single ref or an array of refs, in order. */
  private def contentRefs(dict: String): Seq[Int] =
    """/Contents\s*\[([^\]]*)\]""".r.findFirstMatchIn(dict) match {
      case Some(m) => """(\d+)\s+\d+\s+R""".r.findAllMatchIn(m.group(1)).map(_.group(1).toInt).toSeq
      case None => dictRef(dict, "/Contents").toSeq
    }

  /** Apply the stream's FULL filter chain (spec §7.4: /Filter is a name
    * or an ARRAY applied left to right — taking only the first entry
    * would silently mis-decode chained streams like
    * `[/ASCII85Decode /FlateDecode]`). Supported: FlateDecode,
    * ASCIIHexDecode, ASCII85Decode, LZWDecode (with the PDF early-change
    * default), RunLengthDecode (§7.4.5). Other filters fail loud. */
  /** /Filter entry as an ordered name list: a single name or the
    * array form (shared by content/ObjStm/xref streams and image
    * XObjects — ONE copy of the grammar). */
  private def parseFilters(dict: String): Seq[String] =
    """/Filter\s*\[([^\]]*)\]""".r.findFirstMatchIn(dict) match {
      case Some(m) => """/([A-Za-z0-9]+)""".r.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq
      case None =>
        """/Filter\s*/([A-Za-z0-9]+)""".r.findFirstMatchIn(dict).map(_.group(1)).toSeq
    }

  /** One NON-IMAGE filter stage (the §7.4 general-purpose set). */
  private def applyBaseFilter(f: String, data: Array[Byte],
                              objNum: Int): Array[Byte] = f match {
    case "FlateDecode" => inflate(data)
    case "ASCIIHexDecode" => asciiHexDecode(data)
    case "ASCII85Decode" => ascii85Decode(data)
    case "LZWDecode" => lzwDecode(data)
    case "RunLengthDecode" => runLengthDecode(data)
    case other => throw new IllegalArgumentException(
      s"PdfCodec: object $objNum: unsupported stream filter /$other " +
        "(FlateDecode, ASCIIHexDecode, ASCII85Decode, LZWDecode, " +
        "RunLengthDecode or none)")
  }

  private def decodeStream(obj: PdfObj, byNum: Map[Int, PdfObj]): String = {
    val raw = obj.stream.getOrElse(
      throw new IllegalArgumentException(s"PdfCodec: object ${obj.num} has no stream data"))
    val filters: Seq[String] = parseFilters(obj.dict)
    // /DecodeParms may be an INDIRECT reference (spec §7.3.8) — a
    // predictor hidden behind one must still be honored, or Flate output
    // is returned un-de-predicted as silent garbage
    val parms = resolveDict(obj.dict, "DecodeParms", byNum)
      .orElse(resolveDict(obj.dict, "DP", byNum)).getOrElse("")
    val pd = parms + " " + obj.dict
    def parm(name: String, default: Int): Int =
      (s"""/$name\\s+(\\d+)""").r.findFirstMatchIn(pd).map(_.group(1).toInt).getOrElse(default)
    val decoded = filters.foldLeft(raw)((data, f) =>
      applyBaseFilter(f, data, obj.num))
    // Predictors (spec §7.4.4.4) belong to the Flate/LZW filter's
    // parameters and apply to its DECODED output — every modern writer
    // predictor-codes at least its xref stream (/Predictor 12), so
    // failing loud here (the pre-round-10 scope) rejected most PDF 1.5
    // files in the wild. Applied after the full chain: the real-world
    // shape is a single Flate filter (or a chain whose LAST stage is
    // Flate/LZW carrying the parms).
    val out =
      if (filters.exists(f => f == "FlateDecode" || f == "LZWDecode"))
        unpredict(decoded, parm("Predictor", 1), parm("Colors", 1),
          parm("BitsPerComponent", 8), parm("Columns", 1), obj.num)
      else decoded
    new String(out, ISO_8859_1)
  }

  /** Undo a /Predictor (spec §7.4.4.4): 1 = none, 2 = TIFF horizontal
    * differencing, 10–15 = the PNG filter set — where each row carries
    * its OWN leading filter-type byte (0 None, 1 Sub, 2 Up, 3 Average,
    * 4 Paeth; the declared 10–15 value only records what the encoder
    * preferred, decoding is identical for all of them). 8-bit components
    * only — the universal case for xref/ObjStm/content streams; sub-byte
    * depths fail loud rather than silently mis-shift. */
  private[graft] def unpredict(data: Array[Byte], predictor: Int, colors: Int,
                               bpc: Int, columns: Int, objNum: Int = -1): Array[Byte] = {
    if (predictor <= 1) return data
    require(bpc == 8, s"PdfCodec: object $objNum: /BitsPerComponent $bpc with " +
      s"/Predictor $predictor unsupported (8-bit components only)")
    require(colors >= 1 && columns >= 1,
      s"PdfCodec: object $objNum: invalid predictor shape /Colors $colors /Columns $columns")
    val bpp = colors
    val rowlen = colors * columns
    if (predictor == 2) {
      require(data.length % rowlen == 0,
        s"PdfCodec: object $objNum: TIFF-predicted data (${data.length} bytes) " +
          s"is not a whole number of $rowlen-byte rows")
      val out = data.clone()
      var r = 0
      while (r < out.length) {
        var i = bpp
        while (i < rowlen) {
          out(r + i) = ((out(r + i) + out(r + i - bpp)) & 0xff).toByte
          i += 1
        }
        r += rowlen
      }
      out
    } else if (predictor >= 10 && predictor <= 15) {
      require(data.length % (rowlen + 1) == 0,
        s"PdfCodec: object $objNum: PNG-predicted data (${data.length} bytes) " +
          s"is not a whole number of ${rowlen + 1}-byte (filter byte + row) rows")
      val nRows = data.length / (rowlen + 1)
      val out = new Array[Byte](nRows * rowlen)
      var row = 0
      while (row < nRows) {
        val ft = data(row * (rowlen + 1)) & 0xff
        val src = row * (rowlen + 1) + 1
        val dst = row * rowlen
        var i = 0
        while (i < rowlen) {
          val raw = data(src + i) & 0xff
          val left = if (i >= bpp) out(dst + i - bpp) & 0xff else 0
          val up = if (row > 0) out(dst - rowlen + i) & 0xff else 0
          val ul = if (row > 0 && i >= bpp) out(dst - rowlen + i - bpp) & 0xff else 0
          val v = ft match {
            case 0 => raw
            case 1 => raw + left
            case 2 => raw + up
            case 3 => raw + (left + up) / 2
            case 4 =>
              val p = left + up - ul
              val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
              raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
            case other => throw new IllegalArgumentException(
              s"PdfCodec: object $objNum: invalid PNG row filter type $other")
          }
          out(dst + i) = (v & 0xff).toByte
          i += 1
        }
        row += 1
      }
      out
    } else throw new IllegalArgumentException(
      s"PdfCodec: object $objNum: /Predictor $predictor unsupported (1, 2, 10-15)")
  }

  /** PNG-predictor ENCODE (the writer side of [[unpredict]]): rows of
    * `colors·columns` bytes each gain a leading filter-type byte. Rows
    * cycle Up → Sub → Paeth → Average → None deterministically, so a
    * multi-row payload exercises every decoder branch — the round-trip
    * gate's purpose; a production writer would pick per-row minimums
    * instead. Input length must be a whole number of rows (callers pad). */
  private[graft] def pngPredictEncode(data: Array[Byte], colors: Int,
                                      columns: Int): Array[Byte] = {
    val bpp = colors
    val rowlen = colors * columns
    require(rowlen > 0 && data.length % rowlen == 0,
      s"PdfCodec.pngPredictEncode: ${data.length} bytes is not a whole number " +
        s"of $rowlen-byte rows")
    val nRows = data.length / rowlen
    val out = new Array[Byte](nRows * (rowlen + 1))
    val cycle = Array(2, 1, 4, 3, 0) // Up, Sub, Paeth, Average, None
    var row = 0
    while (row < nRows) {
      val ft = cycle(row % cycle.length)
      val src = row * rowlen
      out(row * (rowlen + 1)) = ft.toByte
      var i = 0
      while (i < rowlen) {
        val raw = data(src + i) & 0xff
        val left = if (i >= bpp) data(src + i - bpp) & 0xff else 0
        val up = if (row > 0) data(src - rowlen + i) & 0xff else 0
        val ul = if (row > 0 && i >= bpp) data(src - rowlen + i - bpp) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
        }
        out(row * (rowlen + 1) + 1 + i) = ((raw - pred) & 0xff).toByte
        i += 1
      }
      row += 1
    }
    out
  }

  /** TIFF /Predictor 2 ENCODE: horizontal differencing at the component
    * stride; same whole-rows contract as the PNG encoder. */
  private[graft] def tiffPredictEncode(data: Array[Byte], colors: Int,
                                       columns: Int): Array[Byte] = {
    val bpp = colors
    val rowlen = colors * columns
    require(rowlen > 0 && data.length % rowlen == 0,
      s"PdfCodec.tiffPredictEncode: ${data.length} bytes is not a whole number " +
        s"of $rowlen-byte rows")
    val out = data.clone()
    var r = 0
    while (r < out.length) {
      var i = rowlen - 1
      while (i >= bpp) {
        out(r + i) = (((data(r + i) & 0xff) - (data(r + i - bpp) & 0xff)) & 0xff).toByte
        i -= 1
      }
      r += rowlen
    }
    out
  }

  /** §7.4.2: hex pairs, whitespace ignored, `>` EOD, odd length pads 0. */
  /** §7.4.5 /RunLengthDecode: length byte L — 0..127 copies the next
    * L+1 bytes literally, 129..255 repeats the next byte 257−L times,
    * 128 is EOD. A MISSING EOD rejects loud (that is silent
    * truncation), but the spec only requires decoding to STOP at EOD —
    * wild PDFs pad after it (whitespace kept inside /Length), and the
    * filter's own terminator makes trailing bytes unambiguous, so they
    * are tolerated. */
  private[graft] def runLengthDecode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length * 2 + 16)
    var i = 0
    var done = false
    while (!done) {
      require(i < data.length, "PdfCodec: RunLength stream missing EOD (128)")
      val l = data(i) & 0xff
      i += 1
      if (l == 128) done = true
      else if (l < 128) {
        require(i + l + 1 <= data.length,
          s"PdfCodec: RunLength literal run of ${l + 1} overruns the stream")
        out.write(data, i, l + 1)
        i += l + 1
      } else {
        require(i < data.length, "PdfCodec: RunLength repeat run truncated")
        val n = 257 - l
        var k = 0
        while (k < n) { out.write(data(i)); k += 1 }
        i += 1
      }
    }
    out.toByteArray
  }

  /** [[runLengthDecode]]'s mirror for the in-engine writer: repeat runs
    * of 3+ become (257−n, byte) packets (n ≤ 128), the rest literal
    * packets of ≤ 128 bytes, terminated by EOD. */
  private[graft] def runLengthEncode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length + data.length / 128 + 2)
    var i = 0
    while (i < data.length) {
      var run = 1
      while (i + run < data.length && run < 128 && data(i + run) == data(i)) run += 1
      if (run >= 3) {
        out.write(257 - run); out.write(data(i)); i += run
      } else {
        val start = i
        var j = i
        var stop = false
        while (!stop && j < data.length && j - start < 128) {
          var r = 1
          while (j + r < data.length && r < 3 && data(j + r) == data(j)) r += 1
          if (r >= 3 && j > start) stop = true else j += 1
        }
        out.write(j - start - 1)
        out.write(data, start, j - start)
        i = j
      }
    }
    out.write(128) // EOD
    out.toByteArray
  }

  private[graft] def asciiHexDecode(data: Array[Byte]): Array[Byte] = {
    val s = new String(data, ISO_8859_1)
    val end = s.indexOf('>')
    val hex = (if (end >= 0) s.substring(0, end) else s).filterNot(_.isWhitespace)
    val padded = if (hex.length % 2 == 1) hex + "0" else hex
    padded.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
  }

  /** §7.4.3: base-85 groups of 5 chars ('!'..'u') → 4 bytes, `z` = four
    * zero bytes, `~>` EOD, partial final group keeps n−1 bytes. */
  private[graft] def ascii85Decode(data: Array[Byte]): Array[Byte] = {
    val s = new String(data, ISO_8859_1)
    val body0 = s.indexOf("~>") match { case -1 => s; case i => s.substring(0, i) }
    val body = body0.filterNot(_.isWhitespace).stripPrefix("<~")
    val out = new ByteArrayOutputStream(body.length * 4 / 5 + 4)
    var group = new Array[Int](5)
    var gi = 0
    def flush(n: Int): Unit = {
      // pad with 'u' (84) per spec, emit n-1 bytes
      var tuple = 0L
      (0 until 5).foreach(i => tuple = tuple * 85 + (if (i < n) group(i) else 84))
      require(tuple <= 0xffffffffL, "PdfCodec: ASCII85 group overflows 2^32")
      val bytes = Array(((tuple >> 24) & 0xff).toByte, ((tuple >> 16) & 0xff).toByte,
        ((tuple >> 8) & 0xff).toByte, (tuple & 0xff).toByte)
      out.write(bytes, 0, n - 1)
    }
    body.foreach { c =>
      if (c == 'z') {
        require(gi == 0, "PdfCodec: ASCII85 'z' inside a group")
        out.write(Array[Byte](0, 0, 0, 0), 0, 4)
      } else {
        require(c >= '!' && c <= 'u', s"PdfCodec: ASCII85 char '$c' out of range")
        group(gi) = c - '!'
        gi += 1
        if (gi == 5) { flush(5); gi = 0 }
      }
    }
    if (gi > 0) {
      require(gi >= 2, "PdfCodec: ASCII85 final group of 1 char is invalid")
      flush(gi)
    }
    out.toByteArray
  }

  /** §7.4.4: LZW with variable 9–12-bit codes, MSB-first bit packing,
    * clear=256, EOD=257, and PDF's default EarlyChange=1 (code width
    * bumps one entry early). */
  private[graft] def lzwDecode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length * 3)
    var dict = mutable.ArrayBuffer.empty[Array[Byte]]
    def resetDict(): Unit = {
      dict = mutable.ArrayBuffer.tabulate(256)(i => Array(i.toByte))
      dict += Array.emptyByteArray // 256 clear
      dict += Array.emptyByteArray // 257 EOD
    }
    resetDict()
    var width = 9
    var prev: Array[Byte] = null
    var bitBuf = 0L
    var bitCnt = 0
    var pos = 0
    while (pos < data.length || bitCnt >= width) {
      if (bitCnt < width) {
        bitBuf = (bitBuf << 8) | (data(pos) & 0xffL); bitCnt += 8; pos += 1
      } else {
        val code = ((bitBuf >> (bitCnt - width)) & ((1L << width) - 1)).toInt
        bitCnt -= width
        code match {
          case 256 => resetDict(); width = 9; prev = null
          case 257 => return out.toByteArray
          case _ =>
            val entry =
              if (code < dict.length && (code < 256 || dict(code).nonEmpty)) dict(code)
              else if (code == dict.length && prev != null) prev :+ prev(0)
              else throw new IllegalArgumentException(
                s"PdfCodec: LZW code $code out of range (dict ${dict.length})")
            out.write(entry, 0, entry.length)
            if (prev != null) dict += (prev :+ entry(0))
            prev = entry
            // EarlyChange=1: widen one entry before the table fills
            if (dict.length + 1 >= (1 << width) && width < 12) width += 1
        }
      }
    }
    out.toByteArray // EOD-less streams end at data exhaustion
  }

  private[graft] def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new ByteArrayOutputStream(data.length * 4)
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsDictionary()) {
          // zlib FDICT: inflate() returns 0 with needsInput()==false
          // forever — without this check the loop hangs a task instead
          // of failing loud
          throw new IllegalArgumentException(
            "PdfCodec: FlateDecode stream requires a preset dictionary (zlib FDICT) — unsupported")
        }
        if (n == 0 && inf.needsInput()) {
          throw new IllegalArgumentException("PdfCodec: truncated FlateDecode stream")
        }
        out.write(buf, 0, n)
      }
    } finally inf.end()
    out.toByteArray
  }

  // ── content-stream text extraction ─────────────────────────────────

  /** Walk one page's content stream and assemble its text: strings shown
    * by Tj/'/"/TJ inside BT…ET, newlines from the line operators (T*,
    * ', ") and from Td/TD when text already exists on the page — the
    * reading-order heuristic for single-column text. Strings are kept as
    * RAW bytes until a show operator fires, then decoded under the
    * current font (selected by Tf against `fonts`; SimpleFont when no
    * Tf was seen or the name is unknown — the legacy simple-PDF path). */
  private[graft] def extractFromContent(content: String,
                                        fonts: Map[String, FontDec] = Map.empty): String =
    extractFromContent(content, PageCtx(fonts, Map.empty, Map.empty, depth = 0))

  private[graft] def extractFromContent(content: String, ctx: PageCtx): String = {
    val fonts = ctx.fonts
    val buf = new StringBuilder
    var inText = false
    var curFont: FontDec = SimpleFont
    // operand stack: only strings, TJ arrays, and the Tf font name matter
    var lastString: String = null
    var lastArray: Seq[String] = null
    var lastName: String = null
    def newline(): Unit =
      if (buf.nonEmpty) buf.append('\n')
    def show(raw: String): Unit = buf.append(decodeShown(raw, curFont))
    var p = 0
    val n = content.length
    while (p < n) {
      val c = content.charAt(p)
      if (c.isWhitespace) p += 1
      else if (c == '%') { while (p < n && content.charAt(p) != '\n') p += 1 }
      else if (c == '(') {
        val end = literalStringEnd(content, p)
        lastString = decodeLiteral(content.substring(p + 1, end - 1))
        p = end
      }
      else if (c == '<' && p + 1 < n && content.charAt(p + 1) == '<') {
        p = balancedDictEnd(content, p) // e.g. inline-image dicts: skip
      }
      else if (c == '<') {
        val end = content.indexOf('>', p)
        require(end >= 0, "PdfCodec: unterminated hex string")
        lastString = decodeHex(content.substring(p + 1, end))
        p = end + 1
      }
      else if (c == '[') {
        val (arr, end) = parseArray(content, p)
        lastArray = arr
        p = end
      }
      else if (c == '/') {
        // name operand — remember it: `/F1 12 Tf` selects a font
        val st = p + 1
        p = st
        while (p < n && !content.charAt(p).isWhitespace &&
          !"()<>[]/%".contains(content.charAt(p))) p += 1
        lastName = content.substring(st, p)
      }
      else if (c == '+' || c == '-' || c == '.' || c.isDigit) {
        // number operand — irrelevant to text assembly
        p += 1
        while (p < n && !content.charAt(p).isWhitespace &&
          !"()<>[]/%".contains(content.charAt(p))) p += 1
      }
      else {
        // operator keyword
        val st = p
        while (p < n && !content.charAt(p).isWhitespace &&
          !"()<>[]/%".contains(content.charAt(p))) p += 1
        // a stray delimiter (lone ')', '>' or ']') at operator position
        // yields an EMPTY token and p has not advanced — failing loud
        // here beats the alternative: an infinite scan loop hanging the
        // task on one malformed blob
        require(p > st, s"PdfCodec: unexpected delimiter '${content.charAt(p)}' " +
          s"at content offset $p — malformed content stream")
        content.substring(st, p) match {
          case "Do" if lastName != null =>
            // XObject invocation: FORM XObjects carry page content —
            // common real-world layouts (LaTeX, Quartz) wrap entire page
            // bodies in them, so dropping Do would silently lose pages.
            // The form's stream extracts recursively under its OWN
            // resources (falling back to the caller's), depth-capped.
            // Image XObjects carry no text — ignored.
            ctx.xobjects.get(lastName) match {
              case Some(x) if """/Subtype\s*/Form(?![a-zA-Z])""".r.findFirstIn(x.dict).isDefined =>
                require(ctx.depth < 8,
                  s"PdfCodec: Form XObject nesting exceeds depth 8 (cycle?) at /$lastName")
                val res = resolveDict(x.dict, "Resources", ctx.byNum)
                val sub = PageCtx(
                  if (res.isDefined) fontsOf(res, ctx.byNum) else ctx.fonts,
                  if (res.isDefined) xobjectsOf(res, ctx.byNum) else ctx.xobjects,
                  ctx.byNum, ctx.depth + 1)
                buf.append(extractFromContent(decodeStream(x, ctx.byNum), sub))
              case _ => () // image / unresolvable — no text to extract
            }
          case "BI" =>
            // inline image (§8.9.7): `BI <dict entries> ID <binary> EI`.
            // The binary payload must not be tokenized (it can contain
            // parens/backslashes that would corrupt the scan). Skip to
            // the EI delimiter: per the spec's own guidance, the first
            // `EI` preceded by whitespace and followed by whitespace/EOF
            // ends the image — the PDFBox heuristic.
            // Find ID by TOKENIZING the dict, not substring search: a
            // bare indexOf("ID") can hit those two bytes inside a name
            // or string value and shift the payload scan into the dict.
            // Mirror the main loop's operand rules; ID counts only as a
            // standalone keyword token.
            var id = -1
            var t = p
            while (id < 0) {
              require(t < n, "PdfCodec: inline image BI without ID")
              val tc = content.charAt(t)
              if (tc.isWhitespace) t += 1
              else if (tc == '%') { while (t < n && content.charAt(t) != '\n') t += 1 }
              else if (tc == '(') t = literalStringEnd(content, t)
              else if (tc == '<' && t + 1 < n && content.charAt(t + 1) == '<')
                t = balancedDictEnd(content, t)
              else if (tc == '<') {
                val e = content.indexOf('>', t)
                require(e >= 0, "PdfCodec: unterminated hex string in BI dict")
                t = e + 1
              }
              else if (tc == '[') t = parseArray(content, t)._2
              else {
                val ts = if (tc == '/') t + 1 else t
                var te = ts
                while (te < n && !content.charAt(te).isWhitespace &&
                  !"()<>[]/%".contains(content.charAt(te))) te += 1
                require(te > t, s"PdfCodec: unexpected delimiter '$tc' in BI dict at $t")
                if (tc != '/' && content.substring(ts, te) == "ID") id = t
                t = te
              }
            }
            var q = id + 3 // ID + one whitespace byte before the data
            var found = -1
            while (found < 0 && q + 1 < n) {
              if (content.charAt(q) == 'E' && content.charAt(q + 1) == 'I' &&
                  content.charAt(q - 1).isWhitespace &&
                  (q + 2 >= n || content.charAt(q + 2).isWhitespace)) found = q
              else q += 1
            }
            require(found >= 0, "PdfCodec: inline image ID without terminating EI")
            p = found + 2
          case "BT" => inText = true
          case "ET" => inText = false
          case "Tf" if lastName != null =>
            curFont = fonts.getOrElse(lastName, SimpleFont)
          case "Tj" if inText && lastString != null => show(lastString)
          case "'" if inText && lastString != null => newline(); show(lastString)
          case "\"" if inText && lastString != null => newline(); show(lastString)
          case "TJ" if inText && lastArray != null => lastArray.foreach(show)
          case "Td" | "TD" if inText => newline()
          case "T*" if inText => newline()
          case _ => () // graphics/state operators — ignored
        }
      }
    }
    buf.toString
  }

  private def parseArray(s: String, start: Int): (Seq[String], Int) = {
    val acc = mutable.Buffer.empty[String]
    var p = start + 1
    while (p < s.length && s.charAt(p) != ']') {
      val c = s.charAt(p)
      if (c == '(') {
        val end = literalStringEnd(s, p)
        acc += decodeLiteral(s.substring(p + 1, end - 1))
        p = end
      } else if (c == '<') {
        val end = s.indexOf('>', p)
        require(end >= 0, "PdfCodec: unterminated hex string in array")
        acc += decodeHex(s.substring(p + 1, end))
        p = end + 1
      } else p += 1 // kerning numbers / whitespace
    }
    require(p < s.length, "PdfCodec: unterminated array")
    (acc.toSeq, p + 1)
  }

  /** PDF literal-string body → text (escapes, octal, continuations,
    * raw-EOL normalization; bytes are Latin-1). */
  private[graft] def decodeLiteral(body: String): String = {
    val out = new StringBuilder
    var p = 0
    val n = body.length
    while (p < n) {
      val c = body.charAt(p)
      if (c == '\\' && p + 1 < n) {
        body.charAt(p + 1) match {
          case 'n' => out.append('\n'); p += 2
          case 'r' => out.append('\r'); p += 2
          case 't' => out.append('\t'); p += 2
          case 'b' => out.append('\b'); p += 2
          case 'f' => out.append('\f'); p += 2
          case '(' => out.append('('); p += 2
          case ')' => out.append(')'); p += 2
          case '\\' => out.append('\\'); p += 2
          case '\r' => p += 2; if (p < n && body.charAt(p) == '\n') p += 1 // continuation
          case '\n' => p += 2 // continuation
          case d if d >= '0' && d <= '7' =>
            var q = p + 1
            var v = 0
            while (q < n && q < p + 4 && body.charAt(q) >= '0' && body.charAt(q) <= '7') {
              v = v * 8 + (body.charAt(q) - '0'); q += 1
            }
            out.append((v & 0xff).toChar); p = q
          case other => out.append(other); p += 2 // spec: lone \x → x
        }
      } else if (c == '\r') {
        out.append('\n'); p += 1; if (p < n && body.charAt(p) == '\n') p += 1
      } else { out.append(c); p += 1 }
    }
    out.toString
  }

  private[graft] def decodeHex(body: String): String = {
    val hex = body.filterNot(_.isWhitespace)
    val padded = if (hex.length % 2 == 1) hex + "0" else hex
    padded.grouped(2).map(h => Integer.parseInt(h, 16).toChar).mkString
  }

  // ── writer (the test/round-trip side) ──────────────────────────────

  /** Write a minimal single-font PDF: one content stream per page,
    * `BT /F1 12 Tf 72 720 Td (…) Tj ET`, Flate-compressed by default,
    * classic xref + trailer. Text must be Latin-1-representable (the
    * decoder's simple-font scope). */
  def encodePdf(pages: Seq[String], compress: Boolean = true,
                encryption: Option[PdfCrypto.EncryptSpec] = None,
                differences: Seq[(Char, Int, String)] = Nil,
                runLength: Boolean = false): Array[Byte] = {
    // `runLength` wraps each content stream in /RunLengthDecode (§7.4.5)
    // — over Flate it writes the CHAIN [ /RunLengthDecode /FlateDecode ]
    // (decode order left to right), the remaining non-image
    // content-stream filter of §7.4.5 after the round-12 AHx/A85/LZW legs
    // `differences` = (source char, byte code, glyph name): shown strings
    // carry CODE bytes where the char appeared and the font dict carries
    // the matching /Encoding /Differences — a real subset-font shape, so
    // the decoder's glyph-list path can be gated on writer-independent
    // expectations (extracted text shows the glyph's UNICODE, not the
    // source char)
    differences.foreach { case (_, code, _) =>
      require(code >= 0 && code <= 255, s"PdfCodec.encodePdf: /Differences code $code") }
    require(differences.map(_._2).distinct.length == differences.length,
      "PdfCodec.encodePdf: duplicate /Differences codes")
    require(differences.map(_._1).distinct.length == differences.length,
      "PdfCodec.encodePdf: duplicate /Differences source chars")
    // fail-loud guard: if the TEXT already contains the byte a remap
    // assigns (and that byte is not itself the mapping's source), the
    // decoder would route the original char through the glyph too —
    // silent garbage, so refuse the encode instead
    differences.foreach { case (src, code, glyph) =>
      if (code.toChar != src)
        require(!pages.exists(_.contains(code.toChar)),
          f"PdfCodec.encodePdf: text contains char 0x$code%02x which " +
            s"/Differences maps to /$glyph — remap would corrupt it")
    }
    val diffByChar = differences.map { case (c, code, _) => c -> code.toChar }.toMap
    val nPages = pages.length
    val fontNum = 3 + 2 * nPages
    val encNum = fontNum + 1
    val cipher = encryption.map(_.decryptor)
    val out = new ByteArrayOutputStream()
    val offsets = mutable.Buffer.empty[(Int, Int)] // objNum -> offset
    def w(str: String): Unit = out.write(str.getBytes(ISO_8859_1))
    w("%PDF-1.4\n%âãÏÓ\n")
    def beginObj(num: Int): Unit = { offsets += (num -> out.size()); w(s"$num 0 obj\n") }
    beginObj(1); w("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    val kids = (0 until nPages).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    beginObj(2); w(s"<< /Type /Pages /Kids [ $kids ] /Count $nPages >>\nendobj\n")
    pages.zipWithIndex.foreach { case (text, i) =>
      val pageNum = 3 + 2 * i
      val contNum = 4 + 2 * i
      beginObj(pageNum)
      w(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 $fontNum 0 R >> >> /Contents $contNum 0 R >>\nendobj\n")
      val shown = if (diffByChar.isEmpty) text
                  else text.map(c => diffByChar.getOrElse(c, c)).mkString
      val content = s"BT /F1 12 Tf 72 720 Td (${escapeLiteral(shown)}) Tj ET"
      val encoded0 =
        if (compress) deflate(content.getBytes(ISO_8859_1))
        else content.getBytes(ISO_8859_1)
      val plain = if (runLength) runLengthEncode(encoded0) else encoded0
      // spec §7.6.2 ordering: encryption wraps the ENCODED (compressed)
      // stream bytes — decrypt-then-decompress on the read side
      val data = cipher.map(_.encrypt(contNum, 0, plain)).getOrElse(plain)
      beginObj(contNum)
      val filter =
        if (compress && runLength) " /Filter [ /RunLengthDecode /FlateDecode ]"
        else if (compress) " /Filter /FlateDecode"
        else if (runLength) " /Filter /RunLengthDecode"
        else ""
      w(s"<< /Length ${data.length}$filter >>\nstream\n")
      out.write(data)
      w("\nendstream\nendobj\n")
    }
    beginObj(fontNum)
    val diffEnc =
      if (differences.isEmpty) ""
      else differences.map { case (_, code, glyph) => s"$code /$glyph" }
        .mkString(" /Encoding << /Differences [ ", " ", " ] >>")
    w(s"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica$diffEnc >>\nendobj\n")
    encryption.foreach { e =>
      beginObj(encNum)
      w(s"${e.dict}\nendobj\n")
    }
    val xrefAt = out.size()
    val total = (if (encryption.isDefined) encNum else fontNum) + 1
    w(s"xref\n0 $total\n0000000000 65535 f \n")
    offsets.sortBy(_._1).foreach { case (_, off) => w(f"$off%010d 00000 n \n") }
    val encTrailer = encryption.map(_.trailerExtra(encNum)).getOrElse("")
    w(s"trailer\n<< /Size $total /Root 1 0 R $encTrailer>>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  /** Write a genuine PDF 1.5 file: the document-structure dicts
    * (catalog, page tree, pages, font) packed into ONE Flate-compressed
    * object stream (/Type /ObjStm — content streams stay top-level, the
    * spec forbids nesting streams), indexed by a binary CROSS-REFERENCE
    * STREAM (/Type /XRef, W [1 4 2], type-2 entries pointing into the
    * object stream) instead of a classic xref table — the layout every
    * modern writer emits. Round-trips through [[extractText]]'s ObjStm
    * expansion; same page/text scope as [[encodePdf]]. */
  def encodePdf15(pages: Seq[String], compress: Boolean = true,
                  predictor: Int = 1,
                  encryption: Option[PdfCrypto.EncryptSpec] = None): Array[Byte] = {
    require(predictor == 1 || predictor == 2 || (predictor >= 10 && predictor <= 15),
      s"PdfCodec.encodePdf15: /Predictor $predictor out of scope (1, 2, 10-15)")
    require(predictor == 1 || compress,
      "PdfCodec.encodePdf15: a predictor is a Flate filter parameter — compress=false " +
        "with predictor > 1 would write DecodeParms no filter carries")
    // predictor-coded payloads are whole rows of `predCols` bytes; text
    // payloads are padded with trailing spaces (harmless to the content
    // tokenizer and the ObjStm offset table alike)
    val predCols = 32
    def predict(payload: Array[Byte], cols: Int): Array[Byte] =
      if (predictor >= 10) pngPredictEncode(payload, 1, cols)
      else tiffPredictEncode(payload, 1, cols)
    def padded(payload: Array[Byte]): Array[Byte] =
      if (payload.length % predCols == 0) payload
      else payload ++ Array.fill(predCols - payload.length % predCols)(' '.toByte)
    // spec §7.6.2 ordering: predictor → Flate → ENCRYPT on write, so the
    // reader runs decrypt → inflate → unpredict; the xref stream itself
    // is exempt from encryption (its caller passes num = -1)
    val cipher = encryption.map(_.decryptor)
    def encode(payload: Array[Byte], cols: Int, num: Int): Array[Byte] = {
      val staged = if (predictor > 1) predict(payload, cols) else payload
      val packed = if (compress) deflate(staged) else staged
      if (num >= 0) cipher.map(_.encrypt(num, 0, packed)).getOrElse(packed)
      else packed
    }
    def parmsFor(cols: Int): String =
      if (predictor > 1)
        s" /DecodeParms << /Predictor $predictor /Columns $cols >>"
      else ""
    val nPages = pages.length
    val fontNum = 3 + 2 * nPages
    val objStmNum = fontNum + 1
    val xrefNum = fontNum + 2
    val encNum = fontNum + 3 // only present when encryption is on
    val out = new ByteArrayOutputStream()
    def w(str: String): Unit = out.write(str.getBytes(ISO_8859_1))
    def filt = if (compress) " /Filter /FlateDecode" else ""
    w("%PDF-1.5\n%âãÏÓ\n")
    val offsets = mutable.Map.empty[Int, Int]
    pages.zipWithIndex.foreach { case (text, i) =>
      val contNum = 4 + 2 * i
      offsets(contNum) = out.size()
      val content = s"BT /F1 12 Tf 72 720 Td (${escapeLiteral(text)}) Tj ET"
      val raw = if (predictor > 1) padded(content.getBytes(ISO_8859_1))
                else content.getBytes(ISO_8859_1)
      val data = encode(raw, predCols, contNum)
      w(s"$contNum 0 obj\n<< /Length ${data.length}$filt${parmsFor(predCols)} >>\nstream\n")
      out.write(data)
      w("\nendstream\nendobj\n")
    }
    val kids = (0 until nPages).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    val inStm: Seq[(Int, String)] =
      Seq(1 -> "<< /Type /Catalog /Pages 2 0 R >>",
        2 -> s"<< /Type /Pages /Kids [ $kids ] /Count $nPages >>") ++
      (0 until nPages).map { i =>
        (3 + 2 * i) -> (s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
          s"/Resources << /Font << /F1 $fontNum 0 R >> >> /Contents ${4 + 2 * i} 0 R >>")
      } :+ (fontNum -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    // ObjStm payload: "num offset" header pairs, then the dicts
    // space-separated; offsets are relative to /First (= header length)
    val bodies = inStm.map(_._2)
    val offs = bodies.scanLeft(0)((acc, b) => acc + b.length + 1).init
    val header = inStm.zip(offs).map { case ((num, _), off) => s"$num $off" }
      .mkString(" ") + "\n"
    val payload0 = (header + bodies.mkString(" ")).getBytes(ISO_8859_1)
    val payload = if (predictor > 1) padded(payload0) else payload0
    val stmData = encode(payload, predCols, objStmNum)
    offsets(objStmNum) = out.size()
    w(s"$objStmNum 0 obj\n<< /Type /ObjStm /N ${inStm.length} /First ${header.length} " +
      s"/Length ${stmData.length}$filt${parmsFor(predCols)} >>\nstream\n")
    out.write(stmData)
    w("\nendstream\nendobj\n")
    // the /Encrypt dict rides as a TOP-LEVEL object (never inside the
    // ObjStm: the security handler must be readable before decryption)
    encryption.foreach { e =>
      offsets(encNum) = out.size()
      w(s"$encNum 0 obj\n${e.dict}\nendobj\n")
    }
    // cross-reference stream: type 0 = free, 1 = at byte offset,
    // 2 = (objstm number, index within it); W [1 4 2]
    val total = (if (encryption.isDefined) encNum else xrefNum) + 1
    val xrefAt = out.size()
    val entries = new ByteArrayOutputStream()
    def entry(t: Int, f2: Int, f3: Int): Unit = {
      entries.write(t)
      entries.write((f2 >> 24) & 0xff); entries.write((f2 >> 16) & 0xff)
      entries.write((f2 >> 8) & 0xff); entries.write(f2 & 0xff)
      entries.write((f3 >> 8) & 0xff); entries.write(f3 & 0xff)
    }
    (0 until total).foreach { num =>
      if (num == 0) entry(0, 0, 0xffff)
      else if (num == xrefNum) entry(1, xrefAt, 0)
      else offsets.get(num) match {
        case Some(off) => entry(1, off, 0)
        case None => entry(2, objStmNum, inStm.indexWhere(_._1 == num))
      }
    }
    // the xref stream is the predictor's real-world home (/Predictor 12
    // over W-sum-wide rows — the layout Word/pdfTeX/Chrome all emit);
    // its 7-byte entries ARE the rows, no padding
    val xdata = encode(entries.toByteArray, 7, -1) // xref stream: never encrypted
    // PDF 1.5 style: the trailer entries (/Encrypt, /ID) ride the xref
    // STREAM's dict — there is no classic trailer in this layout
    val encTrailer = encryption.map(_.trailerExtra(encNum)).getOrElse("")
    w(s"$xrefNum 0 obj\n<< /Type /XRef /Size $total /W [1 4 2] /Root 1 0 R $encTrailer" +
      s"/Length ${xdata.length}$filt${parmsFor(7)} >>\nstream\n")
    out.write(xdata)
    w("\nendstream\nendobj\n")
    w(s"startxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  /** Write a CJK-capable PDF with a COMPOSITE (Type0 /Identity-H) font:
    * each distinct character gets a sequential 2-byte code in
    * first-appearance order — the shape a real subset font produces
    * (glyph ids, NOT code points) — content streams show hex strings of
    * those codes, and a /ToUnicode CMap (bfchar + bfrange blocks,
    * including one array-dst range) carries code→Unicode, so decoding a
    * document produced here genuinely exercises the full CMap path: a
    * decoder that ignored the CMap would emit garbage, not
    * accidentally-right text. Mirrors what PDFBox reads for the
    * reference's Japanese corpus (Function.java:90-132). */
  def encodeCidPdf(pages: Seq[String], compress: Boolean = true): Array[Byte] = {
    val codeOf = mutable.LinkedHashMap.empty[Char, Int]
    pages.foreach(_.foreach { ch =>
      require(!ch.isSurrogate,
        f"PdfCodec.encodeCidPdf: non-BMP char U+${ch.toInt}%04x outside 2-byte CID scope")
      if (!codeOf.contains(ch)) codeOf(ch) = codeOf.size + 1
    })
    require(codeOf.size <= 0xFFFE,
      s"PdfCodec.encodeCidPdf: ${codeOf.size} distinct chars exceed the 2-byte code space")
    val nPages = pages.length
    val fontNum = 3 + 2 * nPages
    val descNum = fontNum + 1
    val tuNum = fontNum + 2
    val out = new ByteArrayOutputStream()
    val offsets = mutable.Buffer.empty[(Int, Int)]
    def w(str: String): Unit = out.write(str.getBytes(ISO_8859_1))
    def beginObj(num: Int): Unit = { offsets += (num -> out.size()); w(s"$num 0 obj\n") }
    def writeStreamObj(num: Int, payload: Array[Byte]): Unit = {
      val data = if (compress) deflate(payload) else payload
      beginObj(num)
      val filter = if (compress) " /Filter /FlateDecode" else ""
      w(s"<< /Length ${data.length}$filter >>\nstream\n")
      out.write(data)
      w("\nendstream\nendobj\n")
    }
    w("%PDF-1.4\n%âãÏÓ\n")
    beginObj(1); w("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    val kids = (0 until nPages).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    beginObj(2); w(s"<< /Type /Pages /Kids [ $kids ] /Count $nPages >>\nendobj\n")
    pages.zipWithIndex.foreach { case (text, i) =>
      val pageNum = 3 + 2 * i
      val contNum = 4 + 2 * i
      beginObj(pageNum)
      w(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 $fontNum 0 R >> >> /Contents $contNum 0 R >>\nendobj\n")
      val hex = text.map(ch => f"${codeOf(ch)}%04X").mkString
      writeStreamObj(contNum, s"BT /F1 12 Tf 72 720 Td <$hex> Tj ET".getBytes(ISO_8859_1))
    }
    beginObj(fontNum)
    w(s"<< /Type /Font /Subtype /Type0 /BaseFont /GraftCID /Encoding /Identity-H " +
      s"/DescendantFonts [ $descNum 0 R ] /ToUnicode $tuNum 0 R >>\nendobj\n")
    beginObj(descNum)
    w("<< /Type /Font /Subtype /CIDFontType2 /BaseFont /GraftCID " +
      "/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) /Supplement 0 >> >>\nendobj\n")
    writeStreamObj(tuNum, toUnicodeCmap(codeOf.toSeq).getBytes(ISO_8859_1))
    val xrefAt = out.size()
    val total = tuNum + 1
    w(s"xref\n0 $total\n0000000000 65535 f \n")
    offsets.sortBy(_._1).foreach { case (_, off) => w(f"$off%010d 00000 n \n") }
    w(s"trailer\n<< /Size $total /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  /** Write a PDF whose composite font carries an EMBEDDED /Encoding
    * CMap with MIXED code widths — the RKSJ shape real Japanese corpora
    * carry: printable ASCII shows as 1-byte codes (codespace <20><7E>,
    * code = the byte itself), every other BMP char takes a sequential
    * 2-byte code from 0x8140 (codespace <8140><FEFE>, per-byte ranges — first bytes
    * ≥ 0x81 never collide with the 1-byte range). The encoding CMap
    * maps codes to sequential CIDs (glyph selection — irrelevant to
    * extraction); the ToUnicode CMap carries width-matched sources.
    * A decoder that pairs bytes blindly (the Identity assumption)
    * garbles every ASCII run, so round-tripping this file genuinely
    * gates the variable-width tokenizer. */
  def encodeCmapPdf(pages: Seq[String], compress: Boolean = true): Array[Byte] = {
    val codeOf = mutable.LinkedHashMap.empty[Char, (Int, Int)] // char -> (width, code)
    // codespace containment is PER BYTE (spec §9.7.6.2): inside
    // <8140> <FEFE> each byte must stay in its own range, so allocation
    // walks (hiByte, loByte) with loByte wrapping at 0xFE — a linear
    // integer increment would emit codes like 0x81FF/0x8200 that match
    // no codespace in a conformant reader. Capacity 126×191 = 24 066.
    var hi2 = 0x81; var lo2 = 0x40
    pages.foreach(_.foreach { ch =>
      require(!ch.isSurrogate,
        f"PdfCodec.encodeCmapPdf: non-BMP char U+${ch.toInt}%04x outside 2-byte scope")
      if (!codeOf.contains(ch)) {
        if (ch >= 0x20 && ch <= 0x7e) codeOf(ch) = (1, ch.toInt)
        else {
          require(hi2 <= 0xFE,
            s"PdfCodec.encodeCmapPdf: 2-byte code space exhausted (24066 codes)")
          codeOf(ch) = (2, (hi2 << 8) | lo2)
          lo2 += 1
          if (lo2 > 0xFE) { lo2 = 0x40; hi2 += 1 }
        }
      }
    })
    val nPages = pages.length
    val fontNum = 3 + 2 * nPages
    val descNum = fontNum + 1
    val tuNum = fontNum + 2
    val encNum = fontNum + 3
    val out = new ByteArrayOutputStream()
    val offsets = mutable.Buffer.empty[(Int, Int)]
    def w(str: String): Unit = out.write(str.getBytes(ISO_8859_1))
    def beginObj(num: Int): Unit = { offsets += (num -> out.size()); w(s"$num 0 obj\n") }
    def writeStreamObj(num: Int, payload: Array[Byte], extra: String = ""): Unit = {
      val data = if (compress) deflate(payload) else payload
      beginObj(num)
      val filter = if (compress) " /Filter /FlateDecode" else ""
      w(s"<< /Length ${data.length}$filter$extra >>\nstream\n")
      out.write(data)
      w("\nendstream\nendobj\n")
    }
    w("%PDF-1.4\n%âãÏÓ\n")
    beginObj(1); w("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    val kids = (0 until nPages).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    beginObj(2); w(s"<< /Type /Pages /Kids [ $kids ] /Count $nPages >>\nendobj\n")
    pages.zipWithIndex.foreach { case (text, i) =>
      val pageNum = 3 + 2 * i
      val contNum = 4 + 2 * i
      beginObj(pageNum)
      w(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 $fontNum 0 R >> >> /Contents $contNum 0 R >>\nendobj\n")
      val hex = text.map { ch =>
        val (wd, code) = codeOf(ch)
        if (wd == 1) f"$code%02X" else f"$code%04X"
      }.mkString
      writeStreamObj(contNum, s"BT /F1 12 Tf 72 720 Td <$hex> Tj ET".getBytes(ISO_8859_1))
    }
    beginObj(fontNum)
    w(s"<< /Type /Font /Subtype /Type0 /BaseFont /GraftCMap /Encoding $encNum 0 R " +
      s"/DescendantFonts [ $descNum 0 R ] /ToUnicode $tuNum 0 R >>\nendobj\n")
    beginObj(descNum)
    w("<< /Type /Font /Subtype /CIDFontType2 /BaseFont /GraftCMap " +
      "/CIDSystemInfo << /Registry (Graft) /Ordering (Mixed) /Supplement 0 >> >>\nendobj\n")
    // ToUnicode: width-matched sources, bfchar blocks of <=100
    val tu = new StringBuilder
    tu.append("/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n")
    tu.append("/CIDSystemInfo << /Registry (Graft) /Ordering (UCS) /Supplement 0 >> def\n")
    tu.append("/CMapName /GraftMixedToUnicode def\n/CMapType 2 def\n")
    tu.append("2 begincodespacerange\n<20> <7E>\n<8140> <FEFE>\nendcodespacerange\n")
    codeOf.toSeq.grouped(100).foreach { blk =>
      tu.append(s"${blk.length} beginbfchar\n")
      blk.foreach { case (ch, (wd, code)) =>
        val src = if (wd == 1) f"<$code%02X>" else f"<$code%04X>"
        tu.append(f"$src <${ch.toInt}%04X>\n")
      }
      tu.append("endbfchar\n")
    }
    tu.append("endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\n")
    writeStreamObj(tuNum, tu.toString.getBytes(ISO_8859_1))
    // the embedded /Encoding CMap: codespaces + code->CID (sequential)
    val enc = new StringBuilder
    enc.append("/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n")
    enc.append("/CIDSystemInfo << /Registry (Graft) /Ordering (Mixed) /Supplement 0 >> def\n")
    enc.append("/CMapName /GraftMixed-H def\n/CMapType 1 def\n/WMode 0 def\n")
    enc.append("2 begincodespacerange\n<20> <7E>\n<8140> <FEFE>\nendcodespacerange\n")
    codeOf.toSeq.zipWithIndex.grouped(100).foreach { blk =>
      enc.append(s"${blk.length} begincidchar\n")
      blk.foreach { case ((_, (wd, code)), cid) =>
        val src = if (wd == 1) f"<$code%02X>" else f"<$code%04X>"
        enc.append(s"$src ${cid + 1}\n")
      }
      enc.append("endcidchar\n")
    }
    enc.append("endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\n")
    writeStreamObj(encNum, enc.toString.getBytes(ISO_8859_1),
      extra = " /Type /CMap /CMapName /GraftMixed-H /WMode 0")
    val xrefAt = out.size()
    val total = encNum + 1
    w(s"xref\n0 $total\n0000000000 65535 f \n")
    offsets.sortBy(_._1).foreach { case (_, off) => w(f"$off%010d 00000 n \n") }
    w(s"trailer\n<< /Size $total /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  /** [[encodeCmapPdf]]'s sibling for the PREDEFINED-CMap leg: the Type0
    * font names a registered CMap (`/Encoding /90ms-RKSJ-H` or
    * `/UniJIS-UCS2-H`) instead of embedding a stream, carries NO
    * /ToUnicode, and the content strings hold the real encoded bytes
    * (Shift-JIS / UCS-2BE) — exactly the file shape real Japanese
    * corpora emit (the reference opens them through PDFBox's bundled
    * cmap-resources, Function.java:90-132). Because nothing else in the
    * file can map the codes, round-tripping this file genuinely gates
    * the built-in [[PredefCmaps]] tables. */
  def encodeCmapPredefPdf(pages: Seq[String], cmapName: String = "90ms-RKSJ-H",
                          compress: Boolean = true): Array[Byte] = {
    require(PredefCmaps.forName(cmapName).isDefined,
      s"PdfCodec.encodeCmapPredefPdf: no built-in table for /$cmapName")
    val nPages = pages.length
    val fontNum = 3 + 2 * nPages
    val descNum = fontNum + 1
    val out = new ByteArrayOutputStream()
    val offsets = mutable.Buffer.empty[(Int, Int)]
    def w(str: String): Unit = out.write(str.getBytes(ISO_8859_1))
    def beginObj(num: Int): Unit = { offsets += (num -> out.size()); w(s"$num 0 obj\n") }
    w("%PDF-1.4\n%âãÏÓ\n")
    beginObj(1); w("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    val kids = (0 until nPages).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    beginObj(2); w(s"<< /Type /Pages /Kids [ $kids ] /Count $nPages >>\nendobj\n")
    pages.zipWithIndex.foreach { case (text, i) =>
      val pageNum = 3 + 2 * i
      val contNum = 4 + 2 * i
      beginObj(pageNum)
      w(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 $fontNum 0 R >> >> /Contents $contNum 0 R >>\nendobj\n")
      val hex = {
        val sb = new StringBuilder
        var k = 0
        while (k < text.length) {
          val cp = text.codePointAt(k)
          val (wd, code) = PredefCmaps.encodeCodePoint(cmapName, cp)
          sb.append(wd match {
            case 1 => f"$code%02X"
            case 2 => f"$code%04X"
            case _ => f"$code%08X"
          })
          k += Character.charCount(cp)
        }
        sb.toString
      }
      val payload = s"BT /F1 12 Tf 72 720 Td <$hex> Tj ET".getBytes(ISO_8859_1)
      val data = if (compress) deflate(payload) else payload
      beginObj(contNum)
      val filter = if (compress) " /Filter /FlateDecode" else ""
      w(s"<< /Length ${data.length}$filter >>\nstream\n")
      out.write(data)
      w("\nendstream\nendobj\n")
    }
    beginObj(fontNum)
    w(s"<< /Type /Font /Subtype /Type0 /BaseFont /GraftPredef /Encoding /$cmapName " +
      s"/DescendantFonts [ $descNum 0 R ] >>\nendobj\n")
    beginObj(descNum)
    // the CIDFont's character collection must MATCH the CMap's (ISO
    // 32000-1 §9.7.5.2) — a GBK CMap over a Japan1 CIDFont is the kind
    // of spec violation a conformant reader rejects or mis-glyphs
    val (ordering, supplement) = PredefCmaps.orderingOf(cmapName)
    w("<< /Type /Font /Subtype /CIDFontType2 /BaseFont /GraftPredef " +
      s"/CIDSystemInfo << /Registry (Adobe) /Ordering ($ordering) " +
      s"/Supplement $supplement >> >>\nendobj\n")
    val xrefAt = out.size()
    val total = descNum + 1
    w(s"xref\n0 $total\n0000000000 65535 f \n")
    offsets.sortBy(_._1).foreach { case (_, off) => w(f"$off%010d 00000 n \n") }
    w(s"trailer\n<< /Size $total /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  /** Write a PDF whose pages show text through a SYMBOLIC simple
    * TrueType subset font: byte codes are assigned by FIRST APPEARANCE
    * (0x20 up — deliberately NOT the character's Latin-1 value, so a
    * decoder that skips the font program garbles every page), the font
    * dict carries NO /Encoding and NO /ToUnicode, and the only route
    * back to text is the embedded font program — /FontFile2 sfnt cmap
    * ([[TrueTypeFont.encodeProgram]]: (3,0) symbol leg + Unicode leg,
    * format 4 or — with `format12` — format 12), or with `cff` a
    * /FontFile3 /Type1C program ([[CffFont.encodeProgram]]: embedded
    * Encoding → charset → custom uniXXXX strings), or with `type1` a
    * /FontFile Type 1 program ([[Type1Font.encodeProgram]]: clear-text
    * /Encoding + eexec-encrypted CharStrings, /Length1/2/3 stream
    * dict). This is the subset-font file shape PDFBox resolves through
    * the embedded program inside the reference's Function.java:90-132. */
  def encodeFontProgPdf(pages: Seq[String], compress: Boolean = true,
                        format12: Boolean = false,
                        cff: Boolean = false,
                        otto: Boolean = false,
                        type1: Boolean = false): Array[Byte] = {
    require(Seq(cff, otto, type1).count(identity) <= 1,
      "PdfCodec.encodeFontProgPdf: cff, otto and type1 are mutually exclusive")
    // repertoire in first-appearance order over the page stream
    val repertoire = mutable.LinkedHashSet.empty[Int]
    pages.foreach { p =>
      var i = 0
      while (i < p.length) {
        val cp = p.codePointAt(i)
        repertoire += cp
        i += Character.charCount(cp)
      }
    }
    // a pageless/blank document still embeds a valid 1-glyph program
    val chars = if (repertoire.isEmpty) Seq(' '.toInt) else repertoire.toSeq
    require(chars.length <= 0xe0,
      s"PdfCodec.encodeFontProgPdf: ${chars.length} distinct chars exceed the " +
        "224 byte codes a simple font carries (0x20-0xFF)")
    val codeOf = chars.zipWithIndex.map { case (cp, i) => cp -> (0x20 + i) }.toMap
    val progEntries = chars.zipWithIndex.map { case (cp, i) => (0x20 + i, cp) }
    // (program bytes, Type 1's /Length1/2/3 — zeros for the other formats)
    val (program, t1Lens) =
      if (type1) {
        val (p, l1, l2, l3) = Type1Font.encodeProgram(progEntries)
        (p, Some((l1, l2, l3)))
      } else if (cff) (CffFont.encodeProgram(progEntries), None)
      else (TrueTypeFont.encodeProgram(progEntries, format12, otto), None)

    val nPages = pages.length
    val fontNum = 3 + 2 * nPages
    val descNum = fontNum + 1
    val ffNum = fontNum + 2
    val out = new ByteArrayOutputStream()
    val offsets = mutable.Buffer.empty[(Int, Int)]
    def w(str: String): Unit = out.write(str.getBytes(ISO_8859_1))
    def beginObj(num: Int): Unit = { offsets += (num -> out.size()); w(s"$num 0 obj\n") }
    w("%PDF-1.4\n%âãÏÓ\n")
    beginObj(1); w("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    val kids = (0 until nPages).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    beginObj(2); w(s"<< /Type /Pages /Kids [ $kids ] /Count $nPages >>\nendobj\n")
    pages.zipWithIndex.foreach { case (text, i) =>
      val pageNum = 3 + 2 * i
      val contNum = 4 + 2 * i
      beginObj(pageNum)
      w(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 $fontNum 0 R >> >> /Contents $contNum 0 R >>\nendobj\n")
      val shown = {
        val sb = new StringBuilder
        var k = 0
        while (k < text.length) {
          val cp = text.codePointAt(k)
          sb.append(codeOf(cp).toChar)
          k += Character.charCount(cp)
        }
        sb.toString
      }
      val content = s"BT /F1 12 Tf 72 720 Td (${escapeLiteral(shown)}) Tj ET"
      val data = if (compress) deflate(content.getBytes(ISO_8859_1))
                 else content.getBytes(ISO_8859_1)
      beginObj(contNum)
      val filter = if (compress) " /Filter /FlateDecode" else ""
      w(s"<< /Length ${data.length}$filter >>\nstream\n")
      out.write(data)
      w("\nendstream\nendobj\n")
    }
    beginObj(fontNum)
    val subtype = if (cff || otto || type1) "Type1" else "TrueType"
    w(s"<< /Type /Font /Subtype /$subtype /BaseFont /GRAFTA+Subset " +
      s"/FirstChar 32 /LastChar ${0x20 + chars.length - 1} " +
      s"/Widths [ ${Seq.fill(chars.length)("500").mkString(" ")} ] " +
      s"/FontDescriptor $descNum 0 R >>\nendobj\n")
    beginObj(descNum)
    // /Flags 4 = Symbolic (spec Table 123) — the bit that routes the
    // decoder to the font program instead of a standard encoding
    val ffKey = if (cff || otto) "FontFile3"
      else if (type1) "FontFile" else "FontFile2"
    w(s"<< /Type /FontDescriptor /FontName /GRAFTA+Subset /Flags 4 " +
      s"/FontBBox [0 0 1000 1000] /ItalicAngle 0 /Ascent 800 /Descent -200 " +
      s"/CapHeight 700 /StemV 80 /$ffKey $ffNum 0 R >>\nendobj\n")
    beginObj(ffNum)
    val ffData = if (compress) deflate(program) else program
    val ffFilter = if (compress) " /Filter /FlateDecode" else ""
    val ffSubtype =
      if (cff) " /Subtype /Type1C"
      else if (otto) " /Subtype /OpenType"
      else ""
    // Type 1 programs carry the spec's three-section lengths (Table 127);
    // the sfnt/CFF formats carry the single /Length1
    val ffLens = t1Lens match {
      case Some((l1, l2, l3)) => s" /Length1 $l1 /Length2 $l2 /Length3 $l3"
      case None => s" /Length1 ${program.length}"
    }
    w(s"<< /Length ${ffData.length}$ffLens$ffSubtype$ffFilter >>\nstream\n")
    out.write(ffData)
    w("\nendstream\nendobj\n")
    val xrefAt = out.size()
    val total = ffNum + 1
    w(s"xref\n0 $total\n0000000000 65535 f \n")
    offsets.sortBy(_._1).foreach { case (_, off) => w(f"$off%010d 00000 n \n") }
    w(s"trailer\n<< /Size $total /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  /** ToUnicode CMap text for (char → code) entries in code order.
    * Consecutive (code, char) runs that stay inside one high byte become
    * bfrange entries (the first in array-dst form, the rest single-dst)
    * so every round-trip exercises all three mapping forms; singleton
    * and short runs go to bfchar blocks. Blocks are ≤100 entries
    * (spec §9.10.3's operator limit). */
  private[graft] def toUnicodeCmap(entries: Seq[(Char, Int)]): String = {
    final case class Run(loCode: Int, loChar: Int, len: Int)
    val runs = mutable.Buffer.empty[Run]
    entries.foreach { case (ch, code) =>
      runs.lastOption match {
        case Some(r) if r.loCode + r.len == code && r.loChar + r.len == ch.toInt &&
            (r.loCode >> 8) == (code >> 8) =>
          runs(runs.length - 1) = r.copy(len = r.len + 1)
        case _ => runs += Run(code, ch.toInt, 1)
      }
    }
    val (ranges, chars) = runs.toSeq.partition(_.len >= 3)
    val sb = new StringBuilder
    sb.append("/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n")
    sb.append("/CIDSystemInfo << /Registry (Graft) /Ordering (UCS) /Supplement 0 >> def\n")
    sb.append("/CMapName /GraftToUnicode def\n/CMapType 2 def\n")
    sb.append("1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n")
    chars.flatMap(r => (0 until r.len).map(k => (r.loCode + k, r.loChar + k)))
      .grouped(100).foreach { blk =>
        sb.append(s"${blk.length} beginbfchar\n")
        blk.foreach { case (code, ch) => sb.append(f"<$code%04X> <$ch%04X>\n") }
        sb.append("endbfchar\n")
      }
    ranges.grouped(100).zipWithIndex.foreach { case (blk, bi) =>
      sb.append(s"${blk.length} beginbfrange\n")
      blk.zipWithIndex.foreach { case (r, ri) =>
        if (bi == 0 && ri == 0) {
          val dsts = (0 until r.len).map(k => f"<${r.loChar + k}%04X>").mkString(" ")
          sb.append(f"<${r.loCode}%04X> <${r.loCode + r.len - 1}%04X> [ $dsts ]\n")
        } else
          sb.append(f"<${r.loCode}%04X> <${r.loCode + r.len - 1}%04X> <${r.loChar}%04X>\n")
      }
      sb.append("endbfrange\n")
    }
    sb.append("endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\n")
    sb.toString
  }

  private[graft] def escapeLiteral(text: String): String = {
    text.foreach { c =>
      require(c <= 'ÿ',
        s"PdfCodec.encodePdf: non-Latin-1 char U+${c.toInt.toHexString} outside simple-font scope")
    }
    text.flatMap {
      case '\\' => "\\\\"
      case '(' => "\\("
      case ')' => "\\)"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c => c.toString
    }
  }

  private[graft] def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.BEST_SPEED)
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }
}
