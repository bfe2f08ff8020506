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
  *   - stream filters: none or /FlateDecode (zlib — `Inflater`);
  *     anything else (DCT, CCITT, crypt) raises a clear error rather
  *     than silently yielding garbage;
  *   - text operators inside BT…ET: Tj, ' (next-line show), " (spacing
  *     variant), TJ (array show — kerning numbers dropped); Td/TD/T*
  *     append a newline between text runs (the PDFTextStripper-like
  *     reading-order heuristic for the single-column PDFs in scope);
  *   - literal strings with the full escape set (\n \r \t \b \f \( \)
  *     \\, 1-3 digit octal, backslash-EOL continuation, raw-EOL → \n)
  *     and nested unescaped parens; hex strings <…> incl. odd-length
  *     padding; byte values map through Latin-1 (the WinAnsi core of
  *     the simple-font case — no CMap/TrueType-subset decoding, which
  *     is exactly where a real deployment swaps PDFBox back in).
  *
  * Out of scope (documented, fail-loud where detectable): object
  * streams (/Type /ObjStm), encryption, inline images (BI…EI), CID
  * fonts. The 100 TB-relevant part — binary column in, bounded per-row
  * work, no driver involvement — lives in [[PdfPipeline.extractPagesPdf]];
  * this object is deliberately plain JVM code so it runs inside
  * `mapPartitions` with zero task-side dependencies. */
object PdfCodec {

  // ── decoder ────────────────────────────────────────────────────────

  private final case class PdfObj(num: Int, dict: String, stream: Option[Array[Byte]])

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
        decodeStream(obj)
      }
      // spec: multiple content streams form ONE logical stream, joined
      // with at least one whitespace byte between them
      extractFromContent(content.mkString("\n"))
    }
  }

  /** Sequential object scan: find `N G obj`, parse the balanced dict,
    * then (if present) skip the stream payload via /Length — or, when
    * /Length is an indirect reference, by searching `endstream` — so the
    * cursor never tokenizes inside binary stream data. */
  private def scanObjects(s: String, bytes: Array[Byte]): Seq[PdfObj] = {
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
      out += PdfObj(num, dict, stream)
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

  private def decodeStream(obj: PdfObj): String = {
    val raw = obj.stream.getOrElse(
      throw new IllegalArgumentException(s"PdfCodec: object ${obj.num} has no stream data"))
    val filter = """/Filter\s*(?:\[\s*)?/([A-Za-z0-9]+)""".r.findFirstMatchIn(obj.dict).map(_.group(1))
    filter match {
      case None => new String(raw, ISO_8859_1)
      case Some("FlateDecode") => new String(inflate(raw), ISO_8859_1)
      case Some(other) =>
        throw new IllegalArgumentException(
          s"PdfCodec: unsupported stream filter /$other (FlateDecode or none)")
    }
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new ByteArrayOutputStream(data.length * 4)
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
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
    * reading-order heuristic for single-column text. */
  private[graft] def extractFromContent(content: String): String = {
    val buf = new StringBuilder
    var inText = false
    // operand stack: only the strings (and TJ arrays) matter
    var lastString: String = null
    var lastArray: Seq[String] = null
    def newline(): Unit =
      if (buf.nonEmpty) buf.append('\n')
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
      else if (c == '/' || c == '+' || c == '-' || c == '.' || c.isDigit) {
        // name or number operand — irrelevant to text assembly
        p += 1
        while (p < n && !content.charAt(p).isWhitespace &&
          !"()<>[]/%".contains(content.charAt(p))) p += 1
      }
      else {
        // operator keyword
        val st = p
        while (p < n && !content.charAt(p).isWhitespace &&
          !"()<>[]/%".contains(content.charAt(p))) p += 1
        content.substring(st, p) match {
          case "BT" => inText = true
          case "ET" => inText = false
          case "Tj" if inText && lastString != null => buf.append(lastString)
          case "'" if inText && lastString != null => newline(); buf.append(lastString)
          case "\"" if inText && lastString != null => newline(); buf.append(lastString)
          case "TJ" if inText && lastArray != null => lastArray.foreach(buf.append)
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
  def encodePdf(pages: Seq[String], compress: Boolean = true): Array[Byte] = {
    val nPages = pages.length
    val fontNum = 3 + 2 * nPages
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
      val content = s"BT /F1 12 Tf 72 720 Td (${escapeLiteral(text)}) Tj ET"
      val data =
        if (compress) deflate(content.getBytes(ISO_8859_1))
        else content.getBytes(ISO_8859_1)
      beginObj(contNum)
      val filter = if (compress) " /Filter /FlateDecode" else ""
      w(s"<< /Length ${data.length}$filter >>\nstream\n")
      out.write(data)
      w("\nendstream\nendobj\n")
    }
    beginObj(fontNum)
    w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    val xrefAt = out.size()
    val total = fontNum + 1
    w(s"xref\n0 $total\n0000000000 65535 f \n")
    offsets.sortBy(_._1).foreach { case (_, off) => w(f"$off%010d 00000 n \n") }
    w(s"trailer\n<< /Size $total /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
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

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.BEST_SPEED)
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }
}
