package graft.pipeline

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

/** WARC (Web ARChive, ISO 28500) record extraction — round 19: the
  * wire format web-scale training corpora actually arrive in (Common
  * Crawl ships `.warc.gz`), in front of the HTML→text/dedup/quality
  * stages. The reference ingests PDFs from blob storage
  * (Function.java:90-132); a crawl-scale corpus swaps that ingest edge
  * for this one.
  *
  * Scope (fail-loud beyond it):
  *  - WARC/1.0 and WARC/1.1 records: CRLF header block (version line,
  *    `Name: value` fields), mandatory WARC-Type / WARC-Record-ID /
  *    WARC-Date / Content-Length, content block of EXACTLY
  *    Content-Length bytes, CRLF CRLF record terminator — strict
  *    accounting, truncation rejects
  *  - gzip transport: member-per-record (the Common Crawl convention —
  *    it is what makes a 100 TB crawl SPLITTABLE: each member is an
  *    independent inflate, so a reader can start at any member
  *    boundary) and whole-file single-member both inflate
  *  - `response` records carrying `application/http`: the HTTP/1.x
  *    status line, headers and body split; the payload is the body
  *  - WARC-Payload-Digest `sha1:BASE32` VERIFIED against the payload
  *    AS STORED (the format's own in-band integrity oracle — the raw
  *    body block, before transfer/content decoding, matching how crawl
  *    writers stamp it) — a mismatch rejects loud; other digest
  *    algorithms reject by name
  *  - round 20 (VERDICT r19 #1): HTTP message-body decoding after the
  *    digest check — `Transfer-Encoding: chunked` dechunked with strict
  *    framing (hex size lines, CRLF accounting, trailer section, zero
  *    bytes past the terminal chunk), `Content-Encoding: gzip` inflated
  *    through the same strict member gunzip; every other declared
  *    transfer/content coding rejects BY NAME rather than leaking
  *    framing bytes into downstream text
  *  - warcinfo / request / metadata / resource / conversion records
  *    pass through with their raw content as payload */
object WarcCodec {

  final case class WarcRecord(warcType: String, recordId: String,
                              date: String, targetUri: Option[String],
                              contentType: Option[String],
                              httpStatus: Option[Int],
                              httpContentType: Option[String],
                              payload: Array[Byte],
                              digestVerified: Boolean,
                              payloadDigest: Option[String] = None,
                              refersTo: Option[String] = None)

  /** Deflate-bomb guard for [[gunzipAll]]: a crafted member declaring
    * terabytes of output must fail loud naming the cap instead of
    * exhausting executor memory. 1 GiB decompressed covers every real
    * Common Crawl segment partition; callers with bigger members raise
    * it explicitly. */
  val MaxInflatedBytes: Long = 1L << 30

  def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  def isWarc(b: Array[Byte]): Boolean =
    isGzip(b) || (b.length >= 5 &&
      new String(b, 0, 5, ISO_8859_1) == "WARC/")

  /** All records of a WARC file (gzip inflated first when present —
    * strict member-by-member, so both the member-per-record and
    * single-member transports read and a corrupt member REJECTS rather
    * than silently truncating). */
  def records(bytes: Array[Byte]): Seq[WarcRecord] = {
    require(isWarc(bytes), "WarcCodec: neither a WARC/ header nor gzip")
    val raw = if (isGzip(bytes)) gunzipAll(bytes) else bytes
    val out = scala.collection.mutable.Buffer.empty[WarcRecord]
    var at = 0
    while (at < raw.length) {
      val (rec, next) = readRecord(raw, at)
      out += rec
      at = next
      // trailing CRLFs between records tolerate (some writers pad)
      while (at + 1 < raw.length && raw(at) == '\r' && raw(at + 1) == '\n')
        at += 2
    }
    require(out.nonEmpty, "WarcCodec: no records")
    out.toSeq
  }

  private def readLine(b: Array[Byte], at: Int): (String, Int) = {
    var p = at
    while (p + 1 < b.length && !(b(p) == '\r' && b(p + 1) == '\n')) p += 1
    require(p + 1 < b.length, "WarcCodec: header line without CRLF")
    (new String(b, at, p - at, UTF_8), p + 2)
  }

  /** Numeric header fields must reject through the codec's one
    * documented surface: a non-numeric Content-Length or HTTP status is
    * malformed input, not an internal error, so NumberFormatException
    * rethrows as the prefixed IllegalArgumentException every other
    * reject path uses. */
  private def parseLong(s: String, what: String): Long =
    try s.trim.toLong
    catch { case _: NumberFormatException =>
      throw new IllegalArgumentException(s"WarcCodec: $what '$s' is not a number")
    }

  private def readRecord(b: Array[Byte], at0: Int): (WarcRecord, Int) = {
    val (version, h0) = readLine(b, at0)
    require(version == "WARC/1.0" || version == "WARC/1.1",
      s"WarcCodec: record version '$version' unsupported (WARC/1.0, 1.1)")
    var at = h0
    val headers = scala.collection.mutable.Map.empty[String, String]
    var line = ""
    while ({ val (l, n) = readLine(b, at); line = l; at = n; line.nonEmpty }) {
      val colon = line.indexOf(':')
      require(colon > 0, s"WarcCodec: malformed header line '$line'")
      headers(line.substring(0, colon).trim.toLowerCase) =
        line.substring(colon + 1).trim
    }
    def need(name: String): String = headers.getOrElse(name.toLowerCase,
      throw new IllegalArgumentException(s"WarcCodec: record without $name"))
    val warcType = need("WARC-Type")
    val recordId = need("WARC-Record-ID")
    val date = need("WARC-Date")
    val len = parseLong(need("Content-Length"), "Content-Length")
    require(len >= 0 && at + len + 4 <= b.length,
      s"WarcCodec: content block of $len bytes runs past EOF")
    val content = java.util.Arrays.copyOfRange(b, at, at + len.toInt)
    at += len.toInt
    require(b(at) == '\r' && b(at + 1) == '\n' &&
      b(at + 2) == '\r' && b(at + 3) == '\n',
      "WarcCodec: record not terminated by CRLF CRLF")
    at += 4
    val contentType = headers.get("content-type")
    val isHttp =
      contentType.exists(_.toLowerCase.startsWith("application/http"))
    // response AND revisit records carrying HTTP split the message; the
    // PAYLOAD is the HTTP body. The digest covers the body AS STORED
    // (before transfer/content decoding); decoding runs after it
    // verifies.
    val (status, httpCt, te, cenc, rawBody) =
      if ((warcType == "response" || warcType == "revisit") && isHttp) {
        val (st, ct, t, ce, body) = splitHttp(content)
        (Some(st), ct, t, ce, body)
      } else (None, None, None, None, content)
    val storedDigest = headers.get("warc-payload-digest").map { d =>
      require(d.toLowerCase.startsWith("sha1:"),
        s"WarcCodec: payload digest algorithm '${d.takeWhile(_ != ':')}' " +
          "unsupported (sha1)")
      d.substring(5).toUpperCase
    }
    // REVISIT records (the crawl-dedup wire form: identical content
    // re-fetched → headers-only record whose digest names the ORIGINAL
    // payload): the digest must NOT be checked against the stored
    // bytes — it refers to another record's payload; verifying it here
    // (the pre-round-20 behavior) would reject every real revisit.
    val isRevisit = warcType == "revisit"
    if (isRevisit) {
      val profile = headers.getOrElse("warc-profile",
        throw new IllegalArgumentException(
          "WarcCodec: revisit record without WARC-Profile"))
      require(profile.contains("identical-payload-digest"),
        s"WarcCodec: revisit profile '$profile' unsupported " +
          "(identical-payload-digest)")
      require(storedDigest.isDefined,
        "WarcCodec: identical-payload-digest revisit without a payload digest")
    }
    val verified = storedDigest match {
      case Some(want) if !isRevisit =>
        val got = base32(java.security.MessageDigest.getInstance("SHA-1")
          .digest(rawBody))
        require(got == want,
          s"WarcCodec: payload digest mismatch (stored $want, computed $got)")
        true
      case _ => false
    }
    val payload = decodeContent(decodeTransfer(rawBody, te), cenc)
    (WarcRecord(warcType, recordId, date, headers.get("warc-target-uri"),
      contentType, status, httpCt, payload, verified,
      payloadDigest = storedDigest,
      refersTo = headers.get("warc-refers-to")), at)
  }

  private def splitHttp(content: Array[Byte])
      : (Int, Option[String], Option[String], Option[String], Array[Byte]) = {
    val (statusLine, h0) = readLine(content, 0)
    val parts = statusLine.split(" ", 3)
    require(parts.length >= 2 && parts(0).startsWith("HTTP/"),
      s"WarcCodec: malformed HTTP status line '$statusLine'")
    val status = parseLong(parts(1), "HTTP status").toInt
    var at = h0
    var httpCt: Option[String] = None
    var te: Option[String] = None
    var cenc: Option[String] = None
    var line = ""
    while ({ val (l, n) = readLine(content, at); line = l; at = n; line.nonEmpty }) {
      val colon = line.indexOf(':')
      if (colon > 0) {
        val name = line.substring(0, colon).trim
        val value = line.substring(colon + 1).trim
        if (name.equalsIgnoreCase("Content-Type")) httpCt = Some(value)
        else if (name.equalsIgnoreCase("Transfer-Encoding")) te = Some(value)
        else if (name.equalsIgnoreCase("Content-Encoding")) cenc = Some(value)
      }
    }
    (status, httpCt, te, cenc,
      java.util.Arrays.copyOfRange(content, at, content.length))
  }

  /** Apply the declared Transfer-Encoding. Without this, chunk-size
    * framing lines leak into extracted text SILENTLY (the payload
    * digest covers the raw block, so it cannot catch the leak) — the
    * exact silent-wrong class the codec contract forbids. Only the
    * identity and chunked codings are in scope; anything else —
    * including multi-coding lists — rejects by name. */
  private def decodeTransfer(body: Array[Byte], te: Option[String]): Array[Byte] =
    te.map(_.trim.toLowerCase) match {
      case None | Some("identity") => body
      case Some("chunked") => dechunk(body)
      case Some(other) => throw new IllegalArgumentException(
        s"WarcCodec: Transfer-Encoding '$other' unsupported (identity, chunked)")
    }

  /** Apply the declared Content-Encoding: gzip inflates through the
    * strict member gunzip (CRC/ISIZE verified); deflate is the RFC
    * 9110 meaning — a ZLIB (RFC 1950) wrapper, header-validated and
    * ADLER-32-checked — and a raw-deflate body mislabeled as such
    * rejects loud rather than being guessed at; br/zstd reject by name
    * (their dictionary tables are not hand-verifiable offline). */
  private def decodeContent(body: Array[Byte], cenc: Option[String]): Array[Byte] =
    cenc.map(_.trim.toLowerCase) match {
      case None | Some("identity") => body
      case Some("gzip") | Some("x-gzip") =>
        require(isGzip(body),
          "WarcCodec: Content-Encoding gzip but body has no gzip magic")
        gunzipAll(body)
      case Some("deflate") => inflateZlib(body)
      case Some(other) => throw new IllegalArgumentException(
        s"WarcCodec: Content-Encoding '$other' unsupported (identity, gzip, deflate)")
    }

  /** Strict zlib inflate: CMF/FLG validated (CM 8, FCHECK, FDICT
    * rejects by name), ADLER-32 verified by the inflater, output
    * capped like [[gunzipAll]]. */
  private[pipeline] def inflateZlib(body: Array[Byte],
                                    maxInflated: Long = MaxInflatedBytes): Array[Byte] = {
    require(body.length >= 6,
      "WarcCodec: deflate body too short for a zlib wrapper")
    val cmf = body(0) & 0xff
    val flg = body(1) & 0xff
    require((cmf & 0x0f) == 8,
      s"WarcCodec: zlib compression method ${cmf & 0x0f} (want 8) — " +
        "a raw-deflate body mislabeled as Content-Encoding deflate rejects")
    require(((cmf << 8) | flg) % 31 == 0, "WarcCodec: zlib FCHECK invalid")
    require((flg & 0x20) == 0,
      "WarcCodec: zlib FDICT preset dictionary unsupported")
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(body)
      val out = new ByteArrayOutputStream(math.min(
        body.length.toLong * 4, (Int.MaxValue - 8).toLong).toInt)
      val buf = new Array[Byte](65536)
      while (!inf.finished()) {
        val n =
          try inf.inflate(buf)
          catch { case e: java.util.zip.DataFormatException =>
            throw new IllegalArgumentException(
              s"WarcCodec: zlib deflate body corrupt (${e.getMessage})")
          }
        require(n > 0 || !inf.needsInput,
          "WarcCodec: zlib deflate body truncated")
        require(out.size().toLong + n <= maxInflated,
          s"WarcCodec: inflated output exceeds the $maxInflated-byte cap")
        out.write(buf, 0, n)
      }
      require(inf.getRemaining == 0,
        s"WarcCodec: ${inf.getRemaining} trailing bytes after the zlib stream")
      out.toByteArray
    } finally inf.end()
  }

  /** zlib-wrapped deflate for fixture Content-Encoding legs. */
  def zlibEncode(body: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    try {
      d.setInput(body); d.finish()
      val bo = new ByteArrayOutputStream(body.length / 2 + 64)
      val buf = new Array[Byte](8192)
      while (!d.finished()) bo.write(buf, 0, d.deflate(buf))
      bo.toByteArray
    } finally d.end()
  }

  /** RFC 9112 §7.1 chunked decoding, strict: hex size line (chunk
    * extensions after ';' tolerated and dropped), CRLF-framed data,
    * terminal zero chunk, optional trailer fields, final CRLF, and NO
    * bytes past it. */
  private[pipeline] def dechunk(body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(body.length)
    var at = 0
    var done = false
    while (!done) {
      val (line, p0) = readLine(body, at)
      val hex = line.takeWhile(c => Character.digit(c, 16) >= 0)
      require(hex.nonEmpty &&
        (hex.length == line.length || line.charAt(hex.length) == ';'),
        s"WarcCodec: malformed chunk-size line '$line'")
      require(hex.length <= 8, s"WarcCodec: chunk size '$hex' out of range")
      val size = java.lang.Long.parseLong(hex, 16)
      require(p0 + size + 2 <= body.length,
        s"WarcCodec: chunk of $size bytes runs past the body")
      if (size == 0L) {
        // trailer section: zero or more field lines, then the empty line
        var q = p0
        var l = ""
        while ({ val (s, n) = readLine(body, q); l = s; q = n; l.nonEmpty }) ()
        require(q == body.length,
          s"WarcCodec: ${body.length - q} bytes past the final chunk")
        done = true
      } else {
        out.write(body, p0, size.toInt)
        require(body(p0 + size.toInt) == '\r' && body(p0 + size.toInt + 1) == '\n',
          "WarcCodec: chunk data not terminated by CRLF")
        at = p0 + size.toInt + 2
      }
    }
    out.toByteArray
  }

  /** RFC 4648 base32 (the WARC digest convention — no padding). */
  private[graft] def base32(b: Array[Byte]): String = {
    val alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
    val sb = new StringBuilder((b.length * 8 + 4) / 5)
    var buf = 0L
    var bits = 0
    b.foreach { x =>
      buf = (buf << 8) | (x & 0xff)
      bits += 8
      while (bits >= 5) {
        sb.append(alphabet(((buf >> (bits - 5)) & 0x1f).toInt))
        bits -= 5
      }
    }
    if (bits > 0) sb.append(alphabet(((buf << (5 - bits)) & 0x1f).toInt))
    sb.toString
  }

  /** STRICT member-by-member gunzip: GZIPInputStream's concatenated
    * mode silently treats a corrupt next-member header as EOF, which
    * would drop trailing records without error. Each member's header
    * is parsed here (RFC 1952: magic, method 8, FEXTRA/FNAME/FCOMMENT/
    * FHCRC skipped by their own framing), the body raw-inflated, the
    * trailer's CRC-32 and ISIZE verified, and EVERY input byte must
    * belong to some member. Total inflated output is capped at
    * `maxInflated` ([[MaxInflatedBytes]] default) so a deflate bomb
    * fails loud naming the cap instead of exhausting executor memory. */
  private[graft] def gunzipAll(bytes: Array[Byte],
                               maxInflated: Long = MaxInflatedBytes): Array[Byte] = {
    // LONG-clamped initial size: bytes.length * 4 wraps negative past
    // 512 MB, and Common Crawl segment files run ~1 GB
    val out = new ByteArrayOutputStream(
      math.min(bytes.length.toLong * 4, (Int.MaxValue - 8).toLong).toInt)
    var at = 0
    while (at < bytes.length) {
      require(at + 10 <= bytes.length && (bytes(at) & 0xff) == 0x1f &&
        (bytes(at + 1) & 0xff) == 0x8b,
        s"WarcCodec: gzip member header missing at offset $at")
      require((bytes(at + 2) & 0xff) == 8,
        s"WarcCodec: gzip compression method ${bytes(at + 2) & 0xff} (want 8)")
      val flg = bytes(at + 3) & 0xff
      require((flg & 0xe0) == 0, f"WarcCodec: reserved gzip FLG bits 0x$flg%02x")
      var p = at + 10
      if ((flg & 0x04) != 0) { // FEXTRA
        require(p + 2 <= bytes.length, "WarcCodec: truncated gzip FEXTRA")
        val xlen = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
        p += 2 + xlen
      }
      def skipZString(): Unit = {
        while (p < bytes.length && bytes(p) != 0) p += 1
        require(p < bytes.length, "WarcCodec: unterminated gzip name/comment")
        p += 1
      }
      if ((flg & 0x08) != 0) skipZString() // FNAME
      if ((flg & 0x10) != 0) skipZString() // FCOMMENT
      if ((flg & 0x02) != 0) p += 2 // FHCRC
      require(p <= bytes.length, "WarcCodec: truncated gzip member header")
      val inf = new java.util.zip.Inflater(true)
      val crc = new java.util.zip.CRC32
      val memberStart = out.size()
      try {
        inf.setInput(bytes, p, bytes.length - p)
        val buf = new Array[Byte](65536)
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          require(n > 0 || !inf.needsInput,
            s"WarcCodec: gzip member at $at truncated mid-stream")
          require(out.size().toLong + n <= maxInflated,
            s"WarcCodec: inflated output exceeds the $maxInflated-byte cap")
          crc.update(buf, 0, n)
          out.write(buf, 0, n)
        }
        val trailerAt = p + inf.getBytesRead.toInt
        require(trailerAt + 8 <= bytes.length,
          s"WarcCodec: gzip member at $at has no CRC/ISIZE trailer")
        def le32t(i: Int): Long =
          (bytes(i) & 0xffL) | ((bytes(i + 1) & 0xffL) << 8) |
            ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24)
        require(le32t(trailerAt) == crc.getValue,
          f"WarcCodec: gzip member at $at CRC mismatch")
        require(le32t(trailerAt + 4) ==
          ((out.size() - memberStart).toLong & 0xffffffffL),
          s"WarcCodec: gzip member at $at ISIZE mismatch")
        at = trailerAt + 8
      } finally inf.end()
    }
    out.toByteArray
  }

  // ---- charset resolution (round 20, VERDICT r19 #1) ----

  /** Resolve and strictly decode an HTTP text payload's charset. A
    * Shift-JIS page decoded as UTF-8 mojibakes into U+FFFD runs
    * SILENTLY and then flows into dedup/quality/BM25 as "text" — the
    * head-of-pipeline silent-wrong class. Resolution order is the
    * WHATWG one: the HTTP `Content-Type` charset parameter, then a
    * `<meta charset>` / `<meta http-equiv>` sniff over the first 1024
    * bytes, then STRICT UTF-8 validation (CodingErrorAction.REPORT).
    * Every decode is strict — malformed bytes under the declared
    * charset reject loud, undeclared non-UTF-8 rejects loud, and
    * charsets outside the vetted alias table reject BY NAME. */
  object HttpCharset {

    /** label alias → (canonical label, JDK charset name). Per WHATWG
      * encoding, the iso-8859-1/ascii family maps to windows-1252 (real
      * pages labeled 8859-1 use 1252's 0x80-0x9f printables). */
    private val Aliases: Map[String, (String, String)] = {
      def e(canon: String, jdk: String, names: String*) =
        names.map(_ -> (canon, jdk))
      (e("utf-8", "UTF-8", "utf-8", "utf8", "unicode-1-1-utf-8") ++
        e("windows-1252", "windows-1252", "windows-1252", "cp1252",
          "iso-8859-1", "iso8859-1", "latin1", "latin-1", "l1",
          "us-ascii", "ascii", "ansi_x3.4-1968") ++
        e("shift_jis", "Shift_JIS", "shift_jis", "shift-jis", "sjis",
          "x-sjis", "ms_kanji", "csshiftjis") ++
        e("euc-jp", "EUC-JP", "euc-jp", "x-euc-jp", "cseucpkdfmtjapanese") ++
        e("gbk", "GBK", "gbk", "gb2312", "csgb2312", "x-gbk", "chinese") ++
        e("big5", "Big5", "big5", "big5-hkscs", "cn-big5", "x-x-big5") ++
        e("euc-kr", "EUC-KR", "euc-kr", "korean", "csksc56011987")).toMap
    }

    /** The charset parameter of a Content-Type value, lowercased and
      * unquoted; None when absent. */
    def fromContentType(ct: String): Option[String] = {
      val lower = ct.toLowerCase(java.util.Locale.ROOT)
      val at = lower.indexOf("charset=")
      if (at < 0) None
      else {
        val raw = lower.substring(at + 8).takeWhile(c => c != ';' && c != ' ')
        val v = raw.stripPrefix("\"").stripSuffix("\"")
        if (v.isEmpty) None else Some(v)
      }
    }

    /** Scan the first 1024 bytes (as ISO-8859-1 — the sniff must work
      * before the charset is known; meta declarations are ASCII) for
      * `<meta charset=X>` or `<meta http-equiv=... content="...;
      * charset=X">`. */
    def sniffMeta(bytes: Array[Byte]): Option[String] = {
      val n = math.min(bytes.length, 1024)
      val head = new String(bytes, 0, n, ISO_8859_1)
        .toLowerCase(java.util.Locale.ROOT)
      var p = head.indexOf("<meta")
      while (p >= 0) {
        val end = head.indexOf('>', p)
        val tag = if (end < 0) head.substring(p) else head.substring(p, end)
        val cs = tag.indexOf("charset=")
        if (cs >= 0) {
          val raw = tag.substring(cs + 8)
            .takeWhile(c => c != ';' && c != ' ' && c != '>' && c != '/')
          val v = raw.stripPrefix("\"").stripSuffix("\"")
            .stripPrefix("'").stripSuffix("'")
          if (v.nonEmpty) return Some(v)
        }
        p = head.indexOf("<meta", p + 5)
      }
      None
    }

    private def strictDecode(bytes: Array[Byte], jdk: String,
                             label: String): String = {
      val dec = java.nio.charset.Charset.forName(jdk).newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      try dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      catch { case e: java.nio.charset.CharacterCodingException =>
        throw new IllegalArgumentException(
          s"WarcCodec: payload is not valid $label (${e.getClass.getSimpleName})")
      }
    }

    /** Decode a text payload → (text, canonical charset label). A BOM
      * outranks every declaration (the WHATWG rule — a UTF-8 BOM left
      * undetected would otherwise leak a silent U+FEFF into extracted
      * text, and UTF-16 pages would reject or mojibake); the BOM bytes
      * are consumed, never part of the text. */
    def decodeText(bytes: Array[Byte], httpCt: Option[String]): (String, String) = {
      def bom(n: Int, jdk: String, label: String): (String, String) =
        (strictDecode(java.util.Arrays.copyOfRange(bytes, n, bytes.length),
          jdk, label), label)
      if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xef &&
          (bytes(1) & 0xff) == 0xbb && (bytes(2) & 0xff) == 0xbf)
        bom(3, "UTF-8", "utf-8")
      else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff &&
          (bytes(1) & 0xff) == 0xfe)
        bom(2, "UTF-16LE", "utf-16le")
      else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xfe &&
          (bytes(1) & 0xff) == 0xff)
        bom(2, "UTF-16BE", "utf-16be")
      else httpCt.flatMap(fromContentType).orElse(sniffMeta(bytes)) match {
        case Some(label) =>
          val (canon, jdk) = Aliases.getOrElse(label,
            throw new IllegalArgumentException(
              s"WarcCodec: charset '$label' outside the vetted alias table"))
          (strictDecode(bytes, jdk, canon), canon)
        case None =>
          (strictDecode(bytes, "UTF-8", "utf-8 (undeclared, strict-validated)"),
            "utf-8")
      }
    }
  }

  // ---- fixture writer ----

  /** One response page for [[encode]]. */
  final case class Page(uri: String, status: Int, html: String)

  /** One fully-specified HTTP response for [[encodeHttp]]: the body is
    * the ON-WIRE byte block (already charset-encoded / chunked /
    * content-coded by the caller); `headers` are the HTTP header lines
    * to stamp. The payload digest is computed over `body` as stored.
    * With `revisit = Some(base32Sha1)`, the record is written as a
    * WARC revisit (identical-payload-digest profile): HTTP HEADERS
    * ONLY on the wire, the given digest naming the ORIGINAL payload —
    * the crawl-dedup shape; `body` is then ignored. */
  final case class HttpResp(uri: String, status: Int,
                            headers: Seq[(String, String)], body: Array[Byte],
                            revisit: Option[String] = None)

  /** Write a structurally-real WARC file: a warcinfo record, then per
    * page a request + response pair — HTTP message embedded, payload
    * digests stamped — gzipped MEMBER-PER-RECORD when `gzip` (the
    * Common Crawl transport). */
  def encode(pages: Seq[Page], gzip: Boolean = true,
             version: String = "WARC/1.0"): Array[Byte] =
    encodeHttp(pages.map(p => HttpResp(p.uri, p.status,
      Seq("Content-Type" -> "text/html; charset=utf-8"),
      p.html.getBytes(UTF_8))), gzip, version)

  /** [[encode]] with full per-response HTTP header/body control (the
    * round-20 corpus legs: charset, chunked, content-encoding). */
  def encodeHttp(resps: Seq[HttpResp], gzip: Boolean = true,
                 version: String = "WARC/1.0"): Array[Byte] = {
    require(resps.nonEmpty, "WarcCodec.encode: no pages")
    def record(tpe: String, idx: Int, extra: Seq[(String, String)],
               content: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream(content.length + 256)
      def w(s: String): Unit = out.write(s.getBytes(UTF_8))
      w(s"$version\r\n")
      w(s"WARC-Type: $tpe\r\n")
      w(f"WARC-Record-ID: <urn:uuid:0000-$tpe%s-$idx%06d>\r\n")
      w("WARC-Date: 2026-01-01T00:00:00Z\r\n")
      extra.foreach { case (k, v) => w(s"$k: $v\r\n") }
      w(s"Content-Length: ${content.length}\r\n")
      w("\r\n")
      out.write(content, 0, content.length)
      w("\r\n\r\n")
      out.toByteArray
    }
    def gz(member: Array[Byte]): Array[Byte] =
      if (!gzip) member
      else {
        val bo = new ByteArrayOutputStream(member.length / 2 + 64)
        val g = new java.util.zip.GZIPOutputStream(bo)
        g.write(member); g.close()
        bo.toByteArray
      }
    val out = new ByteArrayOutputStream()
    val info = "software: graft\r\nformat: WARC File Format 1.0\r\n"
      .getBytes(UTF_8)
    out.write(gz(record("warcinfo", 0,
      Seq("Content-Type" -> "application/warc-fields"), info)))
    resps.zipWithIndex.foreach { case (rp, i) =>
      if (i == 0 || rp.uri != resps(i - 1).uri) {
        val req = (s"GET ${rp.uri} HTTP/1.1\r\nHost: example.org\r\n\r\n")
          .getBytes(UTF_8)
        out.write(gz(record("request", i, Seq(
          "WARC-Target-URI" -> rp.uri,
          "Content-Type" -> "application/http;msgtype=request"), req)))
      }
      val body = if (rp.revisit.isDefined) Array.emptyByteArray else rp.body
      val digest = rp.revisit.getOrElse(base32(
        java.security.MessageDigest.getInstance("SHA-1").digest(body)))
      val http = new ByteArrayOutputStream(body.length + 128)
      // chunked responses carry no Content-Length (RFC 9112 §6.2);
      // everything else gets one stamped unless the caller set it
      val hs =
        if (rp.headers.exists { case (k, _) =>
            k.equalsIgnoreCase("Transfer-Encoding") ||
            k.equalsIgnoreCase("Content-Length") }) rp.headers
        else rp.headers :+ ("Content-Length" -> body.length.toString)
      val reason = rp.status match {
        case 200 => "OK"
        case 301 => "Moved Permanently"
        case 404 => "Not Found"
        case _ => "Status"
      }
      val headerBlock = (s"HTTP/1.1 ${rp.status} $reason" +:
        hs.map { case (k, v) => s"$k: $v" }).mkString("", "\r\n", "\r\n")
      http.write((headerBlock + "\r\n").getBytes(UTF_8))
      http.write(body)
      val warcHeaders = Seq(
        "WARC-Target-URI" -> rp.uri,
        "WARC-Payload-Digest" -> s"sha1:$digest") ++
        (if (rp.revisit.isDefined) Seq(
          "WARC-Profile" ->
            "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest",
          "WARC-Refers-To" -> f"<urn:uuid:0000-response-$i%06d>")
        else Nil) ++
        Seq("Content-Type" -> "application/http;msgtype=response")
      out.write(gz(record(
        if (rp.revisit.isDefined) "revisit" else "response", i,
        warcHeaders, http.toByteArray)))
    }
    out.toByteArray
  }

  /** Chunked-transfer encoder for fixtures: split into `chunkSize`
    * chunks, hex size lines, terminal zero chunk. */
  def chunkEncode(body: Array[Byte], chunkSize: Int = 100): Array[Byte] = {
    require(chunkSize > 0, "WarcCodec.chunkEncode: chunkSize must be positive")
    val out = new ByteArrayOutputStream(body.length + 64)
    var at = 0
    while (at < body.length) {
      val n = math.min(chunkSize, body.length - at)
      out.write(s"${n.toHexString}\r\n".getBytes(UTF_8))
      out.write(body, at, n)
      out.write("\r\n".getBytes(UTF_8))
      at += n
    }
    out.write("0\r\n\r\n".getBytes(UTF_8))
    out.toByteArray
  }

  /** Single-member gzip for fixture Content-Encoding legs. */
  def gzipEncode(body: Array[Byte]): Array[Byte] = {
    val bo = new ByteArrayOutputStream(body.length / 2 + 64)
    val g = new java.util.zip.GZIPOutputStream(bo)
    g.write(body); g.close()
    bo.toByteArray
  }
}
