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
  *    when present (the format's own in-band integrity oracle) —
  *    a mismatch rejects loud; other digest algorithms reject by name
  *  - warcinfo / request / metadata / resource / conversion records
  *    pass through with their raw content as payload */
object WarcCodec {

  final case class WarcRecord(warcType: String, recordId: String,
                              date: String, targetUri: Option[String],
                              contentType: Option[String],
                              httpStatus: Option[Int],
                              httpContentType: Option[String],
                              payload: Array[Byte],
                              digestVerified: Boolean)

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
    val len = need("Content-Length").toLong
    require(len >= 0 && at + len + 4 <= b.length,
      s"WarcCodec: content block of $len bytes runs past EOF")
    val content = java.util.Arrays.copyOfRange(b, at, at + len.toInt)
    at += len.toInt
    require(b(at) == '\r' && b(at + 1) == '\n' &&
      b(at + 2) == '\r' && b(at + 3) == '\n',
      "WarcCodec: record not terminated by CRLF CRLF")
    at += 4
    val contentType = headers.get("content-type")
    // response records carrying HTTP split the message; the PAYLOAD is
    // the HTTP body (what WARC-Payload-Digest covers)
    val (status, httpCt, payload) =
      if (warcType == "response" &&
          contentType.exists(_.toLowerCase.startsWith("application/http"))) {
        val (st, ct, body) = splitHttp(content)
        (Some(st), ct, body)
      } else (None, None, content)
    val verified = headers.get("warc-payload-digest") match {
      case None => false
      case Some(d) =>
        require(d.toLowerCase.startsWith("sha1:"),
          s"WarcCodec: payload digest algorithm '${d.takeWhile(_ != ':')}' " +
            "unsupported (sha1)")
        val want = d.substring(5).toUpperCase
        val got = base32(java.security.MessageDigest.getInstance("SHA-1")
          .digest(payload))
        require(got == want,
          s"WarcCodec: payload digest mismatch (stored $want, computed $got)")
        true
    }
    (WarcRecord(warcType, recordId, date, headers.get("warc-target-uri"),
      contentType, status, httpCt, payload, verified), at)
  }

  private def splitHttp(content: Array[Byte]): (Int, Option[String], Array[Byte]) = {
    val (statusLine, h0) = readLine(content, 0)
    val parts = statusLine.split(" ", 3)
    require(parts.length >= 2 && parts(0).startsWith("HTTP/"),
      s"WarcCodec: malformed HTTP status line '$statusLine'")
    val status = parts(1).toInt
    var at = h0
    var httpCt: Option[String] = None
    var line = ""
    while ({ val (l, n) = readLine(content, at); line = l; at = n; line.nonEmpty }) {
      val colon = line.indexOf(':')
      if (colon > 0 && line.substring(0, colon).trim.equalsIgnoreCase("Content-Type"))
        httpCt = Some(line.substring(colon + 1).trim)
    }
    (status, httpCt, java.util.Arrays.copyOfRange(content, at, content.length))
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
    * belong to some member. */
  private[pipeline] def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
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

  // ---- fixture writer ----

  /** One response page for [[encode]]. */
  final case class Page(uri: String, status: Int, html: String)

  /** Write a structurally-real WARC file: a warcinfo record, then per
    * page a request + response pair — HTTP message embedded, payload
    * digests stamped — gzipped MEMBER-PER-RECORD when `gzip` (the
    * Common Crawl transport). */
  def encode(pages: Seq[Page], gzip: Boolean = true,
             version: String = "WARC/1.0"): Array[Byte] = {
    require(pages.nonEmpty, "WarcCodec.encode: no pages")
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
    pages.zipWithIndex.foreach { case (pg, i) =>
      val req = (s"GET ${pg.uri} HTTP/1.1\r\nHost: example.org\r\n\r\n")
        .getBytes(UTF_8)
      out.write(gz(record("request", i, Seq(
        "WARC-Target-URI" -> pg.uri,
        "Content-Type" -> "application/http;msgtype=request"), req)))
      val body = pg.html.getBytes(UTF_8)
      val digest = base32(
        java.security.MessageDigest.getInstance("SHA-1").digest(body))
      val http = new ByteArrayOutputStream(body.length + 128)
      http.write((s"HTTP/1.1 ${pg.status} OK\r\n" +
        "Content-Type: text/html; charset=utf-8\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes(UTF_8))
      http.write(body)
      out.write(gz(record("response", i, Seq(
        "WARC-Target-URI" -> pg.uri,
        "WARC-Payload-Digest" -> s"sha1:$digest",
        "Content-Type" -> "application/http;msgtype=response"),
        http.toByteArray)))
    }
    out.toByteArray
  }
}
