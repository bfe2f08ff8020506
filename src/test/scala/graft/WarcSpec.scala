package graft

import graft.pipeline.{HtmlText, WarcCodec, WarcPipeline}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WarcCodec + HtmlText: hand-built record bytes (laid out by the
  * test), digest tamper detection, gzip member-per-record vs bare
  * transport identity, HTTP splitting, the HTML extraction rule set,
  * and the fail-loud contract. */
class WarcSpec extends AnyFunSuite with SparkSpec {

  test("HtmlText: tags, drops, entities, blocks, title, leniency rules") {
    val (t1, ti1) = HtmlText.extractWithTitle(
      "<!DOCTYPE html><html><head><title>My&nbsp;Page</title>" +
        "<style>p{}</style><script>if(1<2){alert('<p>')}</script></head>" +
        "<body><!-- no --><p>Hello <b>bold</b> world</p>" +
        "<div>Line&#50;&#x41; &amp; &lt;tag&gt;</div></body></html>")
    assert(ti1 == "My Page")
    assert(t1 == "Hello bold world Line2A & <tag>")
    // unclosed script drops to EOF (the browser rule)
    assert(HtmlText.extract("a<script>var x = 1; b c") == "a")
    // a '<' that opens no tag is literal; malformed entity stays literal
    assert(HtmlText.extract("1 < 2 &not-an-entity; &#; &#x;") ==
      "1 < 2 &not-an-entity; &#; &#x;")
    // block tags separate words; inline tags do not
    assert(HtmlText.extract("a<br>b<i>c</i>d") == "a bcd")
    // whitespace collapse incl. tabs/CR/LF/VT
    assert(HtmlText.extract(" a\t\tb\r\ncd  ") == "a b c d")
    // HTML5 tokenizer edges: tags open on ASCII alpha only (non-ASCII
    // '<X' stays text); '</' + non-letter is a bogus comment eaten to '>'
    assert(HtmlText.extract("a<Über>y") == "a<Über>y")
    assert(HtmlText.extract("x a<δ<3 y") == "x a<δ<3 y")
    // ...while '<b y' (ASCII letter, never closed) IS an unterminated
    // tag, dropped to EOF exactly as a browser drops it
    assert(HtmlText.extract("x a<δ<b y") == "x a<δ")
    assert(HtmlText.extract("I </3 broken> hearts") == "I hearts")
    // escape is the exact inverse over &<> text
    val s = "x & y < z > w"
    assert(HtmlText.extract("<p>" + HtmlText.escape(s) + "</p>") == s)
  }

  test("hand-built WARC record: headers, strict accounting, payload digest") {
    val body = "<p>Hi</p>"
    val http = s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n$body"
    val digest = WarcCodec.base32(
      java.security.MessageDigest.getInstance("SHA-1")
        .digest(body.getBytes("UTF-8")))
    val rec = "WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:uuid:1>\r\n" +
      "WARC-Date: 2026-01-01T00:00:00Z\r\n" +
      "WARC-Target-URI: https://x.test/\r\n" +
      s"WARC-Payload-Digest: sha1:$digest\r\n" +
      "Content-Type: application/http;msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n" + http + "\r\n\r\n"
    val rs = WarcCodec.records(rec.getBytes("UTF-8"))
    assert(rs.length == 1)
    val r = rs.head
    assert(r.warcType == "response" && r.httpStatus.contains(200))
    assert(r.targetUri.contains("https://x.test/") && r.digestVerified)
    assert(new String(r.payload, "UTF-8") == body)
    // tamper with one payload byte: the digest must catch it
    val bytes = rec.getBytes("UTF-8")
    val at = rec.indexOf("<p>Hi</p>")
    bytes(at + 3) = 'J'
    assert(intercept[IllegalArgumentException](WarcCodec.records(bytes))
      .getMessage.contains("digest mismatch"))
    // truncation (missing final CRLFs) rejects
    assert(intercept[IllegalArgumentException](WarcCodec.records(
      rec.getBytes("UTF-8").dropRight(3))) != null)
    // unsupported digest algorithm rejects by name
    val md5d = rec.replace(s"sha1:$digest", "md5:ABCD")
    assert(intercept[IllegalArgumentException](WarcCodec.records(
      md5d.getBytes("UTF-8"))).getMessage.contains("md5"))
    // bad version rejects
    assert(intercept[IllegalArgumentException](WarcCodec.records(
      rec.replace("WARC/1.0", "WARC/0.9").getBytes("UTF-8")))
      .getMessage.contains("0.9"))
  }

  test("encode→records round trips; gzip members and bare agree") {
    val pages = (0 until 3).map(i =>
      WarcCodec.Page(s"https://x.test/$i", 200,
        s"<html><body><p>page $i &amp; more</p></body></html>"))
    val gz = WarcCodec.encode(pages, gzip = true)
    val bare = WarcCodec.encode(pages, gzip = false)
    assert(WarcCodec.isGzip(gz) && !WarcCodec.isGzip(bare))
    val a = WarcCodec.records(gz)
    val b = WarcCodec.records(bare)
    assert(a.length == 7 && b.length == 7) // warcinfo + 3 x (req + resp)
    assert(a.map(_.warcType) == b.map(_.warcType))
    val resp = a.filter(_.warcType == "response")
    assert(resp.forall(_.digestVerified))
    assert(resp.map(r => new String(r.payload, "UTF-8")) ==
      pages.map(_.html))
    assert(a.count(_.warcType == "request") == 3)
  }

  test("synthesizeWarcs → extractWarcs inverts the HTML wrap exactly") {
    val docs = spark.createDataFrame(Seq(
      (0L, "hello  world"),
      (1L, "a & b < c\t\ttabbed"),
      (2L, ""),
      (3L, "line one\nline two\r\nline three"))).toDF("doc_id", "text")
    val got = WarcPipeline.extractWarcs(WarcPipeline.synthesizeWarcs(docs))
      .orderBy(col("doc_id")).collect()
    val want = Seq("hello world", "a & b < c tabbed", "",
      "line one line two line three")
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(1) == 3 && r.getLong(2) == 200)
      assert(r.getString(3) == s"https://example.org/doc/$i")
      assert(r.getBoolean(4), "payload digest must verify")
      assert(r.getString(5) == s"Doc $i")
      assert(r.getLong(6) == want(i).length, s"doc $i text_len")
      assert(r.getString(7) ==
        org.apache.commons.codec.digest.DigestUtils.md5Hex(
          want(i).getBytes("UTF-8")), s"doc $i md5")
    }
  }
}
