package graft

import graft.pipeline.{PdfCodec, PdfPipeline}
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
