package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.PdfCodec

/** Property-based round-trips over the three PDF writers — randomized
  * page content probes string-escape, pagination, CMap, and filter-chain
  * corners no hand-picked fixture anticipates. Spark-free (pure codec),
  * so the suite is cheap. */
class PdfCodecPropSpec extends AnyFunSuite {

  /** Raw scalacheck runner (no scalatestplus bridge in the offline
    * cache): 60 random cases per property, seeded fresh per run. */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(res.passed, res.status.toString)
  }

  // Latin-1 printable + escapes + EOLs — the simple-font writer's domain.
  // Raw \r is excluded: the PDF literal-string contract normalizes
  // EOLs to \n (decodeLiteral), and the writer escapes \r losslessly —
  // but grouped-pagination may SPLIT a \r\n pair across pages, which is
  // a pagination artifact, not a codec one. encodePdf handles \r via
  // escape, so include it in single-page cases only.
  private val latin1Char: Gen[Char] =
    Gen.frequency(
      10 -> Gen.choose(32.toChar, 126.toChar),
      2 -> Gen.oneOf('(', ')', '\\', '\n', '\t'),
      1 -> Gen.choose(160.toChar, 255.toChar))
  private val latin1Text: Gen[String] =
    Gen.chooseNum(0, 400).flatMap(n => Gen.stringOfN(n, latin1Char))

  // BMP chars excluding surrogates — the CID writer's domain
  private val bmpChar: Gen[Char] = Gen.frequency(
    6 -> Gen.choose(0x3040.toChar, 0x30ff.toChar), // kana
    4 -> Gen.choose(0x4e00.toChar, 0x4fff.toChar), // CJK ideographs
    3 -> Gen.choose(32.toChar, 126.toChar),
    1 -> Gen.choose(0xac00.toChar, 0xd7a0.toChar)) // hangul
  private val bmpText: Gen[String] =
    Gen.chooseNum(0, 300).flatMap(n => Gen.stringOfN(n, bmpChar))

  private def pagesGen(text: Gen[String]): Gen[List[String]] =
    Gen.chooseNum(0, 4).flatMap(n => Gen.listOfN(n, text))

  test("encodePdf round-trips arbitrary Latin-1 pages (both compressions)") {
    check(Prop.forAll(pagesGen(latin1Text), Gen.oneOf(true, false)) { (pages, comp) =>
      PdfCodec.extractText(PdfCodec.encodePdf(pages, comp)) == pages
    })
  }

  test("encodeCidPdf round-trips arbitrary BMP pages through the CMap") {
    check(Prop.forAll(pagesGen(bmpText), Gen.oneOf(true, false)) { (pages, comp) =>
      PdfCodec.extractText(PdfCodec.encodeCidPdf(pages, comp)) == pages
    })
  }

  test("encodePdf15 round-trips arbitrary Latin-1 pages through ObjStm") {
    check(Prop.forAll(pagesGen(latin1Text), Gen.oneOf(true, false)) { (pages, comp) =>
      PdfCodec.extractText(PdfCodec.encodePdf15(pages, comp)) == pages
    })
  }

  test("filter decoders round-trip arbitrary byte payloads") {
    val bytes = Gen.chooseNum(0, 2000).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
    check(Prop.forAll(bytes) { p =>
      val hex = (p.map(b => f"${b & 0xff}%02x").mkString + ">").getBytes("ISO-8859-1")
      PdfCodec.asciiHexDecode(hex).sameElements(p)
    })
    // ASCII85/LZW use the spec's own encoders (PdfCodecSpec) for the
    // adversarial corners; here cross-check hex only (independent impl)
  }
}
