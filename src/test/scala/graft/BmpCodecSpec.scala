package graft

import graft.multimodal.{BinaryPipeline, BmpCodec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BmpCodec: decode against a HAND-AUTHORED byte-level fixture (header,
  * palette and padded bottom-up rows laid out by the test, independent
  * of the encoder), encode→decode round trips across depths and row
  * orders, the BGR/bottom-up conventions, and the fail-loud contract. */
class BmpCodecSpec extends AnyFunSuite with SparkSpec {

  /** Hand-built 24-bit 2x2 bottom-up BMP: logical rows (top to bottom)
    * [(1,2,3),(4,5,6)] / [(7,8,9),(10,11,12)] — stored BGR, BOTTOM row
    * first, each 6-byte row padded to 8. */
  private def handFixture: Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
    w8('B'); w8('M'); w32(54 + 16); w32(0); w32(54)
    w32(40); w32(2); w32(2); w16(1); w16(24); w32(0); w32(16)
    w32(2835); w32(2835); w32(0); w32(0)
    // bottom row (logical y=1): (7,8,9),(10,11,12) as BGR + 2 pad
    Seq(9, 8, 7, 12, 11, 10, 0, 0).foreach(w8)
    // top row (logical y=0): (1,2,3),(4,5,6) as BGR + 2 pad
    Seq(3, 2, 1, 6, 5, 4, 0, 0).foreach(w8)
    out.toByteArray
  }

  test("hand-authored fixture: BGR order and bottom-up flip both honored") {
    val img = BmpCodec.decode(handFixture)
    assert(img.width == 2 && img.height == 2 && img.channels == 3)
    assert(img.pixels.map(_ & 0xff).toSeq ==
      Seq(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12))
  }

  test("encode→decode round-trips: 24-bit both row orders, 8-bit paletted") {
    val rgb = Array.tabulate(5 * 3 * 3)(i => (i * 7 + 3).toByte)
    for (td <- Seq(false, true)) {
      val img = BmpCodec.decode(BmpCodec.encode(5, 3, rgb, topDown = td))
      assert(img.pixels.toSeq == rgb.toSeq, s"topDown=$td")
    }
    val pal = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90)
    val idx = Array[Byte](0, 1, 2, 2, 1, 0)
    val img = BmpCodec.decode(BmpCodec.encode(3, 2, idx, pal))
    assert(img.pixels.toSeq ==
      Seq[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 70, 80, 90, 40, 50, 60, 10, 20, 30))
  }

  test("fail-loud contract: magic, header family, depth, compression, palette, truncation") {
    val good = BmpCodec.encode(3, 2, Array.tabulate(18)(_.toByte))
    val sig = good.clone(); sig(0) = 'X'.toByte
    assert(intercept[IllegalArgumentException](BmpCodec.decode(sig))
      .getMessage.contains("magic"))
    // V5 header (124 bytes) rejects with the size
    val v5 = good.clone(); v5(14) = 124
    assert(intercept[IllegalArgumentException](BmpCodec.decode(v5))
      .getMessage.contains("124"))
    // 16 bpp rejects
    val b16 = good.clone(); b16(28) = 16
    assert(intercept[IllegalArgumentException](BmpCodec.decode(b16))
      .getMessage.contains("16 bits"))
    // RLE8 rejects
    val rle = good.clone(); rle(30) = 1
    assert(intercept[IllegalArgumentException](BmpCodec.decode(rle))
      .getMessage.contains("compression 1"))
    // truncated pixel data
    assert(intercept[IllegalArgumentException](
      BmpCodec.decode(good.take(good.length - 4)))
      .getMessage.contains("EOF"))
    // paletted file with an out-of-palette index
    val pal = Array[Byte](1, 2, 3, 4, 5, 6)
    val p8 = BmpCodec.encode(2, 1, Array[Byte](0, 1), pal)
    val dataAt = 54 + 4 * 2
    val bad = p8.clone(); bad(dataAt) = 9
    assert(intercept[IllegalArgumentException](BmpCodec.decode(bad))
      .getMessage.contains("palette"))
    // encoder guards
    assert(intercept[IllegalArgumentException](
      BmpCodec.encode(2, 1, Array[Byte](0, 7), pal)).getMessage.contains("palette"))
  }

  test("format-agnostic dispatch: tiles and resize accept BMP rows") {
    import spark.implicits._
    val bmp = BmpCodec.encode(8, 8, Array.tabulate(8 * 8 * 3)(i => (i % 251).toByte))
    val media = Seq((1L, bmp)).toDF("doc_id", "content")
    val tiles = BinaryPipeline.imageTileFeatures(media).collect()
    assert(tiles.length == 1 &&
      tiles(0).getAs[scala.collection.Seq[Double]]("features").length == 48)
    val resized = BinaryPipeline.resizeImages(media, 4, 4).collect()
    assert(resized.length == 1)
  }

  test("synthesizeBmps → decodeBmps matches an independent recompute (all three modes)") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L, 7L).toDF("doc_id") // covers modes 0/1/2
    val got = BinaryPipeline.decodeBmps(BinaryPipeline.synthesizeBmps(ids))
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    val want = Seq(0L, 1L, 2L, 7L).map { id =>
      val w = (11 + id % 13).toInt
      val h = (9 + id % 11).toInt
      val rgb =
        if (id % 3 == 0)
          (0 until w * h).flatMap { pi =>
            val ix = ((id * 37 + pi * 13L) % 250).toInt
            Seq((ix * 37) % 256, (ix * 59 + 17) % 256, (ix * 83 + 29) % 256)
          }
        else (0 until w * h * 3).map(i => ((id * 37 + i * 11L) % 256).toInt)
      val sums = Array(0L, 0L, 0L)
      var weighted = 0L
      rgb.zipWithIndex.foreach { case (v, p) =>
        sums(p % 3) += v; weighted += (p + 1).toLong * v
      }
      (id, w.toLong, h.toLong, sums(0), sums(1), sums(2), weighted)
    }
    assert(got.toSeq == want)
  }
}
