package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.PngCodec

/** Property-based round-trips over the PNG codec — randomized geometry
  * and pixel content probe filter-cycle, palette, resize-mapping and
  * tile-pooling corners no hand-picked fixture anticipates. Spark-free
  * (pure codec), so the suite is cheap. */
class PngCodecPropSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(res.passed, res.status.toString)
  }

  private val geometry: Gen[(Int, Int)] = for {
    w <- Gen.chooseNum(1, 40)
    h <- Gen.chooseNum(1, 24)
  } yield (w, h)

  private val colorType: Gen[(Int, Int)] =
    Gen.oneOf((0, 1), (4, 2), (2, 3), (6, 4)) // (type, channels)

  test("encode→decode round-trips every color type, geometry and pixel content") {
    check(Prop.forAll(geometry, colorType, Gen.long) { case ((w, h), (ct, ch), seed) =>
      val rnd = new scala.util.Random(seed)
      val px = Array.fill(w * h * ch)(rnd.nextInt(256).toByte)
      val img = PngCodec.decode(PngCodec.encode(w, h, ct, px))
      img.width == w && img.height == h && img.colorType == ct &&
        img.channels == ch && java.util.Arrays.equals(img.pixels, px)
    })
  }

  test("interlaced (Adam7) encode→decode equals the non-interlaced decode on every geometry") {
    // interlacing is pure LAYOUT: the decoded buffer must be identical
    // to the plain encoding of the same pixels — ragged pass geometry,
    // empty passes and per-pass filter resets all included
    check(Prop.forAll(geometry, colorType, Gen.long) { case ((w, h), (ct, ch), seed) =>
      val rnd = new scala.util.Random(seed)
      val px = Array.fill(w * h * ch)(rnd.nextInt(256).toByte)
      val plain = PngCodec.decode(PngCodec.encode(w, h, ct, px))
      val inter = PngCodec.decode(PngCodec.encode(w, h, ct, px, interlace = true))
      inter.width == w && inter.height == h &&
        java.util.Arrays.equals(inter.pixels, plain.pixels) &&
        java.util.Arrays.equals(inter.pixels, px)
    })
  }

  test("16-bit encode→decode round-trips bit-exactly, interlaced or not") {
    check(Prop.forAll(geometry, colorType, Gen.long, Gen.oneOf(false, true)) {
      case ((w, h), (ct, ch), seed, inter) =>
        val rnd = new scala.util.Random(seed)
        val px = Array.fill(w * h * ch)(rnd.nextInt(256).toByte)
        val img = PngCodec.decode(
          PngCodec.encode(w, h, ct, px, interlace = inter, bitDepth = 16))
        img.bitDepth == 16 && java.util.Arrays.equals(img.pixels, px)
    })
  }

  test("palette encode→decode expands through PLTE exactly") {
    val palGen = for {
      n <- Gen.chooseNum(1, 256)
      bytes <- Gen.listOfN(3 * n, Gen.chooseNum(0, 255).map(_.toByte))
    } yield bytes.toArray
    check(Prop.forAll(geometry, palGen, Gen.long) { case ((w, h), pal, seed) =>
      val nEntries = pal.length / 3
      val rnd = new scala.util.Random(seed)
      val idx = Array.fill(w * h)(rnd.nextInt(nEntries).toByte)
      val img = PngCodec.decode(PngCodec.encode(w, h, 3, idx, Some(pal)))
      img.channels == 3 &&
        img.pixels.toSeq == idx.flatMap(i => pal.slice(3 * (i & 0xff), 3 * (i & 0xff) + 3)).toSeq
    })
  }

  test("resizeNearest: identity is a no-op; down-then-identity preserves mapped pixels; geometry holds") {
    check(Prop.forAll(geometry, colorType, Gen.long, geometry) {
      case ((w, h), (ct, ch), seed, (ow, oh)) =>
        val rnd = new scala.util.Random(seed)
        val px = Array.fill(w * h * ch)(rnd.nextInt(256).toByte)
        val img = PngCodec.PngImage(w, h, 8, ct, ch, px)
        val ident = PngCodec.resizeNearest(img, w, h)
        val out = PngCodec.resizeNearest(img, ow, oh)
        // every output pixel equals its mapped source pixel exactly
        val mappedOk = (0 until oh).forall { y =>
          val sy = (y.toLong * h / oh).toInt
          (0 until ow).forall { x =>
            val sx = (x.toLong * w / ow).toInt
            (0 until ch).forall { c =>
              out.pixels((y * ow + x) * ch + c) == px((sy * w + sx) * ch + c)
            }
          }
        }
        java.util.Arrays.equals(ident.pixels, px) &&
          out.width == ow && out.height == oh && mappedOk
    })
  }

  test("tileFeatures: tile means bounded by tile extrema; full-grid equals per-pixel values") {
    check(Prop.forAll(geometry, colorType, Gen.long) { case ((w, h), (ct, ch), seed) =>
      val rnd = new scala.util.Random(seed)
      val px = Array.fill(w * h * ch)(rnd.nextInt(256).toByte)
      val img = PngCodec.PngImage(w, h, 8, ct, ch, px)
      // gx = w, gy = h: every tile is a single pixel — means ARE values
      val exact = PngCodec.tileFeatures(img, w, h)
      val exactOk = (0 until w * h * ch).forall(i => exact(i) == (px(i) & 0xff).toDouble)
      // a coarse grid's means stay within [0, 255] and global mean is
      // preserved under equal-size tiles (w, h divisible case skipped —
      // bounds are the invariant that always holds)
      val gx = math.min(2, w); val gy = math.min(2, h)
      val coarse = PngCodec.tileFeatures(img, gx, gy)
      exactOk && coarse.forall(v => v >= 0.0 && v <= 255.0)
    })
  }

  test("truncated and bit-flipped files never decode silently") {
    check(Prop.forAll(geometry, colorType, Gen.long, Gen.chooseNum(8, 200)) {
      case ((w, h), (ct, ch), seed, cut) =>
        val rnd = new scala.util.Random(seed)
        val px = Array.fill(w * h * ch)(rnd.nextInt(256).toByte)
        val bytes = PngCodec.encode(w, h, ct, px)
        val truncated = bytes.take(math.min(cut, bytes.length - 1))
        val flipAt = 8 + rnd.nextInt(bytes.length - 20) // past the signature
        val flipped = bytes.clone()
        flipped(flipAt) = (flipped(flipAt) ^ 0x5a).toByte
        val truncThrows =
          try { PngCodec.decode(truncated); false } catch { case _: Exception => true }
        // a flip either throws (CRC/geometry) or — if it landed in a
        // region the decoder legitimately reconstructs differently —
        // never silently EQUALS the original pixels while claiming success
        val flippedOk =
          try {
            val img = PngCodec.decode(flipped)
            // decode succeeded: CRCs matched, so the flip must have hit
            // a byte the checksums don't cover — impossible in this
            // layout (all chunk payloads + types are covered); fail
            false
          } catch { case _: Exception => true }
        truncThrows && flippedOk
    })
  }
}
