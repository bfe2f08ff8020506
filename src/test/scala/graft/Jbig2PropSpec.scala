package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Jbig2Codec

/** Property-based round-trips over the JBIG2 coder — randomized
  * decision sequences probe MQ renormalization/stuffing/flush corners,
  * and randomized bitmaps probe the generic-region context walk,
  * TPGDON toggling and stripe composition beyond any hand-picked
  * fixture. Spark-free (pure codec), so the suite is cheap. */
class Jbig2PropSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(res.passed, res.status.toString)
  }

  test("MQ coder round-trips arbitrary decision sequences over arbitrary contexts") {
    check(Prop.forAll(Gen.chooseNum(1, 2000), Gen.chooseNum(1, 64), Gen.long) {
      (n, nCtx, seed) =>
        val rnd = new scala.util.Random(seed)
        // skewed decisions: exercise long MPS runs (deep Qe states) and
        // dense LPS flips in the same corpus
        val bias = rnd.nextDouble()
        val ctxOf = Array.fill(n)(rnd.nextInt(nCtx))
        val bits = Array.fill(n)(if (rnd.nextDouble() < bias) 1 else 0)
        val enc = new Jbig2Codec.MqEncoder
        val encCx = new Array[Short](nCtx)
        (0 until n).foreach(i => enc.encode(encCx, ctxOf(i), bits(i)))
        val wire = enc.flush()
        val dec = new Jbig2Codec.MqDecoder(wire, 0, wire.length)
        val decCx = new Array[Short](nCtx)
        (0 until n).forall(i => dec.decode(decCx, ctxOf(i)) == bits(i))
    })
  }

  private val geometry: Gen[(Int, Int)] = for {
    w <- Gen.chooseNum(1, 48)
    h <- Gen.chooseNum(1, 32)
  } yield (w, h)

  test("embedded stream round-trips every geometry, density, mode and striping") {
    check(Prop.forAll(geometry, Gen.chooseNum(0, 100), Gen.long,
      Gen.oneOf("mq", "mmr", "tpgdon"), Gen.chooseNum(1, 4)) {
      case ((w, h), density, seed, mode, stripes0) =>
        val rnd = new scala.util.Random(seed)
        val rowBytes = (w + 7) / 8
        val packed = new Array[Byte](rowBytes * h)
        for (y <- 0 until h; x <- 0 until w)
          if (rnd.nextInt(101) < density)
            packed(y * rowBytes + (x >> 3)) =
              (packed(y * rowBytes + (x >> 3)) | (1 << (7 - (x & 7)))).toByte
        val stripes = math.min(stripes0, h)
        val wire = Jbig2Codec.encode(w, h, packed,
          mmr = mode == "mmr", tpgdon = mode == "tpgdon", stripes = stripes)
        val (gw, gh, got) = Jbig2Codec.decode(wire)
        gw == w && gh == h && java.util.Arrays.equals(got, packed)
    })
  }
}
