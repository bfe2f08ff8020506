package graft

import graft.multimodal.{CcittCodec, Jbig2Codec}
import graft.pipeline.PdfCodec
import org.scalatest.funsuite.AnyFunSuite

/** Jbig2Codec (round 20 — the dominant post-2005 scanned-PDF
  * compression): hand-computed MQ decoder traces (the T.88 fixture
  * discipline — every assertion below was worked by hand from the Qe
  * table and the INITDEC/DECODE flowcharts), MQ encode→decode round
  * trips, generic-region round trips, the MMR leg cross-checked
  * against the independently-gated CCITT G4 decoder, segment-walk
  * fail-loud contract, and the PDF filter integration. */
class Jbig2Spec extends AnyFunSuite with SparkSpec {

  test("MQ decoder: hand-computed INITDEC + first-DECODE traces") {
    // Trace 1, data [0x56, 0x01]: INITDEC gives chigh 0x2B00, A 0x8000.
    // DECODE in a fresh context (index 0, MPS 0, Qe 0x5601):
    // A = 0x29FF; chigh < Qe → LPS subinterval; A < Qe → conditional
    // exchange: the decision is the MPS (0), next index NMPS(0) = 1.
    val cx1 = new Array[Short](1)
    val d1 = new Jbig2Codec.MqDecoder(Array[Byte](0x56, 0x01), 0, 2)
    assert(d1.decode(cx1, 0) == 0, "exchange branch decodes the MPS")
    assert(cx1(0) == ((1 << 1) | 0).toShort, "index → NMPS(0) = 1, MPS stays 0")
    // Trace 2, data [0xAD, 0x00]: chigh = 0xAD<<7 = 0x5680 ≥ Qe →
    // MPS-region branch: chigh −= Qe (0x7F); A = 0x29FF needs renorm
    // and A < Qe → the decision is the LPS (1); SWITCH(0) = 1 flips
    // MPS to 1; next index NLPS(0) = 1.
    val cx2 = new Array[Short](1)
    val d2 = new Jbig2Codec.MqDecoder(Array[Byte](0xad.toByte, 0x00), 0, 2)
    assert(d2.decode(cx2, 0) == 1, "renorm-exchange branch decodes the LPS")
    assert(cx2(0) == ((1 << 1) | 1).toShort, "SWITCH flips MPS; index → NLPS(0) = 1")
  }

  test("MQ state table: structural invariants of T.88 Table E.1") {
    // transcription-slip detectors that roundtrips CANNOT catch (the
    // encoder and decoder share the table, so any self-consistent
    // table roundtrips): these properties hold of the published table
    // and pin its shape independently.
    val f = Jbig2Codec.getClass.getDeclaredFields
      .filter(x => Set("QeVal", "Nmps", "Nlps", "SwitchFlag")
        .exists(n => x.getName.endsWith(n)))
    f.foreach(_.setAccessible(true))
    def arr(n: String): Array[Int] = f.find(_.getName.endsWith(n)).get
      .get(Jbig2Codec).asInstanceOf[Array[Int]]
    val (qe, nmps, nlps, sw) = (arr("QeVal"), arr("Nmps"), arr("Nlps"),
      arr("SwitchFlag"))
    assert(Seq(qe, nmps, nlps, sw).forall(_.length == 47), "47 rows")
    // every Qe is a valid probability estimate; transitions in range
    assert(qe.forall(q => q > 0 && q < 0x8000))
    assert(nmps.forall(i => i >= 0 && i <= 46) && nlps.forall(i => i >= 0 && i <= 46))
    // SWITCH rows are exactly the three MPS-flip states 0, 6, 14
    assert(sw.zipWithIndex.collect { case (1, i) => i }.toSeq == Seq(0, 6, 14))
    // the startup chain 0..5 and the main adaptation chain 14..45 have
    // non-increasing Qe (confidence only grows along NMPS), and NMPS
    // advances by exactly one inside each chain (except the jumps the
    // table publishes at rows 5 and 13)
    (0 until 5).foreach(i => assert(qe(i + 1) <= qe(i), s"startup row $i"))
    (14 until 45).foreach(i => assert(qe(i + 1) <= qe(i), s"main row $i"))
    (14 until 45).foreach(i => assert(nmps(i) == i + 1, s"main NMPS $i"))
    // terminal + non-adaptive rows self-loop on NMPS
    assert(nmps(45) == 45 && nmps(46) == 46 && nlps(46) == 46)
    // LPS transitions never increase confidence past the current state
    // by more than the published re-entry points: every NLPS target's
    // Qe is >= the state's own Qe (an LPS means the estimate was off)
    (14 to 45).foreach(i => assert(qe(nlps(i)) >= qe(i), s"NLPS row $i"))
  }

  test("MQ coder: encode→decode round trips arbitrary decision sequences") {
    // deterministic pseudo-random decisions over a handful of contexts
    for (seed <- 1 to 5) {
      val n = 400 + seed * 137
      val ctxOf = Array.tabulate(n)(i => (i * 31 + seed * 7) % 13)
      val bits = Array.tabulate(n)(i =>
        if (((i * i + seed * 11) % 7) < 3) 1 else 0)
      val encCx = new Array[Short](13)
      val enc = new Jbig2Codec.MqEncoder
      (0 until n).foreach(i => enc.encode(encCx, ctxOf(i), bits(i)))
      val wire = enc.flush()
      val decCx = new Array[Short](13)
      val dec = new Jbig2Codec.MqDecoder(wire, 0, wire.length)
      (0 until n).foreach { i =>
        assert(dec.decode(decCx, ctxOf(i)) == bits(i),
          s"seed $seed decision $i")
      }
    }
  }

  private def pattern(w: Int, h: Int, seed: Int): Array[Byte] = {
    val rowBytes = (w + 7) / 8
    val packed = new Array[Byte](rowBytes * h)
    for (y <- 0 until h; x <- 0 until w)
      if ((seed * 37 + x * 7 + y * 13) % 5 < 2)
        packed(y * rowBytes + (x >> 3)) =
          (packed(y * rowBytes + (x >> 3)) | (1 << (7 - (x & 7)))).toByte
    packed
  }

  test("embedded stream: generic region MQ + MMR round trips; CCITT parity") {
    for ((w, h, seed) <- Seq((17, 13, 3), (32, 24, 4), (23, 9, 5), (8, 8, 6));
         mmr <- Seq(false, true)) {
      val packed = pattern(w, h, seed)
      val wire = Jbig2Codec.encode(w, h, packed, mmr = mmr)
      val (gw, gh, got) = Jbig2Codec.decode(wire)
      assert(gw == w && gh == h, s"${w}x$h mmr=$mmr geometry")
      assert(got.toSeq == packed.toSeq, s"${w}x$h seed $seed mmr=$mmr bits")
    }
    // all-white and all-black degenerate regions
    for (fill <- Seq(0x00, 0xff)) {
      val rowBytes = (16 + 7) / 8
      val packed = Array.fill[Byte](rowBytes * 5)(fill.toByte)
      val (_, _, got) = Jbig2Codec.decode(Jbig2Codec.encode(16, 5, packed))
      assert(got.toSeq == packed.toSeq, f"fill 0x$fill%02x")
    }
    // STRIPED pages: multiple full-width region segments at row
    // offsets OR-composite into the page bitmap (the real large-scan
    // shape) — result identical to the single-region coding
    for (mmr <- Seq(false, true); stripes <- Seq(2, 3)) {
      val packed = pattern(23, 11, 7)
      val wire = Jbig2Codec.encode(23, 11, packed, mmr = mmr, stripes = stripes)
      val (gw, gh, got) = Jbig2Codec.decode(wire)
      assert(gw == 23 && gh == 11 && got.toSeq == packed.toSeq,
        s"striped mmr=$mmr stripes=$stripes")
    }
    // the MMR leg is T.6: the coded block must decode identically
    // through CcittCodec directly (independent cross-check)
    val packed = pattern(21, 11, 9)
    val wire = Jbig2Codec.encode(21, 11, packed, mmr = true)
    // region data starts after: page-info segment (11-byte header + 19)
    // + region segment header (11) + region info (17) + flags (1)
    val dataOff = 11 + 19 + 11 + 17 + 1
    val viaCcitt = CcittCodec.decode(wire, dataOff,
      wire.length - dataOff - 11, 21, 11, 4)
    assert(viaCcitt.toSeq == packed.toSeq,
      "MMR block must be plain T.6 readable by CcittCodec")
  }

  test("TPGDON typical prediction: repeated-row and mixed patterns round trip") {
    // banded pattern: runs of identical rows exercise the LTP copy
    // path; band switches exercise the SLTP toggle
    val w = 19; val h = 14
    val rowBytes = (w + 7) / 8
    val packed = new Array[Byte](rowBytes * h)
    for (y <- 0 until h; x <- 0 until w)
      if (((y / 3) + x) % 4 < 2) // rows within a 3-band are identical
        packed(y * rowBytes + (x >> 3)) =
          (packed(y * rowBytes + (x >> 3)) | (1 << (7 - (x & 7)))).toByte
    val wire = Jbig2Codec.encode(w, h, packed, tpgdon = true)
    // the TPGDON bit must be on the wire (generic flags byte)
    assert((wire(11 + 19 + 11 + 17) & 8) == 8)
    val (gw, gh, got) = Jbig2Codec.decode(wire)
    assert(gw == w && gh == h && got.toSeq == packed.toSeq)
    // TPGDON must beat the plain coding on this row-repetitive shape
    val plain = Jbig2Codec.encode(w, h, packed)
    assert(wire.length < plain.length,
      s"TPGDON wire ${wire.length}B should undercut plain ${plain.length}B")
    // all-zero bitmap: every row typical from row 0
    val zeros = new Array[Byte](rowBytes * 6)
    val (_, _, z) = Jbig2Codec.decode(Jbig2Codec.encode(w, 6, zeros, tpgdon = true))
    assert(z.toSeq == zeros.toSeq)
    // non-repetitive pattern still round trips under TPGDON
    val mixed = pattern(17, 9, 11)
    val (_, _, m) = Jbig2Codec.decode(Jbig2Codec.encode(17, 9, mixed, tpgdon = true))
    assert(m.toSeq == mixed.toSeq)
  }

  test("fail-loud: unsupported segments by name, AT/template/TPGDON, framing") {
    val good = Jbig2Codec.encode(10, 7, pattern(10, 7, 2))
    def patched(f: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); f(b); b
    }
    // segment type patched to immediate text region (6) → by-name reject
    // (page-info segment flags byte sits at offset 4)
    assert(intercept[IllegalArgumentException](Jbig2Codec.decode(
      patched(_(4) = 6))).getMessage.contains("text region"))
    // generic flags byte of the region segment: MMR+TPGDON / template
    val regionFlagsAt = 11 + 19 + 11 + 17
    assert(intercept[IllegalArgumentException](Jbig2Codec.decode(
      patched(_(regionFlagsAt) = 9))).getMessage.contains("not a valid"))
    assert(intercept[IllegalArgumentException](Jbig2Codec.decode(
      patched(_(regionFlagsAt) = 2))).getMessage.contains("GBTEMPLATE 1"))
    // non-nominal AT pixel
    assert(intercept[IllegalArgumentException](Jbig2Codec.decode(
      patched(_(regionFlagsAt + 1) = 4))).getMessage.contains("AT"))
    // truncation mid-segment
    assert(intercept[IllegalArgumentException](Jbig2Codec.decode(
      java.util.Arrays.copyOf(good, good.length - 12))) != null)
    // no region at all (just the page-info segment)
    assert(intercept[IllegalArgumentException](Jbig2Codec.decode(
      java.util.Arrays.copyOf(good, 30))).getMessage.contains("no generic region"))
    // a region whose rows run past the page rejects (y patched to 1
    // with h == pageH; region info y sits at segment offset 41+12)
    assert(intercept[IllegalArgumentException](Jbig2Codec.decode(
      patched(_(30 + 11 + 15) = 1))).getMessage.contains("past the"))
    // partial-width region rejects by name (w patched down by one)
    assert(intercept[IllegalArgumentException](Jbig2Codec.decode(
      patched(_(30 + 11 + 3) = 9))).getMessage.contains("partial-width"))
    // a region before any page-information segment rejects
    assert(intercept[IllegalArgumentException](Jbig2Codec.decode(
      java.util.Arrays.copyOfRange(good, 30, good.length)))
      .getMessage.contains("before page information"))
  }

  test("PDF filter: JBIG2 image XObjects decode with the black inversion") {
    val px = Array.tabulate[Byte](18 * 11) { i =>
      val x = i % 18; val y = i / 18
      (if ((5 * 37 + x * 7 + y * 13) % 5 < 2) 0 else 255).toByte
    }
    for (filter <- Seq("JBIG2", "JBIG2MMR")) {
      val wire = PdfCodec.encodeImagePdf(
        Seq(PdfCodec.ImagePageSpec(18, 11, 1, px, filter)))
      assert(new String(wire, "ISO-8859-1").contains("/JBIG2Decode"))
      val imgs = PdfCodec.extractImages(wire)
      assert(imgs.length == 1 && imgs.head.channels == 1)
      assert(imgs.head.pixels.toSeq == px.toSeq,
        s"$filter: black bits must come back as gray 0")
    }
    // /JBIG2Globals rejects by name — hand-assembled PDF so the dict
    // can carry the DecodeParms without disturbing xref offsets
    val jb = Jbig2Codec.encode(4, 3, Array[Byte](0xa0.toByte, 0x50, 0xa0.toByte))
    val out = new java.io.ByteArrayOutputStream()
    val offs = scala.collection.mutable.Buffer.empty[Int]
    def w(str: String): Unit = out.write(str.getBytes("ISO-8859-1"))
    def obj(body: String): Unit = { offs += out.size(); w(body) }
    w("%PDF-1.4\n")
    obj("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    obj("2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n")
    obj("3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 4 3] " +
      "/Resources << /XObject << /Im0 5 0 R >> >> /Contents 4 0 R >>\nendobj\n")
    val pc = "q 4 0 0 3 0 0 cm /Im0 Do Q"
    obj(s"4 0 obj\n<< /Length ${pc.length} >>\nstream\n$pc\nendstream\nendobj\n")
    offs += out.size()
    w(s"5 0 obj\n<< /Type /XObject /Subtype /Image /Width 4 /Height 3 " +
      s"/ColorSpace /DeviceGray /BitsPerComponent 1 /Filter /JBIG2Decode " +
      s"/DecodeParms << /JBIG2Globals 6 0 R >> " +
      s"/Length ${jb.length} >>\nstream\n")
    out.write(jb)
    w("\nendstream\nendobj\n")
    offs += out.size()
    w("6 0 obj\n<< /Length 0 >>\nstream\n\nendstream\nendobj\n")
    val xrefAt = out.size()
    w("xref\n0 7\n0000000000 65535 f \n")
    offs.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    assert(intercept[IllegalArgumentException](
      PdfCodec.extractImages(out.toByteArray))
      .getMessage.contains("JBIG2Globals"))
  }
}
