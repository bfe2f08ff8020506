package graft.multimodal

import java.io.ByteArrayOutputStream

/** A real JPEG codec (ITU-T T.81 / ISO 10918-1, baseline sequential
  * AND progressive DCT, Huffman entropy coding) — the second real image leg
  * of the multimodal pipeline. PNG covered the lossless corpora; real
  * image corpora are overwhelmingly JPEG, and the reference decodes its
  * media format for real (PDFBox, BlobUploadDetector/.../
  * Function.java:90-132), so the JPEG leg gets the same treatment:
  * marker parse → DQT/DHT/SOF0/SOS → Huffman decode → dequantize →
  * IDCT → chroma upsample → YCbCr→RGB.
  *
  * Scope (fail-loud beyond it, never silent garbage):
  *  - SOF0 baseline sequential AND SOF2 progressive (round 14: full
  *    spectral selection + successive approximation — DC/AC band scans,
  *    point transforms, EOB runs, correction bits — decoded into
  *    per-component coefficient buffers refined across scans, one
  *    dequantize+IDCT pass at EOI); extended sequential (SOF1),
  *    lossless, hierarchical and ARITHMETIC coding reject with the
  *    marker named
  *  - 8-bit precision; 1 (grayscale), 3 (YCbCr) or 4 (Adobe CMYK/YCCK,
  *    round 15: APP14 transform 0 or 2, 1x1 sampling, inverted-value
  *    convention, TRUE CMYK out) components — a 4-component file
  *    without an Adobe APP14 (or with another transform, or subsampled)
  *    rejects
  *  - sampling factors 1 or 2 per axis (4:4:4, 4:2:2, 4:4:0, 4:2:0);
  *    chroma upsamples by sample replication
  *  - restart markers (DRI/RSTn) honored in every scan kind, including
  *    the DC-predictor/EOB-run reset and expected-index check
  *
  * Determinism contract (what the SQL oracle leans on): every rounding
  * in BOTH codecs is `floor(x + 0.5)` — quantizer, IDCT output, color
  * transforms — so a flat 8×8 block whose level-shifted DC is a
  * multiple of the DC quantizer decodes to EXACTLY its source value,
  * and neutral (128) chroma decodes to exactly R=G=B=Y. The
  * `q_image_jpeg` fixtures are built from those two facts.
  */
object JpegCodec {

  /** Decoded image: row-major, channel-interleaved; `components` is 1
    * (gray), 3 (RGB — the YCbCr→RGB transform already applied) or 4
    * (TRUE CMYK — Adobe inversion and any YCCK transform undone). */
  final case class JpegImage(width: Int, height: Int, components: Int,
                             pixels: Array[Byte])

  def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff

  /** Zig-zag scan order (T.81 figure 5): zigzag(k) = natural index. */
  private[multimodal] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Orthonormal DCT-II kernel: ct(x)(u) = C(u)/2 · cos((2x+1)uπ/16).
    * FDCT: F(u,v) = Σ ct(x)(u)·ct(y)(v)·f(x,y); IDCT is the transpose —
    * one table, both directions. */
  private val Ct: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** The round-half-up everything in this codec uses (see object doc). */
  @inline private def rnd(x: Double): Int = math.floor(x + 0.5).toInt
  @inline private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  // ════════════════════════════════════════════════════════ decoder ══

  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // canonical decode tables (T.81 F.2.2.3): mincode/maxcode/valptr
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val values: Array[Int] = vals
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1)
        k += bits(l - 1)
        maxCode(l) = if (bits(l - 1) == 0) -1 else code - 1
        code <<= 1
        l += 1
      }
    }
  }

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0

    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= bytes.length)
          throw new IllegalArgumentException("JpegCodec: entropy data truncated")
        val b = bytes(pos) & 0xff
        if (b == 0xff) {
          val b2 = if (pos + 1 < bytes.length) bytes(pos + 1) & 0xff else -1
          if (b2 == 0x00) { pos += 2; acc = 0xff; nbits = 8 } // stuffed
          else throw new IllegalArgumentException(
            f"JpegCodec: marker 0xFF$b2%02X inside entropy data (truncated scan?)")
        } else { pos += 1; acc = b; nbits = 8 }
      }
      nbits -= 1
      (acc >> nbits) & 1
    }

    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    def decodeHuff(t: HuffTable): Int = {
      var code = bit()
      var l = 1
      while (t.maxCode(l) < code || t.maxCode(l) == -1) {
        if (l >= 16) throw new IllegalArgumentException(
          "JpegCodec: invalid Huffman code (corrupt entropy data)")
        code = (code << 1) | bit()
        l += 1
      }
      t.values(t.valPtr(l) + code - t.minCode(l))
    }

    /** Byte-align and consume an expected RSTn marker. */
    def restart(expected: Int): Unit = {
      nbits = 0
      if (pos + 1 >= bytes.length || (bytes(pos) & 0xff) != 0xff)
        throw new IllegalArgumentException("JpegCodec: expected restart marker")
      val m = bytes(pos + 1) & 0xff
      if (m != 0xd0 + expected) throw new IllegalArgumentException(
        f"JpegCodec: expected RST$expected%d, found 0xFF$m%02X (dropped marker?)")
      pos += 2
    }
  }

  /** EXTEND (T.81 F.2.2.1): map the `s`-bit magnitude to a signed value. */
  @inline private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTable: HuffTable = _
    var acTable: HuffTable = _
    var plane: Array[Int] = _ // padded to full MCU grid
    var planeW: Int = 0
    var planeH: Int = 0
    var pred: Int = 0
    // QUANTIZED coefficients for the whole component, natural order per
    // block, MCU-aligned block grid (progressive scans refine these
    // across multiple passes; IDCT runs once at EOI)
    var coefs: Array[Int] = _
    // per-coefficient successive-approximation state for progressive
    // scan-ORDERING validation (T.81 G.1.1.1.1): -1 = no first pass yet,
    // otherwise the point transform (Al) of the last scan covering it
    val approx: Array[Int] = Array.fill(64)(-1)
    var blocksW: Int = 0     // MCU-aligned blocks per row (mcusX·h)
    var blocksH: Int = 0
    var compBlocksW: Int = 0 // ceil(compW/8) — non-interleaved scan grid
    var compBlocksH: Int = 0
  }

  /** Header-only geometry: (width, height, components) from the SOF
    * without decoding any scan — the cheap feature-extraction path. */
  def dimensions(bytes: Array[Byte]): (Int, Int, Int) = {
    val hdr = parse(bytes, headerOnly = true)
    (hdr.width, hdr.height, hdr.comps.length)
  }

  private final class Header {
    var width = 0
    var height = 0
    var progressive = false
    var comps: Array[Component] = Array.empty
    val quant = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var restartInterval = 0
    var scansDecoded = 0
    var mcusX = 0
    var mcusY = 0
    // Adobe APP14 color-transform code: -1 = no APP14 seen; 0 = none
    // (4-comp: inverted CMYK direct), 1 = YCbCr, 2 = YCCK
    var adobeTransform = -1
  }

  private def parse(bytes: Array[Byte], headerOnly: Boolean): Header = {
    require(isJpeg(bytes), "JpegCodec: not a JPEG (bad SOI signature)")
    val h = new Header
    var pos = 2
    def u8(i: Int): Int = bytes(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    var sofSeen = false
    var done = false
    while (!done) {
      if (pos + 1 >= bytes.length)
        throw new IllegalArgumentException("JpegCodec: truncated before SOS/EOI")
      require(u8(pos) == 0xff, f"JpegCodec: expected marker, found 0x${u8(pos)}%02X")
      var marker = u8(pos + 1)
      pos += 2
      while (marker == 0xff) { // fill bytes
        if (pos >= bytes.length)
          throw new IllegalArgumentException("JpegCodec: truncated inside marker fill bytes")
        marker = u8(pos); pos += 1
      }
      // every length-carrying segment below must fit inside the file —
      // a truncated DHT/DQT/SOF/SOS would otherwise surface as a raw
      // ArrayIndexOutOfBoundsException, not the labeled fail-loud error
      def segLen(): Int = {
        if (pos + 1 >= bytes.length)
          throw new IllegalArgumentException("JpegCodec: truncated marker segment header")
        val len = u16(pos)
        if (pos + len > bytes.length)
          throw new IllegalArgumentException(
            f"JpegCodec: marker 0xFF$marker%02X segment of $len bytes runs past EOF")
        len
      }
      marker match {
        case 0xd8 => // stray SOI
          throw new IllegalArgumentException("JpegCodec: unexpected second SOI")
        case 0xd9 =>
          require(h.scansDecoded > 0,
            "JpegCodec: EOI before any scan data")
          done = true
        case 0xc0 | 0xc2 => // SOF0 baseline / SOF2 progressive
          // a second SOF would silently re-allocate the coefficient
          // buffers and discard every decoded scan — flat-gray garbage,
          // the exact silent failure the fail-loud scope forbids
          require(!sofSeen, "JpegCodec: duplicate SOF marker")
          h.progressive = marker == 0xc2
          val len = segLen()
          val prec = u8(pos + 2)
          require(prec == 8, s"JpegCodec: precision $prec unsupported (8-bit only)")
          h.height = u16(pos + 3)
          h.width = u16(pos + 5)
          require(h.width > 0 && h.height > 0, "JpegCodec: zero dimension in SOF")
          val nc = u8(pos + 7)
          require(nc == 1 || nc == 3 || nc == 4,
            s"JpegCodec: $nc components unsupported (1 = gray, 3 = YCbCr, 4 = Adobe CMYK/YCCK)")
          // 4-component files are only meaningful with the Adobe APP14
          // transform code, but APPn markers may legally appear between
          // ANY segments (T.81 B.2.4.6) — libjpeg honors an APP14 found
          // after SOF too, so the transform requirement is validated at
          // pixel-assembly time (like the 3-component rgbDirect check),
          // not here.
          // length check BEFORE the component parse: a short SOF would
          // otherwise read the next segment's bytes as component specs
          require(len == 8 + 3 * nc, "JpegCodec: malformed SOF length")
          h.comps = Array.tabulate(nc) { i =>
            val o = pos + 8 + 3 * i
            val hv = u8(o + 1)
            val c = Component(u8(o), hv >> 4, hv & 0xf, u8(o + 2))
            require(c.h >= 1 && c.h <= 2 && c.v >= 1 && c.v <= 2,
              s"JpegCodec: sampling ${c.h}x${c.v} unsupported (factors 1 or 2)")
            require(c.tq <= 3,
              s"JpegCodec: SOF component ${c.id} names quant table ${c.tq} (0-3)")
            c
          }
          if (nc == 1) require(h.comps(0).h == 1 && h.comps(0).v == 1,
            "JpegCodec: grayscale with sampling > 1 unsupported")
          if (nc == 4) require(h.comps.forall(c => c.h == 1 && c.v == 1),
            "JpegCodec: subsampled CMYK/YCCK unsupported (1x1 factors only)")
          sofSeen = true
          if (!headerOnly) {
            val hMax = h.comps.map(_.h).max
            val vMax = h.comps.map(_.v).max
            h.mcusX = (h.width + 8 * hMax - 1) / (8 * hMax)
            h.mcusY = (h.height + 8 * vMax - 1) / (8 * vMax)
            h.comps.foreach { c =>
              c.blocksW = h.mcusX * c.h
              c.blocksH = h.mcusY * c.v
              c.coefs = new Array[Int](c.blocksW * c.blocksH * 64)
              val compW = (h.width * c.h + hMax - 1) / hMax
              val compH = (h.height * c.v + vMax - 1) / vMax
              c.compBlocksW = (compW + 7) / 8
              c.compBlocksH = (compH + 7) / 8
            }
          }
          pos += len
        case 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xcd | 0xce | 0xcf =>
          throw new IllegalArgumentException(
            f"JpegCodec: SOF marker 0xFF${marker}%02X unsupported — baseline (SOF0) " +
              "and progressive (SOF2) only")
        case 0xc9 | 0xca | 0xcb => throw new IllegalArgumentException(
          "JpegCodec: arithmetic-coded JPEG unsupported — Huffman only")
        case 0xc4 => // DHT (may hold several tables)
          val len = segLen()
          var o = pos + 2
          while (o < pos + len) {
            val tcth = u8(o)
            val tc = tcth >> 4; val th = tcth & 0xf
            require(tc <= 1 && th <= 3, s"JpegCodec: bad DHT header $tcth")
            val bits = Array.tabulate(16)(i => u8(o + 1 + i))
            val n = bits.sum
            require(n <= 256 && o + 17 + n <= pos + len, "JpegCodec: malformed DHT")
            val vals = Array.tabulate(n)(i => u8(o + 17 + i))
            val t = new HuffTable(bits, vals)
            if (tc == 0) h.dcTables(th) = t else h.acTables(th) = t
            o += 17 + n
          }
          pos += len
        case 0xdb => // DQT (may hold several tables)
          val len = segLen()
          var o = pos + 2
          while (o < pos + len) {
            val pqtq = u8(o)
            val pq = pqtq >> 4; val tq = pqtq & 0xf
            require(pq <= 1 && tq <= 3, s"JpegCodec: bad DQT header $pqtq")
            val tab = new Array[Int](64)
            var k = 0
            while (k < 64) {
              tab(Zigzag(k)) = if (pq == 0) u8(o + 1 + k) else u16(o + 1 + 2 * k)
              k += 1
            }
            h.quant(tq) = tab
            o += 1 + (if (pq == 0) 64 else 128)
          }
          pos += len
        case 0xdd => // DRI
          require(segLen() == 4, "JpegCodec: malformed DRI")
          h.restartInterval = u16(pos + 2)
          pos += 4
        case 0xda => // SOS
          require(sofSeen, "JpegCodec: SOS before SOF")
          val len = segLen()
          val ns = u8(pos + 2)
          if (!h.progressive) require(ns == h.comps.length,
            s"JpegCodec: baseline scan covers $ns of ${h.comps.length} components — " +
              "multi-scan baseline files unsupported")
          require(ns >= 1 && ns <= h.comps.length, s"JpegCodec: SOS names $ns components")
          val scanComps = Array.tabulate(ns) { i =>
            val cid = u8(pos + 3 + 2 * i)
            val tables = u8(pos + 4 + 2 * i)
            val c = h.comps.find(_.id == cid).getOrElse(
              throw new IllegalArgumentException(s"JpegCodec: SOS names unknown component $cid"))
            require((tables >> 4) <= 3 && (tables & 0xf) <= 3,
              s"JpegCodec: SOS component $cid names Huffman table ${tables >> 4}/" +
                s"${tables & 0xf} (0-3)")
            c.dcTable = h.dcTables(tables >> 4)
            c.acTable = h.acTables(tables & 0xf)
            require(h.quant(c.tq) != null,
              s"JpegCodec: component $cid references undefined quant table ${c.tq}")
            c
          }
          val ss = u8(pos + 3 + 2 * ns)
          val se = u8(pos + 4 + 2 * ns)
          val ahAl = u8(pos + 5 + 2 * ns)
          val ah = ahAl >> 4
          val al = ahAl & 0xf
          if (!h.progressive)
            require(ss == 0 && se == 63 && ahAl == 0,
              "JpegCodec: non-baseline spectral selection in a baseline (SOF0) scan")
          else {
            // progressive scan-header validation (T.81 G.1.1.1.1)
            if (ss == 0) require(se == 0,
              "JpegCodec: progressive scan with Ss=0 must have Se=0 (DC band only)")
            else {
              require(ns == 1,
                "JpegCodec: progressive AC scans must be non-interleaved (one component)")
              require(se >= ss && se <= 63,
                s"JpegCodec: progressive band Ss=$ss Se=$se out of order")
            }
            require(ah == 0 || ah == al + 1,
              s"JpegCodec: successive approximation Ah=$ah Al=$al (want Ah=0 or Al+1)")
            require(al <= 13, s"JpegCodec: point transform Al=$al out of range")
            // scan-ORDERING validation (T.81 G.1.1.1.1): a component's DC
            // first pass must precede its AC band scans, each band gets
            // exactly one first pass, and a refinement's Ah must match the
            // band's current point transform. Without this an AC-first
            // malformed file would decode SILENTLY with zero DC (dark or
            // offset garbage) — the exact silent failure the fail-loud
            // scope forbids.
            scanComps.foreach { c =>
              if (ss > 0) require(c.approx(0) >= 0,
                s"JpegCodec: AC band scan for component ${c.id} before its DC " +
                  "scan (T.81 G.1.1.1.1 ordering)")
              var kk = ss
              while (kk <= se) {
                if (ah == 0) require(c.approx(kk) == -1,
                  s"JpegCodec: duplicate first pass for component ${c.id} " +
                    s"coefficient $kk")
                else require(c.approx(kk) == ah,
                  s"JpegCodec: refinement scan Ah=$ah for component ${c.id} " +
                    s"coefficient $kk, whose point transform is " +
                    (if (c.approx(kk) == -1) "undefined (no first pass yet)"
                     else s"${c.approx(kk)}"))
                c.approx(kk) = al
                kk += 1
              }
            }
          }
          // table presence: DC scans (and baseline full-band) need the DC
          // table; AC bands need the AC table
          scanComps.foreach { c =>
            if (ss == 0) require(c.dcTable != null || (h.progressive && ah > 0),
              s"JpegCodec: scan references undefined DC Huffman table (component ${c.id})")
            if (se > 0) require(c.acTable != null,
              s"JpegCodec: scan references undefined AC Huffman table (component ${c.id})")
          }
          if (headerOnly) done = true
          else {
            pos = decodeScan(bytes, h, scanComps, ss, se, ah, al, pos + len)
            h.scansDecoded += 1
          }
        case 0xee => // APP14: the Adobe color-transform code
          val len = segLen()
          if (len >= 14 && bytes(pos + 2) == 'A' && bytes(pos + 3) == 'd' &&
              bytes(pos + 4) == 'o' && bytes(pos + 5) == 'b' && bytes(pos + 6) == 'e')
            h.adobeTransform = u8(pos + 13)
          pos += len
        case m if m >= 0xe0 && m <= 0xef => pos += segLen() // APPn
        case 0xfe => pos += segLen() // COM
        case other => throw new IllegalArgumentException(
          f"JpegCodec: unsupported marker 0xFF$other%02X")
      }
      // header-only callers stop right after SOF — geometry is known,
      // no scan gets decoded
      if (headerOnly && sofSeen) done = true
    }
    require(headerOnly || h.scansDecoded > 0, "JpegCodec: no SOS")
    h
  }

  /** Decode ONE scan's entropy data into the components' coefficient
    * buffers; returns the byte position of the next marker. Baseline
    * full-band scans and every progressive band/refinement pass go
    * through the same four block routines below. */
  private def decodeScan(bytes: Array[Byte], h: Header, scanComps: Array[Component],
                         ss: Int, se: Int, ah: Int, al: Int, startPos: Int): Int = {
    val br = new BitReader(bytes, startPos)
    var eobrun = 0
    var rstIdx = 0
    var sinceRestart = 0
    scanComps.foreach(_.pred = 0)
    def maybeRestart(): Unit =
      if (h.restartInterval > 0 && sinceRestart == h.restartInterval) {
        br.restart(rstIdx)
        rstIdx = (rstIdx + 1) % 8
        sinceRestart = 0
        eobrun = 0
        scanComps.foreach(_.pred = 0)
      }
    if (scanComps.length > 1) {
      // interleaved scan: MCU order; baseline = full band, progressive =
      // DC band only (validated above)
      var my = 0
      while (my < h.mcusY) {
        var mx = 0
        while (mx < h.mcusX) {
          maybeRestart()
          var ci = 0
          while (ci < scanComps.length) {
            val c = scanComps(ci)
            var by = 0
            while (by < c.v) {
              var bx = 0
              while (bx < c.h) {
                val off = ((my * c.v + by) * c.blocksW + (mx * c.h + bx)) * 64
                decodeBlock(br, h, c, off, ss, se, ah, al,
                  () => eobrun, e => eobrun = e)
                bx += 1
              }
              by += 1
            }
            ci += 1
          }
          sinceRestart += 1
          mx += 1
        }
        my += 1
      }
    } else {
      // non-interleaved: the component's own ceil-block grid, raster
      // order, no MCU padding blocks (T.81 A.2.2); restart counts blocks
      val c = scanComps(0)
      var by = 0
      while (by < c.compBlocksH) {
        var bx = 0
        while (bx < c.compBlocksW) {
          maybeRestart()
          val off = (by * c.blocksW + bx) * 64
          decodeBlock(br, h, c, off, ss, se, ah, al, () => eobrun, e => eobrun = e)
          sinceRestart += 1
          bx += 1
        }
        by += 1
      }
    }
    // the scan's entropy data ends here: advance to the next marker
    // (skipping any byte-stuffing leftovers)
    var p = br.pos
    while (p + 1 < bytes.length &&
      !((bytes(p) & 0xff) == 0xff && (bytes(p + 1) & 0xff) != 0x00)) p += 1
    require(p + 1 < bytes.length, "JpegCodec: entropy data runs past EOF (no EOI)")
    p
  }

  /** One block's contribution to the current scan. */
  private def decodeBlock(br: BitReader, h: Header, c: Component, off: Int,
                          ss: Int, se: Int, ah: Int, al: Int,
                          getEob: () => Int, setEob: Int => Unit): Unit = {
    if (ss == 0) {
      if (ah == 0) {
        // DC first (baseline or progressive): category + diff, shifted
        // by the point transform
        val s = br.decodeHuff(c.dcTable)
        require(s <= 11, "JpegCodec: DC category > 11 (corrupt data)")
        c.pred += extend(br.receive(s), s)
        c.coefs(off) = c.pred << al
      } else {
        // DC refinement: one bit restores the next-lower magnitude bit
        c.coefs(off) |= br.bit() << al
      }
    }
    if (se > 0) {
      val s0 = if (ss == 0) 1 else ss // baseline full band: AC starts at 1
      if (ah == 0) setEob(acFirst(br, c.acTable, c.coefs, off, s0, se, al, getEob()))
      else setEob(acRefine(br, c.acTable, c.coefs, off, s0, se, al, getEob()))
    }
  }

  /** AC band, first pass (Ah = 0) — also the baseline AC path (al = 0,
    * where EOB decodes as a zero-length EOB run). Returns the EOB run
    * remaining AFTER this block. */
  private def acFirst(br: BitReader, ac: HuffTable, coefs: Array[Int], off: Int,
                      ss: Int, se: Int, al: Int, eobrun0: Int): Int = {
    if (eobrun0 > 0) return eobrun0 - 1
    var eobrun = 0
    var k = ss
    var ended = false
    while (k <= se && !ended) {
      val rs = br.decodeHuff(ac)
      val r = rs >> 4
      val sz = rs & 0xf
      if (sz == 0) {
        if (r == 15) k += 16 // ZRL
        else {
          eobrun = (1 << r) - 1 + (if (r > 0) br.receive(r) else 0)
          ended = true
        }
      } else {
        k += r
        require(k <= se, "JpegCodec: AC run past band end (corrupt data)")
        coefs(off + Zigzag(k)) = extend(br.receive(sz), sz) << al
        k += 1
      }
    }
    eobrun
  }

  /** AC band, refinement pass (Ah = Al + 1): newly-nonzero coefficients
    * arrive as ±1·2^Al with runs counted over zero-HISTORY positions;
    * every already-nonzero position passed (and, under an EOB run, every
    * remaining one) consumes a correction bit (T.81 G.1.2.3 / figure
    * G.7). Returns the EOB run remaining AFTER this block. */
  private def acRefine(br: BitReader, ac: HuffTable, coefs: Array[Int], off: Int,
                       ss: Int, se: Int, al: Int, eobrun0: Int): Int = {
    val p1 = 1 << al
    val m1 = -p1
    var eobrun = eobrun0
    var k = ss
    def correct(idx: Int): Unit =
      if (br.bit() == 1 && (coefs(idx) & p1) == 0)
        coefs(idx) += (if (coefs(idx) >= 0) p1 else m1)
    if (eobrun == 0) {
      var ended = false
      while (k <= se && !ended) {
        val rs = br.decodeHuff(ac)
        var r = rs >> 4
        val sz = rs & 0xf
        var newVal = 0
        if (sz == 0) {
          if (r != 15) {
            // unlike the first-scan path, the CURRENT block still owes
            // its tail correction bits, so the run is NOT pre-decremented
            // here — the tail sweep below consumes this block's share
            eobrun = (1 << r) + (if (r > 0) br.receive(r) else 0)
            ended = true
          } // r == 15: ZRL — skip 16 zero-history positions below
        } else {
          require(sz == 1,
            "JpegCodec: AC refinement carries size > 1 (corrupt progressive data)")
          newVal = if (br.bit() == 1) p1 else m1
        }
        if (!ended) {
          var advancing = true
          while (k <= se && advancing) {
            val idx = off + Zigzag(k)
            if (coefs(idx) != 0) { correct(idx); k += 1 }
            else {
              r -= 1
              if (r < 0) advancing = false else k += 1
            }
          }
          if (newVal != 0) {
            require(k <= se,
              "JpegCodec: refinement places a coefficient past the band end")
            coefs(off + Zigzag(k)) = newVal
          }
          k += 1
        }
      }
    }
    if (eobrun > 0) {
      // EOB region: the rest of the band still carries correction bits
      // for every already-nonzero coefficient
      while (k <= se) {
        val idx = off + Zigzag(k)
        if (coefs(idx) != 0) correct(idx)
        k += 1
      }
      eobrun - 1
    } else eobrun
  }

  def decode(bytes: Array[Byte]): JpegImage = {
    val h = parse(bytes, headerOnly = false)
    val comps = h.comps
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    // all scans decoded (baseline = exactly one): dequantize + IDCT once
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)
    comps.foreach { c =>
      c.planeW = h.mcusX * 8 * c.h
      c.planeH = h.mcusY * 8 * c.v
      c.plane = new Array[Int](c.planeW * c.planeH)
      val q = h.quant(c.tq)
      var by = 0
      while (by < c.blocksH) {
        var bx = 0
        while (bx < c.blocksW) {
          val off = (by * c.blocksW + bx) * 64
          var i = 0
          while (i < 64) { coef(i) = c.coefs(off + i) * q(i); i += 1 }
          idctInto(coef, tmp, c, bx, by)
          bx += 1
        }
        by += 1
      }
    }
    assemble(h, comps, hMax, vMax)
  }

  /** Separable double IDCT of one dequantized block into the component
    * plane at block position (bxAbs, byAbs). Natural coefficient layout
    * is the spec's row-major (row = VERTICAL frequency v, column =
    * horizontal frequency u): coef(v·8+u) = F(u,v). The final pixel
    * rounding is the codec-wide floor(x+0.5), clamped to [0,255]. */
  private def idctInto(coef: Array[Int], tmp: Array[Double],
                       c: Component, bxAbs: Int, byAbs: Int): Unit = {
    // pass 1 (horizontal): tmp(v·8+x) = Σ_u ct(x)(u) · F(u,v)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += Ct(x)(u) * coef(v * 8 + u); u += 1 }
        tmp(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    val x0 = bxAbs * 8
    val y0 = byAbs * 8
    // pass 2 (vertical): f(x,y) = Σ_v ct(y)(v) · tmp(v·8+x)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) { s += Ct(y)(vv) * tmp(vv * 8 + x); vv += 1 }
        c.plane((y0 + y) * c.planeW + (x0 + x)) = clamp255(rnd(s + 128.0))
        x += 1
      }
      y += 1
    }
  }

  private def assemble(h: Header, comps: Array[Component],
                       hMax: Int, vMax: Int): JpegImage = {
    val n = comps.length
    val out = new Array[Byte](h.width * h.height * n)
    if (n == 1) {
      val c = comps(0)
      var y = 0
      while (y < h.height) {
        var x = 0
        while (x < h.width) {
          out(y * h.width + x) = c.plane(y * c.planeW + x).toByte
          x += 1
        }
        y += 1
      }
    } else if (n == 3) {
      // the Adobe APP14 transform governs 3-component color too: 0 means
      // the planes are ALREADY RGB (Photoshop's save-as-RGB shape) — a
      // YCbCr inverse over them would be silent garbage; 1 or no APP14
      // (JFIF) means YCbCr; 2 (YCCK) is illegal at 3 components
      require(h.adobeTransform != 2,
        "JpegCodec: APP14 declares YCCK (2) on a 3-component file")
      val rgbDirect = h.adobeTransform == 0
      val cy = comps(0); val cb = comps(1); val cr = comps(2)
      var y = 0
      while (y < h.height) {
        var x = 0
        while (x < h.width) {
          val yy = cy.plane((y * cy.v / vMax) * cy.planeW + (x * cy.h / hMax))
          val p1 = cb.plane((y * cb.v / vMax) * cb.planeW + (x * cb.h / hMax))
          val p2 = cr.plane((y * cr.v / vMax) * cr.planeW + (x * cr.h / hMax))
          val o = (y * h.width + x) * 3
          if (rgbDirect) {
            out(o) = yy.toByte; out(o + 1) = p1.toByte; out(o + 2) = p2.toByte
          } else {
            val pb = p1 - 128
            val pr = p2 - 128
            out(o) = clamp255(rnd(yy + 1.402 * pr)).toByte
            out(o + 1) = clamp255(rnd(yy - 0.344136 * pb - 0.714136 * pr)).toByte
            out(o + 2) = clamp255(rnd(yy + 1.772 * pb)).toByte
          }
          x += 1
        }
        y += 1
      }
    } else {
      // Adobe 4-component (sampling validated 1x1 at SOF): a file with
      // no APP14 at all — or one declaring transform 1 (plain YCbCr,
      // meaningless at 4 components) — would decode to channel soup, so
      // the transform gate runs here, after the full marker walk, where
      // an APP14 placed anywhere before SOS has been seen. The stored
      // samples are INVERTED per the Adobe convention, so both paths end
      // with 255 - v; YCCK additionally runs the YCbCr inverse over the
      // first three channels first. Output is TRUE CMYK.
      require(h.adobeTransform == 0 || h.adobeTransform == 2,
        s"JpegCodec: 4-component JPEG needs an Adobe APP14 transform of " +
          s"0 (CMYK) or 2 (YCCK); " +
          (if (h.adobeTransform < 0) "no APP14 marker seen"
           else s"APP14 declares ${h.adobeTransform}"))
      val ycck = h.adobeTransform == 2
      val c0 = comps(0); val c1 = comps(1); val c2 = comps(2); val c3 = comps(3)
      var y = 0
      while (y < h.height) {
        var x = 0
        while (x < h.width) {
          val o = (y * h.width + x) * 4
          val p = y * c0.planeW + x
          val k = c3.plane(y * c3.planeW + x)
          if (ycck) {
            val yy = c0.plane(p)
            val pb = c1.plane(y * c1.planeW + x) - 128
            val pr = c2.plane(y * c2.planeW + x) - 128
            out(o) = (255 - clamp255(rnd(yy + 1.402 * pr))).toByte
            out(o + 1) = (255 - clamp255(rnd(yy - 0.344136 * pb - 0.714136 * pr))).toByte
            out(o + 2) = (255 - clamp255(rnd(yy + 1.772 * pb))).toByte
          } else {
            out(o) = (255 - c0.plane(p)).toByte
            out(o + 1) = (255 - c1.plane(y * c1.planeW + x)).toByte
            out(o + 2) = (255 - c2.plane(y * c2.planeW + x)).toByte
          }
          out(o + 3) = (255 - k).toByte
          x += 1
        }
        y += 1
      }
    }
    JpegImage(h.width, h.height, n, out)
  }

  /** Frame boundaries of a CONCATENATED-JPEG (MJPEG-style) stream: each
    * frame is a complete SOI..EOI file, back to back — the classic
    * motion-JPEG container shape. Returns (start, endExclusive) per
    * frame by a real marker walk (segments skipped by their declared
    * lengths, entropy data scanned for the next true marker — 0xFF
    * followed by anything but 0x00 stuffing or RSTn), so an FF D8 byte
    * pair INSIDE a segment payload or entropy run never false-splits.
    * Truncated or non-JPEG content between frames fails loud. */
  def frameOffsets(bytes: Array[Byte]): Seq[(Int, Int)] = {
    val out = scala.collection.mutable.Buffer.empty[(Int, Int)]
    def u8(i: Int): Int = {
      require(i < bytes.length, "JpegCodec.frameOffsets: truncated stream")
      bytes(i) & 0xff
    }
    var pos = 0
    while (pos < bytes.length) {
      val start = pos
      require(u8(pos) == 0xff && u8(pos + 1) == 0xd8,
        f"JpegCodec.frameOffsets: expected SOI at offset $pos, found " +
          f"0x${u8(pos)}%02X${u8(pos + 1)}%02X")
      pos += 2
      var eoi = false
      while (!eoi) {
        require(u8(pos) == 0xff,
          f"JpegCodec.frameOffsets: expected marker at $pos, found 0x${u8(pos)}%02X")
        var m = u8(pos + 1)
        pos += 2
        while (m == 0xff) { m = u8(pos); pos += 1 } // fill bytes
        m match {
          case 0xd9 => eoi = true
          case 0xd8 => throw new IllegalArgumentException(
            s"JpegCodec.frameOffsets: nested SOI at ${pos - 2}")
          case 0x01 => () // TEM: standalone, no segment
          case r if r >= 0xd0 && r <= 0xd7 => () // RSTn: standalone
          case 0xda =>
            // SOS: skip its header, then scan entropy for the next true
            // marker (FF + not-00/RSTn); continue the loop AT that marker
            pos += ((u8(pos) << 8) | u8(pos + 1))
            var inEntropy = true
            while (inEntropy) {
              if (u8(pos) == 0xff) {
                val nxt = u8(pos + 1)
                if (nxt == 0x00) pos += 2
                else if (nxt >= 0xd0 && nxt <= 0xd7) pos += 2
                else inEntropy = false
              } else pos += 1
            }
          case _ =>
            pos += ((u8(pos) << 8) | u8(pos + 1))
        }
      }
      out += ((start, pos))
    }
    require(out.nonEmpty, "JpegCodec.frameOffsets: empty stream")
    out.toSeq
  }

  // ════════════════════════════════════════════════════════ encoder ══

  /** Annex K table K.1 — luminance quantization (natural order). */
  private val QLumaBase: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Annex K table K.2 — chrominance quantization (natural order). */
  private val QChromaBase: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** The public quality→scale mapping (IJG): 1..100. */
  private[graft] def scaledQuant(base: Array[Int], quality: Int): Array[Int] = {
    require(quality >= 1 && quality <= 100, s"JpegCodec: quality $quality out of [1,100]")
    val scale = if (quality < 50) 5000 / quality else 200 - 2 * quality
    base.map { q =>
      val s = (q * scale + 50) / 100
      if (s < 1) 1 else if (s > 255) 255 else s
    }
  }

  // Annex K Huffman specs: (bits per length 1..16, values)
  private val DcLumaBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = (0 to 11).toArray
  private val DcChromaBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = (0 to 11).toArray
  private val AcLumaBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumaVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)
  private val AcChromaBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromaVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** Canonical encode table: symbol -> (code, length). */
  private def encTable(bits: Array[Int], vals: Array[Int]): Array[(Int, Int)] = {
    val out = new Array[(Int, Int)](256)
    var code = 0; var k = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l - 1)) {
        out(vals(k)) = (code, l)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      l += 1
    }
    out
  }

  private final class BitWriter(out: ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (T.81 F.1.2.3). */
    def flush(): Unit = {
      while (nbits != 0) put(1, 1)
    }
  }

  /** Magnitude category of a DC difference / AC value. */
  @inline private def category(v: Int): Int = {
    var a = if (v < 0) -v else v
    var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** The AC table for PROGRESSIVE scans: the Annex K symbol set PLUS the
    * EOBn run symbols 0x10–0x70 (n = 1..7, EOB runs to 255) the standard
    * tables lack — flat canonical lengths (86×8-bit + 83×9-bit, Kraft sum
    * < 1), since fixture compression ratio is irrelevant but a REAL
    * EOB-run exercises the decoder's eobrun machinery end-to-end. */
  private val AcProgBits = Array(0, 0, 0, 0, 0, 0, 0, 86, 83, 0, 0, 0, 0, 0, 0, 0)
  private val AcProgVals: Array[Int] =
    AcLumaVals ++ Array(0x10, 0x20, 0x30, 0x40, 0x50, 0x60, 0x70)

  /** Encode a real JPEG. `components` = 1 (gray bytes) or 3 (RGB
    * interleaved — converted to YCbCr here). `subsample` = 4:2:0 chroma
    * (2×2 box mean), else 4:4:4. `restartInterval` > 0 writes DRI + RSTn
    * markers — every that many MCUs in interleaved scans, every that
    * many BLOCKS in progressive non-interleaved AC scans (pending EOB
    * runs flush before each marker). `progressive` writes
    * a SOF2 file with the full successive-approximation scan script —
    * DC first at Al=1, DC refinement, then per component an AC
    * spectral-selection first pass at Al=1 and an AC refinement pass —
    * so every progressive decode path (band scans, point transforms,
    * EOB runs, correction bits) is exercised by real bytes. The
    * transmitted coefficients are IDENTICAL to the baseline encoding's
    * (successive approximation is exact reconstruction), so
    * decode(progressive) == decode(baseline) pixel-for-pixel. The
    * output is a conforming JFIF file any standard decoder opens.
    * `components = 4` writes an Adobe print-style file: `pixels` is TRUE
    * CMYK interleaved, stored INVERTED per the Adobe convention under an
    * APP14 marker whose transform is `adobeTransform` — 0 (direct CMYK
    * planes) or 2 (YCCK: YCbCr forward over the inverted CMY); baseline,
    * 1x1 sampling, all planes on the luma quant table (so the flat-block
    * determinism contract holds per channel). */
  def encode(width: Int, height: Int, components: Int, pixels: Array[Byte],
             quality: Int = 90, subsample: Boolean = false,
             restartInterval: Int = 0, progressive: Boolean = false,
             adobeTransform: Int = -1): Array[Byte] = {
    require(components == 1 || components == 3 || components == 4,
      s"JpegCodec: encode components must be 1, 3 or 4, got $components")
    if (components == 4) {
      require(adobeTransform == 0 || adobeTransform == 2,
        s"JpegCodec: 4-component encode needs adobeTransform 0 (CMYK) or 2 (YCCK)")
      require(!subsample && !progressive,
        "JpegCodec: CMYK/YCCK encode is baseline 1x1 only")
    } else require(adobeTransform == -1,
      "JpegCodec: adobeTransform only applies to 4-component encode")
    require(width > 0 && height > 0, "JpegCodec: empty image")
    // SOF0 carries 16-bit dimensions: anything larger would silently
    // truncate through w16 and write a corrupt-but-valid-looking file
    require(width <= 0xffff && height <= 0xffff,
      s"JpegCodec: ${width}x$height exceeds JPEG's 65535 dimension limit")
    require(pixels.length.toLong == width.toLong * height * components,
      s"JpegCodec: pixel buffer ${pixels.length} != $width*$height*$components")
    val qLuma = scaledQuant(QLumaBase, quality)
    val qChroma = scaledQuant(QChromaBase, quality)

    // color transform into per-component planes (full resolution)
    val yPlane = if (components == 4) null else new Array[Int](width * height)
    val bPlane = if (components == 3) new Array[Int](width * height) else null
    val rPlane = if (components == 3) new Array[Int](width * height) else null
    if (components != 4) {
      var i = 0
      var p = 0
      while (i < width * height) {
        if (components == 1) yPlane(i) = pixels(i) & 0xff
        else {
          val r = pixels(p) & 0xff; val g = pixels(p + 1) & 0xff; val b = pixels(p + 2) & 0xff
          yPlane(i) = clamp255(rnd(0.299 * r + 0.587 * g + 0.114 * b))
          bPlane(i) = clamp255(rnd(128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b))
          rPlane(i) = clamp255(rnd(128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b))
          p += 3
        }
        i += 1
      }
    }
    // Adobe 4-component planes: values stored INVERTED (255 - v); YCCK
    // runs the YCbCr forward transform over the inverted CMY triple
    val planes4: Array[Array[Int]] =
      if (components != 4) null
      else {
        val ps = Array.fill(4)(new Array[Int](width * height))
        var i = 0
        while (i < width * height) {
          val c = 255 - (pixels(4 * i) & 0xff)
          val m = 255 - (pixels(4 * i + 1) & 0xff)
          val yl = 255 - (pixels(4 * i + 2) & 0xff)
          if (adobeTransform == 0) { ps(0)(i) = c; ps(1)(i) = m; ps(2)(i) = yl }
          else {
            ps(0)(i) = clamp255(rnd(0.299 * c + 0.587 * m + 0.114 * yl))
            ps(1)(i) = clamp255(rnd(128.0 - 0.168735892 * c - 0.331264108 * m + 0.5 * yl))
            ps(2)(i) = clamp255(rnd(128.0 + 0.5 * c - 0.418687589 * m - 0.081312411 * yl))
          }
          ps(3)(i) = 255 - (pixels(4 * i + 3) & 0xff)
          i += 1
        }
        ps
      }

    val sub = components == 3 && subsample
    val hMax = if (sub) 2 else 1
    val vMax = if (sub) 2 else 1
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)

    /** Pad `plane` (w×h) to tw×th by edge replication. */
    def pad(plane: Array[Int], w: Int, h: Int, tw: Int, th: Int): Array[Int] = {
      val out = new Array[Int](tw * th)
      var y = 0
      while (y < th) {
        val sy = if (y < h) y else h - 1
        var x = 0
        while (x < tw) {
          out(y * tw + x) = plane(sy * w + (if (x < w) x else w - 1))
          x += 1
        }
        y += 1
      }
      out
    }

    /** 2×2 box-subsample (chroma, 4:2:0), edge clamped. */
    def half(plane: Array[Int], w: Int, h: Int): (Array[Int], Int, Int) = {
      val hw = (w + 1) / 2; val hh = (h + 1) / 2
      val out = new Array[Int](hw * hh)
      var y = 0
      while (y < hh) {
        var x = 0
        while (x < hw) {
          val x0 = 2 * x; val y0 = 2 * y
          val x1 = math.min(x0 + 1, w - 1); val y1 = math.min(y0 + 1, h - 1)
          val s = plane(y0 * w + x0) + plane(y0 * w + x1) +
            plane(y1 * w + x0) + plane(y1 * w + x1)
          out(y * hw + x) = rnd(s / 4.0)
          x += 1
        }
        y += 1
      }
      (out, hw, hh)
    }

    // (plane padded to its block grid, h, v, planeW, quant; fullW/fullH
    // are the UNPADDED component dims — progressive non-interleaved
    // scans transmit only ceil(full/8) blocks, no MCU padding)
    final case class Enc(plane: Array[Int], h: Int, v: Int, planeW: Int,
                         quant: Array[Int], chroma: Boolean,
                         fullW: Int, fullH: Int) {
      var pred = 0
      val blocksW: Int = planeW / 8
      var blocksH: Int = 0 // set after construction (planeH / 8)
      var coefs: Array[Int] = _
      def compBlocksW: Int = (fullW + 7) / 8
      def compBlocksH: Int = (fullH + 7) / 8
    }
    val encs: Array[Enc] =
      if (components == 1)
        Array(Enc(pad(yPlane, width, height, mcusX * 8, mcusY * 8),
          1, 1, mcusX * 8, qLuma, chroma = false, width, height))
      else if (components == 4)
        planes4.map(pl => Enc(pad(pl, width, height, mcusX * 8, mcusY * 8),
          1, 1, mcusX * 8, qLuma, chroma = false, width, height))
      else if (!sub) Array(
        Enc(pad(yPlane, width, height, mcusX * 8, mcusY * 8), 1, 1, mcusX * 8,
          qLuma, false, width, height),
        Enc(pad(bPlane, width, height, mcusX * 8, mcusY * 8), 1, 1, mcusX * 8,
          qChroma, true, width, height),
        Enc(pad(rPlane, width, height, mcusX * 8, mcusY * 8), 1, 1, mcusX * 8,
          qChroma, true, width, height))
      else {
        val (bH, bw, bh) = half(bPlane, width, height)
        val (rH, _, _) = half(rPlane, width, height)
        Array(
          Enc(pad(yPlane, width, height, mcusX * 16, mcusY * 16), 2, 2, mcusX * 16,
            qLuma, false, width, height),
          Enc(pad(bH, bw, bh, mcusX * 8, mcusY * 8), 1, 1, mcusX * 8, qChroma, true, bw, bh),
          Enc(pad(rH, bw, bh, mcusX * 8, mcusY * 8), 1, 1, mcusX * 8, qChroma, true, bw, bh))
      }
    encs.foreach { e => e.blocksH = e.plane.length / e.planeW / 8 }

    val out = new ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
    def marker(m: Int): Unit = { w8(0xff); w8(m) }

    marker(0xd8) // SOI
    // APP0 JFIF
    marker(0xe0); w16(16)
    out.write("JFIF".getBytes("US-ASCII")); w8(0)
    w8(1); w8(1) // version 1.1
    w8(0); w16(1); w16(1) // no density
    w8(0); w8(0) // no thumbnail
    // APP14: the Adobe transform code the 4-component decode keys off
    if (components == 4) {
      marker(0xee); w16(14)
      out.write("Adobe".getBytes("US-ASCII"))
      w16(0x0065); w16(0); w16(0); w8(adobeTransform)
    }
    // DQT
    def dqt(id: Int, q: Array[Int]): Unit = {
      marker(0xdb); w16(67); w8(id)
      var k = 0
      while (k < 64) { w8(q(Zigzag(k))); k += 1 }
    }
    dqt(0, qLuma)
    if (components == 3) dqt(1, qChroma)
    // SOF0 / SOF2
    marker(if (progressive) 0xc2 else 0xc0); w16(8 + 3 * components); w8(8)
    w16(height); w16(width); w8(components)
    var ci = 0
    while (ci < components) {
      w8(ci + 1)
      w8((encs(ci).h << 4) | encs(ci).v)
      w8(if (encs(ci).chroma) 1 else 0)
      ci += 1
    }
    // DHT — progressive scans use the EOBn-capable AC table
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); w16(19 + vals.length); w8((tc << 4) | th)
      bits.foreach(w8); vals.foreach(w8)
    }
    dht(0, 0, DcLumaBits, DcLumaVals)
    dht(1, 0, if (progressive) AcProgBits else AcLumaBits,
      if (progressive) AcProgVals else AcLumaVals)
    if (components == 3) {
      dht(0, 1, DcChromaBits, DcChromaVals)
      dht(1, 1, if (progressive) AcProgBits else AcChromaBits,
        if (progressive) AcProgVals else AcChromaVals)
    }
    if (restartInterval > 0) { marker(0xdd); w16(4); w16(restartInterval) }

    // ── phase 1: quantized coefficients for every block of every comp ──
    val block = new Array[Double](64)
    val t = new Array[Double](64)
    encs.foreach { e =>
      e.coefs = new Array[Int](e.blocksW * e.blocksH * 64)
      var byA = 0
      while (byA < e.blocksH) {
        var bxA = 0
        while (bxA < e.blocksW) {
          val x0 = bxA * 8; val y0 = byA * 8
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              block(y * 8 + x) = e.plane((y0 + y) * e.planeW + (x0 + x)) - 128.0
              x += 1
            }
            y += 1
          }
          // FDCT: F(u,v) = Σ ct(x)(u)·ct(y)(v)·f(x,y), separable; natural
          // layout coef(v·8+u) — the IDCT's mirror
          var v = 0
          while (v < 8) {
            var x = 0
            while (x < 8) {
              var s = 0.0
              var y2 = 0
              while (y2 < 8) { s += Ct(y2)(v) * block(y2 * 8 + x); y2 += 1 }
              t(v * 8 + x) = s
              x += 1
            }
            v += 1
          }
          val off = (byA * e.blocksW + bxA) * 64
          var v2 = 0
          while (v2 < 8) {
            var u = 0
            while (u < 8) {
              var s = 0.0
              var x2 = 0
              while (x2 < 8) { s += Ct(x2)(u) * t(v2 * 8 + x2); x2 += 1 }
              e.coefs(off + v2 * 8 + u) = rnd(s / e.quant(v2 * 8 + u))
              u += 1
            }
            v2 += 1
          }
          bxA += 1
        }
        byA += 1
      }
    }

    // ── phase 2: entropy emission ──────────────────────────────────────
    val dcLuma = encTable(DcLumaBits, DcLumaVals)
    val dcChroma = encTable(DcChromaBits, DcChromaVals)
    val acLuma = encTable(if (progressive) AcProgBits else AcLumaBits,
      if (progressive) AcProgVals else AcLumaVals)
    val acChroma =
      if (components == 3)
        encTable(if (progressive) AcProgBits else AcChromaBits,
          if (progressive) AcProgVals else AcChromaVals)
      else acLuma
    def dcT(e: Enc) = if (e.chroma) dcChroma else dcLuma
    def acT(e: Enc) = if (e.chroma) acChroma else acLuma

    def writeSos(scanEncs: Seq[Int], ss: Int, se: Int, ah: Int, al: Int): Unit = {
      marker(0xda); w16(6 + 2 * scanEncs.length); w8(scanEncs.length)
      scanEncs.foreach { i =>
        w8(i + 1); w8(if (encs(i).chroma) 0x11 else 0x00)
      }
      w8(ss); w8(se); w8((ah << 4) | al)
    }

    if (!progressive) {
      writeSos(encs.indices, 0, 63, 0, 0)
      val bw = new BitWriter(out)
      def emitBaselineBlock(e: Enc, off: Int): Unit = {
        val dc = dcT(e); val ac = acT(e)
        val diff = e.coefs(off) - e.pred
        e.pred = e.coefs(off)
        val s0 = category(diff)
        val (c0, l0) = dc(s0)
        bw.put(c0, l0)
        if (s0 > 0) bw.put(if (diff < 0) diff + (1 << s0) - 1 else diff, s0)
        var run = 0
        var k = 1
        while (k < 64) {
          val av = e.coefs(off + Zigzag(k))
          if (av == 0) run += 1
          else {
            while (run >= 16) { val (cz, lz) = ac(0xf0); bw.put(cz, lz); run -= 16 }
            val sz = category(av)
            val (ca, la) = ac((run << 4) | sz)
            bw.put(ca, la)
            bw.put(if (av < 0) av + (1 << sz) - 1 else av, sz)
            run = 0
          }
          k += 1
        }
        if (run > 0) { val (ce, le) = ac(0x00); bw.put(ce, le) }
      }
      var rstIdx = 0
      var sinceRestart = 0
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          if (restartInterval > 0 && sinceRestart == restartInterval) {
            bw.flush()
            marker(0xd0 + rstIdx)
            rstIdx = (rstIdx + 1) % 8
            sinceRestart = 0
            encs.foreach(_.pred = 0)
          }
          encs.foreach { e =>
            var by = 0
            while (by < e.v) {
              var bx = 0
              while (bx < e.h) {
                emitBaselineBlock(e, (((my * e.v + by) * e.blocksW) + mx * e.h + bx) * 64)
                bx += 1
              }
              by += 1
            }
          }
          sinceRestart += 1
          mx += 1
        }
        my += 1
      }
      bw.flush()
    } else {
      // scan script: DC first (Al=1) → DC refine → per comp AC first
      // (1..63, Al=1) → per comp AC refine (Ah=1, Al=0). DRI applies to
      // EVERY scan: interleaved DC scans restart per MCU, non-interleaved
      // AC scans per block (T.81 — the decoder's maybeRestart mirror).
      /** Per-scan restart emitter: run `pre` (flush any pending EOB run
        * so the marker never splits one), byte-align, write RSTn, run
        * `reset`. */
      final class Restarter(bw: BitWriter, pre: () => Unit, reset: () => Unit) {
        private var rstIdx = 0
        private var since = 0
        def atUnitStart(): Unit = {
          if (restartInterval > 0 && since == restartInterval) {
            pre()
            bw.flush()
            marker(0xd0 + rstIdx)
            rstIdx = (rstIdx + 1) % 8
            since = 0
            reset()
          }
          since += 1
        }
      }
      def mcuLoop(onMcuStart: () => Unit)(body: (Enc, Int) => Unit): Unit = {
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            onMcuStart()
            encs.foreach { e =>
              var by = 0
              while (by < e.v) {
                var bx = 0
                while (bx < e.h) {
                  body(e, (((my * e.v + by) * e.blocksW) + mx * e.h + bx) * 64)
                  bx += 1
                }
                by += 1
              }
            }
            mx += 1
          }
          my += 1
        }
      }
      // scan 1: DC first, point transform Al=1 (arithmetic shift)
      writeSos(encs.indices, 0, 0, 0, 1)
      locally {
        val bw = new BitWriter(out)
        encs.foreach(_.pred = 0)
        val rst = new Restarter(bw, () => (), () => encs.foreach(_.pred = 0))
        mcuLoop(() => rst.atUnitStart()) { (e, off) =>
          val tv = e.coefs(off) >> 1
          val diff = tv - e.pred
          e.pred = tv
          val s0 = category(diff)
          val (c0, l0) = dcT(e)(s0)
          bw.put(c0, l0)
          if (s0 > 0) bw.put(if (diff < 0) diff + (1 << s0) - 1 else diff, s0)
        }
        bw.flush()
      }
      // scan 2: DC refinement — the Al=0 bit of every DC, MCU order
      writeSos(encs.indices, 0, 0, 1, 0)
      locally {
        val bw = new BitWriter(out)
        val rst = new Restarter(bw, () => (), () => ())
        mcuLoop(() => rst.atUnitStart()) { (e, off) => bw.put(e.coefs(off) & 1, 1) }
        bw.flush()
      }
      // scans 3..: per component AC band, first then refinement — both
      // over the component's own ceil-block grid (no MCU padding)
      encs.indices.foreach { i =>
        val e = encs(i)
        val ac = acT(e)
        // AC first pass, Al = 1: magnitude-truncated coefficients with
        // zero runs, ZRL and accumulated EOB runs
        writeSos(Seq(i), 1, 63, 0, 1)
        locally {
          val bw = new BitWriter(out)
          var eobrun = 0
          def emitEobrun(): Unit = if (eobrun > 0) {
            val n = 31 - Integer.numberOfLeadingZeros(eobrun)
            val (ce, le) = ac(n << 4)
            bw.put(ce, le)
            if (n > 0) bw.put(eobrun - (1 << n), n)
            eobrun = 0
          }
          val rst = new Restarter(bw, () => emitEobrun(), () => ())
          var by = 0
          while (by < e.compBlocksH) {
            var bx = 0
            while (bx < e.compBlocksW) {
              rst.atUnitStart() // non-interleaved scans restart per block
              val off = (by * e.blocksW + bx) * 64
              var r = 0
              var k = 1
              while (k < 64) {
                val v0 = e.coefs(off + Zigzag(k))
                val tv = if (v0 >= 0) v0 >> 1 else -((-v0) >> 1)
                if (tv == 0) r += 1
                else {
                  emitEobrun()
                  while (r > 15) { val (cz, lz) = ac(0xf0); bw.put(cz, lz); r -= 16 }
                  val sz = category(tv)
                  val (ca, la) = ac((r << 4) | sz)
                  bw.put(ca, la)
                  bw.put(if (tv < 0) tv + (1 << sz) - 1 else tv, sz)
                  r = 0
                }
                k += 1
              }
              if (r > 0) { eobrun += 1; if (eobrun == 255) emitEobrun() }
              bx += 1
            }
            by += 1
          }
          emitEobrun()
          bw.flush()
        }
        // AC refinement pass, Ah = 1 → Al = 0: newly-nonzero coefficients
        // as runs over zero-HISTORY positions; correction bits for
        // already-nonzero positions buffer until the next symbol (or the
        // EOB run that carries them) — T.81 G.1.2.3's encoder side
        writeSos(Seq(i), 1, 63, 1, 0)
        locally {
          val bw = new BitWriter(out)
          var eobrun = 0
          // TWO correction-bit buffers (the jcphuff BE/BR split, from the
          // decoder's consumption order): bits owed to already-EOB'd
          // blocks ride the EOBn symbol (their tail sweeps consume them
          // right after it); the CURRENT block's bits since the last
          // symbol ride that next symbol (its advance consumes them)
          val pendingEob = scala.collection.mutable.ArrayBuffer.empty[Int]
          val pendingCur = scala.collection.mutable.ArrayBuffer.empty[Int]
          def flushCur(): Unit = { pendingCur.foreach(b => bw.put(b, 1)); pendingCur.clear() }
          def emitEobrun(): Unit = if (eobrun > 0) {
            val n = 31 - Integer.numberOfLeadingZeros(eobrun)
            val (ce, le) = ac(n << 4)
            bw.put(ce, le)
            if (n > 0) bw.put(eobrun - (1 << n), n)
            eobrun = 0
            pendingEob.foreach(b => bw.put(b, 1)); pendingEob.clear()
          }
          val rst = new Restarter(bw, () => emitEobrun(), () => ())
          var by = 0
          while (by < e.compBlocksH) {
            var bx = 0
            while (bx < e.compBlocksW) {
              rst.atUnitStart() // per block; emitEobrun flushes run + bits first
              val off = (by * e.blocksW + bx) * 64
              // last newly-nonzero position: zeros beyond it fold into EOB
              var lastNew = 0
              var k = 1
              while (k < 64) {
                val a = math.abs(e.coefs(off + Zigzag(k)))
                if (a == 1) lastNew = k
                k += 1
              }
              var r = 0
              k = 1
              while (k < 64) {
                val v0 = e.coefs(off + Zigzag(k))
                val a = math.abs(v0)
                if (a == 0) r += 1
                else {
                  // ZRLs flush at ANY nonzero once r > 15 — but never for
                  // zeros beyond the last newly-nonzero (those are EOB's)
                  while (r > 15 && k <= lastNew) {
                    emitEobrun()
                    val (cz, lz) = ac(0xf0)
                    bw.put(cz, lz)
                    flushCur()
                    r -= 16
                  }
                  if (a > 1) pendingCur += (a & 1)
                  else {
                    emitEobrun()
                    val (ca, la) = ac((r << 4) | 1)
                    bw.put(ca, la)
                    bw.put(if (v0 > 0) 1 else 0, 1)
                    flushCur()
                    r = 0
                  }
                }
                k += 1
              }
              if (r > 0 || pendingCur.nonEmpty) {
                eobrun += 1
                pendingEob ++= pendingCur
                pendingCur.clear()
                if (eobrun == 255) emitEobrun()
              }
              bx += 1
            }
            by += 1
          }
          emitEobrun()
          bw.flush()
        }
      }
    }
    marker(0xd9) // EOI
    out.toByteArray
  }
}
