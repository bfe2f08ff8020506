package graft.multimodal

import java.io.ByteArrayOutputStream

/** A real baseline JPEG codec (ITU-T T.81 / ISO 10918-1, baseline
  * sequential DCT, Huffman entropy coding) — the second real image leg
  * of the multimodal pipeline. PNG covered the lossless corpora; real
  * image corpora are overwhelmingly JPEG, and the reference decodes its
  * media format for real (PDFBox, BlobUploadDetector/.../
  * Function.java:90-132), so the JPEG leg gets the same treatment:
  * marker parse → DQT/DHT/SOF0/SOS → Huffman decode → dequantize →
  * IDCT → chroma upsample → YCbCr→RGB.
  *
  * Scope (fail-loud beyond it, never silent garbage):
  *  - SOF0 baseline sequential only: progressive (SOF2), extended
  *    sequential (SOF1), lossless, hierarchical and ARITHMETIC coding
  *    all reject with the marker named
  *  - 8-bit precision; 1 (grayscale) or 3 (YCbCr) components — CMYK/
  *    Adobe 4-component rejects
  *  - sampling factors 1 or 2 per axis (4:4:4, 4:2:2, 4:4:0, 4:2:0);
  *    chroma upsamples by sample replication
  *  - restart markers (DRI/RSTn) honored, including the DC-predictor
  *    reset and expected-index check
  *  - a single interleaved scan covering all components (the baseline
  *    layout every mainstream encoder writes)
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
    * (gray) or 3 (RGB — the YCbCr→RGB transform already applied). */
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
  }

  /** Header-only geometry: (width, height, components) from SOF0 without
    * decoding the scan — the cheap feature-extraction path. */
  def dimensions(bytes: Array[Byte]): (Int, Int, Int) = {
    val hdr = parseUpTo(bytes, stopAtSos = true)
    (hdr.width, hdr.height, hdr.comps.length)
  }

  private final class Header {
    var width = 0
    var height = 0
    var comps: Array[Component] = Array.empty
    val quant = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var restartInterval = 0
    var sosAt = -1 // position of the first entropy byte
    var scanOrder: Array[Component] = Array.empty
  }

  private def parseUpTo(bytes: Array[Byte], stopAtSos: Boolean): Header = {
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
      while (marker == 0xff) { marker = u8(pos); pos += 1 } // fill bytes
      marker match {
        case 0xd8 => // stray SOI
          throw new IllegalArgumentException("JpegCodec: unexpected second SOI")
        case 0xd9 =>
          throw new IllegalArgumentException("JpegCodec: EOI before any scan data")
        case 0xc0 => // SOF0 baseline
          val len = u16(pos)
          val prec = u8(pos + 2)
          require(prec == 8, s"JpegCodec: precision $prec unsupported (8-bit baseline only)")
          h.height = u16(pos + 3)
          h.width = u16(pos + 5)
          require(h.width > 0 && h.height > 0, "JpegCodec: zero dimension in SOF0")
          val nc = u8(pos + 7)
          require(nc == 1 || nc == 3,
            s"JpegCodec: $nc components unsupported (1 = gray, 3 = YCbCr; CMYK out of scope)")
          h.comps = Array.tabulate(nc) { i =>
            val o = pos + 8 + 3 * i
            val hv = u8(o + 1)
            val c = Component(u8(o), hv >> 4, hv & 0xf, u8(o + 2))
            require(c.h >= 1 && c.h <= 2 && c.v >= 1 && c.v <= 2,
              s"JpegCodec: sampling ${c.h}x${c.v} unsupported (factors 1 or 2)")
            require(c.tq <= 3,
              s"JpegCodec: SOF0 component ${c.id} names quant table ${c.tq} (0-3)")
            c
          }
          if (nc == 1) require(h.comps(0).h == 1 && h.comps(0).v == 1,
            "JpegCodec: grayscale with sampling > 1 unsupported")
          require(len == 8 + 3 * nc, "JpegCodec: malformed SOF0 length")
          sofSeen = true
          pos += len
        case 0xc2 => throw new IllegalArgumentException(
          "JpegCodec: progressive JPEG (SOF2) unsupported — baseline sequential only")
        case 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xcd | 0xce | 0xcf =>
          throw new IllegalArgumentException(
            f"JpegCodec: SOF marker 0xFF${marker}%02X unsupported — baseline sequential (SOF0) only")
        case 0xc9 | 0xca | 0xcb => throw new IllegalArgumentException(
          "JpegCodec: arithmetic-coded JPEG unsupported — Huffman baseline only")
        case 0xc4 => // DHT (may hold several tables)
          val len = u16(pos)
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
          val len = u16(pos)
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
          require(u16(pos) == 4, "JpegCodec: malformed DRI")
          h.restartInterval = u16(pos + 2)
          pos += 4
        case 0xda => // SOS
          require(sofSeen, "JpegCodec: SOS before SOF0")
          val len = u16(pos)
          val ns = u8(pos + 2)
          require(ns == h.comps.length,
            s"JpegCodec: scan covers $ns of ${h.comps.length} components — " +
              "multi-scan (non-interleaved) files unsupported")
          h.scanOrder = Array.tabulate(ns) { i =>
            val cid = u8(pos + 3 + 2 * i)
            val tables = u8(pos + 4 + 2 * i)
            val c = h.comps.find(_.id == cid).getOrElse(
              throw new IllegalArgumentException(s"JpegCodec: SOS names unknown component $cid"))
            require((tables >> 4) <= 3 && (tables & 0xf) <= 3,
              s"JpegCodec: SOS component $cid names Huffman table ${tables >> 4}/" +
                s"${tables & 0xf} (0-3)")
            c.dcTable = h.dcTables(tables >> 4)
            c.acTable = h.acTables(tables & 0xf)
            require(c.dcTable != null && c.acTable != null,
              s"JpegCodec: scan references undefined Huffman table (component $cid)")
            require(h.quant(c.tq) != null,
              s"JpegCodec: component $cid references undefined quant table ${c.tq}")
            c
          }
          // Ss/Se/Ah/Al must be the baseline 0/63/0/0
          require(u8(pos + 3 + 2 * ns) == 0 && u8(pos + 4 + 2 * ns) == 63 &&
            u8(pos + 5 + 2 * ns) == 0,
            "JpegCodec: non-baseline spectral selection in SOS")
          h.sosAt = pos + len
          done = true
        case m if m >= 0xe0 && m <= 0xef => pos += u16(pos) // APPn
        case 0xfe => pos += u16(pos) // COM
        case other => throw new IllegalArgumentException(
          f"JpegCodec: unsupported marker 0xFF$other%02X")
      }
      // header-only callers stop right after SOF0 — geometry is known,
      // the scan never gets decoded
      if (stopAtSos && sofSeen) done = true
    }
    require(h.sosAt >= 0 || stopAtSos, "JpegCodec: no SOS")
    h
  }

  def decode(bytes: Array[Byte]): JpegImage = {
    val h = parseUpTo(bytes, stopAtSos = false)
    val comps = h.comps
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (h.width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h.height + 8 * vMax - 1) / (8 * vMax)
    comps.foreach { c =>
      c.planeW = mcusX * 8 * c.h
      c.planeH = mcusY * 8 * c.v
      c.plane = new Array[Int](c.planeW * c.planeH)
      c.pred = 0
    }
    val br = new BitReader(bytes, h.sosAt)
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)
    var rstIdx = 0
    var mcusSinceRestart = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (h.restartInterval > 0 && mcusSinceRestart == h.restartInterval) {
          br.restart(rstIdx)
          rstIdx = (rstIdx + 1) % 8
          mcusSinceRestart = 0
          comps.foreach(_.pred = 0)
        }
        var ci = 0
        while (ci < h.scanOrder.length) {
          val c = h.scanOrder(ci)
          val q = h.quant(c.tq)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              java.util.Arrays.fill(coef, 0)
              // DC
              val s = br.decodeHuff(c.dcTable)
              require(s <= 11, "JpegCodec: DC category > 11 (corrupt data)")
              c.pred += extend(br.receive(s), s)
              coef(0) = c.pred * q(0)
              // AC
              var k = 1
              var eob = false
              while (k < 64 && !eob) {
                val rs = br.decodeHuff(c.acTable)
                val r = rs >> 4; val sz = rs & 0xf
                if (sz == 0) {
                  if (r == 15) k += 16 // ZRL
                  else eob = true
                } else {
                  k += r
                  require(k < 64, "JpegCodec: AC run past block end (corrupt data)")
                  val nat = Zigzag(k)
                  coef(nat) = extend(br.receive(sz), sz) * q(nat)
                  k += 1
                }
              }
              idctInto(coef, tmp, c, mx * c.h + bx, my * c.v + by)
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcusSinceRestart += 1
        mx += 1
      }
      my += 1
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
    } else {
      val cy = comps(0); val cb = comps(1); val cr = comps(2)
      var y = 0
      while (y < h.height) {
        var x = 0
        while (x < h.width) {
          val yy = cy.plane((y * cy.v / vMax) * cy.planeW + (x * cy.h / hMax))
          val pb = cb.plane((y * cb.v / vMax) * cb.planeW + (x * cb.h / hMax)) - 128
          val pr = cr.plane((y * cr.v / vMax) * cr.planeW + (x * cr.h / hMax)) - 128
          val o = (y * h.width + x) * 3
          out(o) = clamp255(rnd(yy + 1.402 * pr)).toByte
          out(o + 1) = clamp255(rnd(yy - 0.344136 * pb - 0.714136 * pr)).toByte
          out(o + 2) = clamp255(rnd(yy + 1.772 * pb)).toByte
          x += 1
        }
        y += 1
      }
    }
    JpegImage(h.width, h.height, n, out)
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

  /** Encode a real baseline JPEG. `components` = 1 (gray bytes) or 3
    * (RGB interleaved — converted to YCbCr here). `subsample` = 4:2:0
    * chroma (2×2 box mean), else 4:4:4. `restartInterval` > 0 writes
    * DRI + RSTn markers every that many MCUs. The output is a
    * conforming JFIF file any standard decoder opens. */
  def encode(width: Int, height: Int, components: Int, pixels: Array[Byte],
             quality: Int = 90, subsample: Boolean = false,
             restartInterval: Int = 0): Array[Byte] = {
    require(components == 1 || components == 3,
      s"JpegCodec: encode components must be 1 or 3, got $components")
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
    val yPlane = new Array[Int](width * height)
    val bPlane = if (components == 3) new Array[Int](width * height) else null
    val rPlane = if (components == 3) new Array[Int](width * height) else null
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

    // (plane padded to its block grid, h, v, planeW, quant)
    final case class Enc(plane: Array[Int], h: Int, v: Int, planeW: Int,
                         quant: Array[Int], chroma: Boolean) {
      var pred = 0
    }
    val encs: Array[Enc] =
      if (components == 1)
        Array(Enc(pad(yPlane, width, height, mcusX * 8, mcusY * 8),
          1, 1, mcusX * 8, qLuma, chroma = false))
      else if (!sub) Array(
        Enc(pad(yPlane, width, height, mcusX * 8, mcusY * 8), 1, 1, mcusX * 8, qLuma, false),
        Enc(pad(bPlane, width, height, mcusX * 8, mcusY * 8), 1, 1, mcusX * 8, qChroma, true),
        Enc(pad(rPlane, width, height, mcusX * 8, mcusY * 8), 1, 1, mcusX * 8, qChroma, true))
      else {
        val (bH, bw, bh) = half(bPlane, width, height)
        val (rH, _, _) = half(rPlane, width, height)
        Array(
          Enc(pad(yPlane, width, height, mcusX * 16, mcusY * 16), 2, 2, mcusX * 16, qLuma, false),
          Enc(pad(bH, bw, bh, mcusX * 8, mcusY * 8), 1, 1, mcusX * 8, qChroma, true),
          Enc(pad(rH, bw, bh, mcusX * 8, mcusY * 8), 1, 1, mcusX * 8, qChroma, true))
      }

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
    // DQT
    def dqt(id: Int, q: Array[Int]): Unit = {
      marker(0xdb); w16(67); w8(id)
      var k = 0
      while (k < 64) { w8(q(Zigzag(k))); k += 1 }
    }
    dqt(0, qLuma)
    if (components == 3) dqt(1, qChroma)
    // SOF0
    marker(0xc0); w16(8 + 3 * components); w8(8)
    w16(height); w16(width); w8(components)
    var ci = 0
    while (ci < components) {
      w8(ci + 1)
      w8((encs(ci).h << 4) | encs(ci).v)
      w8(if (encs(ci).chroma) 1 else 0)
      ci += 1
    }
    // DHT
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); w16(19 + vals.length); w8((tc << 4) | th)
      bits.foreach(w8); vals.foreach(w8)
    }
    dht(0, 0, DcLumaBits, DcLumaVals)
    dht(1, 0, AcLumaBits, AcLumaVals)
    if (components == 3) {
      dht(0, 1, DcChromaBits, DcChromaVals)
      dht(1, 1, AcChromaBits, AcChromaVals)
    }
    if (restartInterval > 0) { marker(0xdd); w16(4); w16(restartInterval) }
    // SOS
    marker(0xda); w16(6 + 2 * components); w8(components)
    ci = 0
    while (ci < components) {
      w8(ci + 1); w8(if (encs(ci).chroma) 0x11 else 0x00)
      ci += 1
    }
    w8(0); w8(63); w8(0)

    val dcLuma = encTable(DcLumaBits, DcLumaVals)
    val acLuma = encTable(AcLumaBits, AcLumaVals)
    val dcChroma = encTable(DcChromaBits, DcChromaVals)
    val acChroma = encTable(AcChromaBits, AcChromaVals)
    val bw = new BitWriter(out)
    val block = new Array[Double](64)
    val coef = new Array[Int](64)

    def encodeBlock(e: Enc, bxAbs: Int, byAbs: Int): Unit = {
      val x0 = bxAbs * 8; val y0 = byAbs * 8
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          block(y * 8 + x) = e.plane((y0 + y) * e.planeW + (x0 + x)) - 128.0
          x += 1
        }
        y += 1
      }
      // FDCT: F(u,v) = Σ ct(x)(u)·ct(y)(v)·f(x,y), separable; coef uses
      // the spec's natural layout coef(v·8+u) — the IDCT's mirror
      val t = new Array[Double](64)
      // pass 1 (vertical): t(v·8+x) = Σ_y ct(y)(v) · f(x,y)
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
      // pass 2 (horizontal) + quantize
      var v2 = 0
      while (v2 < 8) {
        var u = 0
        while (u < 8) {
          var s = 0.0
          var x2 = 0
          while (x2 < 8) { s += Ct(x2)(u) * t(v2 * 8 + x2); x2 += 1 }
          coef(v2 * 8 + u) = rnd(s / e.quant(v2 * 8 + u))
          u += 1
        }
        v2 += 1
      }
      val (dcT, acT) = if (e.chroma) (dcChroma, acChroma) else (dcLuma, acLuma)
      // DC
      val diff = coef(0) - e.pred
      e.pred = coef(0)
      val s0 = category(diff)
      val (c0, l0) = dcT(s0)
      bw.put(c0, l0)
      if (s0 > 0) bw.put(if (diff < 0) diff + (1 << s0) - 1 else diff, s0)
      // AC
      var run = 0
      var k = 1
      while (k < 64) {
        val av = coef(Zigzag(k))
        if (av == 0) run += 1
        else {
          while (run >= 16) { val (cz, lz) = acT(0xf0); bw.put(cz, lz); run -= 16 }
          val sz = category(av)
          val (ca, la) = acT((run << 4) | sz)
          bw.put(ca, la)
          bw.put(if (av < 0) av + (1 << sz) - 1 else av, sz)
          run = 0
        }
        k += 1
      }
      if (run > 0) { val (ce, le) = acT(0x00); bw.put(ce, le) }
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
        var c = 0
        while (c < encs.length) {
          val e = encs(c)
          var by = 0
          while (by < e.v) {
            var bx = 0
            while (bx < e.h) {
              encodeBlock(e, mx * e.h + bx, my * e.v + by)
              bx += 1
            }
            by += 1
          }
          c += 1
        }
        sinceRestart += 1
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }
}
