package graft.multimodal

import java.io.ByteArrayOutputStream

/** WebP VP8L (lossless) decode/encode from the public WebP Lossless
  * Bitstream Specification / RFC 9649 — round 18, VERDICT r17 #4: WebP
  * is a top-3 web-crawl image format and VP8L is its self-contained
  * lossless coding (canonical prefix codes + LZ77 + transforms, no
  * DCT). Decodes into the shared [[PngCodec.PngImage]] shape so every
  * format-agnostic image op (tiles, resize, KNN, dedup) takes WebP rows
  * unchanged through `decodeAnyImage`.
  *
  * Scope (fail-loud beyond it, never silent garbage):
  *  - RIFF/WEBP container with a VP8L chunk, plain or inside a VP8X
  *    extended container (round 19) — still VP8X canvases must equal
  *    the stream dims (crop/rotate out of scope); lossy VP8 and the
  *    ALPH sidecar (a lossy-frame feature) reject by name; 14-bit
  *    dimensions, version 0
  *  - ANIMATED WebP (round 19): ANIM/ANMF walk with 2-px-unit frame
  *    offsets, blend (B) and dispose-to-background (D) bits, frames
  *    composited viewer-style over the transparent canvas
  *    ([[frames]]); fractional alpha blending rejects by name
  *  - all four transforms: PREDICTOR (the 14 spec modes with the
  *    contiguous-buffer top-right edge rule), COLOR (signed 3.5-bit
  *    cross-channel multipliers), SUBTRACT-GREEN, COLOR-INDEXING with
  *    sub-byte PIXEL BUNDLING for palettes ≤ 16 (8/4/2/1 indices per
  *    coded pixel)
  *  - entropy image: color cache (1-11 bits, the 0x1e35a7bd multiplier
  *    hash), LZ77 backrefs with the prefix length/distance coding and
  *    the 120-entry 2-D neighborhood distance map, literal ARGB
  *  - prefix codes: simple (1-2 symbol) and normal (code-length-coded
  *    with 16/17/18 repeats, optional max_symbol, canonical DEFLATE
  *    assignment read MSB-of-code-first from the LSB-first stream);
  *    single-symbol normal codes consume 0 bits per the spec
  *  - META PREFIX CODES (round 18): the level-0 image may carry an
  *    entropy sub-image assigning a huffman GROUP per huffman-bits
  *    tile, index (red << 8) | green — sub-images carry NO meta bit
  *    per the spec
  *
  * The encoder writes real VP8L streams (histogram-built length-limited
  * canonical codes, optional subtract-green / palette / LZ77 / color
  * cache) so decode parity gates the whole wire format in-engine. */
object WebpCodec {

  /** True iff `content` is a RIFF/WEBP container. */
  def isWebp(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P'

  // ---- LSB-first bit reader (the DEFLATE convention VP8L follows) ----

  private final class BitReader(data: Array[Byte], off: Int, end: Int) {
    private var at = off.toLong * 8
    private val endBit = end.toLong * 8
    def bitsLeft: Long = endBit - at
    def bit(): Int = {
      require(at < endBit, "WebpCodec: bit stream truncated")
      val b = (data((at >> 3).toInt) >> (at & 7).toInt) & 1
      at += 1
      b
    }
    def bits(n: Int): Int = {
      var v = 0
      var k = 0
      while (k < n) { v |= bit() << k; k += 1 }
      v
    }
  }

  private final class BitWriter {
    private val out = new ByteArrayOutputStream()
    private var buf = 0L
    private var n = 0
    def writeBits(v: Long, len: Int): Unit = {
      buf |= (v & ((1L << len) - 1)) << n
      n += len
      while (n >= 8) {
        out.write((buf & 0xff).toInt)
        buf >>>= 8
        n -= 8
      }
    }
    /** A canonical prefix CODE is written MSB-of-code-first. */
    def writeCode(code: Int, len: Int): Unit = {
      var k = len - 1
      while (k >= 0) { writeBits((code >> k) & 1, 1); k -= 1 }
    }
    def bytes: Array[Byte] = {
      if (n > 0) { out.write((buf & 0xff).toInt); buf = 0; n = 0 }
      out.toByteArray
    }
  }

  // ---- canonical prefix codes ----

  /** Decoder-side canonical code: the classic count/offset walk (one
    * compare per bit, no allocation), plus the 0-bit single-symbol
    * degenerate form the spec blesses. */
  private final class PrefixCode(lengths: Array[Int], what: String) {
    private var single = -1
    val maxLen: Int = if (lengths.isEmpty) 0 else lengths.max
    private val blCount = new Array[Int](maxLen + 1)
    private var syms: Array[Int] = null // symbols sorted by (len, symbol)
    locally {
      val used = lengths.zipWithIndex.filter(_._1 > 0)
      require(used.nonEmpty, s"WebpCodec: $what code has no symbols")
      if (used.length == 1) single = used.head._2
      else {
        used.foreach { case (l, _) => blCount(l) += 1 }
        var kraft = 0L
        var l = 1
        while (l <= maxLen) { kraft += blCount(l).toLong << (maxLen - l); l += 1 }
        require(kraft == (1L << maxLen),
          s"WebpCodec: $what code lengths are not a complete prefix code")
        // canonical assignment = symbols ascending within each length
        syms = used.sortBy { case (l, s) => (l, s) }.map(_._2)
      }
    }
    def decode(br: BitReader): Int = {
      if (single >= 0) return single // 0-bit code per spec
      var code = 0
      var first = 0
      var index = 0
      var len = 1
      while (len <= maxLen) {
        code |= br.bit()
        val count = blCount(len)
        if (code - first < count) return syms(index + code - first)
        index += count
        first = (first + count) << 1
        code <<= 1
        len += 1
      }
      throw new IllegalArgumentException(
        s"WebpCodec: no $what code matches after $maxLen bits")
    }
  }

  /** Length-limited prefix-code lengths from frequencies: heap Huffman,
    * clamp to `limit`, then Kraft-repair by deepening the shallowest
    * repairable symbols. Zero-frequency symbols get length 0. */
  private def codeLengths(freq: Array[Long], limit: Int): Array[Int] = {
    val n = freq.length
    val used = (0 until n).filter(freq(_) > 0)
    val out = new Array[Int](n)
    if (used.isEmpty) return out
    if (used.length == 1) { out(used.head) = 1; return out }
    // heap Huffman over (freq, node); parent chain for depth counting
    final case class Node(var f: Long, sym: Int, var depth: Int,
                          left: Node = null, right: Node = null)
    val pq = new java.util.PriorityQueue[Node](
      (a: Node, b: Node) => java.lang.Long.compare(a.f, b.f))
    used.foreach(s => pq.add(Node(freq(s), s, 0)))
    while (pq.size > 1) {
      val a = pq.poll(); val b = pq.poll()
      pq.add(Node(a.f + b.f, -1, 0, a, b))
    }
    def walk(nd: Node, d: Int): Unit =
      if (nd.sym >= 0) out(nd.sym) = math.max(1, d)
      else { walk(nd.left, d + 1); walk(nd.right, d + 1) }
    walk(pq.poll(), 0)
    // clamp + Kraft repair: the decoder enforces a COMPLETE code, so
    // after clamping overdeep symbols the lengths must sum to exactly
    // 1 in Kraft units — deepen shallow symbols while overfull, then
    // shorten deep symbols while underfull (the parity argument
    // guarantees a unit-gain symbol exists whenever the deficit is odd)
    used.foreach(s => if (out(s) > limit) out(s) = limit)
    val full = 1L << limit
    def kraft: Long = used.map(s => full >> out(s)).sum
    while (kraft > full) {
      val cand = used.filter(out(_) < limit).minBy(s => (out(s), freq(s)))
      out(cand) += 1
    }
    var k = kraft
    while (k < full) {
      val fit = used.filter(s => out(s) > 1 && k + (full >> out(s)) <= full)
      require(fit.nonEmpty, "WebpCodec: Kraft repair stuck (internal)")
      val cand = fit.maxBy(s => full >> out(s)) // largest gain that fits
      out(cand) -= 1
      k += full >> (out(cand) + 1) // gain of moving l+1 -> l is 2^-(l+1)
    }
    out
  }

  // code-length-code symbol order (the spec's kCodeLengthCodeOrder)
  private val ClcOrder = Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9,
    10, 11, 12, 13, 14, 15)

  /** LZ77 length/distance prefix coding: value -> (code, extraBits,
    * extraVal); decode side returns value from code + extra bits.
    * `maxCode` is the alphabet's prefix-code count — 24 for lengths
    * (green symbols 256-279), 40 for distances. */
  private def prefixDecode(code: Int, br: BitReader, maxCode: Int): Int = {
    require(code >= 0 && code < maxCode,
      s"WebpCodec: prefix code $code out of the $maxCode-code range")
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + br.bits(extra) + 1
    }
  }

  private def prefixEncode(v: Int): (Int, Int, Int) = {
    require(v >= 1, s"WebpCodec: prefix value $v")
    if (v <= 4) (v - 1, 0, 0)
    else {
      // code c >= 4 covers [off+1, off+2^e] with e=(c-2)>>1, off=(2+(c&1))<<e
      // (40 codes — the distance alphabet's full range)
      var c = 4
      while (c < 40) {
        val e = (c - 2) >> 1
        val off = (2 + (c & 1)) << e
        if (v >= off + 1 && v <= off + (1 << e)) return (c, e, v - off - 1)
        c += 1
      }
      throw new IllegalArgumentException(s"WebpCodec: value $v beyond prefix range")
    }
  }

  /** The 120-entry 2-D neighborhood distance map (spec order: (dx, dy)
    * with dy in 0..7, |dx| <= 8, sorted by dy then |dx|...) — table
    * taken verbatim from the specification. */
  private val DistMap: Array[(Int, Int)] = Array(
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7))

  /** Spec formula: dist = dx + dy·xsize, clamped to ≥ 1 (positive dx
    * points LEFT of the current pixel — (0,1) is directly above, (1,1)
    * above-left, (−1,1) above-right). */
  private def mapDistance(distCode: Int, xsize: Int): Int =
    if (distCode > 120) distCode - 120
    else {
      val (dx, dy) = DistMap(distCode - 1)
      math.max(1, dy * xsize + dx)
    }

  private def unmapDistance(dist: Int, xsize: Int): Int = {
    // the encoder prefers a plane code when one maps to this distance
    var i = 0
    while (i < 120) {
      val (dx, dy) = DistMap(i)
      if (math.max(1, dy * xsize + dx) == dist) return i + 1
      i += 1
    }
    dist + 120
  }

  private def cacheHash(argb: Int, bits: Int): Int =
    ((0x1e35a7bd * argb) >>> (32 - bits))

  // ---- decode ----

  /** One parsed VP8X header: feature flags + canvas geometry. */
  private final case class Vp8x(flags: Int, canvasW: Int, canvasH: Int)

  private def le24(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16)

  /** Parse a VP8X chunk payload (must be the container's first chunk). */
  private def parseVp8x(bytes: Array[Byte], at: Int, sz: Int): Vp8x = {
    require(at == 20, "WebpCodec: VP8X is not the container's first chunk")
    require(sz == 10, s"WebpCodec: VP8X payload of $sz bytes (want 10)")
    val flags = bytes(at) & 0xff
    // bit layout: 2 reserved | ICC 0x20 | ALPHA 0x10 | EXIF 0x08 |
    // XMP 0x04 | ANIMATION 0x02 | 1 reserved
    require((flags & 0xc1) == 0, f"WebpCodec: VP8X reserved flag bits set (0x$flags%02x)")
    Vp8x(flags, le24(bytes, at + 4) + 1, le24(bytes, at + 7) + 1)
  }

  def decode(bytes: Array[Byte]): PngCodec.PngImage = {
    require(isWebp(bytes), "WebpCodec: not a RIFF/WEBP container")
    val riffLen = le32(bytes, 4)
    // signed le32: a crafted size >= 2^31 reads negative and would slip
    // the EOF check — mirror the chunk-size signedness guard
    require(riffLen >= 0 && riffLen + 8 <= bytes.length,
      s"WebpCodec: RIFF size $riffLen runs past EOF")
    // chunk walk from offset 12
    var at = 12
    var payloadAt = -1
    var payloadEnd = -1
    var vp8x: Option[Vp8x] = None
    while (payloadAt < 0 && at + 8 <= bytes.length) {
      val tag = new String(bytes, at, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val sz = le32(bytes, at + 4)
      // le32 is SIGNED: a crafted negative size would stall or reverse
      // the walk (at += 8 + sz) — reject before the bounds check
      require(sz >= 0 && at + 8L + sz <= bytes.length,
        s"WebpCodec: chunk $tag of $sz bytes runs past EOF")
      tag match {
        case "VP8L" => payloadAt = at + 8; payloadEnd = at + 8 + sz
        case "VP8 " => throw new IllegalArgumentException(
          "WebpCodec: lossy VP8 (DCT) chunk unsupported — VP8L only")
        case "VP8X" =>
          // extended container (round 19): STILL images decode here;
          // animations go through [[frames]]
          val x = parseVp8x(bytes, at + 8, sz)
          require((x.flags & 0x02) == 0,
            "WebpCodec: animated VP8X — decode composited frames via frames()")
          vp8x = Some(x)
        case "ALPH" => throw new IllegalArgumentException(
          "WebpCodec: ALPH chunk rides lossy VP8 frames — VP8L carries " +
            "alpha in-stream")
        // EXIF / XMP / ICCP are informative side metadata (WebP
        // rendering does not auto-apply EXIF orientation); skipped
        case _ => ()
      }
      at += 8 + sz + (sz & 1) // chunks word-align
    }
    require(payloadAt > 0, "WebpCodec: no VP8L chunk in container")
    require((bytes(payloadAt) & 0xff) == 0x2f, "WebpCodec: bad VP8L signature byte")
    val br = new BitReader(bytes, payloadAt + 1, payloadEnd)
    val width = br.bits(14) + 1
    val height = br.bits(14) + 1
    vp8x.foreach { x =>
      // crop/resize canvas semantics are out of scope: the canvas must
      // BE the stream (a mismatch would silently mis-frame the image)
      require(x.canvasW == width && x.canvasH == height,
        s"WebpCodec: VP8X canvas ${x.canvasW}x${x.canvasH} differs from " +
          s"the VP8L stream ${width}x$height — cropped canvases unsupported")
    }
    br.bit() // alpha hint (informative)
    require(br.bits(3) == 0, "WebpCodec: VP8L version != 0")
    require(width.toLong * height * 4 <= (1L << 30),
      s"WebpCodec: ${width}x$height decodes past the 2^30-byte bound")

    // transforms, in read order; applied inverse in reverse below
    var xsize = width
    final case class Transform(kind: Int, sizeBits: Int, data: Array[Int],
                               palSize: Int)
    val transforms = scala.collection.mutable.Buffer.empty[Transform]
    var seen = Set.empty[Int]
    while (br.bit() == 1) {
      val kind = br.bits(2)
      require(!seen(kind), s"WebpCodec: transform $kind appears twice")
      seen += kind
      kind match {
        case 0 | 1 => // predictor / color: block-mode sub-image
          val sb = br.bits(3) + 2
          val bw = (xsize + (1 << sb) - 1) >> sb
          val bh = (height + (1 << sb) - 1) >> sb
          val sub = decodeImageData(br, bw, bh, isLevel0 = false)
          transforms += Transform(kind, sb, sub, 0)
        case 2 =>
          transforms += Transform(2, 0, null, 0)
        case 3 =>
          val palSize = br.bits(8) + 1
          val pal = decodeImageData(br, palSize, 1, isLevel0 = false)
          // palette entries are component-wise delta-coded
          var i = 1
          while (i < palSize) {
            pal(i) = addPixels(pal(i), pal(i - 1))
            i += 1
          }
          transforms += Transform(3, 0, pal, palSize)
          val wb = widthBits(palSize)
          xsize = (xsize + (1 << wb) - 1) >> wb
      }
    }

    // predictor/color sub-image geometry is computed against the coded
    // width at READ time; combining color-indexing (which shrinks the
    // coded width) with other transforms would need the packed-domain
    // geometry threading — out of scope, reject rather than mis-decode
    require(!seen(3) || seen.size == 1,
      "WebpCodec: color-indexing combined with other transforms unsupported")
    var argb = decodeImageData(br, xsize, height, isLevel0 = true)

    // inverse transforms in reverse read order
    transforms.reverseIterator.foreach { t =>
      t.kind match {
        case 3 =>
          val wb = widthBits(t.palSize)
          val bitsPer = 8 >> wb
          val outPix = new Array[Int](width * height)
          val mask = (1 << bitsPer) - 1
          var y = 0
          while (y < height) {
            var x = 0
            while (x < width) {
              val packed = argb(y * xsize + (x >> wb))
              val green = (packed >> 8) & 0xff
              val idx = (green >> ((x & ((1 << wb) - 1)) * bitsPer)) & mask
              require(idx < t.palSize,
                s"WebpCodec: palette index $idx beyond ${t.palSize}-entry palette")
              outPix(y * width + x) = t.data(idx)
              x += 1
            }
            y += 1
          }
          argb = outPix
          xsize = width
        case 2 =>
          var i = 0
          while (i < argb.length) {
            val p = argb(i)
            val g = (p >> 8) & 0xff
            val r = (((p >> 16) & 0xff) + g) & 0xff
            val b = ((p & 0xff) + g) & 0xff
            argb(i) = (p & 0xff00ff00) | (r << 16) | b
            i += 1
          }
        case 1 =>
          val sb = t.sizeBits
          val bw = (xsize + (1 << sb) - 1) >> sb
          var y = 0
          while (y < height) {
            var x = 0
            while (x < xsize) {
              val cte = t.data((y >> sb) * bw + (x >> sb))
              val g2r = (cte >> 0) & 0xff  // blue byte
              val g2b = (cte >> 8) & 0xff  // green byte
              val r2b = (cte >> 16) & 0xff // red byte
              val p = argb(y * xsize + x)
              val g = (p >> 8) & 0xff
              var r = (p >> 16) & 0xff
              var b = p & 0xff
              r = (r + delta(g2r, g)) & 0xff
              b = (b + delta(g2b, g)) & 0xff
              b = (b + delta(r2b, r)) & 0xff
              argb(y * xsize + x) = (p & 0xff00ff00.toInt) | (r << 16) | b
              x += 1
            }
            y += 1
          }
        case 0 =>
          inversePredictor(argb, xsize, height, t.data, t.sizeBits)
      }
    }

    require(argb.length == width * height, "WebpCodec: internal size drift")
    // emit RGB or RGBA depending on whether any alpha < 255 (the GIF
    // convention: fully-opaque images surface as 3-channel)
    val hasAlpha = argb.exists(p => (p >>> 24) != 0xff)
    val ch = if (hasAlpha) 4 else 3
    val px = new Array[Byte](width * height * ch)
    var i = 0
    while (i < argb.length) {
      val p = argb(i)
      px(i * ch) = ((p >> 16) & 0xff).toByte
      px(i * ch + 1) = ((p >> 8) & 0xff).toByte
      px(i * ch + 2) = (p & 0xff).toByte
      if (ch == 4) px(i * ch + 3) = ((p >>> 24) & 0xff).toByte
      i += 1
    }
    PngCodec.PngImage(width, height, 8, if (ch == 3) 2 else 6, ch, px)
  }

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) |
      ((b(i + 3) & 0xff) << 24)

  private def widthBits(palSize: Int): Int =
    if (palSize <= 2) 3 else if (palSize <= 4) 2 else if (palSize <= 16) 1 else 0

  private def addPixels(a: Int, b: Int): Int = {
    val aa = (((a >>> 24) + (b >>> 24)) & 0xff) << 24
    val rr = ((((a >> 16) & 0xff) + ((b >> 16) & 0xff)) & 0xff) << 16
    val gg = ((((a >> 8) & 0xff) + ((b >> 8) & 0xff)) & 0xff) << 8
    val bb = ((a & 0xff) + (b & 0xff)) & 0xff
    aa | rr | gg | bb
  }

  /** signed 3.5 fixed-point color-transform delta: (int8(t)*int8(c))>>5 */
  private def delta(t: Int, c: Int): Int = ((t.toByte.toInt * c.toByte.toInt) >> 5)

  /** One entropy-coded ARGB image (no transforms at this level): the
    * optional color cache, the five prefix codes, and the literal /
    * backref / cache-hit pixel loop. */
  private final class CodeGroup(br: BitReader, cacheSize: Int) {
    val green = readPrefixCode(br, 256 + 24 + cacheSize, "green")
    val red = readPrefixCode(br, 256, "red")
    val blue = readPrefixCode(br, 256, "blue")
    val alpha = readPrefixCode(br, 256, "alpha")
    val dist = readPrefixCode(br, 40, "distance")
  }

  /** One entropy-coded image. `isLevel0` marks the top-level spatially
    * coded image — it alone carries the META-PREFIX bit (spec: the
    * entropy-coded sub-images for transforms and palettes have color
    * cache + prefix codes only); with meta prefix codes, an entropy
    * sub-image assigns one of several code GROUPS to each huffman-bits
    * tile, index (red << 8) | green. */
  private def decodeImageData(br: BitReader, xsize: Int, ysize: Int,
                              isLevel0: Boolean): Array[Int] = {
    val cacheBits = if (br.bit() == 1) br.bits(4) else 0
    require(cacheBits <= 11, s"WebpCodec: color-cache bits $cacheBits > 11")
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    // meta prefix codes: level-0 only (round 18 — sub-images carry NO
    // meta bit per the spec)
    var metaBits = 0
    var metaW = 0
    var groupIdx: Array[Int] = null
    val groups: Array[CodeGroup] =
      if (isLevel0 && br.bit() == 1) {
        metaBits = br.bits(3) + 2
        metaW = (xsize + (1 << metaBits) - 1) >> metaBits
        val metaH = (ysize + (1 << metaBits) - 1) >> metaBits
        val entropy = decodeImageData(br, metaW, metaH, isLevel0 = false)
        groupIdx = entropy.map(p => (((p >> 16) & 0xff) << 8) | ((p >> 8) & 0xff))
        val n = groupIdx.max + 1
        // (red << 8) | green makes up to 65536 groups spec-legal, and
        // large photographic VP8L files from real crawls do exceed 1024;
        // total allocation stays bounded by the 2^30 pixel guard upstream
        require(n <= 65536,
          s"WebpCodec: $n huffman groups exceed the spec maximum 65536")
        Array.fill(n)(new CodeGroup(br, cacheSize))
      } else Array(new CodeGroup(br, cacheSize))
    val out = new Array[Int](xsize * ysize)
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    var pos = 0
    var x = 0
    var y = 0
    def advance(n: Int): Unit = {
      pos += n
      x += n
      while (x >= xsize) { x -= xsize; y += 1 }
    }
    while (pos < out.length) {
      val g =
        if (groupIdx == null) groups(0)
        else groups(groupIdx((y >> metaBits) * metaW + (x >> metaBits)))
      val s = g.green.decode(br)
      if (s < 256) {
        val r = g.red.decode(br)
        val b = g.blue.decode(br)
        val a = g.alpha.decode(br)
        val p = (a << 24) | (r << 16) | (s << 8) | b
        out(pos) = p
        if (cache != null) cache(cacheHash(p, cacheBits)) = p
        advance(1)
      } else if (s < 280) {
        val len = prefixDecode(s - 256, br, maxCode = 24)
        val dCode = prefixDecode(g.dist.decode(br), br, maxCode = 40)
        val d = mapDistance(dCode, xsize)
        require(d <= pos, s"WebpCodec: backref distance $d at pixel $pos")
        require(pos + len <= out.length,
          s"WebpCodec: backref of $len overruns the image")
        var k = 0
        while (k < len) {
          val p = out(pos + k - d)
          out(pos + k) = p
          if (cache != null) cache(cacheHash(p, cacheBits)) = p
          k += 1
        }
        advance(len)
      } else {
        val idx = s - 280
        require(cache != null && idx < cacheSize,
          s"WebpCodec: cache index $idx without a ${cacheSize}-entry cache")
        out(pos) = cache(idx)
        advance(1)
      }
    }
    out
  }

  /** One prefix code: the simple (1-2 symbol) or normal
    * (code-length-coded) form. */
  private def readPrefixCode(br: BitReader, alphabet: Int, what: String): PrefixCode = {
    if (br.bit() == 1) { // simple
      val numSym = br.bit() + 1
      val first8 = br.bit()
      val s0 = if (first8 == 1) br.bits(8) else br.bits(1)
      val lengths = new Array[Int](alphabet)
      require(s0 < alphabet, s"WebpCodec: $what simple symbol $s0 out of alphabet")
      if (numSym == 1) lengths(s0) = 1 // degenerate: decode() treats as 0-bit
      else {
        val s1 = br.bits(8)
        require(s1 < alphabet && s1 != s0,
          s"WebpCodec: $what simple symbols $s0/$s1 invalid")
        lengths(s0) = 1; lengths(s1) = 1
      }
      new PrefixCode(lengths, what)
    } else {
      val numCodeLengths = 4 + br.bits(4)
      val clcLen = new Array[Int](19)
      var i = 0
      while (i < numCodeLengths) { clcLen(ClcOrder(i)) = br.bits(3); i += 1 }
      val clc = new PrefixCode(clcLen, s"$what code-length")
      var maxSymbol =
        if (br.bit() == 1) {
          val nbits = 2 + 2 * br.bits(3)
          2 + br.bits(nbits)
        } else alphabet
      val lengths = new Array[Int](alphabet)
      var sym = 0
      var prev = 8
      while (sym < alphabet && maxSymbol > 0) {
        maxSymbol -= 1
        val s = clc.decode(br)
        if (s < 16) {
          lengths(sym) = s
          sym += 1
          if (s != 0) prev = s
        } else if (s == 16) {
          val rep = 3 + br.bits(2)
          require(sym + rep <= alphabet, s"WebpCodec: $what repeat past alphabet")
          var k = 0
          while (k < rep) { lengths(sym) = prev; sym += 1; k += 1 }
        } else {
          val rep = if (s == 17) 3 + br.bits(3) else 11 + br.bits(7)
          require(sym + rep <= alphabet, s"WebpCodec: $what zero-run past alphabet")
          sym += rep
        }
      }
      new PrefixCode(lengths, what)
    }
  }

  private def avg2(a: Int, b: Int): Int = {
    val aa = (((a >>> 24) + (b >>> 24)) >> 1) << 24
    val rr = ((((a >> 16) & 0xff) + ((b >> 16) & 0xff)) >> 1) << 16
    val gg = ((((a >> 8) & 0xff) + ((b >> 8) & 0xff)) >> 1) << 8
    val bb = (((a & 0xff) + (b & 0xff)) >> 1)
    aa | rr | gg | bb
  }

  /** The prediction for pixel (x, y) of `argb` (already holding final
    * values left/above of it) under spec `mode` — the 14 modes plus the
    * forced edge rules (black at the origin, L on the top row, T on the
    * left column) and the contiguous-buffer TR rule (the top-right of
    * the last column is the CURRENT row's first pixel). Shared by the
    * decoder's inverse pass and the encoder's forward pass, so the two
    * cannot drift. */
  private def predict(argb: Array[Int], w: Int, x: Int, y: Int, idx: Int,
                      mode: Int): Int = {
    def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
    if (x == 0 && y == 0) 0xff000000
    else if (y == 0) argb(idx - 1) // top row: L
    else if (x == 0) argb(idx - w) // left column: T
    else {
      val l = argb(idx - 1)
      val t = argb(idx - w)
      val tl = argb(idx - w - 1)
      val tr = argb(idx - w + 1) // x = w-1 wraps to the current row's start
      mode match {
        case 0 => 0xff000000
        case 1 => l
        case 2 => t
        case 3 => tr
        case 4 => tl
        case 5 => avg2(avg2(l, tr), t)
        case 6 => avg2(l, tl)
        case 7 => avg2(l, t)
        case 8 => avg2(tl, t)
        case 9 => avg2(t, tr)
        case 10 => avg2(avg2(l, tl), avg2(t, tr))
        case 11 =>
          var pL = 0; var pT = 0
          var sh = 0
          while (sh < 32) {
            val pc = ((l >>> sh) & 0xff) + ((t >>> sh) & 0xff) - ((tl >>> sh) & 0xff)
            pL += math.abs(pc - ((l >>> sh) & 0xff))
            pT += math.abs(pc - ((t >>> sh) & 0xff))
            sh += 8
          }
          if (pL < pT) l else t
        case 12 =>
          var p = 0
          var sh = 0
          while (sh < 32) {
            val v = clamp(((l >>> sh) & 0xff) + ((t >>> sh) & 0xff) - ((tl >>> sh) & 0xff))
            p |= v << sh
            sh += 8
          }
          p
        case 13 =>
          val a = avg2(l, t)
          var p = 0
          var sh = 0
          while (sh < 32) {
            val ac = (a >>> sh) & 0xff
            val v = clamp(ac + (ac - ((tl >>> sh) & 0xff)) / 2)
            p |= v << sh
            sh += 8
          }
          p
        case m => throw new IllegalArgumentException(
          s"WebpCodec: predictor mode $m outside 0-13")
      }
    }
  }

  /** Inverse predictor transform: residual + prediction per pixel in
    * scan order (predictions read already-reconstructed neighbors). */
  private def inversePredictor(argb: Array[Int], w: Int, h: Int,
                               modes: Array[Int], sizeBits: Int): Unit = {
    val bw = (w + (1 << sizeBits) - 1) >> sizeBits
    var y = 0
    var idx = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // the mode rides the sub-image pixel's GREEN channel
        val mode = (modes((y >> sizeBits) * bw + (x >> sizeBits)) >> 8) & 0xff
        argb(idx) = addPixels(argb(idx), predict(argb, w, x, y, idx, mode))
        x += 1
        idx += 1
      }
      y += 1
    }
  }

  /** Composited animated-WebP frames (round 19): the VP8X+ANIM+ANMF
    * walk, each ANMF carrying one VP8L-coded frame painted at its
    * (x, y) offset under its blend (B) and disposal (D) bits — frames
    * arrive composited the way a viewer displays them, the
    * GifCodec.frames contract, so `decodeFrameTiles` takes animated
    * WebP rows unchanged. The canvas initializes to transparent black
    * per the spec; D = 1 disposes the frame's rect back to transparent.
    * Fractional alpha blending under B = 0 is out of scope (opaque and
    * fully-transparent sources composite exactly; anything else rejects
    * by name — integer rounding of the spec's blend formula is
    * writer-defined and would be silent drift). */
  def frames(bytes: Array[Byte]): Seq[PngCodec.PngImage] = {
    require(isWebp(bytes), "WebpCodec: not a RIFF/WEBP container")
    val riffLen = le32(bytes, 4)
    // signed le32: a crafted size >= 2^31 reads negative and would slip
    // the EOF check — mirror the chunk-size signedness guard
    require(riffLen >= 0 && riffLen + 8 <= bytes.length,
      s"WebpCodec: RIFF size $riffLen runs past EOF")
    var at = 12
    var vp8x: Option[Vp8x] = None
    var sawAnim = false
    var canvas: Array[Int] = null
    var cw = 0
    var ch = 0
    val out = scala.collection.mutable.Buffer.empty[PngCodec.PngImage]
    while (at + 8 <= bytes.length) {
      val tag = new String(bytes, at, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val sz = le32(bytes, at + 4)
      require(sz >= 0 && at + 8L + sz <= bytes.length,
        s"WebpCodec: chunk $tag of $sz bytes runs past EOF")
      tag match {
        case "VP8X" =>
          val x = parseVp8x(bytes, at + 8, sz)
          require((x.flags & 0x02) != 0,
            "WebpCodec: frames() wants an ANIMATED container — still " +
              "images decode via decode()")
          cw = x.canvasW; ch = x.canvasH
          require(cw.toLong * ch * 4 <= (1L << 30),
            s"WebpCodec: ${cw}x$ch canvas exceeds the 2^30-byte bound")
          canvas = new Array[Int](cw * ch) // transparent black per spec
          vp8x = Some(x)
        case "ANIM" =>
          require(vp8x.isDefined, "WebpCodec: ANIM before VP8X")
          require(sz == 6, s"WebpCodec: ANIM payload of $sz bytes (want 6)")
          // background color + loop count are playback hints; the
          // composite canvas is transparent-initialized per spec
          sawAnim = true
        case "ANMF" =>
          require(sawAnim, "WebpCodec: ANMF before ANIM")
          require(sz >= 16, s"WebpCodec: ANMF payload of $sz bytes")
          val p = at + 8
          val fx = le24(bytes, p) * 2
          val fy = le24(bytes, p + 3) * 2
          val fw = le24(bytes, p + 6) + 1
          val fh = le24(bytes, p + 9) + 1
          val flagByte = bytes(p + 15) & 0xff
          val noBlend = (flagByte & 0x02) != 0
          val disposeBg = (flagByte & 0x01) != 0
          require(fx + fw <= cw && fy + fh <= ch,
            s"WebpCodec: ANMF rect ${fw}x$fh at ($fx,$fy) outside the " +
              s"${cw}x$ch canvas")
          // frame data: exactly one VP8L subchunk (lossy VP8/ALPH reject)
          var q = p + 16
          var img: PngCodec.PngImage = null
          while (img == null) {
            require(q + 8 <= p + sz, "WebpCodec: ANMF carries no VP8L subchunk")
            val t2 = new String(bytes, q, 4, java.nio.charset.StandardCharsets.US_ASCII)
            val s2 = le32(bytes, q + 4)
            require(s2 >= 0 && q + 8L + s2 <= p + sz,
              s"WebpCodec: ANMF subchunk $t2 of $s2 bytes overruns")
            t2 match {
              case "VP8L" =>
                img = decode(wrapRiff(Seq("VP8L" ->
                  java.util.Arrays.copyOfRange(bytes, q + 8, q + 8 + s2))))
              case "VP8 " => throw new IllegalArgumentException(
                "WebpCodec: lossy VP8 animation frames unsupported — VP8L only")
              case "ALPH" => throw new IllegalArgumentException(
                "WebpCodec: ALPH chunk rides lossy VP8 frames — VP8L carries " +
                  "alpha in-stream")
              case other => throw new IllegalArgumentException(
                s"WebpCodec: unexpected $other subchunk inside ANMF")
            }
            q += 8 + s2 + (s2 & 1)
          }
          require(img.width == fw && img.height == fh,
            s"WebpCodec: ANMF declares ${fw}x$fh but the frame is " +
              s"${img.width}x${img.height}")
          val sch = img.channels
          var y = 0
          while (y < fh) {
            var x = 0
            while (x < fw) {
              val si = (y * fw + x) * sch
              val a = if (sch == 4) img.pixels(si + 3) & 0xff else 255
              val src = (a << 24) | ((img.pixels(si) & 0xff) << 16) |
                ((img.pixels(si + 1) & 0xff) << 8) | (img.pixels(si + 2) & 0xff)
              val di = (fy + y) * cw + (fx + x)
              if (noBlend || a == 255) canvas(di) = src
              else if (a == 0) () // fully transparent: dst shows through
              else throw new IllegalArgumentException(
                s"WebpCodec: fractional alpha $a under blend method 0 — " +
                  "integer blend rounding is writer-defined; use no-blend " +
                  "frames or binary alpha")
              x += 1
            }
            y += 1
          }
          // snapshot the composited canvas
          val anyTransparent = canvas.exists(p0 => (p0 >>> 24) != 255)
          val outCh = if (anyTransparent) 4 else 3
          val px = new Array[Byte](cw * ch * outCh)
          var i = 0
          while (i < cw * ch) {
            val v = canvas(i)
            px(i * outCh) = ((v >> 16) & 0xff).toByte
            px(i * outCh + 1) = ((v >> 8) & 0xff).toByte
            px(i * outCh + 2) = (v & 0xff).toByte
            if (outCh == 4) px(i * outCh + 3) = ((v >>> 24) & 0xff).toByte
            i += 1
          }
          out += PngCodec.PngImage(cw, ch, 8, if (outCh == 4) 6 else 2,
            outCh, px)
          if (disposeBg) {
            var yy = 0
            while (yy < fh) {
              var xx = 0
              while (xx < fw) { canvas((fy + yy) * cw + (fx + xx)) = 0; xx += 1 }
              yy += 1
            }
          }
        case "VP8 " => throw new IllegalArgumentException(
          "WebpCodec: lossy VP8 (DCT) chunk unsupported — VP8L only")
        case _ => () // EXIF / XMP / ICCP side metadata
      }
      at += 8 + sz + (sz & 1)
    }
    require(vp8x.isDefined, "WebpCodec: no VP8X chunk — not an animated WebP")
    require(out.nonEmpty, "WebpCodec: animated container carries no ANMF frames")
    out.toSeq
  }

  /** One ANMF frame for [[encodeAnim]]: VP8L-coded `pixels` painted at
    * (`x`, `y`) — offsets must be EVEN (the wire stores them in 2-pixel
    * units). `noBlend` = the B bit (replace the rect), `disposeBg` = the
    * D bit (clear the rect to transparent after display). */
  final case class AnimFrameSpec(x: Int, y: Int, width: Int, height: Int,
                                 channels: Int, pixels: Array[Byte],
                                 durationMs: Int, noBlend: Boolean = true,
                                 disposeBg: Boolean = false, mode: Int = 0)

  /** Write an animated WebP: VP8X (animation flag) + ANIM + one ANMF
    * per frame, each carrying a real VP8L stream. */
  def encodeAnim(canvasW: Int, canvasH: Int, frames: Seq[AnimFrameSpec],
                 loop: Int = 0, bgColor: Int = 0): Array[Byte] = {
    require(frames.nonEmpty, "WebpCodec.encodeAnim: no frames")
    require(canvasW >= 1 && canvasW <= 16384 && canvasH >= 1 && canvasH <= 16384,
      s"WebpCodec.encodeAnim: canvas ${canvasW}x$canvasH")
    val hdr = new Array[Byte](10)
    val anyAlpha = frames.exists(_.channels == 4)
    hdr(0) = ((if (anyAlpha) 0x10 else 0) | 0x02).toByte
    def w24(b: Array[Byte], at: Int, v: Int): Unit = {
      b(at) = (v & 0xff).toByte; b(at + 1) = ((v >> 8) & 0xff).toByte
      b(at + 2) = ((v >> 16) & 0xff).toByte
    }
    w24(hdr, 4, canvasW - 1); w24(hdr, 7, canvasH - 1)
    val anim = new Array[Byte](6)
    anim(0) = ((bgColor >> 16) & 0xff).toByte // B (spec stores B,G,R,A)
    anim(1) = ((bgColor >> 8) & 0xff).toByte
    anim(2) = (bgColor & 0xff).toByte
    anim(3) = ((bgColor >>> 24) & 0xff).toByte
    anim(4) = (loop & 0xff).toByte; anim(5) = ((loop >> 8) & 0xff).toByte
    val anmfs = frames.map { f =>
      require(f.x % 2 == 0 && f.y % 2 == 0,
        s"WebpCodec.encodeAnim: frame offsets (${f.x},${f.y}) must be even")
      require(f.x + f.width <= canvasW && f.y + f.height <= canvasH,
        s"WebpCodec.encodeAnim: frame ${f.width}x${f.height} at " +
          s"(${f.x},${f.y}) outside the ${canvasW}x$canvasH canvas")
      val chunk = vp8lChunkData(f.width, f.height, f.channels, f.pixels,
        f.mode, predMode = 7)
      val body = new ByteArrayOutputStream(chunk.length + 32)
      val h16 = new Array[Byte](16)
      w24(h16, 0, f.x / 2); w24(h16, 3, f.y / 2)
      w24(h16, 6, f.width - 1); w24(h16, 9, f.height - 1)
      w24(h16, 12, f.durationMs)
      h16(15) = (((if (f.noBlend) 0x02 else 0)) |
        (if (f.disposeBg) 0x01 else 0)).toByte
      body.write(h16, 0, 16)
      body.write('V'); body.write('P'); body.write('8'); body.write('L')
      body.write(chunk.length & 0xff); body.write((chunk.length >> 8) & 0xff)
      body.write((chunk.length >> 16) & 0xff); body.write((chunk.length >> 24) & 0xff)
      body.write(chunk, 0, chunk.length)
      if ((chunk.length & 1) == 1) body.write(0)
      "ANMF" -> body.toByteArray
    }
    wrapRiff(Seq("VP8X" -> hdr, "ANIM" -> anim) ++ anmfs)
  }

  // ---- encode ----

  /** Encode RGB(A) pixels as a real VP8L WebP. `mode` rotates the wire
    * shape: 0 = plain literals, 1 = subtract-green, 2 = color-indexing
    * (requires ≤ 256 distinct colors; bundles when ≤ 16), 3 = LZ77 +
    * color cache over literals, 4 = PREDICTOR transform (`predMode`
    * picks the spec mode 0-13), 5 = COLOR transform (fixed non-trivial
    * multipliers), 6 = META PREFIX CODES (two tile-checkerboard huffman
    * groups). Channels 3 (RGB, opaque) or 4 (RGBA). */
  def encode(width: Int, height: Int, channels: Int, pixels: Array[Byte],
             mode: Int = 0, predMode: Int = 7,
             vp8x: Boolean = false): Array[Byte] = {
    val chunk = vp8lChunkData(width, height, channels, pixels, mode, predMode)
    if (!vp8x) wrapRiff(Seq("VP8L" -> chunk))
    else {
      // still VP8X container: canvas dims duplicate the stream dims
      // (crop/rotate semantics are out of scope); alpha flag mirrors
      // the stream's channel count
      val hdr = new Array[Byte](10)
      hdr(0) = (if (channels == 4) 0x10 else 0x00).toByte
      def w24(at: Int, v: Int): Unit = {
        hdr(at) = (v & 0xff).toByte; hdr(at + 1) = ((v >> 8) & 0xff).toByte
        hdr(at + 2) = ((v >> 16) & 0xff).toByte
      }
      w24(4, width - 1); w24(7, height - 1)
      wrapRiff(Seq("VP8X" -> hdr, "VP8L" -> chunk))
    }
  }

  /** The VP8L chunk body (signature byte + coded stream) for one image
    * — shared by the plain/VP8X still wrappers and ANMF frames. */
  private def vp8lChunkData(width: Int, height: Int, channels: Int,
                            pixels: Array[Byte], mode: Int,
                            predMode: Int): Array[Byte] = {
    require(channels == 3 || channels == 4,
      s"WebpCodec.encode: $channels channels (3 or 4)")
    require(width >= 1 && width <= 16384 && height >= 1 && height <= 16384,
      s"WebpCodec.encode: ${width}x$height outside the 14-bit range")
    require(pixels.length == width * height * channels,
      s"WebpCodec.encode: ${pixels.length} bytes for ${width}x$height x$channels")
    require(mode >= 0 && mode <= 6, s"WebpCodec.encode: mode $mode")
    require(predMode >= 0 && predMode <= 13,
      s"WebpCodec.encode: predictor mode $predMode outside 0-13")
    val n = width * height
    val argb = new Array[Int](n)
    var i = 0
    while (i < n) {
      val a = if (channels == 4) pixels(i * channels + 3) & 0xff else 0xff
      argb(i) = (a << 24) | ((pixels(i * channels) & 0xff) << 16) |
        ((pixels(i * channels + 1) & 0xff) << 8) | (pixels(i * channels + 2) & 0xff)
      i += 1
    }

    val bw = new BitWriter
    bw.writeBits(width - 1, 14)
    bw.writeBits(height - 1, 14)
    bw.writeBits(if (channels == 4) 1 else 0, 1)
    bw.writeBits(0, 3) // version

    var coded = argb
    var xsize = width
    if (mode == 1) {
      bw.writeBits(1, 1); bw.writeBits(2, 2) // subtract-green
      coded = argb.map { p =>
        val g = (p >> 8) & 0xff
        val r = (((p >> 16) & 0xff) - g) & 0xff
        val b = ((p & 0xff) - g) & 0xff
        (p & 0xff00ff00) | (r << 16) | b
      }
    } else if (mode == 2) {
      val palette = argb.distinct.sorted
      require(palette.length <= 256,
        s"WebpCodec.encode: ${palette.length} colors exceed the 256-entry palette")
      val index = palette.zipWithIndex.toMap
      bw.writeBits(1, 1); bw.writeBits(3, 2) // color-indexing
      bw.writeBits(palette.length - 1, 8)
      // palette as a delta-coded palSize x 1 image
      val deltas = palette.zipWithIndex.map { case (p, k) =>
        if (k == 0) p else subPixels(p, palette(k - 1))
      }
      writeImageData(bw, deltas, palette.length, useLz77 = false,
        cacheBits = 0, isLevel0 = false)
      val wb = widthBits(palette.length)
      val bitsPer = 8 >> wb
      xsize = (width + (1 << wb) - 1) >> wb
      val packed = new Array[Int](xsize * height)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val idx = index(argb(y * width + x))
          val at = y * xsize + (x >> wb)
          val sub = x & ((1 << wb) - 1)
          val green = ((packed(at) >> 8) & 0xff) | (idx << (sub * bitsPer))
          packed(at) = 0xff000000 | (green << 8)
          x += 1
        }
        y += 1
      }
      coded = packed
    } else if (mode == 4) {
      // predictor transform: one uniform `predMode` over a 16-px block
      // grid; residual = pixel − predict(ORIGINALS) — lossless, so the
      // decoder's progressive reconstruction sees the same neighbors
      val sb = 4
      bw.writeBits(1, 1); bw.writeBits(0, 2)
      bw.writeBits(sb - 2, 3)
      val gw = (width + (1 << sb) - 1) >> sb
      val gh = (height + (1 << sb) - 1) >> sb
      writeImageData(bw, Array.fill(gw * gh)(0xff000000 | (predMode << 8)),
        gw, useLz77 = false, cacheBits = 0, isLevel0 = false)
      coded = new Array[Int](n)
      var idx = 0
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          coded(idx) = subPixels(argb(idx), predict(argb, width, x, y, idx, predMode))
          x += 1; idx += 1
        }
        y += 1
      }
    } else if (mode == 5) {
      // color transform: one uniform ColorTransformElement block grid;
      // forward: r −= Δ(g2r, g); b −= Δ(g2b, g) + Δ(r2b, ORIGINAL r)
      val sb = 4
      val g2r = 0x40; val g2b = 0xE0; val r2b = 0x15
      bw.writeBits(1, 1); bw.writeBits(1, 2)
      bw.writeBits(sb - 2, 3)
      val gw = (width + (1 << sb) - 1) >> sb
      val gh = (height + (1 << sb) - 1) >> sb
      val cte = 0xff000000 | (r2b << 16) | (g2b << 8) | g2r
      writeImageData(bw, Array.fill(gw * gh)(cte), gw,
        useLz77 = false, cacheBits = 0, isLevel0 = false)
      coded = argb.map { p =>
        val g = (p >> 8) & 0xff
        val r0 = (p >> 16) & 0xff
        val b0 = p & 0xff
        val r = (r0 - delta(g2r, g)) & 0xff
        // the inverse adds Δ(r2b, RECONSTRUCTED red) = Δ(r2b, r0)
        val b = (b0 - delta(g2b, g) - delta(r2b, r0)) & 0xff
        (p & 0xff00ff00) | (r << 16) | b
      }
    }
    bw.writeBits(0, 1) // no more transforms
    if (mode == 6) writeImageDataMeta(bw, coded, xsize)
    else writeImageData(bw, coded, xsize,
      useLz77 = mode == 3, cacheBits = if (mode == 3) 6 else 0,
      isLevel0 = true)

    val payload = bw.bytes
    val out = new ByteArrayOutputStream(payload.length + 1)
    out.write(0x2f)
    out.write(payload, 0, payload.length)
    out.toByteArray
  }

  /** RIFF/WEBP wrapper: chunks in order, each word-aligned with a pad
    * byte after odd sizes (the pad is OUTSIDE the declared size). */
  private def wrapRiff(chunks: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new ByteArrayOutputStream(chunks.map(_._2.length + 9).sum + 12)
    def w32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    val total = 4 + chunks.map { case (_, d) => 8 + d.length + (d.length & 1) }.sum
    out.write('R'); out.write('I'); out.write('F'); out.write('F')
    w32(total)
    out.write('W'); out.write('E'); out.write('B'); out.write('P')
    chunks.foreach { case (tag, data) =>
      require(tag.length == 4, s"WebpCodec: chunk tag '$tag'")
      tag.foreach(c => out.write(c))
      w32(data.length)
      out.write(data, 0, data.length)
      if ((data.length & 1) == 1) out.write(0)
    }
    out.toByteArray
  }

  private def subPixels(a: Int, b: Int): Int = {
    val aa = (((a >>> 24) - (b >>> 24)) & 0xff) << 24
    val rr = ((((a >> 16) & 0xff) - ((b >> 16) & 0xff)) & 0xff) << 16
    val gg = ((((a >> 8) & 0xff) - ((b >> 8) & 0xff)) & 0xff) << 8
    val bb = ((a & 0xff) - (b & 0xff)) & 0xff
    aa | rr | gg | bb
  }

  /** Level-0 image with META PREFIX CODES (round 18): 16-px tiles
    * assigned to TWO huffman groups in a tile-index checkerboard, each
    * group's codes built from its own pixels' histograms — the
    * multi-group shape large photographic VP8L files use. Literals
    * only (no LZ77/cache), keeping group attribution pixel-local. */
  private def writeImageDataMeta(bw: BitWriter, argb: Array[Int],
                                 xsize: Int): Unit = {
    val ysize = argb.length / xsize
    bw.writeBits(0, 1) // no color cache
    bw.writeBits(1, 1) // meta prefix codes present
    val metaBits = 4
    bw.writeBits(metaBits - 2, 3)
    val mw = (xsize + (1 << metaBits) - 1) >> metaBits
    val mh = (ysize + (1 << metaBits) - 1) >> metaBits
    val gIdx = Array.tabulate(mw * mh)(t => t % 2)
    val nGroups = gIdx.max + 1
    // entropy sub-image: group index rides (red << 8) | green
    writeImageData(bw, gIdx.map(g => 0xff000000 | ((g & 0xff) << 8)), mw,
      useLz77 = false, cacheBits = 0, isLevel0 = false)
    def groupOf(pos: Int): Int = {
      val x = pos % xsize
      val y = pos / xsize
      gIdx((y >> metaBits) * mw + (x >> metaBits))
    }
    // per-group histograms over literal pixels
    val gF = Array.fill(nGroups)(new Array[Long](256 + 24))
    val rF = Array.fill(nGroups)(new Array[Long](256))
    val bF = Array.fill(nGroups)(new Array[Long](256))
    val aF = Array.fill(nGroups)(new Array[Long](256))
    var pos = 0
    while (pos < argb.length) {
      val g = groupOf(pos)
      val p = argb(pos)
      gF(g)((p >> 8) & 0xff) += 1
      rF(g)((p >> 16) & 0xff) += 1
      bF(g)(p & 0xff) += 1
      aF(g)((p >>> 24) & 0xff) += 1
      pos += 1
    }
    val dF = new Array[Long](40)
    dF(0) = 1 // the spec requires all five codes per group
    val lens = (0 until nGroups).map { g =>
      (codeLengths(gF(g), 15), codeLengths(rF(g), 15), codeLengths(bF(g), 15),
        codeLengths(aF(g), 15), codeLengths(dF, 15))
    }
    lens.foreach { case (gl, rl, bl, al, dl) =>
      Seq(gl, rl, bl, al, dl).foreach(writeCodeDef(bw, _))
    }
    val codes = lens.map { case (gl, rl, bl, al, _) =>
      (canonicalCodes(gl), gl, canonicalCodes(rl), rl,
        canonicalCodes(bl), bl, canonicalCodes(al), al)
    }
    val singleSet: Set[AnyRef] = lens.flatMap { case (gl, rl, bl, al, _) =>
      Seq(gl, rl, bl, al).filter(_.count(_ > 0) == 1).map(_.asInstanceOf[AnyRef])
    }.toSet
    def emit(cs: Array[(Int, Int)], ls: Array[Int], sym: Int): Unit =
      if (!singleSet(ls)) bw.writeCode(cs(sym)._1, cs(sym)._2)
    pos = 0
    while (pos < argb.length) {
      val g = groupOf(pos)
      val (gC, gl, rC, rl, bC, bl, aC, al) = codes(g)
      val p = argb(pos)
      emit(gC, gl, (p >> 8) & 0xff)
      emit(rC, rl, (p >> 16) & 0xff)
      emit(bC, bl, p & 0xff)
      emit(aC, al, (p >>> 24) & 0xff)
      pos += 1
    }
  }

  /** Symbol stream element: literal pixel, backref, or cache hit. */
  private sealed trait Tok
  private final case class Lit(p: Int) extends Tok
  private final case class Ref(len: Int, dist: Int) extends Tok
  private final case class Hit(idx: Int) extends Tok

  /** Entropy-code one ARGB image: tokenize (optional greedy LZ77 +
    * color cache), histogram, build length-limited canonical codes,
    * write the five code definitions and the token stream. */
  private def writeImageData(bw: BitWriter, argb: Array[Int], xsize: Int,
                             useLz77: Boolean, cacheBits: Int,
                             isLevel0: Boolean): Unit = {
    if (cacheBits > 0) { bw.writeBits(1, 1); bw.writeBits(cacheBits, 4) }
    else bw.writeBits(0, 1)
    // the meta-prefix bit exists ONLY on the level-0 image (sub-images
    // carry color cache + prefix codes, nothing else)
    if (isLevel0) bw.writeBits(0, 1) // single huffman group
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    // seen-flags, NOT a sentinel pixel: a real pixel equal to any
    // sentinel would emit a cache hit the decoder's never-written slot
    // cannot satisfy (silent wrong pixel)
    val cacheSeen = if (cacheSize > 0) new Array[Boolean](cacheSize) else null

    val toks = scala.collection.mutable.Buffer.empty[Tok]
    // greedy single-distance LZ77 candidates: distance 1 and xsize (the
    // two plane-mapped neighbors every image has) — hoisted, no per-pixel
    // allocation
    val dists = if (xsize == 1) Array(1) else Array(1, xsize)
    var pos = 0
    while (pos < argb.length) {
      var took = false
      if (useLz77 && pos >= 1) {
        var best = 0
        var bestD = 0
        var di = 0
        while (di < dists.length) {
          val d = dists(di)
          if (d <= pos) {
            var l = 0
            while (pos + l < argb.length && l < 4096 &&
              argb(pos + l - d) == argb(pos + l)) l += 1
            if (l > best) { best = l; bestD = d }
          }
          di += 1
        }
        if (best >= 3) {
          toks += Ref(best, bestD)
          var k = 0
          while (k < best) {
            if (cache != null) {
              val hh = cacheHash(argb(pos), cacheBits)
              cache(hh) = argb(pos); cacheSeen(hh) = true
            }
            pos += 1; k += 1
          }
          took = true
        }
      }
      if (!took) {
        val p = argb(pos)
        val hh = if (cache != null) cacheHash(p, cacheBits) else 0
        if (cache != null && cacheSeen(hh) && cache(hh) == p) toks += Hit(hh)
        else toks += Lit(p)
        if (cache != null) { cache(hh) = p; cacheSeen(hh) = true }
        pos += 1
      }
    }

    // histograms
    val gFreq = new Array[Long](256 + 24 + cacheSize)
    val rFreq = new Array[Long](256)
    val bFreq = new Array[Long](256)
    val aFreq = new Array[Long](256)
    val dFreq = new Array[Long](40)
    toks.foreach {
      case Lit(p) =>
        gFreq((p >> 8) & 0xff) += 1
        rFreq((p >> 16) & 0xff) += 1
        bFreq(p & 0xff) += 1
        aFreq((p >>> 24) & 0xff) += 1
      case Ref(len, dist) =>
        gFreq(256 + prefixEncode(len)._1) += 1
        dFreq(prefixEncode(unmapDistance(dist, xsize))._1) += 1
      case Hit(idx) => gFreq(280 + idx) += 1
    }
    if (dFreq.forall(_ == 0)) dFreq(0) = 1 // the spec requires all 5 codes
    val gl = codeLengths(gFreq, 15)
    val rl = codeLengths(rFreq, 15)
    val bl = codeLengths(bFreq, 15)
    val al = codeLengths(aFreq, 15)
    val dl = codeLengths(dFreq, 15)
    Seq(gl, rl, bl, al, dl).foreach(writeCodeDef(bw, _))
    val gC = canonicalCodes(gl); val rC = canonicalCodes(rl)
    val bC = canonicalCodes(bl); val aC = canonicalCodes(al)
    val dC = canonicalCodes(dl)
    // degenerate single-symbol codes emit 0 bits — precomputed, not
    // recounted per pixel
    val singleOf = Map(
      (gl: AnyRef) -> (gl.count(_ > 0) == 1), (rl: AnyRef) -> (rl.count(_ > 0) == 1),
      (bl: AnyRef) -> (bl.count(_ > 0) == 1), (al: AnyRef) -> (al.count(_ > 0) == 1),
      (dl: AnyRef) -> (dl.count(_ > 0) == 1))
    def emit(codes: Array[(Int, Int)], lens: Array[Int], sym: Int): Unit = {
      if (!singleOf(lens)) bw.writeCode(codes(sym)._1, codes(sym)._2)
    }
    toks.foreach {
      case Lit(p) =>
        emit(gC, gl, (p >> 8) & 0xff)
        emit(rC, rl, (p >> 16) & 0xff)
        emit(bC, bl, p & 0xff)
        emit(aC, al, (p >>> 24) & 0xff)
      case Ref(len, dist) =>
        val (lc, le, lv) = prefixEncode(len)
        emit(gC, gl, 256 + lc)
        if (le > 0) bw.writeBits(lv, le)
        val (dc, de, dv) = prefixEncode(unmapDistance(dist, xsize))
        emit(dC, dl, dc)
        if (de > 0) bw.writeBits(dv, de)
      case Hit(idx) => emit(gC, gl, 280 + idx)
    }
  }

  private def canonicalCodes(lengths: Array[Int]): Array[(Int, Int)] = {
    val maxLen = if (lengths.isEmpty) 0 else lengths.max
    val out = new Array[(Int, Int)](lengths.length)
    if (maxLen == 0) return out
    val blCount = new Array[Int](maxLen + 1)
    lengths.foreach(l => if (l > 0) blCount(l) += 1)
    val nextCode = new Array[Int](maxLen + 2)
    var code = 0
    var l = 1
    while (l <= maxLen) {
      code = (code + blCount(l - 1)) << 1
      nextCode(l) = code
      l += 1
    }
    var i = 0
    while (i < lengths.length) {
      if (lengths(i) > 0) {
        out(i) = (nextCode(lengths(i)), lengths(i))
        nextCode(lengths(i)) += 1
      }
      i += 1
    }
    out
  }

  /** Write one code definition: the simple form for 1-2 symbols, else
    * the code-length-coded normal form (zero runs via 17/18). */
  private def writeCodeDef(bw: BitWriter, lengths: Array[Int]): Unit = {
    val used = lengths.zipWithIndex.filter(_._1 > 0)
    if (used.length == 1 && used.head._2 < 256) {
      val s = used.head._2
      bw.writeBits(1, 1) // simple
      bw.writeBits(0, 1) // one symbol
      if (s < 2) { bw.writeBits(0, 1); bw.writeBits(s, 1) }
      else { bw.writeBits(1, 1); bw.writeBits(s, 8) }
      return
    }
    if (used.length == 2 && used.head._2 < 256 && used(1)._2 < 256 &&
        lengths(used.head._2) == 1 && lengths(used(1)._2) == 1) {
      bw.writeBits(1, 1); bw.writeBits(1, 1) // simple, two symbols
      val s0 = used.head._2
      if (s0 < 2) { bw.writeBits(0, 1); bw.writeBits(s0, 1) }
      else { bw.writeBits(1, 1); bw.writeBits(s0, 8) }
      bw.writeBits(used(1)._2, 8)
      return
    }
    bw.writeBits(0, 1) // normal
    // code-length tokens: literal lengths 0-15 with zero runs as 17/18
    val toks = scala.collection.mutable.Buffer.empty[(Int, Int, Int)] // (sym, extra, extraBits)
    // NOTE: without a max_symbol field the decoder reads length tokens
    // until the FULL alphabet is covered — trailing zeros are NOT
    // implicit and must be run-coded like any others
    var i = 0
    while (i < lengths.length) {
      if (lengths(i) == 0) {
        var run = 0
        while (i + run < lengths.length && lengths(i + run) == 0) run += 1
        var left = run
        while (left > 0) {
          if (left >= 11) {
            val take = math.min(left, 138)
            toks += ((18, take - 11, 7)); left -= take
          } else if (left >= 3) {
            toks += ((17, left - 3, 3)); left = 0
          } else {
            var k = 0
            while (k < left) { toks += ((0, 0, 0)); k += 1 }
            left = 0
          }
        }
        i += run
      } else {
        toks += ((lengths(i), 0, 0))
        i += 1
      }
    }
    // code-length-code over the 19 token symbols
    val clcFreq = new Array[Long](19)
    toks.foreach { case (s, _, _) => clcFreq(s) += 1 }
    if (clcFreq.count(_ > 0) < 2) clcFreq(if (clcFreq(0) == 0) 0 else 15) += 1
    val clcLen = codeLengths(clcFreq, 7)
    // emit lengths in ClcOrder, trimming trailing zeros (min 4)
    var numCl = 19
    while (numCl > 4 && clcLen(ClcOrder(numCl - 1)) == 0) numCl -= 1
    bw.writeBits(numCl - 4, 4)
    var k = 0
    while (k < numCl) { bw.writeBits(clcLen(ClcOrder(k)), 3); k += 1 }
    bw.writeBits(0, 1) // no max_symbol
    val clcCodes = canonicalCodes(clcLen)
    toks.foreach { case (s, extra, eb) =>
      bw.writeCode(clcCodes(s)._1, clcCodes(s)._2)
      if (eb > 0) bw.writeBits(extra, eb)
    }
  }
}
