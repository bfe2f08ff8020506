package graft.multimodal

import java.io.ByteArrayOutputStream

import scala.collection.mutable

/** A real GIF codec (the public GIF89a specification) — the third raster
  * leg of the multimodal pipeline after PNG and JPEG; GIFs are ubiquitous
  * in web crawls, so a 100 TB image corpus contains them whether or not
  * anyone wants animation. Decodes into the shared [[PngCodec.PngImage]]
  * shape (bit depth 8, palette expanded to RGB — or RGBA when a Graphic
  * Control Extension declares a transparent index) so the format-agnostic
  * image ops (tiles, resize, KNN, dedup) take GIF rows unchanged.
  *
  * Scope (fail-loud beyond it, never silent garbage):
  *  - GIF87a and GIF89a, global or local color table (one required)
  *  - [[decode]] (the still-image op): FIRST frame only, full-screen
  *    coverage required (no compositing pass to place a patch on) — a
  *    second image descriptor or a sub-rect still rejects loud.
  *    [[frames]] (round 16, the frame-sampling op): ALL frames,
  *    composited with disposal methods 0/1 (keep), 2 (restore the
  *    frame's RECT to background) and 3 (restore the rect to its
  *    PRE-FRAME state — round 17); PATCH frames — any in-bounds
  *    rectangle, the shape real animated GIFs use — paint at their
  *    (left, top); reserved disposal values 4-7 reject loud
  *  - interlaced (4-pass) and sequential row order
  *  - LZW decompression with the spec's variable code width (LSB-first
  *    bit packing, clear/end codes, deferred-clear full dictionary),
  *    strict pixel-count accounting — truncated or oversized streams
  *    reject
  *  - extensions (GCE/comment/application) skip via their sub-block
  *    chains; only the GCE's transparent index is honored
  *
  * Reference analogue: the reference decodes its media format for real
  * (PDFBox, Function.java:90-132); graft's image columns get the same
  * treatment per format.
  */
object GifCodec {

  /** True iff `content` starts with a GIF87a/GIF89a signature. */
  def isGif(b: Array[Byte]): Boolean =
    b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  /** One parsed (not yet composited) frame: row-major palette indices
    * over the frame's OWN rect (left/top/iw/ih — the full logical
    * screen for stills, any in-bounds rectangle for animation frames),
    * the palette in effect, the GCE's transparent index (−1 = none)
    * and disposal method (0/1 keep, 2 restore-rect-to-background,
    * 3 restore-rect-to-previous; 4-7 rejected in [[frames]]). */
  private final case class RawFrame(left: Int, top: Int, iw: Int, ih: Int,
                                    indices: Array[Byte], palette: Array[Byte],
                                    transparentIdx: Int, disposal: Int)

  /** Shared block walk: logical screen, background index, and every
    * frame's raw material. `allowMulti = false` keeps [[decode]]'s
    * still-image contract (second descriptor fails loud). */
  private def parseFrames(bytes: Array[Byte],
                          allowMulti: Boolean): (Int, Int, Int, Array[Byte], Seq[RawFrame]) = {
    require(isGif(bytes), "GifCodec: not a GIF (bad GIF87a/GIF89a signature)")
    def u8(i: Int): Int = {
      require(i < bytes.length, "GifCodec: truncated file")
      bytes(i) & 0xff
    }
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    val width = le16(6)
    val height = le16(8)
    require(width > 0 && height > 0, s"GifCodec: invalid dimensions ${width}x$height")
    val packed = u8(10)
    val bgIndex = u8(11)
    var pos = 13
    val gct: Array[Byte] =
      if ((packed & 0x80) != 0) {
        val n = 2 << (packed & 7)
        require(pos + 3 * n <= bytes.length, "GifCodec: truncated global color table")
        val t = java.util.Arrays.copyOfRange(bytes, pos, pos + 3 * n)
        pos += 3 * n
        t
      } else null

    // GCE state applies to the NEXT image only (spec 89a §23)
    var transparentIdx = -1
    var disposal = 0
    val frames = mutable.Buffer.empty[RawFrame]
    var done = false
    /** Skip a sub-block chain, returning the position after its 0 terminator. */
    def skipSubBlocks(p0: Int): Int = {
      var p = p0
      while (u8(p) != 0) p += 1 + u8(p)
      p + 1
    }
    while (!done) {
      u8(pos) match {
        case 0x3b => // trailer
          done = true
        case 0x21 => // extension
          val label = u8(pos + 1)
          if (label == 0xf9) { // Graphic Control Extension
            require(u8(pos + 2) == 4, "GifCodec: malformed GCE block size")
            val gp = u8(pos + 3)
            if ((gp & 1) != 0) transparentIdx = u8(pos + 6)
            // disposal is recorded raw: it only MEANS anything to the
            // compositing path, so [[frames]] validates it — a still
            // image with a stray disposal-3 GCE must keep decoding
            disposal = (gp >> 2) & 7
          }
          pos = skipSubBlocks(pos + 2)
        case 0x2c => // image descriptor
          require(allowMulti || frames.isEmpty,
            "GifCodec: second image descriptor — animated GIF beyond frame 1 out of scope")
          val left = le16(pos + 1); val top = le16(pos + 3)
          val iw = le16(pos + 5); val ih = le16(pos + 7)
          // a STILL decode demands full-screen coverage (no compositing
          // pass to place a patch on); the animation path accepts any
          // in-bounds rect (round 16 — the shape real animated GIFs use)
          require(allowMulti || (left == 0 && top == 0 && iw == width && ih == height),
            s"GifCodec: frame ${iw}x$ih at ($left,$top) does not cover the " +
              s"${width}x$height logical screen — still-image decode has no " +
              "compositing pass (use the animation path for patch frames)")
          require(iw > 0 && ih > 0 && left + iw <= width && top + ih <= height,
            s"GifCodec: frame ${iw}x$ih at ($left,$top) exceeds the " +
              s"${width}x$height logical screen")
          val ipacked = u8(pos + 9)
          val interlaced = (ipacked & 0x40) != 0
          pos += 10
          val palette: Array[Byte] =
            if ((ipacked & 0x80) != 0) {
              val n = 2 << (ipacked & 7)
              require(pos + 3 * n <= bytes.length, "GifCodec: truncated local color table")
              val t = java.util.Arrays.copyOfRange(bytes, pos, pos + 3 * n)
              pos += 3 * n
              t
            } else gct
          require(palette != null,
            "GifCodec: image has neither a local nor a global color table")
          val minCode = u8(pos)
          require(minCode >= 2 && minCode <= 8,
            s"GifCodec: LZW minimum code size $minCode out of range (2-8)")
          pos += 1
          // concatenate the sub-block chain into one LZW byte stream
          val data = new ByteArrayOutputStream()
          while (u8(pos) != 0) {
            val n = u8(pos)
            require(pos + 1 + n <= bytes.length, "GifCodec: truncated image data sub-block")
            data.write(bytes, pos + 1, n)
            pos += 1 + n
          }
          pos += 1
          val indices = lzwDecode(data.toByteArray, minCode, iw * ih)
          val rowMajor =
            if (!interlaced) indices
            else {
              // 4-pass interlace: rows 0+8k, 4+8k, 2+4k, 1+2k
              val out = new Array[Byte](indices.length)
              var src = 0
              for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
                var y = start
                while (y < ih) {
                  System.arraycopy(indices, src * iw, out, y * iw, iw)
                  src += 1
                  y += step
                }
              }
              out
            }
          val nEntries = palette.length / 3
          rowMajor.foreach { b =>
            require((b & 0xff) < nEntries,
              s"GifCodec: pixel index ${b & 0xff} out of range (color table has " +
                s"$nEntries entries)")
          }
          frames += RawFrame(left, top, iw, ih, rowMajor, palette,
            transparentIdx, disposal)
          transparentIdx = -1
          disposal = 0
        case other => throw new IllegalArgumentException(
          f"GifCodec: unknown block introducer 0x$other%02X at offset $pos")
      }
    }
    require(frames.nonEmpty, "GifCodec: trailer before any image data")
    (width, height, bgIndex, gct, frames.toSeq)
  }

  def decode(bytes: Array[Byte]): PngCodec.PngImage = {
    val (width, height, _, _, fs) = parseFrames(bytes, allowMulti = false)
    val RawFrame(_, _, _, _, rowMajor, palette, transparentIdx, _) = fs.head
    val outCh = if (transparentIdx >= 0) 4 else 3
    val px = new Array[Byte](rowMajor.length * outCh)
    var i = 0
    while (i < rowMajor.length) {
      val idx = rowMajor(i) & 0xff
      px(outCh * i) = palette(3 * idx)
      px(outCh * i + 1) = palette(3 * idx + 1)
      px(outCh * i + 2) = palette(3 * idx + 2)
      if (outCh == 4)
        px(4 * i + 3) = if (idx == transparentIdx) 0 else 0xff.toByte
      i += 1
    }
    PngCodec.PngImage(width, height, 8, if (outCh == 4) 6 else 2, outCh, px)
  }

  /** ANIMATED-GIF frame sampling (round 16): every frame COMPOSITED the
    * way a viewer displays it — the canvas starts at the background
    * color (the spec's initial state; black when no global table),
    * each full-rect frame paints its opaque pixels over the canvas
    * (transparent pixels let the prior state show through), and the
    * frame's disposal method then either keeps the result (0/1),
    * restores the frame rect to the background color (2), or restores
    * it to its pre-frame state (3, round 17) before the next frame.
    * Output is one RGB [[PngCodec.PngImage]] snapshot per frame, ready
    * for the tile-feature pipeline. */
  def frames(bytes: Array[Byte]): Seq[PngCodec.PngImage] = {
    val (width, height, bgIndex, gct, fs) = parseFrames(bytes, allowMulti = true)
    val n = width * height
    val bg = new Array[Byte](3)
    if (gct != null && bgIndex < gct.length / 3) {
      bg(0) = gct(3 * bgIndex); bg(1) = gct(3 * bgIndex + 1); bg(2) = gct(3 * bgIndex + 2)
    }
    val canvas = new Array[Byte](n * 3)
    var i = 0
    while (i < n) {
      canvas(3 * i) = bg(0); canvas(3 * i + 1) = bg(1); canvas(3 * i + 2) = bg(2)
      i += 1
    }
    fs.map { case RawFrame(left, top, iw, ih, indices, palette, transparentIdx,
                           disposal) =>
      // disposal only matters when COMPOSITING, so the scope check
      // lives here, not in the shared parse ([[decode]] tolerates a
      // stray disposal-3 GCE on a still image the way real viewers do)
      require(disposal <= 3,
        s"GifCodec: disposal method $disposal reserved " +
          "(0/1 keep, 2 restore-to-background, 3 restore-to-previous)")
      // disposal 3 (round 17): the canvas must return to its PRE-FRAME
      // state after the snapshot — only the frame's rect can change
      // during painting, so saving that rect suffices
      val saved =
        if (disposal == 3) {
          val s = new Array[Byte](ih * iw * 3)
          var ry = 0
          while (ry < ih) {
            System.arraycopy(canvas, ((top + ry) * width + left) * 3,
              s, ry * iw * 3, iw * 3)
            ry += 1
          }
          s
        } else null
      var fy = 0
      while (fy < ih) {
        var fx = 0
        while (fx < iw) {
          val idx = indices(fy * iw + fx) & 0xff
          if (idx != transparentIdx) {
            val p = (top + fy) * width + (left + fx)
            canvas(3 * p) = palette(3 * idx)
            canvas(3 * p + 1) = palette(3 * idx + 1)
            canvas(3 * p + 2) = palette(3 * idx + 2)
          }
          fx += 1
        }
        fy += 1
      }
      val snapshot = java.util.Arrays.copyOf(canvas, canvas.length)
      if (disposal == 2) {
        // spec 89a: restore THE AREA USED BY THE GRAPHIC to the
        // background color — rect-scoped, not whole-canvas (identical
        // for the full-rect frames the round-15 scope carried)
        var ry = 0
        while (ry < ih) {
          var rx = 0
          while (rx < iw) {
            val p = (top + ry) * width + (left + rx)
            canvas(3 * p) = bg(0); canvas(3 * p + 1) = bg(1); canvas(3 * p + 2) = bg(2)
            rx += 1
          }
          ry += 1
        }
      } else if (disposal == 3) {
        // spec 89a: restore to previous — put the pre-frame rect back
        var ry = 0
        while (ry < ih) {
          System.arraycopy(saved, ry * iw * 3,
            canvas, ((top + ry) * width + left) * 3, iw * 3)
          ry += 1
        }
      }
      PngCodec.PngImage(width, height, 8, 2, 3, snapshot)
    }
  }

  /** GIF-variant LZW decode: LSB-first bit packing, variable code width
    * growing at avail == 1<<width (capped 12), clear/end codes, the
    * KwKwK case, no dictionary adds once full (until a clear). Produces
    * EXACTLY `expected` pixels or fails loud. */
  private def lzwDecode(data: Array[Byte], minCode: Int, expected: Int): Array[Byte] = {
    val clear = 1 << minCode
    val end = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val out = new Array[Byte](expected)
    var outLen = 0
    var avail = end + 1
    var codeSize = minCode + 1
    var prev = -1
    var bitPos = 0
    val totalBits = data.length * 8
    def readCode(): Int = {
      require(bitPos + codeSize <= totalBits,
        "GifCodec: LZW stream truncated mid-code")
      var v = 0
      var i = 0
      while (i < codeSize) {
        val p = bitPos + i
        if ((data(p >> 3) & (1 << (p & 7))) != 0) v |= 1 << i
        i += 1
      }
      bitPos += codeSize
      v
    }
    /** Expand `code` into out (reversed walk through the prefix chain). */
    def emit(code: Int, extra: Int): Unit = {
      // count the chain length first, then fill backwards
      var n = 1 + (if (extra >= 0) 1 else 0)
      var c = code
      while (c >= clear + 2) { n += 1; c = prefix(c) }
      require(outLen + n <= expected,
        s"GifCodec: LZW emits more than the ${expected}-pixel frame")
      var w = outLen + n - 1
      if (extra >= 0) { out(w) = extra.toByte; w -= 1 }
      c = code
      while (c >= clear + 2) { out(w) = suffix(c); w -= 1; c = prefix(c) }
      require(c < clear, s"GifCodec: corrupt LZW chain (root $c)")
      out(w) = c.toByte
      outLen += n
    }
    def firstChar(code: Int): Int = {
      var c = code
      while (c >= clear + 2) c = prefix(c)
      c
    }
    var finished = false
    while (!finished) {
      val code = readCode()
      if (code == clear) {
        avail = end + 1; codeSize = minCode + 1; prev = -1
      } else if (code == end) {
        finished = true
      } else if (prev < 0) {
        require(code < clear, s"GifCodec: first LZW code $code is not a literal")
        emit(code, -1)
        prev = code
      } else {
        require(code <= avail,
          s"GifCodec: LZW code $code beyond dictionary ($avail)")
        // first char of string(code); for the KwKwK case (code == avail,
        // whose entry doesn't exist yet) string(code) = string(prev) +
        // first(string(prev)), so its first char is prev's
        val fc = firstChar(if (code == avail) prev else code)
        if (code == avail) {
          require(avail < 4096, "GifCodec: LZW KwKwK with a full dictionary")
          emit(prev, fc)
        } else emit(code, -1)
        if (avail < 4096) {
          prefix(avail) = prev
          suffix(avail) = fc.toByte
          avail += 1
          if (avail == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
      if (!finished && outLen == expected) {
        // spec: an explicit end code follows the last pixel
        val c = readCode()
        require(c == end || c == clear,
          s"GifCodec: expected LZW end code after $expected pixels, got $c")
        finished = true
      }
    }
    require(outLen == expected,
      s"GifCodec: LZW stream ended with $outLen of $expected pixels")
    out
  }

  /** GIF ENCODE for fixtures and in-engine synthesis (the PNG/JPEG
    * convention): GIF89a, global color table, one full-screen image.
    * `palette` is RGB triples (2-256 entries), `indices` row-major
    * palette indices; `interlace` writes the 4-pass layout;
    * `transparentIdx` adds a GCE so the decoder returns RGBA. */
  def encode(width: Int, height: Int, palette: Array[Byte], indices: Array[Byte],
             interlace: Boolean = false, transparentIdx: Option[Int] = None): Array[Byte] = {
    require(width > 0 && height > 0, s"GifCodec.encode: invalid dimensions ${width}x$height")
    require(indices.length == width * height,
      s"GifCodec.encode: ${indices.length} indices, geometry wants ${width * height}")
    require(palette.length % 3 == 0 && palette.length >= 6 && palette.length <= 768,
      s"GifCodec.encode: palette of ${palette.length} bytes (want 2-256 RGB triples)")
    val nEntries = palette.length / 3
    indices.foreach(ix => require((ix & 0xff) < nEntries,
      s"GifCodec.encode: index ${ix & 0xff} out of the $nEntries-entry palette"))
    transparentIdx.foreach(t => require(t >= 0 && t < nEntries,
      s"GifCodec.encode: transparent index $t out of the $nEntries-entry palette"))
    // GCT size field: 2^(f+1) >= nEntries
    var f = 0
    while ((2 << f) < nEntries) f += 1
    val gctEntries = 2 << f
    val out = new ByteArrayOutputStream(indices.length / 2 + 64)
    def w8(v: Int): Unit = out.write(v & 0xff)
    def le16(v: Int): Unit = { w8(v); w8(v >> 8) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(width); le16(height)
    w8(0x80 | f) // GCT present, size f (color resolution bits 0 — unused by readers)
    w8(0); w8(0) // background, aspect
    out.write(palette, 0, palette.length)
    for (i <- palette.length / 3 until gctEntries) { w8(0); w8(0); w8(0) }
    transparentIdx.foreach { t =>
      w8(0x21); w8(0xf9); w8(4); w8(1); le16(0); w8(t); w8(0)
    }
    w8(0x2c); le16(0); le16(0); le16(width); le16(height)
    w8(if (interlace) 0x40 else 0) // no LCT
    val ordered =
      if (!interlace) indices
      else {
        val o = new ByteArrayOutputStream(indices.length)
        for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
          var y = start
          while (y < height) { o.write(indices, y * width, width); y += step }
        }
        o.toByteArray
      }
    val minCode = math.max(2, f + 1)
    w8(minCode)
    val lzw = lzwEncode(ordered, minCode)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      w8(n); out.write(lzw, off, n)
      off += n
    }
    w8(0)   // block terminator
    w8(0x3b) // trailer
    out.toByteArray
  }

  /** One frame of [[encodeAnimFrames]]: a patch rect (the full screen
    * or any in-bounds rectangle), its row-major indices, and the GCE
    * material [[frames]] composites by. */
  final case class AnimFrame(left: Int, top: Int, iw: Int, ih: Int,
                             indices: Array[Byte], transparentIdx: Option[Int],
                             disposal: Int)

  /** ANIMATED-GIF ENCODE: GIF89a with one global color table and a
    * full-screen image per frame, each preceded by a Graphic Control
    * Extension carrying its `(transparentIdx, disposal)` — the wire
    * shape [[frames]] composites. Disposal 0-3 (the decode scope). */
  def encodeAnim(width: Int, height: Int, palette: Array[Byte],
                 frameSpecs: Seq[(Array[Byte], Option[Int], Int)]): Array[Byte] =
    encodeAnimFrames(width, height, palette, frameSpecs.map {
      case (indices, t, d) => AnimFrame(0, 0, width, height, indices, t, d)
    })

  /** [[encodeAnim]] with PER-FRAME PATCH RECTS — the wire shape real
    * animated GIFs use (frame 0 full-screen, later frames small
    * changed-region patches). */
  def encodeAnimFrames(width: Int, height: Int, palette: Array[Byte],
                       frameSpecs: Seq[AnimFrame]): Array[Byte] = {
    require(width > 0 && height > 0, s"GifCodec.encodeAnim: invalid ${width}x$height")
    require(frameSpecs.nonEmpty, "GifCodec.encodeAnim: no frames")
    require(palette.length % 3 == 0 && palette.length >= 6 && palette.length <= 768,
      s"GifCodec.encodeAnim: palette of ${palette.length} bytes (want 2-256 RGB triples)")
    val nEntries = palette.length / 3
    var f = 0
    while ((2 << f) < nEntries) f += 1
    val gctEntries = 2 << f
    val out = new ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def le16(v: Int): Unit = { w8(v); w8(v >> 8) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(width); le16(height)
    w8(0x80 | f); w8(0); w8(0) // GCT present, background index 0, aspect
    out.write(palette, 0, palette.length)
    for (i <- palette.length / 3 until gctEntries) { w8(0); w8(0); w8(0) }
    frameSpecs.foreach { case AnimFrame(left, top, iw, ih, indices,
                                        transparentIdx, disposal) =>
      require(iw > 0 && ih > 0 && left >= 0 && top >= 0 &&
          left + iw <= width && top + ih <= height,
        s"GifCodec.encodeAnim: rect ${iw}x$ih at ($left,$top) exceeds " +
          s"the ${width}x$height screen")
      require(indices.length == iw * ih,
        s"GifCodec.encodeAnim: ${indices.length} indices, rect wants ${iw * ih}")
      indices.foreach(ix => require((ix & 0xff) < nEntries,
        s"GifCodec.encodeAnim: index ${ix & 0xff} out of the $nEntries-entry palette"))
      transparentIdx.foreach(t => require(t >= 0 && t < nEntries,
        s"GifCodec.encodeAnim: transparent index $t out of the $nEntries-entry palette"))
      require(disposal >= 0 && disposal <= 3,
        s"GifCodec.encodeAnim: disposal $disposal out of the decode scope (0-3)")
      w8(0x21); w8(0xf9); w8(4)
      w8((disposal << 2) | (if (transparentIdx.isDefined) 1 else 0))
      le16(0); w8(transparentIdx.getOrElse(0)); w8(0)
      w8(0x2c); le16(left); le16(top); le16(iw); le16(ih); w8(0)
      val minCode = math.max(2, f + 1)
      w8(minCode)
      val lzw = lzwEncode(indices, minCode)
      var off = 0
      while (off < lzw.length) {
        val nn = math.min(255, lzw.length - off)
        w8(nn); out.write(lzw, off, nn)
        off += nn
      }
      w8(0)
    }
    w8(0x3b)
    out.toByteArray
  }

  /** GIF-variant LZW encode, the exact mirror of [[lzwDecode]]'s code-
    * width growth (encoder grows at avail == (1<<width)+1 because its
    * dictionary runs one entry ahead of the decoder's at read time). */
  private def lzwEncode(pixels: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val end = clear + 1
    val out = new ByteArrayOutputStream(pixels.length)
    var bitBuf = 0
    var bitCnt = 0
    var codeSize = minCode + 1
    def write(code: Int): Unit = {
      bitBuf |= code << bitCnt
      bitCnt += codeSize
      while (bitCnt >= 8) { out.write(bitBuf & 0xff); bitBuf >>>= 8; bitCnt -= 8 }
    }
    var dict = mutable.HashMap.empty[(Int, Int), Int]
    var avail = end + 1
    write(clear)
    var cur = pixels(0) & 0xff
    var i = 1
    while (i < pixels.length) {
      val px = pixels(i) & 0xff
      dict.get((cur, px)) match {
        case Some(c) => cur = c
        case None =>
          write(cur)
          if (avail < 4096) {
            dict((cur, px)) = avail
            avail += 1
            if (avail == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
          } else {
            // dictionary full: clear and restart (the decoder resets too)
            write(clear)
            dict = mutable.HashMap.empty
            avail = end + 1
            codeSize = minCode + 1
          }
          cur = px
      }
      i += 1
    }
    write(cur)
    // the decoder adds one more dictionary entry after reading that final
    // data code — catching up to the encoder's count, which runs one
    // ahead mid-stream — so if its avail lands exactly on a width
    // boundary it reads END at the grown width; mirror that here
    if (avail == (1 << codeSize) && codeSize < 12) codeSize += 1
    write(end)
    if (bitCnt > 0) out.write(bitBuf & 0xff)
    out.toByteArray
  }
}
