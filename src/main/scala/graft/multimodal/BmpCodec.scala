package graft.multimodal

import java.io.ByteArrayOutputStream

/** A real Windows BMP codec (the public BITMAPFILEHEADER /
  * BITMAPINFOHEADER wire format) — the fifth raster leg; BMPs are
  * ubiquitous in older web crawls and clipboard-derived corpora.
  * Decodes into the shared [[PngCodec.PngImage]] shape so the
  * format-agnostic image ops (tiles, resize, KNN, dedup) take BMP rows
  * unchanged.
  *
  * Scope (fail-loud beyond it, never silent garbage):
  *  - 'BM' magic; DIB headers: the 40-byte BITMAPINFOHEADER, its
  *    V2-V5 supersets (52/56/108/124 bytes — V5 is the modern Windows
  *    clipboard export; the added mask/colorimetry fields are unused
  *    under the carried compressions) and the 12-byte OS/2
  *    BITMAPCOREHEADER (BGR-triple palette, u16 dims, BI_RGB
  *    bottom-up) — round 17
  *  - bit depths 4 and 8 (paletted, expanded to RGB; 4-bit packs two
  *    high-nibble-first pixels per byte — round 17) and 24 (BGR → RGB)
  *  - BI_RGB, BI_RLE8 and BI_RLE4 (round 17 — encoded/absolute runs,
  *    EOL/EOB/delta escapes, word-aligned absolute data; skipped cells
  *    take index 0; RLE4 encoded runs alternate the value byte's
  *    nibbles); bitfield compressions reject
  *  - bottom-up (positive height, the common shape) AND top-down
  *    (negative height) row orders; rows padded to 4-byte multiples
  *  - the declared data offset, palette size and row accounting must
  *    agree with the geometry — truncation rejects
  *
  * Reference analogue: the reference decodes its media format for real
  * (PDFBox, Function.java:90-132); graft's image columns get the same
  * treatment per format. */
object BmpCodec {

  /** True iff `content` starts with the 'BM' magic. */
  def isBmp(b: Array[Byte]): Boolean =
    b.length >= 2 && b(0) == 'B' && b(1) == 'M'

  def decode(bytes: Array[Byte]): PngCodec.PngImage = {
    require(isBmp(bytes), "BmpCodec: not a BMP (missing BM magic)")
    def u8(i: Int): Int = {
      require(i >= 0 && i < bytes.length, "BmpCodec: truncated file")
      bytes(i) & 0xff
    }
    def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def u32(i: Int): Long = u16(i).toLong | (u16(i + 2).toLong << 16)
    def i32(i: Int): Int = u32(i).toInt

    val dataOffset = u32(10)
    val dibSize = u32(14)
    // 40 = BITMAPINFOHEADER (the universal core); 52/56/108/124 =
    // V2/V3/V4/V5 SUPERSETS (round 17 — V5 is what modern Windows
    // clipboard exports write; the added fields are masks/colorimetry
    // this decoder never needs under the compressions it accepts);
    // 12 = the OS/2 BITMAPCOREHEADER (round 17 — 3-byte palette
    // triples, u16 dims, always BI_RGB bottom-up)
    val core = dibSize == 12
    require(dibSize == 40 || dibSize == 52 || dibSize == 56 ||
        dibSize == 108 || dibSize == 124 || core,
      s"BmpCodec: DIB header of $dibSize bytes unsupported " +
        "(12-byte OS/2 core, 40-byte BITMAPINFOHEADER or its V2-V5 supersets)")
    val width = if (core) u16(18) else i32(18)
    val rawHeight = if (core) u16(20) else i32(22)
    // negative height = top-down row order (the less common but legal shape)
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    require(width > 0 && height > 0 && width <= (1 << 20) && height <= (1 << 20),
      s"BmpCodec: invalid dimensions ${width}x$rawHeight")
    require(u16(if (core) 22 else 26) == 1,
      s"BmpCodec: planes ${u16(if (core) 22 else 26)} (want 1)")
    val bpp = u16(if (core) 24 else 28)
    // 4-bit paletted (round 17) joins 8/24 — legacy clip-art corpora
    require(bpp == 4 || bpp == 8 || bpp == 24,
      s"BmpCodec: $bpp bits/pixel unsupported (4/8 paletted or 24 BGR)")
    val compression = if (core) 0L else u32(30)
    // 1 = BI_RLE8, 2 = BI_RLE4 (round 17 — legacy clip-art corpora);
    // bitfields still reject
    require(compression == 0 || compression == 1 || compression == 2,
      s"BmpCodec: compression $compression unsupported (BI_RGB, BI_RLE8 or " +
        "BI_RLE4 — bitfields out of scope)")
    require(compression != 1 || bpp == 8,
      s"BmpCodec: BI_RLE8 with $bpp bits/pixel (8 only)")
    require(compression != 2 || bpp == 4,
      s"BmpCodec: BI_RLE4 with $bpp bits/pixel (4 only)")
    require(compression == 0 || !topDown,
      "BmpCodec: RLE with top-down row order is invalid (spec: RLE " +
        "bitmaps are bottom-up)")
    val colorsUsed = if (core) 0 else u32(46).toInt
    // the palette follows the DIB header directly: BGRA quads for the
    // 40-byte family, bare BGR TRIPLES for the OS/2 core header
    val palStart = 14 + dibSize.toInt
    val palEntry = if (core) 3 else 4

    val palette: Array[Byte] =
      if (bpp == 8 || bpp == 4) {
        // the core header has no colorsUsed field: infer the palette
        // size from the gap between header and pixel data (the
        // real-world OS/2 convention)
        val n =
          if (colorsUsed != 0) colorsUsed
          else if (core) ((dataOffset - palStart) / palEntry).toInt
          else 1 << bpp
        require(n >= 1 && n <= (1 << bpp),
          s"BmpCodec: palette of $n entries (1-${1 << bpp} at $bpp bpp)")
        require(palStart + palEntry * n <= bytes.length,
          "BmpCodec: truncated palette")
        val t = new Array[Byte](3 * n)
        var k = 0
        while (k < n) {
          t(3 * k) = bytes(palStart + palEntry * k + 2)     // R
          t(3 * k + 1) = bytes(palStart + palEntry * k + 1) // G
          t(3 * k + 2) = bytes(palStart + palEntry * k)     // B
          k += 1
        }
        t
      } else null
    val nPal = if (palette == null) 0 else palette.length / 3

    val rowBytes = (width * bpp + 31) / 32 * 4 // bit-exact, padded to 4
    // the data offset must CLEAR the header AND the palette — a
    // malformed file whose pixel data overlaps the palette would
    // otherwise decode the palette bytes as indices, silent garbage
    require(dataOffset >= palStart + palEntry.toLong * nPal &&
        (if (compression != 0) dataOffset < bytes.length
         else dataOffset + rowBytes.toLong * height <= bytes.length),
      s"BmpCodec: pixel data at $dataOffset (${rowBytes.toLong * height} bytes) " +
        s"overlaps the header/palette (${palStart + palEntry * nPal} bytes) or " +
        s"runs past EOF (${bytes.length})")
    // Long math: both dims can pass the 2^20 cap while w·h·3 wraps Int.
    // This bound must run BEFORE the RLE expansion below — the expanded
    // index buffer is width·height bytes, and a tiny hostile header
    // must not allocate it (decompression-bomb guard)
    require(width.toLong * height * 3 <= (1L << 30),
      s"BmpCodec: ${width}x$height decodes past the 2^30-byte bound")
    // RLE: expand the run stream to storage-order indices first (row 0
    // = bottom row, matching the uncompressed layout). The stream is
    // bounded by biSizeImage — REQUIRED nonzero for RLE per the spec —
    // so conforming V4/V5 files may carry profile data after it
    val rleEnd: Int =
      if (compression == 0) 0
      else {
        val sizeImage = u32(34)
        require(sizeImage > 0 && dataOffset + sizeImage <= bytes.length,
          s"BmpCodec: RLE biSizeImage $sizeImage does not bound a stream " +
            s"inside the ${bytes.length}-byte file (offset $dataOffset)")
        (dataOffset + sizeImage).toInt
      }
    val rleIndices: Array[Byte] =
      if (compression == 1) decodeRle8(bytes, dataOffset.toInt, rleEnd, width, height)
      else if (compression == 2) decodeRle4(bytes, dataOffset.toInt, rleEnd, width, height)
      else null
    val out = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      val rowAt = dataOffset.toInt + srcRow * rowBytes
      var x = 0
      while (x < width) {
        val o = (y * width + x) * 3
        if (bpp == 24) {
          // BGR on the wire
          out(o) = bytes(rowAt + 3 * x + 2)
          out(o + 1) = bytes(rowAt + 3 * x + 1)
          out(o + 2) = bytes(rowAt + 3 * x)
        } else {
          val idx =
            (if (rleIndices != null) rleIndices(srcRow * width + x) & 0xff
             else if (bpp == 8) bytes(rowAt + x) & 0xff
             else // 4-bit: two pixels per byte, HIGH nibble first
               (bytes(rowAt + (x >> 1)) >> (if ((x & 1) == 0) 4 else 0)) & 0xf)
          require(idx < nPal,
            s"BmpCodec: pixel index $idx out of the $nPal-entry palette")
          out(o) = palette(3 * idx)
          out(o + 1) = palette(3 * idx + 1)
          out(o + 2) = palette(3 * idx + 2)
        }
        x += 1
      }
      y += 1
    }
    PngCodec.PngImage(width, height, 8, 2, 3, out)
  }

  /** BI_RLE8 decode (round 17): encoded runs (count, index), escapes
    * (0,0) end-of-line, (0,1) end-of-bitmap, (0,2) delta (dx, dy cursor
    * jump) and (0,n≥3) absolute runs (word-padded). Pixels a delta or
    * an early EOL/EOB skips take palette index 0 — the documented
    * decoder convention for the spec's "undefined" cells. Runs may not
    * cross scan lines; truncation and cursor overruns reject loud. */
  private def decodeRle8(bytes: Array[Byte], at: Int, end: Int, width: Int,
                         height: Int): Array[Byte] = {
    val out = new Array[Byte](width * height) // index 0 = the skip default
    var p = at
    def u8(): Int = {
      require(p < end, "BmpCodec: RLE8 stream truncated")
      val v = bytes(p) & 0xff; p += 1; v
    }
    var x = 0
    var y = 0 // storage row (0 = bottom)
    var done = false
    while (!done) {
      val n = u8()
      val b = u8()
      if (n > 0) {
        // encoded run: n pixels of index b, confined to the scan line
        require(y < height && x + n <= width,
          s"BmpCodec: RLE8 run of $n at ($x,$y) crosses the scan line " +
            s"(${width}x$height)")
        java.util.Arrays.fill(out, y * width + x, y * width + x + n, b.toByte)
        x += n
      } else b match {
        case 0 => // end of line
          require(y < height, "BmpCodec: RLE8 end-of-line past the last row")
          x = 0; y += 1
        case 1 => done = true // end of bitmap
        case 2 => // delta: cursor jump; skipped pixels stay index 0
          val dx = u8(); val dy = u8()
          require(y + dy < height && x + dx <= width,
            s"BmpCodec: RLE8 delta ($dx,$dy) from ($x,$y) leaves the bitmap")
          x += dx; y += dy
        case abs => // absolute run: abs literal indices, word-padded
          require(y < height && x + abs <= width,
            s"BmpCodec: RLE8 absolute run of $abs at ($x,$y) crosses the " +
              s"scan line (${width}x$height)")
          var k = 0
          while (k < abs) { out(y * width + x + k) = u8().toByte; k += 1 }
          // word alignment is the spec rule; the pad byte's CONTENT is
          // unspecified, so consume without asserting its value
          if ((abs & 1) != 0) u8()
          x += abs
      }
    }
    require(p == end,
      s"BmpCodec: ${end - p} byte(s) between the RLE8 end-of-bitmap and " +
        "the declared biSizeImage")
    out
  }

  /** BI_RLE4 decode (round 17): like [[decodeRle8]] but PIXELS ARE
    * NIBBLES — an encoded run (n, b) paints n pixels ALTERNATING b's
    * high and low nibbles; an absolute run of n pixels packs them two
    * per byte, high nibble first, padded to a 16-bit boundary
    * (ceil(n/2) rounded up to even bytes, pads zero). Escapes and the
    * index-0 skip convention match RLE8. */
  private def decodeRle4(bytes: Array[Byte], at: Int, end: Int, width: Int,
                         height: Int): Array[Byte] = {
    val out = new Array[Byte](width * height)
    var p = at
    def u8(): Int = {
      require(p < end, "BmpCodec: RLE4 stream truncated")
      val v = bytes(p) & 0xff; p += 1; v
    }
    var x = 0
    var y = 0 // storage row (0 = bottom)
    var done = false
    while (!done) {
      val n = u8()
      val b = u8()
      if (n > 0) {
        require(y < height && x + n <= width,
          s"BmpCodec: RLE4 run of $n at ($x,$y) crosses the scan line " +
            s"(${width}x$height)")
        var k = 0
        while (k < n) {
          out(y * width + x + k) =
            (if ((k & 1) == 0) (b >> 4) & 0xf else b & 0xf).toByte
          k += 1
        }
        x += n
      } else b match {
        case 0 =>
          require(y < height, "BmpCodec: RLE4 end-of-line past the last row")
          x = 0; y += 1
        case 1 => done = true
        case 2 =>
          val dx = u8(); val dy = u8()
          require(y + dy < height && x + dx <= width,
            s"BmpCodec: RLE4 delta ($dx,$dy) from ($x,$y) leaves the bitmap")
          x += dx; y += dy
        case abs =>
          require(y < height && x + abs <= width,
            s"BmpCodec: RLE4 absolute run of $abs at ($x,$y) crosses the " +
              s"scan line (${width}x$height)")
          // abs nibbles → ceil(abs/2) bytes, padded to an EVEN byte count
          val dataBytes = (abs + 1) / 2
          val padBytes = (dataBytes + 1) / 2 * 2 - dataBytes
          var k = 0
          var cur = 0
          while (k < abs) {
            if ((k & 1) == 0) { cur = u8(); out(y * width + x + k) = ((cur >> 4) & 0xf).toByte }
            else out(y * width + x + k) = (cur & 0xf).toByte
            k += 1
          }
          // word alignment is the spec rule; pad content is unspecified
          var pd = 0
          while (pd < padBytes) { u8(); pd += 1 }
          x += abs
      }
    }
    require(p == end,
      s"BmpCodec: ${end - p} byte(s) between the RLE4 end-of-bitmap and " +
        "the declared biSizeImage")
    out
  }

  /** BMP ENCODE for fixtures and in-engine synthesis: 24-bit BGR (the
    * common shape), 8-bit or — with `bpp4` — 4-bit paletted; `topDown`
    * writes a negative height; `rle8`/`rle4` (round 17) write the
    * run-length forms (paletted bottom-up only, one end-of-line per
    * row, end-of-bitmap last). `pixels` is packed RGB (24-bit) or
    * palette indices (with `palette` RGB triples). */
  def encode(width: Int, height: Int, pixels: Array[Byte],
             palette: Array[Byte] = null, topDown: Boolean = false,
             rle8: Boolean = false, bpp4: Boolean = false,
             rle4: Boolean = false, dib: Int = 40): Array[Byte] = {
    require(width > 0 && height > 0, s"BmpCodec.encode: invalid ${width}x$height")
    // 12 = OS/2 core (BGR-triple palette, u16 dims, BI_RGB bottom-up
    // only); 108/124 = V4/V5 supersets (zero-filled extension fields)
    require(dib == 12 || dib == 40 || dib == 108 || dib == 124,
      s"BmpCodec.encode: DIB size $dib (12, 40, 108 or 124)")
    val core = dib == 12
    require(!core || (!topDown && !rle8 && !rle4),
      "BmpCodec.encode: the OS/2 core header is BI_RGB bottom-up only")
    require(!core || width <= 0xffff && height <= 0xffff,
      "BmpCodec.encode: core-header dims are 16-bit")
    require(!rle8 || (palette != null && !bpp4 && !topDown),
      "BmpCodec.encode: rle8 needs 8-bit paletted bottom-up")
    require(!bpp4 || palette != null, "BmpCodec.encode: bpp4 needs a palette")
    require(!rle4 || (bpp4 && !topDown),
      "BmpCodec.encode: rle4 needs 4-bit paletted bottom-up")
    val bpp = if (palette == null) 24 else if (bpp4) 4 else 8
    if (bpp == 24)
      require(pixels.length == width * height * 3,
        s"BmpCodec.encode: ${pixels.length} RGB bytes, geometry wants " +
          s"${width * height * 3}")
    else {
      require(pixels.length == width * height,
        s"BmpCodec.encode: ${pixels.length} indices, geometry wants ${width * height}")
      require(palette.length % 3 == 0 && palette.length >= 3 &&
          palette.length <= (1 << bpp) * 3,
        s"BmpCodec.encode: palette of ${palette.length} bytes " +
          s"(1-${1 << bpp} RGB triples at $bpp bpp)")
      val n = palette.length / 3
      pixels.foreach(ix => require((ix & 0xff) < n,
        s"BmpCodec.encode: index ${ix & 0xff} out of the $n-entry palette"))
    }
    val nPal = if (bpp == 24) 0 else palette.length / 3
    val rowBytes = (width * bpp + 31) / 32 * 4
    val palEntry = if (core) 3 else 4
    val dataOffset = 14 + dib + palEntry * nPal

    // pixel payload first (RLE size is data-dependent)
    val pix = new ByteArrayOutputStream(rowBytes * height)
    if (rle4) {
      // encoded runs only: n pixels of a (hi, lo)-alternating value
      // byte — a uniform run repeats the same nibble in both halves
      var y = 0 // storage row (0 = bottom)
      while (y < height) {
        val srcRow = height - 1 - y
        var x = 0
        while (x < width) {
          val v = pixels(srcRow * width + x) & 0xf
          var n = 1
          while (x + n < width && n < 255 &&
            (pixels(srcRow * width + x + n) & 0xf) == v) n += 1
          pix.write(n); pix.write((v << 4) | v)
          x += n
        }
        pix.write(0); pix.write(if (y == height - 1) 1 else 0) // EOL / EOB
        y += 1
      }
    } else if (rle8) {
      // storage order = bottom-up: encoded runs of ≤255, one
      // end-of-line per row, end-of-bitmap after the last
      var y = 0 // storage row (0 = bottom), like the uncompressed layout
      while (y < height) {
        val srcRow = height - 1 - y
        var x = 0
        while (x < width) {
          val v = pixels(srcRow * width + x) & 0xff
          var n = 1
          while (x + n < width && n < 255 &&
            (pixels(srcRow * width + x + n) & 0xff) == v) n += 1
          pix.write(n); pix.write(v)
          x += n
        }
        pix.write(0); pix.write(if (y == height - 1) 1 else 0) // EOL / EOB
        y += 1
      }
    } else {
      val pad = rowBytes - (width * bpp + 7) / 8
      var y = 0
      while (y < height) {
        val srcRow = if (topDown) y else height - 1 - y
        var x = 0
        while (x < width) {
          if (bpp == 24) {
            val o = (srcRow * width + x) * 3
            pix.write(pixels(o + 2) & 0xff); pix.write(pixels(o + 1) & 0xff)
            pix.write(pixels(o) & 0xff)
          } else if (bpp == 8) pix.write(pixels(srcRow * width + x) & 0xff)
          else { // 4-bit: two pixels per byte, HIGH nibble first
            val hi = pixels(srcRow * width + x) & 0xf
            val lo = if (x + 1 < width) pixels(srcRow * width + x + 1) & 0xf else 0
            pix.write((hi << 4) | lo)
            x += 1 // the loop's own increment consumes the second pixel
          }
          x += 1
        }
        (0 until pad).foreach(_ => pix.write(0))
        y += 1
      }
    }
    val payload = pix.toByteArray

    val fileSize = dataOffset + payload.length
    val out = new ByteArrayOutputStream(fileSize)
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
    w8('B'); w8('M'); w32(fileSize); w32(0); w32(dataOffset)
    if (core) {
      w32(12); w16(width); w16(height); w16(1); w16(bpp)
    } else {
      w32(dib); w32(width); w32(if (topDown) -height else height)
      w16(1); w16(bpp); w32(if (rle8) 1 else if (rle4) 2 else 0)
      w32(payload.length)
      w32(2835); w32(2835); w32(nPal); w32(0) // 72 dpi, colorsUsed, important
      (40 until dib by 4).foreach(_ => w32(0)) // V4/V5 extension, zeroed
    }
    if (bpp != 24) {
      var k = 0
      while (k < nPal) {
        w8(palette(3 * k + 2) & 0xff); w8(palette(3 * k + 1) & 0xff)
        w8(palette(3 * k) & 0xff)
        if (!core) w8(0) // quad pad byte (40-byte family)
        k += 1
      }
    }
    out.write(payload, 0, payload.length)
    out.toByteArray
  }
}
