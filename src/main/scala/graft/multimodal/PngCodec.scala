package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.CRC32

import graft.pipeline.PdfCodec

/** A real PNG codec (ISO/IEC 15948 / the W3C PNG spec) — the image leg of
  * the multimodal pipeline. Round 7 replaced the PDF decode stub with a
  * real parser; this closes the image stub the same way, composed from
  * machinery the engine already ships: [[PdfCodec.inflate]] (zlib) and
  * [[PdfCodec.unpredict]] with /Predictor 15 — PDF's PNG predictor IS the
  * PNG filter set (Sub/Up/Average/Paeth with a per-row filter-type byte,
  * spec §9), at `colors = channels`, `columns = width`, 8-bit components.
  *
  * Scope (fail-loud beyond it, never silent garbage):
  *  - bit depths 8 and 16 (16-bit samples decode to the 8-bit buffer by
  *    the high byte — the exact inverse of the spec's v·257 widening)
  *    plus SUB-BYTE 1/2/4 for gray and palette (round 17 — the
  *    icon/screenshot/scan shapes: filters at bpp = 1 over packed rows,
  *    MSB-first unpack, gray rescaled by the spec's 255/(2^d−1) bit
  *    replication); color types 0 (gray), 2 (RGB), 3 (palette,
  *    expanded to RGB on return), 4 (gray+alpha), 6 (RGBA)
  *  - interlace methods 0 (none) and 1 (Adam7, round 14: the seven
  *    sub-images unfilter independently and scatter into the grid;
  *    empty passes contribute no bytes)
  *  - tRNS transparency honored (round 14): palette indices expand to
  *    RGBA, gray/RGB transparent-sample keys expand to gray+alpha/RGBA
  *    (8-bit; a 16-bit key would compare pre-reduction — fails loud);
  *    the returned colorType follows the DECODED buffer (0→4, 2→6,
  *    3→2/6), so (colorType, channels) always agree
  *  - every chunk's CRC-32 is verified; unknown CRITICAL chunks reject,
  *    other ancillary chunks skip (spec §5.4 behavior)
  *  - the inflated payload must be EXACTLY the geometry's byte count
  *    (per pass when interlaced) — truncation and trailing excess reject
  *
  * Reference analogue: the reference decodes its media format for real
  * (PDFBox page extraction, BlobUploadDetector/.../Function.java:90-132);
  * graft's image columns now get the same treatment.
  */
object PngCodec {

  private val Signature = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Adam7 pass grid (spec §8.2): (xStart, yStart, xStep, yStep). */
  private val Adam7: Array[(Int, Int, Int, Int)] = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Decoded image: `pixels` is the unfiltered scanline data in row-major
    * channel-interleaved order. `colorType` and `channels` both describe
    * the DECODED buffer, never the wire form: palette indices are
    * EXPANDED through PLTE (type 3 → 2, or 6 with tRNS alpha) and
    * tRNS transparent-sample keys expand to an alpha channel (0 → 4,
    * 2 → 6) — so (colorType, channels) always agree per spec table 11.1
    * and downstream consumers can key off either. */
  final case class PngImage(width: Int, height: Int, bitDepth: Int,
                            colorType: Int, channels: Int, pixels: Array[Byte])

  /** Channels per color type ON THE WIRE (pre palette expansion). */
  private def wireChannels(colorType: Int): Int = colorType match {
    case 0 => 1 // grayscale
    case 2 => 3 // RGB
    case 3 => 1 // palette indices
    case 4 => 2 // gray + alpha
    case 6 => 4 // RGBA
    case other => throw new IllegalArgumentException(
      s"PngCodec: color type $other unsupported (0, 2, 3, 4, 6)")
  }

  def decode(bytes: Array[Byte]): PngImage = {
    require(bytes.length >= 8 && java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(bytes, 0, 8), Signature),
      "PngCodec: not a PNG (bad 8-byte signature)")
    def be32(off: Int): Long =
      ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
        ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)

    var pos = 8
    var width = 0; var height = 0; var bitDepth = 0; var colorType = 0
    var interlace = 0
    var seenIhdr = false; var seenIend = false
    var palette: Array[Byte] = null
    var trns: Array[Byte] = null
    val idat = new ByteArrayOutputStream()
    val crc = new CRC32()

    while (!seenIend) {
      require(pos + 8 <= bytes.length, "PngCodec: truncated file (chunk header past EOF)")
      val len = be32(pos)
      require(len <= Int.MaxValue - 12 && pos + 12 + len <= bytes.length,
        s"PngCodec: chunk at $pos declares $len bytes past EOF")
      val ctype = new String(bytes, pos + 4, 4, "US-ASCII")
      val dataOff = pos + 8
      crc.reset()
      crc.update(bytes, pos + 4, 4 + len.toInt)
      val stored = be32(dataOff + len.toInt)
      require(crc.getValue == stored,
        f"PngCodec: $ctype chunk CRC mismatch (stored 0x$stored%08x, computed 0x${crc.getValue}%08x)")
      if (!seenIhdr) require(ctype == "IHDR", s"PngCodec: first chunk is $ctype, not IHDR")
      ctype match {
        case "IHDR" =>
          require(!seenIhdr, "PngCodec: duplicate IHDR")
          require(len == 13, s"PngCodec: IHDR length $len (want 13)")
          seenIhdr = true
          val w = be32(dataOff); val h = be32(dataOff + 4)
          require(w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue,
            s"PngCodec: invalid dimensions ${w}x$h")
          width = w.toInt; height = h.toInt
          bitDepth = bytes(dataOff + 8) & 0xff
          colorType = bytes(dataOff + 9) & 0xff
          wireChannels(colorType) // validates the color type
          // spec table 11.1: sub-byte depths (1/2/4, round 17) are legal
          // for gray (0) and palette (3) only
          require(bitDepth == 8 || bitDepth == 16 ||
              ((bitDepth == 1 || bitDepth == 2 || bitDepth == 4) &&
                (colorType == 0 || colorType == 3)),
            s"PngCodec: bit depth $bitDepth with color type $colorType " +
              "unsupported (8/16-bit, or 1/2/4-bit gray and palette)")
          require(bitDepth == 8 || colorType != 3 || bitDepth < 8,
            "PngCodec: 16-bit palette images are illegal (spec table 11.1)")
          require((bytes(dataOff + 10) & 0xff) == 0, "PngCodec: unknown compression method")
          require((bytes(dataOff + 11) & 0xff) == 0, "PngCodec: unknown filter method")
          interlace = bytes(dataOff + 12) & 0xff
          require(interlace == 0 || interlace == 1,
            s"PngCodec: interlace method $interlace unknown (0 = none, 1 = Adam7)")
        case "PLTE" =>
          require(len > 0 && len % 3 == 0 && len <= 768,
            s"PngCodec: PLTE length $len (want a positive multiple of 3, ≤ 768)")
          require(palette == null, "PngCodec: duplicate PLTE")
          palette = java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + len.toInt)
        case "tRNS" =>
          // transparency (spec 11.3.2): ancillary, but DROPPING it loses
          // the alpha channel a conforming viewer shows — honor it.
          // Legal only for color types 0/2/3 (4/6 already carry alpha).
          require(colorType == 0 || colorType == 2 || colorType == 3,
            s"PngCodec: tRNS with color type $colorType is illegal (spec 11.3.2)")
          require(trns == null, "PngCodec: duplicate tRNS")
          trns = java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + len.toInt)
          colorType match {
            case 0 => require(len == 2, s"PngCodec: gray tRNS length $len (want 2)")
            case 2 => require(len == 6, s"PngCodec: RGB tRNS length $len (want 6)")
            case _ => require(palette != null && len <= palette.length / 3,
              s"PngCodec: palette tRNS length $len exceeds PLTE entries")
          }
          // the transparent-sample KEY compares at full sample precision;
          // the 16-bit and sub-byte decode paths rescale samples before
          // this expansion would run, so those combinations stay out of
          // scope, loud
          require(bitDepth == 8 || colorType == 3,
            s"PngCodec: tRNS on a $bitDepth-bit non-palette image unsupported " +
              "(key compares pre-rescale)")
        case "IDAT" =>
          idat.write(bytes, dataOff, len.toInt)
        case "IEND" =>
          require(len == 0, s"PngCodec: IEND carries $len bytes")
          seenIend = true
        case other =>
          // ancillary bit: lowercase first letter = safe to skip (tEXt,
          // gAMA, pHYs…); an unknown CRITICAL chunk means we cannot
          // render the image correctly — reject, don't guess
          require(other.charAt(0).isLower,
            s"PngCodec: unknown critical chunk $other")
      }
      pos = dataOff + len.toInt + 4
    }
    require(colorType != 3 || palette != null, "PngCodec: palette image without PLTE")

    val ch = wireChannels(colorType)
    val raw = PdfCodec.inflate(idat.toByteArray)
    val unfiltered: Array[Byte] =
      if (bitDepth < 8) {
        // SUB-BYTE depths 1/2/4 (round 17 — gray or palette, the
        // icon/screenshot/scan shapes): filters run at bpp = 1 byte
        // over PACKED rows of ceil(w·d/8) bytes (spec §9's filter
        // offset floor); samples unpack MSB-first, gray scales by the
        // spec's bit replication 255/(2^d−1) (palette indices pass raw)
        val scale = if (colorType == 0) 255 / ((1 << bitDepth) - 1) else 1
        def unpackRows(packed: Array[Byte], pw: Int, ph: Int): Array[Byte] = {
          val prb = (pw * bitDepth + 7) / 8
          val o = new Array[Byte](pw * ph)
          var r = 0
          while (r < ph) {
            var x = 0
            while (x < pw) {
              val bitAt = x * bitDepth
              val v = (packed(r * prb + (bitAt >> 3)) >> (8 - bitDepth - (bitAt & 7))) &
                ((1 << bitDepth) - 1)
              o(r * pw + x) = (v * scale).toByte
              x += 1
            }
            r += 1
          }
          o
        }
        if (interlace == 0) {
          val rowBytes = (width * bitDepth + 7) / 8
          val expect = height.toLong * (1L + rowBytes)
          require(raw.length == expect,
            s"PngCodec: inflated IDAT is ${raw.length} bytes, geometry wants $expect " +
              s"(${width}x$height, $bitDepth-bit packed)")
          unpackRows(PdfCodec.unpredict(raw, predictor = 15, colors = 1,
            bpc = 8, columns = rowBytes), width, height)
        } else {
          val out = new Array[Byte](width * height)
          var off = 0
          var p = 0
          while (p < 7) {
            val x0 = Adam7(p)._1; val y0 = Adam7(p)._2
            val dx = Adam7(p)._3; val dy = Adam7(p)._4
            val pw = if (width > x0) (width - x0 + dx - 1) / dx else 0
            val ph = if (height > y0) (height - y0 + dy - 1) / dy else 0
            if (pw > 0 && ph > 0) {
              val prb = (pw * bitDepth + 7) / 8
              val passLen = ph * (1 + prb)
              require(off + passLen <= raw.length,
                s"PngCodec: interlaced payload truncated in Adam7 pass ${p + 1} " +
                  s"(have ${raw.length - off} of $passLen bytes)")
              val un = unpackRows(PdfCodec.unpredict(
                java.util.Arrays.copyOfRange(raw, off, off + passLen),
                predictor = 15, colors = 1, bpc = 8, columns = prb), pw, ph)
              off += passLen
              var r = 0
              while (r < ph) {
                var c = 0
                while (c < pw) {
                  out((y0 + r * dy) * width + (x0 + c * dx)) = un(r * pw + c)
                  c += 1
                }
                r += 1
              }
            }
            p += 1
          }
          require(off == raw.length,
            s"PngCodec: ${raw.length - off} trailing bytes after the last Adam7 pass")
          out
        }
      } else {
      val bps = bitDepth / 8 // bytes per sample: 1 or 2
      // the PNG filter set == PDF /Predictor 15: each row's leading byte
      // names its filter, decode is shared verbatim. Filters operate on
      // BYTES at bpp = channels·bytesPerSample (spec §9: 16-bit samples
      // are byte pairs), so 16-bit rides the same unfilter at colors=ch·2.
      val effColors = ch * bps
      val wide: Array[Byte] =
        if (interlace == 0) {
          val expect = height.toLong * (1L + width.toLong * effColors)
          require(raw.length == expect,
            s"PngCodec: inflated IDAT is ${raw.length} bytes, geometry wants $expect " +
              s"(${width}x$height, $ch channels, $bitDepth-bit)")
          PdfCodec.unpredict(raw, predictor = 15, colors = effColors,
            bpc = 8, columns = width)
        } else {
          // Adam7 (spec §8.2): seven sub-images, each with its OWN filtered
          // scanlines (filters reset per pass, rows are passW pixels wide);
          // empty passes (a dimension reduced to zero) contribute no bytes.
          // Unfilter each pass as its own mini-image, scatter into the grid.
          val out = new Array[Byte](width * height * effColors)
          var off = 0
          var p = 0
          while (p < 7) {
            val x0 = Adam7(p)._1; val y0 = Adam7(p)._2
            val dx = Adam7(p)._3; val dy = Adam7(p)._4
            val pw = if (width > x0) (width - x0 + dx - 1) / dx else 0
            val ph = if (height > y0) (height - y0 + dy - 1) / dy else 0
            if (pw > 0 && ph > 0) {
              val passLen = ph * (1 + pw * effColors)
              require(off + passLen <= raw.length,
                s"PngCodec: interlaced payload truncated in Adam7 pass ${p + 1} " +
                  s"(have ${raw.length - off} of $passLen bytes)")
              val un = PdfCodec.unpredict(
                java.util.Arrays.copyOfRange(raw, off, off + passLen),
                predictor = 15, colors = effColors, bpc = 8, columns = pw)
              off += passLen
              var r = 0
              while (r < ph) {
                var c = 0
                while (c < pw) {
                  System.arraycopy(un, (r * pw + c) * effColors, out,
                    ((y0 + r * dy) * width + (x0 + c * dx)) * effColors, effColors)
                  c += 1
                }
                r += 1
              }
            }
            p += 1
          }
          require(off == raw.length,
            s"PngCodec: ${raw.length - off} trailing bytes after the last Adam7 pass")
          out
        }
      // 16-bit samples reduce to the decoded 8-bit buffer by the HIGH
      // (big-endian first) byte — floor(v/257), the exact inverse of the
      // spec's 8→16 scaling v·257, so a widened image round-trips bit-
      // exactly and the oracle replay stays integer math
      if (bps == 1) wide
      else {
        val o = new Array[Byte](wide.length / 2)
        var i = 0
        while (i < o.length) { o(i) = wide(2 * i); i += 1 }
        o
      }
    }

    if (colorType == 3) {
      val nEntries = palette.length / 3
      // with tRNS, indices expand to RGBA (entries beyond the tRNS
      // length are fully opaque, per spec); without it, to RGB
      val outCh = if (trns != null) 4 else 3
      val out = new Array[Byte](unfiltered.length * outCh)
      var i = 0
      while (i < unfiltered.length) {
        val idx = unfiltered(i) & 0xff
        require(idx < nEntries,
          s"PngCodec: palette index $idx out of range (PLTE has $nEntries entries)")
        out(outCh * i) = palette(3 * idx)
        out(outCh * i + 1) = palette(3 * idx + 1)
        out(outCh * i + 2) = palette(3 * idx + 2)
        if (outCh == 4)
          out(4 * i + 3) = if (idx < trns.length) trns(idx) else 0xff.toByte
        i += 1
      }
      PngImage(width, height, bitDepth, if (outCh == 4) 6 else 2, outCh, out)
    } else if (trns != null && colorType == 0) {
      // gray + transparent-sample key -> gray+alpha (depth 8: the key's
      // low byte is the sample value, spec 11.3.2)
      val key = trns(1)
      val out = new Array[Byte](unfiltered.length * 2)
      var i = 0
      while (i < unfiltered.length) {
        out(2 * i) = unfiltered(i)
        out(2 * i + 1) = if (unfiltered(i) == key) 0 else 0xff.toByte
        i += 1
      }
      PngImage(width, height, bitDepth, 4, 2, out)
    } else if (trns != null && colorType == 2) {
      // RGB + transparent triple -> RGBA
      val (kr, kg, kb) = (trns(1), trns(3), trns(5))
      val n = unfiltered.length / 3
      val out = new Array[Byte](n * 4)
      var i = 0
      while (i < n) {
        val (r, g, b) = (unfiltered(3 * i), unfiltered(3 * i + 1), unfiltered(3 * i + 2))
        out(4 * i) = r; out(4 * i + 1) = g; out(4 * i + 2) = b
        out(4 * i + 3) = if (r == kr && g == kg && b == kb) 0 else 0xff.toByte
        i += 1
      }
      PngImage(width, height, bitDepth, 6, 4, out)
    } else PngImage(width, height, bitDepth, colorType, ch, unfiltered)
  }

  /** NEAREST-NEIGHBOR resample of a decoded image — the deterministic
    * resize every training pipeline needs for thumbnail/patch
    * normalization, chosen over interpolating kernels because its
    * output is EXACT integer math (`src = floor(dst·srcDim/dstDim)` per
    * axis), which keeps the whole decode→resize→re-encode path
    * hash-gateable against a SQL oracle. Operates on the decoded buffer,
    * so palette inputs resize in their expanded RGB space. */
  def resizeNearest(img: PngImage, outW: Int, outH: Int): PngImage = {
    require(outW > 0 && outH > 0, s"PngCodec.resizeNearest: invalid target ${outW}x$outH")
    val ch = img.channels
    val out = new Array[Byte](outW * outH * ch)
    var y = 0
    while (y < outH) {
      val sy = (y.toLong * img.height / outH).toInt
      var x = 0
      while (x < outW) {
        val sx = (x.toLong * img.width / outW).toInt
        val src = (sy * img.width + sx) * ch
        val dst = (y * outW + x) * ch
        var c = 0
        while (c < ch) { out(dst + c) = img.pixels(src + c); c += 1 }
        x += 1
      }
      y += 1
    }
    // palette inputs re-emerge as plain RGB (type 2): the expansion is
    // not invertible without re-quantizing a palette
    val outType = ch match { case 1 => 0; case 2 => 4; case 3 => 2; case _ => 6 }
    PngImage(outW, outH, img.bitDepth, outType, ch, out)
  }

  /** GRID-POOLED tile features: the image is cut into a gx×gy grid
    * (tile of pixel x = `floor(x·gx/width)`, same per axis) and each
    * tile contributes its per-channel MEAN — a gx·gy·channels float
    * vector, the classic cheap "image embedding" that drops straight
    * into the engine's KNN/ANN operators. Row-local integer sums, so
    * the vector is exactly replayable by the SQL oracle. Tiles are laid
    * out row-major, channels innermost. */
  def tileFeatures(img: PngImage, gx: Int, gy: Int): Array[Double] = {
    require(gx > 0 && gy > 0, s"PngCodec.tileFeatures: invalid grid ${gx}x$gy")
    require(gx <= img.width && gy <= img.height,
      s"PngCodec.tileFeatures: grid ${gx}x$gy exceeds image ${img.width}x${img.height}")
    val ch = img.channels
    val sums = new Array[Long](gx * gy * ch)
    val counts = new Array[Long](gx * gy)
    var y = 0
    while (y < img.height) {
      val ty = (y.toLong * gy / img.height).toInt
      var x = 0
      while (x < img.width) {
        val tx = (x.toLong * gx / img.width).toInt
        val tile = ty * gx + tx
        counts(tile) += 1
        val src = (y * img.width + x) * ch
        var c = 0
        while (c < ch) { sums(tile * ch + c) += img.pixels(src + c) & 0xff; c += 1 }
        x += 1
      }
      y += 1
    }
    Array.tabulate(gx * gy * ch)(i => sums(i).toDouble / counts(i / ch))
  }

  /** PNG ENCODE for fixtures and in-engine synthesis (the [[graft.pipeline.PdfCodec.encodePdf]]
    * convention: the engine fabricates real files so the decoder is
    * exercised end-to-end — filtering via [[PdfCodec.pngPredictEncode]]
    * cycles Up/Sub/Paeth/Average/None so every decode branch runs).
    * `pixels` is channel-interleaved row-major at 8 bits; for color type 3
    * pass palette INDICES plus the `palette` RGB triples. `bitDepth = 16`
    * widens each 8-bit sample to v·257 (the spec's exact scaling), so a
    * 16-bit file decodes back to the identical 8-bit buffer; `interlace`
    * writes the Adam7 seven-pass layout. */
  def encode(width: Int, height: Int, colorType: Int, pixels: Array[Byte],
             palette: Option[Array[Byte]] = None,
             interlace: Boolean = false, bitDepth: Int = 8): Array[Byte] = {
    val ch = wireChannels(colorType)
    require(width > 0 && height > 0, s"PngCodec.encode: invalid dimensions ${width}x$height")
    require(pixels.length == width.toLong * height * ch,
      s"PngCodec.encode: ${pixels.length} pixel bytes, geometry wants ${width * height * ch}")
    require((colorType == 3) == palette.isDefined,
      "PngCodec.encode: palette iff color type 3")
    require(bitDepth == 8 || bitDepth == 16 ||
        ((bitDepth == 1 || bitDepth == 2 || bitDepth == 4) &&
          (colorType == 0 || colorType == 3)),
      s"PngCodec.encode: bit depth $bitDepth with color type $colorType " +
        "(8/16, or 1/2/4 for gray and palette)")
    require(bitDepth != 16 || colorType != 3,
      "PngCodec.encode: 16-bit palette images are illegal (spec table 11.1)")
    if (bitDepth < 8) {
      // sub-byte samples must be exactly representable so the decode
      // round-trips bit-exactly: gray values multiples of 255/(2^d−1),
      // palette indices under 2^d
      val lim = (1 << bitDepth) - 1
      if (colorType == 0) pixels.foreach(b => require((b & 0xff) % (255 / lim) == 0,
        s"PngCodec.encode: gray sample ${b & 0xff} not representable at $bitDepth bits"))
      else pixels.foreach(b => require((b & 0xff) <= lim,
        s"PngCodec.encode: palette index ${b & 0xff} exceeds $bitDepth-bit depth"))
    }
    palette.foreach(p => require(p.length > 0 && p.length % 3 == 0 && p.length <= 768,
      s"PngCodec.encode: palette of ${p.length} bytes (want a positive multiple of 3, ≤ 768)"))

    val out = new ByteArrayOutputStream(pixels.length / 2 + 128)
    out.write(Signature, 0, 8)
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write(Array((len >>> 24).toByte, (len >>> 16).toByte, (len >>> 8).toByte, len.toByte), 0, 4)
      val tb = ctype.getBytes("US-ASCII")
      out.write(tb, 0, 4)
      out.write(data, 0, len)
      val crc = new CRC32()
      crc.update(tb); crc.update(data)
      val c = crc.getValue
      out.write(Array((c >>> 24).toByte, (c >>> 16).toByte, (c >>> 8).toByte, c.toByte), 0, 4)
    }
    val ihdr = new Array[Byte](13)
    def put32(arr: Array[Byte], off: Int, v: Int): Unit = {
      arr(off) = (v >>> 24).toByte; arr(off + 1) = (v >>> 16).toByte
      arr(off + 2) = (v >>> 8).toByte; arr(off + 3) = v.toByte
    }
    put32(ihdr, 0, width); put32(ihdr, 4, height)
    ihdr(8) = bitDepth.toByte; ihdr(9) = colorType.toByte
    ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = if (interlace) 1 else 0
    chunk("IHDR", ihdr)
    palette.foreach(p => chunk("PLTE", p))
    // sub-byte: pack samples (gray downscaled by 255/(2^d−1), palette
    // indices raw) MSB-first into ceil(w·d/8)-byte rows; the filter runs
    // at bpp = 1 over the packed rows (spec §9)
    def packSub(src: Array[Byte], pw: Int, ph: Int): Array[Byte] = {
      val lim = (1 << bitDepth) - 1
      val prb = (pw * bitDepth + 7) / 8
      val o = new Array[Byte](prb * ph)
      var r = 0
      while (r < ph) {
        var x = 0
        while (x < pw) {
          val v =
            if (colorType == 0) (src(r * pw + x) & 0xff) / (255 / lim)
            else src(r * pw + x) & 0xff
          val bitAt = x * bitDepth
          o(r * prb + (bitAt >> 3)) =
            (o(r * prb + (bitAt >> 3)) | (v << (8 - bitDepth - (bitAt & 7)))).toByte
          x += 1
        }
        r += 1
      }
      o
    }
    val bps = if (bitDepth < 8) 1 else bitDepth / 8
    val effColors = ch * bps
    val wide: Array[Byte] =
      if (bitDepth < 8 || bps == 1) pixels
      else {
        // v·257 = (v << 8) | v — big-endian sample pairs
        val o = new Array[Byte](pixels.length * 2)
        var i = 0
        while (i < pixels.length) { o(2 * i) = pixels(i); o(2 * i + 1) = pixels(i); i += 1 }
        o
      }
    val filtered: Array[Byte] =
      if (!interlace) {
        if (bitDepth < 8) {
          val packed = packSub(wide, width, height)
          PdfCodec.pngPredictEncode(packed, 1, packed.length / height)
        } else PdfCodec.pngPredictEncode(wide, effColors, width)
      } else {
        // Adam7: extract each pass's sub-image and filter it independently
        val bos = new ByteArrayOutputStream()
        var p = 0
        while (p < 7) {
          val x0 = Adam7(p)._1; val y0 = Adam7(p)._2
          val dx = Adam7(p)._3; val dy = Adam7(p)._4
          val pw = if (width > x0) (width - x0 + dx - 1) / dx else 0
          val ph = if (height > y0) (height - y0 + dy - 1) / dy else 0
          if (pw > 0 && ph > 0) {
            val pass = new Array[Byte](pw * ph * effColors)
            var r = 0
            while (r < ph) {
              var c = 0
              while (c < pw) {
                System.arraycopy(wide, ((y0 + r * dy) * width + (x0 + c * dx)) * effColors,
                  pass, (r * pw + c) * effColors, effColors)
                c += 1
              }
              r += 1
            }
            val f =
              if (bitDepth < 8) {
                val packed = packSub(pass, pw, ph)
                PdfCodec.pngPredictEncode(packed, 1, packed.length / ph)
              } else PdfCodec.pngPredictEncode(pass, effColors, pw)
            bos.write(f, 0, f.length)
          }
          p += 1
        }
        bos.toByteArray
      }
    chunk("IDAT", PdfCodec.deflate(filtered))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
