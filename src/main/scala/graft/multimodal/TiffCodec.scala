package graft.multimodal

import java.io.ByteArrayOutputStream

/** A real baseline-TIFF codec (the public TIFF 6.0 specification) — the
  * fourth raster leg after PNG/JPEG/GIF; TIFF dominates scan/print
  * corpora. Decodes into the shared [[PngCodec.PngImage]] shape so the
  * format-agnostic image ops (tiles, resize, KNN, dedup) take TIFF rows
  * unchanged.
  *
  * Scope (fail-loud beyond it, never silent garbage):
  *  - both byte orders (II little-endian, MM big-endian)
  *  - [[decode]] (the still-image op): FIRST IFD only — a second IFD
  *    rejects loud. [[pages]] (round 16): the FULL IFD chain, one
  *    image per page (scan/print corpora are routinely multi-page),
  *    cycle-checked and capped
  *  - 8-bit samples, 1 (gray) or 3 (RGB) samples/pixel, plus SUB-BYTE
  *    1/2/4-bit gray (round 17 — 1-bit is the fax/scan sample format
  *    and tag 258's default, 4-bit the 16-level scanner setting):
  *    MSB-first samples, byte-padded rows, expanded to the 8-bit
  *    BlackIsZero buffer by the 255/(2^d−1) replication; chunky planar
  *    configuration
  *  - STRIPED (any RowsPerStrip split) and TILED (§15, round 17 — the
  *    modern scanner/GIS layout: %16 tile grid, zero-padded edge tiles
  *    cropped on copy; a file carrying both layouts' tags rejects)
  *  - Compression 1 (none), 5 (LZW — TIFF-variant MSB-first with the
  *    spec's early code-width change; round 16), 8 and 32946 (Deflate —
  *    the modern scanner default and its older private-tag alias, one
  *    zlib stream per strip; round 17), 32773 (PackBits), and 2/3/4
  *    (CCITT fax — MH rows / T.4 G3 1-D / T.6 G4 MMR via
  *    [[CcittCodec]], round 18: THE scanned-document compressions,
  *    bilevel only, T4Options/T6Options 0), all decoded with strict
  *    per-strip accounting; Predictor 2 horizontal differencing under
  *    LZW or Deflate
  *  - PhotometricInterpretation 0 (WhiteIsZero — gray samples inverted
  *    on decode), 1 (BlackIsZero), 2 (RGB); others reject
  *  - strip byte counts and offsets must agree with the geometry —
  *    truncation and size mismatches reject
  *
  * Reference analogue: the reference decodes its media format for real
  * (PDFBox, Function.java:90-132); graft's image columns get the same
  * treatment per format.
  */
object TiffCodec {

  /** True iff `content` starts with a TIFF header (II*\0 or MM\0*). */
  def isTiff(b: Array[Byte]): Boolean =
    b.length >= 4 &&
      ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
       (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42))

  def decode(bytes: Array[Byte]): PngCodec.PngImage = {
    val (img, next) = decodePage(bytes, firstIfd(bytes))
    require(next == 0,
      "TiffCodec: multi-page TIFF (second IFD present) — decode() is the " +
        "single-page op; pages() walks the chain")
    img
  }

  /** ALL pages of a (possibly multi-page) TIFF in IFD-chain order —
    * scan/print corpora are routinely multi-page (round 16). The chain
    * is cycle-checked and capped; each page decodes under the full
    * single-page scope (strips, PackBits, both photometrics, …). */
  def pages(bytes: Array[Byte]): Seq[PngCodec.PngImage] = {
    val out = Seq.newBuilder[PngCodec.PngImage]
    val seen = scala.collection.mutable.Set.empty[Long]
    var at = firstIfd(bytes)
    while (at != 0) {
      require(seen.add(at),
        s"TiffCodec: IFD chain loops back to offset $at (malformed file)")
      require(seen.size <= 4096, "TiffCodec: IFD chain exceeds 4096 pages")
      val (img, next) = decodePage(bytes, at)
      out += img
      at = next
    }
    out.result()
  }

  /** Header validation + the first IFD's offset. */
  private def firstIfd(bytes: Array[Byte]): Long = {
    require(isTiff(bytes), "TiffCodec: not a TIFF (bad II*/MM* header)")
    val le = bytes(0) == 'I'
    require(bytes.length >= 8, "TiffCodec: truncated file")
    def u8(i: Int): Int = bytes(i) & 0xff
    val ifdAt =
      if (le) u8(4).toLong | (u8(5).toLong << 8) | (u8(6).toLong << 16) | (u8(7).toLong << 24)
      else (u8(4).toLong << 24) | (u8(5).toLong << 16) | (u8(6).toLong << 8) | u8(7).toLong
    require(ifdAt >= 8 && ifdAt < bytes.length, s"TiffCodec: IFD offset $ifdAt out of file")
    ifdAt
  }

  /** One page's image plus the next-IFD pointer. */
  private def decodePage(bytes: Array[Byte], ifdAt: Long): (PngCodec.PngImage, Long) = {
    val le = bytes(0) == 'I'
    def u8(i: Int): Int = {
      require(i >= 0 && i < bytes.length, "TiffCodec: truncated file")
      bytes(i) & 0xff
    }
    def u16(i: Int): Int =
      if (le) u8(i) | (u8(i + 1) << 8) else (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      if (le) u16(i).toLong | (u16(i + 2).toLong << 16)
      else (u16(i).toLong << 16) | u16(i + 2).toLong

    require(ifdAt >= 8 && ifdAt < bytes.length, s"TiffCodec: IFD offset $ifdAt out of file")
    val nEntries = u16(ifdAt.toInt)
    require(nEntries > 0, "TiffCodec: empty IFD")

    // tag -> (type, count, valueOrOffset field position). TIFF 6.0 §2
    // requires IFD entries sorted (hence unique) by tag; a duplicate tag
    // would otherwise silently decode last-wins, so reject it loud.
    final case class Entry(tpe: Int, count: Long, at: Int)
    val entryList = (0 until nEntries).map { k =>
      val off = ifdAt.toInt + 2 + 12 * k
      u16(off) -> Entry(u16(off + 2), u32(off + 4), off + 8)
    }
    val entries = entryList.toMap
    require(entries.size == entryList.size, {
      val dup = entryList.map(_._1).groupBy(identity).collect {
        case (t, hits) if hits.size > 1 => t
      }.toSeq.sorted
      s"TiffCodec: duplicate IFD tag(s) ${dup.mkString(", ")}"
    })
    val nextIfd = u32(ifdAt.toInt + 2 + 12 * nEntries)
    require(nextIfd == 0 || (nextIfd >= 8 && nextIfd < bytes.length),
      s"TiffCodec: next-IFD pointer $nextIfd out of file")

    /** SHORT(3)/LONG(4) scalar value of a tag. */
    def scalar(tag: Int, default: => Long): Long = entries.get(tag) match {
      case None => default
      case Some(e) =>
        require(e.count == 1, s"TiffCodec: tag $tag has count ${e.count} (want 1)")
        e.tpe match {
          case 3 => u16(e.at).toLong
          case 4 => u32(e.at)
          case t => throw new IllegalArgumentException(
            s"TiffCodec: tag $tag has type $t (want SHORT or LONG)")
        }
    }
    /** SHORT/LONG array of a tag (inline when it fits the 4-byte field). */
    def vector(tag: Int): Array[Long] = entries.get(tag) match {
      case None => throw new IllegalArgumentException(s"TiffCodec: required tag $tag missing")
      case Some(e) =>
        val width = e.tpe match {
          case 3 => 2
          case 4 => 4
          case t => throw new IllegalArgumentException(
            s"TiffCodec: tag $tag has type $t (want SHORT or LONG)")
        }
        val n = e.count.toInt
        val base = if (width * n <= 4) e.at else u32(e.at).toInt
        Array.tabulate(n)(i =>
          if (width == 2) u16(base + 2 * i).toLong else u32(base + 4 * i))
    }

    val width = scalar(256, throw new IllegalArgumentException(
      "TiffCodec: no ImageWidth")).toInt
    val height = scalar(257, throw new IllegalArgumentException(
      "TiffCodec: no ImageLength")).toInt
    require(width > 0 && height > 0, s"TiffCodec: invalid dimensions ${width}x$height")
    val spp = scalar(277, 1L).toInt
    require(spp == 1 || spp == 3,
      s"TiffCodec: $spp samples/pixel unsupported (1 = gray, 3 = RGB)")
    val bps = if (entries.contains(258)) vector(258) else Array.fill(spp)(1L)
    // SUB-BYTE gray (1/2/4-bit, round 17) joins 8-bit — 1-bit is the
    // fax/document-scan format (and the TIFF default when tag 258 is
    // absent), 4-bit the 16-level scanner setting; samples expand by
    // the 255/(2^d−1) replication into the common 8-bit buffer
    val subBits =
      if (spp == 1 && bps.length == 1 &&
          (bps.head == 1L || bps.head == 2L || bps.head == 4L)) bps.head.toInt
      else 0
    val bilevel = subBits > 0 // sub-byte path marker (1/2/4-bit gray)
    // 16-bit samples (round 17 — scientific/medical scans): reduced to
    // the 8-bit buffer by the HIGH byte, the PNG convention (exact
    // inverse of the v·257 widening); sample byte order follows the
    // FILE's (II lo-hi, MM hi-lo)
    val wide16 = bps.forall(_ == 16L)
    require(bps.length == spp && (bps.forall(_ == 8) || bilevel || wide16),
      s"TiffCodec: bits/sample ${bps.mkString(",")} unsupported " +
        "(8-bit, 16-bit, or 1/2/4-bit gray)")
    val sampleBytes = if (wide16) 2 else 1
    // decompression-bomb guard (the BmpCodec convention): the packed
    // buffer below is allocated from HEADER-declared dimensions, so a
    // tiny hostile file must not drive a multi-GB allocation — and the
    // Int product must not wrap into NegativeArraySizeException
    require(width.toLong * height * spp * sampleBytes <= (1L << 30),
      s"TiffCodec: ${width}x$height x$spp at ${bps.head} bits decodes past " +
        "the 2^30-byte bound")
    val compression = scalar(259, 1L).toInt
    // 8 = Deflate (Adobe extension, the modern scanner default) and
    // 32946 = its older private-tag alias — SAME zlib stream, decoded by
    // one path (round 17)
    val isDeflate = compression == 8 || compression == 32946
    // 2/3/4 = CCITT fax (round 18): Modified Huffman rows / T.4 Group 3
    // 1-D / T.6 Group 4 MMR — THE scanned-document compressions,
    // bilevel by definition, decoded by [[CcittCodec]]
    val isCcitt = compression == 2 || compression == 3 || compression == 4
    require(compression == 1 || compression == 5 || compression == 32773 ||
        isDeflate || isCcitt,
      s"TiffCodec: compression $compression unsupported " +
        "(1 = none, 2/3/4 = CCITT fax, 5 = LZW, 8/32946 = Deflate, " +
        "32773 = PackBits)")
    require(!isCcitt || (spp == 1 && bps.length == 1 && bps.head == 1L),
      s"TiffCodec: CCITT compression $compression needs 1 bit/sample " +
        s"bilevel data (got ${bps.mkString(",")} x$spp)")
    // T4Options: bit 0 = T.4 2-D coding (EOL + tag-bit rows — round 18);
    // fill bits (bit 2) and uncompressed mode (bit 1) stay out of scope
    // and must not pass silently. T6Options: only 0 (no extensions).
    val ccittTwoD = compression == 3 && {
      val t4 = scalar(292, 0L)
      require(t4 == 0L || t4 == 1L,
        s"TiffCodec: T4Options $t4 unsupported (0 = 1-D, 1 = 2-D; " +
          "fill bits / uncompressed mode are out of scope)")
      t4 == 1L
    }
    if (compression == 4) require(scalar(293, 0L) == 0L,
      "TiffCodec: T6Options != 0 (uncompressed mode) unsupported")
    // Predictor (tag 317) is a filter parameter of the LZW and Deflate
    // schemes: 2 = horizontal differencing per row, undone AFTER
    // decompression (TIFF 6.0 §14); it dominates real scanned corpora
    val predictor = scalar(317, 1L).toInt
    require(predictor == 1 ||
        (predictor == 2 && (compression == 5 || isDeflate) &&
          !bilevel && !wide16),
      s"TiffCodec: predictor $predictor unsupported " +
        "(1 = none, 2 = horizontal differencing under LZW/Deflate, 8-bit only)")
    val photometric = scalar(262, throw new IllegalArgumentException(
      "TiffCodec: no PhotometricInterpretation")).toInt
    require(photometric == 0 || photometric == 1 || photometric == 2,
      s"TiffCodec: photometric $photometric unsupported (0/1 gray, 2 RGB)")
    require((photometric == 2) == (spp == 3),
      s"TiffCodec: photometric $photometric contradicts $spp samples/pixel")
    require(scalar(284, 1L) == 1L,
      "TiffCodec: planar configuration 2 (separate planes) unsupported")
    // tiled layout (TIFF 6.0 §15, round 17) — the modern scanner/GIS
    // default; a file must be striped OR tiled, never both
    val tiled = entries.contains(322) || entries.contains(324)
    require(!tiled || (!entries.contains(273) && !entries.contains(279)),
      "TiffCodec: file carries BOTH strip and tile tags — ambiguous layout")
    // behavior-ALTERING tags must not pass silently: FillOrder 2
    // (LSB-first bits within bytes) is REAL on fax-derived scans and is
    // supported for the CCITT compressions (one bit-reverse pass at
    // chunk read — round 19); elsewhere it would silently flip pixels,
    // so it stays a loud reject. Non-default Orientation likewise.
    val fillOrder2 = scalar(266, 1L) == 2L
    require(scalar(266, 1L) == 1L || fillOrder2,
      s"TiffCodec: FillOrder ${scalar(266, 1L)} invalid (1 or 2)")
    require(!fillOrder2 || isCcitt,
      "TiffCodec: FillOrder 2 (bit-reversed) supported for CCITT fax data only")
    require(scalar(274, 1L) == 1L,
      "TiffCodec: non-default Orientation unsupported")

    // decompress one chunk (strip or tile) with exact accounting, then
    // undo the predictor per ROW of the chunk's own geometry (TIFF 6.0
    // §14 applies it uniformly under LZW and Deflate). `cols` is the
    // chunk's PIXEL width (image width for strips, TileWidth for
    // tiles) — CCITT coding is run-length over pixels, not bytes
    def decodeChunk(what: String, off: Int, cnt: Int, rows: Int,
                    chunkRowBytes: Int, cols: Int): Array[Byte] = {
      val expect = rows * chunkRowBytes
      require(off >= 0 && cnt >= 0 && off + cnt <= bytes.length,
        s"TiffCodec: $what at $off+$cnt runs past EOF")
      def undoPredictor(d: Array[Byte]): Array[Byte] = {
        if (predictor == 2) {
          var r = 0
          while (r < rows) {
            var i = spp
            while (i < chunkRowBytes) {
              d(r * chunkRowBytes + i) =
                (d(r * chunkRowBytes + i) + d(r * chunkRowBytes + i - spp)).toByte
              i += 1
            }
            r += 1
          }
        }
        d
      }
      if (compression == 1) {
        require(cnt == expect,
          s"TiffCodec: $what holds $cnt bytes, geometry wants $expect")
        java.util.Arrays.copyOfRange(bytes, off, off + cnt)
      } else if (compression == 5) undoPredictor(lzwDecode(bytes, off, cnt, expect))
      else if (isDeflate) undoPredictor(inflateStrip(bytes, off, cnt, expect))
      else if (isCcitt) {
        // FillOrder 2 stores the fax codestream LSB-first within each
        // byte: reverse every byte once here so CcittCodec stays a pure
        // MSB-first (FillOrder 1) reader
        val (src, srcOff) =
          if (!fillOrder2) (bytes, off)
          else {
            val rev = new Array[Byte](cnt)
            var i = 0
            while (i < cnt) { rev(i) = BitRev(bytes(off + i) & 0xff); i += 1 }
            (rev, 0)
          }
        // CcittCodec emits bit 1 = BLACK; the packed sample domain wants
        // the photometric's sample values (WhiteIsZero: black = 1, so
        // as-is; BlackIsZero: white = 1, so inverted — pad bits beyond
        // `cols` are never read by the expansion)
        val black1 = CcittCodec.decode(src, srcOff, cnt, cols, rows, compression,
          twoD = ccittTwoD)
        require(black1.length == expect,
          s"TiffCodec: CCITT produced ${black1.length} of $expect bytes")
        if (photometric == 1) {
          var i = 0
          while (i < black1.length) { black1(i) = (~black1(i)).toByte; i += 1 }
        }
        black1
      } else packBitsDecode(bytes, off, cnt, expect)
    }

    // assembly happens in the PACKED sample domain: 8-bit rows are
    // width·spp bytes, bilevel rows are ceil(width/8) bytes (MSB-first
    // bits, rows padded to byte boundaries per §4's default FillOrder)
    val packedRowBytes =
      if (bilevel) (width * subBits + 7) / 8
      else width * spp * sampleBytes
    val packed = new Array[Byte](packedRowBytes * height)

    if (!tiled) {
      // Long math + clamp: the spec blesses RowsPerStrip = 2^32-1 as the
      // one-strip idiom, and a bare .toInt would wrap it negative
      val rpsRaw = scalar(278, height.toLong)
      require(rpsRaw >= 1, "TiffCodec: RowsPerStrip 0")
      val rowsPerStrip = math.min(rpsRaw, height.toLong).toInt
      val nStrips = (height + rowsPerStrip - 1) / rowsPerStrip
      val offsets = vector(273)
      val counts = vector(279)
      require(offsets.length == nStrips && counts.length == nStrips,
        s"TiffCodec: ${offsets.length} strip offsets / ${counts.length} counts, " +
          s"geometry wants $nStrips")
      var strip = 0
      while (strip < nStrips) {
        val stripRows = math.min(rowsPerStrip, height - strip * rowsPerStrip)
        val raw = decodeChunk(s"strip $strip", offsets(strip).toInt,
          counts(strip).toInt, stripRows, packedRowBytes, width)
        System.arraycopy(raw, 0, packed,
          strip * rowsPerStrip * packedRowBytes, raw.length)
        strip += 1
      }
    } else {
      // §15: the tile grid covers the image with FULL padded tiles —
      // every tile decompresses to tileLength rows of tileWidth columns
      // and edge tiles are cropped on copy. Tile dims must be multiples
      // of 16 (the spec's rule), which also keeps bilevel tile columns
      // byte-aligned in the packed domain.
      val tw = scalar(322, throw new IllegalArgumentException(
        "TiffCodec: tiled file without TileWidth")).toInt
      val tl = scalar(323, throw new IllegalArgumentException(
        "TiffCodec: tiled file without TileLength")).toInt
      require(tw > 0 && tl > 0 && tw % 16 == 0 && tl % 16 == 0,
        s"TiffCodec: tile geometry ${tw}x$tl not positive multiples of 16")
      // per-TILE bomb guard (Long math): the image-dimension guard above
      // bounds `packed`, but each tile allocates its own tl·tileRowBytes
      // buffer from header-declared tile dims — hostile geometry (e.g.
      // 32768x32768 RGB tiles over a 16x16 image) must reject before the
      // allocation, and the Int product must not wrap negative
      require(tw.toLong * tl * spp * sampleBytes <= (1L << 30),
        s"TiffCodec: tile buffer ${tw}x$tl x$spp exceeds the 2^30-byte bound")
      val across = (width + tw - 1) / tw
      val down = (height + tl - 1) / tl
      val offsets = vector(324)
      val counts = vector(325)
      require(offsets.length == across * down && counts.length == across * down,
        s"TiffCodec: ${offsets.length} tile offsets / ${counts.length} counts, " +
          s"grid wants ${across * down}")
      val tileRowBytes =
        if (bilevel) tw * subBits / 8 else tw * spp * sampleBytes
      var t = 0
      while (t < across * down) {
        val raw = decodeChunk(s"tile $t", offsets(t).toInt, counts(t).toInt,
          tl, tileRowBytes, tw)
        val tx = t % across
        val ty = t / across
        val validCols = math.min(tw, width - tx * tw)
        val validRows = math.min(tl, height - ty * tl)
        val copyBytes =
          if (bilevel) (validCols * subBits + 7) / 8
          else validCols * spp * sampleBytes
        val colAt =
          if (bilevel) tx * tw * subBits / 8
          else tx * tw * spp * sampleBytes
        var r = 0
        while (r < validRows) {
          System.arraycopy(raw, r * tileRowBytes,
            packed, (ty * tl + r) * packedRowBytes + colAt, copyBytes)
          r += 1
        }
        t += 1
      }
    }

    val out =
      if (bilevel) {
        // expand MSB-first d-bit samples to the 8-bit BlackIsZero buffer
        // by the 255/(2^d−1) replication; photometric 0 (WhiteIsZero,
        // the fax default) takes the complement lim−v first
        val lim = (1 << subBits) - 1
        val scale = 255 / lim
        val o = new Array[Byte](width * height)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            val bitAt = x * subBits
            val v = (packed(y * packedRowBytes + (bitAt >> 3)) >>
              (8 - subBits - (bitAt & 7))) & lim
            o(y * width + x) =
              ((if (photometric == 0) lim - v else v) * scale).toByte
            x += 1
          }
          y += 1
        }
        o
      } else {
        // 16-bit: keep the HIGH byte of each sample (file byte order)
        val narrowed =
          if (!wide16) packed
          else {
            val o = new Array[Byte](packed.length / 2)
            var i = 0
            while (i < o.length) {
              o(i) = packed(2 * i + (if (le) 1 else 0))
              i += 1
            }
            o
          }
        if (photometric == 0) {
          // WhiteIsZero: invert so the decoded buffer is always BlackIsZero
          var i = 0
          while (i < narrowed.length) {
            narrowed(i) = (255 - (narrowed(i) & 0xff)).toByte; i += 1
          }
        }
        narrowed
      }
    (PngCodec.PngImage(width, height, 8, if (spp == 1) 0 else 2, spp, out), nextIfd)
  }

  /** TIFF-variant LZW decode (TIFF 6.0 §13 — round 16): MSB-first bit
    * packing (the GIF variant's mirror), 9-bit initial width,
    * ClearCode 256 / EOI 257, table entries from 258, and the spec's
    * EARLY code-width change (writers widen one code before the table
    * limit: at 510/1022/2046, not 511/1023/2047). Produces EXACTLY
    * `expect` bytes or fails loud. */
  private def lzwDecode(bytes: Array[Byte], off: Int, cnt: Int,
                        expect: Int): Array[Byte] = {
    val Clear = 256
    val Eoi = 257
    val out = new Array[Byte](expect)
    var w = 0
    // dictionary as (prefix code, appended byte); -1 prefix = root
    val prefix = new Array[Int](4096)
    val append = new Array[Byte](4096)
    val length = new Array[Int](4096)
    var next = 258
    var width = 9
    var bitBuf = 0L
    var bitCnt = 0
    var pos = off
    val end = off + cnt
    def readCode(): Int = {
      while (bitCnt < width) {
        require(pos < end, "TiffCodec: LZW stream truncated mid-code")
        bitBuf = (bitBuf << 8) | (bytes(pos) & 0xffL)
        bitCnt += 8
        pos += 1
      }
      bitCnt -= width
      ((bitBuf >> bitCnt) & ((1L << width) - 1)).toInt
    }
    def firstByte(code: Int): Byte = {
      var c = code
      while (c >= 258) c = prefix(c)
      c.toByte
    }
    def emit(code: Int): Unit = {
      val n = if (code < 256) 1 else length(code)
      require(w + n <= expect,
        s"TiffCodec: LZW emits more than the $expect-byte strip")
      var c = code
      var i = w + n - 1
      while (c >= 258) { out(i) = append(c); i -= 1; c = prefix(c) }
      out(i) = c.toByte
      w += n
    }
    var prev = -1
    var done = false
    while (!done) {
      val code = readCode()
      if (code == Eoi) done = true
      else if (code == Clear) {
        next = 258; width = 9; prev = -1
      } else {
        require(code < next || (code == next && prev >= 0),
          s"TiffCodec: LZW code $code beyond the $next-entry table")
        if (prev < 0) {
          require(code < 256, s"TiffCodec: LZW first code $code after clear not a root")
          emit(code)
        } else {
          if (code == next) { // KwKwK
            require(next < 4096, "TiffCodec: LZW table overflow")
            prefix(next) = prev
            append(next) = firstByte(prev)
            length(next) = (if (prev < 256) 1 else length(prev)) + 1
            next += 1
            emit(code)
          } else {
            emit(code)
            require(next < 4096, "TiffCodec: LZW table overflow")
            prefix(next) = prev
            append(next) = firstByte(code)
            length(next) = (if (prev < 256) 1 else length(prev)) + 1
            next += 1
          }
        }
        prev = code
        // EARLY change: widen when the NEXT entry to be created is the
        // last one expressible, i.e. at 510/1022/2046
        if (next == 510 && width == 9) width = 10
        else if (next == 1022 && width == 10) width = 11
        else if (next == 2046 && width == 11) width = 12
      }
      if (w == expect && !done) {
        // a conforming stream follows the last pixel with EOI
        val tail = readCode()
        require(tail == Eoi, s"TiffCodec: LZW continues past the strip (code $tail)")
        done = true
      }
    }
    require(w == expect, s"TiffCodec: LZW produced $w of $expect bytes")
    out
  }

  /** TIFF-variant LZW encode — [[lzwDecode]]'s exact mirror (MSB-first,
    * early change at 511/1023/2047 on the ENCODER side: one before the
    * decoder's trigger because its dictionary runs one ahead). */
  private def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length / 2 + 16)
    var bitBuf = 0L
    var bitCnt = 0
    var width = 9
    def write(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code
      bitCnt += width
      while (bitCnt >= 8) {
        bitCnt -= 8
        out.write(((bitBuf >> bitCnt) & 0xff).toInt)
      }
    }
    val dict = new java.util.HashMap[(Int, Byte), Integer]()
    var next = 258
    write(256) // leading Clear, the conventional stream start
    var prev = -1
    var i = 0
    while (i < data.length) {
      val b = data(i)
      if (prev < 0) prev = b & 0xff
      else {
        val hit = dict.get((prev, b))
        if (hit != null) prev = hit
        else {
          write(prev)
          if (next < 4096) {
            dict.put((prev, b), next)
            next += 1
            if (next == 511 && width == 9) width = 10
            else if (next == 1023 && width == 10) width = 11
            else if (next == 2047 && width == 11) width = 12
          }
          if (next == 4096) {
            write(256) // Clear before the table fills
            dict.clear()
            next = 258
            width = 9
          }
          prev = b & 0xff
        }
      }
      i += 1
    }
    if (prev >= 0) write(prev)
    // END-CODE catch-up (the GIF encoder's lesson, mirrored): the final
    // data code adds NO encoder entry but the decoder still creates one
    // for it, so its table catches up to the encoder's — if that entry
    // lands exactly on a width trigger the decoder reads EOI one bit
    // wider; widen here to match
    if (next == 510 && width == 9) width = 10
    else if (next == 1022 && width == 10) width = 11
    else if (next == 2046 && width == 11) width = 12
    write(257) // EOI
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    out.toByteArray
  }

  /** Deflate strip decode (compression 8 / 32946 — a zlib stream per
    * strip, round 17): produces EXACTLY `expect` bytes with the whole
    * strip consumed, or fails loud — truncated input, over-long output
    * and trailing garbage all reject. */
  private def inflateStrip(bytes: Array[Byte], off: Int, cnt: Int,
                           expect: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(bytes, off, cnt)
      val out = new Array[Byte](expect)
      var w = 0
      while (w < expect && !inf.finished()) {
        val n =
          try inf.inflate(out, w, expect - w)
          catch { case e: java.util.zip.DataFormatException =>
            throw new IllegalArgumentException(
              s"TiffCodec: corrupt Deflate strip: ${e.getMessage}")
          }
        require(n > 0 || inf.finished(),
          "TiffCodec: Deflate strip truncated (inflater stalled)")
        w += n
      }
      require(w == expect, s"TiffCodec: Deflate produced $w of $expect bytes")
      // the stream must END here: extra compressed pixels would be
      // silently dropped otherwise
      val probe = new Array[Byte](1)
      require(inf.finished() ||
          (try inf.inflate(probe) == 0 && inf.finished()
           catch { case _: java.util.zip.DataFormatException => false }),
        s"TiffCodec: Deflate strip holds more than the $expect-byte geometry")
      // and the strip's declared byte count must be exactly the zlib
      // stream: unconsumed COMPRESSED bytes after finished() are trailing
      // garbage the output-side probe above cannot see
      require(inf.getRemaining == 0,
        s"TiffCodec: Deflate strip carries ${inf.getRemaining} byte(s) " +
          "past the end of the zlib stream")
      out
    } finally inf.end()
  }

  /** PackBits decode (TIFF 6.0 §9): n in 0..127 copies n+1 literals,
    * n in -127..-1 repeats the next byte 1-n times, -128 is a noop.
    * Produces EXACTLY `expect` bytes or fails loud. */
  private def packBitsDecode(bytes: Array[Byte], off: Int, cnt: Int,
                             expect: Int): Array[Byte] = {
    val out = new Array[Byte](expect)
    var i = off
    val end = off + cnt
    var w = 0
    while (i < end) {
      val n = bytes(i)
      i += 1
      if (n >= 0) {
        val len = n + 1
        require(i + len <= end && w + len <= expect,
          "TiffCodec: PackBits literal run overruns strip or output")
        System.arraycopy(bytes, i, out, w, len)
        i += len; w += len
      } else if (n != -128) {
        val len = 1 - n
        require(i < end && w + len <= expect,
          "TiffCodec: PackBits repeat run overruns strip or output")
        java.util.Arrays.fill(out, w, w + len, bytes(i))
        i += 1; w += len
      } // -128: noop
    }
    require(w == expect, s"TiffCodec: PackBits produced $w of $expect bytes")
    out
  }

  /** TIFF ENCODE for fixtures and in-engine synthesis: baseline file in
    * either byte order, optional PackBits/LZW/Deflate compression, any
    * RowsPerStrip (so multi-strip assembly is exercised), optional
    * WhiteIsZero (`whiteIsZero` — gray only: samples stored inverted),
    * optional TILED layout (`tileSize` — square %16 tiles, §15, round
    * 17) and optional BILEVEL samples (`bilevel` — 1-bit gray, pixels
    * given as 0/255, round 17). `pixels` is the standard BlackIsZero
    * channel-interleaved buffer. */
  def encode(width: Int, height: Int, channels: Int, pixels: Array[Byte],
             bigEndian: Boolean = false, packBits: Boolean = false,
             rowsPerStrip: Int = 0, whiteIsZero: Boolean = false,
             lzw: Boolean = false, predictor2: Boolean = false,
             deflate: Boolean = false, oldDeflateTag: Boolean = false,
             tileSize: Int = 0, bilevel: Boolean = false,
             grayBits: Int = 0, bits16: Boolean = false,
             ccitt: Int = 0, ccittT4TwoD: Boolean = false,
             fillOrder2: Boolean = false): Array[Byte] =
    encodeMulti(Seq((width, height, channels, pixels)), bigEndian, packBits,
      rowsPerStrip, whiteIsZero, lzw, predictor2, deflate, oldDeflateTag,
      tileSize, bilevel, grayBits, bits16, ccitt, ccittT4TwoD, fillOrder2)

  /** MULTI-PAGE TIFF ENCODE (round 16): `pages` are (width, height,
    * channels, pixels) tuples laid out sequentially — per page its
    * strip data, out-of-line arrays and IFD, with each IFD's next
    * pointer chaining to the following page (0 on the last). The
    * single-page [[encode]] is the 1-element case, byte-identical to
    * its pre-multi-page layout. */
  def encodeMulti(pageSpecs: Seq[(Int, Int, Int, Array[Byte])],
                  bigEndian: Boolean = false, packBits: Boolean = false,
                  rowsPerStrip: Int = 0, whiteIsZero: Boolean = false,
                  lzw: Boolean = false, predictor2: Boolean = false,
                  deflate: Boolean = false,
                  oldDeflateTag: Boolean = false,
                  tileSize: Int = 0, bilevel: Boolean = false,
                  grayBits: Int = 0, bits16: Boolean = false,
                  ccitt: Int = 0, ccittT4TwoD: Boolean = false,
                  fillOrder2: Boolean = false): Array[Byte] = {
    require(pageSpecs.nonEmpty, "TiffCodec.encode: no pages")
    require(!fillOrder2 || ccitt > 0,
      "TiffCodec.encode: FillOrder 2 is written for CCITT fax data only")
    require(Seq(packBits, lzw, deflate, ccitt > 0).count(identity) <= 1,
      "TiffCodec.encode: packBits, lzw, deflate and ccitt are exclusive")
    // CCITT fax (round 18): 2 = MH rows, 3 = G3 1-D with EOLs, 4 = G4
    // MMR — bilevel-only by definition
    require(ccitt == 0 || ccitt == 2 || ccitt == 3 || ccitt == 4,
      s"TiffCodec.encode: ccitt $ccitt (0, or TIFF compression 2/3/4)")
    require(ccitt == 0 || bilevel,
      "TiffCodec.encode: CCITT compressions are 1-bit bilevel only")
    require(!ccittT4TwoD || ccitt == 3,
      "TiffCodec.encode: ccittT4TwoD is a T.4 (compression 3) option")
    require(!predictor2 || lzw || deflate,
      "TiffCodec.encode: predictor 2 is an LZW/Deflate filter parameter")
    require(!oldDeflateTag || deflate,
      "TiffCodec.encode: oldDeflateTag (32946) needs deflate")
    val tiled = tileSize > 0
    require(!tiled || tileSize % 16 == 0,
      s"TiffCodec.encode: tile size $tileSize not a multiple of 16")
    // sub-byte depth: bilevel is the 1-bit shorthand; grayBits = 2/4
    // write the deeper sub-byte forms (pixel values must be exact
    // 255/(2^d−1) multiples so round trips are bit-exact)
    require(grayBits == 0 || grayBits == 1 || grayBits == 2 || grayBits == 4,
      s"TiffCodec.encode: grayBits $grayBits (0 = 8-bit, or 1/2/4)")
    require(!(bilevel && grayBits > 1),
      "TiffCodec.encode: bilevel and grayBits are alternatives")
    val subBits = if (bilevel) 1 else grayBits
    require(subBits == 0 || !predictor2,
      "TiffCodec.encode: predictor 2 is 8-bit only")
    // 16-bit samples: each 8-bit input widens to v·257 in the FILE's
    // byte order (round 17); exclusive with sub-byte and predictor
    require(!bits16 || (subBits == 0 && !predictor2),
      "TiffCodec.encode: bits16 excludes sub-byte depths and predictor 2")
    val sampleBytes = if (bits16) 2 else 1
    // chunks = strips or tiles; `across` > 0 marks the tiled layout
    final case class PageBits(width: Int, height: Int, channels: Int,
                              rps: Int, across: Int, chunks: Array[Array[Byte]])
    val built = pageSpecs.map { case (width, height, channels, pixels) =>
      require(channels == 1 || channels == 3,
        s"TiffCodec.encode: $channels channels (1 or 3)")
      require(subBits == 0 || channels == 1,
        "TiffCodec.encode: sub-byte depths are gray-only")
      require(width > 0 && height > 0, s"TiffCodec.encode: invalid ${width}x$height")
      require(pixels.length == width * height * channels,
        s"TiffCodec.encode: ${pixels.length} pixel bytes, geometry wants " +
          s"${width * height * channels}")
      require(!whiteIsZero || channels == 1, "TiffCodec.encode: WhiteIsZero is gray-only")
      if (subBits > 0) {
        val step = 255 / ((1 << subBits) - 1)
        pixels.foreach(b => require((b & 0xff) % step == 0,
          s"TiffCodec.encode: sample ${b & 0xff} not representable at " +
            s"$subBits bits (want multiples of $step)"))
      }
      val rowBytes = width * channels
      // sample semantics per photometric: BlackIsZero stores v (the
      // replication inverse), WhiteIsZero stores the complement lim−v
      // (for 1-bit, bit 0 = white — the fax default)
      def valueOf(gray: Byte): Int = {
        val lim = (1 << subBits) - 1
        val v = (gray & 0xff) / (255 / lim)
        if (whiteIsZero) lim - v else v
      }
      /** Pack `cols` sub-byte samples of source row `y` starting at `x0`
        * into a `padTo`-byte row (trailing bits zero-padded). */
      def packRow(y: Int, x0: Int, cols: Int, padTo: Int): Array[Byte] = {
        val row = new Array[Byte](padTo)
        var x = 0
        while (x < cols) {
          val bitAt = x * subBits
          row(bitAt >> 3) = (row(bitAt >> 3) |
            (valueOf(pixels(y * width + x0 + x)) << (8 - subBits - (bitAt & 7)))).toByte
          x += 1
        }
        row
      }
      def diffAndCompress(raw: Array[Byte], rows: Int, chunkRowBytes: Int,
                          cols: Int): Array[Byte] = {
        if (ccitt > 0) {
          // packed sample bits → black=1 bits for the fax coder: under
          // WhiteIsZero sample 1 IS black; under BlackIsZero invert
          val black1 =
            if (whiteIsZero) raw
            else raw.map(b => (~b).toByte)
          val coded = CcittCodec.encode(black1, chunkRowBytes, cols, rows, ccitt,
            twoD = ccittT4TwoD)
          if (fillOrder2) coded.map(b => BitRev(b & 0xff)) else coded
        } else if (lzw || deflate) {
          if (predictor2) {
            // horizontal differencing per row, per sample — the inverse
            // of the decode-side reconstruction
            var r = 0
            while (r < rows) {
              var i = chunkRowBytes - 1
              while (i >= channels) {
                raw(r * chunkRowBytes + i) =
                  (raw(r * chunkRowBytes + i) - raw(r * chunkRowBytes + i - channels)).toByte
                i -= 1
              }
              r += 1
            }
          }
          if (lzw) lzwEncode(raw) else deflateStrip(raw)
        } else if (packBits) packBitsEncode(raw) else raw
      }
      val stored8 =
        if (!whiteIsZero || subBits > 0) pixels // sub-byte inverts in valueOf
        else pixels.map(b => (255 - (b & 0xff)).toByte)
      // 16-bit widening v·257 = the byte pair (v, v), so the wire is the
      // exact spec scaling; since both bytes are equal, the HIGH-byte
      // pick is pinned separately by a hand-patched spec fixture
      val stored =
        if (!bits16) stored8
        else {
          val o = new Array[Byte](stored8.length * 2)
          var i = 0
          while (i < stored8.length) {
            o(2 * i) = stored8(i); o(2 * i + 1) = stored8(i); i += 1
          }
          o
        }
      if (!tiled) {
        val rps = if (rowsPerStrip <= 0) height else math.min(rowsPerStrip, height)
        val nStrips = (height + rps - 1) / rps
        val packedRowBytes =
          if (subBits > 0) (width * subBits + 7) / 8 else rowBytes * sampleBytes
        val strips: Array[Array[Byte]] = Array.tabulate(nStrips) { s =>
          val rows = math.min(rps, height - s * rps)
          val raw =
            if (subBits > 0) {
              val b = new Array[Byte](rows * packedRowBytes)
              var r = 0
              while (r < rows) {
                System.arraycopy(packRow(s * rps + r, 0, width, packedRowBytes), 0,
                  b, r * packedRowBytes, packedRowBytes)
                r += 1
              }
              b
            } else java.util.Arrays.copyOfRange(stored,
              s * rps * rowBytes * sampleBytes,
              (s * rps + rows) * rowBytes * sampleBytes)
          diffAndCompress(raw, rows, packedRowBytes, width)
        }
        PageBits(width, height, channels, rps, 0, strips)
      } else {
        // §15 tile grid: every tile is a FULL tileSize x tileSize block,
        // edge tiles zero-padded right/bottom
        val across = (width + tileSize - 1) / tileSize
        val down = (height + tileSize - 1) / tileSize
        val tileRowBytes =
          if (subBits > 0) tileSize * subBits / 8
          else tileSize * channels * sampleBytes
        val tiles: Array[Array[Byte]] = Array.tabulate(across * down) { t =>
          val tx = t % across
          val ty = t / across
          val validCols = math.min(tileSize, width - tx * tileSize)
          val validRows = math.min(tileSize, height - ty * tileSize)
          val raw = new Array[Byte](tileRowBytes * tileSize)
          var r = 0
          while (r < validRows) {
            val y = ty * tileSize + r
            if (subBits > 0)
              System.arraycopy(packRow(y, tx * tileSize, validCols, tileRowBytes), 0,
                raw, r * tileRowBytes, tileRowBytes)
            else
              System.arraycopy(stored,
                (y * width + tx * tileSize) * channels * sampleBytes,
                raw, r * tileRowBytes, validCols * channels * sampleBytes)
            r += 1
          }
          diffAndCompress(raw, tileSize, tileRowBytes, tileSize)
        }
        PageBits(width, height, channels, 0, across, tiles)
      }
    }

    val out = new ByteArrayOutputStream(built.map(_.chunks.map(_.length).sum).sum + 512)
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit =
      if (bigEndian) { w8(v >> 8); w8(v) } else { w8(v); w8(v >> 8) }
    def w32(v: Long): Unit =
      if (bigEndian) { w16((v >> 16).toInt); w16(v.toInt) }
      else { w16(v.toInt); w16((v >> 16).toInt) }

    // pass 1 — absolute layout per page: header(8) | page1 data/arrays/
    // IFD | page2 … (every page's pieces contiguous; out-of-line arrays
    // WORD-ALIGNED per TIFF 6.0's even-Value-Offset rule, and each IFD
    // even-aligned for the same reason)
    final case class Layout(chunkOffsets: Array[Long], padAfterChunks: Boolean,
                            bpsAt: Long, offsAt: Long, cntsAt: Long, ifdAt: Long)
    var pos = 8L
    val layouts = built.map { p =>
      val nChunks = p.chunks.length
      val chunkOffsets = p.chunks.map { s => val o = pos; pos += s.length; o }
      val padAfterChunks = pos % 2 == 1
      if (padAfterChunks) pos += 1
      val bpsAt = if (p.channels == 3) { val o = pos; pos += 6; o } else -1L
      val offsAt = if (nChunks > 1) { val o = pos; pos += 4L * nChunks; o } else -1L
      val cntsAt = if (nChunks > 1) { val o = pos; pos += 4L * nChunks; o } else -1L
      val ifdAt = pos
      // strips: 273/278/279 (3 tags); tiles: 322/323/324/325 (4 tags);
      // CCITT G3/G4 add their T4Options/T6Options tag
      val nTags = (if (tiled) 11 else 10) + (if (predictor2) 1 else 0) +
        (if (ccitt == 3 || ccitt == 4) 1 else 0) + (if (fillOrder2) 1 else 0)
      pos += 2 + 12 * nTags + 4 // tags + next-IFD pointer
      Layout(chunkOffsets, padAfterChunks, bpsAt, offsAt, cntsAt, ifdAt)
    }

    // pass 2 — write
    if (bigEndian) { w8('M'); w8('M'); w8(0); w8(42) }
    else { w8('I'); w8('I'); w8(42); w8(0) }
    w32(layouts.head.ifdAt) // header IFD pointer
    built.zip(layouts).zipWithIndex.foreach { case ((p, l), pageNo) =>
      val nChunks = p.chunks.length
      p.chunks.foreach(s => out.write(s, 0, s.length))
      if (l.padAfterChunks) w8(0)
      if (p.channels == 3) {
        val b = if (bits16) 16 else 8
        w16(b); w16(b); w16(b)
      }
      if (nChunks > 1) {
        l.chunkOffsets.foreach(w32)
        p.chunks.foreach(s => w32(s.length.toLong))
      }
      final case class Tag(id: Int, tpe: Int, count: Long, value: Long)
      val layoutTags =
        if (tiled) Seq(
          Tag(322, 4, 1, tileSize.toLong),
          Tag(323, 4, 1, tileSize.toLong),
          if (nChunks > 1) Tag(324, 4, nChunks.toLong, l.offsAt)
          else Tag(324, 4, 1, l.chunkOffsets(0)),
          if (nChunks > 1) Tag(325, 4, nChunks.toLong, l.cntsAt)
          else Tag(325, 4, 1, p.chunks(0).length.toLong))
        else Seq(
          if (nChunks > 1) Tag(273, 4, nChunks.toLong, l.offsAt)
          else Tag(273, 4, 1, l.chunkOffsets(0)),
          Tag(278, 4, 1, p.rps.toLong),
          if (nChunks > 1) Tag(279, 4, nChunks.toLong, l.cntsAt)
          else Tag(279, 4, 1, p.chunks(0).length.toLong))
      val tags = Seq(
        Tag(256, 4, 1, p.width.toLong),
        Tag(257, 4, 1, p.height.toLong),
        if (p.channels == 3) Tag(258, 3, 3, l.bpsAt)
        else Tag(258, 3, 1, if (subBits > 0) subBits.toLong
          else if (bits16) 16L else 8L),
        Tag(259, 3, 1, if (lzw) 5L else if (packBits) 32773L
          else if (deflate) (if (oldDeflateTag) 32946L else 8L)
          else if (ccitt > 0) ccitt.toLong else 1L),
        Tag(262, 3, 1, if (whiteIsZero) 0L else if (p.channels == 3) 2L else 1L),
        Tag(277, 3, 1, p.channels.toLong),
        Tag(284, 3, 1, 1L)) ++
        (if (fillOrder2) Seq(Tag(266, 3, 1, 2L)) else Seq.empty) ++ layoutTags ++
        (if (predictor2) Seq(Tag(317, 3, 1, 2L)) else Seq.empty) ++
        (if (ccitt == 3) Seq(Tag(292, 4, 1, if (ccittT4TwoD) 1L else 0L))
         else if (ccitt == 4) Seq(Tag(293, 4, 1, 0L)) else Seq.empty)
      w16(tags.length)
      tags.sortBy(_.id).foreach { t =>
        w16(t.id); w16(t.tpe); w32(t.count)
        // SHORT scalar values sit in the LOW half of the 4-byte field
        // regardless of byte order (the field is value-left-justified —
        // for SHORT count 1 the spec stores it in the first 2 bytes)
        if (t.tpe == 3 && t.count == 1) { w16(t.value.toInt); w16(0) }
        else w32(t.value)
      }
      // next-IFD pointer: chain to the following page, 0 on the last
      w32(if (pageNo + 1 < layouts.length) layouts(pageNo + 1).ifdAt else 0L)
    }
    out.toByteArray
  }

  /** Per-byte bit reversal for FillOrder 2 (LSB-first) fax codestreams:
    * applied once at chunk read/write so the CCITT coder itself stays
    * MSB-first. */
  private val BitRev: Array[Byte] =
    Array.tabulate(256)(i => (Integer.reverse(i) >>> 24).toByte)

  /** Deflate strip encode — one zlib stream per strip ([[inflateStrip]]'s
    * mirror). */
  private def deflateStrip(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
    try {
      d.setInput(data); d.finish()
      val out = new ByteArrayOutputStream(data.length / 2 + 64)
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  /** PackBits encode: repeat runs of 3+ become repeat packets, the rest
    * literal packets of ≤128. */
  private def packBitsEncode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length + 16)
    var i = 0
    while (i < data.length) {
      // find a repeat run
      var run = 1
      while (i + run < data.length && run < 128 && data(i + run) == data(i)) run += 1
      if (run >= 3) {
        out.write(1 - run) // -(run-1)
        out.write(data(i))
        i += run
      } else {
        // literal run: until the next 3-repeat or 128 bytes
        val start = i
        var j = i
        var done = false
        while (!done && j < data.length && j - start < 128) {
          var r = 1
          while (j + r < data.length && r < 3 && data(j + r) == data(j)) r += 1
          if (r >= 3 && j > start) done = true
          else j += 1
        }
        out.write(j - start - 1)
        out.write(data, start, j - start)
        i = j
      }
    }
    out.toByteArray
  }
}
