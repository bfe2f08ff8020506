package graft.multimodal

import java.io.ByteArrayOutputStream

/** CCITT Group 3 / Group 4 fax coding (public ITU-T T.4 / T.6
  * recommendations) — THE scanned-document compressions, round 18:
  * a 100 TB document crawl is full of G4 TIFFs, and the reference's
  * whole domain is scanned-PDF text (PDFBox carries the same codecs;
  * Function.java:90-132 is where the reference decodes its documents).
  *
  * Three TIFF wire forms, all bilevel (1 bit/sample) by definition:
  *  - compression 2 ("CCITT RLE"): T.4 one-dimensional Modified
  *    Huffman rows, each row starting on a BYTE boundary, no EOL codes
  *  - compression 3 (T.4 Group 3, 1-D): every row preceded by an EOL
  *    code (000000000001, optionally with leading zero fill bits);
  *    only T4Options = 0 (1-D, no fill, no uncompressed mode)
  *  - compression 4 (T.6 Group 4, MMR): 2-D coding throughout — pass /
  *    horizontal / vertical modes against the previous row as the
  *    reference line (an imaginary all-white line for the first row),
  *    one continuous bit stream, optional EOFB terminator
  *
  * Bit convention: MSB-first within bytes (TIFF FillOrder 1 — FillOrder
  * 2 rejects loud upstream in [[TiffCodec]]). Decode emits PACKED rows
  * of (cols+7)/8 bytes with bit 1 = BLACK; the caller maps that onto
  * the photometric. Every malformed shape — truncated stream, a mode
  * code outside the T.6 tree, runs overshooting the row, trailing
  * garbage past the declared byte count — fails loud, never silent
  * garbage (the codec-family discipline).
  */
object CcittCodec {

  // ---- T.4 Modified Huffman code tables (terminating + makeup) ----
  // Encoded as (runLength, "bits") pairs straight from the public T.4
  // tables; the common extended makeup (1792-2560) applies to both
  // colors. Decoder lookup key = (bitLength << 16) | code.

  private val WhiteTerm: Seq[(Int, String)] = Seq(
    0 -> "00110101", 1 -> "000111", 2 -> "0111", 3 -> "1000",
    4 -> "1011", 5 -> "1100", 6 -> "1110", 7 -> "1111",
    8 -> "10011", 9 -> "10100", 10 -> "00111", 11 -> "01000",
    12 -> "001000", 13 -> "000011", 14 -> "110100", 15 -> "110101",
    16 -> "101010", 17 -> "101011", 18 -> "0100111", 19 -> "0001100",
    20 -> "0001000", 21 -> "0010111", 22 -> "0000011", 23 -> "0000100",
    24 -> "0101000", 25 -> "0101011", 26 -> "0010011", 27 -> "0100100",
    28 -> "0011000", 29 -> "00000010", 30 -> "00000011", 31 -> "00011010",
    32 -> "00011011", 33 -> "00010010", 34 -> "00010011", 35 -> "00010100",
    36 -> "00010101", 37 -> "00010110", 38 -> "00010111", 39 -> "00101000",
    40 -> "00101001", 41 -> "00101010", 42 -> "00101011", 43 -> "00101100",
    44 -> "00101101", 45 -> "00000100", 46 -> "00000101", 47 -> "00001010",
    48 -> "00001011", 49 -> "01010010", 50 -> "01010011", 51 -> "01010100",
    52 -> "01010101", 53 -> "00100100", 54 -> "00100101", 55 -> "01011000",
    56 -> "01011001", 57 -> "01011010", 58 -> "01011011", 59 -> "01001010",
    60 -> "01001011", 61 -> "00110010", 62 -> "00110011", 63 -> "00110100").map {
    case (r, b) => (r, b)
  }

  private val WhiteMakeup: Seq[(Int, String)] = Seq(
    64 -> "11011", 128 -> "10010", 192 -> "010111", 256 -> "0110111",
    320 -> "00110110", 384 -> "00110111", 448 -> "01100100",
    512 -> "01100101", 576 -> "01101000", 640 -> "01100111",
    704 -> "011001100", 768 -> "011001101", 832 -> "011010010",
    896 -> "011010011", 960 -> "011010100", 1024 -> "011010101",
    1088 -> "011010110", 1152 -> "011010111", 1216 -> "011011000",
    1280 -> "011011001", 1344 -> "011011010", 1408 -> "011011011",
    1472 -> "010011000", 1536 -> "010011001", 1600 -> "010011010",
    1664 -> "011000", 1728 -> "010011011")

  private val BlackTerm: Seq[(Int, String)] = Seq(
    0 -> "0000110111", 1 -> "010", 2 -> "11", 3 -> "10",
    4 -> "011", 5 -> "0011", 6 -> "0010", 7 -> "00011",
    8 -> "000101", 9 -> "000100", 10 -> "0000100", 11 -> "0000101",
    12 -> "0000111", 13 -> "00000100", 14 -> "00000111", 15 -> "000011000",
    16 -> "0000010111", 17 -> "0000011000", 18 -> "0000001000",
    19 -> "00001100111", 20 -> "00001101000", 21 -> "00001101100",
    22 -> "00000110111", 23 -> "00000101000", 24 -> "00000010111",
    25 -> "00000011000", 26 -> "000011001010", 27 -> "000011001011",
    28 -> "000011001100", 29 -> "000011001101", 30 -> "000001101000",
    31 -> "000001101001", 32 -> "000001101010", 33 -> "000001101011",
    34 -> "000011010010", 35 -> "000011010011", 36 -> "000011010100",
    37 -> "000011010101", 38 -> "000011010110", 39 -> "000011010111",
    40 -> "000001101100", 41 -> "000001101101", 42 -> "000011011010",
    43 -> "000011011011", 44 -> "000001010100", 45 -> "000001010101",
    46 -> "000001010110", 47 -> "000001010111", 48 -> "000001100100",
    49 -> "000001100101", 50 -> "000001010010", 51 -> "000001010011",
    52 -> "000000100100", 53 -> "000000110111", 54 -> "000000111000",
    55 -> "000000100111", 56 -> "000000101000", 57 -> "000001011000",
    58 -> "000001011001", 59 -> "000000101011", 60 -> "000000101100",
    61 -> "000001011010", 62 -> "000001100110", 63 -> "000001100111")

  private val BlackMakeup: Seq[(Int, String)] = Seq(
    64 -> "0000001111", 128 -> "000011001000", 192 -> "000011001001",
    256 -> "000001011011", 320 -> "000000110011", 384 -> "000000110100",
    448 -> "000000110101", 512 -> "0000001101100", 576 -> "0000001101101",
    640 -> "0000001001010", 704 -> "0000001001011", 768 -> "0000001001100",
    832 -> "0000001001101", 896 -> "0000001110010", 960 -> "0000001110011",
    1024 -> "0000001110100", 1088 -> "0000001110101", 1152 -> "0000001110110",
    1216 -> "0000001110111", 1280 -> "0000001010010", 1344 -> "0000001010011",
    1408 -> "0000001010100", 1472 -> "0000001010101", 1536 -> "0000001011010",
    1600 -> "0000001011011", 1664 -> "0000001100100", 1728 -> "0000001100101")

  /** Extended makeup 1792-2560 — COMMON to both colors (T.4 table 3c). */
  private val CommonMakeup: Seq[(Int, String)] = Seq(
    1792 -> "00000001000", 1856 -> "00000001100", 1920 -> "00000001101",
    1984 -> "000000010010", 2048 -> "000000010011", 2112 -> "000000010100",
    2176 -> "000000010101", 2240 -> "000000010110", 2304 -> "000000010111",
    2368 -> "000000011100", 2432 -> "000000011101", 2496 -> "000000011110",
    2560 -> "000000011111")

  private def buildDecode(entries: Seq[(Int, String)]): java.util.HashMap[Integer, Integer] = {
    val m = new java.util.HashMap[Integer, Integer]()
    entries.foreach { case (run, bits) =>
      val code = Integer.parseInt(bits, 2)
      val prev = m.put((bits.length << 16) | code, run)
      require(prev == null, s"CcittCodec: duplicate code $bits")
    }
    m
  }

  // decode maps: (len << 16 | code) -> run
  private val WhiteDecode = buildDecode(WhiteTerm ++ WhiteMakeup ++ CommonMakeup)
  private val BlackDecode = buildDecode(BlackTerm ++ BlackMakeup ++ CommonMakeup)

  // encode maps: run -> (code, len); terminating 0-63 and makeup rows
  private def buildEncode(entries: Seq[(Int, String)]): java.util.HashMap[Integer, (Int, Int)] = {
    val m = new java.util.HashMap[Integer, (Int, Int)]()
    entries.foreach { case (run, bits) =>
      m.put(run, (Integer.parseInt(bits, 2), bits.length))
    }
    m
  }
  private val WhiteEncode = buildEncode(WhiteTerm ++ WhiteMakeup ++ CommonMakeup)
  private val BlackEncode = buildEncode(BlackTerm ++ BlackMakeup ++ CommonMakeup)

  private val MaxCodeLen = 13 // longest MH code (black makeup 512+)

  // ---- bit-level I/O (MSB-first, FillOrder 1) ----

  private final class BitReader(data: Array[Byte], off: Int, cnt: Int) {
    private val endBit = (off.toLong + cnt) * 8
    private var at = off.toLong * 8
    def bitsLeft: Long = endBit - at
    def bit(): Int = {
      require(at < endBit, "CcittCodec: bit stream truncated")
      val b = (data((at >> 3).toInt) >> (7 - (at & 7)).toInt) & 1
      at += 1
      b
    }
    /** Skip forward to the next byte boundary (row alignment for
      * compression 2); the skipped pad bits' content is unspecified. */
    def alignByte(): Unit = at = (at + 7) & ~7L
    def atByteBoundary: Boolean = (at & 7) == 0
  }

  private final class BitWriter {
    private val out = new ByteArrayOutputStream()
    private var buf = 0L
    private var n = 0
    def write(code: Int, len: Int): Unit = {
      buf = (buf << len) | (code.toLong & ((1L << len) - 1))
      n += len
      while (n >= 8) {
        n -= 8
        out.write(((buf >> n) & 0xff).toInt)
      }
    }
    def alignByte(): Unit = if (n > 0) { out.write(((buf << (8 - n)) & 0xff).toInt); n = 0 }
    def bytes: Array[Byte] = { alignByte(); out.toByteArray }
  }

  /** One MH run-length code of `color` (0 white / 1 black): walks the
    * bit stream code by code until a match, failing loud past the
    * 13-bit table limit. Returns the raw table value (a terminating
    * run 0-63 or a makeup multiple of 64). */
  private def readRunCode(br: BitReader, color: Int): Int = {
    val table = if (color == 0) WhiteDecode else BlackDecode
    var code = 0
    var len = 0
    while (len <= MaxCodeLen) {
      code = (code << 1) | br.bit()
      len += 1
      val hit = table.get((len << 16) | code)
      if (hit != null) return hit
    }
    throw new IllegalArgumentException(
      s"CcittCodec: no ${if (color == 0) "white" else "black"} run code " +
        f"matches 0b${Integer.toBinaryString(code)}%s (${MaxCodeLen} bits read)")
  }

  /** A complete run length: zero or more makeup codes then a
    * terminating code, all of one color (T.4 §2.2.1.2 — runs over 2560
    * chain extended makeups). */
  private def readRun(br: BitReader, color: Int): Int = {
    var total = 0
    var done = false
    while (!done) {
      val part = readRunCode(br, color)
      total += part
      if (part < 64) done = true
      require(total <= (1 << 24), "CcittCodec: run length overflows sanity bound")
    }
    total
  }

  /** Emit one run of `color`: chained 2560-makeups for giant runs, one
    * color makeup for 64-2560, then the terminating code. */
  private def writeRun(bw: BitWriter, run0: Int, color: Int): Unit = {
    val enc = if (color == 0) WhiteEncode else BlackEncode
    var run = run0
    while (run > 2560 + 63) {
      val (c, l) = enc.get(2560)
      bw.write(c, l)
      run -= 2560
    }
    if (run >= 64) {
      val m = math.min(run - run % 64, 2560)
      val (c, l) = enc.get(m)
      bw.write(c, l)
      run -= m
    }
    val (c, l) = enc.get(run)
    bw.write(c, l)
  }

  // ---- 1-D row coding (compressions 2 and 3) ----

  /** Decode one 1-D row into transition positions (positions where the
    * color changes, alternating white→black / black→white, row starts
    * white). Runs must tile the row exactly; only the leading white run
    * may be zero-length. */
  private def decode1DRow(br: BitReader, cols: Int,
                          cur: Array[Int]): Int = {
    var total = 0
    var color = 0
    var n = 0
    var first = true
    while (total < cols) {
      val run = readRun(br, color)
      require(run > 0 || first,
        "CcittCodec: zero-length run mid-row (malformed 1-D stream)")
      first = false
      total += run
      require(total <= cols,
        s"CcittCodec: 1-D runs overshoot the $cols-pixel row ($total)")
      cur(n) = total; n += 1
      color ^= 1
    }
    n
  }

  /** Encode one row (transitions `cur(0 until n)`) in 1-D MH. */
  private def encode1DRow(bw: BitWriter, cur: Array[Int], n: Int, cols: Int): Unit = {
    var prev = 0
    var color = 0
    var i = 0
    while (i < n) {
      writeRun(bw, cur(i) - prev, color)
      prev = cur(i)
      color ^= 1
      i += 1
    }
    if (prev < cols) writeRun(bw, cols - prev, color)
  }

  /** Expect a T.4 EOL (11+ zero bits then a one — leading zeros double
    * as fill bits, which the spec allows before any EOL). */
  private def expectEol(br: BitReader): Unit = {
    var zeros = 0
    while (br.bit() == 0) {
      zeros += 1
      require(zeros <= 64, "CcittCodec: runaway zero fill before EOL")
    }
    require(zeros >= 11,
      s"CcittCodec: expected EOL (11+ zeros then 1), saw $zeros zeros")
  }

  // ---- 2-D MMR coding (compression 4, T.6) ----

  private val ModePass = 0
  private val ModeHoriz = 1
  private val ModeV0 = 2 // vertical modes carry the offset alongside

  /** Read one T.6 mode code. Returns (mode, verticalOffset). */
  private def readMode(br: BitReader): (Int, Int) = {
    if (br.bit() == 1) (ModeV0, 0) // "1"
    else if (br.bit() == 1) { // "01?"
      if (br.bit() == 1) (ModeV0, 1) else (ModeV0, -1) // 011 / 010
    } else if (br.bit() == 1) (ModeHoriz, 0) // "001"
    else if (br.bit() == 1) (ModePass, 0) // "0001"
    else if (br.bit() == 1) { // "00001?"
      if (br.bit() == 1) (ModeV0, 2) else (ModeV0, -2) // 000011 / 000010
    } else if (br.bit() == 1) { // "000001?"
      if (br.bit() == 1) (ModeV0, 3) else (ModeV0, -3) // 0000011 / 0000010
    } else throw new IllegalArgumentException(
      "CcittCodec: mode code outside the T.6 tree (7+ leading zeros — " +
        "extensions/uncompressed mode unsupported)")
  }

  /** Decode one 2-D row against reference transitions `ref(0 until
    * refN)` (values ≤ cols ascending; an empty array is the imaginary
    * all-white line). Writes the new row's transitions into `cur`,
    * returns their count. */
  private def decode2DRow(br: BitReader, ref: Array[Int], refN: Int,
                          cols: Int, cur: Array[Int]): Int = {
    def refAt(i: Int): Int = if (i >= 0 && i < refN) ref(i) else cols
    var a0 = -1
    var color = 0
    var n = 0
    var jHint = 0
    while (a0 < cols) {
      // b1 = first reference transition > a0 whose index parity matches
      // the current color (even indices are white→black elements)
      var j = jHint
      while (j > 0 && refAt(j - 1) > a0) j -= 1
      while (j < refN && refAt(j) <= a0) j += 1
      if ((j & 1) != color) j += 1
      jHint = j
      val b1 = refAt(j)
      val b2 = refAt(j + 1)
      val (mode, d) = readMode(br)
      if (mode == ModePass) {
        require(b2 > a0, "CcittCodec: pass mode fails to advance (malformed)")
        a0 = b2 // color unchanged, no transition
      } else if (mode == ModeHoriz) {
        val s = if (a0 < 0) 0 else a0
        val r1 = readRun(br, color)
        val r2 = readRun(br, color ^ 1)
        // a zero-length FIRST run is only the row-starts-black idiom
        // (a0 imaginary); mid-row it would record duplicate transitions
        // that mis-paint later spans silently
        require(r1 > 0 || a0 < 0,
          "CcittCodec: zero-length horizontal run mid-row (malformed)")
        val a1 = s + r1
        val a2 = a1 + r2
        require(a1 >= s && a2 <= cols && a2 > a0,
          s"CcittCodec: horizontal runs $r1/$r2 leave the row (a0=$a0, cols=$cols)")
        cur(n) = a1; cur(n + 1) = a2; n += 2
        a0 = a2 // color unchanged
      } else {
        val a1 = b1 + d
        require(a1 > a0 && a1 <= cols,
          s"CcittCodec: vertical offset $d puts a1=$a1 outside ($a0, $cols]")
        cur(n) = a1; n += 1
        a0 = a1
        color ^= 1
      }
    }
    require(a0 == cols, s"CcittCodec: row decoded past $cols columns ($a0)")
    // an ODD transition count whose last transition sits BEFORE cols is
    // an unclosed black span (e.g. a pass landing on cols mid-black) —
    // packRow would silently drop it, so reject loud. Odd counts ending
    // exactly AT cols are the valid zero-width-trailing-run shape (an
    // all-white row coded V0 records the single transition at cols).
    require(n % 2 == 0 || cur(n - 1) == cols,
      s"CcittCodec: row ends with an unclosed run at ${cur(n - 1)}")
    n
  }

  /** Encode one row (transitions cur) against the reference line per
    * T.6: pass when b2 < a1, vertical when |a1−b1| ≤ 3, horizontal
    * otherwise. */
  private def encode2DRow(bw: BitWriter, ref: Array[Int], refN: Int,
                          cur: Array[Int], curN: Int, cols: Int): Unit = {
    def refAt(i: Int): Int = if (i >= 0 && i < refN) ref(i) else cols
    def curAt(i: Int): Int = if (i >= 0 && i < curN) cur(i) else cols
    var a0 = -1
    var color = 0
    var ci = 0
    var jHint = 0
    while (a0 < cols) {
      var j = jHint
      while (j > 0 && refAt(j - 1) > a0) j -= 1
      while (j < refN && refAt(j) <= a0) j += 1
      if ((j & 1) != color) j += 1
      jHint = j
      val b1 = refAt(j)
      val b2 = refAt(j + 1)
      val a1 = curAt(ci)
      if (b2 < a1) {
        bw.write(1, 4) // pass: 0001
        a0 = b2
      } else if (math.abs(a1 - b1) <= 3) {
        a1 - b1 match {
          case 0 => bw.write(1, 1) // V0: 1
          case 1 => bw.write(3, 3) // VR1: 011
          case -1 => bw.write(2, 3) // VL1: 010
          case 2 => bw.write(3, 6) // VR2: 000011
          case -2 => bw.write(2, 6) // VL2: 000010
          case 3 => bw.write(3, 7) // VR3: 0000011
          case -3 => bw.write(2, 7) // VL3: 0000010
        }
        a0 = a1
        color ^= 1
        ci += 1
      } else {
        val a2 = curAt(ci + 1)
        val s = if (a0 < 0) 0 else a0
        bw.write(1, 3) // horizontal: 001
        writeRun(bw, a1 - s, color)
        writeRun(bw, a2 - a1, color ^ 1)
        a0 = a2
        ci += 2
      }
    }
  }

  // ---- transitions <-> packed rows ----

  /** Transitions of packed row `y` (bit 1 = black) into `cur`; returns
    * the transition count. */
  private def rowTransitions(packed: Array[Byte], rowBytes: Int, y: Int,
                             cols: Int, cur: Array[Int]): Int = {
    var n = 0
    var prev = 0
    var x = 0
    val base = y * rowBytes
    while (x < cols) {
      val b = (packed(base + (x >> 3)) >> (7 - (x & 7))) & 1
      if (b != prev) { cur(n) = x; n += 1; prev = b }
      x += 1
    }
    if (prev == 1) { cur(n) = cols; n += 1 }
    n
  }

  /** Write transitions as packed bits (1 = black) into row `y`. */
  private def packRow(packed: Array[Byte], rowBytes: Int, y: Int,
                      cur: Array[Int], n: Int): Unit = {
    val base = y * rowBytes
    var k = 0
    while (k + 1 < n || (k < n && (k & 1) == 0)) {
      // black spans are [cur(2m), cur(2m+1)); a trailing odd transition
      // cannot occur (decode always closes runs at cols)
      val from = cur(k)
      val to = if (k + 1 < n) cur(k + 1) else cur(k)
      var x = from
      while (x < to) {
        packed(base + (x >> 3)) = (packed(base + (x >> 3)) | (1 << (7 - (x & 7)))).toByte
        x += 1
      }
      k += 2
    }
  }

  // ---- public entry points ----

  /** Decode a CCITT-coded chunk (strip or tile) of `rows` rows x `cols`
    * columns. `mode` = the TIFF compression value (2, 3 or 4); `twoD`
    * selects T.4 2-D coding for mode 3 (T4Options bit 0: every row is
    * EOL + a 1-bit tag — 1 = the row is 1-D MH coded, 0 = 2-D coded
    * against the previous row with the T.6 mode set). Returns packed
    * rows of (cols+7)/8 bytes, bit 1 = BLACK, with strict byte-count
    * accounting over [off, off+cnt). */
  def decode(data: Array[Byte], off: Int, cnt: Int, cols: Int, rows: Int,
             mode: Int, twoD: Boolean = false): Array[Byte] = {
    require(mode == 2 || mode == 3 || mode == 4,
      s"CcittCodec: mode $mode (want TIFF compression 2, 3 or 4)")
    require(!twoD || mode == 3, "CcittCodec: twoD is a T.4 (mode 3) option")
    require(cols > 0 && rows > 0, s"CcittCodec: geometry ${cols}x$rows")
    require(off >= 0 && cnt >= 0 && off + cnt <= data.length,
      s"CcittCodec: chunk at $off+$cnt runs past EOF")
    val rowBytes = (cols + 7) / 8
    val packed = new Array[Byte](rowBytes * rows)
    val br = new BitReader(data, off, cnt)
    val cur = new Array[Int](cols + 2)
    if (mode == 4) {
      val ref = new Array[Int](cols + 2)
      var refN = 0
      var y = 0
      while (y < rows) {
        val n = decode2DRow(br, ref, refN, cols, cur)
        packRow(packed, rowBytes, y, cur, n)
        System.arraycopy(cur, 0, ref, 0, n)
        refN = n
        y += 1
      }
      // optional EOFB (EOL EOL), then only zero pad bits to the byte end
      if (br.bitsLeft >= 24) { expectEol(br); expectEol(br) }
      require(br.bitsLeft < 8,
        s"CcittCodec: ${br.bitsLeft} bits past the last row (trailing garbage)")
      while (br.bitsLeft > 0)
        require(br.bit() == 0, "CcittCodec: nonzero pad bits after the last row")
    } else {
      val ref = new Array[Int](cols + 2)
      var refN = 0
      var y = 0
      while (y < rows) {
        val n =
          if (mode == 2) {
            br.alignByte() // MH rows start on byte boundaries
            decode1DRow(br, cols, cur)
          } else {
            expectEol(br) // T.4: EOL before EVERY row, the first included
            if (twoD && br.bit() == 0) decode2DRow(br, ref, refN, cols, cur)
            else decode1DRow(br, cols, cur)
            // (the tag bit is consumed ONLY in the twoD stream form; a
            // 1-D stream carries no tags — and in twoD form, tag 1 =
            // 1-D row, tag 0 = 2-D row, both updating the reference)
          }
        packRow(packed, rowBytes, y, cur, n)
        System.arraycopy(cur, 0, ref, 0, n)
        refN = n
        y += 1
      }
      if (mode == 2) {
        br.alignByte()
        require(br.bitsLeft == 0,
          s"CcittCodec: ${br.bitsLeft / 8} byte(s) past the last MH row")
      } else {
        require(br.bitsLeft < 8,
          s"CcittCodec: ${br.bitsLeft} bits past the last row (trailing garbage)")
        while (br.bitsLeft > 0)
          require(br.bit() == 0, "CcittCodec: nonzero pad bits after the last row")
      }
    }
    packed
  }

  /** Encode packed rows (bit 1 = BLACK, rows of `rowBytes` bytes) as a
    * CCITT chunk in `mode` (TIFF compression 2, 3 or 4). `twoD` writes
    * the T.4 2-D stream form (mode 3 only): EOL + tag bit per row, rows
    * at y % k == 0 coded 1-D (the T.4 K-factor discipline — a 1-D
    * anchor row bounds error propagation), the rest 2-D. The mirror of
    * [[decode]]; no EOFB/RTC terminators (the TIFF convention). */
  def encode(packed: Array[Byte], rowBytes: Int, cols: Int, rows: Int,
             mode: Int, twoD: Boolean = false, k: Int = 2): Array[Byte] = {
    require(mode == 2 || mode == 3 || mode == 4,
      s"CcittCodec: mode $mode (want TIFF compression 2, 3 or 4)")
    require(!twoD || mode == 3, "CcittCodec.encode: twoD is a T.4 (mode 3) option")
    require(k >= 1, s"CcittCodec.encode: K-factor $k")
    require(rowBytes >= (cols + 7) / 8 && packed.length >= rowBytes * rows,
      s"CcittCodec.encode: ${packed.length} bytes for ${cols}x$rows at $rowBytes/row")
    val bw = new BitWriter
    val cur = new Array[Int](cols + 2)
    val ref = new Array[Int](cols + 2)
    var refN = 0
    var y = 0
    while (y < rows) {
      val n = rowTransitions(packed, rowBytes, y, cols, cur)
      mode match {
        case 2 =>
          encode1DRow(bw, cur, n, cols)
          bw.alignByte()
        case 3 =>
          bw.write(1, 12) // EOL 000000000001
          if (twoD) {
            if (y % k == 0) {
              bw.write(1, 1) // tag: 1-D row
              encode1DRow(bw, cur, n, cols)
            } else {
              bw.write(0, 1) // tag: 2-D row
              encode2DRow(bw, ref, refN, cur, n, cols)
            }
            System.arraycopy(cur, 0, ref, 0, n)
            refN = n
          } else encode1DRow(bw, cur, n, cols)
        case 4 =>
          encode2DRow(bw, ref, refN, cur, n, cols)
          System.arraycopy(cur, 0, ref, 0, n)
          refN = n
      }
      y += 1
    }
    bw.bytes
  }
}
