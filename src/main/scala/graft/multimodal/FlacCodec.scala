package graft.multimodal

import java.io.ByteArrayOutputStream

/** FLAC decode/encode (the public FLAC format spec / RFC 9639) — the
  * lossless web-audio format WavCodec's RIFF family does not cover
  * (round 18, VERDICT r17 #3). Integer-exact by construction: rice-coded
  * residuals over fixed or LPC predictors, so decoded samples are
  * bit-identical to the encoder's input and the SAME window-feature op
  * (`BinaryPipeline.decodeWavSegments`) consumes them — `q_audio_flac`
  * carries `q_audio_wav`'s oracle VERBATIM (lossless invariance).
  *
  * Scope (fail-loud beyond it, never silent garbage):
  *  - STREAMINFO-first metadata chain; other blocks (padding, vorbis
  *    comment, seektable, …) skip by their declared length
  *  - sample sizes 8/16/24 (byte-multiple widths — the MD5 sample
  *    layout is bytewise), 1-8 channels, fixed AND variable blocking
  *    strategies, per-frame 8/16-bit blocksize forms and all the
  *    table-coded blocksize/sample-rate header codes
  *  - subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32,
  *    wasted-bits shifts; rice residual methods 0 (4-bit params) and
  *    1 (5-bit params) with escape-to-raw partitions
  *  - stereo decorrelation: left/side, right/side, mid/side (the side
  *    channel carries bps+1 bits per the spec)
  *  - EVERY integrity field is verified: frame-header CRC-8 (poly 0x07),
  *    whole-frame CRC-16 (poly 0x8005), and STREAMINFO's MD5 of the
  *    decoded little-endian sample stream — the format's own IN-BAND
  *    oracle on top of the engine's DuckDB gate; any mismatch rejects
  *
  * Reference analogue: the reference hands media decode to platform
  * libraries (Function.java:90-132); graft implements the codec from
  * the public spec as first-party Spark-side code like the image legs.
  */
object FlacCodec {

  /** True iff `content` starts with the fLaC stream marker. */
  def isFlac(b: Array[Byte]): Boolean =
    b.length >= 4 && b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C'

  // ---- CRCs (FLAC polynomials, init 0) ----

  private[multimodal] def crc8(data: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= data(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  private[multimodal] def crc16(data: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (data(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  // ---- bit reader (MSB-first; frames are byte-aligned, subframes not) ----

  private final class BitReader(data: Array[Byte]) {
    var at: Long = 0 // absolute bit position
    def bytePos: Int = {
      require((at & 7) == 0, "FlacCodec: internal — bytePos off alignment")
      (at >> 3).toInt
    }
    def alignToByte(): Unit = at = (at + 7) & ~7L
    def bitsLeft: Long = data.length.toLong * 8 - at
    def bit(): Int = {
      require(at < data.length.toLong * 8, "FlacCodec: stream truncated")
      val b = (data((at >> 3).toInt) >> (7 - (at & 7)).toInt) & 1
      at += 1
      b
    }
    def bits(n: Int): Long = {
      var v = 0L
      var k = 0
      while (k < n) { v = (v << 1) | bit(); k += 1 }
      v
    }
    def signedBits(n: Int): Long = {
      val v = bits(n)
      if (n > 0 && (v & (1L << (n - 1))) != 0) v - (1L << n) else v
    }
    /** Unary: count zero bits until the terminating one. */
    def unary(): Int = {
      var n = 0
      while (bit() == 0) {
        n += 1
        require(n <= (1 << 24), "FlacCodec: runaway unary (corrupt rice stream)")
      }
      n
    }
  }

  private final class BitWriter {
    private val out = new ByteArrayOutputStream()
    private var buf = 0L
    private var n = 0
    def write(v: Long, len: Int): Unit = {
      require(len <= 56, "FlacCodec: internal — write width")
      buf = (buf << len) | (v & (if (len == 56) -1L >>> 8 else (1L << len) - 1))
      n += len
      while (n >= 8) {
        n -= 8
        out.write(((buf >> n) & 0xff).toInt)
      }
    }
    def alignToByte(): Unit = if (n > 0) { out.write(((buf << (8 - n)) & 0xff).toInt); n = 0 }
    def bytes: Array[Byte] = { alignToByte(); out.toByteArray }
  }

  // ---- decode ----

  /** Decode a whole FLAC stream to the WavCodec audio shape (signed
    * interleaved Int samples). Verifies STREAMINFO MD5 and every
    * frame's CRC-8/CRC-16. */
  def decode(bytes: Array[Byte]): WavCodec.WavAudio = {
    require(isFlac(bytes), "FlacCodec: not a FLAC stream (no fLaC marker)")
    var pos = 4
    def u8(i: Int): Int = {
      require(i >= 0 && i < bytes.length, "FlacCodec: stream truncated")
      bytes(i) & 0xff
    }
    // metadata chain — STREAMINFO must come first (spec §8.2)
    require(pos + 4 <= bytes.length, "FlacCodec: truncated metadata header")
    require((u8(pos) & 0x7f) == 0, "FlacCodec: first metadata block is not STREAMINFO")
    var last = (u8(pos) & 0x80) != 0
    var len = (u8(pos + 1) << 16) | (u8(pos + 2) << 8) | u8(pos + 3)
    require(len == 34, s"FlacCodec: STREAMINFO length $len (want 34)")
    val si = pos + 4
    require(si + 34 <= bytes.length, "FlacCodec: truncated STREAMINFO")
    val minBlock = (u8(si) << 8) | u8(si + 1)
    val maxBlock = (u8(si + 2) << 8) | u8(si + 3)
    require(minBlock >= 16 && maxBlock >= minBlock,
      s"FlacCodec: blocksize range $minBlock..$maxBlock invalid")
    val sampleRate = (u8(si + 10) << 12) | (u8(si + 11) << 4) | (u8(si + 12) >> 4)
    require(sampleRate > 0, "FlacCodec: sample rate 0")
    val channels = ((u8(si + 12) >> 1) & 7) + 1
    val bps = (((u8(si + 12) & 1) << 4) | (u8(si + 13) >> 4)) + 1
    require(bps == 8 || bps == 16 || bps == 24,
      s"FlacCodec: $bps bits/sample unsupported (8, 16 or 24)")
    val totalSamples = ((u8(si + 13) & 0xf).toLong << 32) |
      (u8(si + 14).toLong << 24) | (u8(si + 15).toLong << 16) |
      (u8(si + 16).toLong << 8) | u8(si + 17).toLong
    require(totalSamples > 0, "FlacCodec: unknown total-sample count unsupported")
    require(totalSamples * channels <= (1L << 28),
      "FlacCodec: stream decodes past the 2^28-sample bound")
    val md5 = java.util.Arrays.copyOfRange(bytes, si + 18, si + 34)
    pos = si + 34
    while (!last) {
      require(pos + 4 <= bytes.length, "FlacCodec: truncated metadata header")
      last = (u8(pos) & 0x80) != 0
      require((u8(pos) & 0x7f) != 0x7f, "FlacCodec: invalid metadata block type 127")
      len = (u8(pos + 1) << 16) | (u8(pos + 2) << 8) | u8(pos + 3)
      pos += 4 + len
      require(pos <= bytes.length, "FlacCodec: metadata block runs past EOF")
    }

    val nFrames = totalSamples
    val samples = new Array[Int]((totalSamples * channels).toInt)
    val br = new BitReader(bytes)
    br.at = pos.toLong * 8
    var done = 0L
    var frameIdx = 0L
    while (done < nFrames) {
      val frameStart = br.bytePos
      // -- frame header --
      require(br.bits(14) == 0x3ffe, "FlacCodec: lost frame sync")
      require(br.bit() == 0, "FlacCodec: reserved header bit set")
      val variable = br.bit() == 1
      val bsBits = br.bits(4).toInt
      val srBits = br.bits(4).toInt
      val chanAsgn = br.bits(4).toInt
      val ssBits = br.bits(3).toInt
      require(br.bit() == 0, "FlacCodec: reserved header bit set")
      // coded number: UTF-8-style, frame index (fixed) or sample number
      val coded = {
        val b0 = br.bits(8).toInt
        if ((b0 & 0x80) == 0) b0.toLong
        else {
          var ones = 0
          while (ones < 8 && (b0 & (0x80 >> ones)) != 0) ones += 1
          require(ones >= 2 && ones <= 7, s"FlacCodec: bad coded-number lead byte $b0")
          var v = (b0 & (0x7f >> ones)).toLong
          var k = 1
          while (k < ones) {
            val c = br.bits(8).toInt
            require((c & 0xc0) == 0x80, "FlacCodec: bad coded-number continuation")
            v = (v << 6) | (c & 0x3f)
            k += 1
          }
          v
        }
      }
      if (variable) require(coded == done,
        s"FlacCodec: frame starts at sample $coded, expected $done")
      else require(coded == frameIdx,
        s"FlacCodec: frame number $coded, expected $frameIdx")
      val blockSize = bsBits match {
        case 0 => throw new IllegalArgumentException("FlacCodec: reserved blocksize code 0")
        case 1 => 192
        case n if n >= 2 && n <= 5 => 576 << (n - 2)
        case 6 => br.bits(8).toInt + 1
        case 7 => br.bits(16).toInt + 1
        case n => 256 << (n - 8)
      }
      val frameRate = srBits match {
        case 0 => sampleRate
        case 1 => 88200
        case 2 => 176400
        case 3 => 192000
        case 4 => 8000
        case 5 => 16000
        case 6 => 22050
        case 7 => 24000
        case 8 => 32000
        case 9 => 44100
        case 10 => 48000
        case 11 => 96000
        case 12 => br.bits(8).toInt * 1000
        case 13 => br.bits(16).toInt
        case 14 => br.bits(16).toInt * 10
        case _ => throw new IllegalArgumentException("FlacCodec: invalid sample-rate code 15")
      }
      require(frameRate == sampleRate,
        s"FlacCodec: frame sample rate $frameRate contradicts STREAMINFO $sampleRate")
      val frameBps = ssBits match {
        case 0 => bps
        case 1 => 8
        case 2 => 12
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case 7 => 32
        case _ => throw new IllegalArgumentException(
          s"FlacCodec: reserved sample-size code $ssBits")
      }
      require(frameBps == bps,
        s"FlacCodec: frame bits/sample $frameBps contradicts STREAMINFO $bps")
      val frameChannels = if (chanAsgn < 8) chanAsgn + 1 else 2
      require(chanAsgn < 11, s"FlacCodec: reserved channel assignment $chanAsgn")
      require(frameChannels == channels,
        s"FlacCodec: frame channels $frameChannels contradict STREAMINFO $channels")
      require(done + blockSize <= nFrames,
        s"FlacCodec: frame overruns the ${nFrames}-sample stream")
      // fixed blocking: the spec pins every frame except the last to the
      // constant stream blocksize (variable streams may mix sizes)
      if (!variable) require(blockSize == maxBlock || done + blockSize == nFrames,
        "FlacCodec: short block before the last frame under fixed blocking")
      // CRC-8 covers the header bytes up to here
      val crcPos = br.bytePos
      val wantCrc8 = br.bits(8).toInt
      require(crc8(bytes, frameStart, crcPos) == wantCrc8,
        "FlacCodec: frame-header CRC-8 mismatch")

      // -- subframes --
      val chan = Array.ofDim[Long](frameChannels, blockSize)
      var c = 0
      while (c < frameChannels) {
        // the side channel of left/side (ch 1), right/side (ch 0) and
        // mid/side (ch 1) carries one extra bit
        val extra = chanAsgn match {
          case 8 => if (c == 1) 1 else 0
          case 9 => if (c == 0) 1 else 0
          case 10 => if (c == 1) 1 else 0
          case _ => 0
        }
        decodeSubframe(br, chan(c), blockSize, bps + extra)
        c += 1
      }
      br.alignToByte()
      val footPos = br.bytePos
      val wantCrc16 = br.bits(16).toInt
      require(crc16(bytes, frameStart, footPos) == wantCrc16,
        "FlacCodec: frame CRC-16 mismatch")

      // -- stereo decorrelation --
      chanAsgn match {
        case 8 => // left/side: right = left - side
          var i = 0
          while (i < blockSize) { chan(1)(i) = chan(0)(i) - chan(1)(i); i += 1 }
        case 9 => // right/side: left = right + side (ch0 = side, ch1 = right)
          var i = 0
          while (i < blockSize) { chan(0)(i) = chan(1)(i) + chan(0)(i); i += 1 }
        case 10 => // mid/side
          var i = 0
          while (i < blockSize) {
            val side = chan(1)(i)
            val m2 = (chan(0)(i) << 1) | (side & 1)
            chan(0)(i) = (m2 + side) >> 1
            chan(1)(i) = (m2 - side) >> 1
            i += 1
          }
        case _ => ()
      }

      val lim = 1L << (bps - 1)
      var i = 0
      while (i < blockSize) {
        var cc = 0
        while (cc < frameChannels) {
          val v = chan(cc)(i)
          require(v >= -lim && v < lim,
            s"FlacCodec: decoded sample $v outside $bps-bit range")
          samples(((done + i) * channels + cc).toInt) = v.toInt
          cc += 1
        }
        i += 1
      }
      done += blockSize
      frameIdx += 1
    }
    br.alignToByte()
    require(br.bitsLeft == 0,
      s"FlacCodec: ${br.bitsLeft / 8} byte(s) after the last frame")

    // STREAMINFO MD5: the format's own oracle — samples as signed
    // little-endian bps/8-byte values, channels interleaved
    val dig = java.security.MessageDigest.getInstance("MD5")
    val w = bps / 8
    val raw = new Array[Byte](samples.length * w)
    var i = 0
    while (i < samples.length) {
      var k = 0
      while (k < w) { raw(i * w + k) = ((samples(i) >> (8 * k)) & 0xff).toByte; k += 1 }
      i += 1
    }
    val gotMd5 = dig.digest(raw)
    require(java.util.Arrays.equals(gotMd5, md5),
      "FlacCodec: decoded-PCM MD5 does not match STREAMINFO (corrupt stream)")
    WavCodec.WavAudio(sampleRate, channels, bps, (samples.length / channels),
      samples, format = 0xF1AC)
  }

  /** One subframe into `out` (blockSize samples at `bps` bits). */
  private def decodeSubframe(br: BitReader, out: Array[Long], blockSize: Int,
                             bps: Int): Unit = {
    require(br.bit() == 0, "FlacCodec: subframe pad bit set")
    val tpe = br.bits(6).toInt
    val wasted = if (br.bit() == 1) br.unary() + 1 else 0
    require(wasted < bps, s"FlacCodec: $wasted wasted bits at $bps bits/sample")
    val eff = bps - wasted
    if (tpe == 0) { // CONSTANT
      val v = br.signedBits(eff)
      java.util.Arrays.fill(out, v)
    } else if (tpe == 1) { // VERBATIM
      var i = 0
      while (i < blockSize) { out(i) = br.signedBits(eff); i += 1 }
    } else if ((tpe & 0x38) == 0x08 && (tpe & 7) <= 4) { // FIXED order 0-4
      val order = tpe & 7
      require(order <= blockSize, "FlacCodec: fixed order exceeds block size")
      var i = 0
      while (i < order) { out(i) = br.signedBits(eff); i += 1 }
      decodeResidual(br, out, blockSize, order)
      restoreFixed(out, blockSize, order)
    } else if ((tpe & 0x20) != 0) { // LPC order 1-32
      val order = (tpe & 0x1f) + 1
      require(order <= blockSize, "FlacCodec: LPC order exceeds block size")
      var i = 0
      while (i < order) { out(i) = br.signedBits(eff); i += 1 }
      val precision = br.bits(4).toInt + 1
      require(precision <= 15, "FlacCodec: invalid LPC precision code 15")
      val shift = br.signedBits(5).toInt
      require(shift >= 0, s"FlacCodec: negative LPC shift $shift")
      val coef = new Array[Long](order)
      i = 0
      while (i < order) { coef(i) = br.signedBits(precision); i += 1 }
      decodeResidual(br, out, blockSize, order)
      i = order
      while (i < blockSize) {
        var acc = 0L
        var k = 0
        while (k < order) { acc += coef(k) * out(i - 1 - k); k += 1 }
        out(i) += acc >> shift
        i += 1
      }
    } else throw new IllegalArgumentException(
      f"FlacCodec: reserved subframe type 0b$tpe%6s".replace(' ', '0'))
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { out(i) <<= wasted; i += 1 }
    }
  }

  /** Rice-coded residual into out(order until blockSize). */
  private def decodeResidual(br: BitReader, out: Array[Long], blockSize: Int,
                             order: Int): Unit = {
    val method = br.bits(2).toInt
    require(method == 0 || method == 1,
      s"FlacCodec: reserved residual method $method")
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val partOrder = br.bits(4).toInt
    val nParts = 1 << partOrder
    require(blockSize % nParts == 0,
      s"FlacCodec: block size $blockSize not divisible by $nParts partitions")
    require(blockSize >> partOrder > order || partOrder == 0,
      "FlacCodec: first partition has no samples")
    var p = 0
    var idx = order
    while (p < nParts) {
      val n = (blockSize >> partOrder) - (if (p == 0) order else 0)
      val param = br.bits(pBits).toInt
      if (param == escape) {
        val rawBits = br.bits(5).toInt
        var k = 0
        while (k < n) {
          out(idx) = if (rawBits == 0) 0L else br.signedBits(rawBits)
          idx += 1; k += 1
        }
      } else {
        var k = 0
        while (k < n) {
          val q = br.unary().toLong
          val u = (q << param) | br.bits(param)
          out(idx) = (u >>> 1) ^ -(u & 1) // zigzag
          idx += 1; k += 1
        }
      }
      p += 1
    }
  }

  /** Fixed-predictor reconstruction (orders 0-4, the spec's difference
    * polynomials). */
  private def restoreFixed(out: Array[Long], blockSize: Int, order: Int): Unit = {
    var i = order
    while (i < blockSize) {
      order match {
        case 0 => ()
        case 1 => out(i) += out(i - 1)
        case 2 => out(i) += 2 * out(i - 1) - out(i - 2)
        case 3 => out(i) += 3 * out(i - 1) - 3 * out(i - 2) + out(i - 3)
        case 4 => out(i) += 4 * out(i - 1) - 6 * out(i - 2) + 4 * out(i - 3) - out(i - 4)
      }
      i += 1
    }
  }

  // ---- encode (the fixture writer) ----

  /** Encode interleaved signed samples as a real FLAC stream. `strategy`
    * seeds the per-frame subframe/stereo rotation so corpora exercise
    * CONSTANT/VERBATIM/FIXED subframes and all three decorrelations;
    * every frame carries its real CRC-8/CRC-16 and STREAMINFO the true
    * MD5. Scope: bps 8/16/24, 1-8 channels, fixed blocking. */
  def encode(sampleRate: Int, channels: Int, bits: Int, samples: Array[Int],
             blockSize: Int = 192, strategy: Long = 0): Array[Byte] = {
    require(bits == 8 || bits == 16 || bits == 24,
      s"FlacCodec.encode: $bits bits/sample (8, 16 or 24)")
    require(channels >= 1 && channels <= 8, s"FlacCodec.encode: $channels channels")
    require(blockSize >= 16 && blockSize <= 65536,
      s"FlacCodec.encode: block size $blockSize out of range")
    require(samples.length % channels == 0,
      "FlacCodec.encode: sample count not a channel multiple")
    val totalFrames = samples.length / channels
    require(totalFrames > 0, "FlacCodec.encode: empty stream")
    val lim = 1 << (bits - 1)
    samples.foreach(s => require(s >= -lim && s < lim,
      s"FlacCodec.encode: sample $s outside $bits-bit range"))

    val out = new ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO (last metadata block)
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    val siw = new BitWriter
    siw.write(blockSize.toLong, 16) // min block
    siw.write(blockSize.toLong, 16) // max block
    siw.write(0, 24); siw.write(0, 24) // frame sizes unknown
    siw.write(sampleRate.toLong, 20)
    siw.write((channels - 1).toLong, 3)
    siw.write((bits - 1).toLong, 5)
    siw.write(totalFrames.toLong, 36)
    out.write(siw.bytes)
    val dig = java.security.MessageDigest.getInstance("MD5")
    val w = bits / 8
    val raw = new Array[Byte](samples.length * w)
    var i = 0
    while (i < samples.length) {
      var k = 0
      while (k < w) { raw(i * w + k) = ((samples(i) >> (8 * k)) & 0xff).toByte; k += 1 }
      i += 1
    }
    out.write(dig.digest(raw))

    var done = 0
    var frameIdx = 0L
    while (done < totalFrames) {
      val n = math.min(blockSize, totalFrames - done)
      // channel planes for this block
      val plane = Array.tabulate(channels, n)((c, j) =>
        samples((done + j) * channels + c).toLong)
      // stereo decorrelation rotation (stereo only): 0 independent,
      // 1 left/side, 2 right/side, 3 mid/side
      val deco =
        if (channels != 2) 0
        else ((strategy + frameIdx) % 4).toInt
      val (enc0, enc1, asgn, bits1) = deco match {
        case 1 =>
          val side = Array.tabulate(n)(j => plane(0)(j) - plane(1)(j))
          (plane(0), side, 8, bits + 1)
        case 2 =>
          val side = Array.tabulate(n)(j => plane(0)(j) - plane(1)(j))
          (side, plane(1), 9, bits + 1) // ch0 = side at bits+1
        case 3 =>
          val mid = Array.tabulate(n)(j => (plane(0)(j) + plane(1)(j)) >> 1)
          val side = Array.tabulate(n)(j => plane(0)(j) - plane(1)(j))
          (mid, side, 10, bits + 1)
        case _ => (plane(0), if (channels == 2) plane(1) else null,
          channels - 1, bits)
      }

      val bw = new BitWriter
      bw.write(0x3ffe, 14) // sync
      bw.write(0, 1) // reserved
      bw.write(0, 1) // fixed blocking
      bw.write(7, 4) // blocksize: 16-bit form at end of header
      bw.write(0, 4) // sample rate: from STREAMINFO
      bw.write(asgn.toLong, 4)
      bw.write(bits match { case 8 => 1L; case 16 => 4L; case _ => 6L }, 3)
      bw.write(0, 1) // reserved
      // coded frame number, UTF-8 style (our frame counts fit 2 bytes)
      if (frameIdx < 0x80) bw.write(frameIdx, 8)
      else {
        require(frameIdx < 0x800, "FlacCodec.encode: frame index out of scope")
        bw.write(0xc0L | (frameIdx >> 6), 8)
        bw.write(0x80L | (frameIdx & 0x3f), 8)
      }
      bw.write((n - 1).toLong, 16)
      val headBytes = bw.bytes
      val frame = new ByteArrayOutputStream()
      frame.write(headBytes, 0, headBytes.length)
      frame.write(crc8(headBytes, 0, headBytes.length))

      val body = new BitWriter
      var c = 0
      while (c < channels) {
        val (data, cbits) =
          if (channels == 2) (if (c == 0) enc0 else enc1,
            deco match {
              case 2 => if (c == 0) bits1 else bits
              case 1 | 3 => if (c == 1) bits1 else bits
              case _ => bits
            })
          else (plane(c), bits)
        // subframe strategy rotation: constant when possible, else
        // verbatim / fixed1 / fixed2 / lpc2 by seed
        writeSubframe(body, data, n, cbits, ((strategy + frameIdx + c) % 4).toInt)
        c += 1
      }
      val bodyBytes = body.bytes // zero-padded to byte alignment
      frame.write(bodyBytes, 0, bodyBytes.length)
      val fb = frame.toByteArray
      val crc = crc16(fb, 0, fb.length)
      frame.write(crc >> 8); frame.write(crc & 0xff)
      val all = frame.toByteArray
      out.write(all, 0, all.length)
      done += n
      frameIdx += 1
    }
    out.toByteArray
  }

  /** One subframe: CONSTANT when all samples agree, else the seeded
    * choice of VERBATIM / FIXED order 1 / FIXED order 2 / LPC order 2
    * (fixed 3.1 coefficients — any coefficient set is wire-valid and
    * lossless; this leg keeps the decoder's LPC path round-trip-tested)
    * with a mean-sized rice parameter (escape-to-raw when residuals
    * explode). */
  private def writeSubframe(bw: BitWriter, data: Array[Long], n: Int,
                            bps: Int, choice: Int): Unit = {
    bw.write(0, 1) // pad
    if (data.forall(_ == data(0))) {
      bw.write(0, 6) // CONSTANT
      bw.write(0, 1)
      bw.write(data(0), bps)
      return
    }
    if (choice == 3 && n > 2) {
      // LPC order 2: coefs (3, -1) at shift 1 — the linear-extrapolation
      // predictor s(i) ≈ (3·s(i−1) − s(i−2)) / 2
      val order = 2
      val coef = Array(3L, -1L)
      val precision = 3 // signed 3-bit coefficients
      val shift = 1
      bw.write(0x20L | (order - 1), 6) // LPC: 1xxxxx, xxxxx = order-1
      bw.write(0, 1) // no wasted bits
      var i = 0
      while (i < order) { bw.write(data(i), bps); i += 1 }
      bw.write((precision - 1).toLong, 4)
      bw.write(shift.toLong, 5)
      coef.foreach(c => bw.write(c, precision))
      val res = new Array[Long](n - order)
      i = order
      while (i < n) {
        val pred = (coef(0) * data(i - 1) + coef(1) * data(i - 2)) >> shift
        res(i - order) = data(i) - pred
        i += 1
      }
      writeResidual(bw, res)
      return
    }
    val order = choice match {
      case 1 => math.min(1, n - 1)
      case 2 | 3 => math.min(2, n - 1)
      case _ => -1 // verbatim
    }
    if (order < 0) {
      bw.write(1, 6) // VERBATIM
      bw.write(0, 1)
      var i = 0
      while (i < n) { bw.write(data(i), bps); i += 1 }
      return
    }
    bw.write(0x08 | order, 6) // FIXED
    bw.write(0, 1)
    var i = 0
    while (i < order) { bw.write(data(i), bps); i += 1 }
    // residuals via the difference polynomial
    val res = new Array[Long](n - order)
    i = order
    while (i < n) {
      res(i - order) = order match {
        case 0 => data(i) // 1-sample tail blocks degrade to order 0
        case 1 => data(i) - data(i - 1)
        case 2 => data(i) - 2 * data(i - 1) + data(i - 2)
      }
      i += 1
    }
    writeResidual(bw, res)
  }

  /** Rice method-0 residual block (partition order 0) with the
    * escape-to-raw fallback. */
  private def writeResidual(bw: BitWriter, res: Array[Long]): Unit = {
    bw.write(0, 2) // rice method 0 (4-bit params)
    bw.write(0, 4) // partition order 0
    // pick the rice parameter from the mean magnitude; escape if huge
    var sum = 0L
    res.foreach(r => sum += math.abs(r))
    val mean = sum / math.max(1, res.length)
    var param = 0
    while (param < 14 && (1L << param) < mean + 1) param += 1
    val maxQ = res.map(r => {
      val u = (r << 1) ^ (r >> 63)
      u >>> param
    }).max
    if (param >= 14 || maxQ > (1 << 16)) {
      bw.write(15, 4) // escape
      val width = math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(
        res.map(r => math.abs(r) * 2).max) + 0)
      require(width <= 31, "FlacCodec.encode: residual width out of scope")
      bw.write(width.toLong, 5)
      res.foreach(r => bw.write(r, width))
    } else {
      bw.write(param.toLong, 4)
      res.foreach { r =>
        val u = (r << 1) ^ (r >> 63) // zigzag
        val q = (u >>> param).toInt
        var k = 0
        while (k < q) { bw.write(0, 1); k += 1 }
        bw.write(1, 1)
        if (param > 0) bw.write(u & ((1L << param) - 1), param)
      }
    }
  }
}
