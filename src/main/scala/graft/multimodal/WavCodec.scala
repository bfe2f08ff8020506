package graft.multimodal

import java.io.ByteArrayOutputStream

/** A real WAV/RIFF PCM codec — the audio leg of the multimodal pipeline,
  * replacing the byte-window stub features with decode of actual sample
  * data (the PNG/JPEG recipe: the engine synthesizes REAL files so the
  * decoder is exercised end-to-end and a SQL oracle can replay the
  * decoded features from the synthesis formulas alone).
  *
  * Format: RIFF container (`RIFF <size> WAVE`), `fmt ` chunk with
  * audio-format 1 (integer PCM), 6 (G.711 A-law), 7 (G.711 µ-law) —
  * round 15's telephony-corpus formats — 0x11 (IMA ADPCM) or 0x02
  * (MS ADPCM) — round 16's compressed wire formats — `data` chunk
  * with interleaved frames (or, for the ADPCMs, self-contained nibble
  * blocks). Scope (fail-loud beyond it, never silent garbage):
  *  - WAVE_FORMAT_EXTENSIBLE (0xFFFE — round 17): the real format code
  *    rides the SubFormat GUID (PCM and IEEE-float subtypes accepted;
  *    the 14-byte KSDATAFORMAT suffix is verified and
  *    wValidBitsPerSample must equal the container width — padded
  *    containers reject loud)
  *  - PCM: 8-bit (unsigned on the wire, per spec), 16-, 24- and 32-bit
  *    (signed LE, native scale); µ-law/A-law: 8-bit codes expanded to
  *    16-bit-scale linear
  *    via the CCITT formulas; IMA ADPCM: 4-bit nibble prediction with
  *    the public step table, per-block predictor reset from the block
  *    header (header = sample 0), low-nibble-first, 4-byte groups
  *    round-robin across channels; MS ADPCM: two-tap coefficient
  *    prediction (the file's own coef table) with the public
  *    adaptation table, field-grouped per-channel block headers whose
  *    iSamp2/iSamp1 ARE the first two samples, high-nibble-first
  *  - 1–8 channels; block-align and byte-rate must agree with the
  *    declared geometry; the data payload must be WHOLE frames (whole
  *    blocks for ADPCM, with the declared samples-per-block matching
  *    the block geometry)
  *  - unknown chunks (LIST, fact, cue…) skip with the spec's word
  *    alignment (odd-sized chunks carry a pad byte)
  *
  * Decoded samples are SIGNED LINEAR ints regardless of wire format
  * (8-bit PCM shifts by −128, µ-law expands), so feature math
  * downstream is format-independent.
  *
  * Reference analogue: the reference decodes its media format for real
  * (PDFBox, Function.java:90-132); graft's audio columns now get the
  * same treatment.
  */
object WavCodec {

  /** Decoded audio: `samples` is channel-interleaved, one SIGNED LINEAR
    * int per sample (−128..127 for 8-bit PCM wire data, −32768..32767
    * for 16-bit, ±32124 for expanded µ-law at 16-bit scale); `frames` =
    * samples.length / channels; `format` is the wire format code
    * (1 PCM, 7 µ-law). */
  final case class WavAudio(sampleRate: Int, channels: Int, bitsPerSample: Int,
                            frames: Int, samples: Array[Int], format: Int = 1)

  /** G.711 µ-law expansion at 16-bit PCM scale (the CCITT reference C
    * form, ±32124): the code is bit-inverted on the wire; sign bit 0x80
    * (post-invert), 3-bit exponent, 4-bit mantissa:
    * mag = ((mant·8 + 0x84) << exp) − 0x84. Pure integer math — exactly
    * replayable by a SQL oracle. */
  def mulawExpand(code: Int): Int = {
    val u = (~code) & 0xff
    val exp = (u >> 4) & 7
    val mant = u & 0xf
    val mag = ((mant * 8 + 0x84) << exp) - 0x84
    if ((u & 0x80) != 0) -mag else mag
  }

  /** G.711 A-law expansion at 16-bit PCM scale (the CCITT reference C
    * form, ±32256): the wire code is XOR 0x55 ("even-bit inversion");
    * sign bit 0x80, 3-bit segment, 4-bit mantissa — segment 0 is linear
    * (mag = mant·16 + 8), segments 1-7 are mag = (mant·16 + 264) <<
    * (seg − 1). Pure integer math, SQL-replayable like its µ-law twin. */
  def alawExpand(code: Int): Int = {
    val a = (code ^ 0x55) & 0xff
    val seg = (a >> 4) & 7
    val mant = a & 0xf
    val mag =
      if (seg == 0) mant * 16 + 8
      else (mant * 16 + 264) << (seg - 1)
    if ((a & 0x80) != 0) mag else -mag
  }

  /** G.711 A-law compression, TOTAL over 16-bit samples: segment s
    * covers magnitudes [256·2^(s−1), 256·2^s) (s ≥ 1; segment 0 is
    * linear below 256), mantissa by quantization within the segment —
    * the exact inverse of [[alawExpand]] on its output set, and the
    * nearest-code quantizer on everything else. A-law has NO zero
    * fold: −8 and +8 are the two codes nearest zero; true 0 compresses
    * to the +8 code. */
  def alawCompress(sample: Int): Int = {
    val pos = sample >= 0
    var mag = if (pos) sample else -sample
    if (mag > 32767) mag = 32767
    val (seg, mant) =
      if (mag < 256) (0, mag >> 4) // linear segment: mag = mant·16 + 8
      else {
        var s = 1
        while (s < 7 && mag >= (256 << s)) s += 1
        (s, math.min(15, ((mag >> (s - 1)) >> 4) - 16))
      }
    (((if (pos) 0x80 else 0) | (seg << 4) | mant) ^ 0x55) & 0xff
  }

  /** G.711 µ-law compression — the exact inverse of [[mulawExpand]] on
    * its output set (magnitudes clamp at the top code; ±0 collapse to
    * the positive code 0xFF, the inherent µ-law zero fold). */
  def mulawCompress(sample: Int): Int = {
    val neg = sample < 0
    // re-bias: an expander output has |v| + 0x84 = base << exp with
    // base = mant·8 + 0x84 in [0x84, 0xFC]
    var mag = (if (neg) -sample else sample) + 0x84
    if (mag > (0xfc << 7)) mag = 0xfc << 7
    var exp = 0
    while (exp < 7 && (mag >> (exp + 1)) >= 0x84) exp += 1
    val mant = ((mag >> exp) - 0x84) >> 3
    (~((if (neg) 0x80 else 0) | (exp << 4) | mant)) & 0xff
  }

  // ── IMA ADPCM (wave format 0x11) ───────────────────────────────────

  /** The public IMA/DVI step-size table (89 entries). */
  private[graft] val ImaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Per-nibble index adjustment (magnitudes 0-7; sign bit is separate). */
  private[graft] val ImaIndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** One IMA nibble step: (newPredictor, newIndex). The delta is the
    * bit-serial form of the reference algorithm (diff = step/8 +
    * step/4·b0 + step/2·b1 + step·b2, truncating division baked into
    * the shifts), predictor clamped to 16-bit, index to [0, 88]. */
  private[graft] def imaStep(pred: Int, idx: Int, nibble: Int): (Int, Int) = {
    val step = ImaStepTable(idx)
    var delta = step >> 3
    if ((nibble & 1) != 0) delta += step >> 2
    if ((nibble & 2) != 0) delta += step >> 1
    if ((nibble & 4) != 0) delta += step
    val p = if ((nibble & 8) != 0) pred - delta else pred + delta
    val clamped = math.max(-32768, math.min(32767, p))
    val ni = math.max(0, math.min(88, idx + ImaIndexTable(nibble & 7)))
    (clamped, ni)
  }

  /** Samples per IMA block: the header sample plus two nibbles per data
    * byte, per channel. */
  private def adpcmSamplesPerBlock(blockAlign: Int, channels: Int): Int =
    (blockAlign - 4 * channels) * 2 / channels + 1

  // ── MS ADPCM (wave format 0x02) ────────────────────────────────────

  /** The public MS ADPCM adaptation table (16 entries, one per nibble). */
  private[graft] val MsAdaptTable: Array[Int] = Array(
    230, 230, 230, 230, 307, 409, 512, 614, 768, 614, 512, 409, 307, 230, 230, 230)

  /** The standard 7 MS ADPCM coefficient pairs real encoders write. */
  private[graft] val MsStdCoefs: Array[(Int, Int)] = Array(
    (256, 0), (512, -256), (0, 0), (192, 64), (240, 0), (460, -208), (392, -232))

  /** One MS ADPCM nibble step from state (samp1, samp2, delta) under
    * coefficient pair (c1, c2): (newSample, newDelta). The divisions
    * truncate toward zero (the reference C semantics); `nibble` is the
    * raw unsigned 4-bit code (sign applied internally). `delta` rides
    * 64-bit: the adaptation is multiplicative (×3 max per nibble) and a
    * crafted nibble stream would overflow 32-bit state — the decode
    * loop bounds it loud instead (real encoders keep delta near the
    * 16-bit header range). */
  private[graft] def msStep(samp1: Int, samp2: Int, delta: Long,
                            c1: Int, c2: Int, nibble: Int): (Int, Long) = {
    val signed = if (nibble >= 8) nibble - 16 else nibble
    val predictor = (samp1.toLong * c1 + samp2.toLong * c2) / 256
    val sample = math.max(-32768L, math.min(32767L, predictor + signed * delta)).toInt
    val nd = math.max(16L, MsAdaptTable(nibble) * delta / 256)
    (sample, nd)
  }

  /** Samples per MS ADPCM block: the two header samples plus two
    * nibbles per data byte, per channel. */
  private def msSamplesPerBlock(blockAlign: Int, channels: Int): Int =
    2 + (blockAlign - 7 * channels) * 2 / channels

  /** True iff `content` starts with the RIFF/WAVE 12-byte preamble. */
  def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  def decode(bytes: Array[Byte]): WavAudio = {
    require(isWav(bytes), "WavCodec: not a WAV (missing RIFF/WAVE preamble)")
    def le16(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    def le32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    val riffSize = le32(4)
    require(riffSize + 8 <= bytes.length,
      s"WavCodec: RIFF declares ${riffSize + 8} bytes, file has ${bytes.length}")

    var pos = 12
    var sampleRate = 0; var channels = 0; var bits = 0
    var blockAlign = 0
    var format = 1
    var msCoefs: Array[(Int, Int)] = null
    var fmtSeen = false
    var data: (Int, Int) = null // (offset, length)
    val end = (riffSize + 8).toInt
    while (pos + 8 <= end && data == null) {
      val cid = new String(bytes, pos, 4, "US-ASCII")
      val clen = le32(pos + 4)
      require(clen <= Int.MaxValue - 8 && pos + 8 + clen <= end,
        s"WavCodec: chunk '$cid' at $pos declares $clen bytes past the RIFF end")
      val off = pos + 8
      cid match {
        case "fmt " =>
          require(!fmtSeen, "WavCodec: duplicate fmt chunk")
          require(clen >= 16, s"WavCodec: fmt chunk of $clen bytes (want >= 16)")
          fmtSeen = true
          val fmtTag = le16(off)
          val fmt =
            if (fmtTag == 0xfffe) {
              // WAVE_FORMAT_EXTENSIBLE (round 17) — the default container
              // modern recorders write for >16-bit or multi-channel
              // audio: the REAL format code rides the SubFormat GUID's
              // first two bytes; the remaining 14 must be the fixed
              // KSDATAFORMAT suffix, and wValidBitsPerSample must equal
              // the container width (padded containers are out of scope
              // — fail loud, never scale silently)
              require(clen >= 40,
                s"WavCodec: extensible fmt chunk of $clen bytes (want >= 40)")
              val cbSize = le16(off + 16)
              require(cbSize >= 22,
                s"WavCodec: extensible cbSize $cbSize (want >= 22)")
              val validBits = le16(off + 18)
              val containerBits = le16(off + 14)
              require(validBits == containerBits,
                s"WavCodec: extensible wValidBitsPerSample $validBits != " +
                  s"container $containerBits bits (padded containers out of scope)")
              val guidFmt = le16(off + 24)
              val tail = Array(0x00, 0x00, 0x00, 0x00, 0x10, 0x00, 0x80, 0x00,
                0x00, 0xaa, 0x00, 0x38, 0x9b, 0x71)
              var k = 0
              while (k < 14) {
                require((bytes(off + 26 + k) & 0xff) == tail(k),
                  f"WavCodec: SubFormat GUID byte ${k + 2} is " +
                    f"0x${bytes(off + 26 + k) & 0xff}%02x (want 0x${tail(k)}%02x) " +
                    "— not a KSDATAFORMAT subtype")
                k += 1
              }
              require(guidFmt == 1 || guidFmt == 3,
                s"WavCodec: extensible SubFormat $guidFmt unsupported " +
                  "(1 = integer PCM, 3 = IEEE float)")
              guidFmt
            } else fmtTag
          require(fmt == 1 || fmt == 2 || fmt == 3 || fmt == 6 || fmt == 7 ||
              fmt == 0x11,
            s"WavCodec: audio format $fmt unsupported (1 = integer PCM, " +
              "2 = MS ADPCM, 3 = IEEE float, 6 = G.711 A-law, " +
              "7 = G.711 mu-law, 17 = IMA ADPCM, 0xFFFE = extensible " +
              "wrapping PCM/float)")
          format = fmt
          channels = le16(off + 2)
          require(channels >= 1 && channels <= 8,
            s"WavCodec: $channels channels unsupported (1-8)")
          sampleRate = le32(off + 4).toInt
          require(sampleRate > 0, "WavCodec: zero sample rate")
          val byteRate = le32(off + 8)
          blockAlign = le16(off + 12)
          bits = le16(off + 14)
          if (format == 2) {
            // MS ADPCM: 4-bit nibbles in self-contained blocks; the
            // extended fmt carries samplesPerBlock and the coefficient
            // table (the file's own — custom pairs are legal)
            require(bits == 4,
              s"WavCodec: MS ADPCM with $bits bits/sample (4-bit nibbles only)")
            require(blockAlign > 7 * channels &&
                ((blockAlign - 7 * channels) * 2) % channels == 0,
              s"WavCodec: MS ADPCM block align $blockAlign not 7·$channels " +
                "header bytes + whole per-channel nibble payload")
            require(clen >= 22, s"WavCodec: MS ADPCM fmt chunk of $clen bytes " +
              "(want >= 22: cbSize + samplesPerBlock + numCoef + coefs)")
            val declaredSpb = le16(off + 18)
            val spb = msSamplesPerBlock(blockAlign, channels)
            require(declaredSpb == spb,
              s"WavCodec: fmt declares $declaredSpb samples/block, block " +
                s"geometry implies $spb")
            val numCoef = le16(off + 20)
            require(numCoef >= 1 && 22 + 4 * numCoef <= clen,
              s"WavCodec: MS ADPCM declares $numCoef coef pairs in a " +
                s"$clen-byte fmt chunk")
            msCoefs = Array.tabulate(numCoef) { k =>
              (le16(off + 22 + 4 * k).toShort.toInt,
               le16(off + 24 + 4 * k).toShort.toInt)
            }
            // ±1 byte/s tolerance: real-world ADPCM encoders compute
            // nAvgBytesPerSec with different rounding (up vs truncate);
            // block geometry is fully validated above, so a conforming
            // wild file must not reject on a rounding convention
            require(math.abs(byteRate - sampleRate.toLong * blockAlign / spb) <= 1,
              s"WavCodec: byte rate $byteRate contradicts " +
                s"$sampleRate Hz x $blockAlign-byte blocks of $spb samples")
          } else if (format == 0x11) {
            // IMA ADPCM: 4-bit nibbles in self-contained blocks of
            // blockAlign bytes; the extended fmt fields must declare
            // the samples-per-block the geometry implies
            require(bits == 4,
              s"WavCodec: IMA ADPCM with $bits bits/sample (4-bit nibbles only)")
            require(blockAlign > 4 * channels &&
                (blockAlign - 4 * channels) % (4 * channels) == 0,
              s"WavCodec: IMA ADPCM block align $blockAlign not 4·$channels " +
                "header bytes + whole 4-byte nibble groups per channel")
            require(clen >= 20, s"WavCodec: IMA ADPCM fmt chunk of $clen bytes " +
              "(want >= 20: cbSize + samplesPerBlock)")
            val cbSize = le16(off + 16)
            require(cbSize >= 2, s"WavCodec: IMA ADPCM cbSize $cbSize (want >= 2)")
            val declaredSpb = le16(off + 18)
            val spb = adpcmSamplesPerBlock(blockAlign, channels)
            require(declaredSpb == spb,
              s"WavCodec: fmt declares $declaredSpb samples/block, block " +
                s"geometry implies $spb")
            // same ±1 byte/s rounding tolerance as the MS ADPCM leg
            require(math.abs(byteRate - sampleRate.toLong * blockAlign / spb) <= 1,
              s"WavCodec: byte rate $byteRate contradicts " +
                s"$sampleRate Hz x $blockAlign-byte blocks of $spb samples")
          } else if (format == 3) {
            // IEEE float: 32-bit only (float64 WAVs are vanishingly
            // rare and would double every buffer for no gate value)
            require(bits == 32,
              s"WavCodec: IEEE-float WAV with $bits bits/sample (32 only)")
            require(blockAlign == channels * 4,
              s"WavCodec: block align $blockAlign contradicts " +
                s"$channels ch x 32 bit float")
            require(byteRate == sampleRate.toLong * blockAlign,
              s"WavCodec: byte rate $byteRate contradicts " +
                s"$sampleRate Hz x $blockAlign bytes/frame")
          } else {
            // 24/32-bit (LE signed) join 8/16 for integer PCM only
            // (round 17 — the >16-bit depths extensible recorders and
            // DAW exports write)
            require(bits == 8 || bits == 16 ||
                ((bits == 24 || bits == 32) && format == 1),
              s"WavCodec: $bits bits/sample unsupported " +
                "(8 or 16; 24/32 for integer PCM)")
            require(format == 1 || bits == 8,
              s"WavCodec: G.711 with $bits bits/sample (8-bit codes only)")
            require(blockAlign == channels * (bits / 8),
              s"WavCodec: block align $blockAlign contradicts " +
                s"$channels ch x $bits bit")
            require(byteRate == sampleRate.toLong * blockAlign,
              s"WavCodec: byte rate $byteRate contradicts " +
                s"$sampleRate Hz x $blockAlign bytes/frame")
          }
        case "data" =>
          require(fmtSeen, "WavCodec: data chunk before fmt")
          data = (off, clen.toInt)
        case _ => // LIST/fact/cue/…: ancillary, skip
      }
      // chunks are word-aligned: odd sizes carry one pad byte (RIFF spec)
      pos = off + clen.toInt + (clen.toInt & 1)
    }
    require(fmtSeen, "WavCodec: no fmt chunk")
    require(data != null, "WavCodec: no data chunk")
    val (dOff, dLen) = data
    if (format == 2) {
      // MS ADPCM block: per-channel headers FIELD-GROUPED (all
      // bPredictor u8, all iDelta i16, all iSamp1 i16, all iSamp2 i16),
      // then nibbles HIGH-first round-robin across channels. iSamp2 is
      // the OLDER sample and plays FIRST (the public layout).
      require(dLen % blockAlign == 0,
        s"WavCodec: ADPCM data payload of $dLen bytes is not whole " +
          s"$blockAlign-byte blocks")
      val spb = msSamplesPerBlock(blockAlign, channels)
      val nBlocks = dLen / blockAlign
      require(nBlocks.toLong * spb * channels <= (1L << 30),
        s"WavCodec: ADPCM stream of ${nBlocks.toLong * spb} frames x " +
          s"$channels ch exceeds the 2^30-sample decode bound")
      val frames = nBlocks * spb
      val out = new Array[Int](frames * channels)
      def i16(at: Int): Int = ((bytes(at) & 0xff) | (bytes(at + 1) << 8)).toShort.toInt
      var b = 0
      while (b < nBlocks) {
        val blockAt = dOff + b * blockAlign
        val c1 = new Array[Int](channels); val c2 = new Array[Int](channels)
        val delta = new Array[Long](channels)
        val samp1 = new Array[Int](channels); val samp2 = new Array[Int](channels)
        var c = 0
        while (c < channels) {
          val pred = bytes(blockAt + c) & 0xff
          require(pred < msCoefs.length,
            s"WavCodec: MS ADPCM block $b channel $c predictor $pred names no " +
              s"coefficient pair (table has ${msCoefs.length})")
          c1(c) = msCoefs(pred)._1; c2(c) = msCoefs(pred)._2
          delta(c) = i16(blockAt + channels + 2 * c).toLong
          require(delta(c) > 0,
            s"WavCodec: MS ADPCM block $b channel $c initial delta ${delta(c)} <= 0")
          samp1(c) = i16(blockAt + 3 * channels + 2 * c)
          samp2(c) = i16(blockAt + 5 * channels + 2 * c)
          out((b * spb) * channels + c) = samp2(c)
          out((b * spb + 1) * channels + c) = samp1(c)
          c += 1
        }
        val dataAt = blockAt + 7 * channels
        val nNib = (blockAlign - 7 * channels) * 2
        var k = 0
        while (k < nNib) {
          val byte = bytes(dataAt + (k >> 1)) & 0xff
          val nib = if ((k & 1) == 0) (byte >> 4) & 0xf else byte & 0xf
          val ch = k % channels
          val (s2, nd) = msStep(samp1(ch), samp2(ch), delta(ch), c1(ch), c2(ch), nib)
          samp2(ch) = samp1(ch); samp1(ch) = s2; delta(ch) = nd
          require(nd <= (1L << 30),
            s"WavCodec: MS ADPCM block $b adaptation delta $nd overflows the " +
              "2^30 bound (×3-per-nibble growth — not a real encoder's stream)")
          out((b * spb + 2 + k / channels) * channels + ch) = s2
          k += 1
        }
        b += 1
      }
      return WavAudio(sampleRate, channels, bits, frames, out, format)
    }
    if (format == 0x11) {
      // block-structured: per channel a 4-byte header (initial
      // predictor i16 LE = SAMPLE 0, step index u8, reserved u8), then
      // 4-byte nibble groups round-robin across channels, low nibble
      // first — the public IMA-in-WAV layout
      require(dLen % blockAlign == 0,
        s"WavCodec: ADPCM data payload of $dLen bytes is not whole " +
          s"$blockAlign-byte blocks")
      val spb = adpcmSamplesPerBlock(blockAlign, channels)
      val nBlocks = dLen / blockAlign
      // spb ≈ 2·blockAlign/channels, so total samples ≈ 2·dLen and a
      // ~0.5 GB data chunk overflows Int — fail loud, not
      // NegativeArraySizeException
      require(nBlocks.toLong * spb * channels <= (1L << 30),
        s"WavCodec: ADPCM stream of ${nBlocks.toLong * spb} frames x " +
          s"$channels ch exceeds the 2^30-sample decode bound")
      val frames = nBlocks * spb
      val out = new Array[Int](frames * channels)
      var b = 0
      while (b < nBlocks) {
        val blockAt = dOff + b * blockAlign
        val pred = new Array[Int](channels)
        val idx = new Array[Int](channels)
        var c = 0
        while (c < channels) {
          val h = blockAt + 4 * c
          pred(c) = ((bytes(h) & 0xff) | (bytes(h + 1) << 8)).toShort.toInt
          idx(c) = bytes(h + 2) & 0xff
          require(idx(c) <= 88,
            s"WavCodec: ADPCM block $b channel $c step index ${idx(c)} > 88")
          require(bytes(h + 3) == 0,
            s"WavCodec: ADPCM block $b channel $c reserved header byte nonzero")
          out((b * spb) * channels + c) = pred(c)
          c += 1
        }
        val groups = (blockAlign - 4 * channels) / 4 // per-channel groups × channels
        var g = 0
        while (g < groups) {
          val ch = g % channels
          val groupOfCh = g / channels
          val gAt = blockAt + 4 * channels + 4 * g
          var k = 0
          while (k < 8) {
            val byte = bytes(gAt + (k >> 1)) & 0xff
            val nib = if ((k & 1) == 0) byte & 0xf else (byte >> 4) & 0xf
            val (p, ni) = imaStep(pred(ch), idx(ch), nib)
            pred(ch) = p; idx(ch) = ni
            val frameInBlock = 1 + groupOfCh * 8 + k
            out((b * spb + frameInBlock) * channels + ch) = p
            k += 1
          }
          g += 1
        }
        b += 1
      }
      return WavAudio(sampleRate, channels, bits, frames, out, format)
    }
    require(dLen % blockAlign == 0,
      s"WavCodec: data payload of $dLen bytes is not whole frames " +
        s"(block align $blockAlign)")
    val frames = dLen / blockAlign
    val n = frames * channels
    val out = new Array[Int](n)
    if (format == 3) {
      // IEEE float, full scale ±1.0 → SIGNED LINEAR at 16-bit scale:
      // sample = rint(f · 32768), clamped. A fixture float k/32768 is
      // EXACTLY representable (power-of-two denominator), so the round
      // trip is integer-exact and a SQL oracle replays k directly.
      var i = 0
      while (i < n) {
        val bits32 = (bytes(dOff + 4 * i) & 0xff) |
          ((bytes(dOff + 4 * i + 1) & 0xff) << 8) |
          ((bytes(dOff + 4 * i + 2) & 0xff) << 16) |
          ((bytes(dOff + 4 * i + 3) & 0xff) << 24)
        val f = java.lang.Float.intBitsToFloat(bits32)
        require(!f.isNaN && !f.isInfinite && math.abs(f) <= 1.0f,
          s"WavCodec: float sample $i is $f (want finite in [-1, 1])")
        out(i) = math.max(-32768L, math.min(32767L,
          math.rint(f.toDouble * 32768).toLong)).toInt
        i += 1
      }
    } else if (format == 7) {
      var i = 0
      while (i < n) { out(i) = mulawExpand(bytes(dOff + i) & 0xff); i += 1 }
    } else if (format == 6) {
      var i = 0
      while (i < n) { out(i) = alawExpand(bytes(dOff + i) & 0xff); i += 1 }
    } else if (bits == 8) {
      var i = 0
      while (i < n) { out(i) = (bytes(dOff + i) & 0xff) - 128; i += 1 }
    } else if (bits == 16) {
      var i = 0
      while (i < n) {
        out(i) = ((bytes(dOff + 2 * i) & 0xff) |
          (bytes(dOff + 2 * i + 1) << 8)).toShort.toInt
        i += 1
      }
    } else if (bits == 24) {
      // 24-bit LE signed: native scale (−2^23..2^23−1), NOT rescaled —
      // the [[WavAudio]] contract is signed linear at wire depth, and a
      // silent >>8 would destroy the exactness the oracles replay
      var i = 0
      while (i < n) {
        out(i) = ((bytes(dOff + 3 * i) & 0xff) |
          ((bytes(dOff + 3 * i + 1) & 0xff) << 8) |
          (bytes(dOff + 3 * i + 2) << 16))
        i += 1
      }
    } else {
      // 32-bit LE signed, native scale (the DAW-export integer depth)
      var i = 0
      while (i < n) {
        out(i) = (bytes(dOff + 4 * i) & 0xff) |
          ((bytes(dOff + 4 * i + 1) & 0xff) << 8) |
          ((bytes(dOff + 4 * i + 2) & 0xff) << 16) |
          (bytes(dOff + 4 * i + 3) << 24)
        i += 1
      }
    }
    WavAudio(sampleRate, channels, bits, frames, out, format)
  }

  /** G.711 WAV ENCODE: `codes` are raw 8-bit codes written as
    * format-`format` data (7 = µ-law, 6 = A-law; one byte per sample,
    * block align = channels). */
  def encodeMulaw(sampleRate: Int, channels: Int, codes: Array[Byte],
                  format: Int = 7): Array[Byte] = {
    require(format == 6 || format == 7,
      s"WavCodec.encodeMulaw: format $format (6 = A-law, 7 = mu-law)")
    require(channels >= 1 && channels <= 8, s"WavCodec.encodeMulaw: $channels channels")
    require(sampleRate > 0, "WavCodec.encodeMulaw: zero sample rate")
    require(codes.length % channels == 0,
      s"WavCodec.encodeMulaw: ${codes.length} codes not whole $channels-channel frames")
    val out = new ByteArrayOutputStream(44 + codes.length)
    def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    w("RIFF"); le32(36 + codes.length); w("WAVE")
    w("fmt "); le32(16)
    le16(format); le16(channels); le32(sampleRate)
    le32(sampleRate * channels); le16(channels); le16(8)
    w("data"); le32(codes.length)
    out.write(codes, 0, codes.length)
    out.toByteArray
  }

  /** IMA ADPCM WAV ENCODE from RAW block material (the synthesis-side
    * primitive, like [[encodeMulaw]]'s raw codes): each block is
    * (initial predictor per channel, initial step index per channel,
    * nibble payload of blockAlign − 4·channels bytes). The header
    * triplets and payload are written verbatim — the decoder's
    * recursion is what a gate exercises, so the wire content is
    * formula-controlled by the caller. */
  def encodeAdpcm(sampleRate: Int, channels: Int, blockAlign: Int,
                  blocks: Seq[(Array[Int], Array[Int], Array[Byte])]): Array[Byte] = {
    require(channels >= 1 && channels <= 8, s"WavCodec.encodeAdpcm: $channels channels")
    require(sampleRate > 0, "WavCodec.encodeAdpcm: zero sample rate")
    require(blockAlign > 4 * channels &&
        (blockAlign - 4 * channels) % (4 * channels) == 0,
      s"WavCodec.encodeAdpcm: bad block align $blockAlign for $channels ch")
    require(blocks.nonEmpty, "WavCodec.encodeAdpcm: no blocks")
    val spb = adpcmSamplesPerBlock(blockAlign, channels)
    val dataLen = blocks.length * blockAlign
    val out = new ByteArrayOutputStream(60 + dataLen)
    def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    w("RIFF"); le32(40 + dataLen); w("WAVE")
    w("fmt "); le32(20)
    le16(0x11); le16(channels); le32(sampleRate)
    le32((sampleRate.toLong * blockAlign / spb).toInt)
    le16(blockAlign); le16(4)
    le16(2); le16(spb) // cbSize, samplesPerBlock
    w("data"); le32(dataLen)
    blocks.foreach { case (preds, idxs, payload) =>
      require(preds.length == channels && idxs.length == channels,
        "WavCodec.encodeAdpcm: per-channel header arity mismatch")
      require(payload.length == blockAlign - 4 * channels,
        s"WavCodec.encodeAdpcm: payload ${payload.length} != " +
          s"${blockAlign - 4 * channels}")
      var c = 0
      while (c < channels) {
        require(preds(c) >= Short.MinValue && preds(c) <= Short.MaxValue,
          s"WavCodec.encodeAdpcm: predictor ${preds(c)} out of 16-bit range")
        require(idxs(c) >= 0 && idxs(c) <= 88,
          s"WavCodec.encodeAdpcm: step index ${idxs(c)} out of [0,88]")
        le16(preds(c) & 0xffff); out.write(idxs(c)); out.write(0)
        c += 1
      }
      out.write(payload, 0, payload.length)
    }
    out.toByteArray
  }

  /** MS ADPCM WAV ENCODE from RAW block material (the [[encodeAdpcm]]
    * convention): each block is (per-channel predictor indexes, initial
    * deltas, iSamp1s, iSamp2s, nibble payload of blockAlign −
    * 7·channels bytes), written verbatim with the coefficient table in
    * the extended fmt chunk. */
  def encodeMsAdpcm(sampleRate: Int, channels: Int, blockAlign: Int,
                    blocks: Seq[(Array[Int], Array[Int], Array[Int], Array[Int], Array[Byte])],
                    coefs: Array[(Int, Int)] = MsStdCoefs): Array[Byte] = {
    require(channels >= 1 && channels <= 8, s"WavCodec.encodeMsAdpcm: $channels channels")
    require(sampleRate > 0, "WavCodec.encodeMsAdpcm: zero sample rate")
    require(blockAlign > 7 * channels &&
        ((blockAlign - 7 * channels) * 2) % channels == 0,
      s"WavCodec.encodeMsAdpcm: bad block align $blockAlign for $channels ch")
    require(blocks.nonEmpty, "WavCodec.encodeMsAdpcm: no blocks")
    require(coefs.nonEmpty && coefs.length <= 255, "WavCodec.encodeMsAdpcm: coef table")
    val spb = msSamplesPerBlock(blockAlign, channels)
    val cbSize = 4 + 4 * coefs.length
    val dataLen = blocks.length * blockAlign
    val out = new ByteArrayOutputStream(60 + cbSize + dataLen)
    def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    // RIFF word alignment: an odd data chunk carries one pad byte,
    // counted in the PARENT size but not the chunk's own (the spec —
    // blockAlign 39 makes odd-block-count files odd-sized)
    val pad = dataLen & 1
    w("RIFF"); le32(20 + 18 + cbSize + dataLen + pad); w("WAVE")
    w("fmt "); le32(18 + cbSize)
    le16(2); le16(channels); le32(sampleRate)
    le32((sampleRate.toLong * blockAlign / spb).toInt)
    le16(blockAlign); le16(4)
    le16(cbSize); le16(spb); le16(coefs.length)
    coefs.foreach { case (a, b) => le16(a & 0xffff); le16(b & 0xffff) }
    w("data"); le32(dataLen)
    blocks.foreach { case (preds, deltas, samp1s, samp2s, payload) =>
      require(preds.length == channels && deltas.length == channels &&
          samp1s.length == channels && samp2s.length == channels,
        "WavCodec.encodeMsAdpcm: per-channel header arity mismatch")
      require(payload.length == blockAlign - 7 * channels,
        s"WavCodec.encodeMsAdpcm: payload ${payload.length} != " +
          s"${blockAlign - 7 * channels}")
      preds.foreach(p => require(p >= 0 && p < coefs.length,
        s"WavCodec.encodeMsAdpcm: predictor $p outside the coef table"))
      deltas.foreach(d => require(d > 0 && d <= Short.MaxValue,
        s"WavCodec.encodeMsAdpcm: initial delta $d out of (0, 32767]"))
      (samp1s ++ samp2s).foreach(v =>
        require(v >= Short.MinValue && v <= Short.MaxValue,
          s"WavCodec.encodeMsAdpcm: header sample $v out of 16-bit range"))
      preds.foreach(out.write)
      deltas.foreach(d => le16(d & 0xffff))
      samp1s.foreach(v => le16(v & 0xffff))
      samp2s.foreach(v => le16(v & 0xffff))
      out.write(payload, 0, payload.length)
    }
    if (pad == 1) out.write(0)
    out.toByteArray
  }

  /** IEEE-FLOAT WAV ENCODE (format 3): `samples` are SIGNED LINEAR
    * 16-bit-scale ints written as exactly-representable floats
    * k/32768, with the spec's non-PCM shape (18-byte fmt with cbSize 0
    * + a fact chunk carrying the frame count). */
  def encodeFloat(sampleRate: Int, channels: Int, samples: Array[Int]): Array[Byte] = {
    require(channels >= 1 && channels <= 8, s"WavCodec.encodeFloat: $channels channels")
    require(sampleRate > 0, "WavCodec.encodeFloat: zero sample rate")
    require(samples.length % channels == 0,
      s"WavCodec.encodeFloat: ${samples.length} samples not whole " +
        s"$channels-channel frames")
    samples.foreach(v => require(v >= Short.MinValue && v <= Short.MaxValue,
      s"WavCodec.encodeFloat: sample $v out of 16-bit scale"))
    val dataLen = samples.length * 4
    val out = new ByteArrayOutputStream(60 + dataLen)
    def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    w("RIFF"); le32(4 + 26 + 12 + 8 + dataLen); w("WAVE")
    w("fmt "); le32(18)
    le16(3); le16(channels); le32(sampleRate)
    le32(sampleRate * channels * 4); le16(channels * 4); le16(32)
    le16(0) // cbSize
    w("fact"); le32(4); le32(samples.length / channels)
    w("data"); le32(dataLen)
    samples.foreach { v =>
      le32(java.lang.Float.floatToIntBits(v / 32768.0f))
    }
    out.toByteArray
  }

  /** WAV ENCODE for fixtures and in-engine synthesis: `samples` is
    * channel-interleaved SIGNED values (the [[decode]] convention — 8-bit
    * writes value+128 unsigned per spec, 16/24-bit signed LE). With
    * `extensible` the fmt chunk is the 40-byte WAVE_FORMAT_EXTENSIBLE
    * form (tag 0xFFFE, wValidBitsPerSample = container bits, default
    * channel mask, KSDATAFORMAT_SUBTYPE_PCM GUID) — the wrapper modern
    * recorders write (round 17). */
  def encode(sampleRate: Int, channels: Int, bitsPerSample: Int,
             samples: Array[Int], extensible: Boolean = false): Array[Byte] = {
    require(channels >= 1 && channels <= 8, s"WavCodec.encode: $channels channels")
    require(bitsPerSample == 8 || bitsPerSample == 16 || bitsPerSample == 24 ||
        bitsPerSample == 32,
      s"WavCodec.encode: $bitsPerSample bits/sample (8, 16, 24 or 32)")
    require(sampleRate > 0, "WavCodec.encode: zero sample rate")
    require(samples.length % channels == 0,
      s"WavCodec.encode: ${samples.length} samples not whole $channels-channel frames")
    val bps = bitsPerSample / 8
    val blockAlign = channels * bps
    val dataLen = samples.length * bps
    val fmtLen = if (extensible) 40 else 16
    val out = new ByteArrayOutputStream(28 + fmtLen + dataLen)
    def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    w("RIFF"); le32(20 + fmtLen + dataLen); w("WAVE")
    w("fmt "); le32(fmtLen)
    le16(if (extensible) 0xfffe else 1); le16(channels); le32(sampleRate)
    le32(sampleRate * blockAlign); le16(blockAlign); le16(bitsPerSample)
    if (extensible) {
      le16(22) // cbSize
      le16(bitsPerSample) // wValidBitsPerSample = container width
      le32(if (channels == 1) 0x4 else if (channels == 2) 0x3 else 0)
      // KSDATAFORMAT_SUBTYPE_PCM {00000001-0000-0010-8000-00aa00389b71}
      le32(1); le16(0); le16(0x10)
      Seq(0x80, 0x00, 0x00, 0xaa, 0x00, 0x38, 0x9b, 0x71).foreach(out.write)
    }
    w("data"); le32(dataLen)
    if (bitsPerSample == 8) {
      var i = 0
      while (i < samples.length) {
        val v = samples(i) + 128
        require(v >= 0 && v <= 255,
          s"WavCodec.encode: 8-bit sample ${samples(i)} out of [-128,127]")
        out.write(v)
        i += 1
      }
    } else if (bitsPerSample == 16) {
      var i = 0
      while (i < samples.length) {
        val v = samples(i)
        require(v >= Short.MinValue && v <= Short.MaxValue,
          s"WavCodec.encode: 16-bit sample $v out of range")
        out.write(v & 0xff); out.write((v >> 8) & 0xff)
        i += 1
      }
    } else if (bitsPerSample == 24) {
      var i = 0
      while (i < samples.length) {
        val v = samples(i)
        require(v >= -(1 << 23) && v < (1 << 23),
          s"WavCodec.encode: 24-bit sample $v out of range")
        out.write(v & 0xff); out.write((v >> 8) & 0xff); out.write((v >> 16) & 0xff)
        i += 1
      }
    } else {
      var i = 0
      while (i < samples.length) {
        val v = samples(i)
        out.write(v & 0xff); out.write((v >> 8) & 0xff)
        out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
        i += 1
      }
    }
    out.toByteArray
  }
}
