package graft.multimodal

import java.io.ByteArrayOutputStream

/** A minimal real MP4 (ISO/IEC 14496-12 ISO-BMFF) container codec —
  * the wrapper video corpora overwhelmingly arrive in (the next rung up
  * from [[AviCodec]]'s RIFF). Only the CONTAINER is in scope: frame
  * payloads are handed to [[JpegCodec]] untouched, exactly like the
  * AVI leg (reference behavior: the blob pipeline treats video bytes as
  * opaque uploads, Function.java:35-60; frame decode is this engine's
  * scale-path extension).
  *
  * Scope (fail-loud beyond it, never silent garbage):
  *  - box walk `ftyp`/`moov`/`mdat` (+ skipped `free`/`udta`/…);
  *    64-bit largesize boxes accepted, sizes must nest exactly
  *  - the FIRST `vide`-handler track ("stream 0"): its `stbl` must
  *    declare ONE `stsd` sample entry of format `jpeg` (or QuickTime
  *    `mjpa`) — other codecs (avc1, hev1, mp4v…) name themselves in
  *    the error
  *  - samples resolved through the full `stsc` (sample-to-chunk run
  *    map) × `stco`/`co64` (chunk offsets) × `stsz` (sizes) walk, with
  *    every slice bounds-checked against the file
  *  - FRAGMENTED MP4 (round 17 — the streaming-era default): `moof`
  *    fragments walked in file order, each `traf` of the video track
  *    resolved through `tfhd` (explicit base-data-offset or
  *    default-base-is-moof; other addressing modes fail loud) ×
  *    `trun` (per-sample sizes, or the tfhd/`trex` default size),
  *    appended after any `stbl`-declared samples; `mvex` WITHOUT
  *    fragments still fails loud
  *  - every count field is checked against its OWN box's payload
  *    (fixed header first, then the variable table) — a truncated box
  *    can never read sibling bytes as table entries
  */
object Mp4Codec {

  /** True iff `content` opens with an ISO-BMFF `ftyp` box. */
  def isMp4(b: Array[Byte]): Boolean =
    b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  private final case class Box(tpe: String, at: Int, payloadAt: Int,
                               payloadEnd: Int)

  /** Video-frame payloads of the first `vide` track, in sample order. */
  def videoFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    require(isMp4(bytes), "Mp4Codec: not an MP4 (missing ftyp box)")
    def u8(i: Int): Int = {
      require(i >= 0 && i < bytes.length, s"Mp4Codec: truncated file at $i")
      bytes(i) & 0xff
    }
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long = (u16(i).toLong << 16) | u16(i + 2).toLong
    def u64(i: Int): Long = (u32(i) << 32) | u32(i + 4)
    def fourcc(i: Int): String = new String(bytes, i, 4, "US-ASCII")

    /** Child boxes of [from, to): header walk with exact nesting. */
    def boxes(from: Int, to: Int): Seq[Box] = {
      val out = Seq.newBuilder[Box]
      var pos = from
      while (pos < to) {
        require(pos + 8 <= to,
          s"Mp4Codec: ${to - pos} residue byte(s) at $pos (truncated box header)")
        val size32 = u32(pos)
        val tpe = fourcc(pos + 4)
        val (payloadAt, size) =
          if (size32 == 1) {
            require(pos + 16 <= to, s"Mp4Codec: box '$tpe' at $pos truncates largesize")
            (pos + 16, u64(pos + 8))
          } else if (size32 == 0) (pos + 8, (to - pos).toLong) // to end of parent
          else (pos + 8, size32)
        require(size >= (payloadAt - pos).toLong && pos + size <= to,
          s"Mp4Codec: box '$tpe' at $pos declares $size bytes past its parent end $to")
        out += Box(tpe, pos, payloadAt, (pos + size).toInt)
        pos = (pos + size).toInt
      }
      out.result()
    }

    val top = boxes(0, bytes.length)
    val fragmented = top.exists(_.tpe == "moof")
    val moov = top.find(_.tpe == "moov").getOrElse(throw new IllegalArgumentException(
      "Mp4Codec: no moov box — no sample tables to locate frames with"))
    val moovKids = boxes(moov.payloadAt, moov.payloadEnd)
    require(fragmented || !moovKids.exists(_.tpe == "mvex"),
      "Mp4Codec: mvex in moov but no moof fragments — a fragment-extended " +
        "movie with no fragments carries no addressable samples")

    def child(parent: Box, tpe: String): Option[Box] =
      boxes(parent.payloadAt, parent.payloadEnd).find(_.tpe == tpe)
    def requireChild(parent: Box, tpe: String): Box =
      child(parent, tpe).getOrElse(throw new IllegalArgumentException(
        s"Mp4Codec: ${parent.tpe} has no $tpe box"))
    // FIXED header fields must lie inside the box's payload — without
    // this a truncated box reads sibling-box bytes as its header
    // (ADVICE r16: requireFits only guarded the variable tables)
    def requireHeader(b: Box, n: Int): Unit =
      require(b.payloadEnd - b.payloadAt >= n,
        s"Mp4Codec: ${b.tpe} box holds ${b.payloadEnd - b.payloadAt} payload " +
          s"bytes (fixed header wants $n)")

    // first vide-handler track = "stream 0"
    val trak = moovKids.filter(_.tpe == "trak").find { t =>
      val mdia = child(t, "mdia")
      mdia.flatMap(child(_, "hdlr")).exists { h =>
        // hdlr: version/flags u32, pre_defined u32, handler_type fourcc
        h.payloadAt + 12 <= h.payloadEnd && fourcc(h.payloadAt + 8) == "vide"
      }
    }.getOrElse(throw new IllegalArgumentException(
      "Mp4Codec: no vide-handler track in moov"))
    val stbl = requireChild(requireChild(requireChild(trak, "mdia"), "minf"), "stbl")

    // stsd: the sample-entry format must be a motion-JPEG codec
    val stsd = requireChild(stbl, "stsd")
    requireHeader(stsd, 16) // version/flags + entry_count + first entry header
    val entryCount = u32(stsd.payloadAt + 4)
    require(entryCount == 1,
      s"Mp4Codec: stsd declares $entryCount sample entries (want exactly 1)")
    val fmt = fourcc(stsd.payloadAt + 8 + 4)
    require(fmt == "jpeg" || fmt == "mjpa",
      s"Mp4Codec: sample-entry codec '$fmt' unsupported (jpeg/mjpa motion-JPEG only)")

    // a count field must leave room for its entries INSIDE the box —
    // reading a sibling box's bytes as table entries is silent garbage
    def requireFits(b: Box, entries: Long, bytesPer: Int, headBytes: Int): Unit =
      require(b.payloadAt + headBytes + entries * bytesPer <= b.payloadEnd,
        s"Mp4Codec: ${b.tpe} declares $entries entries but holds " +
          s"${b.payloadEnd - b.payloadAt - headBytes} table bytes")

    val out = Seq.newBuilder[Array[Byte]]
    def slice(off: Long, sz: Long, what: String): Unit = {
      require(off >= 0 && sz > 0 && off + sz <= bytes.length,
        s"Mp4Codec: $what at $off+$sz runs past EOF (${bytes.length})")
      out += java.util.Arrays.copyOfRange(bytes, off.toInt, (off + sz).toInt)
    }

    // ── stbl-declared samples (the progressive-download layout) ──────
    // stsz: per-sample byte sizes. In a fragmented file the stbl is
    // usually EMPTY (count 0) and the fragments carry every sample.
    val stsz = requireChild(stbl, "stsz")
    requireHeader(stsz, 12)
    val uniformSize = u32(stsz.payloadAt + 4)
    val sampleCount = u32(stsz.payloadAt + 8)
    require(sampleCount <= (1 << 20), s"Mp4Codec: stsz declares $sampleCount samples")
    require(sampleCount > 0 || fragmented,
      "Mp4Codec: stsz declares 0 samples and the file has no fragments")
    if (sampleCount > 0) {
      val sizes: IndexedSeq[Long] =
        if (uniformSize != 0) IndexedSeq.fill(sampleCount.toInt)(uniformSize)
        else {
          requireFits(stsz, sampleCount, 4, headBytes = 12)
          IndexedSeq.tabulate(sampleCount.toInt)(k => u32(stsz.payloadAt + 12 + 4 * k))
        }

      // stco / co64: chunk offsets (absolute file positions)
      val chunkOffsets: IndexedSeq[Long] = child(stbl, "stco") match {
        case Some(stco) =>
          requireHeader(stco, 8)
          val n = u32(stco.payloadAt + 4).toInt
          requireFits(stco, n, 4, headBytes = 8)
          IndexedSeq.tabulate(n)(k => u32(stco.payloadAt + 8 + 4 * k))
        case None =>
          val co64 = requireChild(stbl, "co64")
          requireHeader(co64, 8)
          val n = u32(co64.payloadAt + 4).toInt
          requireFits(co64, n, 8, headBytes = 8)
          IndexedSeq.tabulate(n)(k => u64(co64.payloadAt + 8 + 8 * k))
      }
      require(chunkOffsets.nonEmpty, "Mp4Codec: empty chunk-offset table")

      // stsc: (first_chunk, samples_per_chunk) runs → samples per chunk
      val stsc = requireChild(stbl, "stsc")
      requireHeader(stsc, 8)
      val runCount = u32(stsc.payloadAt + 4).toInt
      require(runCount > 0, "Mp4Codec: empty stsc sample-to-chunk table")
      requireFits(stsc, runCount, 12, headBytes = 8)
      val runs = IndexedSeq.tabulate(runCount) { k =>
        val o = stsc.payloadAt + 8 + 12 * k
        (u32(o), u32(o + 4)) // (first_chunk 1-based, samples_per_chunk)
      }
      // STRICTLY ascending (ISO 14496-12 §8.7.4) — plain `sorted` would
      // admit duplicate first_chunk runs and decode them last-wins
      require(runs.head._1 == 1 &&
          runs.iterator.sliding(2).withPartial(false).forall(w => w(0)._1 < w(1)._1),
        "Mp4Codec: stsc first_chunk runs must start at 1 and strictly ascend")

      // walk chunks in order, slicing each sample at its file offset
      var sample = 0
      var run = 0
      var chunk = 1
      while (sample < sampleCount && chunk <= chunkOffsets.length) {
        while (run + 1 < runs.length && runs(run + 1)._1 <= chunk) run += 1
        val perChunk = runs(run)._2
        var off = chunkOffsets(chunk - 1)
        var k = 0L
        while (k < perChunk && sample < sampleCount) {
          slice(off, sizes(sample), s"sample $sample")
          off += sizes(sample)
          sample += 1
          k += 1
        }
        chunk += 1
      }
      require(sample == sampleCount,
        s"Mp4Codec: chunk walk placed $sample of $sampleCount samples " +
          "(stsc/stco tables inconsistent)")
    }

    // ── moof fragments (round 17 — the streaming-era layout) ─────────
    // the TRACK-TOTAL sample cap must cover fragments too: without it,
    // unbounded trun chains amplify a tiny file into millions of slices
    // (the progressive path's 2^20 cap, made symmetric)
    var totalSamples = sampleCount
    if (fragmented) {
      // the video track's ID (tkhd) selects its traf in each fragment
      val tkhd = requireChild(trak, "tkhd")
      requireHeader(tkhd, 16)
      val tkhdVer = u8(tkhd.payloadAt)
      if (tkhdVer == 1) requireHeader(tkhd, 24)
      val trackId = u32(tkhd.payloadAt + (if (tkhdVer == 1) 20 else 12))

      // trex default sample size (mvex), if declared for this track
      val trexDefaultSize: Option[Long] =
        moovKids.find(_.tpe == "mvex").flatMap { mvex =>
          boxes(mvex.payloadAt, mvex.payloadEnd).filter(_.tpe == "trex").find { tx =>
            requireHeader(tx, 24)
            u32(tx.payloadAt + 4) == trackId
          }.map(tx => u32(tx.payloadAt + 16))
        }

      top.filter(_.tpe == "moof").foreach { moof =>
        boxes(moof.payloadAt, moof.payloadEnd).filter(_.tpe == "traf").foreach { traf =>
          val tfhd = requireChild(traf, "tfhd")
          requireHeader(tfhd, 8)
          val tfFlags = u32(tfhd.payloadAt) & 0xffffff
          if (u32(tfhd.payloadAt + 4) == trackId &&
              (tfFlags & 0x10000) == 0) { // duration-is-empty: no samples
            // optional tfhd fields, in flag order (ISO 14496-12 §8.8.7)
            var p = tfhd.payloadAt + 8
            val baseDataOffset: Long =
              if ((tfFlags & 0x01) != 0) {
                require(p + 8 <= tfhd.payloadEnd,
                  "Mp4Codec: tfhd truncates base-data-offset")
                val v = u64(p); p += 8; v
              } else if ((tfFlags & 0x20000) != 0) {
                // default-base-is-moof: offsets are relative to the
                // moof box's FIRST byte (its header may be the 8-byte
                // or 16-byte largesize form — use the recorded start)
                moof.at.toLong
              } else throw new IllegalArgumentException(
                "Mp4Codec: tfhd has neither base-data-offset nor " +
                  "default-base-is-moof — previous-traf-relative " +
                  "addressing out of scope")
            if ((tfFlags & 0x02) != 0) p += 4 // sample_description_index
            if ((tfFlags & 0x08) != 0) p += 4 // default_sample_duration
            val tfhdDefaultSize: Option[Long] =
              if ((tfFlags & 0x10) != 0) {
                require(p + 4 <= tfhd.payloadEnd,
                  "Mp4Codec: tfhd truncates default-sample-size")
                val v = u32(p); p += 4; Some(v)
              } else None

            // truns in order; the first must carry a data offset, later
            // ones continue contiguously when they omit it
            var nextOff: Long = -1L
            boxes(traf.payloadAt, traf.payloadEnd).filter(_.tpe == "trun")
              .zipWithIndex.foreach { case (trun, ti) =>
                requireHeader(trun, 8)
                val trFlags = u32(trun.payloadAt) & 0xffffff
                val n = u32(trun.payloadAt + 4)
                totalSamples += n
                require(totalSamples <= (1 << 20),
                  s"Mp4Codec: fragments push the track past 2^20 samples " +
                    s"($totalSamples)")
                var q = trun.payloadAt + 8
                if ((trFlags & 0x01) != 0) {
                  require(q + 4 <= trun.payloadEnd,
                    "Mp4Codec: trun truncates data-offset")
                  // data_offset is SIGNED (ISO 14496-12 §8.8.8)
                  nextOff = baseDataOffset + u32(q).toInt
                  q += 4
                } else require(ti > 0 && nextOff >= 0,
                  "Mp4Codec: first trun of a traf carries no data-offset")
                if ((trFlags & 0x04) != 0) q += 4 // first_sample_flags
                val perSample = Seq(0x100, 0x200, 0x400, 0x800)
                  .count(f => (trFlags & f) != 0) * 4
                if (perSample > 0) requireFits(trun, n, perSample, q - trun.payloadAt)
                var k = 0L
                while (k < n) {
                  var f = q
                  if ((trFlags & 0x100) != 0) f += 4 // duration
                  val sz: Long =
                    if ((trFlags & 0x200) != 0) u32(f)
                    else tfhdDefaultSize.orElse(trexDefaultSize).getOrElse(
                      throw new IllegalArgumentException(
                        "Mp4Codec: trun omits sample sizes and neither tfhd " +
                          "nor trex declares a default"))
                  slice(nextOff, sz, s"fragment sample $k")
                  nextOff += sz
                  q += perSample
                  k += 1
                }
              }
          }
        }
      }
    }
    val frames = out.result()
    require(frames.nonEmpty, "Mp4Codec: no samples for the video track")
    frames
  }

  // ── writer (fixture generator for the container-invariance gate) ───

  /** Write a conforming minimal progressive-download MP4: `ftyp`
    * (isom), `mdat` carrying the frame payloads, and a `moov` with one
    * `vide` track whose `stbl` uses a `jpeg` VisualSampleEntry and the
    * full stts/stsc/stsz/stco table set (one chunk per frame — the
    * layout simple muxers emit), so standard demuxers open it.
    *
    * With `framesPerFragment > 0` the file is FRAGMENTED (round 17 —
    * the CMAF/DASH shape): the `moov` carries an EMPTY `stbl` plus
    * `mvex`/`trex`, and the frames ride `moof`+`mdat` pairs — each
    * `moof` holding one `traf` with a default-base-is-moof `tfhd` and
    * one per-sample-size `trun` whose data offset points into the
    * fragment's own `mdat`. */
  def encode(frames: Seq[Array[Byte]], width: Int, height: Int,
             fps: Int = 25, framesPerFragment: Int = 0): Array[Byte] = {
    require(frames.nonEmpty, "Mp4Codec.encode: no frames")
    require(width > 0 && height > 0 && fps > 0,
      s"Mp4Codec.encode: invalid ${width}x$height @ $fps")
    require(framesPerFragment >= 0, "Mp4Codec.encode: negative framesPerFragment")
    val fragmented = framesPerFragment > 0
    def bytesOf(f: ByteArrayOutputStream => Unit): Array[Byte] = {
      val b = new ByteArrayOutputStream(); f(b); b.toByteArray
    }
    def be16(b: ByteArrayOutputStream, v: Int): Unit = {
      b.write((v >> 8) & 0xff); b.write(v & 0xff)
    }
    def be32(b: ByteArrayOutputStream, v: Long): Unit = {
      b.write(((v >> 24) & 0xff).toInt); b.write(((v >> 16) & 0xff).toInt)
      b.write(((v >> 8) & 0xff).toInt); b.write((v & 0xff).toInt)
    }
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = bytesOf { b =>
      be32(b, 8L + payload.length)
      b.write(tpe.getBytes("US-ASCII"))
      b.write(payload, 0, payload.length)
    }
    def fullBox(tpe: String, payload: Array[Byte]): Array[Byte] =
      box(tpe, bytesOf { b => be32(b, 0); b.write(payload, 0, payload.length) })

    val ftyp = box("ftyp", bytesOf { b =>
      b.write("isom".getBytes("US-ASCII")); be32(b, 0x200)
      b.write("isom".getBytes("US-ASCII"))
      b.write((if (fragmented) "iso5" else "iso2").getBytes("US-ASCII"))
    })
    val mdatPayload = bytesOf { b => frames.foreach(f => b.write(f, 0, f.length)) }
    val mdat = box("mdat", mdatPayload)
    // absolute frame offsets: ftyp + mdat header precede the payloads
    val frameOffsets = {
      var off = ftyp.length.toLong + 8
      frames.map { f => val o = off; off += f.length; o }
    }
    val duration = frames.length.toLong // timescale = fps → 1 tick/frame

    val mvhd = fullBox("mvhd", bytesOf { b =>
      be32(b, 0); be32(b, 0) // creation, modification
      be32(b, fps.toLong); be32(b, duration)
      be32(b, 0x00010000L); be16(b, 0x0100); be16(b, 0) // rate, volume, reserved
      be32(b, 0); be32(b, 0)
      Seq(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L)
        .foreach(be32(b, _)) // identity matrix
      (0 until 6).foreach(_ => be32(b, 0)) // pre_defined
      be32(b, 2) // next track id
    })
    val tkhd = box("tkhd", bytesOf { b =>
      be32(b, 7) // version 0, flags: enabled | in movie | in preview
      be32(b, 0); be32(b, 0); be32(b, 1); be32(b, 0) // times, track 1, reserved
      be32(b, duration)
      be32(b, 0); be32(b, 0) // reserved
      be16(b, 0); be16(b, 0); be16(b, 0); be16(b, 0) // layer, group, volume, reserved
      Seq(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L)
        .foreach(be32(b, _))
      be32(b, width.toLong << 16); be32(b, height.toLong << 16)
    })
    val mdhd = fullBox("mdhd", bytesOf { b =>
      be32(b, 0); be32(b, 0); be32(b, fps.toLong); be32(b, duration)
      be16(b, 0x55c4); be16(b, 0) // language 'und', pre_defined
    })
    val hdlr = fullBox("hdlr", bytesOf { b =>
      be32(b, 0) // pre_defined
      b.write("vide".getBytes("US-ASCII"))
      (0 until 3).foreach(_ => be32(b, 0))
      b.write("GraftVideo".getBytes("US-ASCII")); b.write(0) // name, NUL
    })
    val vmhd = box("vmhd", bytesOf { b =>
      be32(b, 1) // version 0, flags 1 (spec requirement)
      be16(b, 0); (0 until 3).foreach(_ => be16(b, 0)) // graphicsmode, opcolor
    })
    val dinf = box("dinf", fullBox("dref", bytesOf { b =>
      be32(b, 1) // one entry
      be32(b, 12); b.write("url ".getBytes("US-ASCII")); be32(b, 1) // self-contained
    }))
    val sampleEntry = bytesOf { b =>
      be32(b, 86L) // VisualSampleEntry size for 'jpeg' with no extensions
      b.write("jpeg".getBytes("US-ASCII"))
      (0 until 6).foreach(_ => b.write(0)) // reserved
      be16(b, 1) // data_reference_index
      be16(b, 0); be16(b, 0) // pre_defined, reserved
      (0 until 3).foreach(_ => be32(b, 0)) // pre_defined
      be16(b, width); be16(b, height)
      be32(b, 0x00480000L); be32(b, 0x00480000L) // 72 dpi
      be32(b, 0); be16(b, 1) // reserved, frame_count
      (0 until 32).foreach(_ => b.write(0)) // compressorname
      be16(b, 24); be16(b, 0xffff) // depth, pre_defined -1
    }
    val stsd = fullBox("stsd", bytesOf { b =>
      be32(b, 1); b.write(sampleEntry, 0, sampleEntry.length)
    })
    // fragmented: the stbl declares NO samples — they live in the moofs
    val stts =
      if (fragmented) fullBox("stts", bytesOf(be32(_, 0)))
      else fullBox("stts", bytesOf { b =>
        be32(b, 1); be32(b, frames.length.toLong); be32(b, 1)
      })
    val stsc =
      if (fragmented) fullBox("stsc", bytesOf(be32(_, 0)))
      else fullBox("stsc", bytesOf { b =>
        be32(b, 1); be32(b, 1); be32(b, 1); be32(b, 1) // all chunks: 1 sample
      })
    val stsz =
      if (fragmented) fullBox("stsz", bytesOf { b => be32(b, 0); be32(b, 0) })
      else fullBox("stsz", bytesOf { b =>
        be32(b, 0); be32(b, frames.length.toLong)
        frames.foreach(f => be32(b, f.length.toLong))
      })
    val stco =
      if (fragmented) fullBox("stco", bytesOf(be32(_, 0)))
      else fullBox("stco", bytesOf { b =>
        be32(b, frames.length.toLong)
        frameOffsets.foreach(be32(b, _))
      })
    val stbl = box("stbl", bytesOf { b =>
      Seq(stsd, stts, stsc, stsz, stco).foreach(x => b.write(x, 0, x.length))
    })
    val minf = box("minf", bytesOf { b =>
      Seq(vmhd, dinf, stbl).foreach(x => b.write(x, 0, x.length))
    })
    val mdia = box("mdia", bytesOf { b =>
      Seq(mdhd, hdlr, minf).foreach(x => b.write(x, 0, x.length))
    })
    val trak = box("trak", bytesOf { b =>
      Seq(tkhd, mdia).foreach(x => b.write(x, 0, x.length))
    })
    // mvex/trex: fragment defaults (track 1; size/duration defaulted 0 —
    // every trun carries explicit per-sample sizes)
    val mvex = box("mvex", fullBox("trex", bytesOf { b =>
      be32(b, 1) // track_ID
      be32(b, 1) // default_sample_description_index
      be32(b, 0); be32(b, 0); be32(b, 0) // duration, size, flags
    }))
    val moov = box("moov", bytesOf { b =>
      Seq(mvhd, trak).foreach(x => b.write(x, 0, x.length))
      if (fragmented) b.write(mvex, 0, mvex.length)
    })
    if (!fragmented)
      bytesOf { b =>
        Seq(ftyp, mdat, moov).foreach(x => b.write(x, 0, x.length))
      }
    else bytesOf { b =>
      b.write(ftyp, 0, ftyp.length)
      b.write(moov, 0, moov.length)
      frames.grouped(framesPerFragment).zipWithIndex.foreach { case (grp, seq) =>
        // moof = mfhd(16) + traf(8 + tfhd(16) + trun(20 + 4n)); the
        // trun data offset is moof-relative (default-base-is-moof) and
        // points past the fragment's own mdat header
        val n = grp.length
        val moofSize = 8 + 16 + (8 + 16 + (20 + 4 * n))
        val mfhd = fullBox("mfhd", bytesOf(be32(_, seq + 1L)))
        val tfhd = box("tfhd", bytesOf { b2 =>
          be32(b2, 0x020000L) // version 0, flags: default-base-is-moof
          be32(b2, 1) // track_ID
        })
        val trun = box("trun", bytesOf { b2 =>
          be32(b2, 0x000201L) // version 0, flags: data-offset + sample-size
          be32(b2, n.toLong)
          be32(b2, moofSize + 8L) // into this fragment's mdat payload
          grp.foreach(f => be32(b2, f.length.toLong))
        })
        val traf = box("traf", bytesOf { b2 =>
          b2.write(tfhd, 0, tfhd.length); b2.write(trun, 0, trun.length)
        })
        val moof = box("moof", bytesOf { b2 =>
          b2.write(mfhd, 0, mfhd.length); b2.write(traf, 0, traf.length)
        })
        require(moof.length == moofSize,
          s"Mp4Codec.encode: moof ${moof.length} != computed $moofSize")
        val fmdat = box("mdat", bytesOf { b2 =>
          grp.foreach(f => b2.write(f, 0, f.length))
        })
        b.write(moof, 0, moof.length)
        b.write(fmdat, 0, fmdat.length)
      }
    }
  }
}
