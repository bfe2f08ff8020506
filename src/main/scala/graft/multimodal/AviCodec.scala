package graft.multimodal

import java.io.ByteArrayOutputStream

/** A minimal real AVI container codec (the public RIFF/AVI structure —
  * the same RIFF grammar [[WavCodec]] parses, with nested LISTs): the
  * standard wrapper real MJPEG corpora actually arrive in, one step up
  * from the bare concatenated-JPEG stream [[JpegCodec.frameOffsets]]
  * splits. Only the CONTAINER is in scope here — frame payloads are
  * handed to [[JpegCodec]] untouched.
  *
  * Scope (fail-loud beyond it, never silent garbage):
  *  - `RIFF <size> AVI ` with a `LIST movi` somewhere at top level;
  *    video frames are the `00dc`/`00db` chunks of stream 0 (and inside
  *    `LIST rec ` interleave groups), each payload a complete JPEG
  *  - other chunks (`avih`/`strl` headers, audio `01wb`, `idx1`, JUNK)
  *    skip by their declared sizes with RIFF word alignment
  *  - a movi list with no video chunks, truncation, and non-JPEG frame
  *    payloads (caught downstream by JpegCodec) fail loud
  */
object AviCodec {

  /** True iff `content` starts with the 12-byte RIFF/AVI preamble. */
  def isAvi(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

  /** Video-frame payloads (stream 0, `00dc`/`00db`) in stream order. */
  def videoFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    require(isAvi(bytes), "AviCodec: not an AVI (missing RIFF/AVI preamble)")
    def u8(i: Int): Int = {
      require(i < bytes.length, "AviCodec: truncated file")
      bytes(i) & 0xff
    }
    def le32(i: Int): Long =
      (u8(i) & 0xffL) | ((u8(i + 1) & 0xffL) << 8) |
        ((u8(i + 2) & 0xffL) << 16) | ((u8(i + 3) & 0xffL) << 24)
    def fourcc(i: Int): String = new String(bytes, i, 4, "US-ASCII")
    val riffEnd = {
      val sz = le32(4)
      require(sz + 8 <= bytes.length,
        s"AviCodec: RIFF declares ${sz + 8} bytes, file has ${bytes.length}")
      (sz + 8).toInt
    }
    val out = scala.collection.mutable.Buffer.empty[Array[Byte]]
    /** Walk chunks in [from, to): collect video frames, recurse into
      * movi/rec lists (depth-capped — a crafted 12-bytes-per-level
      * nesting tower would otherwise blow the task stack with an Error
      * instead of the contract's loud IllegalArgumentException), skip
      * everything else. */
    def walk(from: Int, to: Int, inMovi: Boolean, depth: Int): Unit = {
      require(depth <= 8, "AviCodec: LIST nesting exceeds depth 8 (malformed file)")
      var pos = from
      while (pos + 8 <= to) {
        val cid = fourcc(pos)
        val clen = le32(pos + 4)
        require(clen <= Int.MaxValue - 8 && pos + 8 + clen <= to,
          s"AviCodec: chunk '$cid' at $pos declares $clen bytes past its parent")
        val dataOff = pos + 8
        if (cid == "LIST") {
          require(clen >= 4,
            s"AviCodec: LIST chunk at $pos declares $clen bytes (no room for its type)")
          val ltype = fourcc(dataOff)
          if (ltype == "movi" || (inMovi && ltype == "rec "))
            walk(dataOff + 4, dataOff + clen.toInt, inMovi = true, depth + 1)
          // other LISTs (hdrl, INFO…): headers, skipped whole
        } else if (inMovi && (cid == "00dc" || cid == "00db")) {
          out += java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + clen.toInt)
        }
        // chunks are word-aligned: odd sizes carry one pad byte
        pos = dataOff + clen.toInt + (clen.toInt & 1)
      }
      // 2-7 residue bytes here are a truncated final chunk header — the
      // loop exits silently on pos + 8 > to, so reject the leftovers
      // loud. Two legal misalignments are tolerated: pos may overshoot
      // `to` by one byte (an odd final chunk whose pad the parent size
      // excludes), and one residue byte may remain (a parent size
      // word-aligned up past its last chunk).
      require(pos >= to || to - pos == 1,
        s"AviCodec: ${to - pos} residue byte(s) at $pos inside parent ending $to " +
          "(truncated chunk header)")
    }
    walk(12, riffEnd, inMovi = false, depth = 0)
    require(out.nonEmpty, "AviCodec: no stream-0 video chunks in any movi list")
    out.toSeq
  }

  /** AVI ENCODE for fixtures and in-engine synthesis: a conforming
    * minimal file — `avih` main header, one `strl` video stream (`MJPG`
    * fourcc, BITMAPINFOHEADER), a `movi` list of `00dc` chunks (word
    * aligned) and an `idx1` index, so standard players open it. */
  def encode(frames: Seq[Array[Byte]], width: Int, height: Int,
             fps: Int = 25): Array[Byte] = {
    require(frames.nonEmpty, "AviCodec.encode: no frames")
    require(width > 0 && height > 0 && fps > 0,
      s"AviCodec.encode: invalid ${width}x$height @ $fps")
    val out = new ByteArrayOutputStream(frames.map(_.length + 16).sum + 512)
    def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    def bytesOf(f: ByteArrayOutputStream => Unit): Array[Byte] = {
      val b = new ByteArrayOutputStream(); f(b); b.toByteArray
    }
    def bLe32(b: ByteArrayOutputStream, v: Int): Unit = {
      b.write(v & 0xff); b.write((v >> 8) & 0xff)
      b.write((v >> 16) & 0xff); b.write((v >>> 24) & 0xff)
    }
    val maxFrame = frames.map(_.length).max
    val avih = bytesOf { b =>
      bLe32(b, 1000000 / fps); bLe32(b, maxFrame * fps); bLe32(b, 0)
      bLe32(b, 0x10) // AVIF_HASINDEX
      bLe32(b, frames.length); bLe32(b, 0); bLe32(b, 1); bLe32(b, 0)
      bLe32(b, width); bLe32(b, height)
      (0 until 4).foreach(_ => bLe32(b, 0)) // reserved
    }
    val strh = bytesOf { b =>
      b.write("vids".getBytes("US-ASCII")); b.write("MJPG".getBytes("US-ASCII"))
      bLe32(b, 0); bLe32(b, 0) // flags, prio+lang
      bLe32(b, 0)              // initial frames
      bLe32(b, 1); bLe32(b, fps) // scale / rate
      bLe32(b, 0); bLe32(b, frames.length)
      bLe32(b, maxFrame); bLe32(b, -1) // suggested buffer, quality
      bLe32(b, 0)              // sample size
      bLe32(b, 0); bLe32(b, (height << 16) | width) // rcFrame
    }
    val strf = bytesOf { b =>
      bLe32(b, 40); bLe32(b, width); bLe32(b, height)
      b.write(1); b.write(0); b.write(24); b.write(0) // planes 1, 24 bpp
      b.write("MJPG".getBytes("US-ASCII"))
      bLe32(b, width * height * 3)
      (0 until 4).foreach(_ => bLe32(b, 0))
    }
    def list(ltype: String, body: Array[Byte]): Array[Byte] = bytesOf { b =>
      b.write("LIST".getBytes("US-ASCII")); bLe32(b, body.length + 4)
      b.write(ltype.getBytes("US-ASCII")); b.write(body, 0, body.length)
    }
    val strl = list("strl", bytesOf { b =>
      b.write("strh".getBytes("US-ASCII")); bLe32(b, strh.length); b.write(strh, 0, strh.length)
      b.write("strf".getBytes("US-ASCII")); bLe32(b, strf.length); b.write(strf, 0, strf.length)
    })
    val hdrl = list("hdrl", bytesOf { b =>
      b.write("avih".getBytes("US-ASCII")); bLe32(b, avih.length); b.write(avih, 0, avih.length)
      b.write(strl, 0, strl.length)
    })
    val moviBody = bytesOf { b =>
      frames.foreach { f =>
        b.write("00dc".getBytes("US-ASCII")); bLe32(b, f.length)
        b.write(f, 0, f.length)
        if (f.length % 2 == 1) b.write(0)
      }
    }
    val movi = list("movi", moviBody)
    // idx1: one entry per frame, offsets relative to the movi list's
    // 'movi' fourcc (the standard convention)
    val idx1 = bytesOf { b =>
      var off = 4
      frames.foreach { f =>
        b.write("00dc".getBytes("US-ASCII"))
        bLe32(b, 0x10) // AVIIF_KEYFRAME
        bLe32(b, off); bLe32(b, f.length)
        off += 8 + f.length + (f.length & 1)
      }
    }
    val riffBody = bytesOf { b =>
      b.write("AVI ".getBytes("US-ASCII"))
      b.write(hdrl, 0, hdrl.length)
      b.write(movi, 0, movi.length)
      b.write("idx1".getBytes("US-ASCII")); bLe32(b, idx1.length); b.write(idx1, 0, idx1.length)
    }
    w("RIFF"); le32(riffBody.length); out.write(riffBody, 0, riffBody.length)
    out.toByteArray
  }
}
