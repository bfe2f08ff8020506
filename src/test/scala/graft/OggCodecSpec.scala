package graft

import graft.multimodal.{BinaryPipeline, OggCodec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** OggCodec: a HAND-BUILT page fixture with an INDEPENDENT bitwise
  * CRC implementation (so an encoder-consistent table typo cannot
  * hide), encode→decodeMeta round trips across the three mappings,
  * packet spanning across pages, and the fail-loud contract (CRC
  * corruption, sequence holes, missing EOS, grouped streams, unknown
  * mappings, by-name audio-decode rejection). */
class OggCodecSpec extends AnyFunSuite with SparkSpec {

  /** Independent Ogg CRC-32: bit-at-a-time, poly 0x04c11db7, init 0,
    * no reflection, no final xor — no table shared with the codec. */
  private def crcRef(b: Array[Byte]): Int = {
    var c = 0
    b.foreach { x =>
      c ^= (x & 0xff) << 24
      (0 until 8).foreach { _ =>
        c = if ((c & 0x80000000) != 0) (c << 1) ^ 0x04c11db7 else c << 1
      }
    }
    c
  }

  /** Test-side page writer (independent of OggCodec's). */
  private def page(headerType: Int, granule: Long, serial: Int, seq: Int,
                   lacing: Seq[Int], payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w32(v: Int): Unit = { w8(v); w8(v >> 8); w8(v >> 16); w8(v >> 24) }
    out.write("OggS".getBytes("ISO-8859-1"))
    w8(0); w8(headerType)
    (0 until 8).foreach(k => w8((granule >> (8 * k)).toInt))
    w32(serial); w32(seq); w32(0)
    w8(lacing.length); lacing.foreach(w8)
    out.write(payload, 0, payload.length)
    val bytes = out.toByteArray
    val c = crcRef(bytes)
    bytes(22) = (c & 0xff).toByte; bytes(23) = ((c >> 8) & 0xff).toByte
    bytes(24) = ((c >> 16) & 0xff).toByte; bytes(25) = ((c >> 24) & 0xff).toByte
    bytes
  }

  private def le32(v: Int): Array[Byte] =
    Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

  /** Minimal hand-built Vorbis stream: id page, comment page (packet
    * SPANNING two pages via the continued flag), one EOS audio page. */
  private def handVorbis(rate: Int, channels: Int, samples: Long): Array[Byte] = {
    val id = Array[Byte](1) ++ "vorbis".getBytes("ISO-8859-1") ++
      le32(0) ++ Array[Byte](channels.toByte) ++ le32(rate) ++
      le32(0) ++ le32(128000) ++ le32(0) ++ Array[Byte](0x88.toByte, 0x01)
    val c1 = "TITLE=HandT".getBytes("UTF-8")
    val c2 = "ARTIST=HandA".getBytes("UTF-8")
    val setup = Array[Byte](5) ++ "vorbis".getBytes("ISO-8859-1") ++
      Array.fill[Byte](3)(0x55)
    // a 300+-byte vendor string makes the comment packet exceed one
    // 255-lacing segment, so it SPANS pages naturally (the first page
    // carries exactly 255 bytes and sets no terminator; the next page's
    // continued flag carries the rest)
    val bigVendor = ("hand" + "x" * 300).getBytes("UTF-8")
    val cmtBig = Array[Byte](3) ++ "vorbis".getBytes("ISO-8859-1") ++
      le32(bigVendor.length) ++ bigVendor ++ le32(2) ++
      le32(c1.length) ++ c1 ++ le32(c2.length) ++ c2 ++ Array[Byte](1)
    val part1 = cmtBig.take(255)
    val part2 = cmtBig.drop(255)
    val out = new java.io.ByteArrayOutputStream()
    out.write(page(0x02, 0, 7, 0, Seq(id.length), id))
    // comment packet starts here, lacing 255 = continues on next page
    out.write(page(0x00, 0, 7, 1, Seq(255), part1))
    // continued page carries the rest + the setup packet
    out.write(page(0x01, 0, 7, 2, Seq(part2.length, setup.length),
      part2 ++ setup))
    out.write(page(0x04, samples, 7, 3, Seq(4), Array[Byte](9, 9, 9, 9)))
    out.toByteArray
  }

  test("hand-built vorbis stream: independent CRC, spanning comment packet") {
    val wire = handVorbis(44100, 2, 44100 * 3)
    val m = OggCodec.decodeMeta(wire)
    assert(m.codec == "vorbis" && m.sampleRate == 44100 && m.channels == 2)
    assert(m.durationMs == 3000 && m.pageCount == 4)
    assert(m.title.contains("HandT") && m.artist.contains("HandA") &&
      m.album.isEmpty)
  }

  test("encode→decodeMeta round trips across mappings/rates/channels/pages") {
    for {
      codec <- Seq("vorbis", "opus", "flac")
      rate <- Seq(44100, 48000, 22050)
      channels <- Seq(1, 2)
      pages <- Seq(1, 3, 6)
    } {
      val samples = 9600L + rate % 7 * 480
      val wire = OggCodec.encode(codec, rate, channels, samples, pages,
        "T1", "A2", "Al3", payloadSeed = rate + pages)
      val m = OggCodec.decodeMeta(wire)
      assert(m.codec == codec && m.sampleRate == rate && m.channels == channels,
        s"$codec $rate $channels")
      val wantMs =
        if (codec == "opus") samples * 1000 / 48000 else samples * 1000 / rate
      assert(m.durationMs == wantMs, s"$codec duration")
      assert(m.pageCount == 2 + pages)
      assert(m.title.contains("T1") && m.artist.contains("A2") &&
        m.album.contains("Al3"))
    }
  }

  test("fail-loud: CRC, sequence hole, EOS, grouped BOS, mapping, decode") {
    val good = OggCodec.encode("vorbis", 44100, 2, 9600, 2, "T", "A", "B")
    // flip one payload byte: the page CRC must catch it
    val bad = good.clone()
    bad(bad.length - 1) = (bad(bad.length - 1) ^ 0x01).toByte
    assert(intercept[IllegalArgumentException](OggCodec.decodeMeta(bad))
      .getMessage.contains("CRC"))
    // drop the last page: missing EOS
    val lastPageAt = {
      // find the final OggS capture
      val s = new String(good, "ISO-8859-1")
      s.lastIndexOf("OggS")
    }
    assert(intercept[IllegalArgumentException](OggCodec.decodeMeta(
      java.util.Arrays.copyOf(good, lastPageAt))).getMessage.contains("EOS"))
    // a second BOS page = grouped/chained stream
    val firstPageLen = {
      val s = new String(good, "ISO-8859-1")
      s.indexOf("OggS", 4)
    }
    val doubled = java.util.Arrays.copyOf(good, firstPageLen) ++ good
    val eg = intercept[IllegalArgumentException](OggCodec.decodeMeta(doubled))
    assert(eg.getMessage.contains("grouped") || eg.getMessage.contains("sequence"),
      eg.getMessage)
    // unknown mapping: corrupt the id packet magic (and refresh the CRC
    // via the test-side page writer)
    val idPacket = Array[Byte](9) ++ "xxxxxx".getBytes("ISO-8859-1") ++
      Array.fill[Byte](23)(0)
    val unknown = page(0x02, 0, 7, 0, Seq(idPacket.length), idPacket) ++
      page(0x04, 100, 7, 1, Seq(1), Array[Byte](0))
    assert(intercept[IllegalArgumentException](OggCodec.decodeMeta(unknown))
      .getMessage.contains("mapping"))
    // audio decode rejects by name
    assert(intercept[IllegalArgumentException](OggCodec.decode(good))
      .getMessage.contains("MDCT"))
  }

  test("synthesizeOggs → decodeOggMeta matches the formula recompute") {
    val docs = spark.range(0, 24).toDF("doc_id")
    val got = BinaryPipeline.decodeOggMeta(BinaryPipeline.synthesizeOggs(docs))
      .orderBy(col("doc_id")).collect()
    got.foreach { r =>
      val id = r.getLong(0)
      val codec = Seq("vorbis", "opus", "flac")((id % 3).toInt)
      val rate = Seq(44100, 48000, 32000, 22050)((id % 4).toInt)
      val samples = 9600 + (id % 7) * 480
      assert(r.getString(1) == codec && r.getLong(2) == rate)
      assert(r.getLong(3) == 1 + id % 2)
      val wantMs = if (codec == "opus") samples * 1000 / 48000
                   else samples * 1000 / rate
      assert(r.getLong(4) == wantMs && r.getLong(5) == 4 + id % 5)
      assert(r.getString(6) == s"OggTitle${id % 7}")
      assert(r.getString(7) == s"OggArtist${id % 5}")
      assert(r.getString(8) == s"OggAlbum${id % 3}")
    }
  }
}
