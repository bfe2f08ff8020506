package graft

import graft.pipeline.{ArchiveCodec, ArchivePipeline}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ArchiveCodec: hand-built TAR header (checksum computed by the
  * test), ZIP round trips with stored/deflate mixes and EOCD comments,
  * CRC/checksum tamper detection, and the fail-loud contract. */
class ArchiveSpec extends AnyFunSuite with SparkSpec {

  test("ZIP: round trips, stored+deflate mix, comment leg, order") {
    val entries = (0 until 5).map(i =>
      s"dir/file$i.txt" -> s"content $i ${"x" * (i * 40)}".getBytes("UTF-8"))
    for (comment <- Seq("", "a trailing comment")) {
      val wire = ArchiveCodec.zipEncode(entries, deflate = _ % 2 == 1,
        comment = comment)
      val got = ArchiveCodec.zipEntries(wire)
      assert(got.length == 5)
      got.zip(entries).zipWithIndex.foreach { case ((g, (n, d)), i) =>
        assert(g.name == n && g.size == d.length)
        assert(g.data.toSeq == d.toSeq)
        assert(g.method == (if (i % 2 == 1) "deflate" else "stored"))
      }
    }
  }

  test("ZIP fail-loud: CRC tamper, encryption flag, bad method, ZIP64") {
    val wire = ArchiveCodec.zipEncode(Seq("a.txt" -> "hello zip".getBytes))
    // flip a STORED data byte: the central directory CRC must catch it
    val s = new String(wire, "ISO-8859-1")
    val at = s.indexOf("hello zip")
    val tampered = wire.clone(); tampered(at) = 'J'
    assert(intercept[IllegalArgumentException](ArchiveCodec.zipEntries(tampered))
      .getMessage.contains("CRC mismatch"))
    // set the encryption bit in the central directory entry
    val cdAt = s.indexOf("PK" + 1.toChar + 2.toChar)
    val enc = wire.clone(); enc(cdAt + 8) = 1
    assert(intercept[IllegalArgumentException](ArchiveCodec.zipEntries(enc))
      .getMessage.contains("encrypted"))
    // unsupported method (12 = bzip2)
    val m = wire.clone(); m(cdAt + 10) = 12
    assert(intercept[IllegalArgumentException](ArchiveCodec.zipEntries(m))
      .getMessage.contains("method 12"))
    // no EOCD
    assert(intercept[IllegalArgumentException](ArchiveCodec.zipEntries(
      java.util.Arrays.copyOf(wire, wire.length - 8)))
      .getMessage.contains("end-of-central-directory"))
  }

  test("ZIP64: sentinel EOCD + 0x0001 extras round trip; boundary rejects") {
    val entries = (0 until 3).map(i => s"big/part$i.bin" ->
      Array.tabulate[Byte](200 + i * 53)(k => ((i * 17 + k * 11) % 256).toByte))
    val wire = ArchiveCodec.zipEncode64(entries)
    val s = new String(wire, "ISO-8859-1")
    assert(s.contains(("PK" + 6.toChar + 6.toChar)) && s.contains(("PK" + 6.toChar + 7.toChar)),
      "EOCD64 record + locator must be on the wire")
    val got = ArchiveCodec.zipEntries(wire)
    assert(got.map(_.name) == entries.map(_._1))
    got.zip(entries).foreach { case (g, (_, d)) =>
      assert(g.size == d.length && g.data.toSeq == d.toSeq) }
    // EOCD sentinel count WITHOUT an EOCD64 locator rejects loud
    val plain = ArchiveCodec.zipEncode(Seq("a.txt" -> "x".getBytes))
    val eocdAt = new String(plain, "ISO-8859-1").lastIndexOf(("PK" + 5.toChar + 6.toChar))
    val noLoc = plain.clone()
    noLoc(eocdAt + 10) = 0xff.toByte; noLoc(eocdAt + 11) = 0xff.toByte
    assert(intercept[IllegalArgumentException](ArchiveCodec.zipEntries(noLoc))
      .getMessage.contains("locator"))
    // sentinel sizes whose 0x0001 extra field is missing reject loud
    val noExtra = wire.clone()
    val cdAt = new String(noExtra, "ISO-8859-1").indexOf(("PK" + 1.toChar + 2.toChar))
    val nameLen = (noExtra(cdAt + 28) & 0xff) | ((noExtra(cdAt + 29) & 0xff) << 8)
    noExtra(cdAt + 46 + nameLen) = 0x42 // extra header id 0x0001 → 0x0042
    assert(intercept[IllegalArgumentException](ArchiveCodec.zipEntries(noExtra))
      .getMessage.contains("0x0001"))
    // a ~3 GiB DECLARED size rejects by name BEFORE any allocation
    // (an Int-wrapping ~4 GiB would otherwise crash, and 2 GiB would
    // eagerly allocate — the untrusted-corpus DoS vector)
    val capWire = ArchiveCodec.zipEncode(Seq("big.bin" -> "data".getBytes))
    val c2 = new String(capWire, "ISO-8859-1").indexOf(("PK" + 1.toChar + 2.toChar))
    val capped = capWire.clone()
    capped(c2 + 24) = 0; capped(c2 + 25) = 0
    capped(c2 + 26) = 0; capped(c2 + 27) = 0xc0.toByte
    assert(intercept[IllegalArgumentException](ArchiveCodec.zipEntries(capped))
      .getMessage.contains("entry cap"))
    // a zero-entry EOCD rejects loud (no silent empty result)
    val zero = plain.clone()
    zero(eocdAt + 10) = 0; zero(eocdAt + 11) = 0
    assert(intercept[IllegalArgumentException](ArchiveCodec.zipEntries(zero))
      .getMessage.contains("no entries"))
  }

  test("TAR: hand-built header with test-side checksum; round trips; tamper") {
    // hand header: name "f.txt", size 5, mode/uid/gid/mtime zeroed
    val hdr = new Array[Byte](512)
    "f.txt".getBytes.copyToArray(hdr, 0)
    "0000644".getBytes.copyToArray(hdr, 100)
    "0000000".getBytes.copyToArray(hdr, 108)
    "0000000".getBytes.copyToArray(hdr, 116)
    "00000000005".getBytes.copyToArray(hdr, 124)
    "00000000000".getBytes.copyToArray(hdr, 136)
    hdr(156) = '0'
    "ustar".getBytes.copyToArray(hdr, 257)
    hdr(263) = '0'; hdr(264) = '0'
    java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
    var sum = 0L; hdr.foreach(b => sum += (b & 0xff))
    val oct = java.lang.Long.toOctalString(sum)
    (("0" * (6 - oct.length)) + oct).getBytes.copyToArray(hdr, 148)
    hdr(154) = 0; hdr(155) = ' '
    val out = new java.io.ByteArrayOutputStream()
    out.write(hdr, 0, 512)
    out.write("hello".getBytes, 0, 5)
    out.write(new Array[Byte](512 - 5), 0, 512 - 5)
    out.write(new Array[Byte](1024), 0, 1024)
    val got = ArchiveCodec.tarEntries(out.toByteArray)
    assert(got.length == 1 && got.head.name == "f.txt" &&
      new String(got.head.data) == "hello")
    // writer round trip incl. a directory-entry-free multi-file shape
    val entries = (0 until 4).map(i => s"d/p$i.bin" ->
      Array.tabulate[Byte](100 + i * 37)(k => ((i * 31 + k * 7) % 256).toByte))
    val wire = ArchiveCodec.tarEncode(entries)
    val back = ArchiveCodec.tarEntries(wire)
    assert(back.map(_.name) == entries.map(_._1))
    back.zip(entries).foreach { case (g, (_, d)) =>
      assert(g.data.toSeq == d.toSeq) }
    // header tamper: flip a name byte AFTER checksum stamping
    val bad = wire.clone(); bad(0) = 'X'
    assert(intercept[IllegalArgumentException](ArchiveCodec.tarEntries(bad))
      .getMessage.contains("checksum mismatch"))
  }

  test(".tar.gz: gzip-wrapped tar round trips through the strict gunzip") {
    val entries = Seq("a/x.txt" -> "tar gz content".getBytes("UTF-8"),
      "a/y.txt" -> Array.tabulate[Byte](700)(i => (i % 251).toByte))
    val tar = ArchiveCodec.tarEncode(entries)
    val bo = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bo)
    g.write(tar); g.close()
    val docs = spark.createDataFrame(Seq((7L, "ignored")))
      .toDF("doc_id", "text")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(7L, bo.toByteArray))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType))))
    val got = ArchivePipeline.extractArchives(df)
      .orderBy(org.apache.spark.sql.functions.col("entry_idx")).collect()
    assert(got.length == 2 && got(0).getString(2) == "a/x.txt")
    assert(got(1).getLong(3) == 700)
    assert(docs.count() == 1)
  }

  test("synthesizeArchives → extractArchives matches substr slices") {
    val docs = spark.createDataFrame(Seq(
      (0L, "z" * 250), (1L, "abc"), (2L, ""), (3L, "q" * 150)))
      .toDF("doc_id", "text")
    val got = ArchivePipeline.extractArchives(
        ArchivePipeline.synthesizeArchives(docs))
      .orderBy(col("doc_id"), col("entry_idx")).collect()
    val texts = Map(0L -> "z" * 250, 1L -> "abc", 2L -> "", 3L -> "q" * 150)
    var n = 0
    (0L to 3L).foreach { id =>
      val parts = (1 + id % 3).toInt
      (0 until parts).foreach { k =>
        val r = got(n); n += 1
        val slice = texts(id).drop(k * 100).take(100)
        assert(r.getLong(0) == id && r.getLong(1) == k)
        assert(r.getString(2) == s"doc$id/part$k.txt")
        assert(r.getLong(3) == slice.getBytes("UTF-8").length)
        assert(r.getString(4) ==
          org.apache.commons.codec.digest.DigestUtils.md5Hex(
            slice.getBytes("UTF-8")))
      }
    }
    assert(n == got.length)
  }
}
