package graft.pipeline

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

/** Archive ingest (round 19): ZIP and USTAR TAR walks — the delivery
  * formats document corpora and dataset dumps actually ship in, in
  * front of the per-file decode stages. Both formats carry their own
  * in-band integrity fields and BOTH are verified on every entry: the
  * ZIP central directory's CRC-32 against the inflated data, the TAR
  * header checksum against the header bytes.
  *
  * ZIP scope (APPNOTE layout; fail-loud beyond it):
  *  - end-of-central-directory located by the backward signature scan
  *    (trailing comments tolerated), central-directory entries walked,
  *    each local header re-read and cross-checked
  *  - ZIP64 (round 20, VERDICT r19 #5 — at 100 TB, >4 GiB archives are
  *    routine): the EOCD64 locator + record resolve the 0xFFFF /
  *    0xFFFFFFFF sentinel entry-count and CD offset, and per-entry
  *    0x0001 extra fields resolve sentinel sizes/offsets — a sentinel
  *    WITHOUT its ZIP64 structure rejects loud
  *  - methods 0 (stored) and 8 (deflate); encryption (flag bit 0)
  *    rejects by name; streaming (flag bit 3) entries read via
  *    the central directory's authoritative sizes
  *  - declared entry sizes are bounded by [[MaxEntryBytes]] BEFORE any
  *    allocation — an attacker-controlled central directory can
  *    neither wrap an Int nor eagerly allocate gigabytes
  * TAR scope: USTAR 512-byte headers (name, octal size, typeflag),
  * regular files extracted, directories skipped, checksum verified,
  * two-zero-block terminator or EOF accepted. */
object ArchiveCodec {

  final case class Entry(name: String, size: Long, method: String,
                         data: Array[Byte])

  /** Bound on a single entry's DECLARED uncompressed size, checked in
    * Long math before the allocation: a crafted central directory
    * declaring ~4 GiB would otherwise wrap `.toInt` negative
    * (NegativeArraySizeException instead of the codec's loud contract)
    * and anything under 2 GiB would eagerly allocate before one byte
    * inflates — an unbounded-allocation DoS vector in a codec pitched
    * at untrusted corpus dumps. */
  val MaxEntryBytes: Long = 1L << 30

  def isZip(b: Array[Byte]): Boolean =
    b.length >= 4 && b(0) == 'P' && b(1) == 'K' && b(2) == 3 && b(3) == 4
  def isTar(b: Array[Byte]): Boolean =
    b.length >= 512 && b(257) == 'u' && b(258) == 's' && b(259) == 't' &&
      b(260) == 'a' && b(261) == 'r'

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (le16(b, i) & 0xffffL) | ((le16(b, i + 2) & 0xffffL) << 16)
  private def le64(b: Array[Byte], i: Int): Long =
    le32(b, i) | (le32(b, i + 4) << 32)

  // ---- ZIP ----

  def zipEntries(bytes: Array[Byte]): Seq[Entry] = {
    require(isZip(bytes), "ArchiveCodec: not a ZIP (no PK local header)")
    // EOCD: backward scan for PK\5\6 (a trailing comment shifts it)
    var eocd = -1
    var i = bytes.length - 22
    while (eocd < 0 && i >= 0) {
      if (bytes(i) == 'P' && bytes(i + 1) == 'K' && bytes(i + 2) == 5 &&
        bytes(i + 3) == 6) eocd = i
      else i -= 1
    }
    require(eocd >= 0, "ArchiveCodec: no end-of-central-directory record")
    require(le16(bytes, eocd + 4) == 0 && le16(bytes, eocd + 6) == 0,
      "ArchiveCodec: multi-disk ZIP unsupported")
    var nEntries: Long = le16(bytes, eocd + 10)
    var cdOff: Long = le32(bytes, eocd + 16)
    // ZIP64: the EOCD64 locator sits immediately before the EOCD when
    // present; it resolves the 16/32-bit sentinel fields
    val hasLocator = eocd >= 20 &&
      bytes(eocd - 20) == 'P' && bytes(eocd - 19) == 'K' &&
      bytes(eocd - 18) == 6 && bytes(eocd - 17) == 7
    if (hasLocator) {
      require(le32(bytes, eocd - 16) == 0 && le32(bytes, eocd - 4) == 1,
        "ArchiveCodec: multi-disk ZIP64 unsupported")
      val z64Off = le64(bytes, eocd - 12)
      require(z64Off >= 0 && z64Off + 56 <= eocd - 20,
        s"ArchiveCodec: ZIP64 EOCD record at $z64Off out of bounds")
      val z = z64Off.toInt
      require(bytes(z) == 'P' && bytes(z + 1) == 'K' &&
        bytes(z + 2) == 6 && bytes(z + 3) == 6,
        "ArchiveCodec: ZIP64 EOCD signature missing at the locator target")
      require(le32(bytes, z + 16) == 0 && le32(bytes, z + 20) == 0,
        "ArchiveCodec: multi-disk ZIP64 unsupported")
      nEntries = le64(bytes, z + 32)
      cdOff = le64(bytes, z + 48)
      require(nEntries >= 0 && nEntries <= Int.MaxValue,
        s"ArchiveCodec: ZIP64 entry count $nEntries out of range")
    } else require(nEntries != 0xffff && cdOff != 0xffffffffL,
      "ArchiveCodec: ZIP64 sentinel fields without an EOCD64 locator")
    require(nEntries > 0, "ArchiveCodec: ZIP holds no entries")
    // cdOff is unsigned (32-bit, or 64-bit via ZIP64): bound it in LONG
    // math before the .toInt (a 2^31+ value would index negative)
    require(cdOff >= 0 && cdOff + 46 <= bytes.length,
      s"ArchiveCodec: central directory at $cdOff runs past EOF")
    var at = cdOff.toInt
    (0 until nEntries.toInt).map { k =>
      require(at >= 0 && at + 46 <= bytes.length &&
        bytes(at) == 'P' && bytes(at + 1) == 'K' && bytes(at + 2) == 1 &&
        bytes(at + 3) == 2,
        s"ArchiveCodec: central-directory entry $k signature missing")
      val flags = le16(bytes, at + 8)
      require((flags & 0x0001) == 0,
        s"ArchiveCodec: entry $k is encrypted — unsupported")
      val method = le16(bytes, at + 10)
      val crc = le32(bytes, at + 16)
      var compSize = le32(bytes, at + 20)
      var uncompSize = le32(bytes, at + 24)
      val nameLen = le16(bytes, at + 28)
      val extraLen = le16(bytes, at + 30)
      val commentLen = le16(bytes, at + 32)
      var lhoL = le32(bytes, at + 42)
      val name = new String(bytes, at + 46, nameLen, UTF_8)
      // ZIP64 extra field 0x0001: resolves each 0xFFFFFFFF sentinel, in
      // APPNOTE order (uncomp, comp, local-header offset) — only the
      // sentinel-valued fields are present
      if (compSize == 0xffffffffL || uncompSize == 0xffffffffL ||
          lhoL == 0xffffffffL) {
        var e = at + 46 + nameLen
        val eEnd = e + extraLen
        var found = false
        while (!found && e + 4 <= eEnd) {
          val id = le16(bytes, e)
          val sz = le16(bytes, e + 2)
          require(e + 4 + sz <= eEnd,
            s"ArchiveCodec: entry '$name' extra field $id overruns its block")
          if (id == 1) {
            var f = e + 4
            def take64(what: String): Long = {
              require(f + 8 <= e + 4 + sz,
                s"ArchiveCodec: entry '$name' ZIP64 extra too short for $what")
              val v = le64(bytes, f); f += 8; v
            }
            if (uncompSize == 0xffffffffL) uncompSize = take64("uncompressed size")
            if (compSize == 0xffffffffL) compSize = take64("compressed size")
            if (lhoL == 0xffffffffL) lhoL = take64("local header offset")
            found = true
          } else e += 4 + sz
        }
        require(found,
          s"ArchiveCodec: entry '$name' has ZIP64 sentinel sizes but no " +
            "0x0001 extra field")
      }
      at += 46 + nameLen + extraLen + commentLen
      // DECLARED-size bound in Long math BEFORE any allocation: reject
      // by name rather than wrap an Int or eagerly allocate gigabytes
      require(uncompSize >= 0 && uncompSize <= MaxEntryBytes,
        s"ArchiveCodec: entry '$name' declared size $uncompSize exceeds " +
          s"the $MaxEntryBytes-byte entry cap")
      require(compSize >= 0 && compSize <= bytes.length,
        s"ArchiveCodec: entry '$name' compressed size $compSize exceeds the file")
      // the local header re-read: name must agree, data follows it
      // (unsigned-field bound in LONG math before the .toInt)
      require(lhoL >= 0 && lhoL + 30 <= bytes.length,
        s"ArchiveCodec: entry '$name' local header at $lhoL past EOF")
      val lho = lhoL.toInt
      require(lho + 30 <= bytes.length &&
        bytes(lho) == 'P' && bytes(lho + 1) == 'K' && bytes(lho + 2) == 3 &&
        bytes(lho + 3) == 4,
        s"ArchiveCodec: entry '$name' local header signature missing")
      val lNameLen = le16(bytes, lho + 26)
      val lExtraLen = le16(bytes, lho + 28)
      require(new String(bytes, lho + 30, lNameLen, UTF_8) == name,
        s"ArchiveCodec: entry '$name' name disagrees with its local header")
      val dataAt = lho + 30 + lNameLen + lExtraLen
      require(dataAt + compSize <= bytes.length,
        s"ArchiveCodec: entry '$name' data runs past EOF")
      val comp = java.util.Arrays.copyOfRange(bytes, dataAt,
        dataAt + compSize.toInt)
      val data = method match {
        case 0 =>
          require(compSize == uncompSize,
            s"ArchiveCodec: stored entry '$name' size mismatch")
          comp
        case 8 => inflateRaw(comp, uncompSize.toInt, name)
        case m => throw new IllegalArgumentException(
          s"ArchiveCodec: entry '$name' compression method $m unsupported " +
            "(0 stored, 8 deflate)")
      }
      // the in-band integrity oracle: CRC-32 over the UNCOMPRESSED data
      val c = new java.util.zip.CRC32
      c.update(data)
      require(c.getValue == crc,
        f"ArchiveCodec: entry '$name' CRC mismatch (stored 0x$crc%08x, " +
          f"computed 0x${c.getValue}%08x)")
      Entry(name, uncompSize, if (method == 0) "stored" else "deflate", data)
    }
  }

  private def inflateRaw(comp: Array[Byte], expect: Int,
                         name: String): Array[Byte] = {
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(comp)
      val out = new Array[Byte](expect)
      val probe = new Array[Byte](1)
      var got = 0
      var running = true
      while (running && !inf.finished()) {
        if (got < expect) {
          val n = inf.inflate(out, got, expect - got)
          got += n
          if (n == 0 && !inf.finished()) {
            require(!inf.needsInput,
              s"ArchiveCodec: entry '$name' deflate stream truncated")
            require(!inf.needsDictionary,
              s"ArchiveCodec: entry '$name' wants a preset dictionary — unsupported")
          }
        } else {
          // the declared size is reached (or zero): a 1-byte probe either
          // consumes the stream terminator (empty entries) or exposes
          // output past the declared size
          val n = inf.inflate(probe, 0, 1)
          require(n == 0 && inf.finished(),
            s"ArchiveCodec: entry '$name' inflates past the declared $expect bytes")
          running = false
        }
      }
      require(got == expect && inf.finished(),
        s"ArchiveCodec: entry '$name' inflates to $got of $expect bytes")
      out
    } finally inf.end()
  }

  /** Write a ZIP: entries stored/deflated per `deflate(idx)`. */
  def zipEncode(entries: Seq[(String, Array[Byte])],
                deflate: Int => Boolean = _ % 2 == 1,
                comment: String = ""): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = { w16(v.toInt & 0xffff); w16(((v >> 16) & 0xffff).toInt) }
    val central = new ByteArrayOutputStream()
    def c16(v: Int): Unit = { central.write(v & 0xff); central.write((v >> 8) & 0xff) }
    def c32(v: Long): Unit = { c16(v.toInt & 0xffff); c16(((v >> 16) & 0xffff).toInt) }
    entries.zipWithIndex.foreach { case ((name, data), k) =>
      val nameB = name.getBytes(UTF_8)
      val crc = new java.util.zip.CRC32
      crc.update(data)
      val method = if (deflate(k)) 8 else 0
      val comp =
        if (method == 0) data
        else {
          val d = new java.util.zip.Deflater(
            java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
          try {
            d.setInput(data); d.finish()
            val bo = new ByteArrayOutputStream(data.length / 2 + 32)
            val buf = new Array[Byte](8192)
            while (!d.finished()) bo.write(buf, 0, d.deflate(buf))
            bo.toByteArray
          } finally d.end()
        }
      val lho = out.size()
      out.write('P'); out.write('K'); out.write(3); out.write(4)
      w16(20); w16(if ((nameB.map(_ & 0xff).max & 0x80) != 0) 0x0800 else 0)
      w16(method); w16(0); w16(0)
      w32(crc.getValue); w32(comp.length); w32(data.length)
      w16(nameB.length); w16(0)
      out.write(nameB, 0, nameB.length)
      out.write(comp, 0, comp.length)
      central.write('P'); central.write('K'); central.write(1); central.write(2)
      c16(20); c16(20)
      c16(if ((nameB.map(_ & 0xff).max & 0x80) != 0) 0x0800 else 0)
      c16(method); c16(0); c16(0)
      c32(crc.getValue); c32(comp.length); c32(data.length)
      c16(nameB.length); c16(0); c16(0); c16(0); c16(0)
      c32(0); c32(lho)
      central.write(nameB, 0, nameB.length)
    }
    val cdOff = out.size()
    val cd = central.toByteArray
    out.write(cd, 0, cd.length)
    val commentB = comment.getBytes(UTF_8)
    out.write('P'); out.write('K'); out.write(5); out.write(6)
    w16(0); w16(0); w16(entries.length); w16(entries.length)
    w32(cd.length); w32(cdOff); w16(commentB.length)
    out.write(commentB, 0, commentB.length)
    out.toByteArray
  }

  /** Write a ZIP64-styled ZIP: every central-directory entry carries
    * 0xFFFFFFFF sentinel sizes/offsets resolved by a 0x0001 extra
    * field, the EOCD carries 0xFFFF/0xFFFFFFFF sentinels, and the
    * EOCD64 record + locator hold the real values — the exact boundary
    * shape a >4 GiB archive forces, writable without a 4 GiB file
    * (APPNOTE permits ZIP64 structures regardless of size). */
  def zipEncode64(entries: Seq[(String, Array[Byte])],
                  deflate: Int => Boolean = _ % 2 == 1): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = { w16(v.toInt & 0xffff); w16(((v >> 16) & 0xffff).toInt) }
    def w64(v: Long): Unit = { w32(v & 0xffffffffL); w32((v >>> 32) & 0xffffffffL) }
    val central = new ByteArrayOutputStream()
    def c16(v: Int): Unit = { central.write(v & 0xff); central.write((v >> 8) & 0xff) }
    def c32(v: Long): Unit = { c16(v.toInt & 0xffff); c16(((v >> 16) & 0xffff).toInt) }
    def c64(v: Long): Unit = { c32(v & 0xffffffffL); c32((v >>> 32) & 0xffffffffL) }
    entries.zipWithIndex.foreach { case ((name, data), k) =>
      val nameB = name.getBytes(UTF_8)
      val crc = new java.util.zip.CRC32
      crc.update(data)
      val method = if (deflate(k)) 8 else 0
      val comp =
        if (method == 0) data
        else {
          val d = new java.util.zip.Deflater(
            java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
          try {
            d.setInput(data); d.finish()
            val bo = new ByteArrayOutputStream(data.length / 2 + 32)
            val buf = new Array[Byte](8192)
            while (!d.finished()) bo.write(buf, 0, d.deflate(buf))
            bo.toByteArray
          } finally d.end()
        }
      val lho = out.size()
      val utf8Flag = if ((nameB.map(_ & 0xff).max & 0x80) != 0) 0x0800 else 0
      // local header keeps real 32-bit sizes (readers use the CD's)
      out.write('P'); out.write('K'); out.write(3); out.write(4)
      w16(45); w16(utf8Flag)
      w16(method); w16(0); w16(0)
      w32(crc.getValue); w32(comp.length); w32(data.length)
      w16(nameB.length); w16(0)
      out.write(nameB, 0, nameB.length)
      out.write(comp, 0, comp.length)
      // central entry: all three 64-capable fields as sentinels + extra
      central.write('P'); central.write('K'); central.write(1); central.write(2)
      c16(45); c16(45)
      c16(utf8Flag)
      c16(method); c16(0); c16(0)
      c32(crc.getValue); c32(0xffffffffL); c32(0xffffffffL)
      c16(nameB.length); c16(4 + 24); c16(0); c16(0); c16(0)
      c32(0); c32(0xffffffffL)
      central.write(nameB, 0, nameB.length)
      c16(1); c16(24) // ZIP64 extra: uncomp, comp, lho
      c64(data.length); c64(comp.length); c64(lho)
    }
    val cdOff = out.size()
    val cd = central.toByteArray
    out.write(cd, 0, cd.length)
    val z64At = out.size()
    // EOCD64 record (fixed 56 bytes; size field = 44, the part after it)
    out.write('P'); out.write('K'); out.write(6); out.write(6)
    w64(44); w16(45); w16(45); w32(0); w32(0)
    w64(entries.length); w64(entries.length)
    w64(cd.length); w64(cdOff)
    // EOCD64 locator
    out.write('P'); out.write('K'); out.write(6); out.write(7)
    w32(0); w64(z64At); w32(1)
    // EOCD with sentinel count/offset
    out.write('P'); out.write('K'); out.write(5); out.write(6)
    w16(0); w16(0); w16(0xffff); w16(0xffff)
    w32(cd.length); w32(0xffffffffL); w16(0)
    out.toByteArray
  }

  // ---- TAR (USTAR) ----

  def tarEntries(bytes: Array[Byte]): Seq[Entry] = {
    require(isTar(bytes), "ArchiveCodec: not a USTAR tar")
    val out = scala.collection.mutable.Buffer.empty[Entry]
    var at = 0
    var done = false
    while (!done && at + 512 <= bytes.length) {
      if (bytes.slice(at, at + 512).forall(_ == 0)) done = true // terminator
      else {
        val name = new String(bytes, at, 100, UTF_8).takeWhile(_ != '\u0000')
        require(name.nonEmpty, s"ArchiveCodec: tar header at $at has no name")
        def octal(off: Int, len: Int): Long = {
          val s = new String(bytes, at + off, len, UTF_8)
            .takeWhile(c => c != '\u0000' && c != ' ')
          require(s.nonEmpty && s.forall(c => c >= '0' && c <= '7'),
            s"ArchiveCodec: tar '$name' field at +$off is not octal ('$s')")
          java.lang.Long.parseLong(s, 8)
        }
        val size = octal(124, 12)
        val declared = octal(148, 8)
        // checksum: header bytes with the checksum field read as spaces
        var sum = 0L
        var k = 0
        while (k < 512) {
          sum += (if (k >= 148 && k < 156) ' '.toInt else bytes(at + k) & 0xff)
          k += 1
        }
        require(sum == declared,
          s"ArchiveCodec: tar '$name' checksum mismatch " +
            s"(stored $declared, computed $sum)")
        val typeflag = bytes(at + 156).toChar
        require(at + 512 + size <= bytes.length,
          s"ArchiveCodec: tar '$name' data runs past EOF")
        if (typeflag == '0' || typeflag == ' ')
          out += Entry(name, size, "tar",
            java.util.Arrays.copyOfRange(bytes, at + 512, at + 512 + size.toInt))
        else require(typeflag == '5', // directories skip; the rest reject
          s"ArchiveCodec: tar '$name' typeflag '$typeflag' unsupported " +
            "(0 file, 5 directory)")
        at += 512 + ((size.toInt + 511) / 512) * 512
      }
    }
    require(out.nonEmpty, "ArchiveCodec: tar holds no regular files")
    out.toSeq
  }

  /** Write a USTAR tar: regular files + the two-zero-block trailer. */
  def tarEncode(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    entries.foreach { case (name, data) =>
      val hdr = new Array[Byte](512)
      val nameB = name.getBytes(UTF_8)
      require(nameB.length <= 100, s"ArchiveCodec: tar name '$name' > 100 bytes")
      System.arraycopy(nameB, 0, hdr, 0, nameB.length)
      def putOctal(off: Int, len: Int, v: Long): Unit = {
        val s = java.lang.Long.toOctalString(v)
        val padded = ("0" * (len - 1 - s.length)) + s
        System.arraycopy(padded.getBytes(UTF_8), 0, hdr, off, len - 1)
      }
      putOctal(100, 8, 420) // mode 0644
      putOctal(108, 8, 0); putOctal(116, 8, 0) // uid / gid
      putOctal(124, 12, data.length)
      putOctal(136, 12, 0) // mtime
      hdr(156) = '0' // regular file
      "ustar".getBytes(UTF_8).copyToArray(hdr, 257)
      hdr(263) = '0'; hdr(264) = '0' // version "00"
      java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
      var sum = 0L
      hdr.foreach(b => sum += (b & 0xff))
      val cs = java.lang.Long.toOctalString(sum)
      val padded = ("0" * (6 - cs.length)) + cs
      System.arraycopy(padded.getBytes(UTF_8), 0, hdr, 148, 6)
      hdr(154) = 0; hdr(155) = ' '
      out.write(hdr, 0, 512)
      out.write(data, 0, data.length)
      val pad = (512 - data.length % 512) % 512
      out.write(new Array[Byte](pad), 0, pad)
    }
    out.write(new Array[Byte](1024), 0, 1024)
    out.toByteArray
  }
}
