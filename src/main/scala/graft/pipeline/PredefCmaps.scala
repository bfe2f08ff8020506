package graft.pipeline

import java.nio.charset.{Charset, CodingErrorAction}
import java.nio.{ByteBuffer, CharBuffer}

/** Built-in PREDEFINED CJK CMap tables (ISO 32000 §9.7.5.2): a Type0
  * font may name one of Adobe's registered CMaps instead of embedding
  * an /Encoding stream — and real Japanese PDFs (the reference's own
  * corpus; it reads them through PDFBox + Adobe's cmap-resources,
  * BlobUploadDetector/.../Function.java:90-132) overwhelmingly do.
  * This carries compact, deterministic subsets of the horizontal
  * workhorses of ALL THREE CJK locales (round 15 added Chinese and
  * Korean — the same JDK-charset construction as Japanese):
  *
  *  - `/90ms-RKSJ-H` — Shift-JIS (Microsoft code page 932) byte codes.
  *    Codespaces restated from Adobe's PUBLIC cmap-resources header:
  *    1-byte <00><80> and <A0><DF>, 2-byte <8140><9FFC> and <E040><FCFC>
  *    (first-byte disjoint, so the variable-width tokenizer's
  *    shortest-match rule is exact). Code → Unicode is the JDK's
  *    `windows-31j` charset — the same public CP932 mapping data
  *    Adobe's table encodes; codes CP932 leaves undefined are absent
  *    from the table and fail loud downstream.
  *  - `/Ext-RKSJ-H` (round 17) — the other common Japanese
  *    registration (JIS78 + NEC extensions, Adobe-Japan1-2): identical
  *    published codespaces, table-shared with 90ms-RKSJ under the JDK
  *    construction (see [[extRksj]]).
  *  - `/GBK-EUC-H` (Adobe-GB1, simplified Chinese) — GBK/cp936 byte
  *    codes, <00><80> + <8140><FEFE>, via the JDK `GBK` charset.
  *  - `/KSCms-UHC-H` (Adobe-Korea1/KR) — Unified Hangul Code/cp949,
  *    <00><80> + <8141><FEFE>, via the JDK `x-windows-949` charset.
  *  - `/UniJIS-UCS2-H`, `/UniGB-UCS2-H`, `/UniKS-UCS2-H` — the code IS
  *    the UCS-2 code point by the CMap's definition, so code → Unicode
  *    is identity — restricted to the locale charset's ENCODABLE
  *    repertoire, the deterministic stand-in for "has a CID in the
  *    locale's Adobe ordering". Codespace <0000><FFFF>.
  *
  *  - `/UniJIS-UTF16-H`, `/UniGB-UTF16-H`, `/UniKS-UTF16-H` (round
  *    16) — the code IS the UTF-16BE encoding: BMP points are the same
  *    2-byte codes as the UCS2 forms (surrogate gap EXCLUDED from the
  *    codespaces), supplementary points are 4-byte surrogate-pair
  *    codes. Codespaces restated from Adobe's published headers:
  *    2-byte <0000><D7FF> + <E000><FFFF>, 4-byte <D800DC00><DBFFDFFF>
  *    (first-byte disjoint: D8–DB starts only the 4-byte range, so the
  *    shortest-match tokenizer stays exact). The BMP repertoire is the
  *    locale charset's, like the UCS2 twins; the supplementary
  *    repertoire is the CJK Unified Ideographs Extension B block
  *    (U+20000–U+2A6DF) — the bulk of Adobe's supplementary
  *    registrations (Japan1-6 / GB1-5 era) — mapped by identity.
  *
  * VERTICAL (-V) variants of every carried name are TABLE-SHARING
  * ALIASES: per Adobe's registrations a -V CMap differs from its -H
  * twin only in /WMode and in routing a handful of punctuation codes
  * to ROTATED-GLYPH CIDs — the code→Unicode mapping text extraction
  * needs is identical. The writing mode is surfaced as
  * [[PredefCmap.vertical]] (extraction itself is order-preserving
  * per show-run either way; glyph layout is out of scope).
  *
  * Names outside these keep the engine's fail-loud refusal (the error
  * names the carried tables).
  *
  * Tables build LAZILY once per JVM (≈10–45k entries each, built by
  * enumerating the code ranges through the JDK charset — no committed
  * binary blob to drift from its generator).
  */
private[graft] object PredefCmaps {

  final case class PredefCmap(name: String,
                              codespaces: Seq[(Int, Long, Long)],
                              toUni: Map[(Int, Long), String],
                              vertical: Boolean = false) {
    // the shortest-match tokenizer (PdfCodec.decodeShown) is only
    // spec-equivalent for first-byte-disjoint range widths — the same
    // invariant parseCodespaces enforces for EMBEDDED CMaps; built-in
    // tables must not be able to bypass it (a future EUC-style table
    // with overlapping lead bytes would silently mis-tokenize)
    for {
      (l1, lo1, hi1) <- codespaces
      (l2, lo2, hi2) <- codespaces
      if l1 < l2
    } {
      def fb(len: Int, v: Long): Long = (v >> (8 * (len - 1))) & 0xff
      require(fb(l1, hi1) < fb(l2, lo2) || fb(l2, hi2) < fb(l1, lo1),
        s"PredefCmaps: $name declares codespaces of widths $l1 and $l2 with " +
          "overlapping first-byte prefixes — would mis-tokenize under shortest-match")
    }
  }

  /** The Adobe character-collection ordering each carried CMap belongs
    * to — the /CIDSystemInfo a conforming CIDFont must pair with it
    * (ISO 32000-1 §9.7.5.2): (Ordering, Supplement). */
  def orderingOf(name: String): (String, Int) = baseName(name) match {
    // supplements per Adobe's registrations (ISO 32000-1 Table 118 and
    // the cmap-resources headers): UniJIS/UniGB UCS2 are Japan1-4 /
    // GB1-4, the UTF16 forms Japan1-6 / GB1-5 / Korea1-2, the
    // locale-encoding forms Japan1-2 / GB1-2 / Korea1-1; a -V variant
    // shares its -H twin's registration
    case "90ms-RKSJ" | "Ext-RKSJ" => ("Japan1", 2)
    case "UniJIS-UCS2" => ("Japan1", 4)
    case "UniJIS-UTF16" => ("Japan1", 6)
    case "GBK-EUC" => ("GB1", 2)
    case "UniGB-UCS2" => ("GB1", 4)
    case "UniGB-UTF16" => ("GB1", 5)
    case "KSCms-UHC" | "UniKS-UCS2" => ("Korea1", 1)
    case "UniKS-UTF16" => ("Korea1", 2)
    case other => throw new IllegalArgumentException(
      s"PredefCmaps: no ordering for /$name")
  }

  /** "90ms-RKSJ-V" → "90ms-RKSJ"; names without an -H/-V suffix keep
    * themselves (and miss every match above). */
  private def baseName(name: String): String =
    if (name.endsWith("-H") || name.endsWith("-V")) name.dropRight(2) else name

  private def cp932 = Charset.forName("windows-31j")

  /** Build a byte-coded table from a JDK charset: codes inside the
    * given codespaces decode through the charset; holes the charset
    * leaves undefined stay absent (and fail loud downstream). */
  private def byteTable(name: String, cs: () => Charset,
                        spaces: Seq[(Int, Long, Long)]): PredefCmap = {
    def dec(bytes: Array[Byte]): Option[String] = {
      val d = cs().newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      try {
        val s = d.decode(ByteBuffer.wrap(bytes)).toString
        if (s.isEmpty) None else Some(s)
      } catch { case _: java.nio.charset.CharacterCodingException => None }
    }
    val m = Map.newBuilder[(Int, Long), String]
    spaces.foreach {
      case (1, lo, hi) =>
        for (b <- lo.toInt to hi.toInt; s <- dec(Array(b.toByte)))
          m += ((1, b.toLong) -> s)
      case (2, lo, hi) =>
        // per-byte containment (spec §9.7.6.2): iterate first × second
        // byte ranges, not the integer interval
        for {
          b1 <- (lo >> 8).toInt to (hi >> 8).toInt
          b2 <- (lo & 0xff).toInt to (hi & 0xff).toInt
          s <- dec(Array(b1.toByte, b2.toByte))
        } m += ((2, ((b1 << 8) | b2).toLong) -> s)
      case other => throw new IllegalStateException(s"byteTable: $other")
    }
    PredefCmap(name, spaces, m.result())
  }

  /** A UCS2 CMap: code IS the code point, restricted to the charset-
    * ENCODABLE repertoire (the locale's Adobe-ordering stand-in). */
  private def identityTable(name: String, cs: () => Charset): PredefCmap = {
    val enc = cs().newEncoder()
    val m = Map.newBuilder[(Int, Long), String]
    var c = 0x0000
    while (c <= 0xffff) {
      val ch = c.toChar
      if (!Character.isSurrogate(ch) && enc.canEncode(ch))
        m += ((2, c.toLong) -> ch.toString)
      c += 1
    }
    PredefCmap(name, Seq((2, 0x0000L, 0xffffL)), m.result())
  }

  private def gbk = Charset.forName("GBK")          // code page 936
  private def uhc = Charset.forName("x-windows-949") // Korean UHC, cp949

  lazy val rksj: PredefCmap = byteTable("90ms-RKSJ-H", () => cp932,
    // 1-byte <00><80> (JIS-Roman/ASCII) + <A0><DF> (halfwidth katakana);
    // 2-byte hi 81-9F / E0-FC, lo 40-FC — Adobe's published ranges
    Seq((1, 0x00L, 0x80L), (2, 0x8140L, 0x9ffcL),
        (1, 0xa0L, 0xdfL), (2, 0xe040L, 0xfcfcL)))

  /** Ext-RKSJ-H (round 17) — the other common Japanese registration
    * (JIS78 base + NEC row extensions, Adobe-Japan1-2). Its published
    * codespaces are IDENTICAL to 90ms-RKSJ's, and under this module's
    * JDK-CP932 construction the code→text table coincides too, so it is
    * a table-sharing alias of [[rksj]] (the -V convention); what differs
    * at Adobe is CID selection, which text extraction never reads. */
  lazy val extRksj: PredefCmap = rksj.copy(name = "Ext-RKSJ-H")

  /** GBK-EUC-H (Adobe-GB1): simplified-Chinese GBK byte codes. */
  lazy val gbkEuc: PredefCmap = byteTable("GBK-EUC-H", () => gbk,
    Seq((1, 0x00L, 0x80L), (2, 0x8140L, 0xfefeL)))

  /** KSCms-UHC-H (Adobe-Korea1/KR): Korean Unified Hangul Code. */
  lazy val kscUhc: PredefCmap = byteTable("KSCms-UHC-H", () => uhc,
    Seq((1, 0x00L, 0x80L), (2, 0x8141L, 0xfefeL)))

  lazy val uniJisUcs2: PredefCmap = identityTable("UniJIS-UCS2-H", () => cp932)
  lazy val uniGbUcs2: PredefCmap = identityTable("UniGB-UCS2-H", () => gbk)
  lazy val uniKsUcs2: PredefCmap = identityTable("UniKS-UCS2-H", () => uhc)

  /** Extension B block — the supplementary repertoire of the UTF16
    * forms (see the object Scaladoc). */
  private final val ExtBLo = 0x20000
  private final val ExtBHi = 0x2a6df

  /** A UTF16 CMap: BMP like [[identityTable]] but 2-byte codespaces
    * that EXCLUDE the surrogate gap, plus 4-byte surrogate-pair codes
    * for the Extension B block mapped by identity. */
  private def utf16Table(name: String, cs: () => Charset): PredefCmap = {
    val enc = cs().newEncoder()
    val m = Map.newBuilder[(Int, Long), String]
    var c = 0x0000
    while (c <= 0xffff) {
      val ch = c.toChar
      if (!Character.isSurrogate(ch) && enc.canEncode(ch))
        m += ((2, c.toLong) -> ch.toString)
      c += 1
    }
    var cp = ExtBLo
    while (cp <= ExtBHi) {
      val pair = Character.toChars(cp)
      val code = ((pair(0).toLong & 0xffffL) << 16) | (pair(1).toLong & 0xffffL)
      m += ((4, code) -> new String(pair))
      cp += 1
    }
    PredefCmap(name,
      Seq((2, 0x0000L, 0xd7ffL), (2, 0xe000L, 0xffffL),
          (4, 0xd800dc00L, 0xdbffdfffL)),
      m.result())
  }

  lazy val uniJisUtf16: PredefCmap = utf16Table("UniJIS-UTF16-H", () => cp932)
  lazy val uniGbUtf16: PredefCmap = utf16Table("UniGB-UTF16-H", () => gbk)
  lazy val uniKsUtf16: PredefCmap = utf16Table("UniKS-UTF16-H", () => uhc)

  /** The carried tables by PDF name — the horizontal workhorses of all
    * three CJK locales, their UTF16 forms, and every -V vertical as a
    * table-sharing alias (writing mode surfaced, tables identical —
    * see the object Scaladoc); None keeps the caller's fail-loud path
    * for everything else. */
  def forName(name: String): Option[PredefCmap] = {
    val horizontal = baseName(name) match {
      case "90ms-RKSJ" => Some(rksj)
      case "Ext-RKSJ" => Some(extRksj)
      case "UniJIS-UCS2" => Some(uniJisUcs2)
      case "UniJIS-UTF16" => Some(uniJisUtf16)
      case "GBK-EUC" => Some(gbkEuc)
      case "UniGB-UCS2" => Some(uniGbUcs2)
      case "UniGB-UTF16" => Some(uniGbUtf16)
      case "KSCms-UHC" => Some(kscUhc)
      case "UniKS-UCS2" => Some(uniKsUcs2)
      case "UniKS-UTF16" => Some(uniKsUtf16)
      case _ => None
    }
    if (name.endsWith("-V"))
      horizontal.map(h => h.copy(name = name, vertical = true))
    else if (name.endsWith("-H")) horizontal
    else None
  }

  /** ENCODE one code point to its code under the named CMap (the
    * writer's side of the gate) — (width, code); fails loud outside the
    * table's repertoire rather than emitting undecodable bytes.
    * Supplementary planes only encode under the UTF16 forms (4-byte
    * surrogate-pair codes over the Extension B repertoire). */
  def encodeCodePoint(cmapName: String, cp: Int): (Int, Long) =
    if (cp > 0xffff) {
      require(baseName(cmapName).endsWith("UTF16"),
        f"PredefCmaps: supplementary U+$cp%05X needs a UTF16-form CMap, " +
          s"not $cmapName")
      require(cp >= ExtBLo && cp <= ExtBHi,
        f"PredefCmaps: U+$cp%05X outside the $cmapName supplementary subset " +
          "(CJK Extension B)")
      val pair = Character.toChars(cp)
      (4, ((pair(0).toLong & 0xffffL) << 16) | (pair(1).toLong & 0xffffL))
    } else {
      val (w, code) = encodeChar(cmapName, cp.toChar)
      (w, code.toLong)
    }

  /** [[encodeCodePoint]] for a BMP char — memoized per (cmap, char):
    * the uncached path allocates a CharsetEncoder + buffers PER
    * CHARACTER, which dominated the cmap-corpus synthesis cost (round
    * 18); failures propagate uncached so the fail-loud contract is
    * unchanged. */
  def encodeChar(cmapName: String, ch: Char): (Int, Int) =
    encodeMemo.computeIfAbsent((cmapName, ch),
      k => encodeCharUncached(k._1, k._2))

  private val encodeMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, Char), (Int, Int)]()

  private def encodeCharUncached(cmapName: String, ch: Char): (Int, Int) = {
    def charsetOf(n: String): Charset = baseName(n) match {
      case "90ms-RKSJ" | "Ext-RKSJ" | "UniJIS-UCS2" | "UniJIS-UTF16" => cp932
      case "GBK-EUC" | "UniGB-UCS2" | "UniGB-UTF16" => gbk
      case "KSCms-UHC" | "UniKS-UCS2" | "UniKS-UTF16" => uhc
      case other => throw new IllegalArgumentException(
        s"PredefCmaps: no built-in table for /$n " +
          "(carried: 90ms-RKSJ, Ext-RKSJ, GBK-EUC, KSCms-UHC and the " +
          "Uni*-UCS2 / Uni*-UTF16 trios, -H and -V forms)")
    }
    val cs = charsetOf(cmapName)
    if (cmapName.startsWith("Uni")) {
      require(!Character.isSurrogate(ch) && cs.newEncoder().canEncode(ch),
        f"PredefCmaps: U+${ch.toInt}%04X outside the $cmapName subset " +
          s"(${cs.name()}-encodable repertoire)")
      (2, ch.toInt)
    } else {
      val enc = cs.newEncoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      require(enc.canEncode(ch),
        f"PredefCmaps: U+${ch.toInt}%04X not encodable in $cmapName (${cs.name()})")
      val bytes = {
        val bb = enc.encode(CharBuffer.wrap(ch.toString))
        val a = new Array[Byte](bb.remaining()); bb.get(a); a
      }
      bytes.length match {
        case 1 => (1, bytes(0) & 0xff)
        case 2 => (2, ((bytes(0) & 0xff) << 8) | (bytes(1) & 0xff))
        case n => throw new IllegalArgumentException(
          f"PredefCmaps: U+${ch.toInt}%04X encodes to $n ${cs.name()} bytes (want 1 or 2)")
      }
    }
  }
}
