package graft.pipeline

import java.nio.charset.{Charset, CodingErrorAction}
import java.nio.{ByteBuffer, CharBuffer}

/** Built-in PREDEFINED CJK CMap tables (ISO 32000 §9.7.5.2): a Type0
  * font may name one of Adobe's registered CMaps instead of embedding
  * an /Encoding stream — and real Japanese PDFs (the reference's own
  * corpus; it reads them through PDFBox + Adobe's cmap-resources,
  * BlobUploadDetector/.../Function.java:90-132) overwhelmingly do.
  * This carries a compact, deterministic subset of the two workhorses:
  *
  *  - `/90ms-RKSJ-H` — Shift-JIS (Microsoft code page 932) byte codes.
  *    Codespaces restated from Adobe's PUBLIC cmap-resources header:
  *    1-byte <00><80> and <A0><DF>, 2-byte <8140><9FFC> and <E040><FCFC>
  *    (first-byte disjoint, so the variable-width tokenizer's
  *    shortest-match rule is exact). Code → Unicode is the JDK's
  *    `windows-31j` charset — the same public CP932 mapping data
  *    Adobe's table encodes; codes CP932 leaves undefined are absent
  *    from the table and fail loud downstream.
  *  - `/UniJIS-UCS2-H` — the code IS the UCS-2 code point by the CMap's
  *    definition, so code → Unicode is identity — restricted to the
  *    CP932-ENCODABLE repertoire (JIS X 0208 + NEC/IBM extensions +
  *    ASCII + halfwidth katakana), the deterministic stand-in for
  *    "has an Adobe-Japan1 CID". Codespace <0000><FFFF>.
  *
  * Names outside these two keep the engine's fail-loud refusal (the
  * error names the carried tables). Vertical (-V) variants are refused
  * too: text extraction would need the WMode-aware layout pass this
  * engine doesn't do.
  *
  * Tables build LAZILY once per JVM (≈10–20k entries each, built by
  * enumerating the code ranges through the JDK charset — no committed
  * binary blob to drift from its generator).
  */
private[graft] object PredefCmaps {

  final case class PredefCmap(name: String,
                              codespaces: Seq[(Int, Long, Long)],
                              toUni: Map[(Int, Long), String])

  private def cp932 = Charset.forName("windows-31j")

  /** Decode one code's bytes through CP932, None when CP932 leaves the
    * code undefined (REPORT, never replacement garbage). */
  private def decode932(bytes: Array[Byte]): Option[String] = {
    val dec = cp932.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try {
      val out = dec.decode(ByteBuffer.wrap(bytes))
      val s = out.toString
      if (s.isEmpty) None else Some(s)
    } catch { case _: java.nio.charset.CharacterCodingException => None }
  }

  lazy val rksj: PredefCmap = {
    val m = Map.newBuilder[(Int, Long), String]
    // 1-byte ranges: <00><80> (JIS-Roman/ASCII) and <A0><DF> (halfwidth
    // katakana — CP932 maps A1-DF to U+FF61..U+FF9F; A0 is undefined)
    for (b <- 0x00 to 0x80; s <- decode932(Array(b.toByte)))
      m += ((1, b.toLong) -> s)
    for (b <- 0xa0 to 0xdf; s <- decode932(Array(b.toByte)))
      m += ((1, b.toLong) -> s)
    // 2-byte ranges: hi 81-9F / E0-FC, lo 40-FC per the codespaces
    // (CP932 additionally excludes lo=7F and various holes — those
    // codes simply never enter the table)
    for {
      hi <- (0x81 to 0x9f) ++ (0xe0 to 0xfc)
      lo <- 0x40 to 0xfc
      s <- decode932(Array(hi.toByte, lo.toByte))
    } m += ((2, ((hi << 8) | lo).toLong) -> s)
    PredefCmap("90ms-RKSJ-H",
      Seq((1, 0x00L, 0x80L), (2, 0x8140L, 0x9ffcL),
          (1, 0xa0L, 0xdfL), (2, 0xe040L, 0xfcfcL)),
      m.result())
  }

  lazy val uniJisUcs2: PredefCmap = {
    val enc = cp932.newEncoder()
    val m = Map.newBuilder[(Int, Long), String]
    var c = 0x0000
    while (c <= 0xffff) {
      val ch = c.toChar
      if (!Character.isSurrogate(ch) && enc.canEncode(ch))
        m += ((2, c.toLong) -> ch.toString)
      c += 1
    }
    PredefCmap("UniJIS-UCS2-H", Seq((2, 0x0000L, 0xffffL)), m.result())
  }

  /** The carried tables by PDF name; None keeps the caller's fail-loud
    * path for everything else. */
  def forName(name: String): Option[PredefCmap] = name match {
    case "90ms-RKSJ-H" => Some(rksj)
    case "UniJIS-UCS2-H" => Some(uniJisUcs2)
    case _ => None
  }

  /** ENCODE one char to its code under the named CMap (the writer's
    * side of the gate) — (width, code); fails loud outside the table's
    * repertoire rather than emitting undecodable bytes. */
  def encodeChar(cmapName: String, ch: Char): (Int, Int) = cmapName match {
    case "UniJIS-UCS2-H" =>
      require(!Character.isSurrogate(ch) && cp932.newEncoder().canEncode(ch),
        f"PredefCmaps: U+${ch.toInt}%04X outside the UniJIS-UCS2-H subset " +
          "(CP932-encodable repertoire)")
      (2, ch.toInt)
    case "90ms-RKSJ-H" =>
      val enc = cp932.newEncoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      require(enc.canEncode(ch),
        f"PredefCmaps: U+${ch.toInt}%04X not encodable in 90ms-RKSJ (CP932)")
      val bytes = {
        val bb = enc.encode(CharBuffer.wrap(ch.toString))
        val a = new Array[Byte](bb.remaining()); bb.get(a); a
      }
      bytes.length match {
        case 1 => (1, bytes(0) & 0xff)
        case 2 => (2, ((bytes(0) & 0xff) << 8) | (bytes(1) & 0xff))
        case n => throw new IllegalArgumentException(
          f"PredefCmaps: U+${ch.toInt}%04X encodes to $n CP932 bytes (want 1 or 2)")
      }
    case other => throw new IllegalArgumentException(
      s"PredefCmaps: no built-in table for /$other (carried: 90ms-RKSJ-H, UniJIS-UCS2-H)")
  }
}
