package graft.pipeline

/** HTML → text extraction (round 19 — the crawl-ingest stage every
  * training-data pipeline runs in front of dedup/quality/tokenize;
  * the reference's domain is PDF ingest, and web corpora arrive as
  * HTML inside WARC).
  *
  * Deliberately LENIENT, unlike the binary codecs: wild HTML is never
  * well-formed, so the contract here is a deterministic total function
  * — every input produces text, and the RULES are the spec:
  *  - `<script>`/`<style>`/`<noscript>`/`<template>` elements drop with
  *    their content (case-insensitive, attribute-tolerant; an unclosed
  *    one drops to EOF — the browser rule)
  *  - `<!-- -->` comments, `<![CDATA[ ]]>` sections, `<!DOCTYPE>` and
  *    `<? ?>` processing instructions drop
  *  - every remaining tag drops; BLOCK-level tags (p/div/br/li/tr/h1-6
  *    /table/ul/ol/section/article/header/footer/blockquote/pre/hr)
  *    contribute a whitespace separator so words never fuse across
  *    block boundaries; a `<` that opens no tag is literal text
  *  - character references decode: the core named five (amp/lt/gt/
  *    quot/apos) + nbsp (→ space), decimal `&#NN;` and hex `&#xHH;`
  *    code points; unknown/malformed references stay literal
  *  - whitespace (space, TAB, LF, CR, FF, VT) collapses to single
  *    spaces, trimmed
  * `title` extracts the first `<title>` element's text the same way. */
object HtmlText {

  private val DropElems = Set("script", "style", "noscript", "template")
  private val BlockElems = Set("p", "div", "br", "li", "tr", "td", "th",
    "h1", "h2", "h3", "h4", "h5", "h6", "table", "ul", "ol", "section",
    "article", "header", "footer", "blockquote", "pre", "hr")

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == '\u000b'

  /** Decode one character reference starting at `at` (the '&').
    * Returns (decoded, nextPos) or null when it is not a reference. */
  private def charRef(s: String, at: Int): (String, Int) = {
    val semi = s.indexOf(';', at + 1)
    if (semi < 0 || semi - at > 12) return null
    val body = s.substring(at + 1, semi)
    val out: String =
      if (body.startsWith("#x") || body.startsWith("#X")) {
        val hex = body.substring(2)
        if (hex.nonEmpty && hex.forall(c => Character.digit(c, 16) >= 0))
          try new String(Character.toChars(Integer.parseInt(hex, 16)))
          catch { case _: Exception => null }
        else null
      } else if (body.startsWith("#")) {
        val dec = body.substring(1)
        if (dec.nonEmpty && dec.forall(_.isDigit))
          try new String(Character.toChars(dec.toInt))
          catch { case _: Exception => null }
        else null
      } else NamedRefs.getOrElse(body, null)
    if (out == null) null else (out, semi + 1)
  }

  /** The core five + the HIGH-FREQUENCY named references wild pages
    * actually carry (round 20 — typographic punctuation, spaces,
    * currency, common symbols). A curated hand-verifiable subset, NOT
    * the full HTML5 table: unknown references stay literal by the
    * leniency rule, which is deterministic and honest; this set only
    * moves the most common real-page glyphs out of the literal
    * fallback. Each mapping is one code point, checkable against any
    * Unicode chart by name. */
  private val NamedRefs: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ",
    // dashes, ellipsis, quotes
    "ndash" -> "–", "mdash" -> "—", "hellip" -> "…",
    "lsquo" -> "‘", "rsquo" -> "’",
    "ldquo" -> "“", "rdquo" -> "”",
    "sbquo" -> "‚", "bdquo" -> "„",
    "laquo" -> "«", "raquo" -> "»",
    "prime" -> "′", "Prime" -> "″",
    // spaces and structure
    "ensp" -> " ", "emsp" -> " ", "thinsp" -> " ",
    "shy" -> "­",
    // bullets, daggers, marks
    "bull" -> "•", "middot" -> "·",
    "dagger" -> "†", "Dagger" -> "‡",
    "sect" -> "§", "para" -> "¶",
    "copy" -> "©", "reg" -> "®", "trade" -> "™",
    // currency and math
    "cent" -> "¢", "pound" -> "£", "yen" -> "¥",
    "euro" -> "€",
    "deg" -> "°", "plusmn" -> "±", "times" -> "×",
    "divide" -> "÷", "frac12" -> "½", "frac14" -> "¼",
    "frac34" -> "¾", "micro" -> "µ", "sup2" -> "²",
    "sup3" -> "³", "minus" -> "−", "ne" -> "≠",
    "le" -> "≤", "ge" -> "≥", "infin" -> "∞",
    "rarr" -> "→", "larr" -> "←", "harr" -> "↔")

  private def asciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  private def asciiAlnum(c: Char): Boolean =
    asciiLetter(c) || (c >= '0' && c <= '9')

  /** Tag name at `at` (just past '<' and any '/'), lowercased; empty
    * when the position opens no name. The HTML5 tokenizer opens tags
    * on ASCII alpha ONLY ("I <3 scala" and "a<δ<b" keep their text —
    * Unicode isLetter would silently eat the non-ASCII forms);
    * Locale.ROOT so tr-TR's dotless-i can never unmatch `<SCRIPT>`. */
  private def tagName(s: String, at: Int): String = {
    if (at >= s.length || !asciiLetter(s.charAt(at))) return ""
    var p = at + 1
    while (p < s.length && asciiAlnum(s.charAt(p))) p += 1
    s.substring(at, p).toLowerCase(java.util.Locale.ROOT)
  }

  /** Extract (text, title). */
  def extractWithTitle(html: String): (String, String) = {
    val text = new StringBuilder
    val title = new StringBuilder
    var inTitle = false
    var p = 0
    val n = html.length
    lazy val lowerHtml = html.toLowerCase(java.util.Locale.ROOT)
    def emit(str: String): Unit = {
      if (inTitle) title.append(str) else text.append(str)
    }
    // Char overload: the ordinary-character hot path must not allocate
    def emitC(ch: Char): Unit = {
      if (inTitle) title.append(ch) else text.append(ch)
    }
    while (p < n) {
      val c = html.charAt(p)
      if (c == '<') {
        if (html.startsWith("<!--", p)) {
          val e = html.indexOf("-->", p + 4)
          p = if (e < 0) n else e + 3
        } else if (html.regionMatches(true, p, "<![CDATA[", 0, 9)) {
          val e = html.indexOf("]]>", p + 9)
          p = if (e < 0) n else e + 3
        } else if (html.startsWith("<!", p) || html.startsWith("<?", p)) {
          val e = html.indexOf('>', p + 2)
          p = if (e < 0) n else e + 1
        } else {
          val closing = p + 1 < n && html.charAt(p + 1) == '/'
          val nameAt = if (closing) p + 2 else p + 1
          val name = tagName(html, nameAt)
          if (name.isEmpty && closing) {
            // '</' + non-letter = a BOGUS COMMENT per HTML5: consumed
            // to the next '>' (browsers render nothing for '</3>')
            val e = html.indexOf('>', p + 2)
            p = if (e < 0) n else e + 1
          }
          else if (name.isEmpty) { emitC('<'); p += 1 } // literal '<'
          else {
            val e = html.indexOf('>', nameAt)
            val tagEnd = if (e < 0) n else e + 1
            if (!closing && DropElems.contains(name)) {
              // drop with content to the matching close (or EOF)
              val close = s"</$name"
              var q = tagEnd
              var done = false
              while (!done) {
                val hit = lowerHtml.indexOf(close, q)
                if (hit < 0) { p = n; done = true }
                else {
                  val ge = html.indexOf('>', hit)
                  p = if (ge < 0) n else ge + 1
                  done = true
                }
              }
            } else {
              if (name == "title") inTitle = !closing
              if (BlockElems.contains(name)) emitC(' ')
              p = tagEnd
            }
          }
        }
      } else if (c == '&') {
        val r = charRef(html, p)
        if (r == null) { emitC('&'); p += 1 }
        else { emit(r._1); p = r._2 }
      } else if (isWs(c)) {
        emitC(' ')
        p += 1
      } else {
        emitC(c)
        p += 1
      }
    }
    def collapse(sb: StringBuilder): String = {
      val out = new StringBuilder(sb.length)
      var lastWs = true
      sb.foreach { ch =>
        if (ch == ' ') { if (!lastWs) { out.append(' '); lastWs = true } }
        else { out.append(ch); lastWs = false }
      }
      if (out.nonEmpty && out.last == ' ') out.setLength(out.length - 1)
      out.toString
    }
    (collapse(text), collapse(title))
  }

  def extract(html: String): String = extractWithTitle(html)._1

  /** Escape text for embedding in an HTML body (the writer-side inverse
    * of the reference decode). */
  def escape(text: String): String =
    text.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c => c.toString
    }
}
