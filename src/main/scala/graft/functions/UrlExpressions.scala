package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization (round 19 — the crawl-dedup stage in front of
  * URL-level exact dedup and per-domain capping: Common-Crawl-scale
  * corpora carry the same page under syntactic URL variants, and a
  * canonical form collapses them BEFORE content hashing ever runs).
  *
  * RFC 3986 §6 syntax-based normalization, scoped to http(s):
  *  - scheme and host lowercase; default ports (http:80, https:443)
  *    stripped, other ports kept
  *  - percent-encoding normalized: unreserved octets (ALPHA / DIGIT /
  *    '-' '.' '_' '~') DECODE, everything else keeps its escape with
  *    UPPERCASE hex (%3a → %3A); a '%' not followed by two hex digits
  *    rejects loud (silent pass-through would split equal URLs)
  *  - path dot-segments removed per §5.2.4; empty path → "/"
  *  - the fragment drops (it never reaches the server)
  *  - query kept (order preserved — reordering is NOT sound in
  *    general), userinfo kept; non-http(s) schemes reject BY NAME
  *
  * Native Catalyst expression (single-pass string walk, no regex). */
case class UrlCanonicalExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "url_canonical"

  override protected def nullSafeEval(input: Any): Any = {
    val url = input.asInstanceOf[UTF8String].toString
    UTF8String.fromString(UrlCanonicalExpr.canonicalize(url))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UrlCanonicalExpr {

  def column(c: Column): Column =
    ColumnBridge.column(UrlCanonicalExpr(ColumnBridge.expression(c)))

  private def isUnreserved(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  private def hexVal(c: Char): Int = Character.digit(c, 16)

  /** Percent-normalize one component: decode unreserved escapes,
    * uppercase the rest; literal chars pass through. */
  private def pctNormalize(s: String, what: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%') {
        require(i + 2 < s.length && hexVal(s.charAt(i + 1)) >= 0 &&
          hexVal(s.charAt(i + 2)) >= 0,
          s"url_canonical: bad percent-escape in $what at offset $i")
        val v = (hexVal(s.charAt(i + 1)) << 4) | hexVal(s.charAt(i + 2))
        if (isUnreserved(v.toChar)) out.append(v.toChar)
        else {
          out.append('%')
          out.append(Character.toUpperCase(s.charAt(i + 1)))
          out.append(Character.toUpperCase(s.charAt(i + 2)))
        }
        i += 3
      } else {
        out.append(c)
        i += 1
      }
    }
    out.toString
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  private def removeDotSegments(path: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    // split KEEPING empty segments ("/a//b" stays distinct from "/a/b")
    val segs = path.split("/", -1)
    var i = 0
    while (i < segs.length) {
      segs(i) match {
        case "." => // drop; a trailing "." keeps the slash
          if (i == segs.length - 1) out += ""
        case ".." =>
          // pop one real segment (never the leading empty root marker)
          if (out.length > 1) out.remove(out.length - 1)
          if (i == segs.length - 1) out += ""
        case s => out += s
      }
      i += 1
    }
    val joined = out.mkString("/")
    if (joined.isEmpty) "/" else joined
  }

  def canonicalize(url: String): String = {
    val colon = url.indexOf(':')
    require(colon > 0, s"url_canonical: no scheme in '$url'")
    val scheme = url.substring(0, colon).toLowerCase(java.util.Locale.ROOT)
    require(scheme == "http" || scheme == "https",
      s"url_canonical: scheme '$scheme' unsupported (http / https)")
    require(url.regionMatches(colon, "://", 0, 3),
      s"url_canonical: expected '://' after the scheme in '$url'")
    val rest = url.substring(colon + 3)
    // authority ends at the first of / ? #
    var authEnd = 0
    while (authEnd < rest.length && rest.charAt(authEnd) != '/' &&
      rest.charAt(authEnd) != '?' && rest.charAt(authEnd) != '#') authEnd += 1
    val auth = rest.substring(0, authEnd)
    require(auth.nonEmpty, s"url_canonical: empty host in '$url'")
    val (userinfo, hostPort) = auth.lastIndexOf('@') match {
      case -1 => ("", auth)
      case at => (auth.substring(0, at + 1), auth.substring(at + 1))
    }
    val (host0, port) = hostPort.lastIndexOf(':') match {
      case -1 => (hostPort, "")
      case at if hostPort.indexOf(']') > at => (hostPort, "") // [v6] no port
      case at => (hostPort.substring(0, at), hostPort.substring(at + 1))
    }
    require(host0.nonEmpty, s"url_canonical: empty host in '$url'")
    // ASCII digits only: Unicode isDigit would pass Arabic-Indic
    // numerals through as a silently-invalid port
    port.foreach(c => require(c >= '0' && c <= '9',
      s"url_canonical: non-numeric port '$port' in '$url'"))
    val host = host0.toLowerCase(java.util.Locale.ROOT)
    val defaultPort = (scheme == "http" && port == "80") ||
      (scheme == "https" && port == "443")
    val portOut = if (port.isEmpty || defaultPort) "" else ":" + port
    // split path / query / fragment
    val tail = rest.substring(authEnd)
    val hash = tail.indexOf('#')
    val noFrag = if (hash < 0) tail else tail.substring(0, hash)
    val q = noFrag.indexOf('?')
    val rawPath = if (q < 0) noFrag else noFrag.substring(0, q)
    val rawQuery = if (q < 0) null else noFrag.substring(q + 1)
    val path = removeDotSegments(
      pctNormalize(if (rawPath.isEmpty) "/" else rawPath, "path"))
    val queryOut =
      if (rawQuery == null) "" else "?" + pctNormalize(rawQuery, "query")
    s"$scheme://$userinfo$host$portOut$path$queryOut"
  }
}
