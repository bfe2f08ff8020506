package graft.plans

import java.util.Locale

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL surface for the index LIFECYCLE (VERDICT r11 task 8) — the
  * SELECT side has been SQL for two rounds ([[IvfScanRewriteRule]],
  * [[SparseScanRewriteRule]] lower `ORDER BY dist LIMIT k` onto the
  * stores), but create/append/delete/compact stayed library calls;
  * pgvector users live in SQL end-to-end. The standard Spark move (the
  * Delta-lake pattern) is a DELEGATING parser: statements matching the
  * small graft grammar become a [[GraftIndexCommand]], everything else
  * passes through untouched.
  *
  * Grammar (case-insensitive; one statement):
  * {{{
  *   CREATE GRAFT INDEX <kind> AT '<path>' FROM <table> [OPTIONS (k=16, iters=2, ...)]
  *       kind ∈ IVF | IVF_SQ | IVF_PQ | IVF_BINARY | IVF_COSINE | HALFVEC | MATRYOSHKA
  *   CREATE GRAFT SPARSE INDEX <table> AT '<path>' FROM <source> [OPTIONS (dim=1024, buckets=8)]
  *   APPEND  GRAFT INDEX AT '<path>' FROM <table>          |  APPEND  GRAFT SPARSE INDEX <table> FROM <source>
  *   UPSERT  GRAFT INDEX AT '<path>' FROM <table>          |  UPSERT  GRAFT SPARSE INDEX <table> FROM <source>
  *   DELETE  GRAFT INDEX AT '<path>' FROM <table>          |  DELETE  GRAFT SPARSE INDEX <table> FROM <source>
  *   COMPACT GRAFT INDEX AT '<path>'                       |  COMPACT GRAFT SPARSE INDEX <table>
  * }}}
  * OPTIONS values may be bare (`k=16`) or single-quoted (`dim='1024'`)
  * with the SQL `''` escape; `)` `,` `=` inside a quoted value are data.
  * `FROM <table>` is any table or temp view: (vec_id, embedding) for
  * the vector family; (doc_id, text) — hashed at `dim` — or a
  * pre-featurized (doc_id, indices, values) for sparse; id-only frames
  * for DELETE. Malformed graft statements fail loud with the grammar in
  * the message — never silently delegated (a typo'd maintenance command
  * must not parse as a SELECT against a table named GRAFT). */
case class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.parseGraft(sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType = delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType = delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {

  private val Kinds = Set("IVF", "IVF_SQ", "IVF_PQ", "IVF_BINARY", "IVF_COSINE",
    "HALFVEC", "MATRYOSHKA")

  private val Ident = """[A-Za-z_][A-Za-z0-9_.]*"""

  /** Quote-aware OPTIONS splitter (a flat regex broke on `)` `,` `=`
    * inside quoted values): values may be single-quoted with the SQL
    * `''` escape, so any character is data inside quotes; unquoted
    * values run to the next `,` or `)`. Returns the statement body
    * before the OPTIONS clause and the parsed map; a statement with no
    * top-level `OPTIONS (` passes through whole. */
  private def splitOptions(t: String, fail: String => Nothing): (String, Map[String, String]) = {
    // locate the last OPTIONS ( that sits OUTSIDE any quoted literal —
    // a path like AT 'dir OPTIONS (x)' must not be mistaken for the clause
    var i = 0; var inQ = false; var kw = -1; var open = -1
    while (i < t.length) {
      val c = t.charAt(i)
      if (inQ) {
        if (c == '\'') {
          if (i + 1 < t.length && t.charAt(i + 1) == '\'') i += 1 else inQ = false
        }
      } else if (c == '\'') inQ = true
      else if (i > 0 && t.charAt(i - 1).isWhitespace &&
          t.regionMatches(true, i, "OPTIONS", 0, 7)) {
        var j = i + 7
        while (j < t.length && t.charAt(j).isWhitespace) j += 1
        if (j < t.length && t.charAt(j) == '(') { kw = i; open = j }
      }
      i += 1
    }
    if (kw < 0) return (t, Map.empty)
    val opts = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var p = open + 1
    def skipWs(): Unit = while (p < t.length && t.charAt(p).isWhitespace) p += 1
    def atClose: Boolean = { skipWs(); p < t.length && t.charAt(p) == ')' }
    while (!atClose) {
      val k0 = p
      while (p < t.length && t.charAt(p) != '=' && t.charAt(p) != ',' && t.charAt(p) != ')') p += 1
      if (p >= t.length || t.charAt(p) != '=')
        fail(s"malformed OPTIONS entry '${t.substring(k0, math.min(p, t.length)).trim}' " +
          "(want key = value)")
      val key = t.substring(k0, p).trim.toLowerCase(Locale.ROOT)
      if (key.isEmpty) fail("malformed OPTIONS entry: empty key before '='")
      p += 1; skipWs()
      val value =
        if (p < t.length && t.charAt(p) == '\'') {
          val sb = new StringBuilder; p += 1; var closed = false
          while (p < t.length && !closed) {
            val c = t.charAt(p)
            if (c == '\'') {
              if (p + 1 < t.length && t.charAt(p + 1) == '\'') { sb += '\''; p += 2 }
              else { closed = true; p += 1 }
            } else { sb += c; p += 1 }
          }
          if (!closed) fail(s"unterminated quoted value for OPTIONS key '$key'")
          sb.toString
        } else {
          val v0 = p
          while (p < t.length && t.charAt(p) != ',' && t.charAt(p) != ')') p += 1
          val v = t.substring(v0, p).trim
          // a bare empty value would surface later as an unlabeled
          // NumberFormatException inside the command — fail here, with
          // the statement in the message (quoted '' stays legal)
          if (v.isEmpty)
            fail(s"malformed OPTIONS entry '$key=' (want key = value)")
          v
        }
      opts(key) = value
      skipWs()
      if (p < t.length && t.charAt(p) == ',') p += 1
      else if (p >= t.length || t.charAt(p) != ')')
        fail(s"expected ',' or ')' after the OPTIONS value for key '$key'")
    }
    val after = t.substring(p + 1).trim
    if (after.nonEmpty) fail(s"unexpected text after OPTIONS (…): '$after' " +
      "(OPTIONS must be the final clause)")
    (t.substring(0, kw).trim, opts.toMap)
  }

  /** Some(command) when the text is a graft statement; None delegates. */
  private[plans] def parseGraft(sqlText: String): Option[LogicalPlan] = {
    val t = sqlText.trim.stripSuffix(";").trim
    val up = t.toUpperCase(Locale.ROOT)
    val isGraft = Seq("CREATE GRAFT ", "APPEND GRAFT ", "UPSERT GRAFT ",
      "DELETE GRAFT ", "COMPACT GRAFT ").exists(up.startsWith)
    if (!isGraft) return None

    def fail(why: String): Nothing =
      throw new IllegalArgumentException(s"graft statement: $why\nstatement: $t")

    val (body, options) = splitOptions(t, fail)

    val createVec =
      (s"""(?i)^CREATE\\s+GRAFT\\s+INDEX\\s+(\\w+)\\s+AT\\s+'([^']+)'\\s+FROM\\s+($Ident)$$""").r
    val createSparse =
      (s"""(?i)^CREATE\\s+GRAFT\\s+SPARSE\\s+INDEX\\s+($Ident)\\s+AT\\s+'([^']+)'\\s+FROM\\s+($Ident)$$""").r
    val maintVec =
      (s"""(?i)^(APPEND|UPSERT|DELETE)\\s+GRAFT\\s+INDEX\\s+AT\\s+'([^']+)'\\s+FROM\\s+($Ident)$$""").r
    val maintSparse =
      (s"""(?i)^(APPEND|UPSERT|DELETE)\\s+GRAFT\\s+SPARSE\\s+INDEX\\s+($Ident)\\s+FROM\\s+($Ident)$$""").r
    val compactVec = """(?i)^COMPACT\s+GRAFT\s+INDEX\s+AT\s+'([^']+)'$""".r
    val compactSparse = (s"""(?i)^COMPACT\\s+GRAFT\\s+SPARSE\\s+INDEX\\s+($Ident)$$""").r

    val cmd = body match {
      case createVec(kind, path, src) =>
        val k = kind.toUpperCase(Locale.ROOT)
        if (!Kinds.contains(k))
          fail(s"unknown index kind '$kind' (one of ${Kinds.toSeq.sorted.mkString(", ")})")
        GraftIndexCommand("CREATE", sparse = false, kind = k,
          path = Some(path), table = None, source = Some(src), options = options)
      case createSparse(table, path, src) =>
        GraftIndexCommand("CREATE", sparse = true, kind = "SPARSE",
          path = Some(path), table = Some(table), source = Some(src), options = options)
      case maintVec(verb, path, src) =>
        GraftIndexCommand(verb.toUpperCase(Locale.ROOT), sparse = false, kind = "",
          path = Some(path), table = None, source = Some(src), options = options)
      case maintSparse(verb, table, src) =>
        GraftIndexCommand(verb.toUpperCase(Locale.ROOT), sparse = true, kind = "SPARSE",
          path = None, table = Some(table), source = Some(src), options = options)
      case compactVec(path) =>
        GraftIndexCommand("COMPACT", sparse = false, kind = "",
          path = Some(path), table = None, source = None, options = options)
      case compactSparse(table) =>
        GraftIndexCommand("COMPACT", sparse = true, kind = "SPARSE",
          path = None, table = Some(table), source = None, options = options)
      case _ => fail(
        "unrecognized shape. Grammar: CREATE GRAFT [SPARSE] INDEX … AT '<path>' FROM <table> " +
          "[OPTIONS (…)]; APPEND|UPSERT|DELETE GRAFT [SPARSE] INDEX … FROM <table>; " +
          "COMPACT GRAFT [SPARSE] INDEX …")
    }
    Some(cmd)
  }
}
