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
  private val OptsRe = """(?i)\s+OPTIONS\s*\(([^)]*)\)\s*$""".r

  /** Some(command) when the text is a graft statement; None delegates. */
  private[plans] def parseGraft(sqlText: String): Option[LogicalPlan] = {
    val t = sqlText.trim.stripSuffix(";").trim
    val up = t.toUpperCase(Locale.ROOT)
    val isGraft = Seq("CREATE GRAFT ", "APPEND GRAFT ", "UPSERT GRAFT ",
      "DELETE GRAFT ", "COMPACT GRAFT ").exists(up.startsWith)
    if (!isGraft) return None

    def fail(why: String): Nothing =
      throw new IllegalArgumentException(s"graft statement: $why\nstatement: $t")

    val (body, options) = OptsRe.findFirstMatchIn(t) match {
      case Some(m) =>
        val opts = m.group(1).split(",").iterator.map(_.trim).filter(_.nonEmpty).map { kv =>
          kv.split("=") match {
            case Array(k, v) => k.trim.toLowerCase(Locale.ROOT) -> v.trim.stripPrefix("'").stripSuffix("'")
            case _ => fail(s"malformed OPTIONS entry '$kv' (want key = value)")
          }
        }.toMap
        (t.substring(0, m.start).trim, opts)
      case None => (t, Map.empty[String, String])
    }

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
