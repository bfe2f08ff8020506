package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt evaluation (round 19 — the crawl-compliance gate every
  * crawl-derived corpus must apply: a page fetched against its
  * robots.txt should never reach training data). RFC 9309 (the Robots
  * Exclusion Protocol):
  *
  *  - groups: consecutive `User-agent:` lines share one rule block;
  *    group selection is the LONGEST user-agent token that is a
  *    case-insensitive substring match of the product token, with the
  *    `*` group as fallback; no applicable group → allowed
  *  - rules: `Allow:` / `Disallow:` path patterns, `*` matching any
  *    char sequence and `$` anchoring the end; otherwise PREFIX match
  *  - decision: the LONGEST matching pattern wins; on a literal-length
  *    tie ALLOW wins; no rule matches (or an empty Disallow) → allowed
  *  - comments (`#`), blank lines, unknown fields (Crawl-delay,
  *    Sitemap) and field-name case all tolerated — wild robots.txt is
  *    hand-written
  *
  * `robots_allowed(robots, agent, path)` is a native expression on the
  * Column and SQL surfaces. */
case class RobotsAllowedExpr(first: Expression, second: Expression,
                             third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "robots_allowed"

  override protected def nullSafeEval(robots: Any, agent: Any, path: Any): Any =
    RobotsAllowedExpr.allowed(
      robots.asInstanceOf[UTF8String].toString,
      agent.asInstanceOf[UTF8String].toString,
      path.asInstanceOf[UTF8String].toString)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object RobotsAllowedExpr {

  def column(robots: Column, agent: Column, path: Column): Column =
    ColumnBridge.column(RobotsAllowedExpr(ColumnBridge.expression(robots),
      ColumnBridge.expression(agent), ColumnBridge.expression(path)))

  private[graft] final case class Group(agents: Seq[String],
                                        rules: Seq[(Boolean, String)])

  /** Parse groups: a run of User-agent lines opens a group; rule lines
    * attach to the open group; a User-agent AFTER rules starts a new
    * group (RFC 9309 §2.2.1). */
  private[graft] def parse(robots: String): Seq[Group] = {
    val groups = scala.collection.mutable.Buffer.empty[Group]
    var agents = scala.collection.mutable.Buffer.empty[String]
    var rules = scala.collection.mutable.Buffer.empty[(Boolean, String)]
    var inRules = false
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents.toSeq, rules.toSeq)
      agents = scala.collection.mutable.Buffer.empty
      rules = scala.collection.mutable.Buffer.empty
      inRules = false
    }
    robots.split("\n", -1).foreach { raw =>
      val noComment = raw.indexOf('#') match {
        case -1 => raw
        case at => raw.substring(0, at)
      }
      val line = noComment.trim
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val field = line.substring(0, colon).trim
            .toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(colon + 1).trim
          field match {
            case "user-agent" =>
              if (inRules) flush()
              agents += value.toLowerCase(java.util.Locale.ROOT)
            case "allow" | "disallow" =>
              inRules = true
              // an empty Disallow means "everything allowed" — it can
              // never match, so dropping it is equivalent; an empty
              // Allow likewise
              if (value.nonEmpty && agents.nonEmpty)
                rules += ((field == "allow", value))
            case _ => () // Crawl-delay / Sitemap / unknown: tolerated
          }
        }
        // lines without ':' are tolerated noise (wild robots.txt)
      }
    }
    flush()
    groups.toSeq
  }

  /** RFC 9309 §2.2.3 pattern match: prefix semantics, `*` spans any
    * sequence, `$` (only meaningful at pattern end) anchors. */
  private[graft] def matches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    // greedy backtracking over '*' segments
    def seg(pi: Int, si: Int): Boolean = {
      var i = pi
      var j = si
      while (i < p.length) {
        if (p.charAt(i) == '*') {
          var k = path.length
          while (k >= j) {
            if (seg(i + 1, k)) return true
            k -= 1
          }
          return false
        }
        if (j >= path.length || path.charAt(j) != p.charAt(i)) return false
        i += 1; j += 1
      }
      !anchored || j == path.length
    }
    seg(0, 0)
  }

  /** Match LENGTH for the longest-match rule: the pattern's literal
    * length (RFC: "most specific = longest octet length"). */
  private def specificity(pattern: String): Int = pattern.length

  def allowed(robots: String, agent: String, path: String): Boolean = {
    val groups = parse(robots)
    val product = agent.toLowerCase(java.util.Locale.ROOT)
    // group selection: longest agent token substring-matching the
    // product token; '*' is the fallback
    val named = groups.flatMap(g =>
      g.agents.filter(a => a != "*" && product.contains(a))
        .map(a => (a.length, g)))
    val selected =
      if (named.nonEmpty) Some(named.maxBy(_._1)._2)
      else groups.find(_.agents.contains("*"))
    selected match {
      case None => true // no applicable group
      case Some(g) =>
        val hits = g.rules.filter { case (_, pat) => matches(pat, path) }
        if (hits.isEmpty) true
        else {
          val best = hits.map { case (allow, pat) => (specificity(pat), allow) }
          val maxLen = best.map(_._1).max
          // tie at the longest match: ALLOW wins
          best.exists { case (len, allow) => len == maxLen && allow }
        }
    }
  }
}
