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

  // one-entry parse cache: crawl partitions are grouped by domain, so
  // consecutive rows overwhelmingly share one (multi-KB) robots file —
  // re-splitting it per row would be O(rows x file size). Expressions
  // evaluate single-threaded per task, so plain vars are safe.
  @transient private var lastRobots: String = null
  @transient private var lastGroups: Seq[RobotsAllowedExpr.Group] = null

  override protected def nullSafeEval(robots: Any, agent: Any, path: Any): Any = {
    val r = robots.asInstanceOf[UTF8String].toString
    if (lastGroups == null || !(r == lastRobots)) {
      lastRobots = r
      lastGroups = RobotsAllowedExpr.parse(r)
    }
    RobotsAllowedExpr.decide(lastGroups,
      agent.asInstanceOf[UTF8String].toString,
      path.asInstanceOf[UTF8String].toString)
  }

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
    * sequence, `$` (only meaningful at pattern end) anchors. An
    * UNANCHORED pattern matching a prefix of `path` is exactly a full
    * wildcard match of `pattern + "*"`, so both forms reduce to the
    * classic single-backtrack two-pointer walk — O(|pattern|·|path|)
    * worst case, NOT exponential (a hostile many-wildcard pattern in a
    * crawled robots.txt must not peg an executor). */
  private[graft] def matches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val core =
      if (anchored) pattern.substring(0, pattern.length - 1)
      else pattern + "*"
    var i = 0
    var j = 0
    var star = -1
    var mark = 0
    while (j < path.length) {
      if (i < core.length && core.charAt(i) == '*') {
        star = i; mark = j; i += 1
      } else if (i < core.length && core.charAt(i) == path.charAt(j)) {
        i += 1; j += 1
      } else if (star >= 0) {
        i = star + 1; mark += 1; j = mark
      } else return false
    }
    while (i < core.length && core.charAt(i) == '*') i += 1
    i == core.length
  }

  /** Match LENGTH for the longest-match rule: the pattern's literal
    * length (RFC: "most specific = longest octet length"). */
  private def specificity(pattern: String): Int = pattern.length

  def allowed(robots: String, agent: String, path: String): Boolean =
    decide(parse(robots), agent, path)

  private[graft] def decide(groups: Seq[Group], agent: String,
                            path: String): Boolean = {
    val product = agent.toLowerCase(java.util.Locale.ROOT)
    // group selection: the longest agent token substring-matching the
    // product token wins; ALL groups matching at that specificity
    // combine their rules (RFC 9309 §2.2.1 — wild files routinely
    // repeat a User-agent, and dropping the later group's Disallow
    // would let a blocked page into training data); '*' groups (also
    // combined) are the fallback.
    val named = groups.flatMap(g =>
      g.agents.filter(a => a != "*" && product.contains(a))
        .map(a => (a.length, g)))
    val rules: Seq[(Boolean, String)] =
      if (named.nonEmpty) {
        val bestLen = named.map(_._1).max
        named.collect { case (len, g) if len == bestLen => g }
          .distinct.flatMap(_.rules)
      } else {
        val stars = groups.filter(_.agents.contains("*"))
        if (stars.isEmpty) return true // no applicable group
        stars.flatMap(_.rules)
      }
    val hits = rules.filter { case (_, pat) => matches(pat, path) }
    if (hits.isEmpty) true
    else {
      val best = hits.map { case (allow, pat) => (specificity(pat), allow) }
      val maxLen = best.map(_._1).max
      // tie at the longest match: ALLOW wins
      best.exists { case (len, allow) => len == maxLen && allow }
    }
  }
}
