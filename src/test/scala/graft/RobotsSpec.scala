package graft

import graft.functions.RobotsAllowedExpr.{allowed, matches}
import org.scalatest.funsuite.AnyFunSuite

/** RobotsAllowedExpr: the RFC 9309 rule set case by case — group
  * selection, longest-match with allow tiebreak, wildcards and
  * anchors, parse leniency — plus the SQL surface. */
class RobotsSpec extends AnyFunSuite with SparkSpec {

  private val robots =
    """User-agent: graftbot
      |Disallow: /
      |
      |User-agent: *
      |Disallow: /private
      |Allow: /private/pub
      |Disallow: /cgi*bin
      |Disallow: /end$
      |Crawl-delay: 3
      |""".stripMargin

  test("group selection: named beats *, longest agent token wins") {
    assert(!allowed(robots, "GraftBot/1.0", "/anything"))
    assert(allowed(robots, "crawler9000", "/anything"))
    // longest-agent: a more specific token outranks a shorter one
    val two = "User-agent: bot\nDisallow: /a\nUser-agent: botmax\nDisallow: /b\n"
    assert(!allowed(two, "BotMax/2", "/b") && allowed(two, "BotMax/2", "/a"))
    assert(!allowed(two, "somebot", "/a") && allowed(two, "somebot", "/b"))
    // no applicable group at all → allowed
    assert(allowed("User-agent: other\nDisallow: /\n", "crawler", "/x"))
  }

  test("longest match decides; allow wins ties; wildcards and anchors") {
    assert(!allowed(robots, "c", "/private/x"))
    assert(allowed(robots, "c", "/private/pub/y")) // longer Allow wins
    assert(!allowed(robots, "c", "/cgi-data/bin")) // '*' spans
    assert(!allowed(robots, "c", "/cgibin"))       // '*' spans empty
    assert(!allowed(robots, "c", "/end"))          // '$' anchors
    assert(allowed(robots, "c", "/end2"))          // anchor rejects longer
    assert(allowed(robots, "c", "/other"))
    // allow/disallow literal-length tie → allow
    val tie = "User-agent: *\nDisallow: /p\nAllow: /q\n" +
      "Disallow: /dir\nAllow: /dir\n"
    assert(allowed(tie, "c", "/dir/x"))
    // pattern matcher directly
    assert(matches("/a*c", "/abc") && matches("/a*c", "/ac") &&
      !matches("/a*c$", "/acx") && matches("/a*c$", "/azzc"))
    assert(matches("/*x*y", "/1x2y3")) // prefix semantics after wildcards
  }

  test("duplicate groups COMBINE (RFC 9309 §2.2.1); wildcard stays linear") {
    // two '*' groups: rules from BOTH must apply
    val dup = "User-agent: *\nDisallow: /a\n\nUser-agent: *\nDisallow: /b\n"
    assert(!allowed(dup, "anybot", "/a/x") && !allowed(dup, "anybot", "/b/x"))
    assert(allowed(dup, "anybot", "/c"))
    // two groups naming the same agent combine too
    val dup2 = "User-agent: graftbot\nDisallow: /a\n" +
      "User-agent: graftbot\nDisallow: /b\n"
    assert(!allowed(dup2, "graftbot", "/b/x"))
    // a hostile many-wildcard pattern must answer fast (linear matcher,
    // not exponential backtracking): sub-second or the build hangs here
    val hostile = "User-agent: *\nDisallow: /" + ("*a" * 12) + "b\n"
    val longPath = "/" + ("a" * 300)
    val t0 = System.nanoTime()
    assert(allowed(hostile, "c", longPath)) // no 'b' terminator → no match
    assert((System.nanoTime() - t0) / 1e9 < 2.0, "wildcard matcher not linear")
  }

  test("parse leniency: comments, case, unknown fields, empty disallow") {
    val messy = "# top\nUSER-AGENT: *\ndisallow: /a # trailing\n" +
      "Sitemap: https://x/s.xml\nnonsense line\nDISALLOW:\nAllow: /a/b\n"
    assert(!allowed(messy, "c", "/a/z"))
    assert(allowed(messy, "c", "/a/b/z"))
    assert(allowed(messy, "c", "/elsewhere")) // empty Disallow = no rule
  }

  test("SQL surface: robots_allowed registered") {
    graft.GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT robots_allowed('User-agent: *\nDisallow: /x\n', 'c', '/x/1') AS a")
      .head().getBoolean(0)
    assert(!got)
  }
}
