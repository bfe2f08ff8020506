package graft

import graft.functions.UrlCanonicalExpr
import org.scalatest.funsuite.AnyFunSuite

/** UrlCanonicalExpr: the RFC 3986 §6 rule set case by case, idempotence,
  * the SQL surface, and the fail-loud contract. */
class UrlCanonicalSpec extends AnyFunSuite with SparkSpec {

  private def c(u: String): String = UrlCanonicalExpr.canonicalize(u)

  test("scheme/host case, default ports, fragments, empty path") {
    assert(c("HTTP://WWW.Example.COM") == "http://www.example.com/")
    assert(c("http://a.com:80/x") == "http://a.com/x")
    assert(c("https://a.com:443/x") == "https://a.com/x")
    assert(c("http://a.com:8080/x") == "http://a.com:8080/x")
    assert(c("http://a.com/x#frag") == "http://a.com/x")
    assert(c("http://a.com#frag") == "http://a.com/")
    assert(c("http://u:p@A.com/x") == "http://u:p@a.com/x")
  }

  test("percent normalization: unreserved decode, reserved kept uppercase") {
    assert(c("http://a.com/%7euser") == "http://a.com/~user")
    assert(c("http://a.com/%41%42c") == "http://a.com/ABc")
    assert(c("http://a.com/a%2fb") == "http://a.com/a%2Fb") // '/' stays escaped
    assert(c("http://a.com/p?x=%3a&y=%2D") == "http://a.com/p?x=%3A&y=-")
  }

  test("dot segments per §5.2.4") {
    assert(c("http://a.com/a/./b/../c") == "http://a.com/a/c")
    assert(c("http://a.com/a/b/..") == "http://a.com/a/")
    assert(c("http://a.com/a/b/.") == "http://a.com/a/b/")
    assert(c("http://a.com/../x") == "http://a.com/x")
    assert(c("http://a.com/a//b") == "http://a.com/a//b") // empties kept
    assert(c("http://a.com/%2e/x") == "http://a.com/x") // decoded dot segment
  }

  test("idempotence: canonical output is a fixed point") {
    val urls = Seq("HTTP://A.com:80/a/./b/../c%7e?q=%3a#f",
      "https://U@B.NET:8443/%41//x/.", "http://c.org")
    urls.foreach { u =>
      val once = c(u)
      assert(c(once) == once, u)
    }
  }

  test("SQL surface: url_canonical registered; fail-loud corners") {
    graft.GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT url_canonical('HTTP://X.COM:80/a/../b%7e#f') AS u")
      .head().getString(0)
    assert(got == "http://x.com/b~")
    assert(intercept[Exception](c("ftp://a.com/x"))
      .getMessage.contains("ftp"))
    assert(intercept[Exception](c("http://a.com/%zz"))
      .getMessage.contains("percent-escape"))
    assert(intercept[Exception](c("nocolon"))
      .getMessage.contains("scheme"))
    assert(intercept[Exception](c("http://:80/x"))
      .getMessage.contains("empty host"))
    assert(intercept[Exception](c("http://a.com:8a/x"))
      .getMessage.contains("port"))
    // non-ASCII digits are not a port (Unicode isDigit would pass them)
    assert(intercept[Exception](c("http://a.com:٢٢/x"))
      .getMessage.contains("port"))
  }
}
