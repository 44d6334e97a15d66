package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class UrlOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def canon(urls: String*): Seq[Option[String]] = {
    import spark.implicits._
    urls.toDF("u").select(UrlOps.canonicalizeUrl(col("u")))
      .collect().map(r => Option(r.getString(0))).toSeq
  }

  test("scheme/host case, default ports, fragment") {
    assert(canon("HTTP://WWW.Example.COM/") == Seq(Some("http://www.example.com/")))
    assert(canon("https://A.B:443/x") == Seq(Some("https://a.b/x")))
    assert(canon("http://a.b:443/x") == Seq(Some("http://a.b:443/x"))) // non-default kept
    assert(canon("https://a.b:80/x") == Seq(Some("https://a.b:80/x")))
    assert(canon("http://a.b:8080/x#frag?notaquery") == Seq(Some("http://a.b:8080/x")))
    assert(canon("http://a.b") == Seq(Some("http://a.b/"))) // empty path → /
    assert(canon("http://a.b:/x") == Seq(Some("http://a.b/x"))) // empty port
  }

  test("dot segments: RFC 3986 removal incl. nesting, trailing, root clamp") {
    assert(canon("http://h/a/./b/../c") == Seq(Some("http://h/a/c")))
    assert(canon("http://h/a/b/../../c") == Seq(Some("http://h/c")))
    assert(canon("http://h/a/././b") == Seq(Some("http://h/a/b")))
    assert(canon("http://h/a/b/..") == Seq(Some("http://h/a/")))
    assert(canon("http://h/a/b/../..") == Seq(Some("http://h/")))
    assert(canon("http://h/../a") == Seq(Some("http://h/a"))) // clamp at root
    assert(canon("http://h/..") == Seq(Some("http://h/")))
    assert(canon("http://h//a///b") == Seq(Some("http://h/a/b"))) // slash collapse
    // deep nesting within the documented depth-8 bound (6 pops)
    assert(canon("http://h/1/2/3/4/5/6/../../../../../../z") ==
      Seq(Some("http://h/z")))
    // `..` is never itself the popped segment
    assert(canon("http://h/../../a") == Seq(Some("http://h/a")))
  }

  test("tracking params strip; order preserved; empty pairs dropped") {
    assert(canon("http://h/p?utm_source=x&id=1&fbclid=y&q=2") ==
      Seq(Some("http://h/p?id=1&q=2")))
    assert(canon("http://h/p?utm_campaign=a&gclid=b&ref=c") ==
      Seq(Some("http://h/p"))) // all stripped → no '?'
    assert(canon("http://h/p?b=2&a=1") == Seq(Some("http://h/p?b=2&a=1"))) // no resort
    assert(canon("http://h/p?a=1&&b=2") == Seq(Some("http://h/p?a=1&b=2")))
    assert(canon("http://h/p?ref=x&refresh=1") ==
      Seq(Some("http://h/p?refresh=1"))) // ref= strips, refresh= stays
    assert(canon("http://h/p?utm_source") == Seq(Some("http://h/p"))) // bare name
  }

  test("non-canonicalizable inputs → null") {
    assert(canon("ftp://h/x") == Seq(None)) // non-http scheme
    assert(canon("mailto:x@y.z") == Seq(None))
    assert(canon("/relative/path") == Seq(None))
    assert(canon("http:///pathonly") == Seq(None)) // empty host
    assert(canon("not a url at all") == Seq(None))
  }

  test("registered domain heuristic and host extraction") {
    import spark.implicits._
    val out = Seq("http://a.b.c.example.org:8080/x", "http://localhost/y")
      .toDF("u")
      .select(UrlOps.urlHost(col("u")).as("h"))
      .select(col("h"), UrlOps.registeredDomain(col("h")).as("d"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(out == Seq(("a.b.c.example.org", "example.org"),
      ("localhost", "localhost")))
  }

  test("hostRollup: outcome classes, dedup collapse, non-canonical rows excluded") {
    import spark.implicits._
    val rows = Seq(
      // two raw URLs, SAME canonical (tracking param + default port)
      ("http://A.example.com:80/p?utm_source=1", 200),
      ("http://a.example.com/p", 200),
      ("http://a.example.com/other", 301),
      ("http://b.example.com/x", 404),
      ("http://b.example.com/y", 503),
      ("ftp://c.example.com/skip", 200)) // not canonicalizable → excluded
      .toDF("url", "status")
    val out = UrlOps.hostRollup(rows, "url", "status")
      .collect().map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(out.size == 2)
    assert(out("a.example.com") == ((3L, 2L, 2L, 1L, 0L, 0L)))
    assert(out("b.example.com") == ((2L, 2L, 0L, 0L, 1L, 1L)))
  }

  test("robotsRules: group selection, shared UA lines, comments, empty Disallow") {
    import spark.implicits._
    val robots = Seq(
      // exact group shadows *: only /a should rule for graftbot
      ("h1", "User-agent: GraftBot\nDisallow: /a\nUser-agent: *\nDisallow: /b\n"),
      // consecutive UA lines share a group; graftbot inherits its rules
      ("h2", "User-agent: graftbot\nUser-agent: otherbot\nDisallow: /c\n"),
      // no exact group → * group; comments and crawl-delay ignored;
      // empty Disallow (allow-all idiom) contributes no rule
      ("h3", "# hi\nUser-agent: *\nCrawl-delay: 5\nDisallow: /d # inline\nDisallow:\n"),
      // only a foreign agent → nothing applies
      ("h4", "User-agent: randombot\nDisallow: /\n"))
      .toDF("host", "txt")
    val rules = UrlOps.robotsRules(robots, "host", "txt", "graftbot")
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).toSet
    assert(rules == Set(("h1", "/a", false), ("h2", "/c", false),
      ("h3", "/d", false)))
  }

  test("robotsGate: longest match wins, allow beats disallow on tie, no match → allowed") {
    import spark.implicits._
    val rules = Seq(
      ("h.test", "/private", false),
      ("h.test", "/private/public", true),
      ("h.test", "/dup", false),
      ("h.test", "/dup", true)) // equal length → allow wins
      .toDF("host", "rule_path", "is_allow")
    val frontier = Seq(
      (1L, "http://h.test/private/x"),
      (2L, "http://h.test/private/public/y"),
      (3L, "http://h.test/elsewhere"),
      (4L, "http://h.test/dup/z"),
      (5L, "http://other.test/anything"), // host with no rules at all
      (6L, "http://h.test")) // empty path → "/"
      .toDF("doc_id", "url")
    val out = UrlOps.robotsGate(frontier, "doc_id", "url", rules)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(4), Option(r.getString(5))))).toMap
    assert(out(1L) == ((false, Some("/private"))))
    assert(out(2L) == ((true, Some("/private/public"))))
    assert(out(3L) == ((true, None)))
    assert(out(4L) == ((true, Some("/dup"))))
    assert(out(5L) == ((true, None)))
    assert(out(6L) == ((true, None)))
    assert(out.size == 6)
  }

  test("plan shape: canonicalization is a narrow zero-shuffle codegen map") {
    import spark.implicits._
    val df = Seq("http://h/a").toDF("u")
      .select(UrlOps.canonicalizeUrl(col("u")))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(400))
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      plan.take(400))
  }
}
