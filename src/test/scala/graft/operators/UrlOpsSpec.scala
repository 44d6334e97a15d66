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

  test("sitemapEntries: urlset fields, entity decode, trim, nulls, order") {
    import spark.implicits._
    val xml =
      """<?xml version="1.0"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<url>
        |  <loc>
        |    http://a.test/p?x=1&amp;y=&lt;2&gt;
        |  </loc>
        |  <lastmod>2026-01-02</lastmod>
        |  <changefreq>daily</changefreq>
        |  <priority>0.8</priority>
        |</url>
        |<url><loc>http://a.test/q</loc><priority>high</priority></url>
        |<url><loc>http://a.test/r</loc></url>
        |</urlset>""".stripMargin
    val out = UrlOps.sitemapEntries(Seq(("a.test", xml)).toDF("host", "xml"),
      "host", "xml").orderBy("entry_pos").collect()
    assert(out.length == 3)
    assert(out(0).getString(1) == "urlset")
    assert(out(0).getString(3) == "http://a.test/p?x=1&y=<2>")
    assert(out(0).getString(4) == "2026-01-02")
    assert(out(0).getString(5) == "daily")
    assert(out(0).getDouble(6) == 0.8)
    assert(out(1).getString(3) == "http://a.test/q")
    assert(out(1).isNullAt(4) && out(1).isNullAt(5))
    assert(out(1).isNullAt(6)) // unparseable priority → null
    assert(out(2).getString(3) == "http://a.test/r")
  }

  test("sitemapEntries: sitemapindex dispatch; non-sitemap bodies drop") {
    import spark.implicits._
    val ix = """<sitemapindex xmlns="x"><sitemap>
      |<loc>http://a.test/sm1.xml</loc><lastmod>2026-02-03</lastmod>
      |</sitemap><sitemap><loc>http://a.test/sm2.xml</loc></sitemap>
      |</sitemapindex>""".stripMargin
    val df = Seq(("a.test", ix), ("b.test", "<html>not a sitemap</html>"))
      .toDF("host", "xml")
    val out = UrlOps.sitemapEntries(df, "host", "xml")
      .orderBy("entry_pos").collect()
    assert(out.length == 2)
    assert(out.forall(_.getString(1) == "sitemapindex"))
    assert(out(0).getString(3) == "http://a.test/sm1.xml")
    assert(out(0).getString(4) == "2026-02-03")
    assert(out(1).getString(3) == "http://a.test/sm2.xml")
    assert(out(1).isNullAt(4))
  }

  test("robotsCrawlDelay: group selection, max-of-parseable, default fallbacks") {
    import spark.implicits._
    val robots = Seq(
      // exact group (delay 3) shadows * (delay 9)
      ("h1", "User-agent: GraftBot\nCrawl-delay: 3\nUser-agent: *\nCrawl-delay: 9\n"),
      // * group applies; two parseable values → max
      ("h2", "User-agent: *\nCrawl-delay: 0.5\nCrawl-delay: 2.5\n"),
      // unparseable value → default
      ("h3", "User-agent: *\nCrawl-delay: fast\n"),
      // no crawl-delay at all → default
      ("h4", "User-agent: *\nDisallow: /x\n"),
      // delay only in a non-applicable group → default
      ("h5", "User-agent: otherbot\nCrawl-delay: 7\n"))
      .toDF("host", "txt")
    val out = UrlOps.robotsCrawlDelay(robots, "host", "txt", "graftbot",
      defaultDelaySec = 1.5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("h1" -> 3.0, "h2" -> 2.5, "h3" -> 1.5,
      "h4" -> 1.5, "h5" -> 1.5))
  }

  test("crawlSchedule: per-host priority order, eta arithmetic, default delay") {
    import spark.implicits._
    val delays = Seq(("a.test", 2.0)).toDF("host", "crawl_delay_sec")
    val frontier = Seq(
      (1L, "http://a.test/x", 5.0),
      (2L, "http://a.test/y", 9.0),
      (3L, "http://a.test/z", 5.0), // priority tie → id ASC
      (4L, "http://b.test/w", 1.0)) // host not in delays → default
      .toDF("id", "url", "prio")
    val out = UrlOps.crawlSchedule(frontier, "id", "url", "prio", delays,
      defaultDelaySec = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getDouble(4)))).toMap
    assert(out(2L) == ((1L, 0.0))) // highest priority first
    assert(out(1L) == ((2L, 2.0)))
    assert(out(3L) == ((3L, 4.0)))
    assert(out(4L) == ((1L, 0.0))) // alone on its host
  }

  test("resolveRedirects: chains, cap, loops, self-redirect, external target") {
    import spark.implicits._
    def u(i: Int) = s"http://t/$i"
    val fetches = Seq(
      // chain 3 → 2 → 1 → 0 (terminal)
      (u(0), 200, None), (u(1), 301, Some(u(0))),
      (u(2), 301, Some(u(1))), (u(3), 302, Some(u(2))),
      // 2-cycle
      (u(10), 301, Some(u(11))), (u(11), 301, Some(u(10))),
      // self-redirect
      (u(20), 301, Some(u(20))),
      // redirect to an unfetched URL → terminal there
      (u(30), 307, Some("http://elsewhere/e")),
      // 3xx with no Location → terminal
      (u(40), 301, None))
      .toDF("url", "status", "location")
    val out = UrlOps.resolveRedirects(fetches, "url", "status", "location",
      maxHops = 2)
      .collect().map(r => r.getString(0) ->
        ((Option(r.getString(1)), Option(r.get(2)).map(_.asInstanceOf[Long]),
          r.getBoolean(3)))).toMap
    assert(out(u(0)) == ((Some(u(0)), Some(0L), true)))
    assert(out(u(1)) == ((Some(u(0)), Some(1L), true)))
    assert(out(u(2)) == ((Some(u(0)), Some(2L), true)))
    assert(out(u(3)) == ((None, None, false))) // 3 hops > maxHops 2
    assert(out(u(10)) == ((None, None, false))) // loop
    assert(out(u(11)) == ((None, None, false)))
    assert(out(u(20)) == ((None, None, false))) // self-loop
    assert(out(u(30)) == ((Some("http://elsewhere/e"), Some(1L), true)))
    assert(out(u(40)) == ((Some(u(40)), Some(0L), true)))
    assert(out.size == 9)
  }

  test("resolveRedirects: exact-cap chain resolves; duplicate fetch rows collapse") {
    import spark.implicits._
    def u(i: Int) = s"http://t/$i"
    val fetches = Seq(
      (u(0), 200, None), (u(1), 301, Some(u(0))), (u(2), 301, Some(u(1))),
      // duplicate rows for u(2): one 200 (no redirect), one 301 — ANY
      // redirect row makes it a redirect, min picks the target
      (u(2), 200, None))
      .toDF("url", "status", "location")
    val out = UrlOps.resolveRedirects(fetches, "url", "status", "location",
      maxHops = 2)
      .collect().map(r => r.getString(0) ->
        ((Option(r.getString(1)), r.getBoolean(3)))).toMap
    assert(out.size == 3) // duplicates collapsed
    assert(out(u(2)) == ((Some(u(0)), true))) // hops 2 == cap → resolved
  }

  test("extractLinks: every resolution rule; document-order positions") {
    import spark.implicits._
    val pages = Seq((1L,
      "http://Ex.COM:8080/a/b/page",
      """<p><a href="http://X.org/abs">1</a>""" +
        """<a class="z" href="//cdn.net/p">2</a>""" +
        """<a href="/root/r?utm_source=t&k=1">3</a>""" +
        """<a href="../up">4</a>""" +
        """<a href="sub/s">5</a>""" +
        """<a href="#frag">6</a>""" +
        """<a href="mailto:a@b.c">7</a>""" +
        """<a href="javascript:void(0)">8</a>"""))
      .toDF("id", "url", "html")
    val out = UrlOps.extractLinks(pages, "id", "url", "html")
      .orderBy("link_pos")
      .collect().map(r => (r.getLong(2), r.getString(3),
        Option(r.getString(4))))
    assert(out.toSeq == Seq(
      (0L, "http://X.org/abs", Some("http://x.org/abs")),
      (1L, "//cdn.net/p", Some("http://cdn.net/p")),
      (2L, "/root/r?utm_source=t&k=1",
        Some("http://ex.com:8080/root/r?k=1")),
      (3L, "../up", Some("http://ex.com:8080/a/up")),
      (4L, "sub/s", Some("http://ex.com:8080/a/b/sub/s")),
      (5L, "#frag", None),
      (6L, "mailto:a@b.c", None),
      (7L, "javascript:void(0)", None)))
  }

  test("extractLinks: &amp; in hrefs entity-decodes before resolution") {
    import spark.implicits._
    // valid HTML MUST escape '&' in attribute values
    val pages = Seq((1L, "http://h.io/p",
      """<a href="/s?a=1&amp;utm_source=x&amp;b=2">t</a>""" +
        """<a href="/q?x=&lt;y&gt;">u</a>"""))
      .toDF("id", "url", "html")
    val got = UrlOps.extractLinks(pages, "id", "url", "html")
      .orderBy("link_pos")
      .collect().map(r => (r.getString(3), r.getString(4)))
    // decoded: utm param stripped by its REAL name, params resolve
    assert(got(0) == ("/s?a=1&utm_source=x&b=2", "http://h.io/s?a=1&b=2"))
    assert(got(1)._1 == "/q?x=<y>")
    // the anchors variant decodes identically (alignment contract)
    val withA = UrlOps.extractLinksWithAnchors(pages, "id", "url", "html")
      .orderBy("link_pos").collect().map(r => (r.getString(3), r.getString(4)))
    assert(withA.toSeq == got.toSeq)
  }

  test("canonicalizeUrl: zero-padded ports normalize with plain ones") {
    import spark.implicits._
    val got = Seq("http://ex.com:0080/a", "http://ex.com:80/a",
      "http://ex.com/a", "https://ex.com:0443/b", "http://ex.com:008080/c")
      .toDF("u").select(UrlOps.canonicalizeUrl(col("u")))
      .collect().map(_.getString(0)).toSeq
    assert(got(0) == "http://ex.com/a" && got(1) == "http://ex.com/a" &&
      got(2) == "http://ex.com/a")
    assert(got(3) == "https://ex.com/b")
    assert(got(4) == "http://ex.com:8080/c")
  }

  test("refetchPlan: zero observations default to monthly, not hourly") {
    import spark.implicits._
    val log = Seq(("http://h.io/new", "HTTP/1.1 200 OK\n", 0L, 0L))
      .toDF("url", "headers", "nc", "no")
    val r = UrlOps.refetchPlan(log, "url", "headers", "nc", "no").collect()(0)
    assert(r.getAs[String]("refetch_class") == "monthly")
    assert(r.isNullAt(r.fieldIndex("change_rate")))
  }

  test("extractLinks: tag-name anchoring and query-only refs") {
    import spark.implicits._
    val pages = Seq((1L,
      "http://h.io/a/b.html?old=1",
      // <area>/<abbr>/<applet> must NOT match (names merely start with
      // 'a'); the real <a> rows keep unshifted link_pos
      """<area shape="rect" href="/map">m</area>""" +
        """<abbr href="/nope">x</abbr>""" +
        """<applet code="c" href="/applet">j</applet>""" +
        """<a href="?new=2">q</a>""" + // RFC 3986 §5.3: same path, new query
        """<a data-k href="next.html">n</a>"""))
      .toDF("id", "url", "html")
    val out = UrlOps.extractLinks(pages, "id", "url", "html")
      .orderBy("link_pos")
      .collect().map(r => (r.getLong(2), r.getString(3), r.getString(4)))
    assert(out.toSeq == Seq(
      (0L, "?new=2", "http://h.io/a/b.html?new=2"),
      (1L, "next.html", "http://h.io/a/next.html")))
  }

  test("extractLinks: query-only ref against an empty page path resolves at root") {
    import spark.implicits._
    val pages = Seq((1L, "http://h.io", """<a href="?q=1">q</a>"""))
      .toDF("id", "url", "html")
    val out = UrlOps.extractLinks(pages, "id", "url", "html")
      .collect().map(_.getString(4)).toSeq
    assert(out == Seq("http://h.io/?q=1"))
  }

  test("extractLinks: empty-path page, https proto-relative, no links") {
    import spark.implicits._
    val pages = Seq(
      (1L, "https://h.io", """<a href="rel">r</a><a href="//c.d/e">p</a>"""),
      (2L, "http://h.io/x", "<p>no anchors</p>"),
      (3L, "http://h.io/x", """<a href="">empty</a>"""))
      .toDF("id", "url", "html")
    val out = UrlOps.extractLinks(pages, "id", "url", "html")
      .collect().map(r => (r.getLong(0), r.getLong(2),
        Option(r.getString(4)))).toSet
    // relative against an empty page path resolves at root
    assert(out == Set(
      (1L, 0L, Some("https://h.io/rel")),
      (1L, 1L, Some("https://c.d/e")),
      (3L, 0L, None)))
  }

  test("extractLinksWithAnchors: text captured, truncation at child tag, alignment") {
    import spark.implicits._
    val pages = Seq((1L, "http://h.io/d/p",
      """<a href="/one">first link</a>""" +
        """<a href="/two"><b>bold</b> tail</a>""" + // truncates at <b>
        """<a href="/three"></a>""" + // empty anchor text
        """<area href="/map">m</area>""" + // tag-name guard holds
        """<a class="k" href="rel">rel text</a>"""))
      .toDF("id", "url", "html")
    val out = UrlOps.extractLinksWithAnchors(pages, "id", "url", "html")
      .orderBy("link_pos")
      .collect().map(r => (r.getLong(2), r.getString(3),
        Option(r.getString(4)), r.getString(5)))
    assert(out.toSeq == Seq(
      (0L, "/one", Some("http://h.io/one"), "first link"),
      (1L, "/two", Some("http://h.io/two"), ""),
      (2L, "/three", Some("http://h.io/three"), ""),
      (3L, "rel", Some("http://h.io/d/rel"), "rel text")))
  }

  test("extractLinksWithAnchors: quoted '>' after href; unclosed tag keeps link_pos aligned") {
    import spark.implicits._
    val pages = Seq((1L, "http://h.io/d/p",
      // '>' inside a quoted attribute AFTER href must not close the tag
      """<a href="/x" title="a>b">text</a>""" +
        // unclosed <a followed by another tag: the greedy attr-run
        // crosses into the next tag and takes ITS href — the documented
        // regex-subset behavior extractLinks has always had; what
        // matters is both extractors see the SAME rows (alignment)
        """<a href="/y" data-k=1 <a href="/z">w</a>""" +
        // unclosed <a at end of input: row kept, anchor ""
        """<a href="/tail" data-k=1"""))
      .toDF("id", "url", "html")
    val withA = UrlOps.extractLinksWithAnchors(pages, "id", "url", "html")
      .orderBy("link_pos")
      .collect().map(r => (r.getLong(2), r.getString(3), r.getString(5)))
    assert(withA.toSeq == Seq(
      (0L, "/x", "text"),
      (1L, "/z", "w"),
      (2L, "/tail", "")))
    // the href-only extractor sees the same hrefs at the same positions
    val plain = UrlOps.extractLinks(pages, "id", "url", "html")
      .orderBy("link_pos")
      .collect().map(r => (r.getLong(2), r.getString(3)))
    assert(plain.toSeq == withA.map(t => (t._1, t._2)).toSeq)
  }

  test("anchorSummary: per-host totals, modal anchor with alphabetic tie-break") {
    import spark.implicits._
    val pages = Seq(
      (1L, "http://s1.io/p",
        """<a href="http://t.io/a">Docs</a>""" +
          """<a href="http://t.io/b">Docs</a>""" +
          """<a href="http://t.io/c">API</a>""" +
          """<a href="http://u.io/x">beta</a>""" +
          """<a href="#f">drop</a>"""),
      (2L, "http://s2.io/q",
        """<a href="http://t.io/d">API</a>""" +
          """<a href="http://u.io/y">alpha</a>"""))
      .toDF("id", "url", "html")
    val got = UrlOps.anchorSummary(
      UrlOps.extractLinksWithAnchors(pages, "id", "url", "html"),
      "target", "anchor")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    // t.io: Docs×2, API×2 → tie broken alphabetically to "API";
    // u.io: alpha×1, beta×1 → "alpha"; fragment link contributes nothing
    assert(got == Set(
      ("t.io", 4L, 2L, "API"),
      ("u.io", 2L, 2L, "alpha")))
  }

  test("anchorSummary: blank anchors count as links, never win top_anchor") {
    import spark.implicits._
    // markup-wrapped link text extracts as "" (text stops at '<') —
    // the dominant real-world shape for styled links
    val pages = Seq((1L, "http://s1.io/p",
      """<a href="http://t.io/a"><span>x</span></a>""" +
        """<a href="http://t.io/b"><b>y</b></a>""" +
        """<a href="http://t.io/c"><img src="z"></a>""" +
        """<a href="http://t.io/d">Docs</a>""" +
        // u.io gets ONLY blank anchors: census must yield NULL, not ""
        """<a href="http://u.io/x"><em>w</em></a>"""))
      .toDF("id", "url", "html")
    val got = UrlOps.anchorSummary(
      UrlOps.extractLinksWithAnchors(pages, "id", "url", "html"),
      "target", "anchor")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.getString(3)))).toSet
    // t.io: 4 links, but ""×3 is excluded from the anchor census and
    // loses the modal race to the lone "Docs"
    assert(got == Set(
      ("t.io", 4L, 1L, Some("Docs")),
      ("u.io", 1L, 0L, None)))
  }

  test("hostGraph: distinct-target counts and registered-domain split") {
    import spark.implicits._
    val pages = Seq(
      (1L, "http://a.sub.example.com/p",
        """<a href="http://b.example.com/x">i</a>""" +
          """<a href="http://b.example.com/x">dup</a>""" +
          """<a href="http://b.example.com/y?utm_source=s">y</a>""" +
          """<a href="http://other.net/z">e</a>""" +
          """<a href="#s">drop</a>"""))
      .toDF("id", "url", "html")
    val g = UrlOps.hostGraph(
      UrlOps.extractLinks(pages, "id", "url", "html"), "url", "target")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSet
    assert(g == Set(
      ("a.sub.example.com", "b.example.com", 3L, 2L, true),
      ("a.sub.example.com", "other.net", 1L, 1L, false)))
  }

  test("snapshotDiff: all four classes; churnRollup accounting") {
    import spark.implicits._
    val prev = Seq(("http://h.x/a", "h1"), ("http://h.x/b", "h2"),
      ("http://h.x/c", "h3")).toDF("url", "h")
    val cur = Seq(("http://h.x/a", "h1"), ("http://h.x/b", "h2x"),
      ("http://h.x/d", "h4")).toDF("url", "h")
    val diff = UrlOps.snapshotDiff(prev, cur, "url", "h")
    val m = diff.collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(m == Map("http://h.x/a" -> "unchanged",
      "http://h.x/b" -> "changed", "http://h.x/c" -> "removed",
      "http://h.x/d" -> "added"))
    val roll = UrlOps.churnRollup(diff).collect()
    assert(roll.length == 1)
    val r = roll(0)
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == (("h.x", 1L, 1L, 1L, 1L, 4L)))
    assert(r.getDouble(6) == 75.0)
  }

  test("refetchPlan: validator precedence, weak etags, header case, thresholds") {
    import spark.implicits._
    val rows = Seq(
      // both validators -> If-None-Match (etag) wins
      ("u1", "HTTP/1.1 200 OK\nETag: \"e1\"\nLast-Modified: LM1\n", 1L, 2L),
      // weak etag, lowercase field name
      ("u2", "etag: W/\"w2\"\nX: y\n", 1L, 5L),
      // last-modified only, mixed case
      ("u3", "LAST-MODIFIED: LM3\n", 1L, 20L),
      // no validator
      ("u4", "Content-Type: text/html\n", 0L, 7L),
      // value whitespace-trimmed at the end
      ("u5", "ETag: \"e5\"   \n", 1L, 21L))
      .toDF("url", "headers", "nch", "nobs")
    val out = UrlOps.refetchPlan(rows, "url", "headers", "nch", "nobs")
      .collect().map(r => r.getString(0) -> ((r.getString(1),
        Option(r.getString(2)), r.getBoolean(3), r.getBoolean(4),
        r.getString(6)))).toMap
    assert(out("u1") == (("etag", Some("\"e1\""), false, true, "hourly")))
    assert(out("u2") == (("etag", Some("W/\"w2\""), true, true, "daily")))
    assert(out("u3") == (("last-modified", Some("LM3"), false, true,
      "weekly")))
    assert(out("u4") == (("none", None, false, false, "monthly")))
    // 21 obs, 1 change: 1*20 < 21 -> monthly (boundary just misses)
    assert(out("u5") == (("etag", Some("\"e5\""), false, true, "monthly")))
  }

  test("domainHealth: integer boundary, minFetches guard, gate pass-through") {
    import spark.implicits._
    val log = Seq(
      // a.test: 2/4 = exactly 50% -> blocked (>= boundary)
      ("http://x.a.test/1", 500), ("http://y.a.test/2", 503),
      ("http://x.a.test/3", 200), ("http://x.a.test/4", 404),
      // b.test: 1/4 = 25% -> not blocked
      ("http://b.test/1", 500), ("http://b.test/2", 200),
      ("http://b.test/3", 200), ("http://b.test/4", 200),
      // c.test: 1/1 = 100% but below minFetches -> not blocked
      ("http://c.test/1", 500))
      .toDF("url", "status")
    val health = UrlOps.domainHealth(log, "url", "status",
      minFetches = 2, maxServerErrPct = 50)
    val m = health.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap
    assert(m == Map("a.test" -> ((4L, 2L, true)),
      "b.test" -> ((4L, 1L, false)), "c.test" -> ((1L, 1L, false))))
    val frontier = Seq((1L, "http://z.a.test/n"), (2L, "http://b.test/n"),
      (3L, "http://unseen.test/n")).toDF("id", "url")
    val gated = UrlOps.domainHealthGate(frontier, "id", "url", health)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    // unseen domain passes (no evidence is not a block)
    assert(gated == Map(1L -> true, 2L -> false, 3L -> false))
  }
}
