package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class WebSpec extends SparkTestBase {
  import spark.implicits._

  private def norm(urls: String*): Seq[String] =
    urls.toDF("u").select(Web.normalizeUrl(col("u"))).as[String].collect().toSeq

  test("normalizeUrl: scheme/host case, default ports, fragment, tracking params") {
    assert(norm(
      "HTTPS://WWW.Example.COM:443/Path/X?b=2&utm_source=nl&a=1#frag",
      "http://example.com:80",
      "http://example.com:8080/x",
      "https://user:pw@Example.org/a/b?gclid=zzz",
      "  http://example.com/x?fbclid=1&z=9&y=8  ",
      "http://example.com/?",
      "not a url") == Seq(
      "https://www.example.com/Path/X?a=1&b=2", // host folded, params sorted, utm_+frag gone, path case KEPT
      "http://example.com/",                    // default port stripped, empty path → /
      "http://example.com:8080/x",              // non-default port kept
      "https://example.org/a/b",                // userinfo dropped, tracker-only query gone
      "http://example.com/x?y=8&z=9",           // trimmed, fbclid dropped, rest sorted
      "http://example.com/",                    // bare ? → no query
      "not a url"))                             // non-URL passes through
  }

  test("normalizeUrl is idempotent and dedups transport-noise variants") {
    val variants = Seq(
      "http://News.Site.com/article?id=7&utm_medium=rss",
      "http://news.site.com:80/article?utm_campaign=x&id=7#top",
      "HTTP://news.site.com/article?id=7")
    val once = norm(variants: _*)
    assert(once.toSet == Set("http://news.site.com/article?id=7"))
    assert(norm(once: _*) == once) // fixpoint
  }

  test("host + registrableDomain: PSL two-label suffixes, subdomains, edge shapes") {
    val rows = Seq(
      "https://a.b.news.co.uk/x", "http://deep.sub.example.com/",
      "https://example.com", "http://Example.COM.", "ftp://one",
      "https://u:p@api.shop.com.au:8443/v1", "https://alice.github.io/repo")
    val got = rows.toDF("u").select(
      Web.host(col("u")).as("h"),
      Web.registrableDomain(Web.host(col("u"))).as("d"))
      .as[(String, String)].collect().toSeq
    assert(got == Seq(
      ("a.b.news.co.uk", "news.co.uk"),
      ("deep.sub.example.com", "example.com"),
      ("example.com", "example.com"),
      ("example.com", "example.com"), // root dot + case folded
      ("one", "one"),                 // single label passes through
      ("api.shop.com.au", "shop.com.au"),
      ("alice.github.io", "alice.github.io")))
  }

  test("linkEdges: absolute hrefs only, self-edges dropped, multiplicity counted") {
    val docs = Seq(
      ("http://a.com/1",
       """<p><a href="https://B.com/x">b</a> <a class="z" href="https://b.com/y#f">b2</a>
         |<a href="/rel">rel</a> <a href="#frag">frag</a> <a href="https://a.com/self">self</a>
         |<a href="http://c.co.uk/p?q=1">c</a></p>""".stripMargin),
      ("https://sub.b.com/2", """<a href="https://a.com/back">a</a>""")
    ).toDF("url", "html")
    val got = Web.linkEdges(docs, "url", "html")
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(
      ("a.com", "b.com", 2L),     // multiplicity, host case folded, fragment irrelevant
      ("a.com", "c.co.uk", 1L),   // two-label suffix domain
      ("b.com", "a.com", 1L)))    // src from own URL's registrable domain
  }

  test("htmlMetaDf: title/description/og/canonical/lang, both attribute orders") {
    val page =
      """<html lang="EN-us"><head><title> My Page </title>
        |<meta name="description" content="first desc">
        |<meta content="og title here" property="og:title">
        |<link href="HTTP://Example.com:80/a?utm_x=1" rel="canonical">
        |</head><body><title>not this one? no: first wins</title></body></html>""".stripMargin
    val bare = "<html><body>plain</body></html>"
    val got = Web.htmlMetaDf(Seq((1L, page), (2L, bare)).toDF("id", "html"), "id", "html")
      .as[(Long, String, String, String, String, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "My Page", "first desc", "og title here", "http://example.com/a", "en-us"),
      (2L, "", "", "", "", "")))
  }

  test("anchors + anchorTextsDf: normalization pools variants, top-k by count then text") {
    val docs = Seq(
      """<a href="http://T.com/x?utm_s=1">Widget</a> <a href="http://t.com/x">Widget</a>
        |<a class="b" href="http://t.com/x#f">Gadget</a> <a href="http://t.com/x"> </a>
        |<a href="http://t.com/x">Apparatus</a> <a href="http://t.com/x">Gadget</a>
        |<a href="http://other.com/">Solo</a> <a href="/rel">rel</a>""".stripMargin)
      .toDF("html")
    val got = Web.anchorTextsDf(docs, "html", k = 2)
      .as[(String, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      // 5 non-empty anchors pooled across URL variants; top-2 = Gadget(2), Widget(2)
      // beats Apparatus(1); Gadget before Widget only on count tie → lexicographic
      ("http://other.com/", 1L, 1L, "Solo"),
      ("http://t.com/x", 5L, 3L, "Gadget|Widget")))
  }

  test("soft 404: title phrases, body phrase threshold, clean page passes") {
    val rows = Seq(
      ("404 Not Found", "whatever body", true),             // title: 404
      ("Oops — Page Not Found", "short", true),             // title phrase, case folded
      ("Welcome", "The page does not exist. Please try again later.", true), // 2 body phrases
      ("Welcome", "This page does not exist here.", false), // only 1 body phrase
      ("Product catalog", "Buy our fine products today.", false))
    val got = rows.map(r => (r._1, r._2)).toDF("title", "body")
      .select(Web.isSoft404(col("title"), col("body"))).as[Boolean].collect().toSeq
    assert(got == rows.map(_._3))
  }

  test("publish date: meta beats time beats URL path; day defaults; undatable empty") {
    val rows = Seq(
      // meta wins even when a time tag disagrees; timestamp truncated
      ("""<meta content="2026-03-04T10:00:00Z" property="article:published_time">
         |<time datetime="2020-01-01">x</time>""".stripMargin,
        "http://a.com/2019/05/p", "2026-03-04"),
      ("""<time class="c" datetime="2025-12-31T08:00">x</time>""",
        "http://a.com/p", "2025-12-31"),
      ("<p>no metadata</p>", "http://a.com/2024/07/15/slug", "2024-07-15"),
      ("<p>no metadata</p>", "http://a.com/blog/2023/11/slug", "2023-11-01"),
      ("<p>no metadata</p>", "http://a.com/plain/path", ""))
    val got = rows.map(r => (r._1, r._2)).toDF("html", "url")
      .select(Web.publishDate(col("html"), col("url"))).as[String].collect().toSeq
    assert(got == rows.map(_._3))
  }

  test("sitemap entries: loc/lastmod pairing, missing lastmod, canonicalized flatten") {
    val xml =
      """<?xml version="1.0"?><urlset>
        |<url><loc> HTTP://Ex.com:80/a?utm_x=1 </loc><lastmod>2026-01-02</lastmod></url>
        |<url><loc>https://ex.org/b</loc></url>
        |<url><lastmod>2026-03-04</lastmod><loc>https://ex.org/c</loc></url>
        |</urlset>""".stripMargin
    val got = Web.sitemapUrlsDf(Seq((7L, xml)).toDF("site_id", "xml"),
      "xml", extraCols = Seq("site_id"))
      .as[(Long, String, String)].collect().toSeq
    assert(got == Seq(
      (7L, "http://ex.com/a", "2026-01-02"),
      (7L, "https://ex.org/b", ""),
      (7L, "https://ex.org/c", "2026-03-04"))) // reversed field order still pairs
  }

  test("column pipeline is narrow: no Exchange in the plan") {
    val df = (1L to 100L).toDF("id")
      .withColumn("u", concat(lit("http://h"), col("id"), lit(".example.com/p?utm_a=1&k=v")))
      .select(Web.normalizeUrl(col("u")), Web.registrableDomain(Web.host(col("u"))))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("surt: reversed-host archive key") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = Seq(
      "https://u:p@WWW.Example.CO.UK:443/a/b?x=1#frag",
      "http://site.org",
      "not a url").toDF("url")
      .select(Web.surt(col("url")).as("s")).as[String].collect().toSeq
    // scheme/userinfo/port/fragment gone, host reversed, query kept
    assert(rows(0) == "(uk,co,example,www,)/a/b?x=1")
    // empty path becomes "/"
    assert(rows(1) == "(org,site,)/")
    // non-URLs pass through
    assert(rows(2) == "not a url")
    // sorting SURTs clusters a domain subtree contiguously
    val keys = Seq("https://b.example.com/z", "https://a.other.net/a",
      "https://example.com/a", "https://c.example.com/a")
      .toDF("url").select(Web.surt(col("url")).as("s"))
      .as[String].collect().sorted.toSeq
    assert(keys.take(3).forall(_.startsWith("(com,example")))
  }
}
