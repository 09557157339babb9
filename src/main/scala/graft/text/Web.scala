package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL hygiene for web-scale corpora: canonicalization + host/registrable-
  * domain extraction — the front of every per-domain pipeline stage
  * (domain caps, domain mixture weights, host-graph PageRank, crawl
  * frontier dedup). The reference pipeline keys several stages on a
  * pre-extracted source field; at corpus scale the keys have to be derived
  * from raw URLs, deterministically, inside the plan.
  *
  * Everything here is a pure Column projection — zero shuffles at any
  * corpus size, fully inside whole-stage codegen, and every regex stays in
  * the Java∩RE2 subset so an independent engine (the DuckDB oracle)
  * replays it byte-for-byte.
  */
object Web {

  /** Scheme of `url`, lowercased ("" when the value has no scheme). */
  def scheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Hostname of `url`: authority minus userinfo and port, lowercased,
    * trailing root-dot dropped. "" when the value is not a URL. */
  def host(url: Column): Column = {
    val h = lower(regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)", 1))
    regexp_replace(h, "\\.$", "")
  }

  /** Registrable domain (eTLD+1) of a lowercase hostname under the FULL
    * public-suffix-list algorithm — arbitrary-depth rules, wildcards
    * (`*.ck`), exceptions (`!city.kawasaki.jp`) — via the native
    * [[graft.sql.GraftRegDomain]] codegen expression over the bundled
    * rule file ([[Psl]]). Hosts with no more labels than their public
    * suffix (localhost, a bare `co.uk`) pass through unchanged. Requires
    * the `graft.sql.GraftExtensions` session extension (every entry
    * point of this project registers it). */
  def registrableDomain(hostCol: Column): Column =
    call_function("graft_regdomain", hostCol)

  /** Query parameters dropped by [[normalizeUrl]]: click/campaign trackers
    * that make byte-identical pages look distinct to exact dedup. */
  val TrackingParams: Seq[String] = Seq("gclid", "fbclid", "msclkid", "mc_eid")

  /** Canonical form of `url` for crawl-frontier and URL-level dedup:
    *
    *  - scheme and host lowercased, userinfo dropped;
    *  - default ports stripped (http:80, https:443), other ports kept;
    *  - fragment dropped (never reaches the server);
    *  - `utm_*` and [[TrackingParams]] query parameters dropped, the
    *    surviving parameters SORTED (param order is transport noise);
    *  - empty path becomes "/".
    *
    * Non-URL values (no `scheme://`) pass through trimmed — garbage in the
    * url column must stay visible, not become empty strings. */
  def normalizeUrl(url: Column): Column = {
    val u = trim(url)
    val sch = scheme(u)
    val h = host(u)
    val port = regexp_extract(u,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?[^/?#:]*:([0-9]+)", 1)
    val keepPort = port =!= "" &&
      !(sch === "http" && port === "80") && !(sch === "https" && port === "443")
    val rest = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    val path = regexp_extract(rest, "^([^?]*)", 1)
    val query = regexp_extract(rest, "^[^?]*\\?(.*)$", 1)
    val kept = array_sort(filter(split(query, "&"), p =>
      p =!= "" && !startswith(lower(p), lit("utm_")) &&
        TrackingParams.map(t => substring_index(p, "=", 1) =!= lit(t))
          .reduce(_ && _)))
    val qs = when(size(kept) > 0, concat(lit("?"), concat_ws("&", kept)))
      .otherwise(lit(""))
    when(sch === "", u).otherwise(concat(
      sch, lit("://"), h,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      when(path === "", lit("/")).otherwise(path),
      qs))
  }

  /** Absolute http(s) anchor targets of an HTML string, in document order.
    * Double-quoted `href` attributes only (the corpus normal form);
    * relative links and fragments are crawl-internal, not graph edges. */
  def hrefs(html: Column): Column =
    regexp_extract_all(html,
      lit("(?i)<a[^>]*\\shref=\"(https?://[^\"]*)\""), lit(1))

  // ------------------------------------------------- head metadata ---------

  /** `<title>` text of an HTML string, trimmed ("" when absent). Regexes
    * here and below stay in the Java∩RE2 subset (no lookaround) and assume
    * the corpus normal form: double-quoted attributes, text content with no
    * nested markup — the same contract [[hrefs]] documents. */
  def htmlTitle(html: Column): Column =
    trim(regexp_extract(html, "(?i)<title[^>]*>([^<]*)</title>", 1))

  /** `content` of `<meta name="..." content="...">`, tolerating either
    * attribute order ("" when absent). */
  def metaContent(html: Column, name: String): Column = {
    val fwd = regexp_extract(html,
      s"""(?i)<meta\\s[^>]*name="$name"[^>]*\\scontent="([^"]*)"""", 1)
    val rev = regexp_extract(html,
      s"""(?i)<meta\\s[^>]*content="([^"]*)"[^>]*\\sname="$name"""", 1)
    when(fwd =!= "", fwd).otherwise(rev)
  }

  /** `content` of an OpenGraph `<meta property="og:...">` tag, either
    * attribute order ("" when absent). */
  def ogContent(html: Column, property: String): Column = {
    val fwd = regexp_extract(html,
      s"""(?i)<meta\\s[^>]*property="$property"[^>]*\\scontent="([^"]*)"""", 1)
    val rev = regexp_extract(html,
      s"""(?i)<meta\\s[^>]*content="([^"]*)"[^>]*\\sproperty="$property"""", 1)
    when(fwd =!= "", fwd).otherwise(rev)
  }

  /** `href` of `<link rel="canonical">`, either attribute order. */
  def canonicalHref(html: Column): Column = {
    val fwd = regexp_extract(html,
      """(?i)<link\s[^>]*rel="canonical"[^>]*\shref="([^"]*)"""", 1)
    val rev = regexp_extract(html,
      """(?i)<link\s[^>]*href="([^"]*)"[^>]*\srel="canonical"""", 1)
    when(fwd =!= "", fwd).otherwise(rev)
  }

  /** `lang` attribute of the `<html>` tag, lowercased ("" when absent). */
  def htmlLang(html: Column): Column =
    lower(regexp_extract(html, """(?i)<html\s[^>]*lang="([^"]*)"""", 1))

  /** One-projection head-metadata battery: the five fields a crawl index
    * keeps per page (title, description, og:title, canonical URL — already
    * normalized — and declared language). Pure Column battery: zero
    * shuffles, whole-stage codegen, at any corpus size. */
  def htmlMetaDf(docs: org.apache.spark.sql.DataFrame, idCol: String,
      htmlCol: String): org.apache.spark.sql.DataFrame = {
    val h = col(htmlCol)
    docs.select(col(idCol),
      htmlTitle(h).as("title"),
      metaContent(h, "description").as("description"),
      ogContent(h, "og:title").as("og_title"),
      normalizeUrl(canonicalHref(h)).as("canonical_url"),
      htmlLang(h).as("lang_attr"))
  }

  // --------------------------------------------------- publish date --------

  /** Publish date of a page as "yyyy-mm-dd" ("" when undatable), by the
    * standard precedence: `article:published_time` meta (either attribute
    * order), then `<time datetime=...>`, then a /yyyy/mm(/dd)?/ URL path
    * segment (day defaults to 01). Only the date prefix of a timestamp is
    * kept; pure Column battery, zero shuffles. */
  def publishDate(html: Column, url: Column): Column = {
    val d = "[0-9]{4}-[0-9]{2}-[0-9]{2}"
    val meta = regexp_extract(
      ogContent(html, "article:published_time"), s"^($d)", 1)
    val time = regexp_extract(html,
      s"""(?i)<time\\s[^>]*datetime="($d)""", 1)
    // ONE pattern, three group extracts — separate patterns could bind
    // year and day to different /yyyy/mm(/dd)/ occurrences in the path
    val urlDate = "^https?://[^?#]*/([12][0-9]{3})/([01][0-9])/(?:([0-3][0-9])/)?"
    val y = regexp_extract(url, urlDate, 1)
    val m = regexp_extract(url, urlDate, 2)
    val day = regexp_extract(url, urlDate, 3)
    when(meta =!= "", meta)
      .when(time =!= "", time)
      .when(y =!= "" && m =!= "",
        concat(y, lit("-"), m, lit("-"),
          when(day =!= "", day).otherwise(lit("01"))))
      .otherwise(lit(""))
  }

  // ------------------------------------------------------ soft 404 ---------

  /** Error phrases whose presence in a TITLE marks a soft 404 outright. */
  val Soft404TitleRe =
    "(?i)404|page not found|not available|access denied|server error"

  /** Body phrases counted toward the soft-404 body threshold. */
  val Soft404BodyPhrases: Seq[String] = Seq(
    "page not found", "does not exist", "has been removed", "try again",
    "go back to the homepage", "error occurred")

  /** Soft-404 verdict: pages that return 200 but carry error content — the
    * classic crawl-corpus pollutant. True when the title matches
    * [[Soft404TitleRe]], or when ≥2 distinct [[Soft404BodyPhrases]] appear
    * in the body (case-insensitive). Pure Column predicate, zero shuffles. */
  def isSoft404(title: Column, body: Column): Column = {
    val titleHit = title.rlike(Soft404TitleRe)
    val bodyHits = Soft404BodyPhrases
      .map(p => when(contains(lower(body), lit(p)), 1).otherwise(0))
      .reduce(_ + _)
    titleHit || bodyHits >= 2
  }

  // ------------------------------------------------------- sitemaps --------

  /** Sitemap `<url>` entries as (loc, lastmod) structs in document order
    * (lastmod "" when absent). Same normal-form contract as [[anchors]]:
    * whole `<url>` blocks extracted first, fields pulled per block, so a
    * lastmod can never pair with a neighboring entry's loc. */
  def sitemapEntries(xml: Column): Column =
    transform(
      regexp_extract_all(xml, lit("(?is)<url>.*?</url>"), lit(0)),
      b => struct(
        trim(regexp_extract(b, "(?is)<loc>([^<]*)</loc>", 1)).as("loc"),
        trim(regexp_extract(b, "(?is)<lastmod>([^<]*)</lastmod>", 1))
          .as("lastmod")))

  /** Flattened sitemap relation: one row per entry with the loc
    * canonicalized by [[normalizeUrl]] — the crawl-frontier feed. Narrow
    * explode; zero shuffles. */
  def sitemapUrlsDf(sitemaps: org.apache.spark.sql.DataFrame,
      xmlCol: String, extraCols: Seq[String] = Nil)
      : org.apache.spark.sql.DataFrame = {
    sitemaps
      .select(extraCols.map(col) :+
        explode(sitemapEntries(col(xmlCol))).as("__e"): _*)
      .select(extraCols.map(col) :+
        normalizeUrl(col("__e.loc")).as("url") :+
        col("__e.lastmod").as("lastmod"): _*)
      .filter(col("url") =!= "")
  }

  // ---------------------------------------------------- anchor text --------

  /** Absolute-target anchors of an HTML string as (href, anchor-text)
    * structs, document order, text trimmed. Same normal-form contract as
    * [[hrefs]]; anchors with nested markup inside the text are skipped (the
    * `[^<]*` body), empty-text anchors kept (callers filter). */
  def anchors(html: Column): Column =
    transform(
      regexp_extract_all(html,
        lit("(?i)<a[^>]*\\shref=\"https?://[^\"]*\"[^>]*>[^<]*</a>"), lit(0)),
      t => struct(
        regexp_extract(t, "(?i)href=\"(https?://[^\"]*)\"", 1).as("href"),
        trim(regexp_extract(t, "(?i)>([^<]*)</a>$", 1)).as("anchor")))

  /** Anchor-text aggregation — the classic web-graph signal: what OTHER
    * pages call a URL. Targets are canonicalized with [[normalizeUrl]] so
    * transport-noise variants pool their evidence; empty anchor texts
    * ("[img]"-style link bodies) are dropped.
    *
    * Output per target: `n_anchors` (total inbound anchors),
    * `n_distinct_texts`, and `top_anchors` — the `k` most frequent texts
    * (ties lexicographic), pipe-joined in rank order.
    *
    * Plan: narrow explode → ONE partial-agg groupBy on (dst, text) — hub
    * texts combine map-side — then a per-dst window over the already-
    * aggregated counts (rows per dst = distinct texts, bounded in practice;
    * never raw anchors) and a final per-dst agg. No collect, no all-pairs;
    * every stage keys on dst, so skew follows link popularity and is
    * AQE-splittable. */
  def anchorTextsDf(docs: org.apache.spark.sql.DataFrame, htmlCol: String,
      k: Int = 3): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = docs
      .select(explode(anchors(col(htmlCol))).as("a"))
      .select(normalizeUrl(col("a.href")).as("dst"), col("a.anchor").as("anchor"))
      .filter(col("anchor") =!= "")
    val counted = pairs.groupBy("dst", "anchor").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("dst").orderBy(col("n").desc, col("anchor").asc)
    counted.withColumn("__rn", row_number().over(w))
      .groupBy("dst").agg(
        sum("n").as("n_anchors"),
        count(lit(1)).cast("long").as("n_distinct_texts"),
        concat_ws("|", transform(
          array_sort(collect_list(when(col("__rn") <= k,
            struct(col("__rn"), col("anchor"))))),
          s => s.getField("anchor"))).as("top_anchors"))
  }

  /** The host-graph construction step: documents (own URL + HTML) → deduped
    * weighted edges (src_domain, dst_domain, n_links) over registrable
    * domains — the input relation for domain centrality (PageRank) and
    * link-spam features. Self-edges (intra-domain navigation) and
    * non-absolute targets are dropped.
    *
    * Plan: narrow regex explode per doc, then ONE partial-agg groupBy on
    * the (src, dst) pair — link multiplicity combines map-side, so hub
    * pages with 10⁴ anchors never shuffle raw anchor rows. */
  def linkEdges(docs: org.apache.spark.sql.DataFrame, urlCol: String,
      htmlCol: String): org.apache.spark.sql.DataFrame = {
    docs
      .select(registrableDomain(host(col(urlCol))).as("src_domain"),
        explode(hrefs(col(htmlCol))).as("href"))
      .select(col("src_domain"),
        registrableDomain(host(col("href"))).as("dst_domain"))
      .filter(col("dst_domain") =!= "" && col("src_domain") =!= col("dst_domain"))
      .groupBy("src_domain", "dst_domain")
      .agg(count(lit(1)).as("n_links"))
  }

  /** Language codes recognized as URL path segments by [[urlBitextPairs]]. */
  val UrlLangCodes: Seq[String] = Seq("en", "fr", "de", "es", "it", "pt",
    "nl", "ru", "zh", "ja", "ko")

  /** URL-pattern bitext document alignment (the ParaCrawl/WikiMatrix
    * first-stage candidate rule, Bañón et al. 2020): pages whose URLs are
    * identical except for a language path segment ("/en/" vs "/fr/") are
    * translation candidates. The URL splits on '/', every language-code
    * segment maps to '*', and documents sharing the wildcarded key with
    * DIFFERENT language codes pair up. This is the cheap structural
    * complement to [[graft.sim.Similarity.bitextMine]]'s embedding margin:
    * run this first, mine embeddings only where URL structure is silent.
    *
    * Output: (id_a, id_b, lang_a, lang_b, url_key) with id_a < id_b.
    *
    * Shape at scale: one narrow key projection + ONE equi-join on the
    * wildcarded key. A key's group is naturally bounded by the site's
    * language count; `maxGroup` drops degenerate keys (a CMS that serves
    * one template under thousands of language-less URLs) the same way
    * `maxDf`/`maxBucket` cap the LSH paths. */
  def urlBitextPairs(df: org.apache.spark.sql.DataFrame, idCol: String,
      urlCol: String, maxGroup: Int = 32): org.apache.spark.sql.DataFrame = {
    require(maxGroup >= 2, s"maxGroup must be >= 2: $maxGroup")
    val langLits = UrlLangCodes.map(c => lit(c): Column)
    val segs = split(col(urlCol), "/")
    val keyed = df.select(col(idCol), col(urlCol))
      .withColumn("__key", concat_ws("/",
        transform(segs, s => when(s.isin(UrlLangCodes: _*), lit("*"))
          .otherwise(s))))
      // ANSI mode: element_at on an empty array throws — guard on size
      .withColumn("__langs", filter(segs, s => s.isin(UrlLangCodes: _*)))
      .withColumn("__lang", when(size(col("__langs")) > 0,
        element_at(col("__langs"), 1)))
      .filter(col("__lang").isNotNull)
      .drop("__langs")
    val hot = keyed.groupBy("__key")
      .agg(count(lit(1)).as("__n")).filter(col("__n") > maxGroup)
      .select("__key")
    val ok = keyed.join(hot, Seq("__key"), "left_anti")
    val a = ok.select(col("__key"), col(idCol).as("id_a"),
      col("__lang").as("lang_a"))
    val b = ok.select(col("__key"), col(idCol).as("id_b"),
      col("__lang").as("lang_b"))
    a.join(b, Seq("__key"))
      .filter(col("lang_a") < col("lang_b") ||
        (col("lang_a") === col("lang_b") && col("id_a") < col("id_b")))
      .select(col("id_a"), col("id_b"), col("lang_a"), col("lang_b"),
        col("__key").as("url_key"))
  }

  /** Pure twin of [[urlBitextPairs]] (no cap). */
  def urlBitextPairsPure(rows: Seq[(Long, String)])
      : Seq[(Long, Long, String, String, String)] = {
    val codes = UrlLangCodes.toSet
    val keyed = rows.flatMap { case (id, url) =>
      val segs = url.split("/", -1).toSeq
      val key = segs.map(s => if (codes(s)) "*" else s).mkString("/")
      segs.find(codes).map(l => (key, id, l))
    }
    for {
      (ka, ia, la) <- keyed
      (kb, ib, lb) <- keyed
      if ka == kb && (la < lb || (la == lb && ia < ib))
    } yield (ia, ib, la, lb, ka)
  }

  /** Heritrix-style SURT (Sort-friendly URI Reordering Transform) — the
    * web-archiving canonical key: scheme and userinfo dropped, host labels
    * reversed and comma-joined inside "(...,)", fragment stripped, path
    * and query kept verbatim ("/" when empty). Sorting SURTs clusters a
    * domain's whole subtree contiguously — the layout key for crawl
    * stores and CDX indexes (ports are dropped: a simplification vs
    * Heritrix, documented). URLs without a scheme pass through. */
  def surt(url: Column): Column = {
    val h = host(url)
    val rest = regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    when(h === "", url).otherwise(concat(lit("("),
      concat_ws(",", reverse(split(h, "\\."))), lit(",)"),
      when(rest === "", lit("/")).otherwise(rest)))
  }
}
