package graft.segment

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Parsers of the reference's page-marker IR
  * (`\n====(80)\nPAGE N\n====(80)\n<text>`, policy_extract.py:212-214).
  * The reference re-parses this format with FOUR independent parsers
  * (P1-P4); we implement each with its distinct semantics.
  *
  * In the span-native engine pages are identified per span by the marker at
  * the head of the span text ([[markerPage]]); the flat-text parsers below
  * exist for ingesting reference-format documents and for fixture replay.
  */
object PageSegmenter {

  /** 80-char marker block, as written by the reference's sinks. */
  def renderMarker(page: Int): String = {
    val bar = "=" * 80
    s"\n$bar\nPAGE $page\n$bar\n"
  }

  // P1 regex cascade — policy_filter.py:54-59 (first matching pattern wins).
  val P1Patterns: Seq[String] = Seq(
    "={50,}\\s*\\nPAGE\\s+(\\d+)\\s*\\n={50,}",
    "={50,}\\s*\\nPAGE\\s+(\\d+)\\s*\\n",
    "\\nPAGE\\s+(\\d+)\\s*\\n",
    "={50,}\\s*\\nPage\\s+(\\d+)\\s*\\n={50,}")

  // P2 simultaneous multi-pattern set — combine_extractions.py:27-37
  // (case-insensitive; [Match N] Page X markers from the QC-head scripts).
  val P2Standard = "(?i)={50,}\\s*\\nPAGE\\s+(\\d+)\\s*\\n={50,}"
  val P2Match = "(?i)={50,}\\s*\\n\\[Match\\s+\\d+\\]\\s+Page\\s+(\\d+)\\s*\\n={50,}"
  val P2Fallback = "(?i)\\nPAGE\\s+(\\d+)\\s*\\n"

  /** Page number of a single span, from the marker at its head (null-safe;
    * returns None for unmarked spans such as tables/media).
    */
  private val HeadMarkerRe =
    java.util.regex.Pattern.compile("^\\s*={50,}\\s*\\n(?:PAGE|Page)\\s+(\\d+)\\s*\\n={50,}\\n?")

  val HeadMarkerPattern: String = HeadMarkerRe.pattern()

  def markerPage(text: String): Option[Int] = {
    if (text == null) return None
    val m = HeadMarkerRe.matcher(text)
    // lookingAt ≡ find for this ^-anchored pattern, but guarantees a single
    // anchored attempt instead of an O(n) sweep of doomed start positions
    if (m.lookingAt()) Some(m.group(1).toInt) else None
  }

  /** Span text with the head marker removed and whitespace-stripped — the
    * page "content" exactly as P2 yields it (content after marker, .strip()).
    */
  def stripMarker(text: String): String = {
    if (text == null) return null
    HeadMarkerRe.matcher(text).replaceFirst("").strip()
  }

  /** Single-pass head parse: (page, body). Page is -1 for unmarked spans.
    * Exactly [[markerPage]] + [[stripMarker]] in one regex scan — the
    * anchored pattern makes `replaceFirst` equal to dropping the match
    * prefix. This is the per-span hot path of the typed pipeline. */
  def parseHead(text: String): (Int, String) = {
    if (text == null) return (-1, null)
    val m = HeadMarkerRe.matcher(text)
    if (m.lookingAt()) (m.group(1).toInt, stripFrom(text, m.end()))
    else (-1, stripFrom(text, 0))
  }

  /** `substring(from).strip()` in a single copy: bounds are scanned first so
    * at most one string is allocated per span (and zero when nothing needs
    * stripping) — `substring().strip()` allocated twice, which showed up as
    * the allocation-bandwidth wall at 32 cores. Same whitespace predicate as
    * String.strip (Character.isWhitespace). */
  private def stripFrom(s: String, from: Int): String = {
    var a = from
    val n = s.length
    while (a < n && Character.isWhitespace(s.charAt(a))) a += 1
    var b = n
    while (b > a && Character.isWhitespace(s.charAt(b - 1))) b -= 1
    if (a == 0 && b == n) s else s.substring(a, b)
  }

  /** Catalyst twins (same pattern string → same java.util.regex semantics). */
  def markerPageCol(text: Column): Column = {
    val s = regexp_extract(text, HeadMarkerPattern, 1)
    when(s === "", lit(null).cast("int")).otherwise(s.cast("int"))
  }

  def stripMarkerCol(text: Column): Column =
    regexp_replace(
      regexp_replace(text, HeadMarkerPattern, ""),
      "^\\p{javaWhitespace}+|\\p{javaWhitespace}+$", "")

  // ------------------------------------------------------------------------
  // P1 — _calculate_page_boundaries (policy_filter.py:49-109).
  // Char intervals; duplicate page numbers keep the first start and extend
  // the end; overlaps repaired by clamping end to the next start.
  // ------------------------------------------------------------------------
  final case class Boundary(page: Int, start: Int, end: Int)

  def p1Boundaries(content: String): Seq[Boundary] = {
    if (content == null || content.isEmpty) return Seq(Boundary(1, 0, 0))
    var markers = Seq.empty[(Int, Int)] // (charStart, page)
    val it = P1Patterns.iterator
    while (markers.isEmpty && it.hasNext) {
      val m = java.util.regex.Pattern.compile(it.next()).matcher(content)
      val found = mutable.ArrayBuffer.empty[(Int, Int)]
      while (m.find()) found += ((m.start(), m.group(1).toInt))
      markers = found.toSeq
    }
    if (markers.isEmpty) {
      // bare "PAGE n" fallback then whole-doc-as-page-1
      val m = java.util.regex.Pattern.compile("PAGE\\s+(\\d+)").matcher(content)
      val found = mutable.ArrayBuffer.empty[(Int, Int)]
      while (m.find()) found += ((m.start(), m.group(1).toInt))
      markers = found.toSeq
      if (markers.isEmpty) return Seq(Boundary(1, 0, content.length))
    }
    // first occurrence keeps its start; later duplicates extend the end
    val byPos = markers.sortBy(_._1)
    val bounds = mutable.LinkedHashMap.empty[Int, (Int, Int)] // page -> (start,end)
    for (i <- byPos.indices) {
      val (start, page) = byPos(i)
      val end = if (i + 1 < byPos.length) byPos(i + 1)._1 else content.length
      bounds.get(page) match {
        case Some((s0, e0)) => bounds(page) = (s0, math.max(e0, end))
        case None           => bounds(page) = (start, end)
      }
    }
    // overlap repair: sorted by start, clamp end to next start
    val sorted = bounds.toSeq.map { case (p, (s, e)) => Boundary(p, s, e) }.sortBy(_.start)
    sorted.zipWithIndex.map { case (b, i) =>
      if (i + 1 < sorted.length && b.end > sorted(i + 1).start) b.copy(end = sorted(i + 1).start)
      else b
    }
  }

  // ------------------------------------------------------------------------
  // P2 — extract_pages_from_content (combine_extractions.py:13-64).
  // All marker types simultaneously; sort by position; FIRST occurrence of a
  // page number wins; content = after-marker to next marker, stripped.
  // ------------------------------------------------------------------------
  def p2ExtractPages(content: String): Seq[(Int, String)] = {
    if (content == null) return Seq.empty
    val markers = mutable.ArrayBuffer.empty[(Int, Int, Int)] // (start, end, page)
    for (pat <- Seq(P2Standard, P2Match)) {
      val m = java.util.regex.Pattern.compile(pat).matcher(content)
      while (m.find()) markers += ((m.start(), m.end(), m.group(1).toInt))
    }
    if (markers.isEmpty) {
      val m = java.util.regex.Pattern.compile(P2Fallback).matcher(content)
      while (m.find()) markers += ((m.start(), m.end(), m.group(1).toInt))
    }
    if (markers.isEmpty) return Seq((1, content))
    val sorted = markers.sortBy(_._1)
    val seen = mutable.Set.empty[Int]
    val pages = mutable.ArrayBuffer.empty[(Int, String)]
    for (i <- sorted.indices) {
      val (_, markerEnd, page) = sorted(i)
      if (!seen.contains(page)) {
        seen += page
        val end = if (i + 1 < sorted.length) sorted(i + 1)._1 else content.length
        pages += ((page, content.substring(markerEnd, end).strip()))
      }
    }
    pages.toSeq
  }

  // ------------------------------------------------------------------------
  // P3 — _split_policy_combo_into_pages (policy_additional_interests.py:65-90).
  // CR/LF normalized; strict multiline marker; KEEPS the marker inside the
  // chunk (so downstream evidence can cite the page); page-0 preamble chunk.
  // ------------------------------------------------------------------------
  private val P3Re = java.util.regex.Pattern.compile(
    "^={40,}\\s*\\nPAGE\\s+(\\d+)\\s*\\n={40,}\\s*$", java.util.regex.Pattern.MULTILINE)

  def p3SplitPages(content: String): Seq[(Int, String)] = {
    if (content == null) return Seq.empty
    val norm = content.replace("\r\n", "\n").replace("\r", "\n")
    val m = P3Re.matcher(norm)
    val markers = mutable.ArrayBuffer.empty[(Int, Int)] // (start, page)
    while (m.find()) markers += ((m.start(), m.group(1).toInt))
    if (markers.isEmpty) return Seq((0, norm))
    val out = mutable.ArrayBuffer.empty[(Int, String)]
    if (markers.head._1 > 0) out += ((0, norm.substring(0, markers.head._1)))
    for (i <- markers.indices) {
      val end = if (i + 1 < markers.length) markers(i + 1)._1 else norm.length
      // marker retained inside the chunk
      out += ((markers(i)._2, norm.substring(markers(i)._1, end)))
    }
    out.toSeq
  }

  // ------------------------------------------------------------------------
  // P4 — ACORD-140 property-section pruning (llm_pla.py:104-158).
  // If "PROPERTY SECTION" is present: keep page 1 (header) plus the first
  // later page containing PROPERTY SECTION and one of the section keywords.
  // ------------------------------------------------------------------------
  val P4SectionKeywords: Seq[String] = Seq("Building", "Business Income", "Equipment Breakdown")

  def p4PrunePropertySection(pages: Seq[(Int, String)]): Seq[(Int, String)] = {
    val hasSection = pages.exists(_._2.contains("PROPERTY SECTION"))
    if (!hasSection) return pages
    val header = pages.filter(_._1 == 1)
    val body = pages.find { case (p, t) =>
      p != 1 && t.contains("PROPERTY SECTION") && P4SectionKeywords.exists(t.contains)
    }
    header ++ body.toSeq
  }
}
