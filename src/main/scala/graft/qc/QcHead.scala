package graft.qc

import graft.classify.Filters
import graft.ranges.Islands
import graft.segment.PageSegmenter
import graft.segment.PageSegmenter.Boundary

/** EP3 — the QC-head sectioning pipeline (traveler/qc_head.py): P1 char
  * boundaries → F1 dollar pages → R1 merge(buffer=1) → R7 fan-out over
  * coverage dimensions → R5 robust page-range slice → R8 section assembly
  * with `[Match i] Page p` banners → A5 keyword validation.
  *
  * All steps are per-document and run inside `mapPartitions` in the
  * distributed pipeline; no cross-document state.
  */
object QcHead {

  val Coverages: Seq[String] = Seq("GL", "PROPERTY") // qc_head.py:334

  final case class HeadingMatch(coverage: String, rangeStart: Int, rangeEnd: Int,
      charPosition: Int, pageNumber: Int)

  final case class Section(coverage: String, content: String, startPage: Int,
      endPage: Int, pageCount: Int, warnings: Seq[String])

  /** Per-document boundary index, computed ONCE per doc: the round-3 shape
    * re-sorted the boundary list and rebuilt the page map inside every
    * `extractPagesAfterHeading` call — O(M·B log B) per document across the
    * per-match loop of [[assembleSection]] (round-3 VERDICT item 4). */
  final class BoundaryIndex(boundaries: Seq[Boundary]) {
    val sorted: IndexedSeq[Boundary] = boundaries.sortBy(_.start).toIndexedSeq
    val byPage: Map[Int, Boundary] = boundaries.map(b => b.page -> b).toMap
    /** Page numbers in ascending order (for the pages-after-start scan). */
    val pagesAsc: IndexedSeq[Int] = byPage.keys.toIndexedSeq.sorted

    /** P5 — page containing a char position: last boundary whose start <=
      * pos. Reference: traveler/qc_head.py:140-161. */
    def pageAt(pos: Int): Int = {
      var page = if (sorted.nonEmpty) sorted.head.page else 1
      var i = 0
      while (i < sorted.length && pos >= sorted(i).start) {
        page = sorted(i).page; i += 1
      }
      page
    }
  }

  /** P5 — page containing a char position: last boundary whose start <= pos
    * (scan of sorted intervals). Reference: traveler/qc_head.py:140-161. */
  def pageFromCharPosition(boundaries: Seq[Boundary], pos: Int): Int =
    new BoundaryIndex(boundaries).pageAt(pos)

  /** P5 — 1-based line number of a char position. qc_head.py:163-165. */
  def lineNumber(text: String, pos: Int): Int =
    text.substring(0, math.min(pos, text.length)).count(_ == '\n') + 1

  /** R5 — extract `numPages` available pages starting at the page containing
    * `headingCharPos`, tolerating missing page numbers, clamping the end,
    * and reporting warnings. Returns (text, section-metadata) or None on the
    * reference's error statuses. Reference: traveler/qc_head.py:167-223. */
  def extractPagesAfterHeading(text: String, boundaries: Seq[Boundary],
      headingCharPos: Int, numPages: Int): Option[(String, Int, Int, Int, Seq[String])] =
    extractPagesAfterHeading(text, new BoundaryIndex(boundaries), headingCharPos, numPages)

  /** Index-based fast path: the per-document pipeline builds the
    * [[BoundaryIndex]] once and calls this per match. */
  def extractPagesAfterHeading(text: String, idx: BoundaryIndex,
      headingCharPos: Int, numPages: Int): Option[(String, Int, Int, Int, Seq[String])] = {
    val byPage = idx.byPage
    val startPage = idx.pageAt(headingCharPos)
    if (!byPage.contains(startPage)) return None
    val startChar = byPage(startPage).start
    val available = idx.pagesAsc.dropWhile(_ < startPage)
    val warnings = scala.collection.mutable.ArrayBuffer.empty[String]
    val (endPage, endChar0) =
      if (available.length >= numPages) {
        val ep = available(numPages - 1)
        (ep, byPage(ep).end)
      } else {
        val ep = if (available.nonEmpty) available.last else startPage
        warnings += s"Requested $numPages pages but only ${available.length} available. " +
          s"Extracted pages $startPage-$ep"
        (ep, byPage.get(ep).map(_.end).getOrElse(text.length))
      }
    val endChar = math.min(endChar0, text.length)
    if (startChar >= endChar) return None
    val pageCount = math.min(available.length, numPages)
    Some((text.substring(startChar, endChar), startPage, endPage, pageCount, warnings.toSeq))
  }

  /** F1 over P1 boundaries: pages whose slice passes the dollar filter.
    * Reference: traveler/qc_head.py:225-266. */
  def dollarPages(text: String, boundaries: Seq[Boundary]): Seq[Int] =
    boundaries.filter(b => Filters.f1DollarPage(text.substring(b.start, math.min(b.end, text.length))))
      .map(_.page).distinct.sorted

  /** R7 — fan out merged ranges across the coverage dimensions; every
    * coverage gets every range. Reference: traveler/qc_head.py:309-359. */
  def fanOut(ranges: Seq[(Int, Int)], boundaries: Seq[Boundary]): Map[String, Seq[HeadingMatch]] = {
    val byPage = boundaries.map(b => b.page -> b).toMap
    val matches = for {
      (start, end) <- ranges if byPage.contains(start)
    } yield (start, end, byPage(start).start)
    Coverages.map { cov =>
      cov -> matches.map { case (s, e, pos) => HeadingMatch(cov, s, e, pos, s) }
    }.toMap
  }

  /** R8 — assemble a coverage section: per-range slices concatenated with
    * `[Match i] Page p` banners; min/max page tracking; collected warnings.
    * Reference: traveler/qc_head.py:403-438. */
  def assembleSection(text: String, boundaries: Seq[Boundary],
      coverage: String, matches: Seq[HeadingMatch]): Option[Section] =
    assembleSection(text, new BoundaryIndex(boundaries), coverage, matches)

  def assembleSection(text: String, idx: BoundaryIndex,
      coverage: String, matches: Seq[HeadingMatch]): Option[Section] = {
    if (matches.isEmpty) return None
    val bar = "=" * 80
    val sb = new StringBuilder
    var minPage = Int.MaxValue
    var maxPage = Int.MinValue
    val warnings = scala.collection.mutable.ArrayBuffer.empty[String]
    var pageCount = 0
    var any = false
    for ((m, i) <- matches.zipWithIndex) {
      val numPages = m.rangeEnd - m.rangeStart + 1
      extractPagesAfterHeading(text, idx, m.charPosition, numPages).foreach {
        case (chunk, sp, ep, pc, w) =>
          any = true
          sb.append(s"\n\n$bar\n[Match ${i + 1}] Page ${m.pageNumber}\n$bar\n\n")
          sb.append(chunk)
          minPage = math.min(minPage, sp)
          maxPage = math.max(maxPage, ep)
          pageCount += pc
          warnings ++= w
      }
    }
    if (!any) None
    else Some(Section(coverage, sb.toString, minPage, maxPage, pageCount, warnings.toSeq))
  }

  /** Full EP3 sectioning for one document's flat text: P1 → F1 → R1(buffer)
    * → R7 → R8 → A5. Returns per-coverage sections with their validation.
    * Reference: traveler/qc_head.py:1233-1287 main flow, buffer=1 at :321. */
  def sectionDocument(text: String, buffer: Int = 1):
      Map[String, Option[(Section, Boolean, Seq[String])]] = {
    val boundaries = PageSegmenter.p1Boundaries(text)
    val idx = new BoundaryIndex(boundaries)
    val hits = dollarPages(text, boundaries)
    val allPages = boundaries.map(_.page)
    val ranges = Islands.mergeRanges(hits, allPages, buffer)
    val matches = fanOut(ranges, boundaries)
    // the R7 fan-out gives every coverage the SAME match list by
    // construction (qc_head.py:309-359), so the multi-page content is
    // assembled ONCE and shared; only the A5 keyword validation differs
    // per coverage (round-3 VERDICT item 4: this used to assemble twice)
    val shared = assembleSection(text, idx, Coverages.head,
      matches.getOrElse(Coverages.head, Seq.empty))
    Coverages.map { cov =>
      cov -> shared.map { s0 =>
        val s = if (cov == s0.coverage) s0 else s0.copy(coverage = cov)
        val (valid, found) = Qc.validateSection(cov, s.content)
        (s, valid, found)
      }
    }.toMap
  }
}
