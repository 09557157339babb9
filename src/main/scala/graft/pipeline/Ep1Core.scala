package graft.pipeline

import graft.classify.Filters
import graft.model.{Doc, Kind, Span}
import graft.ranges.Islands
import graft.segment.PageSegmenter

import scala.collection.mutable

/** EP1 configuration. Defaults mirror the reference call-sites:
  * buffer=1 (policy_filter.py:196), corruption fallback thresholds
  * ratio>0.5 / totalChars<1000 (policy_extract.py:393-398).
  */
final case class Ep1Config(
    buffer: Int = 1,
    corruptionRatio: Double = 0.5,
    minTotalChars: Int = 1000,
    maxPages: Int = Int.MaxValue)

/** The pure per-document core of EP1 (filter → buffer-merge → range-slice →
  * interleave), shared by the per-partition typed pipeline. Semantics replay
  * the reference scripts policy_extract.py → policy_filter.py →
  * combine_extractions.py span-wise:
  *
  *  1. page identity per span from the head marker; unmarked spans (tables,
  *     media) attach to the page of the nearest preceding marked span.
  *  2. duplicate page numbers within a kind: first occurrence wins
  *     (combine_extractions.py:49-53).
  *  3. A2 strategy switch: if >50% of a doc's ocr spans are gibberish (F5) or
  *     their total content is < 1000 chars, the ocr source is dropped for the
  *     doc (the reference swaps extraction strategy on the same signal,
  *     policy_extract.py:393-398).
  *  4. per kind (ocr, text): hit pages = F1 ∨ F2; R1 buffer+merge with
  *     clamping to that kind's page domain; R4 slice with the
  *     missing-endpoint silent-drop quirk (policy_filter.py:201).
  *  5. J1 full-outer interleave over the union of kept pages, fixed source
  *     order ocr before text (combine_extractions.py:170-190), with
  *     per-source `[Page not found in <kind> extraction]` placeholders.
  *  6. table/media spans pass through iff their page is kept, in
  *     (page asc, kind-rank asc, offset asc) order; offsets renumbered 0..n.
  *
  * Hot-path note: each span's text is regex-parsed exactly once
  * ([[PageSegmenter.parseHead]]); every downstream step reuses the parsed
  * (page, body) arrays — string allocation per span is one stripped body.
  */
object Ep1Core {

  def placeholder(kind: String): String = s"[Page not found in $kind extraction]"

  /** Locate every span on a page (compat/test surface; the hot path inlines
    * the same parse). */
  def locate(spans: Seq[Span]): Seq[(Span, Int)] = {
    val sorted = spans.sortBy(_.offset)
    var current = 1
    sorted.map { s =>
      PageSegmenter.markerPage(s.text) match {
        case Some(p) => current = p; (s, p)
        case None    => (s, current)
      }
    }
  }

  def process(doc: Doc, cfg: Ep1Config = Ep1Config()): Seq[Span] = {
    val sorted = doc.spans.sortBy(_.offset).toArray
    val n = sorted.length
    val pages = new Array[Int](n)
    val bodies = new Array[String](n)

    // single-pass parse + page forward-fill
    var current = 1
    var i = 0
    while (i < n) {
      val (p, body) = PageSegmenter.parseHead(sorted(i).text)
      if (p >= 0) current = p
      pages(i) = current
      bodies(i) = body
      i += 1
    }

    // A2 — ocr-source quality gate over all ocr bodies (dups included)
    var ocrCount = 0
    var corrupted = 0
    var totalChars = 0L
    i = 0
    while (i < n) {
      if (sorted(i).kind == Kind.Ocr) {
        ocrCount += 1
        if (Filters.f5Gibberish(bodies(i))) corrupted += 1
        totalChars += bodies(i).length
      }
      i += 1
    }
    val dropOcr = ocrCount > 0 && {
      corrupted.toDouble / ocrCount > cfg.corruptionRatio ||
        totalChars < cfg.minTotalChars
    }

    // per-kind page table (first occurrence wins) + filter → merge → slice
    def keptFor(kind: String): (Seq[Int], mutable.LinkedHashMap[Int, String]) = {
      val table = mutable.LinkedHashMap.empty[Int, String]
      var j = 0
      while (j < n) {
        if (sorted(j).kind == kind && !table.contains(pages(j))) table(pages(j)) = bodies(j)
        j += 1
      }
      if (kind == Kind.Ocr && dropOcr) return (Seq.empty, table)
      val allPages = table.keys.toSeq
      val hits = mutable.ArrayBuffer.empty[Int]
      val hitSet = mutable.HashSet.empty[Int] // O(1) dedup (was O(pages²))
      j = 0
      while (j < n) {
        val s = sorted(j)
        if (s.kind == kind && table.contains(pages(j)) && !hitSet.contains(pages(j))) {
          // one shared lowercase copy per span for both filters (the cased
          // copies were the dominant allocation after the strip fix); exact
          // only for ASCII — non-ASCII spans (where upper/lower case
          // foldings can diverge, e.g. U+017F/U+212A) take the per-filter
          // cased path so the typed form stays identical to the Column twins
          val hit = if (Filters.isAscii(s.text)) {
            val low = s.text.toLowerCase
            Filters.f1DollarPageLowered(s.text, low) || Filters.f2KeywordLowered(low)
          } else Filters.f1DollarPage(s.text) || Filters.f2Keyword(s.text)
          if (hit) {
            hits += pages(j)
            hitSet += pages(j)
          }
        }
        j += 1
      }
      val ranges = Islands.mergeRanges(hits.toSeq, allPages, cfg.buffer)
      val kept = Islands.keptPages(ranges, allPages.toSet).take(cfg.maxPages)
      (kept, table)
    }

    val (keptOcr, ocrTable) = keptFor(Kind.Ocr)
    val (keptText, textTable) = keptFor(Kind.Text)
    val union = (keptOcr ++ keptText).distinct.sorted
    val keptSet = union.toSet
    val keptOcrSet = keptOcr.toSet // O(1) membership in the emit loop
    val keptTextSet = keptText.toSet

    // passthrough spans grouped by page (original offset order within page)
    val passthrough = mutable.Map.empty[Int, mutable.ArrayBuffer[(Span, String)]]
    i = 0
    while (i < n) {
      val s = sorted(i)
      if ((s.kind == Kind.Table || s.kind == Kind.Media) && keptSet.contains(pages(i)))
        passthrough.getOrElseUpdate(pages(i), mutable.ArrayBuffer.empty) += ((s, bodies(i)))
      i += 1
    }

    // offsets are assigned at append time (offset == position in `out`),
    // avoiding a second n-span copy pass to renumber
    val out = mutable.ArrayBuffer.empty[Span]
    for (page <- union) {
      val ocrText =
        if (keptOcrSet.contains(page) && ocrTable.contains(page)) ocrTable(page)
        else placeholder(Kind.Ocr)
      out += Span(Kind.Ocr, ocrText, "", out.length)
      val textText =
        if (keptTextSet.contains(page) && textTable.contains(page)) textTable(page)
        else placeholder(Kind.Text)
      out += Span(Kind.Text, textText, "", out.length)
      passthrough.get(page).toSeq.flatten.sortBy { case (s, _) =>
        (Kind.rank(s.kind), s.offset)
      }.foreach { case (s, body) =>
        out += Span(s.kind, body, s.media_ref, out.length)
      }
    }
    out.toSeq
  }
}
