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
  */
object Ep1Core {

  def placeholder(kind: String): String = s"[Page not found in $kind extraction]"

  private final case class Located(span: Span, page: Int)

  /** Locate every span on a page. */
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

  /** Per-kind page table: page -> stripped content, first occurrence wins. */
  private def pageTable(located: Seq[(Span, Int)], kind: String): mutable.LinkedHashMap[Int, String] = {
    val t = mutable.LinkedHashMap.empty[Int, String]
    located.iterator.filter(_._1.kind == kind).foreach { case (s, p) =>
      if (!t.contains(p)) t(p) = PageSegmenter.stripMarker(s.text)
    }
    t
  }

  def process(doc: Doc, cfg: Ep1Config = Ep1Config()): Seq[Span] = {
    val located = locate(doc.spans)

    // A2 — ocr-source quality gate
    val ocrBodies = located.collect { case (s, _) if s.kind == Kind.Ocr =>
      PageSegmenter.stripMarker(s.text)
    }
    val dropOcr = ocrBodies.nonEmpty && {
      val corrupted = ocrBodies.count(Filters.f5Gibberish)
      corrupted.toDouble / ocrBodies.size > cfg.corruptionRatio ||
        ocrBodies.map(_.length).sum < cfg.minTotalChars
    }

    // per-kind filter → merge → slice
    def keptFor(kind: String): (Seq[Int], mutable.LinkedHashMap[Int, String]) = {
      val table = pageTable(located, kind)
      if (kind == Kind.Ocr && dropOcr) return (Seq.empty, table)
      val allPages = table.keys.toSeq
      val hits = located.collect {
        case (s, p)
            if s.kind == kind && table.contains(p) &&
              (Filters.f1DollarPage(s.text) || Filters.f2Keyword(s.text)) => p
      }.distinct
      val ranges = Islands.mergeRanges(hits, allPages, cfg.buffer)
      val kept = Islands.keptPages(ranges, allPages.toSet).take(cfg.maxPages)
      (kept, table)
    }

    val (keptOcr, ocrTable) = keptFor(Kind.Ocr)
    val (keptText, textTable) = keptFor(Kind.Text)
    val union = (keptOcr ++ keptText).distinct.sorted
    val keptSet = union.toSet

    // passthrough spans grouped by page (original offset order within page)
    val passthrough = located
      .filter { case (s, p) =>
        (s.kind == Kind.Table || s.kind == Kind.Media) && keptSet.contains(p)
      }
      .groupBy(_._2)

    val out = mutable.ArrayBuffer.empty[Span]
    for (page <- union) {
      val ocrText =
        if (keptOcr.contains(page) && ocrTable.contains(page)) ocrTable(page)
        else placeholder(Kind.Ocr)
      out += Span(Kind.Ocr, ocrText, "", 0)
      val textText =
        if (keptText.contains(page) && textTable.contains(page)) textTable(page)
        else placeholder(Kind.Text)
      out += Span(Kind.Text, textText, "", 0)
      passthrough.getOrElse(page, Seq.empty).sortBy { case (s, _) =>
        (Kind.rank(s.kind), s.offset)
      }.foreach { case (s, _) =>
        out += Span(s.kind, PageSegmenter.stripMarker(s.text), s.media_ref, 0)
      }
    }
    out.toSeq.zipWithIndex.map { case (s, i) => s.copy(offset = i) }
  }
}
