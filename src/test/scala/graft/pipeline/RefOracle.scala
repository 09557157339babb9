package graft.pipeline

import graft.classify.Filters
import graft.model.{Doc, Kind, Span}
import graft.segment.PageSegmenter

/** Independent test-side oracle for EP1. Deliberately takes the reference's
  * FILE-BASED route rather than the engine's span-wise route: per source kind
  * it reconstructs the flat marker-format text (the `_pol1`/`_pol2` files),
  * runs the P1 char-interval boundary parse, the page filters on char slices,
  * the buffer merge, the R4 char-slice with the endpoint-drop quirk
  * (producing the `_fil` files), re-parses them with P2, and replays the
  * interleave loop of combine_extractions.py:144-192. Agreement between this
  * path and the span-wise engine is the round's correctness invariant.
  *
  * Two documented contract choices where the engine diverges from raw file
  * plumbing (see Ep1Core):
  *  - an empty filter result contributes NO pages (the reference's combine
  *    step would read an empty file as "page 1, empty content" — a file
  *    artifact, not query semantics);
  *  - the A2 corruption gate counts ocr SPANS (dups included), as the span
  *    model has no second extraction file to fall back to.
  */
object RefOracle {

  def process(doc: Doc, cfg: Ep1Config = Ep1Config()): Seq[Span] = {
    val located = locatePages(doc.spans)

    // A2 gate over ocr span bodies
    val ocrBodies = doc.spans.sortBy(_.offset).filter(_.kind == Kind.Ocr)
      .map(s => PageSegmenter.stripMarker(s.text))
    val dropOcr = ocrBodies.nonEmpty && {
      val bad = ocrBodies.count(Filters.f5Gibberish)
      bad.toDouble / ocrBodies.size > cfg.corruptionRatio ||
        ocrBodies.map(_.length).sum < cfg.minTotalChars
    }

    def filteredPages(kind: String): Map[Int, String] = {
      val spans = doc.spans.sortBy(_.offset).filter(_.kind == kind)
      if (spans.isEmpty || (kind == Kind.Ocr && dropOcr)) return Map.empty
      val flat = spans.map(_.text).mkString("")
      val bounds = PageSegmenter.p1Boundaries(flat)
      val hitPages = bounds.filter { b =>
        val slice = flat.substring(b.start, b.end)
        Filters.f1DollarPage(slice) || Filters.f2Keyword(slice)
      }.map(_.page).sorted
      if (hitPages.isEmpty) return Map.empty
      // buffer + merge over the boundary page domain
      val allPages = bounds.map(_.page)
      val merged = mergeLikeReference(hitPages, allPages.min, allPages.max, cfg.buffer)
      val byPage = bounds.map(b => b.page -> b).toMap
      // build the _fil file: slices for ranges whose endpoints exist
      val fil = new StringBuilder
      for ((a, b) <- merged if byPage.contains(a) && byPage.contains(b)) {
        fil.append("\n").append("=" * 80).append("\n")
          .append(s"FILTERED PAGES $a-$b\n").append("=" * 80).append("\n\n")
        fil.append(flat.substring(byPage(a).start, byPage(b).end)).append("\n")
      }
      if (fil.isEmpty) Map.empty
      else PageSegmenter.p2ExtractPages(fil.toString).map { case (p, t) =>
        // The raw file route leaks the NEXT range's "FILTERED PAGES a-b"
        // banner into the tail of a range's last page; SURVEY.md §2.1 S10
        // classifies the banner as presentation, so it is stripped here.
        p -> t.replaceAll("\\s*={50,}\\s*\\nFILTERED PAGES \\d+-\\d+\\s*\\n={50,}\\s*$", "").strip()
      }.toMap
    }

    val ocrPages = filteredPages(Kind.Ocr)
    val textPages = filteredPages(Kind.Text)
    val union = (ocrPages.keySet ++ textPages.keySet).toSeq.sorted

    val passByPage = located
      .filter { case (s, _) => s.kind == Kind.Table || s.kind == Kind.Media }
      .groupBy(_._2)

    val out = Seq.newBuilder[Span]
    for (page <- union) {
      out += Span(Kind.Ocr, ocrPages.getOrElse(page, Ep1Core.placeholder(Kind.Ocr)), "", 0)
      out += Span(Kind.Text, textPages.getOrElse(page, Ep1Core.placeholder(Kind.Text)), "", 0)
      for ((s, _) <- passByPage.getOrElse(page, Seq.empty).sortBy(p => (graft.model.Kind.rank(p._1.kind), p._1.offset)))
        out += Span(s.kind, PageSegmenter.stripMarker(s.text), s.media_ref, 0)
    }
    out.result().zipWithIndex.map { case (s, i) => s.copy(offset = i) }
  }

  private def locatePages(spans: Seq[Span]): Seq[(Span, Int)] = {
    var page = 1
    spans.sortBy(_.offset).map { s =>
      PageSegmenter.markerPage(s.text).foreach(p => page = p)
      (s, page)
    }
  }

  /** merge_page_ranges exactly as policy_filter.py:154-178. */
  private def mergeLikeReference(pages: Seq[Int], minP: Int, maxP: Int, buffer: Int): Seq[(Int, Int)] = {
    val ranges = pages.map(p => (math.max(minP, p - buffer), math.min(maxP, p + buffer)))
      .sortBy(_._1)
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    for ((s, e) <- ranges) {
      if (merged.nonEmpty && s <= merged.last._2 + 1)
        merged(merged.length - 1) = (merged.last._1, math.max(merged.last._2, e))
      else merged += ((s, e))
    }
    merged.toSeq
  }
}
