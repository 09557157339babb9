package graft.qc

import graft.segment.PageSegmenter
import org.scalatest.funsuite.AnyFunSuite

class QcHeadSpec extends AnyFunSuite {
  import QcHead._

  def mkDocText(pages: Seq[(Int, String)]): String =
    pages.map { case (p, t) => PageSegmenter.renderMarker(p) + t }.mkString

  val doc: String = mkDocText(Seq(
    1 -> "intro declarations page, no amounts",
    2 -> "each occurrence limit $1,000,000 aggregate",
    3 -> "plain conditions text",
    4 -> "schedule of building coverage",
    5 -> "property deductible $2,500 building coverage",
    6 -> "closing page"))

  test("P5 page from char position and line number") {
    val bounds = PageSegmenter.p1Boundaries(doc)
    val b2 = bounds.find(_.page == 2).get
    assert(pageFromCharPosition(bounds, b2.start) == 2)
    assert(pageFromCharPosition(bounds, b2.start + 5) == 2)
    assert(pageFromCharPosition(bounds, 0) == 1)
    assert(lineNumber("a\nb\nc", 0) == 1)
    assert(lineNumber("a\nb\nc", 2) == 2)
  }

  test("F1-over-boundaries finds dollar pages") {
    val bounds = PageSegmenter.p1Boundaries(doc)
    assert(dollarPages(doc, bounds) == Seq(2, 5))
  }

  test("R5 extracts N available pages, clamps and warns when short") {
    val bounds = PageSegmenter.p1Boundaries(doc)
    val b5 = bounds.find(_.page == 5).get
    // ask for 4 pages starting at page 5 → only 5,6 available
    val Some((text, sp, ep, pc, warnings)) =
      extractPagesAfterHeading(doc, bounds, b5.start, 4)
    assert(sp == 5 && ep == 6 && pc == 2)
    assert(warnings.exists(_.contains("only 2 available")))
    assert(text.contains("deductible $2,500"))
    assert(text.contains("closing page"))
    // exact fit: 2 pages from page 2
    val b2 = bounds.find(_.page == 2).get
    val Some((t2, s2, e2, c2, w2)) = extractPagesAfterHeading(doc, bounds, b2.start, 2)
    assert(s2 == 2 && e2 == 3 && c2 == 2 && w2.isEmpty)
    assert(t2.contains("each occurrence") && t2.contains("plain conditions"))
  }

  test("R7 fan-out duplicates ranges across GL and PROPERTY") {
    val bounds = PageSegmenter.p1Boundaries(doc)
    val ranges = Seq((1, 3), (4, 6))
    val m = fanOut(ranges, bounds)
    assert(m.keySet == Set("GL", "PROPERTY"))
    for (cov <- Coverages) {
      assert(m(cov).map(h => (h.rangeStart, h.rangeEnd)) == ranges)
      assert(m(cov).forall(_.coverage == cov))
    }
  }

  test("R8 assembles sections with [Match i] banners and page stats") {
    val bounds = PageSegmenter.p1Boundaries(doc)
    val matches = fanOut(Seq((1, 3), (4, 6)), bounds)("GL")
    val Some(section) = assembleSection(doc, bounds, "GL", matches)
    assert(section.content.contains("[Match 1] Page 1"))
    assert(section.content.contains("[Match 2] Page 4"))
    assert(section.startPage == 1 && section.endPage == 6)
    assert(section.pageCount == 6)
  }

  test("end-to-end sectioning: filter → merge(1) → fan-out → assemble → validate") {
    val got = sectionDocument(doc, buffer = 1)
    // dollar pages 2,5 → buffered [1,3],[4,6] → adjacent-merge to [1,6]
    for (cov <- Coverages) {
      val Some((section, _, found)) = got(cov)
      assert(section.startPage == 1 && section.endPage == 6)
      assert(section.content.contains("[Match 1] Page 1"))
      if (cov == "GL") assert(found.contains("limit") && found.contains("occurrence"))
      if (cov == "PROPERTY") assert(found.contains("building") && found.contains("deductible") == false)
    }
  }

  test("no dollar pages → no sections") {
    val quiet = mkDocText(Seq(1 -> "nothing here", 2 -> "still nothing"))
    val got = sectionDocument(quiet)
    assert(got.values.forall(_.isEmpty))
  }
}
