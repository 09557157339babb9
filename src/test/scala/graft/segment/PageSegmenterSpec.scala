package graft.segment

import org.scalatest.funsuite.AnyFunSuite

class PageSegmenterSpec extends AnyFunSuite {
  import PageSegmenter._

  private val bar80 = "=" * 80
  private def marked(pages: (Int, String)*): String =
    pages.map { case (n, t) => s"\n$bar80\nPAGE $n\n$bar80\n$t" }.mkString

  test("marker render/parse round-trip for a single span") {
    val t = renderMarker(7) + "body text"
    assert(markerPage(t).contains(7))
    assert(stripMarker(t) == "body text")
    assert(markerPage("no marker here").isEmpty)
    assert(stripMarker("  plain  ") == "plain")
  }

  test("P1 standard markers produce char boundaries in order") {
    val c = marked(1 -> "alpha", 2 -> "beta", 3 -> "gamma")
    val b = p1Boundaries(c)
    assert(b.map(_.page) == Seq(1, 2, 3))
    assert(c.substring(b(0).start, b(0).end).contains("alpha"))
    assert(!c.substring(b(0).start, b(0).end).contains("beta"))
    assert(b(2).end == c.length)
  }

  test("P1 cascade: lowercase Page markers match the 4th pattern") {
    val c = s"\n$bar80\nPage 1\n$bar80\nalpha\n$bar80\nPage 2\n$bar80\nbeta"
    assert(p1Boundaries(c).map(_.page) == Seq(1, 2))
  }

  test("P1 bare PAGE fallback and whole-doc-as-page-1 fallback") {
    assert(p1Boundaries("\nPAGE 4\nzzz").map(_.page) == Seq(4))
    val b = p1Boundaries("no markers at all")
    assert(b == Seq(Boundary(1, 0, "no markers at all".length)))
  }

  test("P1 duplicate page numbers: first start kept, end extended, overlap clamped") {
    // pages 1, 2, then 1 again: page 1's extended end overlaps page 2 ->
    // clamped back to page 2's start (net effect: first occurrence only)
    val c = marked(1 -> "first", 2 -> "second", 1 -> "dup")
    val b = p1Boundaries(c)
    assert(b.map(_.page) == Seq(1, 2))
    val p1 = b.find(_.page == 1).get
    val p2 = b.find(_.page == 2).get
    assert(p1.end == p2.start)
    // adjacent duplicate: extension survives (no intervening start to clamp to)
    val c2 = marked(1 -> "first", 1 -> "dup", 2 -> "second")
    val b2 = p1Boundaries(c2)
    val q1 = b2.find(_.page == 1).get
    assert(c2.substring(q1.start, q1.end).contains("dup"))
  }

  test("P2 first occurrence of a page number wins; content stripped") {
    val c = marked(1 -> "first", 2 -> "mid", 1 -> "dup")
    assert(p2ExtractPages(c) == Seq(1 -> "first", 2 -> "mid"))
  }

  test("P2 detects [Match N] Page X markers simultaneously") {
    val c = s"\n$bar80\n[Match 1] Page 5\n$bar80\nmatched" + marked(6 -> "std")
    assert(p2ExtractPages(c) == Seq(5 -> "matched", 6 -> "std"))
  }

  test("P2 no markers -> single page 1 with whole content") {
    assert(p2ExtractPages("plain content") == Seq(1 -> "plain content"))
  }

  test("P3 keeps the marker inside the chunk and emits a page-0 preamble") {
    val c = "preamble\r\n" + ("=" * 40) + "\nPAGE 2\n" + ("=" * 40) + "\nbody"
    val parts = p3SplitPages(c)
    assert(parts.map(_._1) == Seq(0, 2))
    assert(parts(1)._2.startsWith("=" * 40)) // marker retained
    assert(parts(1)._2.contains("body"))
    assert(!parts(0)._2.contains("PAGE"))
  }

  test("P4 prunes to header + first property-section page with a section keyword") {
    val pages = Seq(
      1 -> "ACORD header",
      2 -> "PROPERTY SECTION intro only",
      3 -> "PROPERTY SECTION with Building limits",
      4 -> "PROPERTY SECTION with Business Income")
    assert(p4PrunePropertySection(pages).map(_._1) == Seq(1, 3))
    // no PROPERTY SECTION anywhere -> untouched
    val plain = Seq(1 -> "a", 2 -> "b")
    assert(p4PrunePropertySection(plain) == plain)
  }
}
