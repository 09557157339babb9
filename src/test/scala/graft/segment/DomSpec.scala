package graft.segment

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DomSpec extends SparkTestBase {
  import spark.implicits._

  private def nodes(html: String): Vector[Dom.Node] = Dom.textNodes(html)

  test("basic tree: paths, depth, order, anchor flag, word counts") {
    val ns = nodes(
      "<html><body><nav><a href=\"/\">Home</a> <a>About us</a></nav>" +
        "<div><h1>Title here</h1><p>body text runs on</p></div></body></html>")
    assert(ns.map(_.text) ==
      Vector("Home", "About us", "Title here", "body text runs on"))
    assert(ns.map(_.path) == Vector("html/body/nav/a", "html/body/nav/a",
      "html/body/div/h1", "html/body/div/p"))
    assert(ns.map(_.depth) == Vector(4, 4, 4, 4))
    assert(ns.map(_.inAnchor) == Vector(true, true, false, false))
    assert(ns.map(_.nWords) == Vector(1, 2, 2, 4))
    assert(ns.map(_.nLinkWords) == Vector(1, 2, 0, 0))
    assert(ns.map(_.idx) == Vector(0, 1, 2, 3))
  }

  test("whitespace-only runs between tags emit no node; text collapses") {
    val ns = nodes("<div>  a\n\n  b\tc  </div>\n  <p> </p>")
    assert(ns.map(_.text) == Vector("a b c"))
  }

  test("inline tags split a run into separate nodes with correct paths") {
    val ns = nodes("<p>Extra <a href=\"/x\">inline link</a> tail</p>")
    assert(ns.map(n => (n.text, n.path, n.inAnchor)) == Vector(
      ("Extra", "p", false), ("inline link", "p/a", true),
      ("tail", "p", false)))
  }

  test("script/style bodies are skipped even with bare < and fake tags") {
    val ns = nodes("<p>a</p><script>if (1 < 2) { x = \"</div>ish\"; }" +
      "</script><style>p > a { color: red }</style><p>b</p>")
    assert(ns.map(_.text) == Vector("a", "b"))
    val open = nodes("<p>a</p><script>never closed 1 < 2")
    assert(open.map(_.text) == Vector("a"))
  }

  test("raw-text close requires a tag-name boundary: </scripty> stays inside") {
    // HTML5: the close-tag name must be followed by whitespace, '/', '>' or
    // EOF — a longer name like </scripty> must NOT terminate <script>
    val ns = nodes("<p>a</p><script>x = '</scripty>' + '</scripts>';</script><p>b</p>")
    assert(ns.map(_.text) == Vector("a", "b"))
    // whitespace and '/' after the name are valid close forms
    assert(nodes("<script>x</script ><p>c</p>").map(_.text) == Vector("c"))
    assert(nodes("<script>x</script/><p>d</p>").map(_.text) == Vector("d"))
    // a close that never reaches a boundary (EOF mid-name) eats the tail
    assert(nodes("<p>a</p><script>y = 1</scrip").map(_.text) == Vector("a"))
  }

  test("comments and directives are invisible; unterminated comment eats tail") {
    val ns = nodes("<!doctype html><?xml v?><p>a<!-- hidden <b>bold</b> -->b</p>")
    assert(ns.map(_.text) == Vector("a", "b"))
    assert(ns.map(_.path) == Vector("p", "p"))
    assert(nodes("<p>a<!-- open forever <p>ghost").map(_.text) == Vector("a"))
  }

  test("quoted attributes may contain > and unquoted attrs still close") {
    val ns = nodes("<div data-x=\"a>b\" class='c>d'><p align=center>t</p></div>")
    assert(ns.map(n => (n.text, n.path)) == Vector(("t", "div/p")))
  }

  test("void and self-closing elements never push onto the stack") {
    val ns = nodes("<div>a<br>b<img src=\"x\">c<span/>d</div>")
    assert(ns.map(_.path) == Vector("div", "div", "div", "div"))
    assert(ns.map(_.text) == Vector("a", "b", "c", "d"))
  }

  test("lenient recovery: stray close ignored, ancestor close pops through") {
    assert(nodes("</div><p>a</p>").map(n => (n.text, n.path)) ==
      Vector(("a", "p")))
    // unclosed <b> inside div: closing div pops b too
    val ns = nodes("<div><b>bold<p>after</p></div><p>out</p>")
    assert(ns.map(n => (n.text, n.path)) == Vector(
      ("bold", "div/b"), ("after", "div/b/p"), ("out", "p")))
  }

  test("implied sibling close: p/li cannot self-nest, div can") {
    val ns = nodes("<ul><li>one<li>two</ul><p>a<p>b")
    assert(ns.map(n => (n.text, n.path)) == Vector(
      ("one", "ul/li"), ("two", "ul/li"), ("a", "p"), ("b", "p")))
    val divs = nodes("<div>o<div>i</div></div>")
    assert(divs.map(_.path) == Vector("div", "div/div"))
  }

  test("bare < before a non-letter is text, not a tag") {
    assert(nodes("<p>1 < 2 and x <= y</p>").map(_.text) ==
      Vector("1 < 2 and x <= y"))
  }

  test("tag names are case-insensitive") {
    val ns = nodes("<DIV><P>a</p></div><SCRIPT>x<1</ScRiPt><p>b</p>")
    assert(ns.map(n => (n.text, n.path)) == Vector(("a", "div/p"), ("b", "p")))
  }

  test("nodesDf ≡ pure tokenizer and the plan is narrow (no Exchange)") {
    val docs = Seq(
      ("d1", "<html><body><p>alpha beta</p><a>x</a></body></html>"),
      ("d2", "<div>solo</div>"),
      ("d3", null.asInstanceOf[String]),
      ("d4", "")).toDF("id", "html")
    val got = Dom.nodesDf(docs, "id", "html")
      .as[(String, Long, String, Long, Boolean, String, Long, Long)]
      .collect().sortBy(r => (r._1, r._2))
    val want = Seq("d1" -> docs.where($"id" === "d1").head.getString(1),
      "d2" -> "<div>solo</div>").flatMap { case (id, h) =>
      Dom.textNodes(h).map(n => (id, n.idx.toLong, n.path, n.depth.toLong,
        n.inAnchor, n.text, n.nWords.toLong, n.nLinkWords.toLong))
    }
    assert(got.toSeq == want)
    val plan = Dom.nodesDf(docs, "id", "html").queryExecution.executedPlan
    assert(!plan.toString.contains("Exchange"), plan)
  }

  test("mainContent picks the word-heaviest container, penalizing links") {
    val html = "<html><body>" +
      "<nav><a>one</a> <a>two three</a> <a>four</a></nav>" +
      "<div><h1>Real Title</h1><p>six seven eight nine ten eleven</p>" +
      "<p>twelve thirteen</p></div>" +
      "<footer>fine print <a>privacy</a></footer></body></html>"
    val out = Dom.mainContent(
      Dom.nodesDf(Seq(("d", html)).toDF("id", "html"), "id", "html"), "id")
    val rows = out.select("text", "parent", "score", "content_words")
      .as[(String, String, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._2).distinct.toSeq == Seq("html/body/div"))
    assert(rows.map(_._1).sorted.toSeq ==
      Seq("Real Title", "six seven eight nine ten eleven", "twelve thirteen"))
    // score = 2 + 6 + 2 words, no links
    assert(rows.head._3 == 10L && rows.head._4 == 10L)
  }

  test("stripInterleaved: cleans text spans, media passthrough, offsets kept") {
    val spans = Seq(
      ("d1", "text", "<div><h1>Item 1</h1><p>qty 5</p><a>more</a></div>", null, 0),
      ("d1", "media", null, "img-1", 1),
      ("d1", "text", "<nav><a>only links here</a></nav>", null, 2), // all-anchor
      ("d1", "text", "tail words", null, 3),
      ("d2", "text", "plain words", null, 0))
      .asInstanceOf[Seq[(String, String, String, String, Int)]]
      .toDF("doc_id", "kind", "text", "media_ref", "offset")
    val out = Dom.stripInterleaved(spans)
      .as[(String, String, String, String, Int)].collect()
      .sortBy(r => (r._1, r._5))
    assert(out.toSeq == Seq(
      ("d1", "text", "Item 1 qty 5", null, 0),
      ("d1", "media", null, "img-1", 1),
      ("d1", "text", "tail words", null, 3),
      ("d2", "text", "plain words", null, 0)))
    // the plan is narrow: no Exchange anywhere
    val plan = Dom.stripInterleaved(spans).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("stripInterleaved: null kind lands in the cleaned branch, not dropped") {
    val spans = Seq(
      ("d1", null, "<p>null kind words</p>", null, 0),
      ("d1", "media", null, "img-1", 1))
      .asInstanceOf[Seq[(String, String, String, String, Int)]]
      .toDF("doc_id", "kind", "text", "media_ref", "offset")
    val out = Dom.stripInterleaved(spans)
      .as[(String, String, String, String, Int)].collect().sortBy(_._5)
    assert(out.toSeq == Seq(
      ("d1", null, "null kind words", null, 0),
      ("d1", "media", null, "img-1", 1)))
  }

  test("mainContent tie-break: equal scores pick smallest parent path") {
    val html = "<body><div><p>aa bb</p></div><section><p>cc dd</p></section></body>"
    val out = Dom.mainContent(
      Dom.nodesDf(Seq(("d", html)).toDF("id", "html"), "id", "html"), "id")
    assert(out.select("parent").distinct.as[String].collect().toSeq ==
      Seq("body/div"))
  }

  // ------------------------------------------------------- tableCells ----

  private def cells(html: String): Vector[(Int, Int, Int, Boolean, String)] =
    Dom.tableCells(html).map(c =>
      (c.tableIdx, c.rowIdx, c.colIdx, c.isHeader, c.text))

  test("tableCells: header + data rows, indices, empty cell emitted") {
    val html = "<table><tr><th>k</th><th>v</th></tr>" +
      "<tr><td>qty</td><td>12</td></tr>" +
      "<tr><td>name x</td><td></td></tr></table>"
    assert(cells(html) == Vector(
      (0, 0, 0, true, "k"), (0, 0, 1, true, "v"),
      (0, 1, 0, false, "qty"), (0, 1, 1, false, "12"),
      (0, 2, 0, false, "name x"), (0, 2, 1, false, "")))
  }

  test("tableCells: implied td/tr closes (the markup everyone writes)") {
    // no </td> anywhere, no </tr> before the next <tr>
    val html = "<table><tr><td>a<td>b<tr><td>c</table>"
    assert(cells(html) == Vector(
      (0, 0, 0, false, "a"), (0, 0, 1, false, "b"), (0, 1, 0, false, "c")))
    // a cell before any <tr> implies row 0; mixed th after td
    assert(cells("<table><td>x</td><th>y</th></table>") == Vector(
      (0, 0, 0, false, "x"), (0, 0, 1, true, "y")))
  }

  test("tableCells: nested table owns its text; outer cell resumes after") {
    val html = "<table><tr><td>pre " +
      "<table><tr><td>inner</td></tr></table>post</td></tr></table>"
    assert(cells(html) == Vector(
      (1, 0, 0, false, "inner"),          // inner table closes first
      (0, 0, 0, false, "pre post")))      // outer cell: pre + post, spaced
  }

  test("tableCells: inline tags space words; script body never fakes a cell") {
    assert(cells("<table><tr><td>a<br>b</td></tr></table>") ==
      Vector((0, 0, 0, false, "a b")))
    assert(cells("<table><tr><td>x<script>var t = '<td>no</td>';</script>y" +
      "</td></tr></table>") == Vector((0, 0, 0, false, "x y")))
  }

  test("tableCells: non-table text ignored; EOF closes open cells") {
    assert(cells("<p>prose only</p>") == Vector.empty)
    assert(cells("<td>stray cell outside any table</td>") == Vector.empty)
    // unclosed everything: lenient EOF recovery still emits the cell
    assert(cells("<table><tr><td>tail") ==
      Vector((0, 0, 0, false, "tail")))
    // multiple sibling tables number in document order
    assert(cells("<table><tr><td>a</td></tr></table>" +
      "<table><tr><td>b</td></tr></table>").map(t => (t._1, t._5)) ==
      Vector((0, "a"), (1, "b")))
  }

  test("tablesToMarkdown: header separator, col order, escapes, no-header tables") {
    val html = "<table><tr><th>k</th><th>v</th></tr>" +
      "<tr><td>a|b</td><td></td></tr></table>" +
      "<table><tr><td>plain</td></tr></table>"
    val cells = Dom.tablesDf(Seq(("d", html)).toDF("id", "html"), "id", "html")
    val got = Dom.tablesToMarkdown(cells, "id")
      .as[(String, Long, String)].collect().sortBy(_._2).toSeq
    assert(got == Seq(
      ("d", 0L, "| k | v |\n| --- | --- |\n| a\\|b |  |"),
      ("d", 1L, "| plain |")))
    // mixed first row (td+th) gets NO separator
    val mixed = Dom.tablesDf(Seq(("m",
      "<table><tr><td>x</td><th>y</th></tr><tr><td>1</td><td>2</td></tr></table>"))
      .toDF("id", "html"), "id", "html")
    assert(Dom.tablesToMarkdown(mixed, "id").as[(String, Long, String)]
      .collect().head._3 == "| x | y |\n| 1 | 2 |")
  }

  test("tablesDf ≡ pure walker and the plan is narrow (no Exchange)") {
    val h1 = "<table><tr><th>h</th></tr><tr><td>v 1</td><td></td></tr></table>"
    val h2 = "<div>no tables here</div>"
    val docs = Seq(("d1", h1), ("d2", h2), ("d3", null: String))
      .toDF("id", "html")
    val got = Dom.tablesDf(docs, "id", "html")
      .as[(String, Long, Long, Long, Boolean, String)].collect().toSet
    val want = Seq("d1" -> h1, "d2" -> h2).flatMap { case (id, h) =>
      Dom.tableCells(h).map(c => (id, c.tableIdx.toLong, c.rowIdx.toLong,
        c.colIdx.toLong, c.isHeader, c.text))
    }.toSet
    assert(got == want && got.size == 3)
    val plan = Dom.tablesDf(docs, "id", "html").queryExecution.executedPlan
    assert(!plan.toString.contains("Exchange"), plan)
  }
}
