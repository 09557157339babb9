package graft.classify

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BoilerplateSpec extends SparkTestBase {
  import Boilerplate._
  import spark.implicits._

  val navBlock = """<a href="/home">Home</a> | <a href="/about">About</a> | <a href="/x">More links here</a>"""
  val headingBlock = "Coverage Summary"
  val bodyBlock = "This policy provides general liability coverage for the premises. " +
    "Limits apply per occurrence and in the aggregate."
  val shortSentence = "It ends here."          // short but sentence-final → body
  val footerBlock = """Copyright 2026 <a href="/terms">Terms</a> <a href="/p">Privacy</a> reserved"""
  // note: a truly blank block merges into the greedy \n\s*\n separator; an
  // all-markup block is the canonical zero-word ("empty") block
  val doc = Seq(navBlock, headingBlock, bodyBlock, shortSentence, "<hr/>", footerBlock)
    .mkString("\n\n")

  test("golden: labels per block") {
    val got = classifyBlocks(doc)
    assert(got.map(_.label) == Seq(
      "boilerplate", // nav: all words are anchor text
      "heading",     // 2 words, no sentence punctuation
      "body",        // long prose
      "body",        // short but ends with '.'
      "empty",       // all-markup block, no words
      "boilerplate"  // footer: 2 of 5 words are links (0.4 > 0.33)
    ))
  }

  test("golden: densities") {
    val got = classifyBlocks(doc)
    val nav = got(0)
    assert(nav.nWords == nav.nLinkWords + 2) // the two '|' separators
    assert(nav.linkDensity > 0.33)
    val body = got(2)
    assert(body.nLinkWords == 0 && body.linkDensity == 0.0)
    assert(body.textDensity == body.nWords.toDouble) // single line
    // multi-line body: words spread over lines
    val multi = classifyBlock(0, "one two three\nfour five six")
    assert(multi.textDensity == 3.0 && multi.nWords == 6)
  }

  test("anchor matching is case-insensitive and spans lines") {
    val b = classifyBlock(0, "<A HREF='x'>Click\nhere now</A> ok")
    assert(b.nLinkWords == 3)
    assert(b.label == "boilerplate")
  }

  test("nested tags inside anchors are stripped from link text") {
    val b = classifyBlock(0, "<a href='x'><b>Bold</b> link</a> plain words here outside today")
    assert(b.nLinkWords == 2)
    assert(b.label == "heading") // 7 words, ld=2/7 <= 0.33, no final punct
  }

  test("contentSpans: boilerplate/empty dropped, offsets renumbered") {
    val spans = contentSpans(doc)
    assert(spans.map(_.kind) == Seq("heading", "body", "body"))
    assert(spans.map(_.offset) == Seq(0, 1, 2))
    assert(spans.head.text == "Coverage Summary")
  }

  test("Column form agrees with pure form block-by-block") {
    val docs = Seq(
      ("d1", doc),
      ("d2", "plain paragraph with no markup at all but quite a few words in it."),
      ("d3", "Heading Only"),
      ("d4", "<a href='u'>all link</a>"),
      ("d5", "  \n \n  "),
      ("d6", "line one\nline two\nline three ends.\n\nNext block!"))
    val got = blocksDf(docs.toDF("id", "text"), "id", "text")
      .select("id", "block_idx", "label", "text", "n_words", "n_link_words",
        "link_density", "text_density")
      .as[(String, Long, String, String, Long, Long, Double, Double)]
      .collect().groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    for ((id, text) <- docs) {
      val pure = classifyBlocks(text)
      val rows = got(id)
      assert(rows.size == pure.size, s"block count for $id")
      for ((b, r) <- pure.zip(rows)) {
        assert(r._3 == b.label, s"label $id/${b.idx}")
        assert(r._4 == b.text, s"text $id/${b.idx}")
        assert(r._5 == b.nWords && r._6 == b.nLinkWords, s"counts $id/${b.idx}")
        assert(r._7 == b.linkDensity && r._8 == b.textDensity, s"densities $id/${b.idx}")
      }
    }
  }

  test("contentSpansDf agrees with pure contentSpans") {
    val docs = Seq(("d1", doc))
    val got = contentSpansDf(docs.toDF("id", "text"), "id", "text")
      .select("kind", "text", "offset")
      .as[(String, String, Int)].collect().sortBy(_._3).toSeq
    assert(got == contentSpans(doc).map(s => (s.kind, s.text, s.offset)))
  }
}
