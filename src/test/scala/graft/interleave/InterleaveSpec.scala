package graft.interleave

import graft.SparkTestBase

class InterleaveSpec extends SparkTestBase {
  import spark.implicits._

  test("toMarkdown: offset order, media placeholders, blank-line joins") {
    val spans = Seq(
      ("d1", "text", "intro words", null, 0),
      ("d1", "media", null, "img-7", 1),
      ("d1", "text", "tail", null, 2),
      ("d2", "media", null, "img-9", 5),
      ("d2", "text", "before the image", null, 3))
      .asInstanceOf[Seq[(String, String, String, String, Int)]]
      .toDF("doc_id", "kind", "text", "media_ref", "offset")
      .repartition(3)
    val got = Interleave.toMarkdown(spans)
      .as[(String, String, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(got("d1") == (("intro words\n\n![](img-7)\n\ntail", 3L)))
    // offset order wins over row order
    assert(got("d2") == (("before the image\n\n![](img-9)", 2L)))
  }

  test("fromMarkdown round-trips toMarkdown up to dense offsets") {
    import org.apache.spark.sql.functions.col
    val spans = Seq(
      ("d1", "text", "intro words", null, 0),
      ("d1", "media", null, "img-7", 4),
      ("d1", "text", "tail", null, 9))
      .asInstanceOf[Seq[(String, String, String, String, Int)]]
      .toDF("doc_id", "kind", "text", "media_ref", "offset")
    val back = Interleave.fromMarkdown(
      Interleave.toMarkdown(spans), "doc_id", "md")
      .as[(String, String, String, String, Int)].collect().sortBy(_._5)
    // offsets densify 0,4,9 -> 0,1,2; everything else survives
    assert(back.toSeq == Seq(
      ("d1", "text", "intro words", null, 0),
      ("d1", "media", null, "img-7", 1),
      ("d1", "text", "tail", null, 2)))
    // empty-ref placeholder parses to a null media_ref
    val p = Interleave.fromMarkdown(
      Seq(("d", "a\n\n![]()")).toDF("id", "md"), "id", "md")
      .as[(String, String, String, String, Int)].collect().sortBy(_._5)
    assert(p.toSeq == Seq(("d", "text", "a", null, 0),
      ("d", "media", null, null, 1)))
    val plan = Interleave.fromMarkdown(
      Seq(("d", "a")).toDF("id", "md"), "id", "md")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("nearestCaption: nearer text wins, ties prefer preceding, edges null") {
    val spans = Seq(
      ("d1", "text", "far caption", null, 0),
      ("d1", "media", null, "imgA", 4),    // prev at 0 (d=4), next at 5 (d=1) -> next
      ("d1", "text", "near caption", null, 5),
      ("d1", "media", null, "imgB", 6),    // prev at 5 (d=1), next at 7 (d=1) -> TIE -> prev
      ("d1", "text", "after", null, 7),
      ("d2", "media", null, "imgC", 0),    // no prev -> next
      ("d2", "text", "only text", null, 3),
      ("d3", "media", null, "imgD", 0))    // no text at all -> nulls
      .asInstanceOf[Seq[(String, String, String, String, Int)]]
      .toDF("doc_id", "kind", "text", "media_ref", "offset")
      .repartition(3)
    val got = Interleave.nearestCaption(spans)
      .as[(String, Int, String, Option[Int], Option[String])]
      .collect().map(r => r._3 -> ((r._4, r._5))).toMap
    assert(got("imgA") == ((Some(5), Some("near caption"))))
    assert(got("imgB") == ((Some(5), Some("near caption"))))
    assert(got("imgC") == ((Some(3), Some("only text"))))
    assert(got("imgD") == ((None, None)))
  }

  test("toMarkdown: null text renders empty; null media_ref renders ![]()") {
    val spans = Seq(
      ("d", "text", null, null, 0),
      ("d", "media", null, null, 1))
      .asInstanceOf[Seq[(String, String, String, String, Int)]]
      .toDF("doc_id", "kind", "text", "media_ref", "offset")
    val got = Interleave.toMarkdown(spans)
      .as[(String, String, Long)].collect().head
    assert(got == (("d", "\n\n![]()", 2L)))
  }
}
