package graft.segment

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ReadingOrderSpec extends SparkTestBase {
  import spark.implicits._

  // (doc, page, x, y, w, kind, text, media_ref)
  private def df(rows: (String, Int, Int, Int, Int, String, String, String)*) =
    rows.toSeq.toDF("doc_id", "page", "x", "y", "w", "kind", "text", "media_ref")

  private def order(in: org.apache.spark.sql.DataFrame): Seq[String] =
    ReadingOrder.orderSpans(in).orderBy("offset")
      .select("text").as[String].collect().toSeq

  test("two-column page reads left column fully before right") {
    // left column x∈[0,40], right x∈[60,100]; interleaved y positions
    val got = order(df(
      ("d", 1, 0, 10, 40, "text", "L1", ""),
      ("d", 1, 60, 5, 40, "text", "R1", ""),
      ("d", 1, 0, 30, 40, "text", "L2", ""),
      ("d", 1, 60, 25, 40, "text", "R2", "")))
    assert(got == Seq("L1", "L2", "R1", "R2"))
  }

  test("a crossing fragment forces conservative single-column order") {
    val got = order(df(
      ("d", 1, 0, 10, 40, "text", "L1", ""),
      ("d", 1, 60, 5, 40, "text", "R1", ""),
      ("d", 1, 10, 1, 80, "text", "HEADING", ""))) // spans the midline
    // single-column: plain (y, x) order
    assert(got == Seq("HEADING", "R1", "L1"))
  }

  test("pages ordered first; media fragments ride along; offsets dense from 0") {
    val in = df(
      ("d", 2, 0, 5, 10, "text", "p2", ""),
      ("d", 1, 0, 5, 10, "text", "p1a", ""),
      ("d", 1, 0, 9, 10, "media", "", "img-1"))
    val got = ReadingOrder.orderSpans(in).orderBy("offset")
      .select("kind", "text", "media_ref", "offset")
      .as[(String, String, String, Int)].collect().toSeq
    assert(got == Seq(("text", "p1a", "", 0), ("media", "", "img-1", 1),
      ("text", "p2", "", 2)))
  }

  test("one-sided page is single-column; order is partitioning-invariant") {
    // all fragments entirely left of the data-derived midline never happens
    // (midline is the bbox center) — a single shared column means every
    // fragment crosses or sits on one side only when widths differ; assert
    // the simple stacked case orders by y
    val in = df(
      ("d", 1, 0, 30, 100, "text", "c", ""),
      ("d", 1, 0, 10, 100, "text", "a", ""),
      ("d", 1, 0, 20, 100, "text", "b", ""))
    assert(order(in) == Seq("a", "b", "c"))
    val big = (1 to 200).map(i =>
      ("d" + i % 7, 1 + i % 3, (i % 5) * 25, i % 40, 20, "text", s"t$i", ""))
    val bigDf = big.toDF("doc_id", "page", "x", "y", "w", "kind", "text", "media_ref")
    val a = ReadingOrder.orderSpans(bigDf)
      .orderBy("doc_id", "offset").collect().toSeq
    val b = ReadingOrder.orderSpans(bigDf.repartition(13))
      .orderBy("doc_id", "offset").collect().toSeq
    assert(a == b)
  }
}
