package graft.pipeline

import graft.SparkTestBase
import graft.io.Synth
import graft.model.Kind
import graft.segment.PageSegmenter

class CertQcJobSpec extends SparkTestBase {

  lazy val docs = Synth.generate(spark, 30, 4)

  test("EP2: 3-way interleave covers the union of pages with placeholders") {
    import org.apache.spark.sql.functions._
    val rows = CertJob.combined(docs).collect()
    val byDoc = rows.groupBy(_.getAs[String]("doc_id"))
    val docsLocal = docs.collect()
    for (d <- docsLocal.take(10)) {
      val located = Ep1Core.locate(d.spans)
      val expectPages = located.collect {
        case (s, p) if s.kind == Kind.Ocr || s.kind == Kind.Text || s.kind == Kind.Table => p
      }.distinct.sorted
      val got = byDoc(d.doc_id)
      // 3 rows (one per source) per page in the union
      assert(got.length == expectPages.size * 3, s"doc ${d.doc_id}")
      // a page missing from one source gets that source's placeholder
      val ocrPages = located.collect { case (s, p) if s.kind == Kind.Ocr => p }.toSet
      for (r <- got if r.getAs[String]("kind") == Kind.Ocr) {
        val page = r.getAs[Int]("page")
        val text = r.getAs[String]("text")
        if (!ocrPages.contains(page))
          assert(text == "[Page not found in ocr extraction]")
      }
    }
  }

  test("EP2: 3-way kind order replays the reference's label order") {
    // reference: pdfplumber ≺ PyMuPDF ≺ Tesseract (llm_pla.py:50-63);
    // our kinds table ≺ text ≺ ocr. Per (doc, page), sorting by source_rank
    // must yield exactly that label sequence.
    val rows = CertJob.combined(docs).collect()
    val ranks = rows.map(r =>
      r.getAs[String]("kind") -> r.getAs[Int]("source_rank")).toMap
    assert(ranks == Map(Kind.Table -> 0, Kind.Text -> 1, Kind.Ocr -> 2))
    val byPage = rows.groupBy(r => (r.getAs[String]("doc_id"), r.getAs[Int]("page")))
    for ((_, group) <- byPage.take(20)) {
      val order = group.sortBy(_.getAs[Int]("source_rank")).map(_.getAs[String]("kind")).toSeq
      assert(order == Seq(Kind.Table, Kind.Text, Kind.Ocr))
    }
    // the order is configurable per stage: EP1's 2-way contract shape
    val two = CertJob.combined(docs, Seq(Kind.Ocr, Kind.Text)).collect()
    assert(two.map(r => r.getAs[String]("kind") -> r.getAs[Int]("source_rank")).toMap ==
      Map(Kind.Ocr -> 0, Kind.Text -> 1))
  }

  test("EP2: tables side output carries split rows") {
    val t = CertJob.tablesSideOutput(docs).collect()
    val expected = docs.collect().map(_.spans.count(_.kind == Kind.Table)).sum
    assert(t.length == expected)
    assert(t.forall(_.getAs[Seq[String]]("rows").nonEmpty))
  }

  test("EP3: QcJob extracts sections with banners and validation") {
    import spark.implicits._
    val text = Seq(
      1 -> "intro page",
      2 -> "each occurrence limit $1,000,000 aggregate building",
      3 -> "closing").map { case (p, t) => PageSegmenter.renderMarker(p) + t }.mkString
    val ds = Seq(("doc_a", text), ("doc_b", "no dollar content at all")).toDS()
    val rows = QcJob.run(ds).collect()
    assert(rows.map(_.doc_id).distinct.toSeq == Seq("doc_a")) // doc_b: no sections
    assert(rows.map(_.coverage).sorted.toSeq == Seq("GL", "PROPERTY"))
    val gl = rows.find(_.coverage == "GL").get
    assert(gl.content.contains("[Match 1] Page 1"))
    assert(gl.start_page == 1 && gl.end_page == 3)
    assert(gl.keywords_found.contains("limit"))
  }

  test("EP1 output feeds EP3 via fromSpans round-trip") {
    // fromSpans flattens text/ocr spans in offset order
    import spark.implicits._
    val small = Synth.generate(spark, 5, 2)
    val flat = QcJob.fromSpans(spark, small.toDF()).collect().toMap
    assert(flat.size == 5)
    for (d <- small.collect()) {
      val expected = d.spans.sortBy(_.offset)
        .filter(s => s.kind == Kind.Ocr || s.kind == Kind.Text)
        .map(_.text).mkString("")
      assert(flat(d.doc_id) == expected, s"doc ${d.doc_id}")
    }
  }
}
