package graft.pipeline

import graft.interleave.Interleave
import graft.model.{Doc, Kind}
import graft.segment.PageSegmenter

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** EP2 — the certificate pipeline (reference: cert_extract_gl.py:389-479,
  * cert_extract_pla.py:453-560): per-source page relations are interleaved
  * 3-way in the reference's labelled-section order pdfplumber ≺ PyMuPDF ≺
  * Tesseract (llm_pla.py:50-63; our kinds table ≺ text ≺ ocr), and the
  * structured table rows are emitted to a side output (S12,
  * cert_extract_gl.py:214-220). The kind order is configurable per stage —
  * EP1's 2-way contract is ocr ≺ text (combine_extractions.py:170-190),
  * EP2's 3-way contract is this one.
  */
object CertJob {

  /** The reference's 3-way source order: pdfplumber ≺ PyMuPDF ≺ Tesseract.
    * Reference: llm_pla.py:50-63, cert_extract_gl.py:333,343. */
  val ReferenceOrder: Seq[String] = Seq(Kind.Table, Kind.Text, Kind.Ocr)

  /** Explode a docs table into per-kind page relations (doc_id, page, text),
    * page identity forward-filled from head markers. */
  def pageRelation(docs: Dataset[Doc], kind: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wFill = Window.partitionBy("doc_id").orderBy("offset")
      .rowsBetween(Window.unboundedPreceding, 0)
    docs.toDF()
      .select(col("doc_id"), explode(col("spans")).as("span"))
      .select(col("doc_id"), col("span.kind").as("kind"),
        col("span.text").as("text"), col("span.offset").as("offset"))
      .withColumn("page",
        coalesce(last(PageSegmenter.markerPageCol(col("text")), ignoreNulls = true)
          .over(wFill), lit(1)))
      .filter(col("kind") === kind)
      .select(col("doc_id"), col("page"),
        PageSegmenter.stripMarkerCol(col("text")).as("text"))
  }

  /** The 3-way interleaved combined relation (J2): per-source placeholders
    * over the union of pages, kinds ranked by `order` (default: the
    * reference's pdfplumber ≺ PyMuPDF ≺ Tesseract). No global sort — order
    * per doc via (page, source_rank) downstream. */
  def combined(docs: Dataset[Doc],
      order: Seq[String] = ReferenceOrder): DataFrame =
    Interleave.interleave(order.map(k => k -> pageRelation(docs, k)))

  /** S12 — structured tables side output: one row per table span with its
    * pipe-separated rows split out. */
  def tablesSideOutput(docs: Dataset[Doc]): DataFrame =
    pageRelation(docs, Kind.Table)
      .select(col("doc_id"), col("page"),
        split(col("text"), "\n").as("rows"))
      .filter(size(col("rows")) > 0)
}
