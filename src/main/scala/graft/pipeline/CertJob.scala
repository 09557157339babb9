package graft.pipeline

import graft.interleave.Interleave
import graft.model.{Doc, Kind}
import graft.segment.PageSegmenter

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** EP2 — the certificate pipeline (reference: cert_extract_gl.py:389-479,
  * cert_extract_pla.py:453-560): per-source page relations are interleaved
  * 3-way (pdfplumber-table ≺ text-layer ≺ ocr in our kind ranking: table
  * spans follow the text sources of their page, matching the reference's
  * labelled-section order for the two text sources and carrying tables as
  * their own kind), and the structured table rows are emitted to a side
  * output (S12, cert_extract_gl.py:214-220).
  */
object CertJob {

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

  /** The 3-way interleaved combined relation (J2): ocr ≺ text ≺ table per
    * page with per-source placeholders, over the union of pages. */
  def combined(docs: Dataset[Doc]): DataFrame =
    Interleave.interleave(Seq(
      Kind.Ocr -> pageRelation(docs, Kind.Ocr),
      Kind.Text -> pageRelation(docs, Kind.Text),
      Kind.Table -> pageRelation(docs, Kind.Table)))

  /** S12 — structured tables side output: one row per table span with its
    * pipe-separated rows split out. */
  def tablesSideOutput(docs: Dataset[Doc]): DataFrame =
    pageRelation(docs, Kind.Table)
      .select(col("doc_id"), col("page"),
        split(col("text"), "\n").as("rows"))
      .filter(size(col("rows")) > 0)
}
