package graft.pipeline

import graft.qc.QcHead

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** EP3 — the QC-head sectioning pipeline as a distributed job
  * (reference: traveler/qc_head.py:1233-1287): each document's flat
  * marker-format text runs through P1 boundaries → F1 dollar pages →
  * R1 merge(buffer) → R7 coverage fan-out → R5/R8 section assembly →
  * A5 keyword validation, entirely per-document inside `mapPartitions`
  * (narrow, zero-shuffle — the scale shape for 10^12 docs).
  */
object QcJob {

  final case class SectionRow(
      doc_id: String,
      coverage: String,
      content: String,
      start_page: Int,
      end_page: Int,
      page_count: Int,
      content_length: Int,
      valid: Boolean,
      keywords_found: Seq[String],
      warnings: Seq[String])

  /** Input: (doc_id, text) flat marker-format documents. Output: one row per
    * (doc, coverage) extracted section with its A5 validation. Docs whose
    * coverage section is absent produce no row (reference: 'not_found'). */
  def run(docs: Dataset[(String, String)], buffer: Int = 1): Dataset[SectionRow] = {
    import docs.sparkSession.implicits._
    docs.mapPartitions(_.flatMap { case (docId, text) =>
      QcHead.sectionDocument(text, buffer).toSeq.sortBy(_._1).flatMap {
        case (coverage, Some((section, valid, found))) =>
          Some(SectionRow(docId, coverage, section.content, section.startPage,
            section.endPage, section.pageCount, section.content.length,
            valid, found, section.warnings))
        case _ => None
      }
    })
  }

  /** Render a Doc-table's text spans to the reference's flat marker format
    * (kind filter + offset order + marker re-render happens upstream; here
    * the docs table is already flat text). Helper for wiring EP1 output into
    * EP3. */
  def fromSpans(spark: SparkSession, docs: DataFrame): Dataset[(String, String)] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    docs.select(col("doc_id"), explode(col("spans")).as("span"))
      .filter(col("span.kind").isin(graft.model.Kind.Ocr, graft.model.Kind.Text))
      .groupBy("doc_id")
      .agg(concat_ws("", sort_array(collect_list(
        struct(col("span.offset").as("offset"), col("span.text").as("text"))))
        .getField("text")).as("text"))
      .as[(String, String)]
  }
}
