package graft.model

/** Core data model, locked by the input hint:
  * an Iceberg-style table of interleaved text + media documents with schema
  * `(doc_id: string, spans: array<struct<kind,text,media_ref,offset>>)`.
  *
  * Span kinds mirror the reference's labelled source-sections
  * (reference: combine_extractions.py:172-190, llm_pla.py:50-63):
  *  - "ocr"   — Tesseract-like OCR text layer
  *  - "text"  — PyMuPDF-like text layer
  *  - "table" — pdfplumber-like rendered table rows
  *  - "media" — opaque media reference (image/figure), text empty
  */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)

final case class Doc(doc_id: String, spans: Seq[Span], partition_id: Int)

/** A span exploded to one row, with its parsed page number.
  * Page identity is recovered from the reference's page-marker IR embedded at
  * the head of each text span (reference: policy_extract.py:212-214).
  */
final case class PageSpan(
    doc_id: String,
    partition_id: Int,
    pos: Int, // array position of the span within the doc (input order)
    kind: String,
    text: String,
    media_ref: String,
    offset: Int,
    page: Int)

/** Per-partition lineage/metrics row, appended after each partition commit.
  * Resume = left-anti join of all partitions against this table (north rule).
  */
final case class LineageRow(
    partition_id: Int,
    docs_in: Long,
    docs_out: Long,
    spans_out: Long,
    wall_ms: Long)

object Kind {
  val Ocr = "ocr"
  val Text = "text"
  val Table = "table"
  val Media = "media"

  /** Output interleaving order contract: (page asc, kind-rank asc).
    * Mirrors the reference's fixed source order Tesseract before PyMuPDF
    * (combine_extractions.py:170-190) with tables and media after the text
    * sources of the same page.
    */
  def rank(kind: String): Int = kind match {
    case Ocr   => 0
    case Text  => 1
    case Table => 2
    case Media => 3
    case _     => 4
  }
}
