package graft.io

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC (ISO 28500) record parsing — the ingest format of CommonCrawl and
  * every serious web archive. A WARC file is a concatenation of records:
  *
  *   WARC/1.0\r\n
  *   <name>: <value>\r\n ...          (header block)
  *   \r\n                             (blank line)
  *   <Content-Length bytes of block>  (e.g. an HTTP response)
  *   \r\n\r\n                         (record separator)
  *
  * The parser honors `Content-Length` as the BLOCK BOUNDARY — the one rule
  * a naive split-on-"WARC/1.0" gets wrong, because payloads legally
  * contain that marker (a page QUOTING a WARC, a crawler manual...). Only
  * when Content-Length is absent does it fall back to scanning for the
  * separator + next version line. Response blocks starting with `HTTP/`
  * are split into status + headers + body; other blocks pass through as
  * the payload.
  *
  * This engine parses STRING blobs (the span/text tables it processes are
  * strings; the fixtures are ASCII, so char == byte). A binary-file
  * production reader runs the same algorithm over byte offsets — only the
  * indexOf/substring carrier changes.
  *
  * Plan shape: one typed mapPartitions over (id, blob) — zero shuffles,
  * records streamed per document; same batched-per-partition discipline as
  * [[graft.segment.Dom]]. Reference for the span-table shape this feeds:
  * policy_extract.py's per-page loop (the reference ingests pre-split
  * pages; WARC is how the same content arrives from a crawl).
  */
object Warc {

  /** One parsed record: `recIdx` is the record's ordinal within its blob,
    * `httpStatus` 0 for non-HTTP blocks, `contentLength` the declared (or
    * measured, if undeclared) block length. */
  final case class WarcRecord(recIdx: Int, warcType: String, targetUri: String,
      contentLength: Long, httpStatus: Int, payload: String)

  /** Pure single-blob parser. Tolerates missing Content-Length (separator
    * scan), truncated final records, and unknown headers; header names are
    * case-insensitive per the spec. */
  def parseRecords(blob: String): Seq[WarcRecord] = {
    if (blob == null) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var pos = 0
    var idx = 0
    while (pos < blob.length) {
      val start = blob.indexOf("WARC/", pos)
      if (start < 0) pos = blob.length
      else {
        val verEnd = blob.indexOf("\r\n", start)
        var p = if (verEnd < 0) blob.length else verEnd + 2
        val headers = scala.collection.mutable.Map.empty[String, String]
        var inHeaders = p < blob.length
        while (inHeaders) {
          val eol = blob.indexOf("\r\n", p)
          if (eol < 0) { p = blob.length; inHeaders = false }
          else if (eol == p) { p += 2; inHeaders = false } // blank line
          else {
            val line = blob.substring(p, eol)
            val c = line.indexOf(':')
            if (c > 0)
              headers(line.substring(0, c).toLowerCase.trim) =
                line.substring(c + 1).trim
            p = eol + 2
          }
        }
        val declared = headers.get("content-length")
          .flatMap(s => s.toLongOption).filter(_ >= 0)
        val (content, next) = declared match {
          case Some(n) if p + n <= blob.length =>
            (blob.substring(p, p + n.toInt), p + n.toInt)
          case Some(_) => (blob.substring(p), blob.length) // truncated tail
          case None =>
            val nxt = blob.indexOf("\r\n\r\nWARC/", p)
            if (nxt < 0) (blob.substring(p), blob.length)
            else (blob.substring(p, nxt), nxt)
        }
        val (status, payload) =
          if (content.startsWith("HTTP/")) {
            val eol = content.indexOf("\r\n")
            val statusLine = if (eol < 0) content else content.substring(0, eol)
            val st = statusLine.split(" ", 3).lift(1)
              .flatMap(_.toIntOption).getOrElse(0)
            val blank = content.indexOf("\r\n\r\n")
            val body = if (blank < 0) "" else content.substring(blank + 4)
            (st, body)
          } else (0, content)
        out += WarcRecord(idx, headers.getOrElse("warc-type", ""),
          headers.getOrElse("warc-target-uri", ""),
          declared.getOrElse(content.length.toLong), status, payload)
        idx += 1
        pos = math.max(next, start + 5) // always advance
      }
    }
    out.toSeq
  }

  private val recordSchema = StructType(Seq(
    StructField("rec_idx", IntegerType, nullable = false),
    StructField("warc_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("http_status", IntegerType, nullable = false),
    StructField("payload", StringType, nullable = true)))

  /** Explode each (idCol, blobCol) row into its parsed records. Zero
    * shuffles — a streamed per-partition kernel over the two accessed
    * columns (the Dedup.shingleRows row idiom, no case-class round-trip). */
  def parseDf(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val outSchema = StructType(
      StructField(idCol, LongType, nullable = false) +: recordSchema.fields.toSeq)
    val src = df.select(col(idCol).cast("long"), col(blobCol).cast("string"))
    src.mapPartitions { it =>
      it.flatMap { row =>
        val id = row.getLong(0)
        val blob = if (row.isNullAt(1)) null else row.getString(1)
        parseRecords(blob).map(r =>
          Row(id, r.recIdx, r.warcType, r.targetUri, r.contentLength,
            r.httpStatus, r.payload))
      }
    }(Encoders.row(outSchema))
  }
}
