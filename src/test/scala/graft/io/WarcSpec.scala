package graft.io

import graft.SparkTestBase
import graft.io.Warc.WarcRecord

class WarcSpec extends SparkTestBase {
  import spark.implicits._

  private def record(wtype: String, uri: String, content: String,
      extraHeader: String = ""): String =
    s"WARC/1.0\r\nWARC-Type: $wtype\r\nWARC-Target-URI: $uri\r\n" +
      s"${extraHeader}Content-Length: ${content.length}\r\n\r\n$content\r\n\r\n"

  test("parseRecords: http split, multi-record, content-length shields payload") {
    val resp = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>hi</html>"
    val req = "GET /x HTTP/1.1"
    // the response BODY quotes a WARC header — a naive marker split breaks here
    val trap = "HTTP/1.1 200 OK\r\n\r\nsee WARC/1.0\r\nWARC-Type: fake\r\n\r\nafter"
    val blob = record("request", "https://a/x", req) +
      record("response", "https://a/x", resp) +
      record("response", "https://a/trap", trap) +
      record("metadata", "https://a/x", "k: v")
    val got = Warc.parseRecords(blob)
    assert(got == Seq(
      WarcRecord(0, "request", "https://a/x", req.length, 0, req),
      WarcRecord(1, "response", "https://a/x", resp.length, 200, "<html>hi</html>"),
      WarcRecord(2, "response", "https://a/trap", trap.length, 200,
        "see WARC/1.0\r\nWARC-Type: fake\r\n\r\nafter"),
      WarcRecord(3, "metadata", "https://a/x", 4, 0, "k: v")))
  }

  test("parseRecords tolerances: case-insensitive headers, missing length, truncation") {
    // lowercase header names are valid WARC
    val lc = "WARC/1.0\r\nwarc-type: response\r\ncontent-length: 2\r\n\r\nok\r\n\r\n"
    assert(Warc.parseRecords(lc) ==
      Seq(WarcRecord(0, "response", "", 2, 0, "ok")))
    // no Content-Length → scan to the next record's separator
    val noLen = "WARC/1.0\r\nWARC-Type: metadata\r\n\r\nfree text" +
      "\r\n\r\nWARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: 1\r\n\r\nz\r\n\r\n"
    val got = Warc.parseRecords(noLen)
    assert(got.map(r => (r.recIdx, r.payload)) == Seq(0 -> "free text", 1 -> "z"))
    assert(got.head.contentLength == 9) // measured, not declared
    // declared length beyond the blob → truncated tail, no crash
    val trunc = "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 999\r\n\r\nshort"
    assert(Warc.parseRecords(trunc) ==
      Seq(WarcRecord(0, "response", "", 999, 0, "short")))
    // garbage before the first record is skipped; null/empty are empty
    assert(Warc.parseRecords("noise then nothing").isEmpty)
    assert(Warc.parseRecords(null).isEmpty)
    assert(Warc.parseRecords("").isEmpty)
  }

  test("parseDf explodes records per doc with zero exchanges") {
    val blobA = record("response", "https://a/1",
      "HTTP/1.1 404 Not Found\r\n\r\ngone")
    val blobB = record("request", "https://b/2", "GET /2 HTTP/1.1") +
      record("response", "https://b/2", "HTTP/1.1 200 OK\r\n\r\nbody")
    val df = Seq((1L, blobA), (2L, blobB), (3L, "")).toDF("doc_id", "blob")
    val out = Warc.parseDf(df, "doc_id", "blob")
    val rows = out.as[(Long, Int, String, String, Long, Int, String)]
      .collect().sortBy(r => (r._1, r._2))
    assert(rows.map(r => (r._1, r._2, r._6, r._7)).toSeq == Seq(
      (1L, 0, 404, "gone"), (2L, 0, 0, "GET /2 HTTP/1.1"), (2L, 1, 200, "body")))
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
