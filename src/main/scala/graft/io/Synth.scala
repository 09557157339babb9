package graft.io

import graft.model.{Doc, Kind, Span}
import graft.segment.PageSegmenter

import org.apache.spark.sql.{Dataset, SparkSession}

import java.util.Random
import scala.collection.mutable

/** Deterministic synthetic corpus of interleaved text+media documents
  * (FIXTURES.md §1). Everything derives from `(seed, doc index)` through
  * java.util.Random's specified LCG, so generation is a pure function of the
  * doc id — embarrassingly parallel, no driver-side loop, identical on every
  * run and at every parallelism level.
  *
  * The generated docs exercise every reference behavior the EP1 pipeline must
  * replay: dollar pages around the $200 boundary, skip-word pages, keyword
  * pages, gibberish OCR (strategy fallback), pages missing from one source
  * (full-outer placeholders), adjacent duplicate page markers (first-wins),
  * table spans, and media spans interleaved between text spans.
  */
object Synth {

  val DefaultSeed = 42L

  private val words = Array(
    "coverage", "policy", "premium", "building", "property", "limit",
    "insured", "schedule", "endorsement", "commercial", "general",
    "liability", "deductible", "occurrence", "aggregate", "location",
    "business", "income", "equipment", "protection", "certificate",
    "holder", "agent", "broker", "form", "edition", "section", "terms",
    "conditions", "declarations", "the", "of", "and", "for", "per",
    "each", "total", "annual", "payment", "value")

  private val keywordPool = graft.classify.Filters.InterestKeywords
  private val skipPool = graft.classify.Filters.SkipWords

  private def sentence(rng: Random, nWords: Int): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < nWords) {
      if (i > 0) sb.append(if (rng.nextInt(12) == 0) ".\n" else " ")
      sb.append(words(rng.nextInt(words.length)))
      i += 1
    }
    sb.toString
  }

  private def commaAmount(v: Long): String = {
    // 1234567 -> "1,234,567" without java.text locale dependence
    val s = v.toString
    s.reverse.grouped(3).mkString(",").reverse
  }

  private def gibberish(rng: Random): String = rng.nextInt(3) match {
    case 0 => "." * (1 + rng.nextInt(8)) // under min length
    case 1 => Seq.fill(60 + rng.nextInt(60))("").mkString(" ")
    case _ => Seq.fill(80 + rng.nextInt(40))("■◆▓").mkString("")
  }

  /** OCR noise: deterministic character confusions on ~3% of letters. */
  private def ocrNoise(rng: Random, s: String): String = {
    val arr = s.toCharArray
    var i = 0
    while (i < arr.length) {
      if (rng.nextInt(33) == 0) {
        arr(i) match {
          case 'o' => arr(i) = '0'
          case 'l' => arr(i) = '1'
          case 'e' => arr(i) = 'c'
          case 'a' => arr(i) = 'o'
          case _   => ()
        }
      }
      i += 1
    }
    new String(arr)
  }

  def mkDoc(id: Long, nPartitions: Int, seed: Long = DefaultSeed): Doc = {
    val rng = new Random(seed * 1000003L + id * 6364136223846793005L + 1442695040888963407L)
    val nPages = 4 + rng.nextInt(10)
    val docId = f"doc_$id%06d"

    val gibberishOcrDoc = rng.nextInt(10) == 0 // A2 fallback trigger
    // marker style is per-doc (mixing cases inside one doc would diverge
    // from the reference's P1 first-matching-pattern-wins cascade):
    // lowercase "Page n" (policy_filter.py:58) and CRLF line endings
    // (normalized by P3, tolerated by P1/P2's \s* bridges)
    val markerStyle = rng.nextInt(20)
    val bar = "=" * 80
    def marker(p: Int): String = markerStyle match {
      case 0 => s"\n$bar\nPage $p\n$bar\n"
      case 1 => s"\r\n$bar\r\nPAGE $p\r\n$bar\r\n"
      case _ => PageSegmenter.renderMarker(p)
    }
    val dupPage = if (rng.nextInt(20) == 0) 2 + rng.nextInt(math.max(1, nPages - 1)) else -1
    val ocrMissingPage = if (rng.nextInt(10) == 0) 1 + rng.nextInt(nPages) else -1
    val textMissingPage = if (rng.nextInt(10) == 0) 1 + rng.nextInt(nPages) else -1

    val spans = mutable.ArrayBuffer.empty[Span]
    var offset = 0
    def nextOffset(): Int = { val o = offset; offset += 1 + rng.nextInt(3); o }

    for (page <- 1 to nPages) {
      var body = sentence(rng, 60 + rng.nextInt(40))
      // feature injection
      val roll = rng.nextInt(100)
      if (roll < 22) {
        val amount =
          if (rng.nextInt(8) == 0) 50L + rng.nextInt(150) // below the $200 bar
          else 200L + rng.nextInt(2000000)
        body += s" coverage limit $$${commaAmount(amount)} per occurrence"
        if (rng.nextInt(12) == 0) body += " see EXAMPLE calculation" // skip word
      } else if (roll < 36) {
        body += " " + keywordPool(rng.nextInt(keywordPool.size)) + ": FIRST NATIONAL BANK"
        if (rng.nextInt(10) == 0) body += " " + skipPool(rng.nextInt(skipPool.size))
      }

      val mk = marker(page)
      val ocrBody = if (gibberishOcrDoc && rng.nextInt(4) != 0) gibberish(rng) else ocrNoise(rng, body)

      if (page != ocrMissingPage) spans += Span(Kind.Ocr, mk + ocrBody, "", nextOffset())
      if (page == dupPage) // adjacent duplicate marker: first occurrence wins
        spans += Span(Kind.Ocr, mk + "duplicate " + sentence(rng, 20), "", nextOffset())
      if (page != textMissingPage) spans += Span(Kind.Text, mk + body, "", nextOffset())

      if (rng.nextInt(100) < 12) {
        val rows = (1 to 2 + rng.nextInt(3))
          .map(r => s"item $r | ${words(rng.nextInt(words.length))} | $$${commaAmount(100L + rng.nextInt(9000))}")
        spans += Span(Kind.Table, rows.mkString("\n"), "", nextOffset())
      }
      if (rng.nextInt(100) < 15)
        spans += Span(Kind.Media, "", s"img://$docId/$page/${rng.nextInt(4)}", nextOffset())
    }
    Doc(docId, spans.toSeq, (id % nPartitions).toInt)
  }

  def generate(spark: SparkSession, nDocs: Long, nPartitions: Int = 16,
      seed: Long = DefaultSeed): Dataset[Doc] = {
    import spark.implicits._
    // explicit numPartitions: a bare spark.range(n) infers parallelism from
    // the cores REGISTERED at plan time — on a just-started cluster that is
    // the 2-partition fallback, and everything downstream (including the
    // cached corpus) then runs 2-wide forever. Content is a pure function
    // of id, so partitioning never affects the corpus itself.
    spark.range(0L, nDocs, 1L, nPartitions).map(id => mkDoc(id, nPartitions, seed))
  }
}
