package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RAKE keyword extraction (Rose et al. 2010 — Rapid Automatic Keyword
  * Extraction): candidate phrases are maximal runs of non-stopword tokens;
  * each word's score is degree/frequency over the document's phrase set
  * (degree = Σ phrase length over the word's occurrences, rewarding words
  * that live inside long collocations); a phrase scores the sum of its
  * word scores. The per-document, corpus-independent complement to the
  * corpus-wide TF-IDF keyword and PMI collocation operators — the usual
  * cheap topic/tag signal attached to training documents at curation time.
  *
  * All arithmetic in integer milli: word score = 1000·deg div freq,
  * phrase score = Σ word milli scores; ties broken (score desc, phrase
  * asc). Distinct phrase strings are ranked once (re-occurrence already
  * feeds the scores through freq/deg).
  *
  * Shape at scale: the whole extraction is a zero-shuffle per-document
  * typed Row kernel (the shingleRows/Clones idiom) — no explode, no
  * (doc, word) shuffle at any corpus size; output is one bounded top-k
  * array per document, exploded to rows.
  */
object Rake {

  /** Fixed stopword list: the union of the four [[TextAnalysis.LangProfiles]]
    * plus the usual English function words. Deliberately small, versioned
    * with the operator (a swap changes phrase boundaries, not the math). */
  val Stopwords: Set[String] = Set(
    "the", "and", "of", "to", "in", "is", "a", "that",
    "it", "as", "for", "on", "with", "was", "are", "be", "by", "an",
    "or", "at", "from", "this", "but", "not", "we", "you", "they",
    "el", "la", "de", "que", "los", "las", "una", "es",
    "der", "die", "und", "das", "ist", "nicht", "ein", "zu",
    "le", "les", "des", "et", "est", "une", "dans")

  /** One lowercased scan: word tokens (the shared `\w`-class rule) and
    * punctuation runs interleave in order; a punctuation run OR a
    * stopword is a phrase boundary. Shared verbatim with the SQL oracle
    * (ASCII classes in both engines). */
  val TokenBoundaryPattern = "[a-z0-9_]+|[^a-z0-9_\\s]+"

  /** Top-k RAKE phrases of one document: (phrase, score_milli),
    * (score desc, phrase asc)-ordered. */
  def keywords(text: String, topK: Int): Seq[(String, Long)] = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    // maximal runs of non-stopword WORD tokens; punctuation and stopwords
    // both end the current run (classic RAKE boundaries)
    val m = java.util.regex.Pattern.compile(TokenBoundaryPattern)
      .matcher(text.toLowerCase)
    val phrases = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    var run = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) {
      val tk = m.group()
      val c = tk.charAt(0)
      val isWord = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_'
      if (!isWord || Stopwords(tk)) {
        if (run.nonEmpty) { phrases += run.toSeq; run = run.empty }
      } else run += tk
    }
    if (run.nonEmpty) phrases += run.toSeq
    if (phrases.isEmpty) return Seq.empty
    val freq = scala.collection.mutable.HashMap.empty[String, Long]
    val deg = scala.collection.mutable.HashMap.empty[String, Long]
    for (p <- phrases; w <- p) {
      freq.update(w, freq.getOrElse(w, 0L) + 1L)
      deg.update(w, deg.getOrElse(w, 0L) + p.length)
    }
    def wScore(w: String): Long = 1000L * deg(w) / freq(w)
    phrases.map(p => (p.mkString(" "), p.map(wScore).sum))
      .distinct    // same phrase string -> same token seq -> same score
      .sortBy { case (p, s) => (-s, p) }
      .take(topK).toSeq
  }

  /** Per-document top-k keyword rows: (idCol, phrase, score_milli, rank)
    * with rank 1-based in the (score desc, phrase asc) order. Documents
    * with no candidate phrase emit nothing. */
  def keywordsDf(df: DataFrame, idCol: String, textCol: String,
      topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{ArrayType, LongType, StringType,
      StructField, StructType}
    val entry = StructType(Seq(
      StructField("phrase", StringType, nullable = false),
      StructField("score_milli", LongType, nullable = false),
      StructField("rank", LongType, nullable = false)))
    val schema = StructType(Seq(df.schema(idCol),
      StructField("__ks", ArrayType(entry, containsNull = false),
        nullable = false)))
    df.select(col(idCol), col(textCol))
      .mapPartitions(_.map { r =>
        val ks = keywords(Option(r.getString(1)).getOrElse(""), topK)
        Row(r.get(0), ks.zipWithIndex.map { case ((p, s), i) =>
          Row(p, s, i + 1L)
        })
      })(Encoders.row(schema))
      .select(col(idCol), explode(col("__ks")).as("__k"))
      .select(col(idCol), col("__k.phrase").as("phrase"),
        col("__k.score_milli").as("score_milli"), col("__k.rank").as("rank"))
  }
}
