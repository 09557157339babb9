package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The C4 line-level cleaning battery (Raffel et al. 2020, §2.2) — the
  * standard first-pass web-text cleaner between boilerplate stripping and
  * dedup in a training-data pipeline:
  *
  *  - a LINE survives iff, after trimming, it ends in a terminal
  *    punctuation mark (`.` `!` `?` `"` `'`), has at least
  *    [[MinWordsPerLine]] whitespace words, and does not mention
  *    "javascript" (case-insensitive);
  *  - a PAGE survives iff it keeps at least one line, the cleaned text has
  *    at least [[MinSentences]] sentence-final marks (`.` `!` `?`), and the
  *    ORIGINAL page contains neither the phrase "lorem ipsum"
  *    (case-insensitive) nor a curly bracket (code, not prose).
  *
  * The paper's dirty-word blocklist is a data-file swap (same contains()
  * shape as the javascript rule), not engine logic, and is omitted here.
  *
  * Both forms are pure functions of the text: the Column battery is a
  * zero-shuffle narrow projection (higher-order functions over the line
  * array — nothing leaves the row), so it runs at any corpus size, and the
  * pure twin lets specs and the DuckDB oracle replay it exactly.
  */
object C4 {

  val MinWordsPerLine = 3
  val MinSentences = 5

  /** Trimmed surviving lines of `text`, document order. Whitespace-regex
    * trim (not SQL `trim`, which strips only spaces) so a tab- or
    * CR-padded line is judged on its content in every engine. */
  def keptLinesCol(text: Column): Column =
    filter(transform(split(text, "\n"),
      l => regexp_replace(l, "^\\s+|\\s+$", "")), l =>
      l.rlike("[.!?\"']$") &&
        size(split(l, "\\s+")) >= MinWordsPerLine &&
        !contains(lower(l), lit("javascript")))

  /** Sentence-final punctuation count of already-cleaned text. */
  def sentenceCountCol(clean: Column): Column =
    size(regexp_extract_all(clean, lit("[.!?]"), lit(0))).cast("long")

  /** Page-level veto on the ORIGINAL text (lorem ipsum / curly brackets). */
  def pageVetoCol(text: Column): Column =
    contains(lower(text), lit("lorem ipsum")) ||
      contains(text, lit("{")) || contains(text, lit("}"))

  /** Full battery: doc id, cleaned text (kept lines newline-joined),
    * `n_lines_kept`, `n_sentences`, and the final `kept` verdict. */
  def cleanDf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = keptLinesCol(col(textCol))
    docs
      .select(col(idCol), col(textCol).as("__t"), lines.as("__lines"))
      .select(col(idCol),
        concat_ws("\n", col("__lines")).as("clean_text"),
        size(col("__lines")).cast("long").as("n_lines_kept"),
        sentenceCountCol(concat_ws("\n", col("__lines"))).as("n_sentences"),
        (size(col("__lines")) >= 1 &&
          sentenceCountCol(concat_ws("\n", col("__lines"))) >= MinSentences &&
          !pageVetoCol(col("__t"))).as("kept"))
  }

  /** Sentences of `text`: maximal runs ending in sentence-final
    * punctuation, plus the unterminated tail; trimmed, empties dropped.
    * No lookbehind (Java∩RE2), so the DuckDB oracle replays the split. */
  def sentencesCol(text: Column): Column =
    filter(transform(
      regexp_extract_all(text, lit("[^.!?]+[.!?]+|[^.!?]+$"), lit(0)),
      s => regexp_replace(s, "^\\s+|\\s+$", "")), s => s =!= "")

  /** Pure twin of [[sentencesCol]]. */
  def sentences(text: String): Seq[String] = {
    val m = java.util.regex.Pattern
      .compile("[^.!?]+[.!?]+|[^.!?]+$").matcher(text)
    val out = Seq.newBuilder[String]
    while (m.find()) {
      val s = m.group.replaceAll("^\\s+|\\s+$", "")
      if (s.nonEmpty) out += s
    }
    out.result()
  }

  /** The OTHER C4 dedup rule (Raffel et al. §2.2): occurrences of any
    * `k`-sentence span that appears more than once ACROSS the corpus are
    * removed, keeping exactly one — the first by (doc id, span index).
    * Returns the REMOVED occurrences: (idCol, span_idx, span_key), where
    * span_key is the 60-bit hash of the lowercased space-joined span.
    *
    * Plan: narrow positional span-hash explode, then ONE partial-agg
    * groupBy on span_key (arg-min survivor — hot boilerplate spans combine
    * map-side, the same skew discipline as substring dedup) and an
    * equi-join back to tag non-survivors. Never all-pairs. */
  def dupSentenceSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val sents = docs.select(col(idCol), sentencesCol(col(textCol)).as("__s"))
    val spans = sents.select(col(idCol), posexplode(
      when(size(col("__s")) < k, array()).otherwise(
        transform(sequence(lit(0), size(col("__s")) - k), i =>
          graft.text.TextAnalysis.hash60(
            lower(concat_ws(" ", slice(col("__s"), i + 1, lit(k))))))))
      .as(Seq("span_idx", "span_key")))
    val first = spans.groupBy("span_key").agg(
      min(struct(col(idCol), col("span_idx"))).as("__first"),
      count(lit(1)).as("__n"))
    spans.join(first, Seq("span_key"))
      .filter(col("__n") > 1 &&
        !(col(idCol) === col(s"__first.$idCol") &&
          col("span_idx") === col("__first.span_idx")))
      .select(col(idCol), col("span_idx"), col("span_key"))
  }

  /** Pure twin of [[cleanDf]] for one document:
    * (clean_text, n_lines_kept, n_sentences, kept). */
  def clean(text: String): (String, Long, Long, Boolean) = {
    val kept = text.split("\n", -1).toSeq
      .map(_.replaceAll("^\\s+|\\s+$", "")).filter { l =>
      l.nonEmpty && "[.!?\"']$".r.findFirstIn(l).isDefined &&
        l.split("\\s+").length >= MinWordsPerLine &&
        !l.toLowerCase.contains("javascript")
    }
    val cleanText = kept.mkString("\n")
    val nSentences = cleanText.count(c => c == '.' || c == '!' || c == '?').toLong
    val veto = text.toLowerCase.contains("lorem ipsum") ||
      text.contains("{") || text.contains("}")
    (cleanText, kept.size.toLong, nSentences,
      kept.nonEmpty && nSentences >= MinSentences && !veto)
  }
}
