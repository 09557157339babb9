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
