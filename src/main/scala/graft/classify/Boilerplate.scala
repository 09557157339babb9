package graft.classify

import graft.model.{Kind, Span}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Block-level boilerplate classifier — the north-star "text-density +
  * link-density heuristics à la Boilerpipe/Readability" stage, from scratch
  * over the span model.
  *
  * A document is split into blocks on blank lines; each block gets
  *  - `n_words`       — word count of the tag-stripped block text,
  *  - `n_link_words`  — word count inside `<a ...>...</a>` anchor bodies,
  *  - `link_density`  — n_link_words / max(n_words, 1)  (Boilerpipe's
  *                      strongest single signal: nav bars, footers and
  *                      related-links blocks are mostly anchor text),
  *  - `text_density`  — words per physical line (dense prose vs. sparse
  *                      chrome),
  * and a label:
  *  - `empty`       — no words after tag stripping (dropped from spans)
  *  - `boilerplate` — link_density > [[LinkDensityThreshold]] (dropped)
  *  - `heading`     — short block (<= [[HeadingMaxWords]] words) that does
  *                    not end in sentence punctuation
  *  - `body`        — everything else
  *
  * Both a pure-Scala form (typed pipeline, test oracle) and a Catalyst
  * `Column` form exist with identical semantics: they share the same Java
  * regex pattern strings and the same rounding (6 dp, HALF_UP), so the two
  * forms agree bit-for-bit (asserted in BoilerplateSpec) and an independent
  * engine can replay the classification from the patterns alone.
  *
  * Scale shape: pure per-row column expressions after a `posexplode` —
  * narrow, codegen-friendly, zero shuffles; the stage composes with EP1 as
  * a per-span map.
  */
object Boilerplate {

  val LinkDensityThreshold = 0.33
  val HeadingMaxWords = 12

  /** Blank-line block separator (greedy: runs of blank lines = one split). */
  val BlockSplitPattern = "\\n\\s*\\n"
  /** Any markup tag. */
  val TagPattern = "<[^>]*>"
  /** Anchor bodies (DOTALL + case-insensitive; group 1 = link text). */
  val AnchorPattern = "(?is)<a[^>]*>(.*?)</a>"
  /** Regex trim — used instead of String.strip for engine parity. */
  val TrimPattern = "^\\s+|\\s+$"
  /** Sentence-final punctuation that disqualifies a short block as heading. */
  val SentenceEndPattern = "[.!?]$"

  final case class Block(
      idx: Int, label: String, text: String, nWords: Int, nLinkWords: Int,
      linkDensity: Double, textDensity: Double)

  // ----------------------------------------------------------- pure form ---
  private val TagRe = java.util.regex.Pattern.compile(TagPattern)
  private val AnchorRe = java.util.regex.Pattern.compile(AnchorPattern)
  private val BlockSplitRe = java.util.regex.Pattern.compile(BlockSplitPattern)
  private val SentenceEndRe = java.util.regex.Pattern.compile(SentenceEndPattern)

  private def words(s: String): Int =
    s.split("\\s+").count(_.nonEmpty)

  private def round6(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  def classifyBlock(idx: Int, block: String): Block = {
    val tagless = TagRe.matcher(block).replaceAll(" ")
    val m = AnchorRe.matcher(block)
    val link = new StringBuilder
    while (m.find()) { if (link.nonEmpty) link.append(' '); link.append(m.group(1)) }
    val linkTagless = TagRe.matcher(link.toString).replaceAll(" ")
    val nWords = words(tagless)
    val nLinkWords = words(linkTagless)
    val stripped = tagless.replaceAll(TrimPattern, "")
    val clean = stripped.replaceAll("\\s+", " ")
    val nLines = stripped.count(_ == '\n') + 1
    val linkDensity = round6(nLinkWords.toDouble / math.max(nWords, 1))
    val textDensity = round6(nWords.toDouble / math.max(nLines, 1))
    val label =
      if (nWords == 0) "empty"
      else if (nLinkWords.toDouble / math.max(nWords, 1) > LinkDensityThreshold) "boilerplate"
      else if (nWords <= HeadingMaxWords && !SentenceEndRe.matcher(clean).find()) "heading"
      else "body"
    Block(idx, label, clean, nWords, nLinkWords, linkDensity, textDensity)
  }

  def classifyBlocks(content: String): Seq[Block] = {
    if (content == null) return Seq.empty
    BlockSplitRe.split(content, -1).toIndexedSeq.zipWithIndex.map {
      case (b, i) => classifyBlock(i, b)
    }
  }

  /** Main-content spans: heading/body blocks in document order, boilerplate
    * and empty blocks dropped, offsets renumbered 0..n — the stage's output
    * in the engine's span model. */
  def contentSpans(content: String): Seq[Span] =
    classifyBlocks(content)
      .filter(b => b.label == "heading" || b.label == "body")
      .zipWithIndex
      .map { case (b, i) => Span(b.label, b.text, "", i) }

  // --------------------------------------------------------- Column form ---
  /** Per-block classification columns over an already-exploded block column.
    * Returns (label, cleanText, nWords, nLinkWords, linkDensity, textDensity).
    */
  def blockCols(block: Column): Seq[(String, Column)] = {
    val tagless = regexp_replace(block, TagPattern, " ")
    val linkTagless = regexp_replace(
      array_join(regexp_extract_all(block, lit(AnchorPattern), lit(1)), " "),
      TagPattern, " ")
    def wordsOf(c: Column): Column = size(filter(split(c, "\\s+"), w => w =!= ""))
    val nWords = wordsOf(tagless)
    val nLinkWords = wordsOf(linkTagless)
    val stripped = regexp_replace(tagless, TrimPattern, "")
    val clean = regexp_replace(stripped, "\\s+", " ")
    val nLines = length(regexp_replace(stripped, "[^\\n]", "")) + 1
    val ldRaw = nLinkWords.cast("double") / greatest(nWords, lit(1)).cast("double")
    val label = when(nWords === 0, "empty")
      .when(ldRaw > LinkDensityThreshold, "boilerplate")
      .when(nWords <= HeadingMaxWords && !clean.rlike(SentenceEndPattern), "heading")
      .otherwise("body")
    Seq(
      "label" -> label,
      "text" -> clean,
      "n_words" -> nWords.cast("long"),
      "n_link_words" -> nLinkWords.cast("long"),
      "link_density" -> round(ldRaw, 6),
      "text_density" -> round(nWords.cast("double") / greatest(nLines, lit(1)).cast("double"), 6))
  }

  /** Declarative stage: one row per (id, block) with classification columns.
    * Narrow plan — split + posexplode + per-row expressions, no shuffle. */
  def blocksDf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val exploded = df
      .select(col(idCol), posexplode(split(col(textCol), BlockSplitPattern))
        .as(Seq("block_idx", "block")))
    val cols = blockCols(col("block"))
    exploded.select(
      col(idCol) +: col("block_idx").cast("long").as("block_idx") +:
        cols.map { case (n, c) => c.as(n) }: _*)
  }

  /** Declarative main-content filter: heading/body rows only, per-doc span
    * offsets renumbered by block order. `passthrough` columns of the input
    * (e.g. partition_id) ride along without a join back. */
  def contentSpansDf(df: DataFrame, idCol: String, textCol: String,
      passthrough: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(idCol).orderBy("block_idx")
    val keyCols: Seq[Column] = col(idCol) +: passthrough.map(col)
    val exploded = df.select(keyCols :+
      posexplode(split(col(textCol), BlockSplitPattern)).as(Seq("block_idx", "block")): _*)
    val cols = blockCols(col("block"))
    exploded
      .select(keyCols ++ (col("block_idx") +: cols.map { case (n, c) => c.as(n) }): _*)
      .filter(col("label").isin("heading", "body"))
      .withColumn("offset", row_number().over(w).cast("int") - 1)
      .select(keyCols ++ Seq(col("label").as("kind"), col("text"),
        lit("").as("media_ref"), col("offset")): _*)
  }
}
