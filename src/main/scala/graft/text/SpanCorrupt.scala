package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** T5-style span corruption (Raffel et al. 2020 §3.1.4): mask contiguous
  * token spans, replace each with a numbered sentinel in the encoder input,
  * and emit the masked spans (each prefixed by its sentinel) as the decoder
  * target. This is the data-prep step that turns a curated corpus into
  * actual denoising training examples.
  *
  * Deterministic, parallel variant: instead of an RNG walk (sequential,
  * engine-dependent), tokens are cut into fixed blocks of `blockTokens`;
  * block b of a document masks its FIRST s_b tokens where
  * s_b = hash60("sc:<id>:<b>") mod (maxSpan+1). Expected corruption rate =
  * (maxSpan/2)/blockTokens (defaults 3/2/10 = 15%, T5's rate), expected
  * span length maxSpan/2 over masking blocks. Any engine replays the
  * masking exactly; a seed-style variant just changes the hash prefix.
  *
  * Shape at scale: completely NARROW — per-row array math (transform /
  * slice / flatten, all codegen'd), no shuffle, no state. The per-row cost
  * is O(tokens + blocks²) (the block-prefix sentinel numbering is a
  * quadratic over ~tens of blocks, negligible against tokenization).
  */
object SpanCorrupt {

  /** Append (input_text, target_text, n_spans, n_masked) to `df`.
    * `input_text` ++ spans-in-`target_text` reconstructs the
    * whitespace-canonicalized document exactly (spec-asserted). */
  def corrupt(df: DataFrame, idCol: String, textCol: String,
      blockTokens: Int = 10, maxSpan: Int = 3): DataFrame = {
    require(blockTokens >= 2, s"blockTokens must be >= 2: $blockTokens")
    require(maxSpan >= 1 && maxSpan < blockTokens,
      s"maxSpan must be in [1, blockTokens): $maxSpan")
    val B = blockTokens.toLong
    val trimmed = regexp_replace(col(textCol), "^\\s+|\\s+$", "")
    val toks = when(length(trimmed) === 0, expr("array()").cast("array<string>"))
      .otherwise(split(trimmed, "\\s+"))

    val emptyStr = expr("array()").cast("array<string>")
    def sEff(b: Column) =
      least(element_at(col("__sb"), (b + 1).cast("int")), col("__n") - b * B)
    def blockLen(b: Column) = least(lit(B), col("__n") - b * B)
    def prefixSpans(b: Column) =
      size(filter(slice(col("__sb"), lit(1), b.cast("int")), x => x > 0))
        .cast("long")
    def sentinel(b: Column) =
      concat(lit("<extra_id_"), prefixSpans(b).cast("string"), lit(">"))

    val seqb = when(col("__nb") > 0, sequence(lit(0L), col("__nb") - 1))
      .otherwise(expr("array()").cast("array<bigint>"))

    df.withColumn("__toks", toks)
      .withColumn("__n", size(col("__toks")).cast("long"))
      .withColumn("__nb", expr(s"(__n + ${B - 1}) div $B"))
      .withColumn("__sb", when(col("__nb") > 0,
        transform(sequence(lit(0L), col("__nb") - 1), b =>
          pmod(TextAnalysis.hash60(
            concat_ws(":", lit("sc"), col(idCol), b)), lit(maxSpan + 1L))))
        .otherwise(expr("array()").cast("array<bigint>")))
      .withColumn("input_text", concat_ws(" ",
        flatten(transform(seqb, b => concat(
          when(sEff(b) > 0, array(sentinel(b))).otherwise(emptyStr),
          slice(col("__toks"), (b * B + sEff(b) + 1).cast("int"),
            (blockLen(b) - sEff(b)).cast("int")))))))
      .withColumn("target_text", concat_ws(" ",
        flatten(transform(seqb, b =>
          when(sEff(b) > 0, concat(array(sentinel(b)),
            slice(col("__toks"), (b * B + 1).cast("int"), sEff(b).cast("int"))))
            .otherwise(emptyStr)))))
      .withColumn("n_spans", aggregate(seqb, lit(0L),
        (acc, b) => acc + when(sEff(b) > 0, 1L).otherwise(0L)))
      .withColumn("n_masked", aggregate(seqb, lit(0L),
        (acc, b) => acc + when(sEff(b) > 0, sEff(b)).otherwise(0L)))
      .drop("__toks", "__n", "__nb", "__sb")
  }

  /** Pure twin of [[corrupt]] for one document. */
  def corruptPure(id: Long, text: String, blockTokens: Int = 10,
      maxSpan: Int = 3): (String, String, Long, Long) = {
    val toks = {
      val t = text.replaceAll("^\\s+|\\s+$", "")
      if (t.isEmpty) Array.empty[String] else t.split("\\s+")
    }
    val n = toks.length
    val nb = (n + blockTokens - 1) / blockTokens
    val sb = (0 until nb).map(b =>
      java.lang.Long.remainderUnsigned(
        TextAnalysis.hash60(s"sc:$id:$b"), maxSpan + 1L))
    val input = new StringBuilder
    val target = new StringBuilder
    var spans = 0L
    var masked = 0L
    for (b <- 0 until nb) {
      val base = b * blockTokens
      val se = math.min(sb(b), (n - base).toLong).toInt
      val bl = math.min(blockTokens, n - base)
      if (se > 0) {
        val sent = s"<extra_id_$spans>"
        if (input.nonEmpty) input += ' '
        input ++= sent
        if (target.nonEmpty) target += ' '
        target ++= (sent +: toks.slice(base, base + se)).mkString(" ")
        spans += 1
        masked += se
      }
      val rest = toks.slice(base + se, base + bl)
      if (rest.nonEmpty) {
        if (input.nonEmpty) input += ' '
        input ++= rest.mkString(" ")
      }
    }
    (input.toString, target.toString, spans, masked)
  }
}
