package graft.qc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Span-sequence equality evaluation — the engine's acceptance invariant
  * ("extracted spans match the reference per document: (kind, text,
  * media_ref, order)") as a distributed metric instead of a driver-side
  * fixture diff, so a 10^12-document extraction run can be scored against a
  * gold table with the same machinery that produced it.
  *
  * Inputs are exploded span rows `(idCol, kind, text, media_ref, offset)`;
  * a document's span order is `offset` ascending (the interleave contract —
  * ties broken by (kind, text) so the index is total even on degenerate
  * input). Per document:
  *
  *   - `n_gold` / `n_actual`      span counts (0 for a side missing the doc)
  *   - `pos_matched`              positions where BOTH sides carry the same
  *                                (kind, text, media_ref) — null-safe
  *   - `bag_matched`              multiset intersection size, order ignored
  *                                (duplicate spans pair off one-to-one via a
  *                                per-duplicate rank) — `bag_matched >
  *                                pos_matched` diagnoses "content right,
  *                                order wrong"
  *   - `exact`                    the invariant: same length, every position
  *                                matched
  *   - `precision_milli` / `recall_milli` / `f1_milli`
  *                                bag-level, exact integer milli units
  *                                (`1000·x div y`; null when undefined) so
  *                                the metric replays bit-identically in any
  *                                engine
  *
  * Plan shape: one row_number window per side (hash exchange on the doc id +
  * in-partition sort), a co-keyed full-outer join on (id, idx) for the
  * positional count, an inner join on (id, kind, text, media_ref, dup_rank)
  * for the bag count, then per-doc partial aggs. Nothing is collected;
  * per-doc memory is one window partition (bounded by spans-per-doc, the
  * same bound the extraction pipeline already assumes).
  */
object SpanEval {

  /** (id, idx, payload): position index plus a 60-bit digest of the span
    * payload, so every exchange after this one carries longs instead of
    * the three strings. The encoding is collision-free by construction
    * (length-prefixed fields, null marked distinctly from any string —
    * 'N' vs 'S<len>:<bytes>'), so payload equality ⇔ null-safe
    * (kind, text, media_ref) equality up to md5 collisions (~2⁻⁶⁰ per
    * pair, the same budget every dedup operator here runs on). */
  private def indexed(df: DataFrame, idCol: String): DataFrame = {
    val enc = (c: org.apache.spark.sql.Column) =>
      when(c.isNull, lit("N"))
        .otherwise(concat(lit("S"), length(c).cast("string"), lit(":"), c))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("offset"), col("kind"), col("text"))
    df.select(col(idCol), col("kind"), col("text"), col("media_ref"),
      col("offset"))
      .withColumn("payload", graft.text.TextAnalysis.hash60(
        concat(enc(col("kind")), enc(col("text")), enc(col("media_ref")))))
      .withColumn("idx", row_number().over(w))
      .select(col(idCol), col("idx"), col("payload"))
  }

  def spanSeqEval(actual: DataFrame, gold: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val a = indexed(actual, idCol)
    val g = indexed(gold, idCol)

    // positional: full outer on (id, idx); a position matches when the
    // payload digests agree (⇔ null-safe field equality, see indexed)
    val aPos = a.select(col(idCol), col("idx"), col("payload").as("a_pay"))
    val gPos = g.select(col(idCol), col("idx"), col("payload").as("g_pay"))
    val pos = aPos.join(gPos, Seq(idCol, "idx"), "full_outer")
      .groupBy(col(idCol))
      .agg(
        count(col("a_pay")).as("n_actual"),
        count(col("g_pay")).as("n_gold"),
        sum(when(col("a_pay") <=> col("g_pay"), 1L).otherwise(0L))
          .as("pos_matched"))

    // bag: rank duplicates of the same payload within a doc on each side so
    // multiset intersection = inner join on the rank too
    def ranked(df: DataFrame) = df.withColumn("dup_rank",
      row_number().over(Window.partitionBy(col(idCol), col("payload"))
        .orderBy(col("idx"))))
    val bag = ranked(a).select(col(idCol), col("payload"), col("dup_rank"))
      .join(ranked(g).select(col(idCol), col("payload"), col("dup_rank")),
        Seq(idCol, "payload", "dup_rank"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("bag_matched"))

    pos.join(bag, Seq(idCol), "left_outer")
      .select(col(idCol), col("n_gold"), col("n_actual"), col("pos_matched"),
        coalesce(col("bag_matched"), lit(0L)).as("bag_matched"))
      .withColumn("exact",
        col("n_gold") === col("n_actual") && col("pos_matched") === col("n_gold"))
      .withColumn("precision_milli",
        when(col("n_actual") > 0, expr("(1000 * bag_matched) div n_actual")))
      .withColumn("recall_milli",
        when(col("n_gold") > 0, expr("(1000 * bag_matched) div n_gold")))
      .withColumn("f1_milli",
        when(coalesce(col("precision_milli"), lit(0L)) +
          coalesce(col("recall_milli"), lit(0L)) > 0,
          expr("(2 * precision_milli * recall_milli) div " +
            "(precision_milli + recall_milli)")))
  }

  /** Corpus roll-up of [[spanSeqEval]]: document exact-match rate and span
    * micro P/R in exact milli units — the one-row summary a 100 TB run
    * reports. */
  def spanSeqSummary(perDoc: DataFrame): DataFrame =
    perDoc.agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("exact"), 1L).otherwise(0L)).as("n_exact"),
      sum("n_gold").as("gold_spans"),
      sum("n_actual").as("actual_spans"),
      sum("bag_matched").as("bag_matched"))
      .select(col("n_docs"), col("n_exact"),
        expr("(1000 * n_exact) div n_docs").as("exact_rate_milli"),
        col("gold_spans"), col("actual_spans"),
        when(col("actual_spans") > 0,
          expr("(1000 * bag_matched) div actual_spans")).as("micro_precision_milli"),
        when(col("gold_spans") > 0,
          expr("(1000 * bag_matched) div gold_spans")).as("micro_recall_milli"))
}
