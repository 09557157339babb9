package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interpolated Kneser–Ney bigram language-model estimation (Kneser & Ney
  * 1995; Chen & Goodman 1998) — the smoothing KenLM-style trainers apply
  * to web-corpus counts before a CCNet-style perplexity filter can use
  * them. The distributed job is COUNTING; the smoothed probability is a
  * closed form over four count tables:
  *
  *   c(w1 w2)    bigram occurrences
  *   c(w1)       = Σ_w2 c(w1 w2)     (context occurrences)
  *   N1+(w1 •)   distinct continuations of w1
  *   N1+(• w2)   distinct contexts preceding w2   (the KN novelty:
  *               continuation probability counts TYPES, not tokens)
  *   T           = Σ_w2 N1+(• w2) = distinct bigram types
  *
  *   P_KN(w2|w1) = max(c(w1 w2) − D, 0)/c(w1)
  *               + (D·N1+(w1 •)/c(w1)) · (N1+(• w2)/T)      with D = 3/4.
  *
  * Carrying D as the exact rational 3/4 makes the whole probability one
  * integer division:
  *
  *   p_micro = ⌊(max(4·c12 − 3, 0)·T + 3·N1f·N1b) · 10⁶ / (4·c1·T)⌋
  *
  * — exact in int64 while 4·c12·T·10⁶ < 2⁶³ (c12·T ≲ 2.3e12; a full
  * 100 TB vocabulary run promotes the two products to DECIMAL(38,0), the
  * counts themselves never overflow). Every quantity is a pure function of
  * the corpus multiset, so DuckDB replays the model head bit-for-bit.
  *
  * Plan shape: narrow bigram explode, one groupBy on (w1, w2) — partial
  * aggregation does the heavy lifting — then three SMALL aggregations over
  * the bigram-type table (on w1, on w2, and a one-row total that rides a
  * broadcast cross join). No join ever touches the raw corpus again.
  */
object KneserNey {

  /** (w1, w2, c12) over all bigram occurrences in `textCol`. */
  private[text] def bigramCounts(df: DataFrame, textCol: String): DataFrame = {
    val arr = df.select(TextAnalysis.tokensCol(col(textCol)).as("__t"))
    val t = col("__t")
    val pairs = when(size(t) < 2, array()).otherwise(
      transform(sequence(lit(0), size(t) - 2),
        i => struct(element_at(t, i + 1).as("w1"), element_at(t, i + 2).as("w2"))))
    arr.select(explode(pairs).as("__p"))
      .groupBy(col("__p.w1").as("w1"), col("__p.w2").as("w2"))
      .agg(count(lit(1)).as("c12"))
  }

  /** The model head: top `k` bigrams by (c12 desc, w1, w2) with all four
    * counts, the type total, and the exact-integer smoothed probability.
    * Output: (w1, w2, c12, c1, n1f, n1b, t_types, pkn_micro). */
  def knBigramLm(df: DataFrame, textCol: String, k: Int = 100): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val bc = graft.io.Persisted.track(bigramCounts(df, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val ctx = bc.groupBy("w1")
      .agg(sum("c12").as("c1"), count(lit(1)).as("n1f"))
    val cont = bc.groupBy("w2").agg(count(lit(1)).as("n1b"))
    val total = cont.agg(sum("n1b").as("t_types"))
    bc.join(ctx, Seq("w1")).join(cont, Seq("w2"))
      .crossJoin(broadcast(total))
      .withColumn("pkn_micro", expr(
        "(greatest(4 * c12 - 3, 0L) * t_types + 3 * n1f * n1b) * 1000000L" +
          " div (4 * c1 * t_types)"))
      .select("w1", "w2", "c12", "c1", "n1f", "n1b", "t_types", "pkn_micro")
      .orderBy(col("c12").desc, col("w1"), col("w2")).limit(k)
  }

  /** Pure twin over an in-memory corpus. */
  def knBigramLmPure(texts: Seq[String], k: Int)
      : Seq[(String, String, Long, Long, Long, Long, Long, Long)] = {
    val bigrams = texts.flatMap { s =>
      val t = TextAnalysis.tokens(s)
      t.iterator.sliding(2).withPartial(false).map(p => (p.head, p(1))).toSeq
    }
    val c12 = bigrams.groupBy(identity).map { case (p, v) => p -> v.size.toLong }
    val c1 = bigrams.groupBy(_._1).map { case (w, v) => w -> v.size.toLong }
    val n1f = c12.keys.toSeq.groupBy(_._1).map { case (w, v) => w -> v.size.toLong }
    val n1b = c12.keys.toSeq.groupBy(_._2).map { case (w, v) => w -> v.size.toLong }
    val t = c12.size.toLong
    c12.toSeq.map { case ((w1, w2), c) =>
      val p = (math.max(4 * c - 3, 0L) * t + 3 * n1f(w1) * n1b(w2)) * 1000000L /
        (4 * c1(w1) * t)
      (w1, w2, c, c1(w1), n1f(w1), n1b(w2), t, p)
    }.sortBy { case (w1, w2, c, _, _, _, _, _) => (-c, w1, w2) }.take(k)
  }
}
