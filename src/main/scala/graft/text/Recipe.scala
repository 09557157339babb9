package graft.text

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Data-recipe epoch planning — the "how many times does each source
  * repeat" table behind a fixed-token-budget pretraining mix (the
  * LLaMA/Gopher-style recipe: target mixture weights per source vs what
  * the corpus actually holds). Given per-source token inventories and
  * target milli-weights, the plan says how many tokens each source must
  * contribute (`needed_tokens`), what that means in epochs over the
  * available unique tokens (`epochs_milli`, 1000 = exactly one pass), and
  * flags the sources that must repeat (`oversampled`).
  *
  * All integer math (milli-weights, `div`), so the plan is bit-replayable
  * by any engine; the expensive input — per-source token counts — is one
  * partial-aggregated groupBy over the corpus (narrow scan, map-side
  * combine), everything after is arithmetic on a rows-per-source table.
  */
object Recipe {

  /** Per-source epoch plan. `weightsMilli` maps source → target weight in
    * milli units (callers normally make them sum to 1000; nothing is
    * renormalized — what you pass is the recipe). Sources present in the
    * corpus but absent from the map get weight 0 (excluded); map entries
    * with no corpus rows are dropped (nothing to sample).
    * Output: (source, src_tokens, weight_milli, needed_tokens,
    * epochs_milli, oversampled). */
  def epochPlan(df: DataFrame, sourceCol: String, textCol: String,
      weightsMilli: Map[String, Long], targetTokens: Long): DataFrame = {
    require(targetTokens > 0, s"targetTokens must be positive: $targetTokens")
    require(weightsMilli.values.forall(_ >= 0), "weights must be >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    val weights = weightsMilli.toSeq.toDF("__wsource", "weight_milli")
    val inv = df.groupBy(col(sourceCol).as("source"))
      .agg(sum(TextAnalysis.wsTokenCountCol(col(textCol)).cast("long"))
        .as("src_tokens"))
    inv.join(broadcast(weights), col("source") === col("__wsource"), "left")
      .na.fill(0L, Seq("weight_milli"))
      .drop("__wsource")
      .withColumn("needed_tokens",
        expr(s"(${targetTokens}L * weight_milli) div 1000"))
      .withColumn("epochs_milli",
        when(col("src_tokens") === 0, 0L)
          .otherwise(expr("(1000 * needed_tokens) div src_tokens")))
      .withColumn("oversampled", col("epochs_milli") > 1000)
  }

  /** Pure twin for the spec. */
  def epochPlanPure(tokensBySource: Map[String, Long],
      weightsMilli: Map[String, Long], targetTokens: Long)
      : Seq[(String, Long, Long, Long, Long, Boolean)] =
    tokensBySource.toSeq.sorted.map { case (src, toks) =>
      val w = weightsMilli.getOrElse(src, 0L)
      val needed = targetTokens * w / 1000
      val epochs = if (toks == 0) 0L else 1000 * needed / toks
      (src, toks, w, needed, epochs, epochs > 1000)
    }
}
