package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** fastText-style hashed bag-of-n-grams linear classifier INFERENCE
  * (Joulin et al. 2016, "Bag of Tricks for Efficient Text Classification")
  * — the model family behind the wiki-vs-crawl quality classifiers that
  * curation pipelines (CCNet, GPT-3-style "books-like" scoring) run over
  * every document. Training happens offline; what a 100 TB pipeline needs
  * from the engine is the scoring pass, and that is what this implements:
  *
  *   features(doc) = word unigrams + bigrams of the lowercased tokens
  *                   ([[TextAnalysis.tokensCol]]), hashed into `buckets`
  *                   via the md5-derived [[TextAnalysis.hash60]];
  *   score(doc)    = Σ weight(bucket(f)) over all feature OCCURRENCES
  *                   (a multiset, as fastText averages all token vectors);
  *   label(doc)    = score > 0.
  *
  * Weights are integer MILLI-units so partial-aggregation order can never
  * move a sum — the same exact-int64 discipline as
  * [[Importance.dsirScores]] / [[Perplexity]]. The weight table is an
  * ordinary DataFrame `(bucket, weight_milli)`: load a trained model's
  * quantized weights in production, or [[syntheticWeights]] for a
  * self-contained deterministic model.
  *
  * Plan shape: narrow feature explode (no shuffle), ONE broadcast join
  * against the weight table (buckets·16 B — a 2²¹-bucket production model
  * is ~32 MB, comfortably broadcastable; pass `broadcastModel = false` to
  * shuffle on the bucket key instead), one groupBy on the doc id, and a
  * final left join so featureless documents score 0 rather than vanish.
  */
object Classifier {

  /** (id, bucket) per feature occurrence: unigrams then bigrams, hashed
    * with an "f:" domain prefix so classifier buckets never collide with
    * other hash60 uses by construction. */
  private[text] def featureRows(df: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame = {
    // bind the token array to a column FIRST: interpreted HOF lambdas
    // re-evaluate inlined expressions per element (the DSIR 4x trap)
    val arr = df.select(col(idCol), TextAnalysis.tokensCol(col(textCol)).as("__t"))
    val t = col("__t")
    val bigrams = when(size(t) < 2, array()).otherwise(
      transform(sequence(lit(0), size(t) - 2),
        i => concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2))))
    arr.select(col(idCol), explode(concat(t, bigrams)).as("__f"))
      .select(col(idCol),
        pmod(TextAnalysis.hash60(concat(lit("f:"), col("__f"))), lit(buckets))
          .as("bucket"))
  }

  /** Score every document against `weights` `(bucket, weight_milli)`.
    * Output: idCol, `n_features`, `score_milli`, `is_positive` — documents
    * with no features (or no text) keep a row with 0 / 0 / false. Buckets
    * absent from the weight table weigh 0. */
  def scoreLinear(docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, buckets: Int,
      broadcastModel: Boolean = true): DataFrame = {
    val w0 = weights.select(col("bucket"), col("weight_milli"))
    val w = if (broadcastModel) broadcast(w0) else w0
    val scored = featureRows(docs, idCol, textCol, buckets)
      .join(w, Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__n"),
        sum(coalesce(col("weight_milli"), lit(0L))).as("__s"))
    docs.select(col(idCol)).distinct()
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__n"), lit(0L)).as("n_features"),
        coalesce(col("__s"), lit(0L)).as("score_milli"),
        (coalesce(col("__s"), lit(0L)) > 0).as("is_positive"))
  }

  /** Deterministic self-contained weight table:
    * weight_milli(b) = (hash60("w:" + b) mod 2001) − 1000 ∈ [−1000, 1000].
    * Stands in for a trained model in contract queries and oracles (the
    * oracle derives the same weights from the same md5 arithmetic, so no
    * model file has to move between engines). */
  def syntheticWeights(spark: SparkSession, buckets: Int): DataFrame =
    spark.range(0, buckets, 1, math.min(buckets, 32))
      .select(col("id").as("bucket"),
        (pmod(TextAnalysis.hash60(concat(lit("w:"), col("id").cast("string"))),
          lit(2001L)) - 1000L).as("weight_milli"))

  // ------------------------------------------------------------ training --
  /** Floor division as a column: exact for |x| < 2^53 (gradient sums are
    * bounded by 1000·feature-occurrences, far below), floor (not truncate)
    * matching Scala's `Math.floorDiv`. Replay caution: DuckDB's integer
    * `//` TRUNCATES toward zero, so the oracle must spell out
    * `floor(x / k)` for negative gradients. */
  private def floorDivCol(x: org.apache.spark.sql.Column, k: Long) =
    floor(x.cast("double") / k).cast("long")

  /** Distributed training for the SAME hashed bag-of-n-grams linear model
    * [[scoreLinear]] serves: full-batch gradient descent, `rounds` synchronous
    * passes, every quantity integer MILLI so the learned weights are
    * bit-identical regardless of partitioning or aggregation order — the
    * property that makes a distributed trainer auditable (two clusters, or
    * an engine replay, produce the SAME model, not a statistically-similar
    * one).
    *
    * The nonlinearity is the HARD sigmoid σ̃(x) = clamp(½ + x/4, 0, 1)
    * (milli: clamp(500 + ⌊s/4⌋, 0, 1000)) — piecewise-linear on purpose:
    * exp() differs in the last ulp across engines/libms, a floor-div does
    * not. Update: w ← w − ⌊Σ_occurrences err_milli / lrDiv⌋ per bucket.
    *
    * Plan per round: ONE feature⋈weight broadcast join + per-doc sum (the
    * scoring pass), ONE per-bucket gradient sum, ONE outer merge into the
    * next weight table — all partial-aggregated, nothing collected; rounds
    * are driver-paced like [[graft.graph.PageRank]]. The feature relation is
    * computed once and persisted across rounds. Output: (bucket,
    * weight_milli) for every bucket any feature ever touched. */
  def trainLinear(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, buckets: Int, rounds: Int,
      lrDiv: Long = 64L): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    require(lrDiv >= 1, s"lrDiv must be >= 1: $lrDiv")
    val spark = docs.sparkSession
    import org.apache.spark.storage.StorageLevel
    val feats = graft.io.Persisted.track(
      featureRows(docs, idCol, textCol, buckets)
        .persist(StorageLevel.MEMORY_AND_DISK))
    val labels = docs.select(col(idCol),
      (col(labelCol).cast("long") * 1000L).as("__y"))
    var w: DataFrame = spark.range(0).select(col("id").as("bucket"),
      col("id").as("weight_milli"))
    for (_ <- 1 to rounds) {
      val scores = feats.join(broadcast(w), Seq("bucket"), "left")
        .groupBy(col(idCol))
        .agg(sum(coalesce(col("weight_milli"), lit(0L))).as("__s"))
      val err = labels.join(scores, Seq(idCol), "left")
        .select(col(idCol),
          (greatest(lit(0L), least(lit(1000L),
            lit(500L) + floorDivCol(coalesce(col("__s"), lit(0L)), 4L)))
            - col("__y")).as("__err"))
      val grad = feats.join(err, Seq(idCol))
        .groupBy("bucket").agg(sum(col("__err")).as("__g"))
      val next = w.join(grad, Seq("bucket"), "full")
        .select(col("bucket"),
          (coalesce(col("weight_milli"), lit(0L)) -
            floorDivCol(coalesce(col("__g"), lit(0L)), lrDiv))
            .as("weight_milli"))
      w = graft.io.Persisted.track(next.persist(StorageLevel.MEMORY_AND_DISK))
      w.count() // materialize so each round's plan starts from the cache
    }
    w
  }

  /** Pure twin of [[trainLinear]]: (bucket → weight_milli) after `rounds`. */
  def trainLinearPure(docs: Seq[(Long, String, Int)], buckets: Int,
      rounds: Int, lrDiv: Long = 64L): Map[Long, Long] = {
    val feats: Seq[(Long, Long)] = docs.flatMap { case (id, text, _) =>
      val t = TextAnalysis.tokens(text)
      (t ++ t.iterator.sliding(2).withPartial(false).map(_.mkString(" ")))
        .map(f => id -> math.floorMod(TextAnalysis.hash60("f:" + f), buckets.toLong))
    }
    val y = docs.map { case (id, _, l) => id -> l.toLong * 1000L }.toMap
    var w = Map.empty[Long, Long]
    for (_ <- 1 to rounds) {
      val s = feats.groupBy(_._1).view
        .mapValues(_.map { case (_, b) => w.getOrElse(b, 0L) }.sum).toMap
      val err = docs.map { case (id, _, _) =>
        val p = math.max(0L, math.min(1000L,
          500L + Math.floorDiv(s.getOrElse(id, 0L), 4L)))
        id -> (p - y(id))
      }.toMap
      val g = feats.groupBy(_._2).view
        .mapValues(_.map { case (id, _) => err(id) }.sum).toMap
      w = (w.keySet ++ g.keySet).map { b =>
        b -> (w.getOrElse(b, 0L) - Math.floorDiv(g.getOrElse(b, 0L), lrDiv))
      }.toMap
    }
    w
  }

  /** Pure twin of [[scoreLinear]] + [[syntheticWeights]] for one text. */
  def scoreLinearPure(text: String, buckets: Int): (Long, Long, Boolean) = {
    val t = TextAnalysis.tokens(text)
    val feats = t ++ t.iterator.sliding(2).withPartial(false)
      .map(_.mkString(" "))
    var s = 0L
    feats.foreach { f =>
      val b = math.floorMod(TextAnalysis.hash60("f:" + f), buckets.toLong)
      s += math.floorMod(TextAnalysis.hash60("w:" + b), 2001L) - 1000L
    }
    (feats.size.toLong, s, s > 0)
  }
}
