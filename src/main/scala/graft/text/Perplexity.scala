package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CCNet-style language-model perplexity scoring: train a hashed-bigram
  * conditional model on a REFERENCE corpus (the "clean" text you trust),
  * then score every corpus document by its negative log-likelihood under
  * that model — the classic "drop the pages a clean-text LM finds
  * surprising" quality filter (Wenzek et al. 2020 use a 5-gram KenLM; the
  * hashed bigram keeps the same shape with a bounded, replayable state).
  *
  * Model: contexts hash into `ctxBuckets` (b1 = hash60(w1) mod B1) and
  * bigrams into `bigramBuckets` (b12 = hash60(w1 " " w2) mod B2), counted
  * JOINTLY on (b1, b12) — b12 alone would conflate bigrams from different
  * contexts. Add-one smoothing over the hashed event space:
  *
  *   p(bigram | context) = (c(b1,b12) + 1) / (c(b1) + B2)
  *
  * with two-level backoff for corpus events the reference never saw:
  * unseen bigram in a seen context → numerator 1; unseen context → the
  * constant 1/B2. Per-bigram cost is integerized to MICRO-NATS
  * (round(-ln p · 10⁶)) BEFORE the per-doc sum — the same exact-int64
  * discipline as [[Importance.dsirScores]], so partial aggregation order
  * can never move the result. Perplexity = exp(nll_micro / 10⁶ / n) when a
  * float is wanted; the operator returns the exact integers.
  *
  * Plan shape: reference side → two bounded aggs (joint table ≤ distinct
  * reference bigrams, context table ≤ B1 rows), both broadcast — the
  * corpus NEVER shuffles for the probe; corpus side → narrow bigram
  * explode, two broadcast left joins, one groupBy on the doc id. For a
  * reference corpus too big to broadcast, pass `broadcastModel = false`
  * and the joins shuffle on the hash keys like any equi-join.
  */
object Perplexity {

  /** (b1, b12) per bigram occurrence. Same bound-array discipline as
    * [[Importance.bigramBuckets]]: tokens materialized before the HOF. */
  private[text] def bigramRows(df: DataFrame, idCol: String, textCol: String,
      ctxBuckets: Int, bigramBuckets: Int): DataFrame = {
    val arr = df.select(col(idCol), TextAnalysis.tokensCol(col(textCol)).as("__t"))
    val t = col("__t")
    val pairs = when(size(t) < 2, array()).otherwise(
      transform(sequence(lit(0), size(t) - 2),
        i => struct(element_at(t, i + 1).as("w1"),
          concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2)).as("bg"))))
    arr.select(col(idCol), explode(pairs).as("__p"))
      .select(col(idCol),
        (TextAnalysis.hash60(col("__p.w1")) % ctxBuckets).as("b1"),
        (TextAnalysis.hash60(col("__p.bg")) % bigramBuckets).as("b12"))
  }

  /** Score `corpus` docs under a bigram model trained on `reference`.
    * Output: (idCol, n_bigrams, nll_micro) — exact integers; bigram-less
    * docs score (0, 0). */
  def lmScores(corpus: DataFrame, idCol: String, textCol: String,
      reference: DataFrame, refTextCol: String,
      ctxBuckets: Int = 1024, bigramBuckets: Int = 8192,
      broadcastModel: Boolean = true): DataFrame = {
    require(ctxBuckets > 0 && bigramBuckets > 0,
      s"buckets must be positive: $ctxBuckets, $bigramBuckets")
    val refB = graft.io.Persisted.track(
      bigramRows(reference.select(col(refTextCol)).withColumn("__rid", lit(0L)),
        "__rid", refTextCol, ctxBuckets, bigramBuckets)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val joint = refB.groupBy("b1", "b12").agg(count(lit(1)).as("__c12"))
    val ctx = refB.groupBy("b1").agg(count(lit(1)).as("__c1"))
    def hint(t: DataFrame): DataFrame = if (broadcastModel) broadcast(t) else t
    // per-event cost in micro-nats; -ln p = ln(denom) - ln(numer)
    val jointW = joint.join(ctx, Seq("b1"))
      .select(col("b1"), col("b12"),
        round((log((col("__c1") + bigramBuckets).cast("double")) -
          log((col("__c12") + 1).cast("double"))) * 1e6).cast("long").as("__wj"))
    val ctxW = ctx.select(col("b1"),
      round(log((col("__c1") + bigramBuckets).cast("double")) * 1e6)
        .cast("long").as("__wc"))
    val w0 = math.round(math.log(bigramBuckets.toDouble) * 1e6)
    val perDoc = bigramRows(corpus, idCol, textCol, ctxBuckets, bigramBuckets)
      .join(hint(jointW), Seq("b1", "b12"), "left")
      .join(hint(ctxW), Seq("b1"), "left")
      .select(col(idCol),
        coalesce(col("__wj"), col("__wc"), lit(w0)).as("__nll"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), sum("__nll").as("nll_micro"))
    corpus.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
      .withColumn("nll_micro", coalesce(col("nll_micro"), lit(0L)))
  }

  /** CCNet's head/middle/tail split (Wenzek et al. 2020 §4.3): per
    * language, rank documents by mean per-bigram NLL under the reference
    * LM and cut into perplexity TERCILES — "head" is the cleanest third
    * that pipelines keep outright, "tail" the third they drop or reserve.
    *
    * Mean cost = `nll_micro div n_bigrams` (exact integer division; both
    * engines truncate non-negative quotients identically), ties broken by
    * the id so the cut is total-ordered. The split is `ntile(3)` over a
    * per-language window — the same per-language sort CCNet itself runs;
    * Spark executes it as a hash-exchange on lang + in-partition sort,
    * which scales like any sort (a mega-language partition is the skew to
    * watch; production can swap in sampled thresholds, the exact tercile
    * is what the gate replays).
    *
    * Output: (idCol, langCol, n_bigrams, avg_nll_micro, ppl_bucket). */
  def pplBuckets(corpus: DataFrame, idCol: String, textCol: String,
      langCol: String, reference: DataFrame, refTextCol: String,
      ctxBuckets: Int = 1024, bigramBuckets: Int = 8192): DataFrame = {
    val scored = lmScores(corpus.select(col(idCol), col(textCol)),
      idCol, textCol, reference, refTextCol, ctxBuckets, bigramBuckets)
    val avg = coalesce(expr("nll_micro div nullif(n_bigrams, 0)"), lit(0L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(langCol)).orderBy(col("avg_nll_micro"), col(idCol))
    corpus.select(col(idCol), col(langCol))
      .join(scored, Seq(idCol))
      .withColumn("avg_nll_micro", avg)
      .withColumn("__nt", ntile(3).over(w))
      .withColumn("ppl_bucket",
        when(col("__nt") === 1, "head")
          .when(col("__nt") === 2, "middle").otherwise("tail"))
      .drop("__nt", "nll_micro")
  }

  /** Pure twin: same hashing, smoothing, backoff, and micro-nat rounding. */
  def lmScoresPure(corpus: Seq[(Long, String)], reference: Seq[String],
      ctxBuckets: Int, bigramBuckets: Int): Seq[(Long, Long, Long)] = {
    def rows(text: String): Seq[(Long, Long)] = {
      val t = TextAnalysis.tokens(text)
      if (t.length < 2) Seq.empty
      else t.sliding(2).map { p =>
        (TextAnalysis.hash60(p.head) % ctxBuckets,
          TextAnalysis.hash60(p.mkString(" ")) % bigramBuckets)
      }.toSeq
    }
    val ref = reference.flatMap(rows)
    val c12 = ref.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = ref.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    def micro(x: Double): Long =
      BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def w(b1: Long, b12: Long): Long = c1.get(b1) match {
      case Some(n1) =>
        val num = c12.getOrElse((b1, b12), 0L) + 1
        micro(math.log((n1 + bigramBuckets).toDouble) - math.log(num.toDouble))
      case None => micro(math.log(bigramBuckets.toDouble))
    }
    corpus.map { case (id, t) =>
      val bs = rows(t)
      (id, bs.size.toLong, bs.map((w _).tupled).sum)
    }
  }

  /** Second token of every bigram — the PREDICTED positions, hashed into
    * `uniBuckets`. Shares the token materialization discipline of
    * [[bigramRows]]. */
  private def predictedRows(df: DataFrame, idCol: String, textCol: String,
      uniBuckets: Int): DataFrame = {
    val arr = df.select(col(idCol),
      TextAnalysis.tokensCol(col(textCol)).as("__t"))
    val t = col("__t")
    val preds = when(size(t) < 2, expr("array()").cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(t) - 1),
        i => element_at(t, i + 1)))
    arr.select(col(idCol), explode(preds).as("__w"))
      .select(col(idCol),
        (TextAnalysis.hash60(col("__w")) % uniBuckets).as("bu"))
  }

  /** Per-document mean bigram information gain — the exact integer form of
    * "how much does the previous word predict the next one": over the
    * same predicted positions, unigram NLL minus bigram NLL, i.e. the
    * document's mean bigram PMI rate under the reference corpus (the
    * per-document aggregate of [[TextAnalysis.pmiCollocations]]'s
    * per-pair signal). The signal is RELATIVE: the hashed add-one
    * smoothing contributes a corpus-constant offset, so rankings within
    * one model are meaningful while the absolute sign is not. Shuffled
    * bag-of-words ranks at the bottom (context predicts nothing);
    * templated / machine-generated boilerplate ranks at the top
    * (continuations are deterministic) — the cheap predictability tier
    * of the perplexity-gap detector family.
    *
    * Unigram model: add-one over `uniBuckets` hash space,
    * p(w) = (c(b_w)+1)/(N_ref + B_u); bigram side = [[lmScores]]. Both
    * sides integerize per-event micro-nats before summation. gain_micro =
    * (nll_uni − nll_bi) div n_bigrams (0 for bigram-less docs; `div`
    * truncates toward zero in both engines, and the numerator can be
    * negative).
    *
    * Shape at scale: the reference builds one bounded unigram table
    * (≤ uniBuckets rows) next to lmScores' two; all are broadcast, the
    * corpus never shuffles for the probe, ONE doc-id groupBy each side. */
  def contextGain(corpus: DataFrame, idCol: String, textCol: String,
      reference: DataFrame, refTextCol: String,
      uniBuckets: Int = 4096, ctxBuckets: Int = 1024,
      bigramBuckets: Int = 8192, broadcastModel: Boolean = true): DataFrame = {
    require(uniBuckets > 0, s"uniBuckets must be positive: $uniBuckets")
    val bi = lmScores(corpus, idCol, textCol, reference, refTextCol,
      ctxBuckets, bigramBuckets, broadcastModel)
      .select(col(idCol), col("n_bigrams"),
        col("nll_micro").as("nll_bi_micro"))
    val refU = predictedRows(
      reference.select(col(refTextCol)).withColumn("__rid", lit(0L)),
      "__rid", refTextCol, uniBuckets)
      .groupBy("bu").agg(count(lit(1)).as("__cu"))
    val totU = refU.agg(sum("__cu").as("__nu"))
    def hint(t: DataFrame): DataFrame = if (broadcastModel) broadcast(t) else t
    val uniDoc = predictedRows(corpus, idCol, textCol, uniBuckets)
      .join(hint(refU), Seq("bu"), "left")
      .join(hint(totU))
      .select(col(idCol), round((log((col("__nu") + uniBuckets).cast("double")) -
        log((coalesce(col("__cu"), lit(0L)) + 1).cast("double"))) * 1e6)
        .cast("long").as("__nll"))
      .groupBy(idCol).agg(sum("__nll").as("nll_uni_micro"))
    bi.join(uniDoc, Seq(idCol), "left")
      .withColumn("nll_uni_micro", coalesce(col("nll_uni_micro"), lit(0L)))
      .withColumn("gain_micro", coalesce(
        expr("(nll_uni_micro - nll_bi_micro) div nullif(n_bigrams, 0)"),
        lit(0L)))
      .select(col(idCol), col("n_bigrams"), col("nll_uni_micro"),
        col("nll_bi_micro"), col("gain_micro"))
  }

  /** Pure twin of [[contextGain]]. */
  def contextGainPure(corpus: Seq[(Long, String)], reference: Seq[String],
      uniBuckets: Int, ctxBuckets: Int, bigramBuckets: Int)
      : Seq[(Long, Long, Long, Long, Long)] = {
    def micro(x: Double): Long =
      BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def preds(text: String): Seq[Long] = {
      val t = TextAnalysis.tokens(text)
      if (t.length < 2) Seq.empty
      else t.drop(1).map(w => TextAnalysis.hash60(w) % uniBuckets)
    }
    val refP = reference.flatMap(preds)
    val cu = refP.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val nu = refP.size.toLong
    val biScores = lmScoresPure(corpus, reference, ctxBuckets, bigramBuckets)
      .map(r => r._1 -> ((r._2, r._3))).toMap
    corpus.map { case (id, t) =>
      val ps = preds(t)
      val nllU = ps.map(b => micro(math.log((nu + uniBuckets).toDouble) -
        math.log((cu.getOrElse(b, 0L) + 1).toDouble))).sum
      val (n, nllB) = biScores(id)
      val gain = if (n == 0) 0L else (nllU - nllB) / n
      (id, n, nllU, nllB, gain)
    }
  }
}
