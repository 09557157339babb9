package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR-style importance scoring (Data Selection via Importance Resampling,
  * Xie et al. 2023): score each corpus document by how much more likely its
  * hashed-bigram profile is under a small target distribution than under
  * the raw corpus — the standard "select pretraining data that looks like
  * the target domain" step.
  *
  * Estimator: bag-of-hashed-bigrams with Laplace smoothing. Bigrams hash
  * into `buckets` buckets; per bucket b,
  * p(b) = (count(b) + 1) / (total + buckets), estimated separately on the
  * target set and the raw corpus; a document's score is
  * Σ_bigrams ln(p_target(bucket) / p_raw(bucket)).
  *
  * Determinism across engines: each bucket's log-ratio is rounded
  * half-up to MICRO-NATS (×10⁶, a 64-bit integer) BEFORE the per-doc sum,
  * so the sum is exact integer arithmetic — order-independent, no float
  * accumulation drift between Spark's partial aggregation and any oracle's
  * single-threaded sum. The only float op is one `ln` per bucket (B values
  * corpus-wide), where a final 6-decimal rounding absorbs libm ulps.
  *
  * Plan shape: one narrow bigram explode per side; bucket count aggs
  * output ≤ `buckets` rows each (partial agg, tiny result); the weight
  * table (buckets rows) broadcasts into the corpus bigram stream; the
  * per-doc sum is one groupBy on the doc id; a final left join restores
  * bigram-less docs. The corpus shuffles only on (bucket → tiny) and
  * (doc id) — nothing quadratic, nothing collected.
  *
  * Output: one row per corpus doc — (id, n_bigrams, score_micro) where
  * `score_micro` is the summed log-ratio in micro-nats. Scores are a
  * RANKING signal (select top-k, or resample ∝ score as the paper does,
  * e.g. compose with [[Sampling.hashThreshold]]/top-k windows); their
  * absolute sign is not meaningful — with a small target set the
  * smoothing floor shifts the whole distribution negative. */
object Importance {

  /** One row per (id, bucket) per bigram occurrence (NOT distinct — DSIR
    * counts occurrences). Bucket = hash60 of the bigram mod `buckets`.
    * Built from the token array with transform+explode — completely
    * narrow, no per-doc window shuffle. */
  private[text] def bigramBuckets(df: DataFrame, idCol: String,
      textCol: String, buckets: Int): DataFrame = {
    // materialize the token array BEFORE the HOF: transform lambdas run
    // interpreted, so an inlined tokenize expression would re-execute the
    // regex split on every element access — O(tokens²) per doc (the same
    // bound-column rule minhashSignatureFromShingles documents). With __t
    // referenced several times, CollapseProject keeps it materialized.
    val arr = df.select(col(idCol), TextAnalysis.tokensCol(col(textCol)).as("__t"))
    val t = col("__t")
    val bigrams = when(size(t) < 2, array()).otherwise(
      transform(sequence(lit(0), size(t) - 2),
        i => concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2))))
    arr.select(col(idCol), explode(bigrams).as("__bg"))
      .select(col(idCol), (TextAnalysis.hash60(col("__bg")) % buckets).as("bucket"))
  }

  /** (bucket, w_micro) weight table: smoothed log-ratio per bucket in
    * micro-nats. Buckets unseen on both sides get the ratio of the two
    * smoothing floors (a constant), emitted only for observed buckets —
    * unobserved buckets never match a corpus bigram, so they are dead
    * weight by construction. Grand totals are the SUMS of the (≤ buckets
    * rows) per-bucket aggs — never a second full scan of either bigram
    * relation (every bigram lands in some bucket, so the sums are exact). */
  private[text] def bucketWeights(corpusB: DataFrame, targetB: DataFrame,
      buckets: Int): DataFrame = {
    val tc = targetB.groupBy("bucket").agg(count(lit(1)).as("__tc"))
    val rc = corpusB.groupBy("bucket").agg(count(lit(1)).as("__rc"))
    val tTot = tc.agg(coalesce(sum(col("__tc")), lit(0L)).as("__tt"))
    val rTot = rc.agg(coalesce(sum(col("__rc")), lit(0L)).as("__rt"))
    rc.join(tc, Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("__tc", "__rc"))
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .withColumn("w_micro",
        round(
          (log((col("__tc") + 1).cast("double") /
              (col("__tt") + lit(buckets)).cast("double")) -
           log((col("__rc") + 1).cast("double") /
              (col("__rt") + lit(buckets)).cast("double"))) * 1e6)
          .cast("long"))
      .select("bucket", "w_micro")
  }

  def dsirScores(corpus: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String,
      buckets: Int = 1024): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val corpusB = graft.io.Persisted.track(
      bigramBuckets(corpus, idCol, textCol, buckets)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // persisted: the target bigram pipeline (which may itself be an
    // expensive upstream chain, e.g. selection_e2e's cleaned corpus) feeds
    // both the per-bucket agg and its total inside bucketWeights
    val targetB = graft.io.Persisted.track(
      bigramBuckets(
        target.select(col(targetTextCol)).withColumn("__tid", lit(0L)),
        "__tid", targetTextCol, buckets)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val weights = bucketWeights(corpusB, targetB, buckets)
    val perDoc = corpusB
      .join(broadcast(weights), Seq("bucket"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), sum(col("w_micro")).as("score_micro"))
    corpus.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
      .withColumn("score_micro", coalesce(col("score_micro"), lit(0L)))
  }

  /** DoReMi-flavored mixture diagnostic: per-domain KL divergence from the
    * whole-corpus unigram distribution, KL(P_domain ‖ P_corpus), over
    * hashed unigram buckets with add-one smoothing — the "which slices of
    * my mixture drifted" number a 100 TB curation run recomputes per
    * snapshot (Xie et al. 2023 reweigh domains by exactly this kind of
    * divergence signal).
    *
    * Exactness: with d = n_domain + B and a_b = c_domain(b) + 1 (so
    * Σ_b a_b = d), KL = Σ_b (a_b/d)·(ln P − ln Q). Each ln is micro-nat
    * rounded per VALUE (the [[bucketWeights]] discipline), the weighted
    * sum runs in int64, and ONE truncated division by d lands the result:
    *   kl_micro = Σ_b a_b·((Lm(a_b) − Lm(d)) − (Lm(c_b) − Lm(q))) div d
    * with c_b/q the corpus-side counterparts. Both engines truncate
    * toward zero, so the replay is exact.
    *
    * Plan shape: one (domain, bucket) count shuffle; everything after is
    * ≤ |domains|·B rows — the zero-count grid comes from a crossJoin of
    * the per-domain totals with a B-row range, corpus tables broadcast.
    * Output: (domain, n_tokens, kl_micro), one row per domain. */
  def domainKl(df: DataFrame, domainCol: String, textCol: String,
      buckets: Int = 256): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val spark = df.sparkSession
    def lm(c: org.apache.spark.sql.Column) =
      round(log(c.cast("double")) * 1e6).cast("long")
    val tok = df.select(col(domainCol).as("domain"),
        explode(TextAnalysis.tokensCol(col(textCol))).as("__w"))
      .select(col("domain"),
        (TextAnalysis.hash60(col("__w")) % buckets).as("bucket"))
    val dc = graft.io.Persisted.track(
      tok.groupBy("domain", "bucket").agg(count(lit(1)).as("__cs"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val dn = dc.groupBy("domain").agg(sum("__cs").as("__ns"))
    val cc = dc.groupBy("bucket").agg(sum("__cs").as("__c"))
    val cn = cc.agg(sum("__c").as("__n"))
    val grid = dn.crossJoin(
      spark.range(0, buckets, 1, 1).select(col("id").as("bucket")))
    grid.join(dc, Seq("domain", "bucket"), "left")
      .join(broadcast(cc), Seq("bucket"), "left")
      .crossJoin(broadcast(cn))
      .select(col("domain"), col("__ns"),
        (coalesce(col("__cs"), lit(0L)) + 1).as("__a"),
        (coalesce(col("__c"), lit(0L)) + 1).as("__cb"),
        (col("__n") + buckets).as("__q"))
      .withColumn("__term", col("__a") *
        ((lm(col("__a")) - lm(col("__ns") + buckets)) -
         (lm(col("__cb")) - lm(col("__q")))))
      .groupBy("domain")
      .agg(max(col("__ns")).as("n_tokens"),
        expr(s"sum(__term) div (max(__ns) + $buckets)").as("kl_micro"))
  }

  /** Pure twin of [[domainKl]]. */
  def domainKlPure(rows: Seq[(String, String)], buckets: Int)
      : Seq[(String, Long, Long)] = {
    def lm(x: Long): Long =
      BigDecimal(math.log(x.toDouble) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val toks = rows.flatMap { case (dom, text) =>
      TextAnalysis.tokens(text)
        .map(w => dom -> math.floorMod(TextAnalysis.hash60(w), buckets.toLong))
    }
    val cc = toks.groupBy(_._2).map { case (b, v) => b -> v.size.toLong }
    val n = toks.size.toLong
    val q = n + buckets
    toks.groupBy(_._1).toSeq.map { case (dom, ts) =>
      val cs = ts.groupBy(_._2).map { case (b, v) => b -> v.size.toLong }
      val ns = ts.size.toLong
      val d = ns + buckets
      val s = (0L until buckets).map { b =>
        val a = cs.getOrElse(b, 0L) + 1
        val cb = cc.getOrElse(b, 0L) + 1
        a * ((lm(a) - lm(d)) - (lm(cb) - lm(q)))
      }.sum
      (dom, ns, s / d)
    }.sortBy(_._1)
  }

  /** Pure twin for spec cross-checking: (id, nBigrams, scoreMicro) rows
    * from in-memory corpora, same hashing/smoothing/rounding. */
  def dsirScoresPure(corpus: Seq[(Long, String)], target: Seq[String],
      buckets: Int): Seq[(Long, Long, Long)] = {
    def bg(text: String): Seq[Long] = {
      val t = TextAnalysis.tokens(text)
      if (t.length < 2) Seq.empty
      else t.sliding(2).map(p => TextAnalysis.hash60(p.mkString(" ")) % buckets).toSeq
    }
    val corpusB = corpus.map { case (id, t) => id -> bg(t) }
    val rc = corpusB.flatMap(_._2).groupBy(identity).map { case (b, v) => b -> v.size.toLong }
    val tcAll = target.flatMap(bg)
    val tc = tcAll.groupBy(identity).map { case (b, v) => b -> v.size.toLong }
    val rt = rc.values.sum; val tt = tcAll.size.toLong
    def w(b: Long): Long = {
      val lr = math.log((tc.getOrElse(b, 0L) + 1).toDouble / (tt + buckets)) -
        math.log((rc.getOrElse(b, 0L) + 1).toDouble / (rt + buckets))
      BigDecimal(lr * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    corpusB.map { case (id, bs) => (id, bs.size.toLong, bs.map(w).sum) }
  }
}
