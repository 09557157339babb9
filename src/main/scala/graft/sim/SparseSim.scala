package graft.sim

import graft.text.TextAnalysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sparse TF-IDF cosine similarity over raw text — the lexical sibling of
  * the dense-embedding near-dup family in [[Similarity]]: no embedding
  * model needed, candidates come from the inverted index itself (docs must
  * share a surviving token to pair), and the `maxDf` stopword cap is the
  * scale lever that keeps the index join from exploding on corpus-hot
  * tokens, exactly like the shingle cap in
  * [[graft.dedup.Dedup.jaccardPairs]].
  *
  * Determinism across engines: IDF is integerized to MILLI-nats
  * (idf_milli = round(ln((N+1)/(df+1))·1000) + 1000) so per-token weights
  * w = tf·idf_milli, dot products, and squared norms are all EXACT int64
  * arithmetic — order-independent under partial aggregation. Bounds: with
  * per-doc tf ≤ 10⁴ and idf_milli ≤ 33·1000 (N ≤ 10¹²⁄₍df=1₎ gives
  * ln ≈ 27.6), w ≤ 3.3·10⁸, w² ≤ 1.1·10¹⁷, and a 10⁵-token doc's norm²
  * stays under 10²² only if docs are bounded — practical corpora keep
  * w² sums < 2⁶³ by orders of magnitude. The ONLY float ops are one `ln`
  * per vocab term and the final cosine (sqrt/divide, rounded to 6dp),
  * both IEEE-identical in any engine.
  */
object SparseSim {

  /** All document pairs with TF-IDF cosine ≥ `minCos`, candidates generated
    * by the shared-token inverted index.
    *
    * Plan: tokenize+count → one (id, token) shuffle; vocab-sized df agg;
    * the weight relation is persisted ([[graft.io.Persisted]] contract —
    * caller releases after materializing) and feeds the norm agg and both
    * self-join sides; pair dot products group on (id_a, id_b). Nothing is
    * collected; with `maxDf` on, per-token join fan-out is ≤ maxDf².
    *
    * `maxDf = 0` disables the cap (small corpora / oracle parity).
    * Output: (id_a, id_b, cosine), id_a < id_b. */
  def tfidfPairs(df: DataFrame, idCol: String, textCol: String,
      minCos: Double, maxDf: Int = 0): DataFrame = {
    require(minCos >= 0 && minCos <= 1, s"minCos out of range: $minCos")
    val tf = graft.io.Persisted.track(
      df.select(col(idCol), explode(TextAnalysis.tokensCol(col(textCol))).as("__tok"))
        .groupBy(col(idCol), col("__tok"))
        .agg(count(lit(1)).as("__tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val dfreq0 = tf.groupBy("__tok").agg(count(lit(1)).as("__dfreq"))
    val dfreq = if (maxDf > 0) dfreq0.filter(col("__dfreq") <= maxDf) else dfreq0
    val n = tf.select(count_distinct(col(idCol)).as("__n"))
    val idf = dfreq.crossJoin(broadcast(n))
      .select(col("__tok"),
        (round(log((col("__n") + 1).cast("double") /
            (col("__dfreq") + 1).cast("double")) * 1000).cast("long") + 1000L)
          .as("__idfm"))
    // weight relation: feeds the norm agg and both pair-join sides
    val w = graft.io.Persisted.track(
      tf.join(idf, Seq("__tok"))
        .select(col(idCol), col("__tok"), (col("__tf") * col("__idfm")).as("__w"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val norms = w.groupBy(idCol).agg(sum(col("__w") * col("__w")).as("__n2"))
    val a = w.select(col("__tok"), col(idCol).as("id_a"), col("__w").as("__wa"))
    val b = w.select(col("__tok"), col(idCol).as("id_b"), col("__w").as("__wb"))
    val dots = a.join(b, Seq("__tok")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(sum(col("__wa") * col("__wb")).as("__dot"))
    dots
      .join(norms.select(col(idCol).as("id_a"), col("__n2").as("__na")), Seq("id_a"))
      .join(norms.select(col(idCol).as("id_b"), col("__n2").as("__nb")), Seq("id_b"))
      .withColumn("cosine", round(col("__dot").cast("double") /
        (sqrt(col("__na").cast("double")) * sqrt(col("__nb").cast("double"))), 6))
      .filter(col("cosine") >= minCos)
      .select("id_a", "id_b", "cosine")
  }

  /** BM25 top-k retrieval (Robertson/Spärck Jones; Lucene's non-negative
    * idf form): score every corpus doc against each query string and keep
    * the k best per query — the retrieval step of targeted data selection
    * ("find the documents most like these probes") next to [[tfidfPairs]]'
    * all-pairs shape.
    *
    *   idf_milli(t) = round(ln((N - df + 0.5)/(df + 0.5) + 1) · 1000)
    *   score(q,d)   = Σ_{t ∈ q∩d} round(idf_milli(t) · tf·(k1+1) /
    *                    (tf + k1·(1 − b + b·dl·1000/avgdl_milli)))   [micro-ish]
    *
    * Every rounded term is a deterministic function of exact integers
    * (tf, dl, avgdl_milli, df, N), rounded ONCE — so the per-(query, doc)
    * sum is exact int64 and any engine replays it. Repeated query terms
    * count once (qtf = 1), the common simplification.
    *
    * Plan: corpus → (id, tok, tf) shuffle + dl agg; the QUERY side is tiny
    * by construction and broadcasts into the token join — the corpus never
    * reshuffles per query; ranking is one row_number window per query
    * (deterministic tie-break on doc id). Output: (qid, id, rank,
    * score_milli). */
  /** Top-k TF-IDF keywords per document — the cheap doc-tagging /
    * topic-hinting pass (cluster labels, index facets) run after curation.
    * idf_micro = round(ln((N+1)/(df_t+1))·10⁶) — add-one smoothed so
    * corpus-universal terms keep a finite (near-zero) weight; score =
    * tf·idf_micro is exact int64; rank = row_number by (score desc, term)
    * per doc, a total order because terms are unique within a doc.
    *
    * Plan: one (id, term) count shuffle; the vocab-sized df agg and the
    * one-row N both broadcast; one per-doc window caps the output at k
    * rows/doc. Token-less documents emit no rows (nothing to rank).
    * Output: (idCol, rnk, term, tf, df_t, score_micro). */
  def tfidfKeywords(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    import org.apache.spark.sql.expressions.Window
    val tf = graft.io.Persisted.track(
      df.select(col(idCol),
          explode(TextAnalysis.tokensCol(col(textCol))).as("term"))
        .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df_t"))
    val n = df.agg(count(lit(1)).as("__n")) // one row per document by contract
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_micro").desc, col("term"))
    tf.join(broadcast(dfT), Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("idf_micro",
        round(log((col("__n") + 1).cast("double") /
          (col("df_t") + 1).cast("double")) * 1e6).cast("long"))
      .withColumn("score_micro", col("tf") * col("idf_micro"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("rnk"), col("term"), col("tf"),
        col("df_t"), col("score_micro"))
  }

  /** Pure twin of [[tfidfKeywords]]. */
  def tfidfKeywordsPure(docs: Seq[(Long, String)], k: Int)
      : Seq[(Long, Int, String, Long, Long, Long)] = {
    def micro(x: Double): Long =
      BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val tf = docs.flatMap { case (id, t) =>
      TextAnalysis.tokens(t).groupBy(identity)
        .map { case (w, v) => (id, w, v.size.toLong) }
    }
    val dfT = tf.groupBy(_._2).map { case (w, v) => w -> v.size.toLong }
    val n = docs.size.toLong
    tf.groupBy(_._1).toSeq.flatMap { case (id, ts) =>
      ts.map { case (_, w, c) =>
          val idf = micro(math.log((n + 1).toDouble / (dfT(w) + 1)))
          (w, c, dfT(w), c * idf)
        }
        .sortBy { case (w, _, _, s) => (-s, w) }.take(k).zipWithIndex
        .map { case ((w, c, d, s), i) => (id, i + 1, w, c, d, s) }
    }.sortBy(r => (r._1, r._2))
  }

  def bm25TopK(corpus: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qTextCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    import org.apache.spark.sql.expressions.Window
    val tf = graft.io.Persisted.track(
      corpus.select(col(idCol), explode(TextAnalysis.tokensCol(col(textCol))).as("__tok"))
        .groupBy(col(idCol), col("__tok"))
        .agg(count(lit(1)).as("__tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val dl = tf.groupBy(idCol).agg(sum("__tf").as("__dl"))
    val stats = dl.agg(count(lit(1)).as("__n"),
      round(avg(col("__dl")) * 1000).cast("long").as("__avgdlm"))
    val dfreq = tf.groupBy("__tok").agg(count(lit(1)).as("__df"))
    val qtok = queries
      .select(col(qidCol), explode(TextAnalysis.tokensCol(col(qTextCol))).as("__tok"))
      .distinct()
    val idf = dfreq.join(broadcast(qtok), Seq("__tok")) // query vocab only
      .crossJoin(broadcast(stats))
      .select(col(qidCol), col("__tok"),
        round(log((col("__n") - col("__df") + 0.5) /
          (col("__df") + 0.5) + 1.0) * 1000).cast("long").as("__idfm"),
        col("__avgdlm"))
    val terms = tf.join(broadcast(idf), Seq("__tok"))
      .join(dl, Seq(idCol))
      .select(col(qidCol), col(idCol),
        round(col("__idfm") * (col("__tf") * (k1 + 1)) /
          (col("__tf") + lit(k1) * (lit(1 - b) + col("__dl") * lit(b * 1000.0) / col("__avgdlm"))))
          .cast("long").as("__sc"))
    val scored = terms.groupBy(qidCol, idCol).agg(sum("__sc").as("score_milli"))
    val w = Window.partitionBy(qidCol)
      .orderBy(col("score_milli").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(qidCol, idCol, "rank", "score_milli")
  }

  /** Pure twin of [[bm25TopK]]. */
  def bm25TopKPure(corpus: Seq[(Long, String)], queries: Seq[(Long, String)],
      k: Int, k1: Double = 1.2, b: Double = 0.75): Seq[(Long, Long, Long, Long)] = {
    def half(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val tf = corpus.map { case (id, t) =>
      id -> TextAnalysis.tokens(t).groupBy(identity)
        .map { case (x, v) => x -> v.size.toLong }
    }.filter(_._2.nonEmpty)
    val n = tf.size
    val dl = tf.map { case (id, m) => id -> m.values.sum }.toMap
    val avgdlm = half(dl.values.sum.toDouble / n * 1000)
    val dfreq = tf.flatMap(_._2.keys).groupBy(identity)
      .map { case (t, v) => t -> v.size.toLong }
    def idfm(df: Long): Long =
      half(math.log((n - df + 0.5) / (df + 0.5) + 1.0) * 1000)
    (for {
      (qid, qt) <- queries
      qtoks = TextAnalysis.tokens(qt).distinct
      // keep exactly the docs sharing ≥1 query term (the join's semantics),
      // even if their rounded score sums to 0
      scores = tf.collect { case (id, m)
          if qtoks.exists(t => m.contains(t) && dfreq.contains(t)) =>
        id -> qtoks.collect {
          case t if m.contains(t) && dfreq.contains(t) =>
            val tfv = m(t)
            // SAME float op order as the Column path: dl·(b·1000)/avgdlm —
            // float multiplication is not associative, a different grouping
            // can differ in ulps and flip the final integer rounding
            half(idfm(dfreq(t)) * (tfv * (k1 + 1)) /
              (tfv + k1 * ((1 - b) + dl(id) * (b * 1000.0) / avgdlm)))
        }.sum
      }
      ((id, sc), i) <- scores.sortBy { case (id, sc) => (-sc, id) }
        .zipWithIndex.take(k)
    } yield (qid, id, (i + 1).toLong, sc)).toSeq
  }

  /** Pure twin: same tokenization, milli-nat IDF, integer weights, and
    * 6dp cosine, for spec cross-checking over in-memory corpora. */
  def tfidfPairsPure(corpus: Seq[(Long, String)], minCos: Double,
      maxDf: Int = 0): Seq[(Long, Long, Double)] = {
    val tf: Map[Long, Map[String, Long]] = corpus.map { case (id, t) =>
      id -> TextAnalysis.tokens(t).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    }.toMap
    val withToks = tf.filter(_._2.nonEmpty)
    val nDocs = withToks.size.toLong
    val dfreq = withToks.values.flatMap(_.keys).groupBy(identity)
      .map { case (t, v) => t -> v.size.toLong }
      .filter { case (_, c) => maxDf <= 0 || c <= maxDf }
    def idfMilli(c: Long): Long =
      BigDecimal(math.log((nDocs + 1).toDouble / (c + 1).toDouble) * 1000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong + 1000L
    val w: Map[Long, Map[String, Long]] = withToks.map { case (id, m) =>
      id -> m.collect { case (t, c) if dfreq.contains(t) => t -> c * idfMilli(dfreq(t)) }
    }
    val ids = w.keys.toSeq.sorted
    for {
      i <- ids; j <- ids if i < j
      wa = w(i); wb = w(j)
      dot = wa.keysIterator.filter(wb.contains).map(t => wa(t) * wb(t)).sum
      if dot > 0
      na2 = wa.values.map(x => x * x).sum
      nb2 = wb.values.map(x => x * x).sum
      cos = BigDecimal(dot.toDouble / (math.sqrt(na2.toDouble) * math.sqrt(nb2.toDouble)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if cos >= minCos
    } yield (i, j, cos)
  }
}
