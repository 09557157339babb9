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
