package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-release QA statistics: robust per-slice outlier gating,
  * domain-concentration, and Zipf-law conformance — the numbers a
  * datasheet quotes to argue a slice is healthy before it ships.
  *
  * All three follow the engine's integer-exact discipline and keep the
  * corpus-scale work to single partial-agg shuffles; every per-slice
  * statistic lives in a bounded table that broadcasts back.
  */
object CorpusStats {

  /** Lower median of an integer-valued histogram `(sliceCol, vCol, cntCol)`
    * per slice: the element at 0-based index (n−1) div 2 of the sorted
    * multiset — the smallest v whose running count reaches
    * (n−1) div 2 + 1. Pure arithmetic on counts, no interpolation, so
    * every engine replays it bit-identically (engine `median()` builtins
    * interpolate and differ). The window runs over the BOUNDED histogram
    * (≤ distinct values per slice), never the corpus. */
  private def histLowerMedian(hist: DataFrame, sliceCol: String,
      vCol: String, cntCol: String, outCol: String): DataFrame = {
    val cum = hist.withColumn("__cum",
      sum(col(cntCol)).over(Window.partitionBy(sliceCol).orderBy(vCol)))
    val totals = hist.groupBy(sliceCol).agg(sum(cntCol).as("__n"))
    cum.join(totals, sliceCol)
      .filter(col("__cum") >= expr("(__n - 1) div 2 + 1"))
      .groupBy(sliceCol).agg(min(vCol).as(outCol))
  }

  /** Robust per-document length-outlier gate (median/MAD, the standard
    * Hampel filter): per slice, m = lower median of doc char lengths and
    * MAD = lower median of |len − m|; a doc is an outlier when
    * 1000·|len − m| > kMilli·MAD (cross-multiplied — no division, no
    * floats). The corpus-QA complement to fixed length floors: a slice
    * whose outlier fraction jumps is a scrape gone wrong. MAD = 0 (over
    * half the slice at one exact length) flags EVERY deviating doc — the
    * documented degenerate-MAD behavior of the Hampel rule.
    *
    * Shape at scale: doc lengths are small integers, so the ONLY
    * corpus-scale exchange is the (slice, len) partial-agg histogram
    * groupBy; both medians run windows over that bounded histogram, and
    * the two-row-per-slice stat table joins back BROADCAST — the corpus
    * itself never sorts and never shuffles. */
  def lengthOutliers(df: DataFrame, idCol: String, sliceCol: String,
      textCol: String, kMilli: Long = 3000L): DataFrame = {
    require(kMilli > 0, s"kMilli must be positive: $kMilli")
    val base = df.select(col(idCol), col(sliceCol).as("slice"),
      length(col(textCol)).cast("long").as("len"))
    val hist = base.groupBy("slice", "len").agg(count(lit(1)).as("__c"))
    val med = histLowerMedian(hist, "slice", "len", "__c", "median_len")
    val dhist = hist.join(med, "slice")
      .withColumn("__d", abs(col("len") - col("median_len")))
      .groupBy("slice", "__d").agg(sum("__c").as("__dc"))
    val mad = histLowerMedian(dhist, "slice", "__d", "__dc", "mad")
    base.join(broadcast(med.join(mad, "slice")), "slice")
      .select(col(idCol), col("slice"), col("len"), col("median_len"),
        col("mad"),
        (abs(col("len") - col("median_len")) * 1000L >
          lit(kMilli) * col("mad")).as("outlier"))
  }

  /** Pure twin of [[lengthOutliers]] for one slice:
    * (median, mad, per-doc outlier flags in input order). */
  def lengthOutliersPure(lens: Seq[Long], kMilli: Long = 3000L)
      : (Long, Long, Seq[Boolean]) = {
    def lowerMedian(xs: Seq[Long]): Long = xs.sorted.apply(((xs.size - 1) / 2).toInt)
    val m = lowerMedian(lens)
    val mad = lowerMedian(lens.map(x => math.abs(x - m)))
    (m, mad, lens.map(x => 1000L * math.abs(x - m) > kMilli * mad))
  }

  /** Per-slice domain concentration: Herfindahl–Hirschman index in exact
    * integer micro (Σ share², 1e6 = single-domain monoculture) plus the
    * top domain's share in milli — the release-datasheet diversity gate
    * ("is this slice secretly one website?"). Exactness via DECIMAL(38,0)
    * for Σc² and n² (c² overflows int64 above 3·10⁹ docs on one domain);
    * Spark's decimal `div` and the oracle's int128 `//` both return the
    * integral quotient, so the replay is bit-exact.
    *
    * Shape at scale: ONE (slice, domain) partial-agg groupBy, then a
    * bounded-key slice aggregate — the corpus shuffles once. */
  def domainConcentration(df: DataFrame, sliceCol: String,
      domainCol: String): DataFrame = {
    df.groupBy(col(sliceCol).as("slice"), col(domainCol).as("__dom"))
      .agg(count(lit(1)).as("__c"))
      .groupBy("slice")
      .agg(sum("__c").as("n_docs"),
        count(lit(1)).as("n_domains"),
        max("__c").as("__maxc"),
        sum(expr("cast(__c as decimal(38,0)) * __c")).as("__s2"))
      .select(col("slice"), col("n_docs"), col("n_domains"),
        expr("cast(__s2 * 1000000 div " +
          "(cast(n_docs as decimal(38,0)) * n_docs) as bigint)")
          .as("hhi_micro"),
        expr("1000 * __maxc div n_docs").as("top_share_milli"))
  }

  /** Pure twin of [[domainConcentration]] for one slice. */
  def domainConcentrationPure(domains: Seq[String])
      : (Long, Long, Long, Long) = {
    val counts = domains.groupBy(identity).view.mapValues(_.size.toLong)
    val n = domains.size.toLong
    val s2 = counts.values.map(c => BigInt(c) * c).sum
    ((n, counts.size.toLong,
      (s2 * 1000000 / (BigInt(n) * n)).toLong,
      1000L * counts.values.max / n))
  }

  /** Zipf rank–frequency slope per slice: least-squares slope of
    * (ln rank, ln count) over the top-k vocabulary, in integer milli
    * micro-nat arithmetic. Natural text sits near −1000 (Zipf's law);
    * templated or machine-generated slices flatten toward 0 and
    * gibberish with a uniform vocabulary goes flatter still — the cheap
    * distributional-health probe next to distinct-n and entropy.
    *
    * Integer evaluation: x = lnMicro(rank), y = lnMicro(count); means are
    * truncated (Σ div n); slope_milli = Σ(x−mx)(y−my) · 1000 div
    * Σ(x−mx)² with ONE toward-zero division (`div` ≡ DuckDB `//`).
    * Bounded at k = 50: the centered cross-sum stays under 6·10¹⁸
    * against counts up to 10¹² — int64-safe.
    *
    * Shape at scale: the corpus shuffles ONCE into the (slice, token)
    * partial-agg count table; the per-slice top-k runs through the native
    * [[org.apache.spark.sql.graftshim.GraftTopK]] bounded-heap operator
    * (map-side partials, no per-slice sort of the vocabulary), and the
    * rank window only ever sees the ≤ k surviving rows per slice.
    * Slices with fewer than 2 ranked tokens emit nothing. */
  def zipfSlope(df: DataFrame, sliceCol: String, textCol: String,
      k: Int = 50): DataFrame = {
    require(k >= 2 && k <= 1000, s"k out of range: $k")
    val lnM = (c: Column) => round(log(c.cast("double")) * 1e6).cast("long")
    val counts = df
      .select(col(sliceCol).as("slice"),
        explode(TextAnalysis.tokensCol(col(textCol))).as("__tok"))
      .groupBy("slice", "__tok").agg(count(lit(1)).as("__c"))
    val top = org.apache.spark.sql.graftshim.GraftTopK.perKey(
      counts, Seq("slice"), Seq(("__c", true), ("__tok", false)), k)
    val ranked = top
      .withColumn("__r", row_number().over(
        Window.partitionBy("slice").orderBy(col("__c").desc, col("__tok"))))
      .select(col("slice"), lnM(col("__r")).as("__x"),
        lnM(col("__c")).as("__y"))
    val means = ranked.groupBy("slice")
      .agg(count(lit(1)).as("n_ranks"), sum("__x").as("__sx"),
        sum("__y").as("__sy"))
      .filter(col("n_ranks") >= 2)
      .withColumn("__mx", expr("__sx div n_ranks"))
      .withColumn("__my", expr("__sy div n_ranks"))
      .select("slice", "n_ranks", "__mx", "__my")
    ranked.join(means, "slice")
      .groupBy("slice")
      .agg(first("n_ranks").as("n_ranks"),
        sum(expr("(__x - __mx) * (__y - __my)")).as("__sxy"),
        sum(expr("(__x - __mx) * (__x - __mx)")).as("__sxx"))
      .withColumn("slope_milli", expr("__sxy * 1000 div __sxx"))
      .select("slice", "n_ranks", "slope_milli")
  }

  /** Pure twin of [[zipfSlope]] for one slice; None when fewer than two
    * ranked tokens. */
  def zipfSlopePure(texts: Seq[String], k: Int = 50)
      : Option[(Long, Long)] = {
    def lnM(x: Long) = Math.round(Math.log(x.toDouble) * 1e6)
    val counts = texts.flatMap(TextAnalysis.tokens)
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val ranked = counts.sortBy { case (t, c) => (-c, t) }.take(k)
      .zipWithIndex.map { case ((_, c), i) => (lnM(i + 1L), lnM(c)) }
    if (ranked.size < 2) return None
    val n = ranked.size.toLong
    val mx = ranked.map(_._1).sum / n
    val my = ranked.map(_._2).sum / n
    val sxy = ranked.map { case (x, y) => (x - mx) * (y - my) }.sum
    val sxx = ranked.map { case (x, _) => (x - mx) * (x - mx) }.sum
    Some((n, sxy * 1000L / sxx))
  }
}
