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

  /** Lower percentile of an integer-valued histogram
    * `(sliceCol, vCol, cntCol)` per slice: the element at 0-based index
    * (n−1)·permille div 1000 of the sorted multiset — the smallest v
    * whose running count reaches that index + 1 (permille 500 is the
    * lower median). Pure arithmetic on counts, no interpolation, so
    * every engine replays it bit-identically (engine `median()` builtins
    * interpolate and differ). The window runs over the BOUNDED histogram
    * (≤ distinct values per slice), never the corpus. The ONE
    * implementation of the cum-rank pattern — the median entry points
    * below delegate here. */
  private def histPercentile(hist: DataFrame, sliceCol: String,
      vCol: String, cntCol: String, outCol: String,
      permille: Int): DataFrame = {
    val cum = hist.withColumn("__cum",
      sum(col(cntCol)).over(Window.partitionBy(sliceCol).orderBy(vCol)))
    val totals = hist.groupBy(sliceCol).agg(sum(cntCol).as("__n"))
    cum.join(totals, sliceCol)
      .filter(col("__cum") >= expr(s"(__n - 1) * $permille div 1000 + 1"))
      .groupBy(sliceCol).agg(min(vCol).as(outCol))
  }

  private def histLowerMedian(hist: DataFrame, sliceCol: String,
      vCol: String, cntCol: String, outCol: String): DataFrame =
    histPercentile(hist, sliceCol, vCol, cntCol, outCol, 500)

  /** Public histogram-exact lower median of any INTEGER metric per
    * slice: (slice, n, median). NULL metric values are dropped first
    * (and a slice of only NULLs emits nothing). The scalable-median
    * primitive behind [[lengthOutliers]], exposed for datasheet rollups:
    * the corpus-scale exchange is ONE (slice, value) partial-agg
    * groupBy; the ranking window only ever sees the bounded histogram.
    * Meaningful for metrics with bounded distinct values (lengths,
    * milli scores) — a continuous 64-bit metric should be bucketed
    * first or the histogram IS the data. */
  def sliceMedian(df: DataFrame, sliceCol: String, valueCol: String)
      : DataFrame =
    slicePercentile(df, sliceCol, valueCol, 500)
      .withColumnRenamed("pct", "median")

  /** Pure twin of [[sliceMedian]] for one slice. */
  def sliceMedianPure(vs: Seq[Long]): Option[(Long, Long)] =
    if (vs.isEmpty) None
    else Some((vs.size.toLong, vs.sorted.apply((vs.size - 1) / 2)))

  /** Histogram-exact lower percentile per slice, generalizing
    * [[sliceMedian]]: the element at 0-based index (n−1)·q div 1000 of
    * the sorted multiset for permille q (q = 500 IS the lower median).
    * No interpolation — pure rank arithmetic, so every engine replays it
    * bit-identically; same single (slice, value) histogram shuffle, and
    * several percentiles of the same metric share that one histogram
    * when composed in a query. */
  def slicePercentile(df: DataFrame, sliceCol: String, valueCol: String,
      permille: Int): DataFrame = {
    require(permille >= 0 && permille <= 1000, s"bad permille: $permille")
    val hist = df.filter(col(valueCol).isNotNull)
      .select(col(sliceCol).as("slice"), col(valueCol).cast("long").as("__v"))
      .groupBy("slice", "__v").agg(count(lit(1)).as("__c"))
    val totals = hist.groupBy("slice").agg(sum("__c").as("n"))
    histPercentile(hist, "slice", "__v", "__c", "pct", permille)
      .join(totals, "slice")
      .select("slice", "n", "pct")
  }

  /** Pure twin of [[slicePercentile]] for one slice. */
  def slicePercentilePure(vs: Seq[Long], permille: Int)
      : Option[(Long, Long)] = {
    require(permille >= 0 && permille <= 1000, s"bad permille: $permille")
    if (vs.isEmpty) None
    else Some((vs.size.toLong,
      vs.sorted.apply(((vs.size - 1L) * permille / 1000L).toInt)))
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
    * itself never sorts and never shuffles.
    *
    * NULL-text docs (len NULL) are DROPPED — from the histogram (so they
    * cannot skew the medians: engines disagree on where NULLs sort in a
    * window, and a length statistic over absent text is meaningless) and
    * from the output (a doc with no text has no length to flag) — the
    * same NULL contract [[slicePercentile]] documents. */
  def lengthOutliers(df: DataFrame, idCol: String, sliceCol: String,
      textCol: String, kMilli: Long = 3000L): DataFrame = {
    require(kMilli > 0, s"kMilli must be positive: $kMilli")
    val base = df.select(col(idCol), col(sliceCol).as("slice"),
      length(col(textCol)).cast("long").as("len"))
      .filter(col("len").isNotNull)
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

  /** Vocabulary growth curve (Heaps' law probe): bucket the corpus into
    * `buckets` ingestion-order ranges over `orderCol` and report, per
    * bucket, docs and NEW distinct tokens first seen there plus both
    * cumulative curves. Sub-linear growth (V ≈ K·nᵝ, β ≈ 0.5) is healthy
    * natural text; a curve that goes linear means unbounded junk
    * vocabulary (OCR noise, random ids), one that flatlines early means
    * templated/looping content — the standard ingest-monitoring curve.
    *
    * Buckets split the ORDER-VALUE range (`v·B div (max+1)`), not ranks —
    * exact and shuffle-free for dense ingestion ids; for rank-exact
    * buckets over sparse orders, pre-assign ranks with
    * [[graft.io.Ids.assign]] and pass those as `orderCol` (composition,
    * not a window here).
    *
    * Shape at scale: one narrow explode into ONE (token) partial-agg
    * min-aggregate (the only corpus-scale exchange), a bounded
    * B-row bucket aggregate, and a B-row running sum — the final window
    * sees `buckets` rows, never data. */
  def vocabGrowth(df: DataFrame, orderCol: String, textCol: String,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 2 && buckets <= 10000, s"bad buckets: $buckets")
    val mx = df.agg(max(col(orderCol).cast("long")).as("__mx"))
    // rename before the expr so arbitrary caller column names (spaces,
    // reserved words) never reach a SQL string
    val docs = df.select(col(orderCol).cast("long").as("__ord"))
      .crossJoin(broadcast(mx))
      .select(expr(s"__ord * $buckets div (__mx + 1)").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_docs"))
    val firsts = df
      .select(col(orderCol).cast("long").as("__ord"),
        explode(TextAnalysis.tokensCol(col(textCol))).as("__tok"))
      .groupBy("__tok").agg(min("__ord").as("__first"))
      .crossJoin(broadcast(mx))
      .select(expr(s"__first * $buckets div (__mx + 1)").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("new_tokens"))
    docs.join(firsts, Seq("bucket"), "left")
      .select(col("bucket"), col("n_docs"),
        coalesce(col("new_tokens"), lit(0L)).as("new_tokens"))
      .withColumn("cum_docs", sum("n_docs").over(
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cum_tokens", sum("new_tokens").over(
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Pure twin of [[vocabGrowth]]:
    * Seq of (bucket, n_docs, new_tokens, cum_docs, cum_tokens). */
  def vocabGrowthPure(rows: Seq[(Long, String)], buckets: Int = 10)
      : Seq[(Long, Long, Long, Long, Long)] = {
    val mx = rows.map(_._1).max
    def b(v: Long) = v * buckets / (mx + 1)
    val docs = rows.groupBy(r => b(r._1)).view.mapValues(_.size.toLong)
    val firsts = rows.flatMap { case (id, t) =>
      TextAnalysis.tokens(t).map(_ -> id) }
      .groupBy(_._1).view.mapValues(v => b(v.map(_._2).min))
      .values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    var (cd, ct) = (0L, 0L)
    docs.keys.toSeq.sorted.map { bk =>
      val (nd, nt) = (docs(bk), firsts.getOrElse(bk, 0L))
      cd += nd; ct += nt
      (bk, nd, nt, cd, ct)
    }
  }

  /** ln 2 in micro-nats — the exclusive-token JS term. */
  val Ln2Micro = 693147L

  /** Pairwise Jensen–Shannon divergence between corpus slices over their
    * token distributions, in exact integer micro-nats — the
    * distribution-shift matrix a mixture decision reads ("how far is this
    * new source from what we train on?"). For slices a < b:
    *
    *   JS = ½·Σ p·ln(p/m) + ½·Σ q·ln(q/m),  m = (p+q)/2
    *
    * evaluated exactly as lnMicro differences of integer products
    * (ln(p/m) = ln(2·c_a·n_b) − ln(c_a·n_b + c_b·n_a)); each slice's sum
    * runs over the weighted counts FIRST and divides by its total ONCE
    * (no per-token truncation drift beyond the lnMicro rounding), and
    * tokens exclusive to one slice contribute exactly ln 2 — folded in
    * CLOSED FORM from the totals minus the shared mass, so the join only
    * ever touches tokens present in BOTH slices. Bounded by products
    * c·n < 2⁶³: exact below ~3·10⁹ tokens per slice (pre-sample beyond).
    *
    * Shape at scale: ONE (slice, token) partial-agg count shuffle, an
    * inner vocab self-join on token (slice pairs are bounded — this is a
    * slice×slice matrix, not doc×doc), and a pair-key aggregate. */
  def jsDivergence(df: DataFrame, sliceCol: String, textCol: String)
      : DataFrame = {
    val lnM = (c: Column) => round(log(c.cast("double")) * 1e6).cast("long")
    val counts = df
      .select(col(sliceCol).as("slice"),
        explode(TextAnalysis.tokensCol(col(textCol))).as("__tok"))
      .groupBy("slice", "__tok").agg(count(lit(1)).as("__c"))
    val totals = counts.groupBy("slice").agg(sum("__c").as("__n"))
    val a = counts.join(totals, "slice")
      .select(col("slice").as("slice_a"), col("__tok"),
        col("__c").as("__ca"), col("__n").as("__na"))
    val b = counts.join(totals, "slice")
      .select(col("slice").as("slice_b"), col("__tok"),
        col("__c").as("__cb"), col("__n").as("__nb"))
    val shared = a.join(b, "__tok")
      .filter(col("slice_a") < col("slice_b"))
      .withColumn("__mix", lnM(col("__ca") * col("__nb") +
        col("__cb") * col("__na")))
      .groupBy("slice_a", "slice_b")
      .agg(sum("__ca").as("__sha"), sum("__cb").as("__shb"),
        sum(col("__ca") * (lnM(lit(2L) * col("__ca") * col("__nb")) -
          col("__mix"))).as("__wa"),
        sum(col("__cb") * (lnM(lit(2L) * col("__cb") * col("__na")) -
          col("__mix"))).as("__wb"))
    // every slice pair appears, even with zero shared vocabulary (JS of
    // disjoint distributions is exactly ln 2 — the closed-form fold gives
    // it for free when the shared sums coalesce to 0)
    val pairs = totals.select(col("slice").as("slice_a"), col("__n").as("__na"))
      .join(totals.select(col("slice").as("slice_b"), col("__n").as("__nb")),
        col("slice_a") < col("slice_b"))
    pairs.join(shared, Seq("slice_a", "slice_b"), "left")
      .select(col("slice_a"), col("slice_b"),
        expr("((coalesce(__wa, 0L) + (__na - coalesce(__sha, 0L)) * " +
          s"$Ln2Micro) div __na + " +
          "(coalesce(__wb, 0L) + (__nb - coalesce(__shb, 0L)) * " +
          s"$Ln2Micro) div __nb) div 2")
          .as("js_micro"))
  }

  /** Pure twin of [[jsDivergence]] for one slice pair. */
  def jsDivergencePure(textsA: Seq[String], textsB: Seq[String]): Long = {
    def lnM(x: Long) = Math.round(Math.log(x.toDouble) * 1e6)
    def cnt(ts: Seq[String]) = ts.flatMap(TextAnalysis.tokens)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (ca, cb) = (cnt(textsA), cnt(textsB))
    val (na, nb) = (ca.values.sum, cb.values.sum)
    val shared = ca.keySet & cb.keySet
    val wa = shared.toSeq.map { t =>
      ca(t) * (lnM(2L * ca(t) * nb) - lnM(ca(t) * nb + cb(t) * na)) }.sum
    val wb = shared.toSeq.map { t =>
      cb(t) * (lnM(2L * cb(t) * na) - lnM(ca(t) * nb + cb(t) * na)) }.sum
    val sha = shared.toSeq.map(ca).sum
    val shb = shared.toSeq.map(cb).sum
    ((wa + (na - sha) * Ln2Micro) / na +
      (wb + (nb - shb) * Ln2Micro) / nb) / 2
  }

  /** Pairwise Pearson correlation between the three cheap per-doc size
    * signals (chars, whitespace tokens, BPE-ish pre-tokens) in integer
    * micro — the datasheet's signal-redundancy audit: r(chars, bpe) ≈
    * 0.97 means token budgets are predictable from byte counts alone
    * and the expensive tokenizer pass can be skipped for capacity
    * planning; a LOW correlation flags a slice whose script the
    * pre-tokenizer shreds.
    *
    * Exact integer evaluation: DECIMAL(38,0) sums and cross-products
    * (the domain_hhi idiom — the oracle replays with int128), numerator
    * n·Σxy − Σx·Σy, denominator floor(sqrt(varx·vary)) through one
    * deterministic double conversion (both engines round the SAME exact
    * integer to double, sqrt is correctly rounded), ONE toward-zero
    * division. Perfectly linear signals give exactly ±1000000 (the
    * variance product is then a perfect square). Constant signals emit
    * NULL (zero variance). Precision bound, stated exactly: the engine
    * floor(sqrt(double)) lands in a LONG, so the replay is bit-exact
    * while varx·vary < 8.5·10³⁷ (sqrt below 2⁶³ — each variance term
    * under ~9.2·10¹⁸, ≈10⁹ docs at typical sizes); beyond that the
    * LONG saturates while an int128 replay would not — run the audit on
    * a sample past that scale (it is a corpus statistic).
    *
    * Shape at scale: ONE narrow projection + ONE global partial-agg
    * reduce to a single row — no shuffle of data, ever. */
  def signalCorrelation(df: DataFrame, textCol: String): DataFrame = {
    val base = df.select(
      length(col(textCol)).cast("long").as("__x1"),
      TextAnalysis.wsTokenCountCol(col(textCol)).cast("long").as("__x2"),
      TextAnalysis.bpeTokenCountCol(col(textCol)).cast("long").as("__x3"))
    def d(c: String) = s"cast($c as decimal(38,0))"
    val agg = base.agg(
      count(lit(1)).as("n"),
      sum("__x1").as("s1"), sum("__x2").as("s2"), sum("__x3").as("s3"),
      sum(expr(s"${d("__x1")} * __x1")).as("s11"),
      sum(expr(s"${d("__x2")} * __x2")).as("s22"),
      sum(expr(s"${d("__x3")} * __x3")).as("s33"),
      sum(expr(s"${d("__x1")} * __x2")).as("s12"),
      sum(expr(s"${d("__x1")} * __x3")).as("s13"),
      sum(expr(s"${d("__x2")} * __x3")).as("s23"))
    def r(sxy: String, sx: String, sy: String, sxx: String, syy: String) = {
      val nn = d("n")
      val num = s"($nn * $sxy - ${d(sx)} * $sy)"
      val vx = s"($nn * $sxx - ${d(sx)} * $sx)"
      val vy = s"($nn * $syy - ${d(sy)} * $sy)"
      val den = s"cast(floor(sqrt(cast($vx * $vy as double))) as decimal(38,0))"
      s"CASE WHEN $vx = 0 OR $vy = 0 THEN NULL " +
        s"ELSE cast($num * 1000000 div $den as bigint) END"
    }
    agg.select(col("n"),
      expr(r("s12", "s1", "s2", "s11", "s22")).as("r_chars_ws_micro"),
      expr(r("s13", "s1", "s3", "s11", "s33")).as("r_chars_bpe_micro"),
      expr(r("s23", "s2", "s3", "s22", "s33")).as("r_ws_bpe_micro"))
  }

  /** Pure twin of [[signalCorrelation]]'s r for one signal pair. */
  def pearsonMicro(xs: Seq[Long], ys: Seq[Long]): Option[Long] = {
    require(xs.size == ys.size && xs.nonEmpty, "mismatched or empty")
    val n = BigInt(xs.size)
    val (sx, sy) = (BigInt(xs.sum), BigInt(ys.sum))
    val sxy = xs.zip(ys).map { case (x, y) => BigInt(x) * y }.sum
    val sxx = xs.map(x => BigInt(x) * x).sum
    val syy = ys.map(y => BigInt(y) * y).sum
    val (vx, vy) = (n * sxx - sx * sx, n * syy - sy * sy)
    if (vx == 0 || vy == 0) return None
    val den = BigInt(math.floor(math.sqrt((vx * vy).doubleValue)).toLong)
    Some(((n * sxy - sx * sy) * 1000000 / den).toLong)
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
