package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling — the data-mixing step that reweights a
  * training corpus by source / language / quality bucket. Two forms, the
  * exact-baseline + scale-path pairing used throughout this engine:
  *
  *  - [[stratified]] (exact baseline): each stratum keeps its top
  *    ceil(frac × |stratum|) docs ranked by md5(id) — reproducible,
  *    engine-agnostic pseudo-random order (the same RNG-free idiom the
  *    IVF trainer and bench corpora use), so reruns and oracles agree
  *    row-for-row; `df.sample()`'s seeded RNG is partition-layout-
  *    dependent and would not survive a repartition. The per-stratum
  *    rank is a window over the stratum key, which sorts each stratum
  *    inside one task — right when strata are numerous/bounded (sources,
  *    quality buckets), wrong for a handful of corpus-sized strata.
  *
  *  - [[hashThreshold]] (scale path): keep a row iff its 60-bit md5
  *    falls below frac·2⁶⁰ — a pure filter on the scan, ZERO shuffles at
  *    any scale and still deterministic. Sample size is binomial around
  *    frac·n instead of exact; per-stratum rates compose by filtering
  *    each stratum with its own threshold.
  */
object Sampling {

  /** Output: the kept rows of `df` plus (sample_rank, stratum_n) —
    * sample_rank is the doc's 1-based md5 position within its stratum. */
  def stratified(df: DataFrame, idCol: String, stratumCol: String,
      frac: Double): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac must be in (0,1], got $frac")
    val ord = Window.partitionBy(stratumCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val all = Window.partitionBy(stratumCol)
    df.withColumn("sample_rank", row_number().over(ord))
      .withColumn("stratum_n", count(lit(1)).over(all))
      .filter(col("sample_rank") <=
        ceil(col("stratum_n") * lit(frac)).cast("long"))
  }

  /** Scale path: deterministic hash-threshold sample (see object doc).
    * Keeps rows whose 60-bit md5(id) < frac·2⁶⁰; no shuffle, no window —
    * the plan is scan + filter regardless of corpus size. */
  def hashThreshold(df: DataFrame, idCol: String, frac: Double): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac must be in (0,1], got $frac")
    // frac·2^60 in exact integer arithmetic (2^60 fits double only for
    // dyadic fracs; go through BigDecimal so any frac cuts exactly)
    val cut = (BigDecimal(frac) * BigDecimal(1L << 60)).toLong
    df.filter(TextAnalysis.hash60(col(idCol).cast("string")) < lit(cut))
  }

  /** Pure twin of [[hashThreshold]]: would this id be kept? */
  def hashThresholdPure(id: Long, frac: Double): Boolean = {
    val cut = (BigDecimal(frac) * BigDecimal(1L << 60)).toLong
    TextAnalysis.hash60(id.toString) < cut
  }

  /** Pure twin for spec cross-checking: ids of one stratum → kept ids in
    * md5-rank order. */
  def stratifiedPure(ids: Seq[Long], frac: Double): Seq[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(id: Long): String =
      md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val keep = math.ceil(ids.size * frac).toLong
    ids.sortBy(id => (hex(id), id)).take(keep.toInt)
  }
}
