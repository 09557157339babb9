package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the data-mixing step that
  * reweights a training corpus by source / language / quality bucket.
  *
  * Each stratum keeps its top ceil(frac × |stratum|) docs ranked by
  * md5(id): a reproducible, engine-agnostic pseudo-random order (the same
  * RNG-free idiom the IVF trainer and bench corpora use), so reruns and
  * oracles agree row-for-row — `df.sample()`'s seeded RNG is
  * partition-layout-dependent and would not survive a repartition.
  *
  * Plan: a single window pass over the stratum key (rank + stratum size
  * share one shuffle); no collect, no broadcast, holds at corpus scale as
  * long as strata outnumber executors or are internally splittable — for
  * very few huge strata, pre-salt the stratum column upstream.
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
