package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Heavy hitters with a mergeable Misra-Gries summary + exact rescore —
  * the frequent-items member of the sketch family next to KMV (distinct),
  * CMS (frequency), HLL (distinct, constant state) and Bloom (membership).
  *
  * Shape (Misra & Gries 1982; mergeability per Agarwal et al. 2012,
  * "Mergeable summaries"): each partition streams its values through a
  * k-counter summary (bounded k·(string+long) state), summaries treeReduce
  * into one ≤ k-entry candidate table on the driver, and a second exact
  * pass counts ONLY candidate values (a filter that keeps ≤ k distinct
  * keys, so the rescore groupBy shuffles a bounded sliver of the corpus).
  * Output = the exact counts of items above the threshold.
  *
  * Why sketch + rescore instead of a plain groupBy: at 100 TB a full
  * `groupBy(value)` shuffles every row; MG keeps per-task state at k
  * entries, ships k entries per partition to the driver, and the only
  * row-scale work left is a map-side-combined count over ≤ k keys.
  *
  * Determinism: the CANDIDATE SET depends on partition layout (decrements
  * land differently), but the FINAL output does not — the MG guarantee
  * (per-item undercount ≤ n/(k+1), preserved by the merge) means every
  * item with true count > n/den is in the summary whenever den ≤ k+1, so
  * the exact-rescore filter `cnt·den > n` yields the same rows under any
  * partitioning. HeavyHittersSpec pins both the bound and the invariance;
  * the `heavy_hitters` oracle replays the exact threshold in DuckDB.
  */
object HeavyHitters {

  /** One Misra-Gries counter update: increment on hit, insert while under
    * k, decrement-all on a miss with a full table (zeros evicted) — the
    * classic k-counter step, shared by the batch partition sweep and the
    * streaming shard state. */
  def mgUpdatePure(m: collection.mutable.HashMap[String, Long], v: String,
      k: Int): Unit = {
    m.get(v) match {
      case Some(c) => m.update(v, c + 1)
      case None =>
        if (m.size < k) m.update(v, 1L)
        else {
          // decrement-all: one shared "charge" against every counter
          val dead = collection.mutable.ArrayBuffer.empty[String]
          for ((key, c) <- m) {
            if (c == 1L) dead += key else m.update(key, c - 1)
          }
          dead.foreach(m.remove)
        }
    }
  }

  /** Pure streaming Misra-Gries update over one partition: ≤ k counters. */
  def mgStreamPure(it: Iterator[String], k: Int): collection.mutable.HashMap[String, Long] = {
    require(k >= 1, s"k must be >= 1: $k")
    val m = collection.mutable.HashMap.empty[String, Long]
    for (v <- it) mgUpdatePure(m, v, k)
    m
  }

  /** Mergeable-summaries combine: pointwise sum, then if more than k
    * entries survive subtract the (k+1)-th largest count from every
    * counter and drop the non-positive — error bounds ADD, so the merged
    * summary still undercounts each item by at most n/(k+1). */
  def mgMergePure(a: collection.mutable.HashMap[String, Long],
      b: collection.mutable.HashMap[String, Long], k: Int)
      : collection.mutable.HashMap[String, Long] = {
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    for ((key, c) <- small) big.update(key, big.getOrElse(key, 0L) + c)
    if (big.size > k) {
      val cut = big.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = collection.mutable.ArrayBuffer.empty[String]
      for ((key, c) <- big) {
        if (c - cut <= 0L) dead += key else big.update(key, c - cut)
      }
      dead.foreach(big.remove)
    }
    big
  }

  /** Candidate values from a distributed MG sweep over `valueCol` (nulls
    * skipped): per-partition summaries, treeReduce merge, ≤ k strings to
    * the driver. Sorted for a stable broadcast literal. */
  def mgCandidates(df: DataFrame, valueCol: String, k: Int): Array[String] = {
    import org.apache.spark.sql.Encoders
    val parts = df.select(col(valueCol)).na.drop(Seq(valueCol))
      .select(col(valueCol).cast("string")).as[String](Encoders.STRING)
      .rdd.mapPartitions { it =>
        val m = mgStreamPure(it, k)
        if (m.isEmpty) Iterator.empty else Iterator.single(m)
      }
    if (parts.isEmpty()) Array.empty
    else parts.treeReduce((x, y) => mgMergePure(x, y, k)).keys.toArray.sorted
  }

  /** Exact heavy hitters: every value of `valueCol` whose exact count
    * exceeds total/`den`, found without ever groupBy-ing the full column.
    * Requires den ≤ k+1 (the MG no-false-negative window); output
    * (value, cnt) with exact counts. */
  def heavyHitters(df: DataFrame, valueCol: String, k: Int, den: Int): DataFrame = {
    require(den >= 2 && den <= k + 1, s"need 2 <= den <= k+1 (den=$den, k=$k)")
    val vals = df.select(col(valueCol).cast("string").as("value"))
      .na.drop(Seq("value"))
    val candidates = mgCandidates(vals, "value", k)
    val total = vals.count()
    val hot = vals.filter(col("value").isin(candidates.toIndexedSeq: _*))
      .groupBy(col("value")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * den > total)
    hot
  }

  /** Pure twin of [[heavyHitters]] for the spec. */
  def heavyHittersPure(values: Seq[String], k: Int, den: Int): Seq[(String, Long)] = {
    val n = values.size.toLong
    val exact = values.groupBy(identity).map { case (v, g) => v -> g.size.toLong }
    exact.filter { case (_, c) => c * den > n }.toSeq.sortBy(_._1)
  }
}
