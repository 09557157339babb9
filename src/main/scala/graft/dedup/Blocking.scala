package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sorted-neighborhood record-linkage blocking (Hernández & Stolfo 1997,
  * "The merge/purge problem for large databases").
  *
  * LSH blocking ([[Dedup.minhashDuplicates]]) buckets by CONTENT overlap;
  * the sorted-neighborhood method (SNM) buckets by PROXIMITY in one sort
  * order — a sliding window of width w over the corpus sorted by a
  * discriminating key emits every in-window pair as a candidate. It is the
  * standard complement to LSH for entity-style dedup (names, addresses,
  * titles) where near-duplicates share a prefix rather than shingles, and
  * multi-pass SNM (union of calls with different keys, then `distinct`)
  * is the classic production recipe.
  *
  * Shape at scale: the global sort order comes from [[graft.io.Ids.assign]]
  * (range exchange + per-partition counts + driver prefix-sum — never a
  * single-partition window), then candidates come from ONE equi-join on the
  * rank band `rank div (w-1)`: the later row of each pair emits its own
  * band and the previous one, so every in-window pair matches exactly once
  * and no band key ever holds more than 2(w-1) rows — skew is impossible
  * by construction, and the window never spans driver state.
  */
object Blocking {

  /** Candidate pairs (id_a, id_b, rank_dist) for all rows within `w`-1
    * positions of each other in (`keyCol`, `idCol`) order. `id_a` is the
    * earlier row in sort order; `rank_dist` its distance to `id_b`. */
  def sortedNeighborhood(df: DataFrame, idCol: String, keyCol: String,
      w: Int): DataFrame = {
    require(w >= 2, s"window must be >= 2: $w")
    require(df.columns.contains(idCol) && df.columns.contains(keyCol),
      s"missing $idCol or $keyCol")
    val b = w - 1 // band size = max in-window rank distance
    val ranked = graft.io.Ids.assign(
      df.select(col(idCol), col(keyCol)), Seq(keyCol, idCol), "__rank")
      .withColumn("__band", expr(s"__rank div $b"))
    val lo = ranked.select(col(idCol).as("id_a"), col("__rank").as("__ra"),
      col("__band").as("__join_band"))
    val hi = ranked.select(col(idCol).as("id_b"), col("__rank").as("__rb"),
      explode(array(col("__band"), col("__band") - 1)).as("__join_band"))
    lo.join(hi, "__join_band")
      .filter((col("__rb") - col("__ra")).between(1, b))
      .select(col("id_a"), col("id_b"),
        (col("__rb") - col("__ra")).as("rank_dist"))
  }

  /** Pure twin of [[sortedNeighborhood]]: (id, key) rows → the in-window
    * pair set with distances, via an explicit sort. */
  def sortedNeighborhoodPure(rows: Seq[(Long, String)], w: Int)
      : Set[(Long, Long, Long)] = {
    require(w >= 2)
    val sorted = rows.sortBy { case (id, k) => (k, id) }
    (for {
      i <- sorted.indices
      j <- (i + 1) until math.min(i + w, sorted.size)
    } yield (sorted(i)._1, sorted(j)._1, (j - i).toLong)).toSet
  }
}
