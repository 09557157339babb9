package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal Rank Fusion (Cormack, Clarke & Buettcher 2009) — the
  * standard hybrid-retrieval combiner: given per-query ranked lists from
  * heterogeneous retrievers (BM25, dense kNN, simple overlap priors),
  * each hit contributes 1/(k + rank) and candidates re-rank by the sum.
  * Rank-based fusion sidesteps score-scale mismatch entirely (a BM25
  * milli-score and a cosine never share units), which is why RRF is the
  * default first fusion every hybrid search deploy ships.
  *
  * Integer-exact: contribution = 1000000 div (k + rank) micro-units,
  * one truncated division per hit, ties broken (score desc, doc asc).
  *
  * Shape at scale: the inputs are already bounded top-k lists, so the
  * union carries ≤ Σ k rows per query; ONE (query, doc) partial-agg
  * groupBy + a per-query window over ≤ Σ k fused candidates. The
  * corpus itself never appears here.
  */
object Fusion {

  /** Fuse ranked lists sharing (qCol, dCol, rankCol) (rank 1-based).
    * Output: (qCol, dCol, n_lists, rrf_micro, rank ≤ topK). */
  def rrf(lists: Seq[DataFrame], qCol: String, dCol: String,
      rankCol: String, kConst: Int = 60, topK: Int = 10): DataFrame = {
    require(lists.nonEmpty, "need at least one list")
    require(kConst >= 1 && topK >= 1, s"bad kConst/topK: $kConst/$topK")
    val u = lists.map(_.select(col(qCol).as("__q"), col(dCol).as("__d"),
      col(rankCol).cast("long").as("__r"))).reduce(_ unionAll _)
    u.groupBy("__q", "__d")
      .agg(count(lit(1)).as("n_lists"),
        sum(expr(s"1000000 div (${kConst}L + __r)")).as("rrf_micro"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("__q")
          .orderBy(col("rrf_micro").desc, col("__d"))).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("__q").as(qCol), col("__d").as(dCol), col("n_lists"),
        col("rrf_micro"), col("rank"))
  }

  /** Pure twin of [[rrf]] for one query: lists of (doc, rank). */
  def rrfPure(lists: Seq[Seq[(Long, Long)]], kConst: Int = 60,
      topK: Int = 10): Seq[(Long, Long, Long, Long)] = {
    val hits = lists.flatten
    hits.groupBy(_._1).view.mapValues { rs =>
      (rs.size.toLong, rs.map { case (_, r) => 1000000L / (kConst + r) }.sum)
    }.toSeq.map { case (d, (n, s)) => (d, n, s) }
      .sortBy { case (d, _, s) => (-s, d) }.take(topK)
      .zipWithIndex.map { case ((d, n, s), i) => (d, n, s, i + 1L) }
  }
}
