package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank in integer micro units — host/domain centrality
  * for a web-scale corpus (seed-quality weighting à la Common Crawl domain
  * ranking; Page et al. 1999). One rank unit = 10⁻⁶.
  *
  * Exactness contract: every step is int64 arithmetic with floor division —
  * `share(u) = rank(u) div out_deg(u)`, then
  * `rank'(v) = (10⁶ − damp) + (damp · Σ shares) div 10⁶` — so the result is
  * bit-identical under any partitioning, any engine, any merge order (the
  * same micro-unit idiom as the DSIR/BM25/perplexity scores). The cost is a
  * ≤1-micro-per-term rounding loss versus float PR, irrelevant for ranking.
  *
  * Dangling-node mass is NOT redistributed by default (their rank drains
  * toward the teleport floor), and unreferenced nodes hold
  * `10⁶ − damp + damp·0`. Both choices are documented because the oracle
  * replays them literally. `redistributeDangling = true` switches to the
  * standard PageRank treatment (Page et al. §2.7): each iteration the
  * summed rank of out-degree-0 nodes is split evenly across ALL nodes —
  * in int64, `dshare = (Σ dangling rank) div N` added to every node's
  * inflow before damping — keeping total mass (≈) conserved.
  *
  * Plan per iteration: ranks⋈edges on src (one key shuffle) + groupBy dst
  * (partial-aggregated shuffle) — the canonical distributed PR shape; the
  * edge relation with precomputed out-degrees is built once and persisted
  * by the caller if iterating many times. `iters` is fixed (typically
  * 3-10), not run to convergence, so cost is bounded and the result
  * replayable. */
object PageRank {

  val Micro = 1000000L

  /** (node, rank_micro) after `iters` iterations over the DISTINCT edge
    * list. `dampMicro` is the damping factor in micro units (850000 =
    * 0.85). Self-loops count like any edge; duplicate edges are collapsed
    * first (crawl graphs arrive with massive duplication). */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String, iters: Int,
      dampMicro: Long = 850000L, redistributeDangling: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(dampMicro >= 0 && dampMicro <= Micro, s"dampMicro: $dampMicro")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
    // the node and degree-annotated edge relations feed every iteration —
    // persisted under the Persisted caller-release contract (Verify/Bench
    // release after the action) so the distinct/degree shuffles run once,
    // not once per iteration per join side
    val nodes = graft.io.Persisted.track(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val ed = graft.io.Persisted.track(e.join(deg, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val floor = lit(Micro - dampMicro)
    if (!redistributeDangling) {
      val init = nodes.withColumn("rank_micro", lit(Micro))
      (1 to iters).foldLeft(init) { (ranks, _) =>
        val contrib = ed.join(ranks.withColumnRenamed("node", "src"), "src")
          .select(col("dst").as("node"),
            expr("rank_micro div deg").as("share"))
          .groupBy("node").agg(sum("share").as("inflow"))
        nodes.join(contrib, Seq("node"), "left")
          .select(col("node"), (floor +
            expr(s"($dampMicro * coalesce(inflow, 0L)) div ${Micro}L"))
            .as("rank_micro"))
      }
    } else {
      // dangling = no out-edges. Flag each node ONCE (one node-scale join)
      // and carry the flag through the iterations — the per-iteration
      // dangling mass is then a conditional single-row aggregate over the
      // rank relation itself (no per-iteration anti-join), broadcast into
      // the update as a cross join so the whole computation stays one plan
      // with no driver round-trips. N comes from one count on the persisted
      // node relation.
      val flagged = graft.io.Persisted.track(
        nodes.join(ed.select(col("src").as("node")).distinct()
            .withColumn("has_out", lit(true)), Seq("node"), "left")
          .select(col("node"), coalesce(col("has_out"), lit(false)).as("has_out"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val nNodes = flagged.count()
      val init = flagged.withColumn("rank_micro", lit(Micro))
      val ranked = (1 to iters).foldLeft(init) { (ranks, _) =>
        val contrib = ed.join(ranks.withColumnRenamed("node", "src"), "src")
          .select(col("dst").as("node"),
            expr("rank_micro div deg").as("share"))
          .groupBy("node").agg(sum("share").as("inflow"))
        val dshare = broadcast(
          ranks.agg(coalesce(sum(when(!col("has_out"), col("rank_micro"))),
            lit(0L)).as("dmass"))
            .select(expr(s"dmass div ${nNodes}L").as("dshare")))
        flagged.join(contrib, Seq("node"), "left").crossJoin(dshare)
          .select(col("node"), col("has_out"), (floor +
            expr(s"($dampMicro * (coalesce(inflow, 0L) + dshare)) div ${Micro}L"))
            .as("rank_micro"))
      }
      ranked.select("node", "rank_micro")
    }
  }

  /** Pure twin for tests: same floor-division arithmetic. */
  def ranksPure(edges: Seq[(Long, Long)], iters: Int,
      dampMicro: Long = 850000L,
      redistributeDangling: Boolean = false): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = e.flatMap(t => Seq(t._1, t._2)).distinct
    val deg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val in = e.groupBy(_._2)
    var r = nodes.map(_ -> Micro).toMap
    (1 to iters).foreach { _ =>
      val dshare =
        if (redistributeDangling)
          nodes.filterNot(deg.contains).map(r(_)).sum / nodes.size
        else 0L
      r = nodes.map { v =>
        val inflow = in.getOrElse(v, Nil)
          .map { case (u, _) => r(u) / deg(u) }.sum
        v -> (Micro - dampMicro + dampMicro * (inflow + dshare) / Micro)
      }.toMap
    }
    r
  }
}
