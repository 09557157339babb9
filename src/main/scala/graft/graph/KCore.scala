package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling — the density filter for link
  * graphs: the k-core is the maximal subgraph where every node keeps degree
  * ≥ k, which separates genuinely interlinked site clusters from chains and
  * pendant spam tendrils that PageRank alone ranks surprisingly high.
  *
  * Each round recomputes degrees in the CURRENT subgraph and drops nodes
  * below k together with their edges (Matula & Beck 1983, bulk-synchronous
  * form). A fixed `rounds` budget keeps the plan bounded and the update
  * replayable: after R rounds the survivors are a (shrinking) superset of
  * the true k-core, and once a round removes nothing the result IS the
  * k-core — the spec peels a chain to extinction to prove convergence, and
  * callers size `rounds` to the peel depth they need (peel depth, not
  * diameter; chains of pendant nodes peel one layer per round).
  *
  * Plan per round: one degree groupBy plus two semi-joins, all hashed on
  * the same node key — no windows, no collects, nothing driver-side, so a
  * 10⁹-node graph peels at shuffle bandwidth.
  */
object KCore {

  /** Surviving (node, deg) after `rounds` peel rounds at threshold `k` over
    * the DISTINCT symmetrized edge list (self-loops dropped — a self-loop
    * must not let a node keep itself alive). */
  def core(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      rounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst")).distinct()
    // each round's survivor relation is persisted (caller-release contract):
    // round r+1 references round r on BOTH semi-join sides, so an unpersisted
    // fold re-evaluates the whole prior lineage once per reference —
    // exponential recomputation by round 4 (same fix as HITS' checkpointed
    // iterations)
    val peeled = (1 to rounds).foldLeft(sym) { (cur, _) =>
      val c = graft.io.Persisted.track(
        cur.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val keep = c.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select("src")
      c.join(keep, Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("src", "dst"), Seq("dst"), "left_semi")
    }
    peeled.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
  }

  /** Reference twin: the same bulk-synchronous peel over plain collections —
    * spec-only, for DF ≡ pure equivalence. */
  def corePure(edges: Seq[(Long, Long)], k: Int,
      rounds: Int): Map[Long, Long] = {
    var cur = edges.flatMap { case (s, d) => Seq((s, d), (d, s)) }
      .filter { case (s, d) => s != d }.distinct
    for (_ <- 1 to rounds) {
      val deg = cur.groupBy(_._1).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= k).keySet
      cur = cur.filter { case (s, d) => keep(s) && keep(d) }
    }
    cur.groupBy(_._1).map { case (n, es) => (n, es.size.toLong) }
  }
}
