package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan et al. 2007) — community
  * detection over the domain/link graph, the standard way to group a crawl's
  * hosts into site families before per-community quotas or dedup.
  *
  * Deterministic by construction (asynchronous LPA is run-order dependent
  * and useless under retries): the graph is symmetrized with self-loops
  * dropped, label₀(v) = v, and each round EVERY node simultaneously adopts
  * the most frequent label among its neighbors, ties broken by the smallest
  * label; nodes with no neighbors keep their own id. Fixed `iters` rounds
  * (not run to convergence), so cost is bounded and the oracle can unroll
  * the exact update.
  *
  * Plan per round: one edges⋈labels key join, one partial-aggregated
  * (node, label) groupBy, and one per-node arg-max window over the
  * AGGREGATED label counts (group size = distinct neighbor labels, bounded
  * by degree — never raw edges through a window). Same canonical 2-3
  * shuffle shape as [[PageRank]]; at 10⁹ nodes the relations are key-hashed
  * and nothing is collected.
  */
object LabelProp {

  /** (node, label) after `iters` synchronous rounds over the DISTINCT
    * symmetrized edge list. */
  def labels(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val sym = graft.io.Persisted.track(
      e.union(e.select(col("dst").as("src"), col("src").as("dst")))
        .filter(col("src") =!= col("dst")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // nodes include self-loop-only vertices: they keep their own label
    val nodes = graft.io.Persisted.track(
      e.select(col("src").as("node")).union(e.select(col("dst").as("node")))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val init = nodes.withColumn("label", col("node"))
    (1 to iters).foldLeft(init) { (labs, _) =>
      val nbrLabels = sym
        .join(labs.withColumnRenamed("node", "dst"), "dst")
        .select(col("src").as("node"), col("label"))
      val counts = nbrLabels.groupBy("node", "label")
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("node").orderBy(col("n").desc, col("label").asc)
      val winners = counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("node"), col("label").as("new_label"))
      nodes.join(winners, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("new_label"), col("node")).as("label"))
    }
  }

  /** Reference twin: the same synchronous update as a driver-side fold over
    * plain collections — spec-only, for DF ≡ pure equivalence. */
  def labelsPure(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val sym = edges.flatMap { case (s, d) => Seq((s, d), (d, s)) }
      .filter { case (s, d) => s != d }.distinct
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val nbrs = sym.groupBy(_._1).map { case (n, es) => (n, es.map(_._2)) }
    var labs = nodes.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      labs = nodes.map { n =>
        nbrs.get(n) match {
          case None => n -> labs(n)
          case Some(ns) =>
            val byLabel = ns.map(labs).groupBy(identity).view
              .mapValues(_.size).toSeq
            val best = byLabel.minBy { case (label, cnt) => (-cnt, label) }._1
            n -> best
        }
      }.toMap
    }
    labs
  }
}
