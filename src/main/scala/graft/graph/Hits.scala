package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration HITS (Kleinberg 1999) in integer micro units — the
  * hub/authority complement to [[PageRank]] for link-graph curation:
  * authorities are what link-selection wants to keep, hubs are the
  * directory/spam shapes it wants to discount.
  *
  * Exactness contract (same idiom as PageRank): all arithmetic is int64
  * with floor division. Each iteration updates authority from hub, then hub
  * from the NEW authority, L1-normalizing each vector to [[PageRank.Micro]]
  * total mass: `x_norm = (x_raw · 10⁶) div Σ x_raw`. Hubs start at 1 unit
  * each, so first-round raws are in-degrees and every later value is
  * bounded by the normalized total — `raw · 10⁶` stays far below 2⁶³ at any
  * graph size. Results are bit-identical under any partitioning or engine.
  *
  * Plan per iteration: two key-shuffle joins + two partial-agg groupBys
  * (auth then hub), with the L1 totals computed as single-row aggregates
  * broadcast back via cross join — no driver round-trips, no collects.
  * `iters` is fixed and small, so cost is bounded and the result
  * replayable. Edge + node relations are persisted across iterations under
  * the caller-release contract (Persisted.release / clearCache after the
  * action). */
object Hits {

  import PageRank.Micro

  /** (node, hub_micro, auth_micro) after `iters` full (auth, hub) update
    * rounds over the DISTINCT edge list. */
  def scores(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = graft.io.Persisted.track(
      edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst")).distinct().persist(lvl))
    val nodes = graft.io.Persisted.track(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct().persist(lvl))

    def l1Normalize(rawDf: DataFrame, outCol: String): DataFrame = {
      // the raw aggregate feeds BOTH the L1 total and the per-node join —
      // persist it so the upstream join+groupBy runs once, not twice
      val raw = graft.io.Persisted.track(rawDf.persist(lvl))
      val total = broadcast(raw
        .agg(greatest(coalesce(sum("raw"), lit(1L)), lit(1L)).as("total")))
      nodes.join(raw, Seq("node"), "left").crossJoin(total)
        .select(col("node"),
          expr(s"(coalesce(raw, 0L) * ${Micro}L) div total").as(outCol))
    }

    val init = nodes.withColumn("hub_micro", lit(1L))
    val hubs = (1 to iters).foldLeft(init) { (hs, _) =>
      // localCheckpoint each iteration's vector: every one is referenced
      // multiple times (L1-total aggregate, next join, final join), so an
      // unbroken lineage re-executes the upstream DAG per reference and
      // the LOGICAL plan doubles per iteration (measured: 23 s and an
      // explain-string OOM at 4 iterations; checkpointed: sub-second).
      // The node-count-sized vector is materialized eagerly — the bounded
      // per-round action every iterative graph job pays (same trade as
      // connectedComponents' per-round convergence check).
      val auth = l1Normalize(
        e.join(hs.select(col("node").as("src"), col("hub_micro")), "src")
          .select(col("dst").as("node"), col("hub_micro"))
          .groupBy("node").agg(sum("hub_micro").as("raw")), "auth_micro")
        .localCheckpoint()
      val hub = l1Normalize(
        e.join(auth.select(col("node").as("dst"), col("auth_micro")), "dst")
          .select(col("src").as("node"), col("auth_micro"))
          .groupBy("node").agg(sum("auth_micro").as("raw")), "hub_micro")
        .localCheckpoint()
      hub.join(auth, "node")
    }
    hubs.select("node", "hub_micro", "auth_micro")
  }

  /** Pure twin: same floor-division arithmetic, same update order. */
  def scoresPure(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, (Long, Long)] = {
    val e = edges.distinct
    val nodes = e.flatMap(t => Seq(t._1, t._2)).distinct
    val out = e.groupBy(_._1)
    val in = e.groupBy(_._2)
    def norm(raw: Map[Long, Long]): Map[Long, Long] = {
      val total = math.max(raw.values.sum, 1L)
      nodes.map(v => v -> raw.getOrElse(v, 0L) * Micro / total).toMap
    }
    var hub = nodes.map(_ -> 1L).toMap
    var auth = Map.empty[Long, Long]
    (1 to iters).foreach { _ =>
      auth = norm(nodes.map(v =>
        v -> in.getOrElse(v, Nil).map { case (u, _) => hub(u) }.sum).toMap)
      hub = norm(nodes.map(u =>
        u -> out.getOrElse(u, Nil).map { case (_, v) => auth(v) }.sum).toMap)
    }
    nodes.map(v => v -> (hub(v), auth(v))).toMap
  }
}
