package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Functional-graph chain resolution by pointer jumping — the standard
  * operator behind redirect-chain and rel=canonical resolution in a web
  * corpus (u1 → u2 → … → final landing URL), alias tables, and parent
  * maps. A naive per-hop walk needs O(chain length) sequential joins;
  * pointer jumping squares the map each round (f ← f∘f), so `rounds`
  * rounds resolve any chain of length ≤ 2^rounds — 5 rounds cover the
  * 30-hop chains a crawler would have long since refused to follow.
  *
  * Scale: each round is ONE equi-join of the mapping with itself, hash
  * partitioned on the join key; nothing is collected and no driver state
  * exists, so the op is O(log maxChain) shuffles at any corpus size. Each
  * round references the previous map TWICE, so the result is
  * localCheckpoint'ed per round — an unbroken lineage would double the
  * logical plan per round (the HITS lesson, Hits.scala).
  */
object Pointers {

  /** Resolve each `src` to the end of its pointer chain.
    *
    * `edges` must be a FUNCTIONAL map — at most one outgoing edge per
    * `src` (a redirect/canonical table is; dedupe first if yours is not:
    * duplicate srcs would fan out every downstream row). Output:
    * `(src, target, converged)` — one row per input edge, `target` the
    * node reached after 2^rounds hops, `converged` true iff `target` has
    * no outgoing edge in the base map (a genuine chain end). Nodes on a
    * CYCLE (a self-loop is a length-1 cycle) never reach a chain end:
    * their target is whichever cycle member 2^rounds hops land on and
    * `converged` stays false — exactly the rows a crawl pipeline should
    * quarantine as redirect loops. */
  def resolve(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 10,
      s"rounds must be in [1,10] (2^10 = 1024-hop chains): $rounds")
    val base = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst"))
    var f = base
    for (_ <- 0 until rounds) {
      f = f.as("a").join(f.as("b"), col("a.dst") === col("b.src"), "left")
        .select(col("a.src").as("src"),
          coalesce(col("b.dst"), col("a.dst")).as("dst"))
        .localCheckpoint()
    }
    // converged ⇔ the final target has no outgoing edge in the base map
    val heads = base.select(col("src").as("__t")).distinct()
    f.join(heads, f("dst") === heads("__t"), "left")
      .select(col("src"), col("dst").as("target"),
        col("__t").isNull.as("converged"))
  }
}
