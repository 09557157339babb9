package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Co-citation similarity over a link graph (Small 1973): two targets are
  * related when the same sources cite them both — the classic "pages that
  * link to A also link to B" signal behind related-domain discovery,
  * link-spam farm detection, and seed expansion for focused crawls. The
  * transpose (shared OUT-links instead of shared IN-links) is Kessler's
  * bibliographic coupling (1963): call [[Cocitation.pairs]] with src/dst
  * swapped.
  *
  * Shape at scale: citations dedup in ONE partial-agg distinct, the
  * degree cap (`maxOut`, the maxDf/maxBucket idiom) drops hub sources
  * BEFORE the self-join, so per-source pair fan-out is bounded by
  * maxOut·(maxOut−1)/2 by construction — a directory page citing 10⁵
  * domains would otherwise contribute 5·10⁹ pairs and carries no
  * similarity signal. After the cap: one equi-join on the source key +
  * ONE (dst_a, dst_b) partial-agg groupBy. Never all-pairs, skew
  * impossible post-cap.
  */
object Cocitation {

  /** Co-cited pairs (dst_a < dst_b) with their co-citation count.
    * `edges` is any (source, target) relation — duplicates are collapsed
    * first (a page linking twice to one domain is one citation). Sources
    * with more than `maxOut` distinct targets are dropped entirely, with
    * the verdict computed over the deduped relation. */
  def pairs(edges: DataFrame, srcCol: String, dstCol: String,
      maxOut: Int): DataFrame = {
    require(maxOut >= 2, s"maxOut must be >= 2: $maxOut")
    val d = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .distinct()
    val hot = d.groupBy("__src").agg(count(lit(1)).as("__deg"))
      .filter(col("__deg") > maxOut).select("__src")
    val ok = d.join(hot, Seq("__src"), "left_anti")
    ok.select(col("__src"), col("__dst").as("dst_a"))
      .join(ok.select(col("__src"), col("__dst").as("dst_b")), Seq("__src"))
      .filter(col("dst_a") < col("dst_b"))
      .groupBy("dst_a", "dst_b")
      .agg(count(lit(1)).as("n_cocitations"))
  }

  /** Pure twin of [[pairs]]. */
  def pairsPure(edges: Seq[(String, String)], maxOut: Int)
      : Map[(String, String), Long] = {
    val bySrc = edges.distinct.groupBy(_._1).filter(_._2.size <= maxOut)
    bySrc.values.toSeq.flatMap { cites =>
      val ds = cites.map(_._2)
      for (a <- ds; b <- ds if a < b) yield (a, b)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
  }
}
