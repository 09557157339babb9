package graft.graph

import graft.SparkTestBase

class HitsSpec extends SparkTestBase {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, (Long, Long)] =
    Hits.scores(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("DataFrame ≡ pure twin, incl. dangling, source-only, and dup edges") {
    val edges = Seq[(Long, Long)](
      (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (4, 3), // dup collapses
      (5, 1)) // 5 has no in-edges, 3 is the main authority
    for (iters <- Seq(1, 2, 4)) {
      assert(run(edges, iters) == Hits.scoresPure(edges, iters), s"iters=$iters")
    }
  }

  test("bipartite hub/authority separation") {
    // 1,2 point at 3,4,5: pure hubs get auth 0, pure authorities hub 0
    val edges = for (h <- Seq(1L, 2L); a <- Seq(3L, 4L, 5L)) yield (h, a)
    val r = run(edges, 2)
    assert(Seq(1L, 2L).forall(h => r(h)._2 == 0L && r(h)._1 > 0L))
    assert(Seq(3L, 4L, 5L).forall(a => r(a)._1 == 0L && r(a)._2 > 0L))
    // symmetric roles tie exactly in integer arithmetic
    assert(r(1L) == r(2L) && r(3L) == r(4L) && r(4L) == r(5L))
  }

  test("authority concentration: the common target out-auths a side target") {
    val edges = Seq[(Long, Long)]((1, 10), (2, 10), (3, 10), (3, 11))
    val r = run(edges, 3)
    assert(r(10L)._2 > r(11L)._2)
    // L1 mass conservation within floor-division loss: Σ auth ≤ 10⁶
    assert(r.values.map(_._2).sum <= PageRank.Micro)
    assert(r.values.map(_._1).sum <= PageRank.Micro)
  }

  test("partitioning invariance: exact same micro scores at any layout") {
    val edges = (0L until 300L).map(i => (i % 37, (i * 7 + 3) % 37))
    val a = Hits.scores(edges.toDF("src", "dst").repartition(1),
      "src", "dst", 3).as[(Long, Long, Long)].collect().toSet
    val b = Hits.scores(edges.toDF("src", "dst").repartition(13),
      "src", "dst", 3).as[(Long, Long, Long)].collect().toSet
    assert(a == b)
  }
}
