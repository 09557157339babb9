package graft.graph

import graft.SparkTestBase

class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.ranks(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(Long, Long)].collect().toMap

  test("DataFrame ≡ pure twin on a mixed graph with dangling + dup edges") {
    val edges = Seq[(Long, Long)](
      (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (4, 3), // dup collapses
      (5, 1)) // 5 is unreferenced, 4→3 makes 3 a hub
    for (iters <- Seq(1, 3, 5)) {
      assert(run(edges, iters) == PageRank.ranksPure(edges, iters), s"iters=$iters")
    }
  }

  test("star graph: the center outranks every leaf; leaves tie exactly") {
    val star = (2L to 9L).map(i => (i, 1L)) ++ Seq((1L, 2L))
    val r = run(star, 3)
    val leaves = (3L to 9L).map(r)
    assert(leaves.distinct.size == 1) // int arithmetic → exact ties
    assert(r(1L) > r(2L) && r(2L) > leaves.head)
  }

  test("partitioning invariance: exact same micro ranks at any layout") {
    val edges = (0L until 300L).map(i => (i % 37, (i * 7 + 3) % 37))
    val a = PageRank.ranks(edges.toDF("src", "dst").repartition(1),
      "src", "dst", 4).as[(Long, Long)].collect().toMap
    val b = PageRank.ranks(edges.toDF("src", "dst").repartition(13),
      "src", "dst", 4).as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("teleport floor: a node with no in-edges holds 10⁶ − damp") {
    val r = run(Seq((1L, 2L)), 3)
    assert(r(1L) == 150000L)
  }

  test("dangling redistribution: DataFrame ≡ pure twin; mass stays near N·10⁶") {
    // 4 and 6 are destination-only (dangling); 5 is unreferenced
    val edges = Seq[(Long, Long)](
      (1, 2), (1, 4), (2, 3), (3, 6), (5, 1), (2, 6))
    for (iters <- Seq(1, 3, 5)) {
      val df = PageRank.ranks(edges.toDF("src", "dst"), "src", "dst", iters,
        redistributeDangling = true).as[(Long, Long)].collect().toMap
      val pure = PageRank.ranksPure(edges, iters, redistributeDangling = true)
      assert(df == pure, s"iters=$iters")
      graft.io.Persisted.release(spark)
    }
    // conservation: with redistribution the total stays within integer
    // floor-division slack of N·10⁶; without it the dangling mass drains
    val n = 6L
    val withD = PageRank.ranksPure(edges, 5, redistributeDangling = true)
    val withoutD = PageRank.ranksPure(edges, 5)
    assert(withD.values.sum > withoutD.values.sum)
    assert(math.abs(withD.values.sum - n * PageRank.Micro) < n * 10L,
      s"mass ${withD.values.sum} too far from ${n * PageRank.Micro}")
  }

  test("no dangling nodes: redistribution flag is a no-op") {
    val cycle = Seq[(Long, Long)]((1, 2), (2, 3), (3, 1))
    assert(PageRank.ranksPure(cycle, 4, redistributeDangling = true) ==
      PageRank.ranksPure(cycle, 4))
    val r = PageRank.ranks(cycle.toDF("src", "dst"), "src", "dst", 4,
      redistributeDangling = true).as[(Long, Long)].collect().toMap
    assert(r == PageRank.ranksPure(cycle, 4))
    graft.io.Persisted.release(spark)
  }

  test("bad arguments refused") {
    intercept[IllegalArgumentException] {
      PageRank.ranks(Seq((1L, 2L)).toDF("src", "dst"), "src", "dst", 0)
    }
    intercept[IllegalArgumentException] {
      PageRank.ranks(Seq((1L, 2L)).toDF("src", "dst"), "src", "dst", 1,
        dampMicro = 2000000L)
    }
  }
}
