package graft.graph

import graft.SparkTestBase

class LabelPropSpec extends SparkTestBase {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], iters: Int, parts: Int = 4) =
    LabelProp.labels(edges.toDF("src", "dst").repartition(parts), "src", "dst", iters)
      .as[(Long, Long)].collect().toMap

  test("two cliques joined by one bridge resolve to two communities") {
    val cliqueA = for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j)
    val cliqueB = for (i <- 10L to 13L; j <- 10L to 13L if i < j) yield (i, j)
    val edges = cliqueA ++ cliqueB ++ Seq((3L, 10L))
    val labs = run(edges, iters = 4)
    // within each clique all labels agree; across the bridge they differ
    assert(Set(labs(0L), labs(1L), labs(2L)).size == 1)
    assert(Set(labs(11L), labs(12L), labs(13L)).size == 1)
    assert(labs(0L) != labs(13L))
  }

  test("DF equals the pure synchronous twin on a messy pseudo-random graph") {
    val edges = (0 until 300).map { i =>
      val a = (i * 2654435761L) % 40
      val b = (i * 40503L + 7) % 40
      (a, b) // includes self-loops and duplicates
    }
    for (iters <- Seq(1, 2, 3)) {
      assert(run(edges, iters) == LabelProp.labelsPure(edges, iters), s"iters=$iters")
    }
  }

  test("partitioning invariance") {
    val edges = (0 until 200).map(i => ((i * 31L) % 25, (i * 17L + 3) % 25))
    val expected = LabelProp.labelsPure(edges, 3)
    for (p <- Seq(1, 3, 11)) {
      assert(run(edges, 3, parts = p) == expected, s"parts=$p")
    }
  }

  test("self-loop-only node keeps its own label; tie breaks to smallest label") {
    // node 5 has only a self-loop; nodes 1-2 are a pair (each adopts the
    // other's label round 1); node 3 neighbors both 1 and 2 equally -> tie
    // between labels 1 and 2 breaks to 1 after round 1
    val edges = Seq((5L, 5L), (1L, 2L), (3L, 1L), (3L, 2L))
    val labs = run(edges, 1)
    assert(labs(5L) == 5L)
    assert(labs(3L) == 1L)
    assert(labs(1L) == 2L || labs(1L) == 3L) // most-frequent among {2, 3}: tie -> 2
    assert(labs(1L) == 2L)
  }

  test("iters must be positive") {
    intercept[IllegalArgumentException](run(Seq((1L, 2L)), 0))
  }
}
