package graft.graph

import graft.SparkTestBase

class KCoreSpec extends SparkTestBase {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], k: Int, rounds: Int, parts: Int = 4) =
    KCore.core(edges.toDF("src", "dst").repartition(parts), "src", "dst", k, rounds)
      .as[(Long, Long)].collect().toMap

  test("K5 with a pendant chain: the 3-core is exactly the clique") {
    val k5 = for (i <- 0L to 4L; j <- 0L to 4L if i < j) yield (i, j)
    val chain = Seq((4L, 10L), (10L, 11L), (11L, 12L)) // peels in 3 rounds
    val got = run(k5 ++ chain, k = 3, rounds = 3)
    assert(got.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(got.values.toSet == Set(4L)) // every clique node keeps degree 4
  }

  test("chain peels one layer per round and converges to empty for k=2") {
    val chain = (0L until 6L).map(i => (i, i + 1))
    // after enough rounds nothing survives a 2-core demand on a path
    assert(run(chain, k = 2, rounds = 4).isEmpty)
    // too few rounds -> a shrinking superset remains
    val partial = run(chain, k = 2, rounds = 1)
    assert(partial.nonEmpty)
  }

  test("self-loops cannot keep a node alive") {
    val edges = Seq((1L, 1L), (1L, 2L))
    assert(run(edges, k = 2, rounds = 2).isEmpty)
  }

  test("DF equals the pure peel twin on a messy pseudo-random graph") {
    val edges = (0 until 400).map { i =>
      ((i * 2654435761L) % 35, (i * 40503L + 7) % 35)
    }
    for (k <- Seq(2, 4); rounds <- Seq(1, 3)) {
      assert(run(edges, k, rounds) == KCore.corePure(edges, k, rounds),
        s"k=$k rounds=$rounds")
    }
  }

  test("partitioning invariance") {
    val edges = (0 until 300).map(i => ((i * 31L) % 30, (i * 17L + 3) % 30))
    val expected = KCore.corePure(edges, 3, 3)
    for (p <- Seq(1, 5, 13)) {
      assert(run(edges, 3, 3, parts = p) == expected, s"parts=$p")
    }
  }

  test("bad arguments are refused") {
    intercept[IllegalArgumentException](run(Seq((1L, 2L)), k = 0, rounds = 1))
    intercept[IllegalArgumentException](run(Seq((1L, 2L)), k = 1, rounds = 0))
  }
}
