package graft.graph

import graft.SparkTestBase

class PointersSpec extends SparkTestBase {
  import spark.implicits._

  private def run(edges: Seq[(String, String)], rounds: Int, parts: Int = 4) =
    Pointers.resolve(edges.toDF("src", "dst").repartition(parts),
      "src", "dst", rounds)
      .as[(String, String, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  /** u7→u6→…→u0 (root, no out-edge): chain of length 7. */
  private val chain: Seq[(String, String)] =
    (1 to 7).map(i => (s"u$i", s"u${i - 1}"))

  test("3 rounds resolve a 7-hop chain to its root, converged") {
    val out = run(chain, rounds = 3)
    assert(out.size == 7)
    (1 to 7).foreach(i => assert(out(s"u$i") == (("u0", true)), s"u$i"))
  }

  test("insufficient rounds leave long chains mid-walk, flagged unconverged") {
    // 1 round = 2 hops: u7 lands on u5, which still has an out-edge
    val out = run(chain, rounds = 1)
    assert(out("u7") == (("u5", false)))
    assert(out("u2") == (("u0", true))) // short chains finish early
  }

  test("cycles and self-loops never converge; members stay in the cycle") {
    val out = run(chain ++ Seq(("c1", "c2"), ("c2", "c1"), ("s", "s")),
      rounds = 3)
    val (t1, ok1) = out("c1")
    val (t2, ok2) = out("c2")
    assert(!ok1 && !ok2 && Set(t1, t2).subsetOf(Set("c1", "c2")))
    assert(out("s") == (("s", false)))
    // the chain is unaffected by the cycle's presence
    assert(out("u7") == (("u0", true)))
  }

  test("partitioning invariance") {
    val e = chain ++ Seq(("c1", "c2"), ("c2", "c1"))
    assert(run(e, 3, parts = 1).toSeq.sortBy(_._1) ==
      run(e, 3, parts = 7).toSeq.sortBy(_._1))
  }

  test("rounds bounds are refused") {
    intercept[IllegalArgumentException](run(chain, rounds = 0))
    intercept[IllegalArgumentException](run(chain, rounds = 11))
  }
}
