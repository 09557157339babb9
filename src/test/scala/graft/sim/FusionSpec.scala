package graft.sim

import graft.SparkTestBase

class FusionSpec extends SparkTestBase {
  import spark.implicits._

  // two retrievers over two queries: doc 10 strong in both; 20/30 in one
  private val bm = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L),
    (2L, 40L, 1L))
  private val knn = Seq((1L, 10L, 2L), (1L, 20L, 1L), (1L, 99L, 3L),
    (2L, 50L, 1L))

  test("hand-fused scores, both-list boost, tie-break, per-query topK") {
    val got = Fusion.rrf(Seq(bm.toDF("q", "d", "r"), knn.toDF("q", "d", "r")),
        "q", "d", "r", kConst = 60, topK = 3)
      .as[(Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._5).map(t =>
        (t._2, t._3, t._4)).toSeq).toMap
    // q1: d10 = 1e6/61 + 1e6/62 = 16393 + 16129 = 32522
    //     d20 = 1e6/62 + 1e6/61 = 32522  -> exact tie, doc asc breaks it
    //     d30 = 1e6/63 = 15873, d99 = 1e6/63 = 15873 (tie -> 30 first)
    assert(got(1L) == Seq((10L, 2L, 32522L), (20L, 2L, 32522L),
      (30L, 1L, 15873L)))
    // q2: singletons from each list
    assert(got(2L) == Seq((40L, 1L, 16393L), (50L, 1L, 16393L)))
  }

  test("pure twin parity and refusals") {
    val exp = Fusion.rrfPure(Seq(
      bm.filter(_._1 == 1L).map(t => (t._2, t._3)),
      knn.filter(_._1 == 1L).map(t => (t._2, t._3))), 60, 10)
    val got = Fusion.rrf(Seq(bm.toDF("q", "d", "r"), knn.toDF("q", "d", "r")),
        "q", "d", "r", 60, 10)
      .filter($"q" === 1L).as[(Long, Long, Long, Long, Long)].collect()
      .sortBy(_._5).map(t => (t._2, t._3, t._4, t._5)).toSeq
    assert(got == exp)
    intercept[IllegalArgumentException](Fusion.rrf(Nil, "q", "d", "r"))
    intercept[IllegalArgumentException](
      Fusion.rrf(Seq(bm.toDF("q", "d", "r")), "q", "d", "r", kConst = 0))
  }
}
