package graft.sim

import graft.SparkTestBase

class KCenterSpec extends SparkTestBase {
  import spark.implicits._

  private val U = 1000000000000L // 1 unit² in micro²

  private val pts: Seq[(Long, Seq[Float])] = Seq(
    (1L, Seq(0f, 0f)), (2L, Seq(3f, 0f)), (3L, Seq(0f, 4f)),
    (4L, Seq(3f, 4f)), (5L, Seq(0.1f, 0f)))

  private def df = pts.toDF("vec_id", "embedding")

  test("greedy rounds match the hand trace and the pure twin") {
    val got = Similarity.kCenterSelect(df, "vec_id", "embedding", 3)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // seed = min id; round 1 = farthest (4 at 25 units²);
    // round 2 = tie between 2 and 3 at 9 units² -> smaller id 2
    assert(got == Seq((0L, 1L, 0L), (1L, 4L, 25L * U), (2L, 2L, 9L * U)))
    assert(got == Similarity.kCenterSelectPure(pts, 3))
  }

  test("early-stop at radius 0 and partitioning invariance") {
    val dups: Seq[(Long, Seq[Float])] =
      Seq((1L, Seq(1f, 1f)), (2L, Seq(1f, 1f)), (3L, Seq(2f, 1f)))
    // only 2 distinct points: k=3 yields 2 rows
    val got = Similarity.kCenterSelect(dups.toDF("vec_id", "embedding"),
      "vec_id", "embedding", 3).as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((0L, 1L, 0L), (1L, 3L, U)))
    assert(got.toSeq == Similarity.kCenterSelectPure(dups, 3))
    // partitioning cannot move the selection
    val a = Similarity.kCenterSelect(df.repartition(7), "vec_id", "embedding", 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == Similarity.kCenterSelectPure(pts, 4))
  }

  test("null vectors dropped; refusals") {
    val withNull = (pts.map { case (i, v) => (i, Some(v)) } :+
      (9L, Option.empty[Seq[Float]])).toDF("vec_id", "embedding")
    val got = Similarity.kCenterSelect(withNull, "vec_id", "embedding", 2)
      .as[(Long, Long, Long)].collect()
    assert(!got.exists(_._2 == 9L) && got.length == 2)
    intercept[IllegalArgumentException](
      Similarity.kCenterSelect(df, "vec_id", "embedding", 0))
    intercept[IllegalArgumentException](
      Similarity.kCenterSelect(
        df.withColumn("vec_id", $"vec_id".cast("int")),
        "vec_id", "embedding", 2))
  }
}
