package graft.sim

import graft.SparkTestBase

class BitextSpec extends SparkTestBase {
  import spark.implicits._

  // src cluster around +x, dst has one aligned mate per src point plus a
  // hub vector that is moderately close to EVERYTHING — raw cosine would
  // retrieve the hub; the margin demotes it
  private val src: Seq[(Long, Seq[Float])] = Seq(
    (0L, Seq(1f, 0f, 0f)), (2L, Seq(0f, 1f, 0f)), (4L, Seq(0f, 0f, 1f)))
  private val dst: Seq[(Long, Seq[Float])] = Seq(
    (1L, Seq(0.9f, 0.1f, 0f)), (3L, Seq(0.1f, 0.9f, 0f)),
    (5L, Seq(0f, 0.1f, 0.9f)), (7L, Seq(0.6f, 0.6f, 0.6f)))

  test("pairs, margins, and best flags match the pure twin") {
    val got = Similarity.bitextMine(src.toDF("vec_id", "embedding"),
        dst.toDF("vec_id", "embedding"), "vec_id", "embedding", 2)
      .as[(Long, Long, Long, Long, Boolean)].collect().toSet
    val exp = Similarity.bitextMinePure(src, dst, 2).toSet
    assert(got == exp)
    // every src keeps exactly one best pair, and it is the aligned mate,
    // not the hub (margin normalization is what demotes the hub)
    val best = got.filter(_._5).map(p => p._1 -> p._2).toMap
    assert(best == Map(0L -> 1L, 2L -> 3L, 4L -> 5L))
    // the hub appears as a candidate but never as best
    assert(got.exists(_._2 == 7L))
  }

  test("partitioning invariance and non-positive-denominator drop") {
    val a = Similarity.bitextMine(src.toDF("vec_id", "embedding").repartition(5),
        dst.toDF("vec_id", "embedding").repartition(3), "vec_id", "embedding", 3)
      .as[(Long, Long, Long, Long, Boolean)].collect().toSet
    assert(a == Similarity.bitextMinePure(src, dst, 3).toSet)
    // an anti-aligned corpus: all cross cosines negative -> denominator
    // never positive -> no pairs survive
    val anti: Seq[(Long, Seq[Float])] = Seq((11L, Seq(-1f, 0f, 0f)),
      (13L, Seq(0f, -1f, 0f)))
    val got = Similarity.bitextMine(src.toDF("vec_id", "embedding"),
      anti.toDF("vec_id", "embedding"), "vec_id", "embedding", 2)
    assert(got.count() == 0)
    assert(Similarity.bitextMinePure(src, anti, 2).isEmpty)
  }

  test("refusal") {
    intercept[IllegalArgumentException](
      Similarity.bitextMine(src.toDF("vec_id", "embedding"),
        dst.toDF("vec_id", "embedding"), "vec_id", "embedding", 0))
  }
}
