package graft.dedup

import graft.SparkTestBase

class BlockingSpec extends SparkTestBase {
  import spark.implicits._

  // keys chosen so sort order != id order
  private val rows = Seq(
    (1L, "smith john"), (2L, "smyth john"), (3L, "adams ann"),
    (4L, "smith jon"), (5L, "adams anne"), (6L, "zeta z"),
    (7L, "adams ann"))  // duplicate key -> id tie-break

  private def df = rows.toDF("id", "k")

  test("pair set with distances matches the pure twin, each pair once") {
    for (w <- Seq(2, 3, 4)) {
      val got = Blocking.sortedNeighborhood(df, "id", "k", w)
        .as[(Long, Long, Long)].collect().toSeq
      // no duplicate emissions from the two-band explode
      assert(got.size == got.toSet.size, s"w=$w duplicated pairs")
      assert(got.toSet == Blocking.sortedNeighborhoodPure(rows, w), s"w=$w")
    }
    // w=3 window over sorted keys [3,7,5,1,4,2,6]: (3,7) adjacent dup keys
    val w3 = Blocking.sortedNeighborhood(df, "id", "k", 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(w3.contains((3L, 7L, 1L)))  // id tie-break on equal keys
    assert(w3.contains((3L, 5L, 2L)))
    assert(!w3.contains((3L, 1L, 3L))) // outside the window
  }

  test("windows cross range-partition boundaries; partitioning invariant") {
    val big = (1L to 200L).map(i => (i, f"k${(i * 37) % 200}%04d"))
    val bigDf = big.toDF("id", "k")
    val exp = Blocking.sortedNeighborhoodPure(big, 5)
    for (parts <- Seq(1, 13)) {
      val got = Blocking.sortedNeighborhood(bigDf.repartition(parts), "id", "k", 5)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == exp, s"parts=$parts")
    }
    // count law: n rows, window w -> sum_{d=1..w-1} (n-d) pairs
    assert(exp.size == (1 to 4).map(200 - _).sum)
  }

  test("refusals") {
    intercept[IllegalArgumentException](
      Blocking.sortedNeighborhood(df, "id", "k", 1))
    intercept[IllegalArgumentException](
      Blocking.sortedNeighborhood(df, "nope", "k", 3))
  }
}
