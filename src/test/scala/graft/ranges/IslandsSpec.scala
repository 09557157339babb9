package graft.ranges

import graft.SparkTestBase

class IslandsSpec extends SparkTestBase {
  import Islands._

  val all10: Seq[Int] = 1 to 10

  test("R1 empty inputs") {
    assert(mergeRanges(Nil, all10, 1) == Nil)
    assert(mergeRanges(Seq(3), Nil, 1) == Nil)
  }

  test("R1 isolated hit gets buffered and clamped") {
    assert(mergeRanges(Seq(5), all10, 1) == Seq((4, 6)))
    assert(mergeRanges(Seq(1), all10, 1) == Seq((1, 2)))   // clamp at min
    assert(mergeRanges(Seq(10), all10, 1) == Seq((9, 11 min 10)))
  }

  test("R1 adjacent ranges merge (start <= prev_end + 1)") {
    // [2,4] and [5,7]: 5 <= 4+1 -> merged
    assert(mergeRanges(Seq(3, 6), all10, 1) == Seq((2, 7)))
    // [1,3] and [5,7]: 5 <= 3+1? no (5 > 4) -> separate
    assert(mergeRanges(Seq(2, 6), all10, 1) == Seq((1, 3), (5, 7)))
    assert(mergeRanges(Seq(2, 5), all10, 1) == Seq((1, 6)))
  }

  test("R1 buffer=0 and buffer=3 variants") {
    assert(mergeRanges(Seq(3, 5), all10, 0) == Seq((3, 3), (5, 5)))
    assert(mergeRanges(Seq(3, 4), all10, 0) == Seq((3, 4))) // adjacency merge
    assert(mergeRanges(Seq(5), all10, 3) == Seq((2, 8)))
  }

  test("R2 neighbor expansion floors at 0, no merge") {
    assert(expandNeighbors(Seq(0, 5), 1) == Seq(0, 1, 4, 5, 6))
    assert(expandNeighbors(Seq(2), 2) == Seq(0, 1, 2, 3, 4))
  }

  test("R4 silently drops ranges with missing endpoint pages") {
    val boundaries = Set(1, 2, 3, 5, 6)
    // endpoint 4 missing -> whole range dropped (policy_filter.py:201)
    assert(keptPages(Seq((2, 4)), boundaries) == Nil)
    assert(keptPages(Seq((1, 3)), boundaries) == Seq(1, 2, 3))
    // interior gap is fine, endpoint presence is what matters
    assert(keptPages(Seq((3, 5)), boundaries) == Seq(3, 5))
  }

  test("R6 first-K cap") {
    assert(firstK(Seq(9, 1, 5, 3), 2) == Seq(1, 3))
  }

  test("R1 properties: sorted, disjoint, covers hits, idempotent") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 300) {
      val n = 1 + rng.nextInt(40)
      val hits = Seq.fill(rng.nextInt(12))(1 + rng.nextInt(n)).distinct
      val buffer = rng.nextInt(4)
      val all = 1 to n
      val merged = mergeRanges(hits, all, buffer)
      // sorted and disjoint with gaps > 1
      merged.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(s2 > e1 + 1)
        case _                     =>
      }
      merged.foreach { case (s, e) => assert(s <= e && s >= 1 && e <= n) }
      // every hit is covered
      hits.foreach(h => assert(merged.exists { case (s, e) => s <= h && h <= e }))
      // idempotent: merging the merged starts again changes nothing
      if (hits.nonEmpty) {
        val again = mergeRanges(merged.flatMap { case (s, e) => s to e }, all, 0)
        assert(again == merged)
      }
    }
  }

  test("R1 DataFrame form agrees with the pure form") {
    import spark.implicits._
    val cases = Seq(
      ("a", Seq(3, 6), 10), ("b", Seq(2, 6), 10), ("c", Seq(1, 10), 10),
      ("d", Seq(5), 5), ("e", Seq(1, 2, 3), 8), ("f", Seq(4, 8, 9), 12))
    val hits = cases.flatMap { case (k, hs, n) => hs.map(h => (k, h, 1, n)) }
      .toDF("doc_id", "page", "min_page", "max_page")
    val got = mergeRangesDf(hits, Seq("doc_id"), "page", "min_page", "max_page", 1)
      .collect()
      .map(r => (r.getString(0), (r.getInt(1), r.getInt(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
    for ((k, hs, n) <- cases)
      assert(got(k) == mergeRanges(hs, 1 to n, 1), s"case $k")
  }
}
