package graft.graph

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CocitationSpec extends SparkTestBase {
  import spark.implicits._

  private val edges = Seq(
    ("s1", "a"), ("s1", "b"), ("s1", "c"),
    ("s2", "a"), ("s2", "b"),
    ("s3", "b"), ("s3", "c"),
    ("s4", "a"), ("s4", "b"), ("s4", "a"),          // duplicate citation
    ("hub", "a"), ("hub", "b"), ("hub", "c"), ("hub", "d"), ("hub", "e"))

  private def df = edges.toDF("src", "dst")

  private def run(maxOut: Int) =
    Cocitation.pairs(df, "src", "dst", maxOut)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  test("hand-counted co-citations with the hub dropped") {
    val got = run(3)
    // hub has 5 distinct targets > 3 -> contributes nothing;
    // (a,b): s1, s2, s4; (a,c): s1; (b,c): s1, s3
    assert(got == Map(("a", "b") -> 3L, ("a", "c") -> 1L, ("b", "c") -> 2L))
    // raising the cap admits the hub's C(5,2) pairs
    val all = run(5)
    // total pair-occurrences: s1 yields 3, s2/s3/s4 one each, hub C(5,2)
    assert(all(("a", "b")) == 4L && all(("d", "e")) == 1L)
    assert(all.values.sum == 3L + 1 + 1 + 1 + (5L * 4 / 2))
  }

  test("duplicate citations collapse before pairing") {
    // s4's double (s4,a) must not double-count (a,b)
    val noDup = Cocitation.pairs(df.dropDuplicates("src", "dst"),
      "src", "dst", 3).as[(String, String, Long)].collect().toSet
    val withDup = Cocitation.pairs(df, "src", "dst", 3)
      .as[(String, String, Long)].collect().toSet
    assert(noDup == withDup)
  }

  test("pure twin parity and partitioning invariance") {
    for (cap <- Seq(2, 3, 5)) {
      val exp = Cocitation.pairsPure(edges, cap)
      assert(run(cap) == exp, s"cap=$cap")
      val scrambled = Cocitation.pairs(df.repartition(7), "src", "dst", cap)
        .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3)
        .toMap
      assert(scrambled == exp, s"scrambled cap=$cap")
    }
  }

  test("bibliographic coupling = the transpose") {
    // sources sharing out-links: swap the columns
    val got = Cocitation.pairs(df, "dst", "src", 10)
      .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3)
      .toMap
    // s1 and s2 share {a,b}; s1 and s3 share {b,c}; s2 and s4 share {a,b}
    assert(got(("s1", "s2")) == 2L && got(("s1", "s3")) == 2L &&
      got(("s2", "s4")) == 2L)
  }

  test("refusal: degenerate cap") {
    intercept[IllegalArgumentException](
      Cocitation.pairs(df, "src", "dst", 1))
  }
}
