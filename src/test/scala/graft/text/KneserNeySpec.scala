package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class KneserNeySpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    "the cat sat on the mat",
    "the cat ate the fish",
    "a dog sat on a log",
    "the dog ate the cat")

  test("knBigramLm ≡ pure twin; counts and probability are exact") {
    val got = graft.io.Persisted.unpersistAfter(spark) {
      KneserNey.knBigramLm(corpus.toDF("text"), "text", k = 100)
        .as[(String, String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    }
    val exp = KneserNey.knBigramLmPure(corpus, 100)
    assert(got == exp)
    val byPair = got.map(r => (r._1, r._2) -> r).toMap
    // hand check "the cat": c12=3 ("the cat" x3), c1=6 (the cat x3, the
    // mat, the fish, the dog), n1f=4 (cat/mat/fish/dog follow "the"),
    // n1b=1 (only "the" precedes "cat"), T = distinct bigram types
    val t = got.head._7
    val r = byPair(("the", "cat"))
    assert((r._3, r._4, r._5, r._6) == ((3L, 6L, 4L, 1L)))
    assert(r._8 == (math.max(4 * 3 - 3, 0L) * t + 3 * 4 * 1) * 1000000L / (4 * 6 * t))
    // continuation weighting: a bigram seen once has p from BOTH terms;
    // max(4·1-3,0) = 1 keeps a sliver of the direct term
    val once = got.filter(_._3 == 1L)
    assert(once.nonEmpty && once.forall(_._8 > 0))
    // probabilities are sane: within (0, 1e6]
    assert(got.forall(r => r._8 > 0 && r._8 <= 1000000L))
  }

  test("ordering is (c12 desc, w1, w2) and k caps the head") {
    val top = graft.io.Persisted.unpersistAfter(spark) {
      KneserNey.knBigramLm(corpus.toDF("text"), "text", k = 3)
        .as[(String, String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    }
    assert(top.length == 3)
    assert(top == KneserNey.knBigramLmPure(corpus, 3))
    assert(top.head._3 >= top.last._3)
  }

  test("partitioning-invariant") {
    val a = graft.io.Persisted.unpersistAfter(spark) {
      KneserNey.knBigramLm(corpus.toDF("text").repartition(7), "text", 100)
        .collect().toSeq
    }
    val b = graft.io.Persisted.unpersistAfter(spark) {
      KneserNey.knBigramLm(corpus.toDF("text").repartition(2), "text", 100)
        .collect().toSeq
    }
    assert(a == b)
  }
}
