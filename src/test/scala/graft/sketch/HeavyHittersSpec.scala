package graft.sketch

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  // skewed fixture: two hot keys at ~20% each + a unique long tail
  private def skewed(n: Int): Seq[String] =
    (0 until n).map { i =>
      if (i % 10 < 2) "hot-a" else if (i % 10 < 4) "hot-b" else s"cold-$i"
    }

  test("mgStreamPure: per-item undercount bounded by n/(k+1)") {
    val vals = skewed(2000)
    val exact = vals.groupBy(identity).map { case (v, g) => v -> g.size.toLong }
    val k = 9
    val summary = HeavyHitters.mgStreamPure(vals.iterator, k)
    assert(summary.size <= k)
    val bound = vals.size.toLong / (k + 1)
    for ((v, c) <- summary) {
      assert(c <= exact(v), s"$v over-counted: $c > ${exact(v)}")
      assert(exact(v) - c <= bound, s"$v undercount ${exact(v) - c} > $bound")
    }
    // every true heavy hitter (count > n/(k+1)) must be present
    for ((v, c) <- exact if c > bound) assert(summary.contains(v), v)
  }

  test("mgMergePure: merged summaries keep the additive error bound") {
    val vals = skewed(3000)
    val k = 9
    val halves = vals.grouped(700).toSeq
    val merged = halves.map(h => HeavyHitters.mgStreamPure(h.iterator, k))
      .reduce((a, b) => HeavyHitters.mgMergePure(a, b, k))
    assert(merged.size <= k)
    val exact = vals.groupBy(identity).map { case (v, g) => v -> g.size.toLong }
    val bound = vals.size.toLong / (k + 1)
    for ((v, c) <- merged) {
      assert(c <= exact(v))
      assert(exact(v) - c <= bound)
    }
    for ((v, c) <- exact if c > bound) assert(merged.contains(v), v)
  }

  test("heavyHitters: exact counts above n/den, partitioning-invariant") {
    val vals = skewed(5000)
    val expected = HeavyHitters.heavyHittersPure(vals, k = 16, den = 8)
    assert(expected.map(_._1) == Seq("hot-a", "hot-b")) // fixture sanity
    for (parts <- Seq(1, 3, 32)) {
      val df = vals.toDF("value").repartition(parts)
      val got = HeavyHitters.heavyHitters(df, "value", k = 16, den = 8)
        .as[(String, Long)].collect().sortBy(_._1).toSeq
      assert(got == expected, s"parts=$parts")
    }
  }

  test("heavyHitters: empty input and guardrails") {
    val empty = Seq.empty[String].toDF("value")
    assert(HeavyHitters.heavyHitters(empty, "value", k = 8, den = 4).count() == 0)
    intercept[IllegalArgumentException] {
      HeavyHitters.heavyHitters(empty, "value", k = 4, den = 6) // den > k+1
    }
  }
}
