package graft.io

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  private def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    Iterator.continually(g.sample).flatten.take(200).foreach(f)

  test("zValue ≡ pure twin; inverse round-trips; interleave is exact") {
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L), (1023L, 1023L),
      (512L, 7L))
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zValue(col("a"), col("b"), 10).as("z"))
      .as[(Long, Long, Long)].collect().toMap2
    for ((a, b) <- pairs) {
      val z = Layout.zValuePure(a, b, 10)
      assert(got((a, b)) == z)
      assert(Layout.zInversePure(z, 10) == ((a, b)))
    }
    // spot values: (5=101b, 3=011b) → z = 1·1 + 1·2 + 0·4 + 1·8 + 1·16 = 27
    assert(Layout.zValuePure(5L, 3L, 10) == 27L)
    forAll(Gen.zip(Gen.choose(0L, 1023L), Gen.choose(0L, 1023L))) { case (a, b) =>
      assert(Layout.zInversePure(Layout.zValuePure(a, b, 10), 10) == ((a, b)))
    }
  }

  test("out-of-range keys are refused in-plan, not truncated") {
    val bad = Seq((1024L, 1L)).toDF("a", "b")
    val ex = intercept[Exception] {
      bad.select(Layout.zValue(col("a"), col("b"), 10)).collect()
    }
    assert(ex.getMessage != null)
  }

  test("zOrdered layout: curve-sorted ranges make BOTH dimensions skippable") {
    val rows = for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)
    val parts = Layout.zOrdered(rows.toDF("a", "b"), "a", "b", 6, 8)
      .select(spark_partition_id().as("p"), col("a"), col("b"))
      .groupBy("p").agg(min("a").as("a0"), max("a").as("a1"),
        min("b").as("b0"), max("b").as("b1"), count(lit(1)).as("n"))
      .as[(Int, Long, Long, Long, Long, Long)].collect()
    assert(parts.map(_._6).sum == 64L * 64L)
    // every partition's bounding box must be far tighter than the full
    // domain in BOTH dimensions — the property a single-column sort cannot
    // give (its trailing column spans the whole domain in every file)
    val avgAspan = parts.map(p => p._3 - p._2 + 1).sum.toDouble / parts.length
    val avgBspan = parts.map(p => p._5 - p._4 + 1).sum.toDouble / parts.length
    assert(avgAspan <= 40, s"a-span $avgAspan")
    assert(avgBspan <= 40, s"b-span $avgBspan")
    // and the plan is a range repartition (adaptive curve histogram)
    val plan = Layout.zOrdered(rows.toDF("a", "b"), "a", "b", 6, 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
  }

  private implicit class ToMap2(rows: Array[(Long, Long, Long)]) {
    def toMap2: Map[(Long, Long), Long] =
      rows.map(r => (r._1, r._2) -> r._3).toMap
  }
}
