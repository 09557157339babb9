package graft.sql

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class WindowTopKRewriteSpec extends SparkTestBase {
  import spark.implicits._

  private val ConfKey = "spark.graft.topk.rewrite"

  private def corpus() = (0 until 2000).map { i =>
    (s"k${i % 23}", ((i * 2654435761L) % 97), i.toLong)
  }.toDF("key", "score", "id")

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy("key").orderBy(col("score").desc, col("id"))
    corpus().withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("key", "score", "id")
  }

  private def withFlag[A](on: Boolean)(body: => A): A = {
    // restore (not unset): the shared test session now defaults the flag
    // ON, matching every production session
    val prev = spark.conf.getOption(ConfKey)
    spark.conf.set(ConfKey, on.toString)
    try body
    finally prev.fold(spark.conf.unset(ConfKey))(spark.conf.set(ConfKey, _))
  }

  test("flag off: window plan unchanged") {
    withFlag(on = false) {
      val plan = windowTopK(3).queryExecution.executedPlan.toString
      assert(plan.contains("Window"), plan)
      assert(!plan.contains("GraftTopK"), plan)
    }
  }

  test("flag on: rn <= k rewrites to the native operator with identical rows") {
    val expected = withFlag(on = false)(
      windowTopK(3).as[(String, Long, Long)].collect().toSet)
    withFlag(on = true) {
      val df = windowTopK(3)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("GraftTopKFinal"), plan)
      assert(!plan.contains("Window"), plan)
      assert(df.as[(String, Long, Long)].collect().toSet == expected)
    }
  }

  test("SQL text form rewrites too") {
    withFlag(on = true) {
      corpus().createOrReplaceTempView("rw_corpus")
      val df = spark.sql(
        """SELECT key, score, id FROM (
          |  SELECT key, score, id,
          |    row_number() OVER (PARTITION BY key ORDER BY score DESC, id) AS rn
          |  FROM rw_corpus) WHERE rn <= 4""".stripMargin)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("GraftTopKFinal"), plan)
      assert(!plan.contains("Window"), plan)
      assert(df.count() == 23 * 4)
    }
  }

  test("rn = 1 argmax idiom rewrites with k = 1") {
    withFlag(on = true) {
      val w = Window.partitionBy("key").orderBy(col("score").desc, col("id"))
      val df = corpus().withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select("key", "id")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("GraftTopKFinal"), plan)
      assert(df.count() == 23)
    }
  }

  test("rn < k rewrites as k-1") {
    withFlag(on = true) {
      val w = Window.partitionBy("key").orderBy(col("score").desc, col("id"))
      val df = corpus().withColumn("rn", row_number().over(w))
        .filter(col("rn") < 3).select("key", "id")
      assert(df.queryExecution.executedPlan.toString.contains("GraftTopKFinal"))
      assert(df.count() == 23 * 2)
    }
  }

  test("selecting the rank keeps the window plan") {
    withFlag(on = true) {
      val w = Window.partitionBy("key").orderBy(col("score").desc, col("id"))
      val df = corpus().withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3).select("key", "id", "rn")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("Window"), plan)
      assert(!plan.contains("GraftTopK"), plan)
    }
  }

  test("rank() and extra filter predicates are left alone") {
    withFlag(on = true) {
      val w = Window.partitionBy("key").orderBy(col("score").desc, col("id"))
      val ranked = corpus().withColumn("rn", rank().over(w))
        .filter(col("rn") <= 3).select("key", "id")
      assert(!ranked.queryExecution.executedPlan.toString.contains("GraftTopK"))

      val mixed = corpus().withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3 && col("score") > 10).select("key", "id")
      val plan = mixed.queryExecution.executedPlan.toString
      assert(plan.contains("Window"), plan)
      assert(!plan.contains("GraftTopK"), plan)
    }
  }
}
