package graft.io

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  test("per-column rows, nulls, distinct, lexicographic min/max in one pass") {
    val df = Seq(
      (1L, Some("b"), 10),
      (2L, None, 10),
      (3L, Some("a"), 30),
      (3L, Some("b"), 30)).toDF("id", "s", "n")
    val got = Profile.profile(df, Seq("id", "s", "n"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("id") == ("id", 4L, 0L, 3L, Some("1"), Some("3")))
    assert(got("s") == ("s", 4L, 1L, 2L, Some("a"), Some("b")))
    assert(got("n") == ("n", 4L, 0L, 2L, Some("10"), Some("30")))
  }

  test("all-null column: distinct 0, min/max null") {
    val df = Seq((1, Option.empty[String]), (2, None)).toDF("id", "s")
    val got = Profile.profile(df, Seq("s"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().head
    assert(got == ("s", 2L, 2L, 0L, None, None))
  }

  test("plan is one scan with only the two bounded aggregate exchanges") {
    val df = Seq((1L, "a", 2L)).toDF("id", "s", "n")
    val plan = Profile.profile(df, Seq("id", "s", "n"))
      .queryExecution.executedPlan.toString
    // the exact-distinct aggregate is two-level: (col, v)-keyed partial then
    // col-keyed final — both hash exchanges on bounded keys, never a global
    // range sort
    assert(plan.split("Exchange hashpartitioning").length - 1 == 2, plan)
    assert(!plan.contains("Exchange rangepartitioning"), plan)
    assert(plan.split("FileScan|LocalTableScan").length - 1 == 1, plan)
  }

  test("empty column list is refused") {
    intercept[IllegalArgumentException](
      Profile.profile(Seq((1, 2)).toDF("a", "b"), Seq.empty))
  }
}
