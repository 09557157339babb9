package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class FrontierSpec extends SparkTestBase {
  import spark.implicits._

  private def fixture(parts: Int = 4) = (0 until 200).map { i =>
    (s"h${i % 7}", f"https://h${i % 7}.example.com/p$i%03d", (i * 13) % 50)
  }.toDF("host", "url", "priority").repartition(parts)

  test("no host appears twice in a wave; waves are 1..count(host)") {
    val waved = Frontier.waves(fixture(), "host", "url", "priority")
    val perWaveHost = waved.groupBy("wave", "host").count()
      .filter(col("count") > 1).count()
    assert(perWaveHost == 0)
    val perHost = waved.groupBy("host")
      .agg(count(lit(1)).as("n"), min("wave").as("lo"), max("wave").as("hi"),
        count_distinct(col("wave")).as("nd"))
      .as[(String, Long, Long, Long, Long)].collect()
    for ((h, n, lo, hi, nd) <- perHost) {
      assert(lo == 1L && hi == n && nd == n, s"$h: waves must be exactly 1..$n")
    }
  }

  test("within a host, waves follow (priority, url) order") {
    val waved = Frontier.waves(fixture(), "host", "url", "priority")
      .filter(col("host") === "h0")
      .select("priority", "url", "wave")
      .as[(Int, String, Long)].collect().sortBy(_._3)
    val resorted = waved.sortBy(r => (r._1, r._2))
    assert(waved.toSeq == resorted.toSeq)
  }

  test("partitioning invariance") {
    val expected = Frontier.waves(fixture(1), "host", "url", "priority")
      .select("url", "wave").as[(String, Long)].collect().toSet
    for (p <- Seq(3, 13)) {
      val got = Frontier.waves(fixture(p), "host", "url", "priority")
        .select("url", "wave").as[(String, Long)].collect().toSet
      assert(got == expected, s"parts=$p")
    }
  }

  test("plan has exactly one exchange (the host window) and no global sort") {
    val plan = Frontier.waves(fixture(), "host", "url", "priority")
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange hashpartitioning").length - 1 == 1, plan)
    assert(!plan.contains("Exchange rangepartitioning"), plan)
  }
}
