package graft.streaming

import graft.SparkTestBase
import graft.sketch.HeavyHitters

class StreamTopkSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
  private def shardOf(v: String): Int =
    (graft.text.TextAnalysis.hash60(v) % 2L).toInt

  test("cross-batch MG state, flush emission, exact-rescore equivalence") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val b1 = Seq.fill(5)("a") ++ Seq.fill(2)("b") ++ Seq("c")
    val b2 = Seq.fill(3)("a") ++ Seq.fill(2)("d") ++ Seq("e", "f")
    val all = b1 ++ b2

    val input = MemoryStream[StreamJob.MgEvent]
    val q = StreamJob.mgStream(input.toDS(), k = 2)
      .writeStream.format("memory").queryName("mg").outputMode("append").start()
    input.addData(b1.zipWithIndex.map { case (v, i) =>
      StreamJob.MgEvent(shardOf(v), v, ts(100 + i), flush = false) })
    q.processAllAvailable()
    // nothing emits before a flush
    assert(spark.table("mg").count() == 0)
    input.addData(b2.zipWithIndex.map { case (v, i) =>
      StreamJob.MgEvent(shardOf(v), v, ts(200 + i), flush = false) })
    q.processAllAvailable()
    input.addData(Seq(0, 1).map(sh =>
      StreamJob.MgEvent(sh, "", ts(900), flush = true)))
    q.processAllAvailable()
    q.stop()

    val cands = spark.table("mg").as[(Int, String, Long)].collect()
    // bounded state: at most k rows per shard
    for ((sh, rows) <- cands.groupBy(_._1)) assert(rows.length <= 2, s"shard $sh")
    // shard placement respected
    for ((sh, v, _) <- cands) assert(shardOf(v) == sh)
    // the MG guarantee survived the batch split: every item with count >
    // total/3 (den=3 <= k+1) is among the candidates
    val exp = HeavyHitters.heavyHittersPure(all, k = 2, den = 3)
    val candSet = cands.map(_._2).toSet
    for ((v, _) <- exp) assert(candSet.contains(v), s"lost hitter $v")
    // exact rescore over candidates = the batch heavy-hitters answer
    val total = all.size
    val rescored = all.filter(candSet).groupBy(identity)
      .map { case (v, g) => v -> g.size.toLong }
      .filter { case (_, c) => c * 3 > total }.toSeq.sortBy(_._1)
    assert(rescored == exp)
  }

  test("a second flush reflects post-flush arrivals") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[StreamJob.MgEvent]
    val q = StreamJob.mgStream(input.toDS(), k = 4)
      .writeStream.format("memory").queryName("mg2").outputMode("append").start()
    input.addData(Seq.fill(3)("x").zipWithIndex.map { case (v, i) =>
      StreamJob.MgEvent(0, v, ts(10 + i), flush = false) } :+
      StreamJob.MgEvent(0, "", ts(50), flush = true))
    q.processAllAvailable()
    input.addData(Seq(StreamJob.MgEvent(0, "x", ts(60), flush = false),
      StreamJob.MgEvent(0, "", ts(70), flush = true)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("mg2").as[(Int, String, Long)].collect()
      .filter(_._2 == "x").map(_._3).sorted.toSeq
    assert(got == Seq(3L, 4L)) // first flush saw 3, second 4
  }
}
