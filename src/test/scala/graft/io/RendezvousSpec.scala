package graft.io

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RendezvousSpec extends SparkTestBase {
  import spark.implicits._

  private val ids = (1L to 2000L)
  private def df = ids.toDF("doc_id")

  test("DF matches the pure twin; assignment is balanced") {
    val got = Bucketing.rendezvousShard(df, "doc_id", 8)
      .select("doc_id", "shard").as[(Long, Int)].collect().toMap
    for (id <- ids.take(200))
      assert(got(id) == Bucketing.rendezvousShardPure(id.toString, 8), s"id $id")
    // rough balance: every shard holds 1/8 +- a wide margin
    val sizes = got.values.groupBy(identity).map(_._2.size)
    assert(sizes.size == 8 && sizes.forall(s => s > 150 && s < 350), sizes)
    // partitioning invariance
    val rep = Bucketing.rendezvousShard(df.repartition(13), "doc_id", 8)
      .select("doc_id", "shard").as[(Long, Int)].collect().toMap
    assert(rep == got)
  }

  test("minimal motion: growing 8 -> 9 moves ~1/9, all to the new shard") {
    val s8 = Bucketing.rendezvousShard(df, "doc_id", 8)
      .select("doc_id", "shard").as[(Long, Int)].collect().toMap
    val s9 = Bucketing.rendezvousShard(df, "doc_id", 9)
      .select("doc_id", "shard").as[(Long, Int)].collect().toMap
    val moved = ids.filter(id => s8(id) != s9(id))
    // every moved doc lands on the NEW shard (HRW invariant: old scores
    // are unchanged, so the argmax only changes when shard 8 wins)
    assert(moved.forall(id => s9(id) == 8))
    val frac = moved.size.toDouble / ids.size
    assert(frac > 0.06 && frac < 0.17, s"moved $frac") // expect ~1/9
  }

  test("single shard and refusal") {
    val one = Bucketing.rendezvousShard(df.limit(10), "doc_id", 1)
      .select("shard").as[Int].collect()
    assert(one.forall(_ == 0))
    intercept[IllegalArgumentException](
      Bucketing.rendezvousShard(df, "doc_id", 0))
  }
}
