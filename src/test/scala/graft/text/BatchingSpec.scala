package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BatchingSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a"), // 1 token  -> bucket 1
    (2L, "a b"), // 2 -> bucket 2
    (3L, "a b c"), // 3 -> bucket 4
    (4L, "a b c d"), // 4 -> bucket 4
    (5L, "a b c d e"), // 5 -> bucket 8
    (6L, "  "), // 0 tokens -> dropped
    (7L, (1 to 9).map(i => s"t$i").mkString(" ")) // 9 -> bucket 16
  ).toDF("doc_id", "text")

  test("bucketCol/bucketPure: next power of two, exactly") {
    for (t <- 1L to 300L) {
      val expect = { var b = 1L; while (b < t) b <<= 1; b }
      assert(Batching.bucketPure(t) == expect, s"t=$t")
    }
    val got = spark.range(1, 301).select(col("id"),
      Batching.bucketCol(col("id")).as("b")).as[(Long, Long)].collect()
    got.foreach { case (t, b) => assert(b == Batching.bucketPure(t), s"t=$t") }
  }

  test("assign: buckets, zero-token drop, dense positions per batch") {
    val a = Batching.assign(docs, "doc_id", "text", batchSize = 2, nShards = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4), r.getLong(5)))
    assert(!a.exists(_._1 == 6L)) // zero-token doc dropped
    val byDoc = a.map(x => x._1 -> x._2).toMap
    assert(byDoc == Map(1L -> 1L, 2L -> 2L, 3L -> 4L, 4L -> 4L, 5L -> 8L, 7L -> 16L))
    // docs 3 and 4 share bucket 4: with batchSize 2 they form one batch
    val b4 = a.filter(_._2 == 4L)
    assert(b4.map(_._3).distinct.length == 1)
    assert(b4.map(_._4).sorted.toSeq == Seq(0L, 1L))
  }

  test("paddingReport: padded size and waste are exact integer math") {
    val rep = Batching.paddingReport(docs, "doc_id", "text",
      batchSize = 2, nShards = 1)
      .select("bucket", "n_docs", "sum_tokens", "padded_tokens", "waste_milli")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // bucket 4 holds docs 3 (3 tokens) + 4 (4 tokens): padded 8, waste 125
    assert(rep(4L) == ((4L, 2L, 7L, 8L, 125L)))
    // bucket 8 holds doc 5 alone: padded 8, waste (8-5)*1000/8 = 375
    assert(rep(8L) == ((8L, 1L, 5L, 8L, 375L)))
  }

  test("assign: partitioning-invariant (md5 shard + md5 order)") {
    val big = spark.range(0, 400).select(col("id").as("doc_id"),
      concat_ws(" ", (0 to 6).map(i => concat(lit("w"), pmod(col("id") + i, lit(40)))): _*)
        .as("text"))
    def run(parts: Int) =
      Batching.assign(big.repartition(parts), "doc_id", "text",
        batchSize = 4, nShards = 4)
        .select("doc_id", "bucket", "shard", "batch_idx", "pos_in_batch")
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(run(1) == run(13))
  }
}
