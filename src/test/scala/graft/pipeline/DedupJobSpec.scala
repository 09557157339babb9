package graft.pipeline

import graft.SparkTestBase
import graft.dedup.Dedup

class DedupJobSpec extends SparkTestBase {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog near the quiet river bank today"
  private val nearDup =
    "the quick brown fox jumps over the lazy dog near the quiet river bend today"

  test("job-level minhash caps are on by default and the drops are reported") {
    // a viral shingle in every doc + two clones; tiny caps force drops
    val viral = " common footer boilerplate"
    val docs = Seq((1L, base + viral), (2L, base + viral),
      (3L, nearDup + viral),
      (4L, "completely unrelated gardening almanac entry" + viral))
      .toDF("id", "text")
    val (pairs, drops) = DedupJob.minhashNearDuplicates(
      docs, "id", "text", minJ = 0.3, caps = DedupJob.Caps(maxDf = 3, maxBucket = 3))
    val got = pairs.as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(got.contains((1L, 2L)))
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L))
    // the viral shingle (df=4 > 3) must be counted as dropped, not silent
    assert(drops.hot_shingles >= 1, drops.toString)
    spark.catalog.clearCache()
  }

  test("job-level simhash cap drops the empty-doc band and reports it") {
    val docs = ((1L to 30L).map(i => (i, "")) ++ Seq((100L, base), (101L, base)))
      .toDF("id", "text")
    val (pairs, drops) = DedupJob.simhashNearDuplicates(
      docs, "id", "text", caps = DedupJob.Caps(maxBucket = 8))
    val got = pairs.as[(Long, Long, Int)].collect().map(p => (p._1, p._2)).toSet
    assert(!got.exists(p => p._1 <= 30L && p._2 <= 30L))
    assert(got.contains((100L, 101L)))
    // all four fp=0 byte-bands exceed the cap
    assert(drops.hot_buckets == 4, drops.toString)
    spark.catalog.clearCache()
  }

  test("report=false skips the counting pre-pass but keeps the caps") {
    val docs = Seq((1L, base), (2L, base)).toDF("id", "text")
    val (pairs, drops) = DedupJob.jaccardNearDuplicates(
      docs, "id", "text", minJ = 0.5, report = false)
    assert(drops == DedupJob.DropReport(-1, -1))
    assert(pairs.as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet ==
      Set((1L, 2L)))
    spark.catalog.clearCache()
  }
}
