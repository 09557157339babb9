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

  test("incremental job: snapshots accumulate state; union of runs ≡ batch; rerun no-op") {
    import org.apache.spark.sql.functions.col
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    def doc(seed: Int): String =
      (0 until 12).map(i => words(((seed * 7 + i * 3) ^ (i * seed)) % 10)).mkString(" ")
    // 3 snapshots of 15 docs each; duplicates scattered across snapshots
    val corpus = (1L to 45L)
      .map(i => (i, doc((i % 11).toInt), s"s${(i - 1) / 15 + 1}"))
      .toDF("doc_id", "text", "snapshot")
    val tmp = java.nio.file.Files.createTempDirectory("incdedup").toString
    val (state, out) = (s"$tmp/state", s"$tmp/pairs")
    for (s <- Seq("s1", "s2", "s3"))
      DedupJob.runIncremental(corpus, "doc_id", "text", "snapshot", s,
        state, out, minJ = 0.5, maxBucket = 0)
    val union = spark.read.parquet(out)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val batch = Dedup.minhashDuplicates(
      corpus.select(col("doc_id"), col("text")), "doc_id", "text",
      n = 3, k = 32, bands = 8, minJ = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(union == batch)
    // each pair emitted exactly once (no partition overlap)
    assert(spark.read.parquet(out).count() == union.size)
    // a pair's emitting snapshot is its LATER doc's snapshot
    val bySnap = spark.read.parquet(out)
      .select(col("id_b"), col("snapshot").cast("string"))
      .as[(Long, String)].collect()
    for ((idB, snap) <- bySnap) assert(snap == s"s${(idB - 1) / 15 + 1}")
    // rerun of a committed snapshot is a no-op
    assert(DedupJob.runIncremental(corpus, "doc_id", "text", "snapshot", "s2",
      state, out, minJ = 0.5, maxBucket = 0) == 0L)
    assert(spark.read.parquet(out).count() == union.size)
    spark.catalog.clearCache()
  }

  test("incremental job: zero-pair first snapshot commits and does not wedge") {
    import org.apache.spark.sql.functions.col
    // two snapshots with no duplicates inside s1: the first run emits 0
    // pairs (nothing to write) yet MUST commit its bands so s2 can pair
    // against them; a cross-snapshot dup proves the state was usable
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "s1"),
      (2L, "one two three four five six", "s1"),
      (3L, "alpha beta gamma delta epsilon zeta", "s2"))
      .toDF("doc_id", "text", "snapshot")
    val tmp = java.nio.file.Files.createTempDirectory("incdedup0").toString
    val (state, out) = (s"$tmp/state", s"$tmp/pairs")
    assert(DedupJob.runIncremental(corpus, "doc_id", "text", "snapshot", "s1",
      state, out, minJ = 0.5, maxBucket = 0) == 0L)
    // s1 is committed despite the empty pairs output (rerun = no-op)
    assert(DedupJob.runIncremental(corpus, "doc_id", "text", "snapshot", "s1",
      state, out, minJ = 0.5, maxBucket = 0) == 0L)
    assert(DedupJob.runIncremental(corpus, "doc_id", "text", "snapshot", "s2",
      state, out, minJ = 0.5, maxBucket = 0) == 1L)
    val got = spark.read.parquet(out).select("id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 3L)))
    spark.catalog.clearCache()
  }

  test("incremental operator: a re-crawled id never self-pairs; latest text wins") {
    import org.apache.spark.sql.functions.col
    val oldDocs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six")).toDF("id", "text")
    // id 1 re-crawled with DIFFERENT text that now matches id 3's
    val newDocs = Seq(
      (1L, "red orange yellow green blue violet"),
      (3L, "red orange yellow green blue violet")).toDF("id", "text")
    val oldBands = Dedup.minhashBandRows(oldDocs, "id", "text", 3, 32, 8)
    val pairs = Dedup.minhashIncrementalDuplicates(oldBands, oldDocs, newDocs,
      "id", "text", n = 3, k = 32, bands = 8, minJ = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(!pairs.exists(p => p._1 == p._2), s"self-pair leaked: $pairs")
    // (1, 3) verifies at jaccard 1.0 ONLY if id 1's text is the new one
    assert(pairs.exists(p => p._1 == 1L && p._2 == 3L && p._3 == 1.0), pairs.toString)
    spark.catalog.clearCache()
  }
}
