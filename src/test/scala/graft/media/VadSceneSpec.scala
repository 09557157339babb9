package graft.media

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class VadSceneSpec extends SparkTestBase {
  import spark.implicits._

  test("vadSegmentsPure: threshold, hangover, and edge cases") {
    // frames of 4: f0 silent, f1 loud, f2 loud, f3-f5 silent, f6 loud
    val samples = Array.fill(4)(0) ++ Array.fill(8)(1000) ++
      Array.fill(12)(0) ++ Array.fill(4)(1000)
    def segs(gap: Int) =
      Media.vadSegmentsPure(samples, 4, 1000L, gap).map(s =>
        (s.seg, s.start_frame, s.end_frame, s.n_active))
    assert(segs(0) == Seq((0, 1, 2, 2), (1, 6, 6, 1)))
    assert(segs(2) == Seq((0, 1, 2, 2), (1, 6, 6, 1))) // gap of 3 > 2
    assert(segs(3) == Seq((0, 1, 6, 3)))               // hangover merges
    // silence-only clip emits nothing; empty clip emits nothing
    assert(Media.vadSegmentsPure(Array.fill(16)(7), 4, 1000L, 0).isEmpty)
    assert(Media.vadSegmentsPure(Array.empty, 4, 1000L, 0).isEmpty)
    intercept[IllegalArgumentException](
      Media.vadSegmentsPure(samples, 0, 1000L, 0))
  }

  test("distributed VAD through the WAV decode path equals the pure kernel") {
    val refs = Seq(("wav-a", 300), ("wav-b", 517), ("wav-c", 64))
    val got = Media.vadSegments(refs.toDS(), 64, 1000L, 1)
      .collect().groupBy(_.media_ref)
    for ((ref, n) <- refs) {
      val seed = graft.text.TextAnalysis.hash32(ref)
      val samples = Array.tabulate(n)(i => Media.synthSample(seed, i))
      val exp = Media.vadSegmentsPure(samples, 64, 1000L, 1)
        .map(_.copy(media_ref = ref))
      assert(got.getOrElse(ref, Array.empty).sortBy(_.seg).toSeq == exp, ref)
    }
  }

  test("sceneCuts: hash-distance cuts per clip, clip isolation") {
    val rows = Seq(
      // clip A: f2 jumps by 4 bits, f4 by 1 bit
      ("A", 0L, 0L, 0L), ("A", 1L, 0L, 0L), ("A", 2L, 0L, 15L),
      ("A", 3L, 0L, 15L), ("A", 4L, 1L, 15L),
      // clip B: static
      ("B", 0L, 5L, 5L), ("B", 1L, 5L, 5L),
      // clip C: single frame
      ("C", 0L, 9L, 9L))
      .toDF("media_ref", "frame_index", "ahash_hi", "ahash_lo")
    val strict = Media.sceneCuts(rows, 3).as[(String, Long, Long)]
      .collect().toSet
    assert(strict == Set(("A", 2L, 4L)))
    val loose = Media.sceneCuts(rows.repartition(5), 1)
      .as[(String, Long, Long)].collect().toSet
    assert(loose == Set(("A", 2L, 4L), ("A", 4L, 1L)))
    intercept[IllegalArgumentException](Media.sceneCuts(rows, 0))
  }

  test("planted scenes are found end-to-end through the real image decode") {
    // 2 clips, 6 frames each, scene length 3: same seed inside a scene
    val specs = (for {
      clip <- Seq("x", "y"); f <- 0 until 6
    } yield (s"$clip#$f",
        graft.text.TextAnalysis.hash32(s"sc:$clip:${f / 3}"), 16, 12))
      .toDS()
    val hashes = Media.imageHashes(specs).toDF()
      .select(split(col("media_ref"), "#").getItem(0).as("media_ref"),
        split(col("media_ref"), "#").getItem(1).cast("long").as("frame_index"),
        col("ahash_hi"), col("ahash_lo"))
    val cuts = Media.sceneCuts(hashes, 1).as[(String, Long, Long)]
      .collect().toSeq
    // inside-scene frames hash identically -> the only possible cuts are
    // at the planted boundary f=3; both clips cut there
    assert(cuts.map(c => (c._1, c._2)).toSet == Set(("x", 3L), ("y", 3L)))
  }
}
