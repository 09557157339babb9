package graft.media

import graft.SparkTestBase
import graft.io.Synth
import graft.model.Kind

class MediaSpec extends SparkTestBase {
  import Media._

  lazy val docs = Synth.generate(spark, 60, nPartitions = 4)

  test("metadata extraction covers exactly the media spans, deterministically") {
    val meta = extractMetadata(docs).collect()
    val expected = docs.collect()
      .flatMap(d => d.spans.filter(s => s.kind == Kind.Media && s.media_ref.nonEmpty)
        .map(s => (s.media_ref, d.doc_id)))
    assert(meta.map(m => (m.media_ref, m.doc_id)).sorted.toSeq == expected.sorted.toSeq)
    // schema invariants
    assert(meta.forall(m => m.width >= 64 && m.height >= 64 && m.n_frames >= 1 && m.bytes_len > 0))
    assert(meta.forall(m => Set("jpeg", "png", "webp", "mp4").contains(m.format)))
    // determinism: second run identical
    val meta2 = extractMetadata(docs).collect()
    assert(meta.sortBy(_.media_ref).toSeq == meta2.sortBy(_.media_ref).toSeq)
  }

  test("frame sampling: k evenly spaced frames, capped at n_frames") {
    import spark.implicits._
    val meta = Seq(
      MediaMeta("ref/a", "d1", "mp4", 640, 480, 10, 1000),
      MediaMeta("ref/b", "d1", "jpeg", 640, 480, 1, 1000)).toDS()
    val frames = sampleFrames(meta, 4).collect().groupBy(_.media_ref)
    assert(frames("ref/a").map(_.frame_index).sorted.toSeq == Seq(0, 3, 6, 9))
    assert(frames("ref/b").map(_.frame_index).toSeq == Seq(0))
    assert(frames("ref/a").forall(_.feature.length == 8))
  }

  test("resize caps the long edge and preserves aspect ratio") {
    val m = MediaMeta("r", "d", "jpeg", 1600, 800, 1, 10)
    val r = resizeMeta(m, 512)
    assert(r.width == 512 && r.height == 256)
    val small = MediaMeta("r", "d", "jpeg", 100, 50, 1, 10)
    assert(resizeMeta(small, 512) == small)
    val tall = resizeMeta(MediaMeta("r", "d", "png", 300, 1200, 1, 10), 600)
    assert(tall.height == 600 && tall.width == 150)
  }
}
