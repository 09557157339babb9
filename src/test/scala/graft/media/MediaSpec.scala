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

  test("real image path: PNG encode → ImageIO decode round-trips every pixel") {
    val seed = graft.text.TextAnalysis.hash32("img-test")
    val bytes = synthPngBytes(seed, 19, 13)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth == 19 && img.getHeight == 13)
    for (y <- 0 until 13; x <- 0 until 19) {
      val (r, g, b) = synthPixel(seed, x, y)
      assert(img.getRGB(x, y) == (0xFF << 24 | r << 16 | g << 8 | b), s"pixel ($x,$y)")
    }
    // stats: format sniffed, means match a direct arithmetic replay
    val st = imageStats("img-test", bytes)
    assert(st.format == "png" && st.width == 19 && st.height == 13)
    val n = 19 * 13
    val sums = (for (y <- 0 until 13; x <- 0 until 19) yield synthPixel(seed, x, y))
      .foldLeft((0L, 0L, 0L)) { case ((a, b2, c), (r, g, b)) => (a + r, b2 + g, c + b) }
    def mean(s: Long) =
      BigDecimal(s.toDouble / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert((st.mean_r, st.mean_g, st.mean_b) == (mean(sums._1), mean(sums._2), mean(sums._3)))
  }

  test("real image path: distributed decodeStats and real resize") {
    import spark.implicits._
    val refs = (1 to 8).map(i => (s"img-$i", 16 + i % 17, 12 + i % 13)).toDS()
    val stats = decodeStats(refs).collect().sortBy(_.media_ref)
    assert(stats.length == 8 && stats.forall(s => s.format == "png" &&
      s.mean_r >= 0 && s.mean_r <= 255))
    // resize: dimensions follow the same integer math as resizeMeta; a
    // constant-color image stays that color under bilinear scaling
    val flat = new java.awt.image.BufferedImage(40, 20, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = flat.createGraphics(); g2.setColor(new java.awt.Color(10, 200, 30))
    g2.fillRect(0, 0, 40, 20); g2.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(flat, "png", bos)
    val (w, h, out) = resizeImage(bos.toByteArray, 10)
    assert(w == 10 && h == 5)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out))
    assert(back.getRGB(4, 2) == (0xFF << 24 | 10 << 16 | 200 << 8 | 30))
  }

  test("real audio path: WAV encode → javax.sound decode round-trips every sample") {
    val seed = graft.text.TextAnalysis.hash32("wav-test")
    val n = 300
    val bytes = synthWavBytes(seed, n)
    val st = audioStats("wav-test", bytes)
    assert(st.format == "wave" && st.n_samples == n && st.sample_rate == 8000)
    val samples = (0 until n).map(i => math.abs(synthSample(seed, i)).toLong)
    val mean = BigDecimal(samples.sum.toDouble / n)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(st.mean_abs == mean && st.peak == samples.max)
    // distributed form
    import spark.implicits._
    val stats = decodeAudioStats(Seq(("wav-a", 256), ("wav-b", 400)).toDS()).collect()
    assert(stats.map(s => (s.media_ref, s.n_samples)).sorted.toSeq ==
      Seq(("wav-a", 256L), ("wav-b", 400L)))
  }

  test("real video path: GPNG container encode → seek → frame decode") {
    val seed = graft.text.TextAnalysis.hash32("vid-test")
    val bytes = synthVideoBytes(seed, nFrames = 10, w = 12, h = 8)
    val frames = videoFrameStats("vid-test", bytes, k = 4)
    // 4 evenly spaced of 10: 0, 3, 6, 9 — decode skips the other 6 frames
    assert(frames.map(_.frame_index) == Seq(0, 3, 6, 9))
    // each decoded frame's means equal the pure synthPixel replay of seed+f
    for (f <- frames) {
      val px = for (y <- 0 until 8; x <- 0 until 12) yield synthPixel(seed + f.frame_index, x, y)
      def mean(sel: ((Int, Int, Int)) => Int): Double =
        BigDecimal(px.map(sel).sum.toDouble / px.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(f.width == 12 && f.height == 8)
      assert(f.mean_r == mean(_._1) && f.mean_g == mean(_._2) && f.mean_b == mean(_._3),
        s"frame ${f.frame_index}")
    }
    // single-frame container samples only index 0; bad magic rejected
    assert(videoFrameStats("one", synthVideoBytes(1L, 1, 4, 4), 4).map(_.frame_index) == Seq(0))
    intercept[IllegalArgumentException] {
      videoFrameStats("bad", "nope".getBytes ++ Array[Byte](0, 0, 0, 0), 4)
    }
    // distributed form
    import spark.implicits._
    val got = decodeVideoFrames(Seq(("v1", 5, 8, 6), ("v2", 1, 8, 6)).toDS(), 4).collect()
    assert(got.count(_.media_ref == "v1") == 4 && got.count(_.media_ref == "v2") == 1)
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

  test("aHash via PNG decode ≡ independent pixel-arithmetic replay") {
    import spark.implicits._
    // arithmetic twin computed straight from synthPixel — no image objects,
    // no decode: exactly what the codec-less oracle replays
    def expected(seed: Long, w: Int, h: Int): (Long, Long) = {
      val sums = new Array[Long](64); val npx = new Array[Long](64)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = Media.synthPixel(seed, x, y)
        val c = (y * 8 / h) * 8 + (x * 8 / w)
        sums(c) += (299L * r + 587L * g + 114L * b) / 1000L
        npx(c) += 1
      }
      val means = Array.tabulate(64)(c => sums(c) / npx(c))
      val overall = means.sum / 64L
      var hi = 0L; var lo = 0L
      for (c <- 0 until 64; if means(c) > overall)
        if (c < 32) lo |= 1L << c else hi |= 1L << (c - 32)
      (hi, lo)
    }
    val specs = Seq(("a", 5L, 16, 12), ("b", 5L, 16, 12), ("c", 9L, 16, 12),
      ("d", 9L, 23, 17), ("e", 123L, 8, 8))
    val got = Media.imageHashes(specs.toDS()).collect()
      .map(ih => ih.media_ref -> ((ih.ahash_hi, ih.ahash_lo))).toMap
    for ((ref, seed, w, h) <- specs)
      assert(got(ref) == expected(seed, w, h), ref)
    // identical (seed, w, h) → identical hash; dup pairs found by groupBy
    assert(got("a") == got("b"))
    val pairs = Media.imageDupPairs(Media.imageHashes(specs.toDS()).toDF())
      .select("ref_a", "ref_b").as[(String, String)].collect().toSet
    assert(pairs.contains(("a", "b")))
    assert(!pairs.exists(p => p._1 == "e" || p._2 == "e"))
    // hi/lo halves stay in unsigned-32 range (sign never leaks)
    for ((_, (hi, lo)) <- got) {
      assert(hi >= 0L && hi <= 0xffffffffL)
      assert(lo >= 0L && lo <= 0xffffffffL)
    }
  }

  test("per-frame video aHash ≡ image aHash of seed+index; aligned dup pairs") {
    import spark.implicits._
    // frame f of video (seed, w, h) is the synth image of seed+f, so the
    // video hash path must agree with imageHashes on the sampled indices
    val (seed, nf, w, h) = (77L, 10, 16, 12)
    val vh = videoFrameHashes("v", synthVideoBytes(seed, nf, w, h), k = 4)
    assert(vh.map(_.frame_index) == Seq(0, 3, 6, 9))
    val imgSpecs = vh.map(f => (s"f${f.frame_index}", seed + f.frame_index, w, h))
    val img = Media.imageHashes(imgSpecs.toDS()).collect()
      .map(ih => ih.media_ref -> ((ih.ahash_hi, ih.ahash_lo))).toMap
    for (f <- vh)
      assert((f.ahash_hi, f.ahash_lo) == img(s"f${f.frame_index}"), s"frame ${f.frame_index}")
    // distributed path + frame-aligned dup pairs: a/b share a seed (dup on
    // all 4 frames), c differs; threshold 4 keeps only the true pair
    val specs = Seq(("a", 5L, 9, 16, 12), ("b", 5L, 9, 16, 12), ("c", 6L, 9, 16, 12))
    val hashes = Media.videoHashes(specs.toDS(), 4).toDF()
    assert(hashes.count() == 12)
    val pairs = Media.videoDupPairs(hashes, minFrames = 4)
      .select("ref_a", "ref_b").as[(String, String)].collect().toSet
    assert(pairs == Set(("a", "b")))
    // a trimmed video (fewer frames) samples different indices — aligned
    // matching is what keeps this from being a false positive at 4-of-4
    val trimmed = Media.videoHashes(Seq(("a", 5L, 9, 16, 12), ("t", 5L, 5, 16, 12)).toDS(), 4).toDF()
    val tp = Media.videoDupPairs(trimmed, minFrames = 4)
      .select("ref_a", "ref_b").as[(String, String)].collect().toSet
    // a samples 0,2,5,8 of 9; t samples 0,1,2,4 of 5 — only index 0 and 2 align
    assert(!tp.contains(("a", "t")))
    assert(Media.videoDupPairs(trimmed, minFrames = 2)
      .select("ref_a", "ref_b").as[(String, String)].collect().toSet == Set(("a", "t")))
  }

  test("audio fingerprint via WAV decode ≡ independent sample-arithmetic replay") {
    import spark.implicits._
    def expected(seed: Long, n: Int): (Long, Long) = {
      val sums = new Array[Long](64); val cnt = new Array[Long](64)
      for (i <- 0 until n) {
        val w = (i.toLong * 64 / n).toInt
        sums(w) += math.abs(Media.synthSample(seed, i).toLong); cnt(w) += 1
      }
      val means = Array.tabulate(64)(w => sums(w) / cnt(w))
      val overall = means.sum / 64L
      var hi = 0L; var lo = 0L
      for (w <- 0 until 64; if means(w) > overall)
        if (w < 32) lo |= 1L << w else hi |= 1L << (w - 32)
      (hi, lo)
    }
    val specs = Seq(("a", 5L, 500), ("b", 5L, 500), ("c", 9L, 500), ("d", 9L, 321))
    val got = Media.audioFingerprints(specs.toDS()).collect()
      .map(ah => ah.media_ref -> ((ah.fp_hi, ah.fp_lo))).toMap
    for ((ref, seed, n) <- specs) assert(got(ref) == expected(seed, n), ref)
    assert(got("a") == got("b")) // sample-identical clips collide
  }
}
