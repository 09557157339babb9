package graft.media

import graft.model.{Doc, Kind}

import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal-column plumbing: media spans are opaque references/bytes with
  * typed metadata, processed per-partition in batches (the Spark-side shape
  * of a vectorized decode stage).
  *
  * Two codec paths:
  *  - IMAGE formats decode for REAL via the JDK's javax.imageio
  *    (PNG/JPEG/BMP/GIF/TIFF — no external libraries needed):
  *    [[imageStats]], [[decodeStats]], [[resizeImage]], with deterministic
  *    synthetic PNGs ([[synthPngBytes]]) so the DuckDB oracle can replay
  *    decoded pixel statistics arithmetically.
  *  - AUDIO decodes for real via javax.sound (WAV/PCM), and VIDEO frame
  *    sampling decodes for real via a PNG-frame container ([[synthVideoBytes]]
  *    / [[videoFrameStats]]: length-prefixed ImageIO frames, seek + decode
  *    only the sampled ones). Only true container formats the JDK cannot
  *    read (mp4/webm) use the deterministic STUB ([[decodeStub]]): bytes and
  *    metadata derive from md5 of the media_ref, so the pipeline around the
  *    decoder — schema, batching, partitioning, joins back to documents — is
  *    real and testable, and the fake swaps for a real codec without
  *    touching the plumbing.
  */
object Media {

  /** Typed metadata row for one media object. */
  final case class MediaMeta(
      media_ref: String,
      doc_id: String,
      format: String,
      width: Int,
      height: Int,
      n_frames: Int,
      bytes_len: Int)

  /** One sampled frame (or audio window) of a media object. */
  final case class Frame(media_ref: String, frame_index: Int, feature: Array[Byte])

  private val Formats = Array("jpeg", "png", "webp", "mp4")

  private def digest(s: String): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))

  /** STUB decoder — deterministic fake bytes for a media reference. A real
    * implementation would fetch and decode the object here; everything
    * downstream only sees bytes + metadata and is unaffected by the swap. */
  def decodeStub(mediaRef: String): (Array[Byte], String, Int, Int, Int) = {
    val d = digest(mediaRef)
    val format = Formats(java.lang.Byte.toUnsignedInt(d(0)) % Formats.length)
    val width = 64 + java.lang.Byte.toUnsignedInt(d(1)) * 8
    val height = 64 + java.lang.Byte.toUnsignedInt(d(2)) * 8
    val nFrames = if (format == "mp4") 1 + java.lang.Byte.toUnsignedInt(d(3)) % 32 else 1
    // fake payload: the digest repeated to a size derived from the hash
    val len = 256 + (java.lang.Byte.toUnsignedInt(d(4)) << 4)
    val bytes = Array.tabulate[Byte](len)(i => d(i % d.length))
    (bytes, format, width, height, nFrames)
  }

  /** Extract media metadata for every media span, batched per partition.
    * The per-partition iterator is the batch boundary — a real decoder would
    * initialize its native context once per partition here (the reason this
    * is `mapPartitions` and not a scalar UDF). Narrow: no shuffle. */
  def extractMetadata(docs: Dataset[Doc]): Dataset[MediaMeta] = {
    import docs.sparkSession.implicits._
    docs.mapPartitions { it =>
      // per-partition decoder context would be created here
      it.flatMap { d =>
        d.spans.iterator
          .filter(s => s.kind == Kind.Media && s.media_ref.nonEmpty)
          .map { s =>
            val (bytes, format, w, h, n) = decodeStub(s.media_ref)
            MediaMeta(s.media_ref, d.doc_id, format, w, h, n, bytes.length)
          }
      }
    }
  }

  /** Deterministic frame sampling: `k` evenly spaced frame indices with an
    * 8-byte md5-derived feature per frame. */
  def sampleFrames(meta: Dataset[MediaMeta], k: Int): Dataset[Frame] = {
    import meta.sparkSession.implicits._
    meta.mapPartitions(_.flatMap { m =>
      val n = math.min(k, m.n_frames)
      (0 until n).iterator.map { i =>
        val idx = if (n == 1) 0 else (i.toLong * (m.n_frames - 1) / (n - 1)).toInt
        Frame(m.media_ref, idx, digest(s"${m.media_ref}#$idx").take(8))
      }
    })
  }

  /** Deterministic "resize": metadata transform capping the longer edge at
    * `maxEdge` while preserving aspect ratio (integer math). */
  def resizeMeta(m: MediaMeta, maxEdge: Int): MediaMeta = {
    val long = math.max(m.width, m.height)
    if (long <= maxEdge) m
    else {
      val w = m.width.toLong * maxEdge / long
      val h = m.height.toLong * maxEdge / long
      m.copy(width = math.max(1, w.toInt), height = math.max(1, h.toInt))
    }
  }

  def resize(meta: Dataset[MediaMeta], maxEdge: Int): Dataset[MediaMeta] = {
    import meta.sparkSession.implicits._
    meta.map(resizeMeta(_, maxEdge))
  }

  // ------------------------------------------------- real image path -------
  // The JDK ships javax.imageio (PNG/JPEG/BMP/GIF/TIFF) even headless, so
  // image decode does NOT need the stub: the methods below run a REAL
  // encode → decode → pixel-scan cycle. The stub above remains for formats
  // the JDK cannot decode (video/audio containers).

  /** Channel values of the deterministic synthetic image at (x, y): small
    * integer mixes mod 256, chosen so an engine with no codec (the DuckDB
    * oracle) can replay per-image channel statistics arithmetically while
    * Spark replays them through a real PNG encode → ImageIO decode → pixel
    * scan. PNG is lossless, so any decoder defect breaks oracle parity. */
  def synthPixel(seed: Long, x: Int, y: Int): (Int, Int, Int) = (
    ((x * 31L + y * 17L + seed) % 256L).toInt,
    ((x * 13L + y * 29L + seed) % 256L).toInt,
    ((x * 7L + y * 43L + seed) % 256L).toInt)

  /** Real PNG bytes of the synthetic `seed` image (ImageIO encoder). */
  def synthPngBytes(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = synthPixel(seed, x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decoded per-image statistics (sniffed format, true dimensions, exact
    * per-channel means over the decoded pixels, 6dp shortest-string round). */
  final case class ImageStats(media_ref: String, format: String, width: Int,
      height: Int, mean_r: Double, mean_g: Double, mean_b: Double)

  /** REAL decode of `bytes`: format sniff via registered readers, full
    * decode, integer pixel scan. */
  def imageStats(ref: String, bytes: Array[Byte]): ImageStats = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    require(readers.hasNext, s"no JDK decoder recognizes the bytes of $ref")
    val reader = readers.next()
    try {
      reader.setInput(iis)
      val format = reader.getFormatName.toLowerCase
      val img = reader.read(0)
      val (w, h) = (img.getWidth, img.getHeight)
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      // BigDecimal(double) = Double.toString shortest round-trip — the
      // cross-engine 6dp tie-boundary idiom (see quality_score oracle note)
      def mean(s: Long): Double =
        BigDecimal(s.toDouble / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      ImageStats(ref, format, w, h, mean(sr), mean(sg), mean(sb))
    } finally { reader.dispose(); iis.close() }
  }

  /** Distributed real decode stage over (media_ref, width, height) specs:
    * per-partition synth → PNG-encode → ImageIO-decode → stats. The
    * mapPartitions boundary is where a production decoder holds its
    * per-executor native context; narrow, no shuffle. */
  def decodeStats(refs: Dataset[(String, Int, Int)]): Dataset[ImageStats] = {
    import refs.sparkSession.implicits._
    refs.mapPartitions(_.map { case (ref, w, h) =>
      val seed = graft.text.TextAnalysis.hash32(ref)
      imageStats(ref, synthPngBytes(seed, w, h))
    })
  }

  // ------------------------------------------------- real audio path -------
  // javax.sound.sampled (also in the JDK) reads/writes WAV losslessly, so
  // audio decode is real as well: synthetic 16-bit mono PCM → WAV encode →
  // AudioSystem decode → sample scan, with the oracle replaying sample
  // statistics arithmetically. Only video containers remain stubbed.

  /** Deterministic synthetic 16-bit sample i for `seed`:
    * ((i*773 + seed*31) mod 65536) - 32768 — integer math a codec-less
    * engine replays exactly. */
  def synthSample(seed: Long, i: Int): Int =
    (((i * 773L + seed * 31L) % 65536L) - 32768L).toInt

  /** Real WAV bytes (RIFF, 16-bit little-endian mono PCM) of `n` synthetic
    * samples, written by the JDK encoder. */
  def synthWavBytes(seed: Long, n: Int, sampleRate: Float = 8000f): Array[Byte] = {
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = synthSample(seed, i)
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decoded per-clip statistics: true frame count + rate from the decoder,
    * mean |sample| (6dp shortest-string round) and peak |sample|. */
  final case class AudioStats(media_ref: String, format: String,
      n_samples: Long, sample_rate: Int, mean_abs: Double, peak: Long)

  /** REAL audio decode of `bytes` via AudioSystem: format sniff, PCM scan. */
  def audioStats(ref: String, bytes: Array[Byte]): AudioStats = {
    val fileFormat = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(bytes))
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
        s"unexpected PCM layout for $ref")
      val pcm = in.readAllBytes()
      val n = pcm.length / 2
      var sumAbs = 0L
      var peak = 0L
      var i = 0
      while (i < n) {
        val v = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1).toInt << 8)).toLong
        val a = math.abs(v)
        sumAbs += a
        if (a > peak) peak = a
        i += 1
      }
      val mean = BigDecimal(sumAbs.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      AudioStats(ref, fileFormat.getType.toString.toLowerCase, n,
        fmt.getSampleRate.toInt, mean, peak)
    } finally in.close()
  }

  /** 64-bit energy-band audio fingerprint over REAL decoded PCM, the
    * audio member of the perceptual-hash family ([[aHash64]] for images):
    * the sample stream partitions into 64 windows by
    * `window = (index·64) div n`, each window's mean |sample| is
    * integer-computed, and bit w is set when window w exceeds the integer
    * mean of the 64 window means — a coarse loudness-envelope signature
    * that survives re-encoding of the same PCM. All integral division, so
    * a codec-less engine replays it from sample arithmetic. hi/lo halves
    * as in [[aHash64]]. Needs n ≥ 64 samples. */
  def audioFingerprint64(pcmSamples: Array[Int]): (Long, Long) = {
    val n = pcmSamples.length
    require(n >= 64, s"fingerprint needs >= 64 samples, got $n")
    val sums = new Array[Long](64)
    val cnt = new Array[Long](64)
    var i = 0
    while (i < n) {
      val w = (i.toLong * 64 / n).toInt
      sums(w) += math.abs(pcmSamples(i).toLong)
      cnt(w) += 1
      i += 1
    }
    val means = Array.tabulate(64)(w => sums(w) / cnt(w))
    val overall = means.sum / 64L
    var hi = 0L; var lo = 0L
    var w = 0
    while (w < 64) {
      if (means(w) > overall) {
        if (w < 32) lo |= 1L << w else hi |= 1L << (w - 32)
      }
      w += 1
    }
    (hi, lo)
  }

  final case class AudioHash(media_ref: String, fp_hi: Long, fp_lo: Long)

  /** Distributed audio fingerprinting over (media_ref, seed, n) specs:
    * synth → WAV encode → REAL javax.sound decode → [[audioFingerprint64]].
    * The seed is explicit so callers control which refs are
    * sample-identical. Narrow, no shuffle. */
  def audioFingerprints(refs: Dataset[(String, Long, Int)]): Dataset[AudioHash] = {
    import refs.sparkSession.implicits._
    refs.mapPartitions(_.map { case (ref, seed, n) =>
      val bytes = synthWavBytes(seed, n)
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val pcm = in.readAllBytes()
        val samples = Array.tabulate(pcm.length / 2)(i =>
          (pcm(2 * i) & 0xff) | (pcm(2 * i + 1).toInt << 8))
        val (hi, lo) = audioFingerprint64(samples)
        AudioHash(ref, hi, lo)
      } finally in.close()
    })
  }

  /** Distributed real audio decode over (media_ref, n_samples) specs. */
  def decodeAudioStats(refs: Dataset[(String, Int)]): Dataset[AudioStats] = {
    import refs.sparkSession.implicits._
    refs.mapPartitions(_.map { case (ref, n) =>
      val seed = graft.text.TextAnalysis.hash32(ref)
      audioStats(ref, synthWavBytes(seed, n))
    })
  }

  // --------------------------------------------- perceptual image hash -----

  /** 64-bit average hash (aHash) over REAL decoded pixels, integer-exact:
    * the image partitions into an 8×8 grid by `cell = (coord·8) div edge`
    * (box cells, sizes differing by at most one pixel), each cell's
    * grayscale mean is `Σ ((299r+587g+114b) div 1000) div n_px`, and bit
    * (j·8+i) is set when cell (i,j) exceeds the integer mean of the 64
    * cell means. Every step is integral division, so a codec-less engine
    * replays the hash from pixel arithmetic while Spark computes it
    * through a real PNG decode — the [[imageStats]] parity idiom. Returned
    * split as (hi, lo) 32-bit halves so the sign bit never leaks into
    * cross-engine int64 semantics. Images must be at least 8×8. */
  def aHash64(img: java.awt.image.BufferedImage): (Long, Long) = {
    val (w, h) = (img.getWidth, img.getHeight)
    require(w >= 8 && h >= 8, s"aHash needs >= 8x8, got ${w}x$h")
    val sums = new Array[Long](64)
    val npx = new Array[Long](64)
    var y = 0
    while (y < h) {
      val j = y * 8 / h
      var x = 0
      while (x < w) {
        val i = x * 8 / w
        val p = img.getRGB(x, y)
        val gray = (299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) +
          114L * (p & 0xff)) / 1000L
        sums(j * 8 + i) += gray
        npx(j * 8 + i) += 1
        x += 1
      }
      y += 1
    }
    val means = Array.tabulate(64)(c => sums(c) / npx(c))
    val overall = means.sum / 64L
    var hi = 0L; var lo = 0L
    var c = 0
    while (c < 64) {
      if (means(c) > overall) {
        if (c < 32) lo |= 1L << c else hi |= 1L << (c - 32)
      }
      c += 1
    }
    (hi, lo)
  }

  final case class ImageHash(media_ref: String, ahash_hi: Long, ahash_lo: Long)

  /** Distributed perceptual hashing over (media_ref, seed, w, h) specs:
    * per-partition synth → PNG encode → REAL ImageIO decode → [[aHash64]].
    * Narrow, no shuffle; the seed is explicit so callers control which
    * refs are pixel-identical (a re-hosted image keeps its seed). */
  def imageHashes(refs: Dataset[(String, Long, Int, Int)]): Dataset[ImageHash] = {
    import refs.sparkSession.implicits._
    refs.mapPartitions(_.map { case (ref, seed, w, h) =>
      val bytes = synthPngBytes(seed, w, h)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val (hi, lo) = aHash64(img)
      ImageHash(ref, hi, lo)
    })
  }

  /** Image near-dup pairs: refs whose perceptual hashes are EQUAL (the
    * exact-aHash tier; a Hamming-tolerant tier would band the 64 bits the
    * way [[graft.dedup.Dedup.simhashDuplicates]] bands SimHash). One
    * groupBy on the hash — never all-pairs. */
  def imageDupPairs(hashes: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val a = hashes.select(col("ahash_hi"), col("ahash_lo"),
      col("media_ref").as("ref_a"))
    val b = hashes.select(col("ahash_hi"), col("ahash_lo"),
      col("media_ref").as("ref_b"))
    a.join(b, Seq("ahash_hi", "ahash_lo"))
      .filter(col("ref_a") < col("ref_b"))
      .select(col("ref_a"), col("ref_b"), col("ahash_hi"), col("ahash_lo"))
  }

  // ------------------------------------------------- real video path -------
  // The JDK has no video codec, but a CONTAINER of PNG frames decodes for
  // real on both sides of the boundary: the encoder writes a length-prefixed
  // frame stream ("GPNG" magic, int32 frame count, then per frame an int32
  // length + the PNG bytes) and the decoder parses the container, walks to
  // the sampled frame offsets, and ImageIO-decodes ONLY the sampled frames —
  // the seek-then-decode shape of a real frame sampler. [[decodeStub]] now
  // remains only for true container formats the JDK cannot read (mp4/webm).

  /** Real container bytes for the synthetic `seed` video: frame f's pixels
    * are the [[synthPixel]] image of seed+f, so a codec-less engine (the
    * DuckDB oracle) replays any sampled frame's statistics arithmetically. */
  def synthVideoBytes(seed: Long, nFrames: Int, w: Int, h: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeBytes("GPNG")
    out.writeInt(nFrames)
    var f = 0
    while (f < nFrames) {
      val png = synthPngBytes(seed + f, w, h)
      out.writeInt(png.length)
      out.write(png)
      f += 1
    }
    out.flush()
    bos.toByteArray
  }

  /** One REAL-decoded sampled frame of a video container. */
  final case class VideoFrameStats(media_ref: String, frame_index: Int,
      width: Int, height: Int, mean_r: Double, mean_g: Double, mean_b: Double)

  /** REAL container decode: parse the GPNG header, sample up to `k` evenly
    * spaced frame indices (the same spacing rule as [[sampleFrames]]), skip
    * unsampled frames by their length prefix, ImageIO-decode the sampled
    * ones, and emit per-frame channel statistics. */
  def videoFrameStats(ref: String, bytes: Array[Byte], k: Int): Seq[VideoFrameStats] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val magic = new Array[Byte](4); in.readFully(magic)
    require(new String(magic, "US-ASCII") == "GPNG", s"not a GPNG container: $ref")
    val nFrames = in.readInt()
    val n = math.min(k, nFrames)
    val sampled = (0 until n).map(i =>
      if (n == 1) 0 else (i.toLong * (nFrames - 1) / (n - 1)).toInt)
    val want = sampled.toSet
    val byIdx = scala.collection.mutable.Map.empty[Int, Array[Byte]]
    var f = 0
    while (f < nFrames) {
      val len = in.readInt()
      if (want(f)) {
        val buf = new Array[Byte](len)
        in.readFully(buf)
        byIdx(f) = buf
      } else in.skipNBytes(len.toLong)
      f += 1
    }
    sampled.map { idx =>
      val st = imageStats(ref, byIdx(idx))
      VideoFrameStats(ref, idx, st.width, st.height, st.mean_r, st.mean_g, st.mean_b)
    }
  }

  /** Distributed real video-frame decode over (media_ref, n_frames, w, h)
    * specs: per-partition synth → GPNG-encode → container-parse → ImageIO
    * frame decode. Narrow, no shuffle; the mapPartitions boundary is where a
    * production demuxer holds its per-executor context. */
  def decodeVideoFrames(refs: Dataset[(String, Int, Int, Int)], k: Int): Dataset[VideoFrameStats] = {
    import refs.sparkSession.implicits._
    refs.mapPartitions(_.flatMap { case (ref, nf, w, h) =>
      val seed = graft.text.TextAnalysis.hash32(ref)
      videoFrameStats(ref, synthVideoBytes(seed, nf, w, h), k)
    })
  }

  /** REAL resize: cap the longer edge at `maxEdge` preserving aspect ratio
    * (same integer math as [[resizeMeta]]), bilinear Graphics2D scale,
    * re-encoded as PNG. Returns (width, height, png bytes). */
  def resizeImage(bytes: Array[Byte], maxEdge: Int): (Int, Int, Array[Byte]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val long = math.max(img.getWidth, img.getHeight)
    if (long <= maxEdge) (img.getWidth, img.getHeight, bytes)
    else {
      val w = math.max(1, (img.getWidth.toLong * maxEdge / long).toInt)
      val h = math.max(1, (img.getHeight.toLong * maxEdge / long).toInt)
      val out = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      (w, h, bos.toByteArray)
    }
  }

  /** Per-frame perceptual hash of a sampled video frame — the video member
    * of the [[ImageHash]] family. */
  final case class VideoFrameHash(media_ref: String, frame_index: Int,
      ahash_hi: Long, ahash_lo: Long)

  /** Parse a GPNG container, decode the same `k` evenly spaced frames as
    * [[videoFrameStats]], and [[aHash64]] each — the per-frame signature a
    * video near-dup pass buckets on. */
  def videoFrameHashes(ref: String, bytes: Array[Byte], k: Int): Seq[VideoFrameHash] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val magic = new Array[Byte](4); in.readFully(magic)
    require(new String(magic, "US-ASCII") == "GPNG", s"not a GPNG container: $ref")
    val nFrames = in.readInt()
    val n = math.min(k, nFrames)
    val sampled = (0 until n).map(i =>
      if (n == 1) 0 else (i.toLong * (nFrames - 1) / (n - 1)).toInt)
    val want = sampled.toSet
    val byIdx = scala.collection.mutable.Map.empty[Int, Array[Byte]]
    var f = 0
    while (f < nFrames) {
      val len = in.readInt()
      if (want(f)) {
        val buf = new Array[Byte](len)
        in.readFully(buf)
        byIdx(f) = buf
      } else in.skipNBytes(len.toLong)
      f += 1
    }
    sampled.map { idx =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(byIdx(idx)))
      val (hi, lo) = aHash64(img)
      VideoFrameHash(ref, idx, hi, lo)
    }
  }

  /** Distributed per-frame video hashing over explicit
    * (media_ref, seed, n_frames, w, h) specs: per-partition synth →
    * GPNG-encode → container seek → ImageIO decode of sampled frames only →
    * [[aHash64]]. The seed is explicit (same contract as [[imageHashes]])
    * so callers control which refs are pixel-identical — a re-encoded or
    * re-hosted video keeps its seed. Narrow, no shuffle. */
  def videoHashes(refs: Dataset[(String, Long, Int, Int, Int)], k: Int): Dataset[VideoFrameHash] = {
    import refs.sparkSession.implicits._
    refs.mapPartitions(_.flatMap { case (ref, seed, nf, w, h) =>
      videoFrameHashes(ref, synthVideoBytes(seed, nf, w, h), k)
    })
  }

  /** Video near-dup pairs from per-frame hashes: two videos match when at
    * least `minFrames` of their sampled frames agree FRAME-ALIGNED (same
    * sampled index, equal 64-bit hash) — the frame index acts as the LSH
    * band id, so the join buckets on (index, hash) and is never all-pairs.
    * A shifted or trimmed video matches on the surviving aligned frames;
    * tolerance is the `minFrames` dial. One equi-join + one pair-count
    * aggregate. Returns (ref_a, ref_b, matched_frames). */
  def videoDupPairs(frameHashes: org.apache.spark.sql.DataFrame,
      minFrames: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val key = Seq("frame_index", "ahash_hi", "ahash_lo")
    val a = frameHashes.select(key.map(col) :+ col("media_ref").as("ref_a"): _*)
    val b = frameHashes.select(key.map(col) :+ col("media_ref").as("ref_b"): _*)
    a.join(b, key)
      .filter(col("ref_a") < col("ref_b"))
      .groupBy("ref_a", "ref_b")
      .agg(count(lit(1)).as("matched_frames"))
      .filter(col("matched_frames") >= minFrames)
  }

  // --------------------------------------------- audio VAD segmentation ----

  /** One voice-activity segment of a clip: active-frame run with gap
    * tolerance. `end_frame` is the LAST active frame (inclusive). */
  final case class VadSegment(media_ref: String, seg: Int, start_frame: Int,
    end_frame: Int, n_active: Int)

  /** Energy-threshold voice-activity detection over a PCM sample array —
    * the classic first stage of any speech-data pipeline (frame energy vs
    * an adaptive clip-level threshold, hangover merging; Sohn et al. 1999
    * shape, energy-only variant). Integer throughout:
    *  - frame f = samples [f·frameLen, min((f+1)·frameLen, n)), mean
    *    |sample| by integral division;
    *  - frame ACTIVE iff frameMean·1000 > thrMilli·clipMean (cross-
    *    multiplied — no division, no floats), clipMean = Σ|sample| div n;
    *  - active runs separated by ≤ maxGap inactive frames merge into one
    *    segment (the hangover); a clip with no active frame emits nothing.
    */
  def vadSegmentsPure(samples: Array[Int], frameLen: Int, thrMilli: Long,
      maxGap: Int): Seq[VadSegment] = {
    require(frameLen >= 1 && thrMilli >= 0 && maxGap >= 0)
    val n = samples.length
    if (n == 0) return Seq.empty
    var total = 0L
    var i = 0
    while (i < n) { total += math.abs(samples(i).toLong); i += 1 }
    val clipMean = total / n
    val nf = (n + frameLen - 1) / frameLen
    val active = (0 until nf).filter { f =>
      val from = f * frameLen
      val until = math.min(from + frameLen, n)
      var s = 0L
      var j = from
      while (j < until) { s += math.abs(samples(j).toLong); j += 1 }
      (s / (until - from)) * 1000L > thrMilli * clipMean
    }
    if (active.isEmpty) return Seq.empty
    val segs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    var start = active.head
    var last = active.head
    var cnt = 1
    for (f <- active.tail) {
      if (f - last <= maxGap + 1) { last = f; cnt += 1 }
      else { segs += ((start, last, cnt)); start = f; last = f; cnt = 1 }
    }
    segs += ((start, last, cnt))
    segs.toSeq.zipWithIndex.map { case ((s, e, c), k) =>
      VadSegment("", k, s, e, c) }
  }

  /** Distributed VAD over (media_ref, n_samples) specs through the REAL
    * decode path (synth PCM → WAV encode → javax.sound decode), seed =
    * hash32(ref) as in [[decodeAudioStats]]. Narrow, no shuffle; at scale
    * the per-clip kernel cost is linear in samples and nothing crosses
    * partitions. */
  def vadSegments(refs: Dataset[(String, Int)], frameLen: Int,
      thrMilli: Long, maxGap: Int): Dataset[VadSegment] = {
    import refs.sparkSession.implicits._
    refs.mapPartitions(_.flatMap { case (ref, n) =>
      val seed = graft.text.TextAnalysis.hash32(ref)
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(synthWavBytes(seed, n)))
      val samples = try {
        val pcm = in.readAllBytes()
        Array.tabulate(pcm.length / 2)(i =>
          (pcm(2 * i) & 0xff) | (pcm(2 * i + 1).toInt << 8))
      } finally in.close()
      vadSegmentsPure(samples, frameLen, thrMilli, maxGap)
        .map(_.copy(media_ref = ref))
    })
  }

  // --------------------------------------------- video scene detection -----

  /** Scene-cut detection over a per-frame perceptual-hash table
    * (`media_ref`, `frame_index`, `ahash_hi`, `ahash_lo` — the
    * [[videoHashes]] output shape): frame k starts a new scene when its
    * aHash Hamming distance to frame k-1 is at least `minHamming` (the
    * standard hash-distance shot-boundary detector). Output: one row per
    * CUT (media_ref, frame_index, dist) — the first frame of each new
    * scene; a clip with static content emits nothing.
    *
    * Shape at scale: ONE hash exchange on media_ref + an in-partition
    * window over the clip's (bounded, sampled) frames; `bit_count` over
    * xor is codegen'd. Never a join. */
  def sceneCuts(frameHashes: org.apache.spark.sql.DataFrame,
      minHamming: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(minHamming >= 1, s"minHamming must be >= 1: $minHamming")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_ref").orderBy("frame_index")
    frameHashes
      .withColumn("__phi", lag("ahash_hi", 1).over(w))
      .withColumn("__plo", lag("ahash_lo", 1).over(w))
      .filter(col("__phi").isNotNull)
      .withColumn("dist",
        (bit_count(col("ahash_hi").bitwiseXOR(col("__phi"))) +
         bit_count(col("ahash_lo").bitwiseXOR(col("__plo")))).cast("long"))
      .filter(col("dist") >= minHamming)
      .select(col("media_ref"), col("frame_index"), col("dist"))
  }
}
