package graft.media

import graft.model.{Doc, Kind}

import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal-column plumbing: media spans are opaque references/bytes with
  * typed metadata, processed per-partition in batches (the Spark-side shape
  * of a vectorized decode stage). The actual codec is STUBBED with a
  * deterministic fake (no image/audio libraries in this environment): bytes
  * and metadata derive from md5 of the media_ref, so every part of the
  * pipeline around the decoder — schema, batching, partitioning, joins back
  * to documents — is real and testable, and the fake can be swapped for a
  * real decoder without touching the plumbing.
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
}
