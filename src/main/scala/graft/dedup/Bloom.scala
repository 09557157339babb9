package graft.dedup

import graft.text.TextAnalysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter membership for incremental dedup: build a filter over the
  * corpus already ingested, broadcast it, and flag probe documents whose
  * fingerprint is (probably) already present — the standard "drop
  * already-seen documents without shuffling the new batch against the old
  * corpus" primitive. A shuffle anti-join touches BOTH sides; the filter
  * costs one narrow pass over the old corpus once, then each new batch is
  * a map-only probe. At 10⁹ seen items and fp 1%, m ≈ 9.6 Gbit — size `m`
  * with `bitsFor`, or shard the corpus by `hash1 % shards` into several
  * filters probed the same way (build/probe are per-row pure, so sharding
  * is a groupBy away and each shard's filter stays broadcast-sized).
  *
  * Hashing is Kirsch–Mitzenmacher double hashing over md5, chosen so any
  * engine can replay membership decisions bit-for-bit — INCLUDING false
  * positives: position_i = (h1 + i·h2) mod m with h1 = md5 hex chars 1-15
  * (60 bits, [[TextAnalysis.hash60]]) and h2 = hex chars 17-26 (40 bits)
  * forced odd. h1 + (k-1)·h2 stays far inside int64 for k ≤ 100, so the
  * arithmetic is exact in Spark, the JVM, and DuckDB alike.
  */
object Bloom {

  /** m for a target false-positive rate at n items (standard bound),
    * rounded up to a whole number of bytes. */
  def bitsFor(n: Long, fp: Double): Int = {
    require(n > 0 && fp > 0 && fp < 1, s"bad bloom sizing n=$n fp=$fp")
    val m = math.ceil(-n * math.log(fp) / (math.log(2) * math.log(2)))
    require(m <= (1L << 31) - 8, s"filter would need $m bits; shard the corpus")
    ((m.toLong + 7) / 8 * 8).toInt
  }

  private def checkParams(m: Int, k: Int): Unit = {
    // position math only needs m > 0; the byte-multiple constraint is
    // build/probe's (bitset layout) and is asserted there
    require(m > 0, s"m must be positive: $m")
    require(k >= 1 && k <= 100, s"k out of range: $k")
  }

  private def checkBitset(m: Int): Unit =
    require(m % 8 == 0, s"m must be a multiple of 8 for the bitset: $m")

  /** Column form of the k bit positions for a string (array<long>),
    * null-safe (null text → null array). */
  def positionsCol(text: Column, m: Int, k: Int): Column = {
    checkParams(m, k)
    val d = md5(text)
    val h1 = conv(substring(d, 1, 15), 16, 10).cast("long")
    val h2 = conv(substring(d, 17, 10), 16, 10).cast("long").bitwiseOR(1L)
    // the null guard is on the ARRAY: without it a null text yields an
    // array of k null elements (each h1+i·h2 is null), not a null array
    when(text.isNotNull,
      transform(sequence(lit(0L), lit(k - 1L)), i => pmod(h1 + i * h2, lit(m.toLong))))
  }

  /** Pure twin of [[positionsCol]] — the same md5-derived double hash. */
  def positionsPure(text: String, m: Int, k: Int): Seq[Long] = {
    checkParams(m, k)
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h1 = 0L
    var i = 0
    while (i < 7) { h1 = (h1 << 8) | (d(i) & 0xffL); i += 1 }
    h1 = (h1 << 4) | ((d(7) & 0xf0L) >> 4)
    // hex chars 17-26 = bytes 8..12 exactly (char 17 opens byte 8) — 40 bits
    var h2 = 0L
    i = 8
    while (i < 13) { h2 = (h2 << 8) | (d(i) & 0xffL); i += 1 }
    h2 |= 1L
    (0 until k).map(j => (h1 + j.toLong * h2) % m)
  }

  /** Build the filter over `textCol`: per-partition local bitsets OR-merged
    * with treeReduce. Driver/executor memory is bounded by m/8 bytes — a
    * CONFIG, not the data; nulls are skipped. Deterministic and
    * partitioning-invariant (OR is commutative). */
  def build(df: DataFrame, textCol: String, m: Int, k: Int): Array[Byte] = {
    checkParams(m, k); checkBitset(m)
    import org.apache.spark.sql.Encoders
    val bytes = m / 8
    val parts = df.select(col(textCol)).na.drop(Seq(textCol))
      .select(col(textCol).cast("string")).as[String](Encoders.STRING)
      .rdd.mapPartitions { it =>
        val bits = new Array[Byte](bytes)
        var any = false
        for (s <- it) {
          any = true
          for (p <- positionsPure(s, m, k))
            bits(p.toInt >> 3) = (bits(p.toInt >> 3) | (1 << (p.toInt & 7))).toByte
        }
        if (any) Iterator.single(bits) else Iterator.empty
      }
    if (parts.isEmpty()) new Array[Byte](bytes)
    else parts.treeReduce({ (a, b) =>
      val out = new Array[Byte](bytes)
      var i = 0
      while (i < bytes) { out(i) = (a(i) | b(i)).toByte; i += 1 }
      out
    })
  }

  /** Merge filters of identical geometry: bitwise OR. The filter over a
    * union of corpora IS the OR of the per-corpus filters (each bit is an
    * OR over input rows), so per-snapshot m/8-byte filters persist and any
    * snapshot range merges without rescanning rows — the membership member
    * of the mergeable-state family (HLL registers, KMV synopses, CMS
    * counters). The byte length pins m; k is NOT encoded in the array, so
    * merging filters built with different k is undetectable here and wrong —
    * the caller owns that invariant (same k at build, merge, and probe). */
  def merge(filters: Seq[Array[Byte]]): Array[Byte] = {
    require(filters.nonEmpty, "need at least one filter")
    val bytes = filters.head.length
    require(filters.forall(_.length == bytes), "filter geometries differ")
    val out = new Array[Byte](bytes)
    for (f <- filters) {
      var i = 0
      while (i < bytes) { out(i) = (out(i) | f(i)).toByte; i += 1 }
    }
    out
  }

  /** Pure membership probe against filter bytes. */
  def containsPure(filter: Array[Byte], text: String, m: Int, k: Int): Boolean =
    positionsPure(text, m, k).forall { p =>
      (filter(p.toInt >> 3) & (1 << (p.toInt & 7))) != 0
    }

  /** Flag every probe row whose `textCol` is (probably) in the filter:
    * adds boolean `flagCol`. The filter bytes ride a broadcast variable
    * (NOT a plan literal — a multi-MB literal would bloat every task
    * binary); the probe itself is map-only, no shuffle. Null text →
    * false. */
  def probe(df: DataFrame, textCol: String, filter: Array[Byte], m: Int,
      k: Int, flagCol: String = "flagged"): DataFrame = {
    checkParams(m, k); checkBitset(m)
    require(filter.length == m / 8, s"filter is ${filter.length} bytes, want ${m / 8}")
    val bc = df.sparkSession.sparkContext.broadcast(filter)
    val flag = udf { (s: String) =>
      s != null && containsPure(bc.value, s, m, k)
    }
    // A UDF is the right tool here (documented exception to the
    // functions-first rule): the check indexes a broadcast byte array,
    // which no Column expression can reach; the equivalent Column form
    // would inline the filter as a literal into the plan.
    df.withColumn(flagCol, flag(col(textCol).cast("string")))
  }
}
