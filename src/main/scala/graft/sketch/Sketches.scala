package graft.sketch

import graft.text.TextAnalysis

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Distinct-count sketching with K-Minimum-Values (Bar-Yossef et al. 2002):
  * keep the k smallest distinct 60-bit hashes per group; if fewer than k
  * survive the count is exact, otherwise estimate (k-1)·M / kth_min with
  * M = 2⁶⁰ the hash range.
  *
  * Why KMV and not Spark's builtin `approx_count_distinct` (HLL++): the
  * builtin's result depends on internal register encodings no other engine
  * reproduces — it can never pass an exact cross-engine gate. KMV's state
  * is just "the k smallest distinct hashes", a pure function of the input
  * SET: merge order, partitioning, and engine cannot move it, so DuckDB
  * replays the estimate bit-for-bit (hashes are the md5-derived
  * [[TextAnalysis.hash60]]; the final division is exact 128-bit integer
  * math on both sides). The same pinning applied to the HLL algorithm
  * itself lives below ([[hllDistinct]]) — 256 bytes of state per group
  * where KMV carries k·8.
  *
  * Scale shape: the [[KmvAggregator]] is a typed Aggregator with a bounded
  * sorted-array buffer (≤ k longs), so Spark runs it as a real partial
  * aggregation — map-side combine on every partition, k·8 bytes of state
  * per group in flight, ONE shuffle of sketch buffers (not rows). That is
  * the same execution profile as approx_count_distinct, with a replayable
  * answer.
  */
object Sketches {

  /** Typed KMV aggregator over pre-hashed values (use [[kmvHash]]).
    * Buffer = ascending array of ≤ k distinct hashes. */
  class KmvAggregator(k: Int) extends Aggregator[Long, Array[Long], Long] {
    require(k >= 2, s"k must be >= 2: $k")
    private val M = 1L << 60

    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(buf, h)
      if (pos >= 0) buf // already kept
      else {
        val ins = -pos - 1
        if (buf.length < k) {
          val out = new Array[Long](buf.length + 1)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
          out
        } else if (ins < k) {
          val out = new Array[Long](k)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
          out
        } else buf // not among the k smallest
      }
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      // merge two sorted distinct arrays, keep the k smallest distinct
      val out = new Array[Long](math.min(k, a.length + b.length))
      var i = 0; var j = 0; var n = 0
      while (n < out.length && (i < a.length || j < b.length)) {
        val v =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
          else { val x = b(j); j += 1; x }
        if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }

    override def finish(buf: Array[Long]): Long =
      if (buf.length < k) buf.length.toLong
      else (BigInt(k - 1) * M / BigInt(buf.last)).toLong

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** The hash KMV expects: md5-derived 60-bit over the value's canonical
    * string form — replayable as `('0x'||substr(md5(x::VARCHAR),1,15))`. */
  def kmvHash(c: Column): Column = TextAnalysis.hash60(c.cast("string"))

  /** `groupBy(groupCols).agg(distinct_est)` over `valueCol` with the KMV
    * aggregator: bounded per-group state, map-side combine, one sketch
    * shuffle. Output: group columns + `distinct_est`. */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int): DataFrame = {
    val agg = udaf(new KmvAggregator(k))
    df.groupBy(groupCols.map(col): _*)
      .agg(agg(kmvHash(col(valueCol))).as("distinct_est"))
  }

  /** Materialized KMV synopsis: the k smallest distinct hashes per group as
    * (groupCols…, h) rows — the mergeable state itself. Synopses from
    * disjoint snapshots union + re-take-k into the union's synopsis without
    * touching the raw rows again (each half's k smallest contain every
    * candidate for the union's k smallest), so per-day synopses persist and
    * any date range is a k·8-byte-per-group merge. */
  def kmvSynopsis(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int): DataFrame = {
    val h = df.select(groupCols.map(col) :+ kmvHash(col(valueCol)).as("h"): _*)
      .distinct()
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("h"))
    h.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Merge synopsis relations (same groupCols + `h` column): union,
    * re-distinct, keep the k smallest per group. Associative and
    * idempotent — the identity the spec and the `kmv_merge` oracle pin. */
  def kmvMergeSynopses(k: Int, groupCols: Seq[String], synopses: DataFrame*)
      : DataFrame = {
    require(synopses.nonEmpty, "need at least one synopsis")
    val u = synopses.reduce(_ unionAll _).distinct()
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("h"))
    u.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Closed-form estimate from a synopsis relation: exact count below k,
    * otherwise (k-1)·2⁶⁰ / kth_min through a 128-bit decimal division. */
  def kmvEstimateFromSynopsis(synopsis: DataFrame, groupCols: Seq[String],
      k: Int): DataFrame = {
    val M = 1L << 60
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("h"))
    synopsis.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__cnt"),
        max(when(col("__rn") === k, col("h"))).as("__kth"))
      .withColumn("distinct_est",
        when(col("__cnt") < k, col("__cnt"))
          // (k-1)·2⁶⁰ needs 128-bit: DECIMAL(38,0) division, floored like
          // BigInt and DuckDB HUGEINT do for positive operands
          .otherwise(floor(lit(BigDecimal(k - 1) * BigDecimal(M))
            .cast("decimal(38,0)") / col("__kth").cast("decimal(38,0)"))
            .cast("long")))
      .drop("__cnt", "__kth")
  }

  /** Relational twin of [[kmvDistinct]] for cross-checks and oracles: the
    * same answer from distinct → per-group rank window → closed-form
    * estimate. Costs a full distinct + sort per group, which is exactly
    * what the sketch avoids — baseline only. */
  def kmvDistinctRelational(df: DataFrame, groupCols: Seq[String],
      valueCol: String, k: Int): DataFrame =
    kmvEstimateFromSynopsis(kmvSynopsis(df, groupCols, valueCol, k),
      groupCols, k)

  /** KMV set-operation estimates from TWO synopses (Beyer et al. 2007,
    * "On synopses for distinct-value estimation under multiset
    * operations"): the union's k-min set L is the merge of the synopses
    * re-capped at k; the Jaccard estimate is the fraction of L present in
    * BOTH synopses, and the intersection estimate scales the union
    * estimate by it — so "how much do yesterday's and today's crawls
    * overlap" is answered from two k-row synopses without rescanning
    * either corpus. All outputs integer (milli Jaccard, floored 128-bit
    * products), so any engine replays them bit-identically.
    *
    * Output: groupCols + (n_shared, k_used, jaccard_milli, union_est,
    * intersection_est). Groups empty on one side estimate zero overlap;
    * groups below k on both sides are EXACT (L is the whole union). */
  def kmvOverlap(synA: DataFrame, synB: DataFrame, groupCols: Seq[String],
      k: Int): DataFrame = {
    val M = 1L << 60
    val gc = groupCols.map(col)
    val a = synA.select(gc :+ col("h"): _*).withColumn("__a", lit(1L))
    val b = synB.select(gc :+ col("h"): _*).withColumn("__b", lit(1L))
    val j = a.join(b, groupCols :+ "h", "full_outer")
      .na.fill(0L, Seq("__a", "__b"))
    val w = Window.partitionBy(gc: _*).orderBy(col("h"))
    j.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(gc: _*)
      .agg(count(lit(1)).as("k_used"),
        sum(when(col("__a") === 1 && col("__b") === 1, 1L).otherwise(0L))
          .as("n_shared"),
        max(when(col("__rn") === k, col("h"))).as("__kth"))
      .withColumn("union_est",
        when(col("k_used") < k, col("k_used"))
          .otherwise(floor(lit(BigDecimal(k - 1) * BigDecimal(M))
            .cast("decimal(38,0)") / col("__kth").cast("decimal(38,0)"))
            .cast("long")))
      .withColumn("jaccard_milli", expr("(1000 * n_shared) div k_used"))
      // n_shared·union_est can pass 2^63 (k up to hundreds × 2^60-scale
      // estimates) — 128-bit decimal, floored like HUGEINT division
      .withColumn("intersection_est",
        floor(col("n_shared").cast("decimal(38,0)") *
          col("union_est").cast("decimal(38,0)") /
          col("k_used").cast("decimal(38,0)")).cast("long"))
      .drop("__kth")
  }

  /** Pure twin of [[kmvOverlap]] for one group. */
  def kmvOverlapPure(a: Seq[String], b: Seq[String], k: Int)
      : (Long, Long, Long, Long, Long) = {
    val ha = a.map(TextAnalysis.hash60).distinct.sorted.take(k).toSet
    val hb = b.map(TextAnalysis.hash60).distinct.sorted.take(k).toSet
    val l = (ha ++ hb).toSeq.sorted.take(k)
    val kUsed = l.length.toLong
    val nShared = l.count(h => ha(h) && hb(h)).toLong
    val unionEst =
      if (kUsed < k) kUsed
      else (BigInt(k - 1) * (BigInt(1) << 60) / BigInt(l.last)).toLong
    val interEst = (BigInt(nShared) * BigInt(unionEst) / BigInt(kUsed)).toLong
    (nShared, kUsed, 1000L * nShared / kUsed, unionEst, interEst)
  }

  /** Pure twin: exact replay of the KMV estimate over an in-memory set. */
  def kmvDistinctPure(values: Seq[String], k: Int): Long = {
    val hs = values.map(TextAnalysis.hash60).distinct.sorted.take(k)
    if (hs.length < k) hs.length.toLong
    else (BigInt(k - 1) * (BigInt(1) << 60) / BigInt(hs.last)).toLong
  }

  // -------------------------------------------------------- Count-Min -----
  // Frequency estimation (Cormode & Muthukrishnan 2005): d hash rows of w
  // counters; item increments cell (i, h_i(x)) per row, estimate = min over
  // rows — never under-counts, over-counts only on collisions. The sketch
  // merges by elementwise ADD (commutative/associative), so the build is
  // partitioning-invariant and the estimate — collisions included — is a
  // pure function of the input multiset any engine can replay. Positions
  // reuse the Bloom double hash ([[graft.dedup.Bloom.positionsPure]] with
  // m = width, k = depth), with the row offset making rows independent.

  /** Build a d×w sketch over `textCol` occurrences (weight 1 per row):
    * per-partition long arrays, treeReduce-added. Memory d·w·8 bytes —
    * a config, not the data. Nulls are skipped. */
  def cmsBuild(df: DataFrame, textCol: String, width: Int, depth: Int): Array[Long] = {
    require(width > 0 && depth >= 1 && depth <= 10, s"bad cms dims $width x $depth")
    import org.apache.spark.sql.Encoders
    val cells = width * depth
    val parts = df.select(col(textCol)).na.drop(Seq(textCol))
      .select(col(textCol).cast("string")).as[String](Encoders.STRING)
      .rdd.mapPartitions { it =>
        val t = new Array[Long](cells)
        var any = false
        for (s <- it) {
          any = true
          val ps = graft.dedup.Bloom.positionsPure(s, width, depth)
          var i = 0
          while (i < depth) { t(i * width + ps(i).toInt) += 1; i += 1 }
        }
        if (any) Iterator.single(t) else Iterator.empty
      }
    if (parts.isEmpty()) new Array[Long](cells)
    else parts.treeReduce({ (a, b) =>
      val out = new Array[Long](cells)
      var i = 0
      while (i < cells) { out(i) = a(i) + b(i); i += 1 }
      out
    })
  }

  /** Merge CMS sketches of identical dimensions: elementwise add. The
    * counter of every (row, cell) is a sum over input rows, so sketches of
    * disjoint snapshots merge into EXACTLY the sketch of the union —
    * collisions included — which is what lets per-day d·w·8-byte sketches
    * persist and answer any date range without rescanning rows. */
  def cmsMerge(sketches: Seq[Array[Long]], width: Int, depth: Int): Array[Long] = {
    require(sketches.nonEmpty, "need at least one sketch")
    // total cell count alone cannot distinguish 512x3 from 768x2 — the
    // caller must assert the geometry, or the add would mix row layouts
    val cells = width * depth
    require(sketches.forall(_.length == cells),
      s"sketch dims differ from ${width}x$depth")
    val out = new Array[Long](cells)
    for (s <- sketches) {
      var i = 0
      while (i < cells) { out(i) += s(i); i += 1 }
    }
    out
  }

  /** Pure point estimate: min over rows of the item's cell. */
  def cmsEstimatePure(sketch: Array[Long], text: String, width: Int, depth: Int): Long = {
    val ps = graft.dedup.Bloom.positionsPure(text, width, depth)
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val v = sketch(i * width + ps(i).toInt)
      if (v < best) best = v
      i += 1
    }
    best
  }

  /** Attach `estCol` = CMS frequency estimate of `textCol` to every probe
    * row. Sketch rides a broadcast variable; map-only (same documented
    * UDF exception as [[graft.dedup.Bloom.probe]] — a broadcast array is
    * out of Column reach). Null text → null estimate. */
  def cmsEstimate(df: DataFrame, textCol: String, sketch: Array[Long],
      width: Int, depth: Int, estCol: String = "freq_est"): DataFrame = {
    require(sketch.length == width * depth,
      s"sketch has ${sketch.length} cells, want ${width * depth}")
    val bc = df.sparkSession.sparkContext.broadcast(sketch)
    val est = udf { (s: String) =>
      if (s == null) None
      else Some(cmsEstimatePure(bc.value, s, width, depth))
    }
    df.withColumn(estCol, est(col(textCol).cast("string")))
  }

  // ------------------------------------------------- sampled quantiles ----

  /** Approximate quantiles from a deterministic hash-threshold sample — the
    * quantile member of the sketch family next to KMV (distinct), CMS
    * (frequency) and Bloom (membership). The full relation never sorts:
    * rows with `md5-hash60(id) < frac·2⁶⁰` survive (an RNG-free uniform
    * draw — [[graft.text.Sampling.hashThreshold]]'s cut, so reruns and the
    * oracle agree row-for-row), and quantile `q` is estimated as the
    * sample's element at rank `max(1, ceil(q·m))` in (value, id) order.
    * Error is the standard sampling bound (~1/√(frac·n) rank error); the
    * exact `percentile` op is the non-sketch alternative.
    *
    * Plan: a pure filter (zero shuffles) + ONE window over the
    * sketch-sized sample (bounded by frac, by construction — the window
    * never sees the full relation). Output: (q, est, sample_n). */
  def sampledQuantiles(df: DataFrame, idCol: String, valCol: String,
      qs: Seq[Double], frac: Double): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), s"qs: $qs")
    val spark = df.sparkSession
    import spark.implicits._
    val sample = graft.text.Sampling.hashThreshold(
      df.select(col(idCol), col(valCol)), idCol, frac)
    val w = Window.orderBy(col(valCol), col(idCol))
    val ranked = sample.withColumn("__rn", row_number().over(w))
      .withColumn("__m", count(lit(1)).over(
        Window.partitionBy().rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    ranked.crossJoin(broadcast(qs.toDF("q")))
      .filter(col("__rn") ===
        greatest(lit(1L), ceil(col("q") * col("__m")).cast("long")))
      .select(col("q"), col(valCol).as("est"), col("__m").as("sample_n"))
  }

  /** Pure twin of [[sampledQuantiles]] over (id, value) pairs. */
  def sampledQuantilesPure(rows: Seq[(Long, Double)], qs: Seq[Double],
      frac: Double): Seq[(Double, Double, Long)] = {
    val sample = rows
      .filter(r => graft.text.Sampling.hashThresholdPure(r._1, frac))
      .sortBy(r => (r._2, r._1)).map(_._2)
    val m = sample.length.toLong
    qs.map { q =>
      val rank = math.max(1L, math.ceil(q * m).toLong)
      (q, sample((rank - 1).toInt), m)
    }
  }

  // ------------------------------------------------------ HyperLogLog -----
  // Distinct counting with HyperLogLog (Flajolet et al. 2007), made
  // cross-engine replayable. Spark's builtin approx_count_distinct (HLL++)
  // can never pass an exact gate because its answer depends on private
  // register encodings — but the ALGORITHM is a pure set function once the
  // hash and the arithmetic are pinned:
  //   - hash  = md5 hex of the value's canonical string form;
  //   - bucket = first 2 hex chars (m = 256 registers, p = 8);
  //   - rho    = 1 + leading-zero count of the next 13 hex chars (52 bits),
  //              computed on the HEX STRING (4 bits per '0' char plus the
  //              intra-digit zeros of the first nonzero char) so no engine
  //              ever touches floating log2;
  //   - register_j = max rho over values hashing to bucket j (a set max);
  //   - harmonic sum scaled to exact int64: S = Σ 2^(53-register_j), with
  //     absent registers contributing 2^53. Max S = 256·2^53 = 2^61 < 2^63.
  //   - raw estimate = floor(α·m²·2^53 / S) with α_256 = 0.7213/(1+1.079/256)
  //     carried as the EXACT rational 1846528/2570790 — one 128-bit integer
  //     division (BigInt here, HUGEINT `//` in DuckDB);
  //   - small-range correction (raw ≤ 5m/2 with empty registers): linear
  //     counting round(m·ln(m/V)) via [[hllLinearCounting]], a 256-entry
  //     table precomputed ONCE on the JVM and embedded verbatim in the
  //     oracle SQL, so no cross-engine libm call can move the answer.
  // Every step is engine-neutral integer/string math, so DuckDB replays the
  // estimate bit-for-bit — same discipline as KMV, with HLL's production
  // profile: 256 BYTES of state per group (vs KMV's k·8), merged by
  // elementwise max in a real partial aggregation.

  /** m = 256 registers (p = 8); rho ranges over [1, 53]. */
  val HllM = 256
  private val HllShift = 53 // 52 hashed bits + 1
  /** α_256·m² as an exact rational: 1846528/2570790 · 65536. */
  private val HllAlphaNum = BigInt(1846528) * 65536 * (BigInt(1) << HllShift)
  private val HllAlphaDen = BigInt(2570790)

  /** Linear-counting table: lc(v) = round(m·ln(m/v)) for v in [1, m].
    * Index 0 unused. Computed once on the JVM; the oracle SQL embeds these
    * exact values as a VALUES list (see SparkEntry), so both engines use
    * the identical table. */
  val hllLinearCounting: IndexedSeq[Long] =
    0L +: (1 to HllM).map(v => math.round(HllM * math.log(HllM.toDouble / v)))

  /** (bucket, rho) of one md5 hex string (32 lowercase hex chars). */
  private[sketch] def hllBucketRho(hx: String): (Int, Int) = {
    val bucket = Integer.parseInt(hx.substring(0, 2), 16)
    var z = 0
    while (z < 13 && hx.charAt(2 + z) == '0') z += 1
    val rho =
      if (z == 13) HllShift
      else {
        val d = Integer.parseInt(hx.substring(2 + z, 3 + z), 16)
        val bitlen = if (d >= 8) 4 else if (d >= 4) 3 else if (d >= 2) 2 else 1
        4 * z + 5 - bitlen
      }
    (bucket, rho)
  }

  /** Estimate from a full register array: raw 128-bit-exact division, then
    * the standard small-range linear-counting branch. Returns
    * (estimate, zero_register_count). */
  private[sketch] def hllFinish(regs: Array[Byte]): (Long, Long) = {
    var sl = 0L // Σ 2^(53-reg): max 256·2^53 = 2^61, exact in int64
    var v = 0
    var j = 0
    while (j < HllM) {
      sl += 1L << (HllShift - regs(j)) // regs(j)=0 (absent) contributes 2^53
      if (regs(j) == 0) v += 1
      j += 1
    }
    val raw = (HllAlphaNum / (HllAlphaDen * BigInt(sl))).toLong
    val est = if (v > 0 && raw <= 5L * HllM / 2) hllLinearCounting(v) else raw
    (est, v.toLong)
  }

  /** Typed HLL aggregator over md5 hex strings: 256-byte register buffer,
    * merged by elementwise max — map-side combine, ONE shuffle of 256-byte
    * states per group. Output: (hll_est, zero_regs). */
  class HllAggregator extends Aggregator[String, Array[Byte], (Long, Long)] {
    override def zero: Array[Byte] = new Array[Byte](HllM)
    override def reduce(buf: Array[Byte], hx: String): Array[Byte] = {
      val (b, r) = hllBucketRho(hx)
      if (r > buf(b)) buf(b) = r.toByte
      buf
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var j = 0
      while (j < HllM) { if (b(j) > a(j)) a(j) = b(j); j += 1 }
      a
    }
    override def finish(buf: Array[Byte]): (Long, Long) = hllFinish(buf)
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[(Long, Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long)]()
  }

  /** `groupBy(groupCol).agg(HLL)` over `valueCol`: the production distinct
    * sketch — constant 256 B of state per group in flight, one shuffle of
    * states (never of rows). Output: groupCol, `hll_est`, `zero_regs`. */
  def hllDistinct(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val agg = udaf(new HllAggregator)
    df.groupBy(col(groupCol))
      .agg(agg(md5(col(valueCol).cast("string"))).as("__h"))
      .select(col(groupCol), col("__h._1").as("hll_est"),
        col("__h._2").as("zero_regs"))
  }

  /** Materialized registers: one (groupCol, bucket, reg) row per OCCUPIED
    * register — the mergeable state itself. Registers from disjoint
    * snapshots union + max into the union's registers without touching the
    * raw rows again (the property that makes sketches the 100 TB tool:
    * per-day registers persist, any date range is a register merge). */
  def hllRegisters(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val hx = md5(col(valueCol).cast("string"))
    val tail = substring(hx, 3, 13)
    val z = length(regexp_extract(tail, "^0*", 0))
    val d = when(z < 13, conv(substring(tail, z + 1, lit(1)), 16, 10).cast("int"))
      .otherwise(0)
    val bitlen = when(d >= 8, 4).when(d >= 4, 3).when(d >= 2, 2).otherwise(1)
    val rho = when(z === 13, HllShift).otherwise(lit(4) * z + 5 - bitlen)
    df.select(col(groupCol),
        conv(substring(hx, 1, 2), 16, 10).cast("int").as("bucket"),
        rho.as("__rho"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("__rho")).as("reg"))
  }

  /** Estimate from a (groupCol, bucket, reg) register relation (occupied
    * registers only): the harmonic sum, the 128-bit-exact raw estimator,
    * and the linear-counting branch — Column-only. */
  def hllEstimateFromRegisters(regs: DataFrame, groupCol: String): DataFrame = {
    val lcMap = typedLit(hllLinearCounting)
    regs.select(col(groupCol), col("bucket").as("__bucket"), col("reg").as("__reg"))
      .groupBy(col(groupCol))
      .agg((sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HllShift - __reg)")) +
        (lit(HllM) - count(lit(1))) * lit(1L << HllShift)).as("__s"),
        (lit(HllM) - count(lit(1))).as("zero_regs"))
      // α·m²·2^53 / S in DECIMAL(38,0): numerator ~1.1e26, S ≤ 2^61 — both
      // exact; floor of the positive quotient matches BigInt and HUGEINT //
      .withColumn("__raw", floor(lit(BigDecimal(HllAlphaNum)).cast("decimal(38,0)") /
        (col("__s").cast("decimal(38,0)") * lit(BigDecimal(HllAlphaDen)).cast("decimal(38,0)")))
        .cast("long"))
      .withColumn("hll_est",
        when(col("zero_regs") > 0 && col("__raw") <= 5L * HllM / 2,
          element_at(lcMap, (col("zero_regs") + 1).cast("int")))
          .otherwise(col("__raw")))
      .select(col(groupCol), col("hll_est"), col("zero_regs"))
  }

  /** Relational twin of [[hllDistinct]] — the same answer from Column-only
    * ops (hex-string rho, two groupBys, a 128-bit decimal division). Used
    * by the spec to pin the aggregator and by readers as the oracle's
    * mirror; the aggregator is the production path. */
  def hllDistinctRelational(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame =
    hllEstimateFromRegisters(hllRegisters(df, groupCol, valueCol), groupCol)

  /** Pure twin over an in-memory value set. */
  def hllDistinctPure(values: Seq[String]): (Long, Long) = {
    val regs = new Array[Byte](HllM)
    values.foreach { s =>
      val hex = md5Hex(s)
      val (b, r) = hllBucketRho(hex)
      if (r > regs(b)) regs(b) = r.toByte
    }
    hllFinish(regs)
  }

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.map(b => f"$b%02x").mkString
  }
}
