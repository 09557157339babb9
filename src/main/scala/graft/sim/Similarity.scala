package graft.sim

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, a sign-bucket (LSH-style)
  * approximate variant as the scale path, and near-duplicate pair detection.
  *
  * All math is done in double precision via higher-order column functions
  * (`zip_with` + `aggregate`) — codegen-friendly, no UDFs. Cosines are
  * rounded (6 dp) so results are reproducible across engines.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double precision, left-to-right accumulation — the native
    * codegen expression [[graft.sql.FloatVecDot]]. Registered by
    * `graft.sql.GraftExtensions` at session build; for sessions built
    * without the config, registration is ensured lazily on the active
    * session here. */
  def dotCol(a: Column, b: Column): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(org.apache.spark.sql.graftshim.GraftRegistration.ensure)
    call_function("graft_fvdot", a, b)
  }

  /** Pure-Catalyst fallback with identical semantics, for sessions without
    * the extension; ~30x slower per pair (interpreted lambda evaluation). */
  def dotColHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (s, v) => s + v)

  def normCol(a: Column): Column = sqrt(dotCol(a, a))

  def cosineCol(a: Column, b: Column): Column =
    round(dotCol(a, b) / (normCol(a) * normCol(b)), 6)

  def dot(a: Seq[Float], b: Seq[Float]): Double =
    a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x.toDouble * y.toDouble }

  def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    val c = dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Exact brute-force top-k: every query row against every candidate row.
    * The query side is broadcast (it is the small side by construction), so
    * the scan side streams once with no shuffle; the only shuffle is the
    * per-query top-k window. Output: (query_id, neighbor_id, cos, rank). */
  def bruteForceTopK(candidates: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    // norms are precomputed per row (not per pair); the pair stage computes
    // only the cross dot product
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__qn", normCol(col("__qv")))
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .withColumn("__cn", normCol(col("__cv")))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(dotCol(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Hard-negative mining for contrastive training (the standard pair-mining
    * step for embedding models à la DPR/SimCSE): for each labeled query, the
    * k nearest candidates whose label DIFFERS — the most-confusable wrong
    * answers, which carry far more gradient signal than random negatives.
    * Same plan as [[bruteForceTopK]] (broadcast query side, one top-k
    * window) with the label-mismatch predicate pushed into the join, so
    * same-label pairs never materialize. At corpus scale, swap the
    * brute-force scorer for [[ivfTopK]] candidates and keep the same
    * label-filtered rescore. Output: (query_id, query_label, neighbor_id,
    * neighbor_label, cos, rank). */
  def hardNegatives(candidates: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      col(labelCol).as("query_label")).withColumn("__qn", normCol(col("__qv")))
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      col(labelCol).as("neighbor_label")).withColumn("__cn", normCol(col("__cv")))
    val scored = c.join(broadcast(q),
      col("query_id") =!= col("neighbor_id") &&
        col("query_label") =!= col("neighbor_label"))
      .withColumn("cos",
        round(dotCol(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "query_label", "neighbor_id", "neighbor_label",
        "cos", "rank")
  }

  // ------------------------------------------------------------------------
  // Johnson–Lindenstrauss random projection — the dimensionality cut that
  // makes everything downstream (LSH tables, IVF cells, pair rescoring)
  // cheaper: project d-dim embeddings onto dOut Rademacher ±1 directions
  // (Achlioptas 2001: a ±1 matrix satisfies the JL lemma, no Gaussians
  // needed). Signs derive from the same integer mix family as the RHP
  // hyperplanes ("jl" domain constant), so no RNG, no model table to ship —
  // any engine replays the exact matrix. Inputs quantize to integer MICROS
  // before the sum, so each output coordinate is an exact int64 no matter
  // how partial aggregation reorders — same discipline as DSIR/perplexity.
  // ------------------------------------------------------------------------

  /** Deterministic ±1 for (output dim j, input dim i) — the "jl:" sibling
    * of [[mixParity]] (distinct additive constant so the JL matrix and the
    * RHP hyperplanes are independent). The 31-bit mask bounds the multiply
    * below 2^63 for any (j, i). */
  private def jlSign(j: Column, i: Column): Column = {
    val f = (j.cast("long") * lit(7919L) + i.cast("long") * lit(104729L) + lit(51151L))
      .bitwiseAND(lit(0x7fffffffL))
    (shiftright(f * lit(2654435761L) + lit(1013904223L), 16) % 2) * 2 - 1
  }

  private def jlSign(j: Int, i: Int): Long = {
    val f = (j.toLong * 7919L + i.toLong * 104729L + 51151L) & 0x7fffffffL
    (((f * 2654435761L + 1013904223L) >> 16) % 2L) * 2L - 1L
  }

  /** Project every vector onto `dOut` deterministic ±1 directions.
    * Output: (idCol, dim ∈ [0, dOut), out_micro) — coordinate j is
    * Σᵢ sign(j,i)·round(vᵢ·10⁶), exact int64. Null vectors are dropped.
    * Plan: completely NARROW (per-row transform + one posexplode); at
    * 100 TB the projection is a free pre-pass fused into the scan. */
  def jlProject(df: DataFrame, idCol: String, vecCol: String,
      dOut: Int): DataFrame = {
    require(dOut >= 1, s"dOut must be >= 1: $dOut")
    val v = col("__v")
    val out = transform(sequence(lit(0), lit(dOut - 1)), j =>
      aggregate(sequence(lit(0), size(v) - 1), lit(0L), (acc, i) =>
        acc + jlSign(j, i) *
          round(element_at(v, i + 1).cast("double") * 1e6).cast("long")))
    df.select(col(idCol), col(vecCol).as("__v"))
      .filter(v.isNotNull)
      .withColumn("__out", out)
      .select(col(idCol), posexplode(col("__out")).as(Seq("dim", "out_micro")))
      .select(col(idCol), col("dim").cast("long").as("dim"), col("out_micro"))
  }

  /** Pure twin of [[jlProject]] for one vector. */
  def jlProjectPure(vec: Seq[Float], dOut: Int): Seq[Long] =
    (0 until dOut).map { j =>
      vec.indices.foldLeft(0L) { (acc, i) =>
        acc + jlSign(j, i) * BigDecimal(vec(i).toDouble * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }
    }

  /** Per-key element-wise MEAN pooling of embedding vectors — chunk
    * embeddings → document embedding, labeled vectors → class prototypes
    * (the centroid table a prototype-kNN classifier serves from). Float
    * addition is order-dependent, so components are micro-quantized first
    * (the [[jlProject]] idiom: round(x·10⁶) as int64) — sums are then
    * exact integers and the result is invariant to partitioning; the mean
    * is ONE truncated integer division per (key, dim).
    *
    * Output stays RELATIONAL — (key, dim, mean_micro, n) — rather than
    * re-assembled arrays: no per-key array state, so a key with millions
    * of members costs the same shuffle as any other. Plan: narrow
    * quantize + posexplode, then ONE partial-aggregated (key, dim)
    * groupBy — a hot key spreads across its dims. */
  def meanPool(df: DataFrame, keyCol: String, vecCol: String): DataFrame = {
    val v = col("__v")
    df.select(col(keyCol).cast("long").as("__k"), col(vecCol).as("__v"))
      .filter(v.isNotNull)
      .select(col("__k"), posexplode(
        transform(v, x => round(x.cast("double") * 1e6).cast("long")))
        .as(Seq("dim", "m")))
      .groupBy(col("__k"), col("dim"))
      .agg(sum("m").as("__s"), count(lit(1)).as("n"))
      .select(col("__k").as(keyCol), col("dim").cast("long").as("dim"),
        expr("__s div n").as("mean_micro"), col("n"))
  }

  /** Pure twin of [[meanPool]] for one key: (dim, mean_micro, n). */
  def meanPoolPure(vecs: Seq[Seq[Float]]): Seq[(Long, Long, Long)] = {
    val quant = vecs.map(_.map(x => BigDecimal(x.toDouble * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
    quant.flatMap(_.zipWithIndex.map { case (m, d) => (d.toLong, m) })
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (d, ms) =>
        (d, ms.map(_._2).sum / ms.size, ms.size.toLong) }
  }

  /** Sign-bucket key: the first `p` dimensions' signs packed into an int —
    * a deterministic 2^p-cell space partition (IVF-style coarse quantizer
    * without training). Vectors are only compared within their own cell. */
  def signBucketCol(vec: Column, p: Int): Column =
    aggregate(zip_with(slice(vec, 1, p), sequence(lit(0), lit(p - 1)),
      (x, i) => when(x >= 0, call_function("shiftleft", lit(1), i)).otherwise(lit(0))),
      lit(0), (s, v) => s + v)

  def signBucket(vec: Seq[Float], p: Int): Int =
    vec.take(p).zipWithIndex.map { case (x, i) => if (x >= 0) 1 << i else 0 }.sum

  /** Approximate top-k: candidates are restricted to the query's sign
    * bucket, then scored exactly. Trades recall for a 2^p-fold reduction in
    * comparisons; the bucket join shuffles on the bucket key only. */
  def bucketedTopK(candidates: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, p: Int = 8): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      signBucketCol(col(vecCol), p).as("__bucket"))
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      signBucketCol(col(vecCol), p).as("__bucket"))
    val scored = c.join(broadcast(q), Seq("__bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosineCol(col("__qv"), col("__cv")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Embedding near-duplicate pairs: all (i < j) with cosine >= minCos.
    *
    * SMALL-N CORRECTNESS BASELINE ONLY: it broadcasts the whole table and
    * enumerates O(n²) pairs, which does not survive corpus scale. The
    * production path is [[bucketedNearDupPairs]] — same scoring, pairs
    * restricted to sign-bucket cells, shuffle on the bucket key only. */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String, minCos: Double): DataFrame = {
    val withNorm = df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .withColumn("__n", normCol(col("__v")))
    val a = withNorm.select(col("__id").as("id_a"), col("__v").as("__va"), col("__n").as("__na"))
    val b = withNorm.select(col("__id").as("id_b"), col("__v").as("__vb"), col("__n").as("__nb"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("cos", round(dotCol(col("__va"), col("__vb")) / (col("__na") * col("__nb")), 6))
      .filter(col("cos") >= minCos)
      .select("id_a", "id_b", "cos")
  }

  /** Scale path for embedding near-dup: pair enumeration happens only inside
    * the 2^p sign-bucket cells of the coarse quantizer ([[signBucketCol]]),
    * with exact cosine rescoring within each cell — one shuffle on the bucket
    * key, never all-pairs, no broadcast of the table. Recall is bounded by
    * cell purity (a pair straddling a sign boundary in the first `p` dims is
    * missed) — the standard IVF trade; [[nearDupPairs]] remains the exact
    * small-n baseline for recall measurement. */
  def bucketedNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      minCos: Double, p: Int = 8): DataFrame = {
    val withB = df.select(col(idCol).as("__id"), col(vecCol).as("__v"),
      signBucketCol(col(vecCol), p).as("__bucket"))
      .withColumn("__n", normCol(col("__v")))
    val a = withB.select(col("__bucket"), col("__id").as("id_a"),
      col("__v").as("__va"), col("__n").as("__na"))
    val b = withB.select(col("__bucket"), col("__id").as("id_b"),
      col("__v").as("__vb"), col("__n").as("__nb"))
    a.join(b, Seq("__bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(dotCol(col("__va"), col("__vb")) / (col("__na") * col("__nb")), 6))
      .filter(col("cos") >= minCos)
      .select("id_a", "id_b", "cos")
  }

  // ------------------------------------------------------------------------
  // Random-hyperplane (Charikar sign-projection) LSH — the tunable-recall
  // scale path for embedding near-dup. `tables` independent hash tables of
  // `bits` hyperplane bits each: collision probability per table is
  // (1 - θ/π)^bits, overall 1-(1-p)^tables, so recall is a dial (more
  // tables) and candidate volume another (more bits) — unlike the fixed
  // first-p-dims sign bucket above, whose recall is whatever the data gives.
  // Hyperplanes are deterministic Rademacher ±1 vectors derived from an
  // integer mix of (table, bit, dim) — no RNG, so DuckDB replays the exact
  // bucketing for the oracle and reruns are stable.
  // ------------------------------------------------------------------------

  /** Deterministic ±1 for hyperplane (table h, bit i), dimension j:
    * f = (h*1000003 + i*7919 + j*104729) masked to 31 bits, then an LCG step
    * and bit 16 extracted as the sign (a bit shift, not division — Spark's
    * `/` is double division, which loses exactness above 2^53). The 31-bit
    * mask bounds f*2654435761 ≤ (2^31-1)·2654435761 < 2^63, so the mix
    * provably fits int64 for ANY dimension count — without it, dims above
    * ~33k would wrap silently in Scala while ANSI Spark and DuckDB BIGINT
    * raise on overflow, silently diverging the three twins. The oracle SQL
    * (`rhp_near_dup`) applies the identical mask. */
  private def mixParity(h: Int, i: Int, j: Column): Column = {
    val f = (lit(h.toLong * 1000003L + i.toLong * 7919L) + j.cast("long") * lit(104729L))
      .bitwiseAND(lit(0x7fffffffL))
    (shiftright(f * lit(2654435761L) + lit(1013904223L), 16) % 2) * 2 - 1
  }

  private def mixParity(h: Int, i: Int, j: Int): Int = {
    val f = (h.toLong * 1000003L + i.toLong * 7919L + j.toLong * 104729L) & 0x7fffffffL
    (((f * 2654435761L + 1013904223L) >> 16) % 2L).toInt * 2 - 1
  }

  /** One LSH key per table: bits packed little-endian plus the table id in
    * the high bits, so keys from different tables never collide. A null
    * `vec` yields a null array (not all-zero-bit keys): the sign condition
    * on a null projection would otherwise fall through `otherwise(0L)` to a
    * valid key h·2^bits, breaking the typed≡column equivalence —
    * [[rhpKeyRows]] drops null vectors, so the column path must too
    * (explode discards the null array row). */
  def rhpKeysCol(vec: Column, tables: Int, bits: Int): Column = {
    val dims = sequence(lit(0), size(vec) - 1)
    val keys = (0 until tables).map { h =>
      val packed = (0 until bits).map { i =>
        val proj = aggregate(
          zip_with(vec, dims, (x, j) => x.cast("double") * mixParity(h, i, j)),
          lit(0.0), (s, v) => s + v)
        // sign on the 6dp-rounded projection: engines may sum in different
        // orders (DuckDB list_sum vs sequential fold); rounding absorbs ulps
        when(round(proj, 6) >= 0, lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
      (lit(h.toLong * (1L << bits)) + packed).cast("long")
    }
    when(vec.isNotNull, array(keys: _*))
  }

  /** Pure twin of [[rhpKeysCol]] for tests and the typed path. */
  def rhpKeys(vec: Seq[Float], tables: Int, bits: Int): Seq[Long] =
    (0 until tables).map { h =>
      val packed = (0 until bits).map { i =>
        val proj = vec.iterator.zipWithIndex
          .foldLeft(0.0) { case (s, (x, j)) => s + x.toDouble * mixParity(h, i, j) }
        val rounded = BigDecimal(proj).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        if (rounded >= 0) 1L << i else 0L
      }.sum
      h.toLong * (1L << bits) + packed
    }

  /** Typed per-partition (id, vec, norm, key) rows, one row per hash table —
    * the production path for key computation. The Column twin
    * ([[rhpKeysCol]]) evaluates tables×bits interpreted HOF aggregates per
    * row (no codegen inside `transform`/`aggregate` lambdas), measured ~15x
    * slower; values are identical (asserted in tests — both are sequential
    * double accumulation with the same 6dp sign rounding). */
  def rhpKeyRows(df: DataFrame, idCol: String, vecCol: String,
      tables: Int, bits: Int): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    val schema = StructType(Seq(df.schema(idCol), df.schema(vecCol),
      StructField("__n", DoubleType, nullable = false),
      StructField("__key", LongType, nullable = false)))
    // null vectors are dropped, matching the Column path (rhpKeysCol
    // evaluates to null there and explode discards the row)
    df.select(col(idCol), col(vecCol)).filter(col(vecCol).isNotNull)
      .mapPartitions { it =>
        it.flatMap { row =>
          val vec = row.getSeq[Float](1)
          val nrm = math.sqrt(dot(vec, vec))
          rhpKeys(vec, tables, bits).iterator.map(k => Row(row.get(0), row.get(1), nrm, k))
        }
      }(Encoders.row(schema))
  }

  /** Near-duplicate pairs via multi-table random-hyperplane LSH: explode each
    * row to `tables` keys (typed scan-side path, [[rhpKeyRows]]), self-join
    * per key (the only wide shuffle, on the key — never all-pairs, nothing
    * broadcast), rescore candidates with the exact codegen cosine, then
    * dedup pairs found by several tables. Precision is exact (rescored);
    * recall ≈ 1-(1-(1-θ/π)^bits)^tables. Norms are computed once per row
    * before the explode. */
  def rhpNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      minCos: Double, tables: Int = 4, bits: Int = 12): DataFrame = {
    // persisted: the typed key computation (tables×bits dot products per
    // row) feeds both sides of the self-join — without the persist it runs
    // twice, once per side. Caller releases via Persisted.release /
    // unpersistAfter (or clearCache) after materializing (Verify/Bench do),
    // same contract as jaccardPairs.
    val keyed = graft.io.Persisted.track(
      rhpKeyRows(df, idCol, vecCol, tables, bits)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val a = keyed.select(col("__key"), col(idCol).as("id_a"),
      col(vecCol).as("__va"), col("__n").as("__na"))
    val b = keyed.select(col("__key"), col(idCol).as("id_b"),
      col(vecCol).as("__vb"), col("__n").as("__nb"))
    a.join(b, Seq("__key"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(dotCol(col("__va"), col("__vb")) / (col("__na") * col("__nb")), 6))
      .filter(col("cos") >= minCos)
      .select("id_a", "id_b", "cos")
      .distinct()
  }

  /** k-NN majority-label classification: top-k neighbors vote; ties broken
    * by smaller label. Output: (query_id, predicted_label). */
  def knnClassify(candidates: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    val topk = bruteForceTopK(candidates, queries, idCol, vecCol, k)
    val labeled = topk.join(
      candidates.select(col(idCol).as("neighbor_id"), col(labelCol).as("__label")),
      Seq("neighbor_id"))
    val votes = labeled.groupBy("query_id", "__label").agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy("query_id").orderBy(col("votes").desc, col("__label"))
    votes.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("query_id"), col("__label").as("predicted_label"))
  }

  // ------------------------------------------------------------------------
  // IVF-Flat — the trained-coarse-quantizer ANN path. Where the sign bucket
  // (first-p-dims) and RHP-LSH (random hyperplanes) partition the space
  // data-independently, IVF trains `nlist` centroids ON the corpus and
  // assigns each vector to its nearest cell; queries probe the `nProbe`
  // nearest cells and rescore exactly. Everything is RNG-free so the oracle
  // replays training bit-for-bit: seeds are the nlist rows with the smallest
  // md5(id) (a hash-ordered sample), Lloyd assignment uses the 6dp-rounded
  // cosine with smaller-cell tie-break, and refined centroid components are
  // per-dimension means rounded to 6dp (rounding absorbs the
  // summation-order ulps that differ between engines).
  // ------------------------------------------------------------------------

  /** Cosine between a float vector column and a double centroid column, 6dp
    * — interpreted HOFs, used only against the nlist-sized centroid side. */
  private def centCosCol(vec: Column, cent: Column): Column = {
    def d(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (s, v) => s + v)
    round(d(vec, cent) / (sqrt(d(vec, vec)) * sqrt(d(cent, cent))), 6)
  }

  private def centroidDf(spark: org.apache.spark.sql.SparkSession,
      cents: Array[(Int, Array[Double])]): DataFrame = {
    import spark.implicits._
    cents.toSeq.map { case (c, v) => (c, v.toSeq) }.toDF("__cell", "__c")
  }

  /** Train the coarse quantizer: deterministic hash-ordered seeds refined by
    * `iters` Lloyd steps. Each step is relational — one broadcast of the
    * nlist-row centroid table, one argmin window, one posexplode + groupBy
    * mean — and collects only nlist×dim doubles to the driver (centroids
    * are driver/broadcast data by design, as in any IVF build). With
    * iters ≥ 1 every seed row assigns to its own cell (self-cosine 1), so
    * no cell starts empty; a cell that loses all members in a later step is
    * dropped (standard Lloyd behavior — cell ids keep their seed index). */
  def ivfCentroids(df: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 1): Array[(Int, Array[Double])] = {
    val spark = df.sparkSession
    val base = df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    // TakeOrdered top-nlist, not a full sort: per-partition limit then merge
    val seeds = base.withColumn("__h", md5(col("__id").cast("string")))
      .orderBy(col("__h"), col("__id")).limit(nlist)
      .select(col("__v")).collect()
      .zipWithIndex.map { case (r, i) =>
        i -> r.getSeq[Float](0).toArray.map(_.toDouble)
      }
    (1 to iters).foldLeft(seeds) { (cents, _) =>
      val assigned = ivfAssignDf(base, "__id", "__v", centroidDf(spark, cents))
      assigned.select(col("__cell"), posexplode(col("__v")).as(Seq("__pos", "__x")))
        .groupBy("__cell", "__pos")
        .agg(round(avg(col("__x").cast("double")), 6).as("__m"))
        .groupBy("__cell")
        .agg(array_sort(collect_list(struct(col("__pos"), col("__m")))).as("__ms"))
        .collect()
        .map { r =>
          r.getInt(0) -> r.getSeq[Row](1).map(_.getDouble(1)).toArray
        }
        .sortBy(_._1)
    }
  }

  /** Relational cell assignment (argmin via broadcast of the nlist-row
    * centroid table + one window) — the oracle-replayable twin of
    * [[ivfAssignRows]]. The ×nlist row expansion before the argmin makes it
    * the small-side/training form; the typed path is the scan-side one. */
  def ivfAssignDf(df: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame): DataFrame = {
    val scored = df.crossJoin(broadcast(cents))
      .withColumn("__cos", centCosCol(col(vecCol), col("__c")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("__cos").desc, col("__cell"))
    scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .drop("__c", "__cos", "__rn")
  }

  /** Typed scan-side cell assignment: per-row argmin loop over the centroid
    * array in the task closure — no ×nlist row expansion, no shuffle, the
    * production path for indexing the candidate corpus. Appends (__cell,
    * __n) to (id, vec); identical semantics to [[ivfAssignDf]] (6dp-rounded
    * cosine, smaller-cell tie-break), asserted in tests. */
  def ivfAssignRows(df: DataFrame, idCol: String, vecCol: String,
      cents: Array[(Int, Array[Double])]): DataFrame = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.types.{DoubleType, IntegerType, StructField, StructType}
    val schema = StructType(Seq(df.schema(idCol), df.schema(vecCol),
      StructField("__cell", IntegerType, nullable = false),
      StructField("__n", DoubleType, nullable = false)))
    val centNorms = cents.map { case (c, v) =>
      (c, v, math.sqrt(v.foldLeft(0.0)((s, x) => s + x * x)))
    }
    df.select(col(idCol), col(vecCol)).filter(col(vecCol).isNotNull)
      .mapPartitions { it =>
        it.map { row =>
          val vec = row.getSeq[Float](1)
          val nrm = math.sqrt(dot(vec, vec))
          var bestCell = -1; var bestCos = Double.NegativeInfinity
          centNorms.foreach { case (c, cv, cn) =>
            var s = 0.0; var j = 0
            while (j < vec.length && j < cv.length) { s += vec(j).toDouble * cv(j); j += 1 }
            val cos = BigDecimal(s / (nrm * cn))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            if (cos > bestCos) { bestCos = cos; bestCell = c }
          }
          Row(row.get(0), row.get(1), bestCell, nrm)
        }
      }(Encoders.row(schema))
  }

  /** IVF-Flat approximate top-k: train on the candidate corpus, index
    * candidates into cells (typed argmin scan — narrow), probe each query's
    * `nProbe` best cells, rescore exactly with the codegen cosine. The only
    * wide operations are the cell join (query side broadcast — small by
    * construction) and the final per-query top-k window. Recall is the
    * standard IVF trade: a true neighbor living outside the probed cells is
    * missed; raise nProbe to buy recall with scan volume. */
  def ivfTopK(candidates: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nProbe: Int = 2,
      iters: Int = 1): DataFrame = {
    val cents = ivfCentroids(candidates, idCol, vecCol, nlist, iters)
    val cdf = centroidDf(candidates.sparkSession, cents)
    val cands = ivfAssignRows(candidates, idCol, vecCol, cents)
      .select(col("__cell"), col(idCol).as("neighbor_id"),
        col(vecCol).as("__cv"), col("__n").as("__cn"))
    val probeW = Window.partitionBy("query_id").orderBy(col("__cos").desc, col("__cell"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .crossJoin(broadcast(cdf))
      .withColumn("__cos", centCosCol(col("__qv"), col("__c")))
      .withColumn("__rn", row_number().over(probeW)).filter(col("__rn") <= nProbe)
      .select(col("__cell"), col("query_id"), col("__qv"),
        normCol(col("__qv")).as("__qn"))
    val scored = cands.join(broadcast(q), Seq("__cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        round(dotCol(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** SemDeDup-style semantic dedup (à la Abbas et al. 2023): cluster the
    * embedding space with the trained IVF coarse quantizer, then inside
    * each cell drop documents that are semantic duplicates (cosine ≥
    * `minCos`) of a preceding document. Precedence follows the paper's
    * keep-low-centroid-similarity rule: within a duplicate pair the doc
    * with the SMALLER cosine to its cell centroid survives (it preserves
    * more cluster diversity), ties broken by id — fully deterministic and
    * RNG-free, so the oracle replays training, assignment, and the drop
    * decision bit-for-bit.
    *
    * This is the ONE-PASS relational rule: a doc is dropped when ANY
    * duplicate partner precedes it in the (centroid_cos, id) order, even
    * if that partner is itself dropped. The paper's sequential greedy
    * scan differs only on chains (A~B, B~C, A≁C: greedy re-keeps C) —
    * a corpus-scale pass cannot iterate per-item, and over-dropping
    * borderline chain tails is the conservative direction for dedup.
    *
    * Plan: training collects only nlist×dim centroid doubles; assignment
    * is the typed narrow argmin scan; the pair enumeration is in-cell only
    * (one shuffle on the cell id — never corpus all-pairs; cell volume is
    * the nlist dial, exactly the SemDeDup algorithm's own knob); the final
    * attach is one groupBy + left join on the id. The assigned relation
    * feeds both join sides + the output — persisted under the
    * [[graft.io.Persisted]] caller-release contract.
    *
    * Output: one row per input doc —
    * (id, cell, centroid_cos, n_closer_dups, is_kept). */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      minCos: Double, nlist: Int = 16, iters: Int = 1): DataFrame = {
    val cents = ivfCentroids(df, idCol, vecCol, nlist, iters)
    val cdf = centroidDf(df.sparkSession, cents)
    val keyed = graft.io.Persisted.track(
      ivfAssignRows(df, idCol, vecCol, cents)
        .join(broadcast(cdf), Seq("__cell"))
        .withColumn("__ccos", centCosCol(col(vecCol), col("__c")))
        .drop("__c")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val a = keyed.select(col("__cell"), col(idCol).as("id_a"),
      col(vecCol).as("__va"), col("__n").as("__na"), col("__ccos").as("__cca"))
    val b = keyed.select(col("__cell"), col(idCol).as("id_b"),
      col(vecCol).as("__vb"), col("__n").as("__nb"), col("__ccos").as("__ccb"))
    val closer = a.join(b, Seq("__cell"))
      .filter(col("id_a") =!= col("id_b"))
      // partner precedes in (centroid_cos, id) order...
      .filter(col("__ccb") < col("__cca") ||
        (col("__ccb") === col("__cca") && col("id_b") < col("id_a")))
      // ...and is a semantic duplicate
      .filter(round(dotCol(col("__va"), col("__vb")) /
        (col("__na") * col("__nb")), 6) >= minCos)
      .groupBy(col("id_a").as(idCol))
      .agg(count(lit(1)).as("n_closer_dups"))
    keyed.select(col(idCol), col("__cell").as("cell"),
        col("__ccos").as("centroid_cos"))
      .join(closer, Seq(idCol), "left")
      .withColumn("n_closer_dups", coalesce(col("n_closer_dups"), lit(0L)))
      .withColumn("is_kept", col("n_closer_dups") === 0)
  }
  // ------------------------------------------------ k-center selection -----
  /** Greedy k-center / farthest-point traversal (Gonzalez 1985) — the
    * classic coreset selector for data curation (Sener & Savarese 2018,
    * "Active Learning for CNNs: A Core-Set Approach"): pick the point
    * farthest from everything selected so far, k times. The selected rows
    * maximize coverage diversity; `dist2` of round r is the corpus'
    * covering radius BEFORE that center was added, so the output doubles
    * as the coverage-radius curve.
    *
    * Determinism: exact integer micro² squared-Euclidean distances
    * (coords quantized to 1e-6; dim·64 × (2·10⁶)² ≪ 2⁶³ so the sum never
    * overflows), seed = smallest id, arg-max ties broken by smallest id.
    *
    * Shape at scale: k-1 driver-paced rounds (same contract as the BPE
    * trainer — k is tens-to-hundreds for curation, never corpus-sized);
    * each round is ONE narrow column update against the newest center (a
    * broadcast-literal array) + ONE TakeOrdered(1) action. The running
    * min-distance column is persisted and rolled forward, so round r does
    * NOT recompute r-1 distance evaluations — total work is O(n·k·dim)
    * spread over k scans, the textbook distributed Gonzalez. Early-stops
    * when the covering radius hits 0 (fewer distinct points than k).
    */
  def kCenterSelect(df: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val spark = df.sparkSession
    import spark.implicits._
    require(df.schema(idCol).dataType ==
      org.apache.spark.sql.types.LongType, s"$idCol must be LONG")

    def dist2To(c: Seq[Long]): Column = aggregate(
      zip_with(col("__v"), array(c.map(lit): _*), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

    val base = df.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("__id"),
        transform(col(vecCol),
          x => round(x.cast("double") * 1e6).cast("long")).as("__v"))
    val seed = base.orderBy(col("__id")).limit(1)
      .select(col("__id"), col("__v")).collect()(0)
    val seedId = seed.getLong(0)
    val seedVec = seed.getSeq[Long](1)
    val out = scala.collection.mutable.ArrayBuffer((0L, seedId, 0L))
    var cur = graft.io.Persisted.track(
      base.withColumn("__mind", dist2To(seedVec)).persist())
    var r = 1
    var radius0 = false
    while (r < k && !radius0) {
      val top = cur.orderBy(col("__mind").desc, col("__id")).limit(1)
        .select(col("__id"), col("__v"), col("__mind")).collect()(0)
      if (top.getLong(2) == 0L) radius0 = true // every point IS a center
      else {
        out += ((r.toLong, top.getLong(0), top.getLong(2)))
        if (r < k - 1) {
          val next = graft.io.Persisted.track(cur.withColumn("__mind",
            least(col("__mind"), dist2To(top.getSeq[Long](1)))).persist())
          next.limit(1).count() // materialize before dropping the parent
          cur.unpersist()
          cur = next
        }
      }
      r += 1
    }
    cur.unpersist()
    out.toSeq.toDF("round", idCol, "dist2")
  }

  /** Pure twin of [[kCenterSelect]]: (id, vec) rows → (round, id, dist2). */
  def kCenterSelectPure(rows: Seq[(Long, Seq[Float])], k: Int)
      : Seq[(Long, Long, Long)] = {
    require(k >= 1 && rows.nonEmpty)
    val pts = rows.sortBy(_._1)
      .map { case (id, v) => (id, v.map(x => BigDecimal(x.toDouble * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)) }
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var mind = pts.map(p => p._1 -> d2(p._2, pts.head._2)).toMap
    val byId = pts.toMap
    val out = scala.collection.mutable.ArrayBuffer((0L, pts.head._1, 0L))
    var r = 1
    var stop = false
    while (r < k && !stop) {
      val (id, md) = mind.toSeq.maxBy { case (i, m) => (m, -i) }
      if (md == 0L) stop = true
      else {
        out += ((r.toLong, id, md))
        mind = mind.map { case (i, m) => i -> math.min(m, d2(byId(i), byId(id))) }
      }
      r += 1
    }
    out.toSeq
  }
  // ------------------------------------------------ bitext margin mining ---
  /** Margin-based parallel-pair mining (Artetxe & Schwenk 2019, "Margin-
    * based Parallel Corpus Mining with Multilingual Sentence Embeddings" —
    * the CCMatrix/LASER recipe): a (src, dst) pair's raw cosine is
    * normalized by both sides' average cosine to their own k nearest
    * neighbors in the OTHER corpus, so hub sentences (close to everything)
    * stop winning every retrieval. ratio margin, both-direction
    * neighborhoods, integer throughout:
    *
    *   margin_milli = 2000·cos·n_src·n_dst div (sum_src·n_dst + sum_dst·n_src)
    *
    * with cos in micro (the 6-dp cosine is exactly integral in micro) and
    * sum/n the neighborhood cosine sum and size. Pairs whose denominator
    * is not positive (average neighborhood cosine ≤ 0 — unrelated spaces)
    * are dropped: the margin is meaningless there.
    *
    * Shape at scale: candidates here come from [[bruteForceTopK]] both ways
    * (queries broadcast, one top-k window each); the margin stage itself is
    * TWO bounded-key aggregates (one row per query) + two equi-joins on the
    * pair list. At corpus scale swap the kNN source for [[graft.sim.Pq.ivfpqTopK]]
    * or [[rhpNearDupPairs]] — the scoring is agnostic to where the
    * neighbor lists came from.
    */
  def bitextMine(src: DataFrame, dst: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    def micro(df: DataFrame) =
      df.withColumn("cos_micro", round(col("cos") * 1e6).cast("long"))
    val fwd = micro(bruteForceTopK(dst, src, idCol, vecCol, k))
    val bwd = micro(bruteForceTopK(src, dst, idCol, vecCol, k))
    val sumS = fwd.groupBy(col("query_id").as("src_id"))
      .agg(sum("cos_micro").as("__sum_src"), count(lit(1)).as("__n_src"))
    val sumD = bwd.groupBy(col("query_id").as("dst_id"))
      .agg(sum("cos_micro").as("__sum_dst"), count(lit(1)).as("__n_dst"))
    val pairs = fwd.select(col("query_id").as("src_id"),
        col("neighbor_id").as("dst_id"), col("cos_micro"))
      .join(sumS, "src_id").join(sumD, "dst_id")
      .filter(col("__sum_src") * col("__n_dst") +
        col("__sum_dst") * col("__n_src") > 0)
      .withColumn("margin_milli",
        expr("(2000 * cos_micro * __n_src * __n_dst) div " +
          "(__sum_src * __n_dst + __sum_dst * __n_src)"))
    val w = Window.partitionBy("src_id")
      .orderBy(col("margin_milli").desc, col("dst_id"))
    pairs.withColumn("is_best", row_number().over(w) === 1)
      .select("src_id", "dst_id", "cos_micro", "margin_milli", "is_best")
  }

  /** Pure twin of [[bitextMine]] over in-memory vectors. */
  def bitextMinePure(src: Seq[(Long, Seq[Float])], dst: Seq[(Long, Seq[Float])],
      k: Int): Seq[(Long, Long, Long, Long, Boolean)] = {
    def cosM(a: Seq[Float], b: Seq[Float]): Long = {
      val c = BigDecimal(cosine(a, b)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      (c * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    def topk(qs: Seq[(Long, Seq[Float])], cs: Seq[(Long, Seq[Float])]) =
      qs.map { case (qid, qv) =>
        qid -> cs.filter(_._1 != qid).map { case (cid, cv) => (cid, cosM(qv, cv)) }
          .sortBy { case (cid, c) => (-c, cid) }.take(k)
      }.toMap
    val fwd = topk(src, dst)
    val bwd = topk(dst, src)
    // Spark `div` and DuckDB `//` both truncate toward zero = Long./
    val rows = for {
      (sid, nbrs) <- fwd.toSeq
      sumS = nbrs.map(_._2).sum; nS = nbrs.size.toLong
      (did, c) <- nbrs
      sumD = bwd(did).map(_._2).sum; nD = bwd(did).size.toLong
      denom = sumS * nD + sumD * nS
      if denom > 0
    } yield (sid, did, c, 2000L * c * nS * nD / denom)
    rows.groupBy(_._1).toSeq.flatMap { case (_, ps) =>
      val best = ps.sortBy { case (_, did, _, m) => (-m, did) }.head
      ps.map(p => (p._1, p._2, p._3, p._4, p == best))
    }
  }
}
