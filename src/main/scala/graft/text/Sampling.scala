package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling — the data-mixing step that reweights a
  * training corpus by source / language / quality bucket. Two forms, the
  * exact-baseline + scale-path pairing used throughout this engine:
  *
  *  - [[stratified]] (exact baseline): each stratum keeps its top
  *    ceil(frac × |stratum|) docs ranked by md5(id) — reproducible,
  *    engine-agnostic pseudo-random order (the same RNG-free idiom the
  *    IVF trainer and bench corpora use), so reruns and oracles agree
  *    row-for-row; `df.sample()`'s seeded RNG is partition-layout-
  *    dependent and would not survive a repartition. The per-stratum
  *    rank is a window over the stratum key, which sorts each stratum
  *    inside one task — right when strata are numerous/bounded (sources,
  *    quality buckets), wrong for a handful of corpus-sized strata.
  *
  *  - [[hashThreshold]] (scale path): keep a row iff its 60-bit md5
  *    falls below frac·2⁶⁰ — a pure filter on the scan, ZERO shuffles at
  *    any scale and still deterministic. Sample size is binomial around
  *    frac·n instead of exact; per-stratum rates compose by filtering
  *    each stratum with its own threshold.
  */
object Sampling {

  /** Output: the kept rows of `df` plus (sample_rank, stratum_n) —
    * sample_rank is the doc's 1-based md5 position within its stratum. */
  def stratified(df: DataFrame, idCol: String, stratumCol: String,
      frac: Double): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac must be in (0,1], got $frac")
    val ord = Window.partitionBy(stratumCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val all = Window.partitionBy(stratumCol)
    df.withColumn("sample_rank", row_number().over(ord))
      .withColumn("stratum_n", count(lit(1)).over(all))
      .filter(col("sample_rank") <=
        ceil(col("stratum_n") * lit(frac)).cast("long"))
  }

  /** Scale path: deterministic hash-threshold sample (see object doc).
    * Keeps rows whose 60-bit md5(id) < frac·2⁶⁰; no shuffle, no window —
    * the plan is scan + filter regardless of corpus size. */
  def hashThreshold(df: DataFrame, idCol: String, frac: Double): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac must be in (0,1], got $frac")
    // frac·2^60 in exact integer arithmetic (2^60 fits double only for
    // dyadic fracs; go through BigDecimal so any frac cuts exactly)
    val cut = (BigDecimal(frac) * BigDecimal(1L << 60)).toLong
    df.filter(TextAnalysis.hash60(col(idCol).cast("string")) < lit(cut))
  }

  /** Per-domain cap — the C4/CCNet-style "at most `cap` pages per host"
    * rebalancing step. Keeps the `cap` docs of each domain with the
    * smallest md5(id) (ties by id), i.e. a deterministic uniform draw per
    * domain; domains at or under the cap survive whole. Output: the kept
    * rows plus (domain_rank, domain_n).
    *
    * Exact baseline: ONE shuffle on the domain key, but the row_number
    * window sorts each domain inside a single task — right when no domain
    * is huge, wrong for a 10M-page mega-domain (that task becomes the
    * straggler). [[domainCapScalable]] is the skew-safe variant. */
  def domainCap(df: DataFrame, idCol: String, domainCol: String,
      cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val ord = Window.partitionBy(domainCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val all = Window.partitionBy(domainCol)
    df.withColumn("domain_rank", row_number().over(ord))
      .withColumn("domain_n", count(lit(1)).over(all))
      .filter(col("domain_rank") <= cap)
  }

  /** Skew-safe per-domain cap: a two-phase plan whose window never sorts
    * more than ~`cap`·`slack` rows per domain, no matter how large the
    * domain is.
    *
    *  1. domain sizes n_d (partial-agg shuffle, tiny output);
    *  2. hash prefilter: domains with n_d ≤ cap pass whole; larger ones
    *     keep a row iff hash32(id) < (cap·slack·2³²) div n_d — the
    *     per-domain cut is a 64-bit floor division (cap·slack ≤ 2³⁰ keeps
    *     the shift in int64), EXACT at any domain size — no hash·n_d
    *     product that would overflow past n_d = 2³¹ — so any engine
    *     replays it bit-for-bit. Survivors per mega-domain ≈ Binomial
    *     (n_d, cut/2³²), mean ≲ cap·slack;
    *  3. exact md5-rank window over the survivors (now bounded per
    *     domain), keep rank ≤ cap.
    *
    * Same selection rule as [[domainCap]] restricted to prefilter
    * survivors — deterministic and oracle-replayable, but NOT always
    * identical to the exact baseline: a mega-domain's kept set is the
    * cap-smallest md5s *among survivors*. With the default slack=4 the
    * prefilter under-fills a domain (fewer than `cap` survivors) with
    * probability ≈ P[Bin(n_d, 4cap/n_d) < cap] < e^(-1.2·cap) — already
    * < 10⁻⁵ at cap=10 — and mean survivor volume is 4·cap rows per
    * mega-domain into the sort. Output schema matches [[domainCap]]
    * (domain_n is the ORIGINAL domain size, not the survivor count). */
  def domainCapScalable(df: DataFrame, idCol: String, domainCol: String,
      cap: Int, slack: Int = 4): DataFrame = {
    require(cap > 0 && slack > 0, s"cap/slack must be positive, got $cap/$slack")
    require(cap.toLong * slack <= (1L << 30), "cap*slack must be <= 2^30 so the shift fits int64")
    val sizes = df.groupBy(domainCol).agg(count(lit(1)).as("domain_n"))
    val pre = df.join(sizes, Seq(domainCol))
      .filter(col("domain_n") <= cap ||
        TextAnalysis.hash32(col(idCol).cast("string")) <
          expr(s"${cap.toLong * slack * (1L << 32)}L div domain_n"))
    val ord = Window.partitionBy(domainCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    pre.withColumn("domain_rank", row_number().over(ord))
      .filter(col("domain_rank") <= cap)
  }

  /** Mergeable per-group reservoir: the k smallest (md5(id), id) pairs of
    * a group as a typed Aggregator with a BOUNDED sorted buffer — the
    * exact-answer scale path for the per-domain cap. Selection rule is
    * identical to [[domainCap]] (deterministic uniform draw by md5 rank),
    * but the execution shape is a real partial aggregation instead of a
    * window sort: map-side combine caps every task's contribution at k
    * pairs per group it saw, the shuffle carries sketch buffers (≤ k
    * entries each), and the reduce side merges sorted runs — so a 10M-row
    * mega-domain costs O(k) state and never lands in one sort task. That
    * removes [[domainCapScalable]]'s under-fill probability entirely:
    * same plan profile, exact answer.
    *
    * Ids must be integral (the engine's doc_id convention): ties on md5
    * break by NUMERIC id, matching `ORDER BY md5(id::VARCHAR), id`. */
  class ReservoirAggregator(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        (String, Long), Seq[(String, Long)], Seq[(String, Long)]] {
    require(k >= 1, s"k must be >= 1: $k")
    private def lt(a: (String, Long), b: (String, Long)): Boolean =
      a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

    override def zero: Seq[(String, Long)] = Vector.empty

    override def reduce(buf: Seq[(String, Long)], x: (String, Long))
        : Seq[(String, Long)] =
      if (buf.length == k && !lt(x, buf.last)) buf
      else {
        val ins = buf.indexWhere(e => lt(x, e)) match {
          case -1 => buf.length
          case i  => i
        }
        val grown = (buf.take(ins) :+ x) ++ buf.drop(ins)
        if (grown.length > k) grown.take(k) else grown
      }

    override def merge(a: Seq[(String, Long)], b: Seq[(String, Long)])
        : Seq[(String, Long)] = {
      // merge two sorted runs, keep the k smallest
      val out = Vector.newBuilder[(String, Long)]
      var i = 0; var j = 0; var n = 0
      val cap = math.min(k, a.length + b.length)
      while (n < cap) {
        if (j >= b.length || (i < a.length && !lt(b(j), a(i)))) {
          out += a(i); i += 1
        } else { out += b(j); j += 1 }
        n += 1
      }
      out.result()
    }

    override def finish(buf: Seq[(String, Long)]): Seq[(String, Long)] = buf

    override def bufferEncoder
        : org.apache.spark.sql.Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Seq[(String, Long)]]()
    override def outputEncoder
        : org.apache.spark.sql.Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** Per-group cap via [[ReservoirAggregator]] — output matches
    * [[domainCap]]'s kept set exactly: groupCol, idCol, res_rank (1-based
    * md5 rank), group_n (ORIGINAL group size). One partial-agg shuffle of
    * bounded buffers; no window, no per-group sort. `idCol` must be
    * integral. */
  def groupReservoir(df: DataFrame, idCol: String, groupCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val agg = udaf(new ReservoirAggregator(k),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[(String, Long)]())
    df.groupBy(col(groupCol))
      .agg(
        agg(md5(col(idCol).cast("string")), col(idCol).cast("long"))
          .as("__kept"),
        count(lit(1)).as("group_n"))
      .select(col(groupCol), col("group_n"),
        posexplode(col("__kept")).as(Seq("__pos", "__e")))
      .select(col(groupCol), col("__e._2").as(idCol),
        (col("__pos") + 1).cast("long").as("res_rank"), col("group_n"))
  }

  /** Source-mixture resampling — down-sample each stratum to a target doc
    * count so the output approximates a prescribed mixture (the domain-
    * reweighting step of a pretraining recipe: "this corpus should be X
    * docs of web, Y of news, Z of code"). Deterministic, RNG-free, and the
    * corpus itself NEVER shuffles.
    *
    * `targets` maps stratum value → desired output doc count. A stratum at
    * or under its target survives whole; a larger one keeps a row iff
    * hash32(id) < (target·2³²) div n_s — exact integer math at ANY stratum
    * size (the per-stratum cut is a 64-bit floor division, never
    * hash·n_s), so any engine replays the kept set bit-for-bit. Kept size
    * is Binomial(n_s, cut/2³²) with mean ≤ target (the floor biases a few
    * docs low, never high). Strata absent from `targets` are dropped —
    * weights define the output universe, same as a mixture config file.
    *
    * Plan: one tiny per-stratum count agg joined to the literal targets
    * relation (both broadcast — rows = |strata|), then a pure filter on
    * the scan. Output: kept rows + (stratum_n, stratum_target). */
  def mixtureSample(df: DataFrame, idCol: String, stratumCol: String,
      targets: Map[String, Long]): DataFrame = {
    require(targets.nonEmpty, "targets must be non-empty")
    require(targets.values.forall(t => t > 0 && t <= (1L << 30)),
      s"targets must be in (0, 2^30] so target<<32 fits int64")
    val spark = df.sparkSession
    import spark.implicits._
    val tgt = targets.toSeq.toDF(stratumCol, "stratum_target")
    val sizes = df.groupBy(stratumCol).agg(count(lit(1)).as("stratum_n"))
      .join(tgt, Seq(stratumCol)) // inner join: untargeted strata drop out
    df.join(broadcast(sizes), Seq(stratumCol))
      .filter(col("stratum_n") <= col("stratum_target") ||
        TextAnalysis.hash32(col(idCol).cast("string")) <
          expr(s"shiftleft(stratum_target, 32) div stratum_n"))
  }

  /** Pure twin of [[mixtureSample]]'s keep rule: is `id` kept in a stratum
    * of size `n` with target `target`? */
  /** Weight-proportional priority sampling WITHOUT randomness (Duffield,
    * Lund & Thorup 2007): each row gets priority q = w·2⁶⁰/(hash60(id)+1)
    * — the deterministic stand-in for w/uniform(0,1] — and the k highest
    * priorities are kept. Alongside each kept row the estimator weight
    * ŵ = max(w, τ) is emitted, with τ the (k+1)-th priority: summing ŵ
    * over any subset of the sample unbiasedly estimates that subset's
    * total weight in the corpus — the standard "sample few, answer
    * sum-queries about many" primitive (here: sample ∝ quality/token
    * weight and still report corpus-level token totals).
    *
    * Determinism: the hash is md5-derived, priorities are single-rounding
    * doubles computed in one fixed op order, ties break on id — reruns,
    * repartitions, and the SQL oracle agree row-for-row. Plan: priorities
    * are narrow; the top-(k+1) cut is orderBy+limit, which Spark executes
    * as distributed TakeOrderedAndProject (per-partition heaps, no global
    * sort); the τ attach is a window over ≤ k+1 rows.
    *
    * Output: row columns + (priority, est_weight), est rounded to 6dp. */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    import org.apache.spark.sql.expressions.Window
    val M = (1L << 60).toDouble // 2^60 is exactly representable
    val q = (col(weightCol).cast("double") * M) /
      (TextAnalysis.hash60(col(idCol).cast("string")) + 1L).cast("double")
    val top = df.withColumn("priority", q)
      .orderBy(col("priority").desc, col(idCol))
      .limit(k + 1)
    val all = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    top
      .withColumn("__n", count(lit(1)).over(all))
      .withColumn("__tau",
        when(col("__n") === k + 1, min(col("priority")).over(all)).otherwise(0.0))
      .withColumn("__rk", row_number().over(
        Window.partitionBy().orderBy(col("priority").desc, col(idCol))))
      .filter(col("__rk") <= k)
      .withColumn("est_weight",
        round(greatest(col(weightCol).cast("double"), col("__tau")), 6))
      .drop("__n", "__tau", "__rk")
  }

  /** Pure twin of [[prioritySample]]: (id, priority, estWeight) rows. */
  def prioritySamplePure(rows: Seq[(Long, Long)], k: Int): Seq[(Long, Double, Double)] = {
    val M = (1L << 60).toDouble
    val qs = rows.map { case (id, w) =>
      (id, w, (w.toDouble * M) / (TextAnalysis.hash60(id.toString) + 1L).toDouble)
    }.sortBy { case (id, _, q) => (-q, id) }
    val tau = if (qs.length >= k + 1) qs(k)._3 else 0.0
    qs.take(k).map { case (id, w, q) =>
      (id, q, BigDecimal(math.max(w.toDouble, tau))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  def mixtureSamplePure(id: Long, n: Long, target: Long): Boolean =
    n <= target || TextAnalysis.hash32(id.toString) < ((target << 32) / n)

  /** Pure twin of [[hashThreshold]]: would this id be kept? */
  def hashThresholdPure(id: Long, frac: Double): Boolean = {
    val cut = (BigDecimal(frac) * BigDecimal(1L << 60)).toLong
    TextAnalysis.hash60(id.toString) < cut
  }

  /** Token-budget corpus selection: keep the best-scoring docs until
    * their cumulative cost (tokens) fills `budget` — the "spend my 500B
    * training tokens on the highest-quality slice" cut, which needs an
    * EXACT global running sum in (score desc, id) order, not a top-k.
    *
    * A bare `sum() OVER (ORDER BY ...)` with no partition key moves the
    * whole corpus into ONE task — the single-partition-window anti-pattern.
    * This is the distributed prefix-sum instead:
    *   1. range-repartition + sort on (score desc, id) — one range
    *      exchange, the same cost as a global orderBy;
    *   2. per-partition cost totals → the DRIVER prefix-sums one row per
    *      partition (bounded by the partition count, like the IVF
    *      centroid table — never corpus-sized);
    *   3. a narrow per-partition pass (mapPartitionsWithIndex — the index
    *      IS the offset key) adds each partition's offset to its local
    *      running sum.
    * The global cumsum is exact wherever the sampled range bounds land,
    * because (score desc, id) is a total order (`idCol` must be unique).
    *
    * Output: (id, score, cost, cum) for kept rows — cum ≤ budget, in the
    * selection's own order. Scores/costs are integers (callers with
    * real-valued scores pre-scale to milli, the engine-wide idiom). */
  def budgetSelect(df: DataFrame, idCol: String, scoreCol: String,
      costCol: String, budget: Long, parts: Int = 0): DataFrame = {
    require(budget >= 0, s"budget must be >= 0: $budget")
    val spark = df.sparkSession
    val p = if (parts > 0) parts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val src = df.select(col(idCol).cast("string").as("id"),
      col(scoreCol).cast("long").as("score"),
      col(costCol).cast("long").as("cost"))
    val ranged = graft.io.Persisted.track(
      src.repartitionByRange(p, col("score").desc, col("id").asc)
        .sortWithinPartitions(col("score").desc, col("id").asc)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // bounded driver state: ONE (pid, total) row per partition
    val totals = ranged
      .select(org.apache.spark.sql.functions.spark_partition_id().as("pid"),
        col("cost"))
      .groupBy("pid").agg(sum("cost").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until p).scanLeft(0L)((acc, i) =>
      acc + totals.getOrElse(i, 0L)).toArray
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cost",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cum",
        org.apache.spark.sql.types.LongType, nullable = false)))
    // RDD mapPartitionsWithIndex is FORCED here (the engine's one genuine
    // per-partition-imperative case): the prefix-sum key must be the
    // PARTITION index. TaskContext.getPartitionId/spark_partition_id are
    // task-scoped — a downstream coalesce(1) packs many partitions into
    // one task, resetting every offset to offsets(0) (caught by the sink
    // write path: max cum collapsed to one partition's local sum).
    val outRdd = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var cum = offsets(pid)
      it.map { r =>
        cum += r.getLong(2)
        org.apache.spark.sql.Row(r.getString(0), r.getLong(1), r.getLong(2),
          cum)
      }
    }
    spark.createDataFrame(outRdd, schema)
      .filter(col("cum") <= budget)
      .withColumnRenamed("id", idCol)
  }

  /** Deterministic train/val/test assignment: split on md5 buckets of the
    * id — `pmod(hash60(id), 1000)` against cumulative permille cuts, so
    * membership is a pure function of the id (stable across reruns,
    * re-partitions, and corpus growth — a doc NEVER migrates between
    * splits when new data arrives, the property a time-based or
    * row-number split lacks). Zero shuffles. */
  def datasetSplit(df: DataFrame, idCol: String,
      trainPermille: Int = 800, valPermille: Int = 100): DataFrame = {
    require(trainPermille > 0 && valPermille > 0 &&
      trainPermille + valPermille < 1000,
      s"invalid cuts: train=$trainPermille val=$valPermille")
    val bucket = pmod(TextAnalysis.hash60(col(idCol).cast("string")),
      lit(1000L))
    df.withColumn("split",
      when(bucket < trainPermille, "train")
        .when(bucket < trainPermille + valPermille, "val")
        .otherwise("test"))
  }

  /** Pure twin of [[datasetSplit]]. */
  def datasetSplitPure(id: String, trainPermille: Int = 800,
      valPermille: Int = 100): String = {
    val b = java.lang.Math.floorMod(TextAnalysis.hash60(id), 1000L)
    if (b < trainPermille) "train"
    else if (b < trainPermille + valPermille) "val"
    else "test"
  }

  /** Pure twin of [[budgetSelect]]: (id, score, cost) rows → kept
    * (id, score, cost, cum). */
  def budgetSelectPure(rows: Seq[(String, Long, Long)], budget: Long)
      : Seq[(String, Long, Long, Long)] = {
    var cum = 0L
    rows.sortBy { case (id, sc, _) => (-sc, id) }.flatMap { case (id, sc, c) =>
      cum += c
      if (cum <= budget) Some((id, sc, c, cum)) else None
    }
  }

  /** Pure twin for spec cross-checking: ids of one stratum → kept ids in
    * md5-rank order. */
  def stratifiedPure(ids: Seq[Long], frac: Double): Seq[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(id: Long): String =
      md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val keep = math.ceil(ids.size * frac).toLong
    ids.sortBy(id => (hex(id), id)).take(keep.toInt)
  }

  /** Water-filling domain budget allocation — the source-balancing step of
    * corpus mixing (the C4/Llama "cap the mega-domains, keep the tail
    * whole" rule, computed EXACTLY): given per-domain token counts and a
    * global budget B, find the largest integer level L with
    * Σ min(tokens_d, L) ≤ B and allocate min(tokens_d, L) to each domain.
    * Domains under the level keep everything; only the giants are cut, and
    * all giants are cut to the SAME level — the fairness property a
    * proportional scale-down lacks.
    *
    * Shape at scale: the input is the already-aggregated domain table
    * (≤ millions of rows, never the corpus). Global (tokens asc, key)
    * order via ONE range exchange; per-partition totals prefix-summed on
    * the DRIVER (one row per partition — the [[budgetSelect]] machinery);
    * the level comes from the first rank where prefix + remaining·tokens
    * crosses B (one filter + a 1-row TakeOrdered); allocation is a narrow
    * projection. No single-partition window anywhere.
    */
  def waterFill(domains: DataFrame, keyCol: String, tokensCol: String,
      budget: Long, parts: Int = 0): DataFrame = {
    require(budget >= 0, s"budget must be >= 0: $budget")
    val spark = domains.sparkSession
    val p = if (parts > 0) parts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val src = domains.select(col(keyCol).cast("string").as("key"),
      col(tokensCol).cast("long").as("tokens"))
    val ranged = graft.io.Persisted.track(
      src.repartitionByRange(p, col("tokens").asc, col("key").asc)
        .sortWithinPartitions(col("tokens").asc, col("key").asc)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val partStats = ranged
      .select(org.apache.spark.sql.functions.spark_partition_id().as("pid"),
        col("tokens"))
      .groupBy("pid").agg(count(lit(1)).as("c"), sum("tokens").as("t"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val cntOff = (0 until p).scanLeft(0L)((acc, i) =>
      acc + partStats.get(i).map(_._1).getOrElse(0L)).toArray
    val sumOff = (0 until p).scanLeft(0L)((acc, i) =>
      acc + partStats.get(i).map(_._2).getOrElse(0L)).toArray
    val n = cntOff(p)
    val total = sumOff(p)
    val allocCol: org.apache.spark.sql.Column =
      if (total <= budget || n == 0) col("tokens")
      else {
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("rk",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("pre",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("tk",
            org.apache.spark.sql.types.LongType, nullable = false)))
        // partition INDEX is the offset key (see budgetSelect's coalesce
        // trap note)
        val ranksRdd = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
          var rk = cntOff(pid)
          var pre = sumOff(pid)
          it.map { r =>
            val row = org.apache.spark.sql.Row(rk, pre, r.getLong(1))
            rk += 1L
            pre += r.getLong(1)
            row
          }
        }
        val crossing = spark.createDataFrame(ranksRdd, schema)
          .filter(col("pre") + (lit(n) - col("rk")) * col("tk") > budget)
          .orderBy(col("rk")).limit(1)
          .select(col("rk"), col("pre")).collect()(0)
        val level = (budget - crossing.getLong(1)) / (n - crossing.getLong(0))
        least(col("tokens"), lit(level))
      }
    ranged.select(col("key").as(keyCol), col("tokens"),
      allocCol.as("alloc"))
      .withColumn("capped", col("alloc") < col("tokens"))
  }

  /** Pure twin of [[waterFill]]: (key, tokens) → (key, tokens, alloc). */
  def waterFillPure(rows: Seq[(String, Long)], budget: Long)
      : Seq[(String, Long, Long)] = {
    require(budget >= 0)
    val sorted = rows.sortBy { case (k, t) => (t, k) }
    val total = sorted.map(_._2).sum
    if (total <= budget) return rows.map { case (k, t) => (k, t, t) }
    val n = sorted.size.toLong
    var pre = 0L
    var level = -1L
    var i = 0L
    val it = sorted.iterator
    while (level < 0 && it.hasNext) {
      val (_, t) = it.next()
      if (pre + (n - i) * t > budget) level = (budget - pre) / (n - i)
      else { pre += t; i += 1 }
    }
    rows.map { case (k, t) => (k, t, math.min(t, level)) }
  }

  /** Square-root temperature sampling allocation (α = 0.5) — the standard
    * multilingual/multi-source rebalancing (mBERT/XLM-R exponent-smoothed
    * sampling): each source's budget share is proportional to √n rather
    * than n, boosting tail sources without the head drowning them.
    * α = 0.5 is the one temperature that stays integer-exact
    * (floor(IEEE sqrt) replays bit-identically; other exponents need an
    * exp/ln round-trip and are out of scope by design). Allocation =
    * budget · w div Σw with ONE truncated division per source, so
    * Σ alloc ≤ budget always. Contrast: [[waterFill]] caps heads at a
    * common level; temperature RESHAPES every share.
    *
    * Shape at scale: ONE partial-agg source groupBy + a broadcast 1-row
    * total — the corpus shuffles once, nothing is collected. */
  def sqrtTemperatureAlloc(df: DataFrame, domainCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val counts = df.groupBy(col(domainCol).cast("string").as("domain"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("weight",
        expr("cast(floor(sqrt(cast(n_docs as double))) as bigint)"))
    val tot = counts.agg(sum("weight").as("__tw"))
    counts.crossJoin(broadcast(tot))
      .withColumn("alloc", expr(s"${budget}L * weight div __tw"))
      .select("domain", "n_docs", "weight", "alloc")
  }

  /** Pure twin of [[sqrtTemperatureAlloc]]. */
  def sqrtTemperatureAllocPure(counts: Map[String, Long], budget: Long)
      : Map[String, (Long, Long, Long)] = {
    val w = counts.view.mapValues(n =>
      math.floor(math.sqrt(n.toDouble)).toLong).toMap
    val tw = w.values.sum
    counts.map { case (d, n) => d -> ((n, w(d), budget * w(d) / tw)) }
  }
}
