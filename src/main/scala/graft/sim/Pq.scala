package graft.sim

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StructField, StructType}

import scala.collection.mutable

/** Product quantization (PQ) — the compression half of a 100 TB ANN index
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011). The vector is split into `m` subspaces; each subspace gets
  * its own `ksub`-centroid codebook; a vector is stored as `m` small codes
  * (64 dims × 4 bytes → m bytes — a 32× shrink at m=8), and query-to-
  * candidate distance is approximated by table lookups (ADC): per query,
  * precompute the squared-L2 distance from each query subvector to every
  * codebook centroid, then a candidate's distance is the sum of `m` table
  * entries selected by its codes.
  *
  * Everything is deterministic and integer-exact where it matters:
  *  - training is RNG-free — seeds are the md5-ordered first `ksub`
  *    vectors' subvectors, refined by Lloyd steps with 6dp-rounded means
  *    (the same idiom as [[Similarity.ivfCentroids]], so the oracle replays
  *    training bit-for-bit);
  *  - assignment and ADC compare distances in integer MICRO units
  *    (`round(d·10⁶)` as int64), so sums accumulate exactly in any engine
  *    and in any partition order — no float-associativity hazard;
  *  - ties break on the smaller code / neighbor id.
  *
  * Scale shape: codebooks are driver/broadcast data by design (m·ksub·
  * (dim/m) doubles). [[encodeRows]] is a typed mapPartitions — NARROW, the
  * production path for indexing the corpus; the corpus never carries raw
  * vectors past this point. [[adcTopK]] keeps a bounded per-query heap per
  * partition (nPartitions·nQueries·k rows ever shuffle, never a
  * corpus-sized score relation) and finishes with one small window.
  */
object Pq {

  // -------------------------------------------------------- pure twins ----

  /** Squared L2 between `vec(off..off+len)` and `cent`, index order. */
  def sqSub(vec: Seq[Float], cent: Array[Double], off: Int): Double = {
    var s = 0.0
    var j = 0
    while (j < cent.length) {
      val d = vec(off + j).toDouble - cent(j)
      s += d * d
      j += 1
    }
    s
  }

  /** Distance in integer micro units — Spark `round(x·1e6)` parity. */
  def micro(d: Double): Long =
    BigDecimal(d * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  // ------------------------------------------------------ column twins ----

  /** Micro-unit squared L2 of two equal-length array columns. */
  def sqMicroCol(a: Column, b: Column): Column =
    round(aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") - y.cast("double")) *
        (x.cast("double") - y.cast("double"))),
      lit(0.0), (s, v) => s + v) * 1e6).cast("long")

  /** Exploded (idCol, __sub, __sv) — one row per subspace slice. */
  def subvectors(df: DataFrame, idCol: String, vecCol: String, m: Int,
      ds: Int): DataFrame =
    df.select(col(idCol),
      posexplode(array((0 until m).map(s =>
        slice(col(vecCol), s * ds + 1, ds)): _*)).as(Seq("__sub", "__sv")))

  def bookDf(spark: org.apache.spark.sql.SparkSession,
      books: Array[(Int, Int, Array[Double])]): DataFrame = {
    import spark.implicits._
    books.toSeq.map { case (s, c, v) => (s, c, v.toSeq) }
      .toDF("__sub", "__code", "__c")
  }

  /** Relational per-subspace argmin assignment: (idCol, __sub, __sv,
    * __code) — the oracle-replayable twin of the typed encode. */
  def assignDf(df: DataFrame, idCol: String, vecCol: String,
      books: Array[(Int, Int, Array[Double])], m: Int, ds: Int): DataFrame = {
    val sv = subvectors(df, idCol, vecCol, m, ds)
    val scored = sv.join(broadcast(bookDf(df.sparkSession, books)), "__sub")
      .withColumn("__dm", sqMicroCol(col("__sv"), col("__c")))
    val w = Window.partitionBy(col(idCol), col("__sub"))
      .orderBy(col("__dm"), col("__code"))
    scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col(idCol), col("__sub"), col("__sv"), col("__code"))
  }

  // ---------------------------------------------------------- training ----

  /** Train the `m` codebooks: md5-ordered seed vectors sliced per subspace,
    * `iters` Lloyd steps (micro-unit argmin, 6dp-rounded means). A cell
    * that loses all members is dropped, keeping its seed index — standard
    * Lloyd; codes always reference surviving cells. Collects only
    * m·ksub·ds doubles per step (codebooks are driver data by design). */
  def codebooks(df: DataFrame, idCol: String, vecCol: String, m: Int,
      ksub: Int, iters: Int = 1): Array[(Int, Int, Array[Double])] = {
    // float→double cast is exact, so training float input through the
    // double path is bit-identical; it also admits array<double> input
    // (the IVF-PQ residual relation) through the same code
    val base = df.select(col(idCol).as("__id"),
        col(vecCol).cast("array<double>").as("__v"))
      .filter(col("__v").isNotNull)
    val seedVecs = base.withColumn("__h", md5(col("__id").cast("string")))
      .orderBy(col("__h"), col("__id")).limit(ksub)
      .select("__v").collect().map(_.getSeq[Double](0).toArray)
    val dim = seedVecs.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val ds = dim / m
    val seeds = (for {
      s <- 0 until m
      (v, c) <- seedVecs.zipWithIndex
    } yield (s, c, v.slice(s * ds, (s + 1) * ds).map(_.toDouble))).toArray
    (1 to iters).foldLeft(seeds) { (books, _) =>
      assignDf(base, "__id", "__v", books, m, ds)
        .select(col("__sub"), col("__code"),
          posexplode(col("__sv")).as(Seq("__pos", "__x")))
        .groupBy("__sub", "__code", "__pos")
        .agg(round(avg(col("__x").cast("double")), 6).as("__m"))
        .groupBy("__sub", "__code")
        .agg(array_sort(collect_list(struct(col("__pos"), col("__m"))))
          .as("__ms"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1),
          r.getSeq[Row](2).map(_.getDouble(1)).toArray))
        .sortBy(t => (t._1, t._2))
    }
  }

  // ------------------------------------------------------------ encode ----

  private def bySub(books: Array[(Int, Int, Array[Double])])
      : Array[Array[(Int, Array[Double])]] = {
    val m = books.map(_._1).max + 1
    (0 until m).map(s =>
      books.filter(_._1 == s).map(t => (t._2, t._3)).sortBy(_._1)).toArray
  }

  /** Typed scan-side encode: (idCol, codes array<int>) — per-row argmin
    * loops in the task closure, no row expansion, ZERO shuffles. Identical
    * semantics to [[assignDf]] (micro-unit distance, smaller-code
    * tie-break), asserted in PqSpec. */
  def encodeRows(df: DataFrame, idCol: String, vecCol: String,
      books: Array[(Int, Int, Array[Double])]): DataFrame = {
    val sub = bySub(books)
    val m = sub.length
    val ds = books.head._3.length
    val schema = StructType(Seq(df.schema(idCol),
      StructField("codes", ArrayType(IntegerType, containsNull = false),
        nullable = false)))
    df.select(col(idCol), col(vecCol)).filter(col(vecCol).isNotNull)
      .mapPartitions { it =>
        it.map { row =>
          val vec = row.getSeq[Float](1)
          val codes = new Array[Int](m)
          var s = 0
          while (s < m) {
            var bestCode = -1
            var bestD = Long.MaxValue
            sub(s).foreach { case (code, cent) =>
              val d = micro(sqSub(vec, cent, s * ds))
              if (d < bestD || (d == bestD && code < bestCode)) {
                bestD = d; bestCode = code
              }
            }
            codes(s) = bestCode
            s += 1
          }
          Row(row.get(0), codes.toSeq)
        }
      }(Encoders.row(schema))
  }

  /** Relational encode twin: (idCol, codes) via [[assignDf]]. */
  def encodeDf(df: DataFrame, idCol: String, vecCol: String,
      books: Array[(Int, Int, Array[Double])], m: Int, ds: Int): DataFrame =
    assignDf(df, idCol, vecCol, books, m, ds)
      .groupBy(col(idCol))
      .agg(transform(array_sort(collect_list(struct(col("__sub"),
        col("__code")))), e => e.getField("__code")).as("codes"))

  // ----------------------------------------------------------- ADC --------

  /** Asymmetric-distance top-k: train on the candidate corpus, encode
    * candidates with the typed scan, score each (query, candidate) as the
    * exact int64 sum of the query's per-(subspace, code) micro-distance
    * table, keep a bounded per-query heap of the k best per partition
    * (ties → smaller neighbor id), finish with one window over
    * nPartitions·nQueries·k rows. The query relation is driver-sized by
    * contract (as in [[Similarity.knnClassify]]); ids must be integral.
    * Self-matches are excluded. Output: (query_id, neighbor_id, adist,
    * rank). */
  def adcTopK(candidates: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int, ksub: Int = 8, iters: Int = 1)
      : DataFrame = {
    val books = codebooks(candidates, idCol, vecCol, m, ksub, iters)
    val sub = bySub(books)
    val ds = books.head._3.length
    val qRows = queries.select(col(idCol).cast("long"), col(vecCol))
      .filter(col(vecCol).isNotNull).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    // per query, per subspace: code -> micro distance
    val dtab: Array[(Long, Array[Map[Int, Long]])] = qRows.map { case (qid, qv) =>
      (qid, sub.zipWithIndex.map { case (cells, s) =>
        cells.map { case (code, cent) =>
          code -> micro(sqSub(qv, cent, s * ds))
        }.toMap
      })
    }
    val schema = StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("neighbor_id", LongType, nullable = false),
      StructField("adist", LongType, nullable = false)))
    val perPart = encodeRows(
      candidates.select(col(idCol).cast("long").as(idCol), col(vecCol)),
      idCol, vecCol, books)
      .mapPartitions { it =>
        // worst-first heaps: largest (adist, id) on top, capped at k
        val heaps = dtab.map { case (qid, _) =>
          qid -> mutable.PriorityQueue.empty[(Long, Long)](
            Ordering.Tuple2[Long, Long])
        }.toMap
        it.foreach { row =>
          val nid = row.getLong(0)
          val codes = row.getSeq[Int](1)
          dtab.foreach { case (qid, tabs) =>
            if (nid != qid) {
              var d = 0L
              var s = 0
              while (s < tabs.length) { d += tabs(s)(codes(s)); s += 1 }
              val h = heaps(qid)
              if (h.size < k) h.enqueue((d, nid))
              else if (Ordering.Tuple2[Long, Long].lt((d, nid), h.head)) {
                h.dequeue(); h.enqueue((d, nid))
              }
            }
          }
        }
        heaps.iterator.flatMap { case (qid, h) =>
          h.iterator.map { case (d, nid) => Row(qid, nid, d) }
        }
      }(Encoders.row(schema))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adist"), col("neighbor_id"))
    perPart.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("adist"),
        col("rank").cast("long").as("rank"))
  }

  // ------------------------------------------------ int8 scalar quant -----
  /** Scalar int8 quantization — PQ's simpler sibling and the storage
    * format of choice when 4× compression with near-exact recall beats
    * PQ's 32× with rescoring: q_i = round(x_i·127/amax) with one per-vector
    * scale, the layout faiss calls SQ8 and every vector database ships.
    *
    * Integer-exact: x enters as micro units (round(x·10⁶), the one float
    * op, 6dp absorbing ulps), amax is an integer max, and the half-away
    * rounding is pure integer arithmetic — (v·254 ± amax) div (2·amax) —
    * so codes, dequantized values, and the mean-abs-error diagnostic all
    * replay bit-for-bit. Zero-shuffle narrow projection; the q digest is
    * md5 over the joined codes (any single-code drift breaks it).
    *
    * Output: (idCol, dim, amax_micro, q_digest, q0..q3, mae_micro). */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val xm = expr(s"transform($vecCol, x -> cast(round(x * 1000000) as bigint))")
    df.select(col(idCol), xm.as("__xm"))
      .withColumn("amax_micro", expr("coalesce(array_max(transform(__xm, v -> abs(v))), 0L)"))
      .withColumn("__q", expr(
        """transform(__xm, v -> CASE WHEN amax_micro = 0 THEN 0L
          |  ELSE (v*254 + (CASE WHEN v < 0 THEN -1L WHEN v > 0 THEN 1L ELSE 0L END) * amax_micro)
          |       div (2 * amax_micro) END)""".stripMargin))
      .withColumn("mae_micro", expr(
        """CASE WHEN size(__xm) = 0 THEN 0L
          |  ELSE aggregate(zip_with(__xm, __q, (a, b) -> abs(a - (b * amax_micro) div 127)),
          |                 0L, (acc, x) -> acc + x) div size(__xm) END""".stripMargin))
      .select(col(idCol), expr("size(__xm)").cast("long").as("dim"),
        col("amax_micro"),
        md5(expr("concat_ws(',', transform(__q, v -> cast(v as string)))")).as("q_digest"),
        expr("__q[0]").as("q0"), expr("__q[1]").as("q1"),
        expr("__q[2]").as("q2"), expr("__q[3]").as("q3"),
        col("mae_micro"))
  }

  /** Pure twin of [[quantizeInt8]] over one vector: (amaxMicro, codes,
    * maeMicro). */
  def quantizeInt8Pure(vec: Seq[Float]): (Long, Seq[Long], Long) = {
    def micro(x: Double): Long =
      BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val xm = vec.map(x => micro(x.toDouble))
    val amax = if (xm.isEmpty) 0L else xm.map(math.abs).max
    val q = xm.map { v =>
      if (amax == 0) 0L
      else (v * 254 + math.signum(v) * amax) / (2 * amax)
    }
    val mae =
      if (xm.isEmpty) 0L
      else xm.zip(q).map { case (a, b) => math.abs(a - (b * amax) / 127) }.sum / xm.size
    (amax, q, mae)
  }

  // ----------------------------------------------------------- IVF-PQ ----

  /** Double-array twin of [[sqSub]] (IVF residuals are doubles). */
  def sqSubD(vec: Seq[Double], cent: Array[Double], off: Int): Double = {
    var s = 0.0
    var j = 0
    while (j < cent.length) {
      val d = vec(off + j) - cent(j)
      s += d * d
      j += 1
    }
    s
  }

  /** 6dp cosine between a float vector and a double centroid — the pure
    * twin of the relational assignment rule ([[Similarity.ivfAssignRows]]
    * uses the same rounding), for driver-side query probing. */
  private def cos6(q: Seq[Float], c: Array[Double]): Double = {
    var d = 0.0; var qq = 0.0; var cc = 0.0
    var j = 0
    while (j < q.length && j < c.length) {
      val x = q(j).toDouble
      d += x * c(j); qq += x * x; cc += c(j) * c(j)
      j += 1
    }
    BigDecimal(d / (math.sqrt(qq) * math.sqrt(cc)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** The residual relation an IVF-PQ index trains on: each candidate's
    * (id, cell, vec − centroid(cell)) — doubles, exact in both engines
    * (float→double is exact, centroids are 6dp doubles, and IEEE
    * subtraction is deterministic). Typed zero-shuffle scan. */
  def residualRows(assigned: DataFrame, idCol: String, vecCol: String,
      cents: Array[(Int, Array[Double])]): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val centByCell = cents.toMap
    val schema = StructType(Seq(assigned.schema(idCol),
      StructField("__cell", IntegerType, nullable = false),
      StructField("__res", ArrayType(DoubleType, containsNull = false),
        nullable = false)))
    assigned.select(col(idCol), col(vecCol), col("__cell"))
      .mapPartitions { it =>
        it.map { row =>
          val vec = row.getSeq[Float](1)
          val cell = row.getInt(2)
          val c = centByCell(cell)
          val res = Array.tabulate(vec.length)(j => vec(j).toDouble - c(j))
          Row(row.get(0), cell, res.toSeq)
        }
      }(Encoders.row(schema))
  }

  /** IVF-PQ approximate top-k — the production ANN index shape (faiss
    * IVFPQ): a coarse IVF quantizer routes each vector to a cell, ONE
    * product quantizer (trained on the pooled residuals vec − centroid)
    * compresses what the cell centroid missed, and queries probe their
    * `nProbe` best cells scoring candidates by asymmetric distance against
    * a per-(query, cell) lookup table over the QUERY's residual. Combines
    * [[Similarity.ivfCentroids]]/[[Similarity.ivfAssignRows]] (coarse) with
    * [[codebooks]] (residual PQ) — both deterministic, so the whole index
    * replays in SQL.
    *
    * Scale shape: two narrow passes over the candidates (residual training
    * scan, then a FUSED residual→encode→score scan with bounded per-query
    * k-heaps — codes never materialize, nothing shuffles until the final
    * nPartitions·nQueries·k-row window). Centroids/codebooks are
    * driver/broadcast data by design (nlist·dim + m·ksub·ds doubles); the
    * query relation is driver-sized by contract, as in [[adcTopK]].
    * Recall = IVF's probe trade compounded by PQ's quantization error —
    * rescore survivors exactly when it matters (the [[Similarity.ivfTopK]]
    * pattern). Ids must be integral; self-matches are excluded.
    * Output: (query_id, neighbor_id, adist, rank). */
  def ivfpqTopK(candidates: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 8, nProbe: Int = 2,
      m: Int = 4, ksub: Int = 8, iters: Int = 1): DataFrame = {
    val cents = Similarity.ivfCentroids(candidates, idCol, vecCol, nlist, iters)
    val cands = candidates
      .select(col(idCol).cast("long").as(idCol), col(vecCol))
      .filter(col(vecCol).isNotNull)
    val assigned = Similarity.ivfAssignRows(cands, idCol, vecCol, cents)
    val books = codebooks(
      residualRows(assigned, idCol, vecCol, cents), idCol, "__res", m, ksub, iters)
    val sub = bySub(books)
    val ds = books.head._3.length
    val centByCell = cents.toMap

    val qRows = queries.select(col(idCol).cast("long"), col(vecCol))
      .filter(col(vecCol).isNotNull).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    // per query: the nProbe best cells (6dp cosine desc, cell asc — the
    // exact assignment rule), then per probed cell the ADC lookup table
    // over the query's residual: (subspace, code) -> micro distance
    val probes: Map[Int, Array[(Long, Array[Map[Int, Long]])]] = qRows.flatMap {
      case (qid, qv) =>
        cents.map { case (cell, c) => (cell, cos6(qv, c)) }
          .sortBy { case (cell, cs) => (-cs, cell) }.take(nProbe)
          .map { case (cell, _) =>
            val c = centByCell(cell)
            val qres = Array.tabulate(qv.length)(j => qv(j).toDouble - c(j))
            val tabs = sub.zipWithIndex.map { case (cells, s) =>
              cells.map { case (code, cent) =>
                code -> micro(sqSubD(qres, cent, s * ds))
              }.toMap
            }
            (cell, (qid, tabs))
          }
    }.groupBy(_._1).map { case (cell, xs) => cell -> xs.map(_._2) }

    val schema = StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("neighbor_id", LongType, nullable = false),
      StructField("adist", LongType, nullable = false)))
    // fused residual → PQ-encode → ADC score, one narrow pass
    val perPart = assigned.select(col(idCol), col(vecCol), col("__cell"))
      .mapPartitions { it =>
        val heaps = qRows.map { case (qid, _) =>
          qid -> mutable.PriorityQueue.empty[(Long, Long)](
            Ordering.Tuple2[Long, Long])
        }.toMap
        it.foreach { row =>
          val cell = row.getInt(2)
          probes.get(cell).foreach { qs =>
            val nid = row.getLong(0)
            val vec = row.getSeq[Float](1)
            val c = centByCell(cell)
            val res: Seq[Double] =
              Array.tabulate(vec.length)(j => vec(j).toDouble - c(j)).toSeq
            val codes = new Array[Int](sub.length)
            var s = 0
            while (s < sub.length) {
              var bestCode = -1
              var bestD = Long.MaxValue
              sub(s).foreach { case (code, cent) =>
                val d = micro(sqSubD(res, cent, s * ds))
                if (d < bestD || (d == bestD && code < bestCode)) {
                  bestD = d; bestCode = code
                }
              }
              codes(s) = bestCode
              s += 1
            }
            qs.foreach { case (qid, tabs) =>
              if (nid != qid) {
                var d = 0L
                var i = 0
                while (i < tabs.length) { d += tabs(i)(codes(i)); i += 1 }
                val h = heaps(qid)
                if (h.size < k) h.enqueue((d, nid))
                else if (Ordering.Tuple2[Long, Long].lt((d, nid), h.head)) {
                  h.dequeue(); h.enqueue((d, nid))
                }
              }
            }
          }
        }
        heaps.iterator.flatMap { case (qid, h) =>
          h.iterator.map { case (d, nid) => Row(qid, nid, d) }
        }
      }(Encoders.row(schema))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adist"), col("neighbor_id"))
    perPart.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("adist"),
        col("rank").cast("long").as("rank"))
  }
}
