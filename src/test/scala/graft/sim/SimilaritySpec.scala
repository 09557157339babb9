package graft.sim

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkTestBase {
  import Similarity._
  import spark.implicits._

  // deterministic synthetic vectors: 3 tight clusters + noise
  def vec(seed: Int, dim: Int = 16): Seq[Float] = {
    val rng = new java.util.Random(seed)
    Seq.fill(dim)(rng.nextFloat() * 2 - 1)
  }

  def jitter(v: Seq[Float], seed: Int, eps: Float): Seq[Float] = {
    val rng = new java.util.Random(seed)
    v.map(x => x + (rng.nextFloat() * 2 - 1) * eps)
  }

  val c1 = vec(1); val c2 = vec(2); val c3 = vec(3)
  val rows: Seq[(Long, Seq[Float], Int)] =
    (0 until 10).map(i => (i.toLong, jitter(c1, 100 + i, 0.05f), 0)) ++
      (10 until 20).map(i => (i.toLong, jitter(c2, 100 + i, 0.05f), 1)) ++
      (20 until 30).map(i => (i.toLong, jitter(c3, 100 + i, 0.05f), 2))

  lazy val df = rows.toDF("id", "vec", "label")

  test("cosine: pure and Column forms agree") {
    val pairs = Seq((rows(0)._2, rows(1)._2), (rows(0)._2, rows(15)._2))
    val got = pairs.toDF("a", "b").select(cosineCol(col("a"), col("b")))
      .as[Double].collect()
    assert(got(0) == cosine(rows(0)._2, rows(1)._2))
    assert(got(1) == cosine(rows(0)._2, rows(15)._2))
    assert(got(0) > 0.9 && got(1) < 0.9)
  }

  test("brute-force top-k returns same-cluster neighbors first") {
    val queries = df.filter(col("id").isin(0, 10, 20))
    val topk = bruteForceTopK(df, queries, "id", "vec", k = 5)
      .as[(Long, Long, Double, Int)].collect()
    assert(topk.length == 15)
    for ((q, n, _, _) <- topk) {
      assert(n / 10 == q / 10, s"query $q got cross-cluster neighbor $n")
    }
    // ranks are 1..5 per query, cosine non-increasing
    for (g <- topk.groupBy(_._1).values) {
      val sorted = g.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to 5))
      assert(sorted.map(_._3).toSeq.reverse.sorted.reverse == sorted.map(_._3).toSeq)
    }
  }

  test("sign-bucket: pure and Column forms agree; same cluster → same bucket") {
    val got = df.select(col("id"), signBucketCol(col("vec"), 8).as("b"))
      .as[(Long, Int)].collect().toMap
    for ((id, v, _) <- rows) assert(got(id) == signBucket(v, 8), s"bucket of $id")
    // tight jitter rarely flips a sign among the first 8 dims of these seeds
    assert(rows.groupBy(_._1 / 10).forall { case (_, g) =>
      g.map(r => got(r._1)).distinct.size <= 3
    })
  }

  test("bucketed top-k equals brute force within the query's bucket") {
    val queries = df.filter(col("id") === 0)
    val approx = bucketedTopK(df, queries, "id", "vec", k = 3, p = 8)
      .as[(Long, Long, Double, Int)].collect()
    assert(approx.nonEmpty && approx.forall(_._2 / 10 == 0))
  }

  test("near-dup pairs at high threshold are within-cluster only") {
    val pairs = nearDupPairs(df, "id", "vec", 0.9)
      .as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b, c) => a / 10 == b / 10 && c >= 0.9 })
  }

  test("rhp keys: pure, Column and typed row forms agree") {
    val got = df.select(col("id"), rhpKeysCol(col("vec"), 4, 12).as("k"))
      .as[(Long, Seq[Long])].collect().toMap
    for ((id, v, _) <- rows) assert(got(id) == rhpKeys(v, 4, 12), s"keys of $id")
    // table id occupies the high bits: key h is in [h*4096, (h+1)*4096)
    for (ks <- got.values; (k, h) <- ks.zipWithIndex)
      assert(k >= h * 4096L && k < (h + 1) * 4096L)
    // the typed production path emits the same (id, key) multiset
    val typed = rhpKeyRows(df, "id", "vec", 4, 12)
      .select(col("id"), col("__key")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    for ((id, v, _) <- rows) assert(typed(id) == rhpKeys(v, 4, 12), s"typed keys of $id")
    // a null vec yields null keys in the Column path (not valid all-zero-bit
    // keys), matching the typed path which drops the row entirely
    val withNull = spark.sql("SELECT CAST(null AS array<float>) AS vec")
    assert(withNull.select(rhpKeysCol(col("vec"), 4, 12)).collect().head.isNullAt(0))
    assert(rhpKeyRows(withNull.withColumn("id", lit(1L)), "id", "vec", 4, 12).count() == 0)
  }

  test("rhp near-dup: exact precision, recall vs brute-force baseline") {
    val exact = nearDupPairs(df, "id", "vec", 0.9)
      .as[(Long, Long, Double)].collect().toSet
    val approx = rhpNearDupPairs(df, "id", "vec", 0.9, tables = 4, bits = 12)
      .as[(Long, Long, Double)].collect()
    // no duplicate pairs despite multi-table candidates
    assert(approx.map(p => (p._1, p._2)).distinct.length == approx.length)
    // precision is exact: every reported pair is a true pair (rescored)
    assert(approx.forall(exact.contains))
    // recall: 4 tables x 12 bits recovers most 0.9-cosine pairs here
    assert(exact.nonEmpty && approx.length.toDouble / exact.size >= 0.6,
      s"recall ${approx.length}/${exact.size}")
  }

  test("knn majority-label classification recovers cluster labels") {
    val queries = df.filter(col("id").isin(5, 15, 25))
    val got = knnClassify(df, queries, "id", "vec", "label", k = 5)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(5L -> 0, 15L -> 1, 25L -> 2))
  }

  test("ivf: typed and relational cell assignment agree; training is deterministic") {
    val cents = ivfCentroids(df, "id", "vec", nlist = 4, iters = 1)
    assert(cents.nonEmpty && cents.length <= 4)
    // re-training yields bit-identical centroids (no RNG anywhere)
    val again = ivfCentroids(df, "id", "vec", nlist = 4, iters = 1)
    assert(cents.map(_._1).toSeq == again.map(_._1).toSeq)
    assert(cents.zip(again).forall { case ((_, a), (_, b)) => a.toSeq == b.toSeq })
    val typed = ivfAssignRows(df, "id", "vec", cents)
      .select(col("id"), col("__cell")).as[(Long, Int)].collect().toMap
    val cdf = cents.toSeq.map { case (c, v) => (c, v.toSeq) }.toDF("__cell", "__c")
    val rel = ivfAssignDf(df, "id", "vec", cdf)
      .select(col("id"), col("__cell")).as[(Long, Int)].collect().toMap
    assert(typed == rel)
    // cells are cluster-pure: two hash-ordered seeds may land inside one
    // tight cluster and split it (correct IVF behavior), but no cell may
    // mix members of different clusters
    for ((cell, members) <- rows.groupBy(r => typed(r._1)))
      assert(members.map(_._1 / 10).distinct.size == 1,
        s"cell $cell mixes clusters: ${members.map(_._1)}")
  }

  test("ivf top-k: exact precision within probed cells, recall vs brute force") {
    val queries = df.filter(col("id").isin(0, 10, 20))
    val exact = bruteForceTopK(df, queries, "id", "vec", k = 5)
      .as[(Long, Long, Double, Int)].collect()
    val approx = ivfTopK(df, queries, "id", "vec", k = 5,
      nlist = 4, nProbe = 2, iters = 1)
      .as[(Long, Long, Double, Int)].collect()
    // every reported cosine is the exact rescored value
    val exactCos = exact.map(r => (r._1, r._2) -> r._3).toMap
    for ((q, n, c, _) <- approx; e <- exactCos.get((q, n))) assert(c == e)
    // tight clusters + own-cell probe: full recall of the true top-5 here
    val exactSet = exact.map(r => (r._1, r._2)).toSet
    val approxSet = approx.map(r => (r._1, r._2)).toSet
    assert(exactSet.subsetOf(approxSet), s"missing ${exactSet -- approxSet}")
  }

  test("ivf: a second Lloyd iteration keeps the quantizer valid (possibly fewer cells)") {
    val c2i = ivfCentroids(df, "id", "vec", nlist = 4, iters = 2)
    assert(c2i.nonEmpty && c2i.length <= 4)
    // assignment still total: every row lands in some surviving cell
    val assigned = ivfAssignRows(df, "id", "vec", c2i)
    assert(assigned.count() == rows.length)
    val cells = c2i.map(_._1).toSet
    assert(assigned.select("__cell").as[Int].collect().forall(cells.contains))
  }

  test("semantic dedup: one survivor chain per cell, keep-low-centroid-sim precedence") {
    val got = semanticDedup(df, "id", "vec", minCos = 0.97, nlist = 3, iters = 1)
      .select("id", "cell", "centroid_cos", "n_closer_dups", "is_kept")
      .as[(Long, Int, Double, Long, Boolean)].collect().sortBy(_._1).toSeq
    graft.io.Persisted.release(spark)
    // one row per input doc, deterministic rerun
    assert(got.map(_._1) == rows.map(_._1))
    val rerun = semanticDedup(df, "id", "vec", minCos = 0.97, nlist = 3, iters = 1)
      .select("id", "cell", "centroid_cos", "n_closer_dups", "is_kept")
      .as[(Long, Int, Double, Long, Boolean)].collect().sortBy(_._1).toSeq
    graft.io.Persisted.release(spark)
    assert(rerun == got)
    // replay the drop rule from first principles: same cell, cos >= minCos,
    // partner precedes in (centroid_cos, id)
    val vecs = rows.map(r => r._1 -> r._2).toMap
    for ((id, cell, ccos, n, kept) <- got) {
      val closer = got.filter { case (oid, ocell, occos, _, _) =>
        oid != id && ocell == cell &&
          (occos < ccos || (occos == ccos && oid < id)) &&
          cosine(vecs(oid), vecs(id)) >= 0.97
      }
      assert(n == closer.length, s"doc $id")
      assert(kept == (n == 0))
    }
    // the jittered clusters contain genuine semantic dups, and something
    // must also survive in every cell
    assert(got.exists(!_._5))
    assert(got.groupBy(_._2).values.forall(_.exists(_._5)))
  }

  test("jl projection: DF ≡ pure twin; exact int64; null dropped; narrow plan") {
    val withNull = df.union(Seq((99L, null.asInstanceOf[Seq[Float]], 9))
      .toDF("id", "vec", "label"))
    val got = jlProject(withNull, "id", "vec", dOut = 8)
      .as[(Long, Long, Long)].collect()
    assert(got.length == 30 * 8 && !got.exists(_._1 == 99L))
    val byId = got.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    for ((id, v, _) <- rows) assert(byId(id) == jlProjectPure(v, 8), s"vec $id")
    val plan = jlProject(df, "id", "vec", 8).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    intercept[IllegalArgumentException](jlProject(df, "id", "vec", 0))
  }

  test("jl projection preserves cluster geometry (same-cluster closest)") {
    // cosine in the 8-dim projected space must still rank a same-cluster
    // mate above cross-cluster vectors for every point — the JL property
    // at the fidelity the downstream LSH/IVF passes actually need
    def cosL(a: Seq[Long], b: Seq[Long]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val proj = rows.map { case (id, v, l) => (id, jlProjectPure(v, 8), l) }
    for ((id, p, l) <- proj) {
      val best = proj.filter(_._1 != id).maxBy(o => cosL(p, o._2))
      assert(best._3 == l, s"vec $id (cluster $l) projected nearest to " +
        s"${best._1} (cluster ${best._3})")
    }
  }

  test("hard negatives: nearest DIFFERENT-label neighbors only, ranked by cosine") {
    val queries = df.filter(col("id").isin(0, 10))
    val got = hardNegatives(df, queries, "id", "vec", "label", k = 4)
      .as[(Long, Int, Long, Int, Double, Int)].collect()
    assert(got.length == 8)
    for ((q, ql, n, nl, _, _) <- got) {
      assert(ql != nl, s"query $q (label $ql) got same-label negative $n")
      assert(ql == (if (q < 10) 0 else 1) && nl == n / 10)
    }
    // equals brute-force top-k over the OTHER-label candidate subset
    for (q <- Seq(0L, 10L)) {
      val ql = (q / 10).toInt
      val expected = bruteForceTopK(
        df.filter(col("label") =!= ql), df.filter(col("id") === q),
        "id", "vec", k = 4)
        .select("neighbor_id", "rank").as[(Long, Int)].collect().toSet
      val mine = got.filter(_._1 == q).map(r => (r._3, r._6)).toSet
      assert(mine == expected, s"query $q")
    }
  }

  test("meanPool: DF ≡ pure twin per key, partitioning invariant, null dropped") {
    import spark.implicits._
    // two classes with float values whose sums would be order-sensitive in
    // double arithmetic; micro quantization makes them exact
    val rows = (0 until 60).map { i =>
      val label = (i % 2).toLong
      val vec = Seq(0.1f * i - 2.7f, -0.33f * i, 1.0f / (i + 1))
      (i.toLong, label, vec)
    }
    val want = rows.groupBy(_._2).map { case (k, rs) =>
      k -> Similarity.meanPoolPure(rs.map(_._3))
    }
    for (parts <- Seq(1, 7)) {
      val got = Similarity.meanPool(
        rows.toDF("vec_id", "label", "embedding").repartition(parts)
          .select(col("label"), col("embedding")),
        "label", "embedding")
        .as[(Long, Long, Long, Long)].collect()
        .groupBy(_._1).map { case (k, rs) =>
          k -> rs.map(r => (r._2, r._3, r._4)).sortBy(_._1).toSeq }
      assert(got == want, s"parts=$parts")
    }
    // null vectors drop; a lone vector pools to itself
    val single = Similarity.meanPool(
      Seq((1L, Seq(0.5f, -0.25f)), (2L, null: Seq[Float]))
        .toDF("k", "embedding"), "k", "embedding")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(single == Set((1L, 0L, 500000L, 1L), (1L, 1L, -250000L, 1L)))
  }
}
