package graft.sim

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PqSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic pseudo-random vectors (no RNG — replayable)
  private def vec(id: Long, dim: Int): Seq[Float] =
    (0 until dim).map(j => (((id * 31 + j * 17) % 19) - 9).toFloat / 4f)

  private def corpus(n: Int, dim: Int) =
    (0L until n.toLong).map(i => (i, vec(i, dim))).toDF("vec_id", "embedding")

  test("codebooks: deterministic retrain, shapes, 6dp means") {
    val df = corpus(60, 8)
    val b1 = Pq.codebooks(df, "vec_id", "embedding", m = 2, ksub = 4)
    val b2 = Pq.codebooks(df, "vec_id", "embedding", m = 2, ksub = 4)
    assert(b1.map(t => (t._1, t._2, t._3.toSeq)).toSeq ==
      b2.map(t => (t._1, t._2, t._3.toSeq)).toSeq)
    assert(b1.forall(_._3.length == 4)) // ds = 8/2
    assert(b1.map(_._1).distinct.sorted.toSeq == Seq(0, 1))
    assert(b1.forall(t => BigDecimal(t._3.head).scale <= 6))
  }

  test("typed encode ≡ relational encode (micro-unit argmin, code tie-break)") {
    val df = corpus(80, 8)
    val books = Pq.codebooks(df, "vec_id", "embedding", m = 2, ksub = 4)
    val typed = Pq.encodeRows(df, "vec_id", "embedding", books)
      .as[(Long, Seq[Int])].collect().sortBy(_._1)
    val rel = Pq.encodeDf(df, "vec_id", "embedding", books, m = 2, ds = 4)
      .as[(Long, Seq[Int])].collect().sortBy(_._1)
    assert(typed.toSeq == rel.toSeq)
    // typed encode is narrow
    val plan = Pq.encodeRows(df, "vec_id", "embedding", books)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("adcTopK ≡ naive full ADC (exact int64 sums), self excluded") {
    val df = corpus(120, 8).repartition(7) // force multi-partition heaps
    val queries = df.filter($"vec_id" < 3)
    val k = 5
    val got = Pq.adcTopK(df, queries, "vec_id", "embedding", k = k, m = 2,
      ksub = 4).as[(Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._4))

    // naive reference: same books, same micro tables, full scan in Scala
    val books = Pq.codebooks(df, "vec_id", "embedding", m = 2, ksub = 4)
    val bySub = (0 until 2).map(s =>
      books.filter(_._1 == s).map(t => (t._2, t._3)).sortBy(_._1))
    val all = df.as[(Long, Seq[Float])].collect()
    val qs = all.filter(_._1 < 3)
    val want = qs.flatMap { case (qid, qv) =>
      val scored = all.filter(_._1 != qid).map { case (nid, nv) =>
        val codes = bySub.zipWithIndex.map { case (cells, s) =>
          cells.minBy { case (code, cent) =>
            (Pq.micro(Pq.sqSub(nv, cent, s * 4)), code)
          }._1
        }
        val d = bySub.zipWithIndex.map { case (cells, s) =>
          Pq.micro(Pq.sqSub(qv, cells.toMap.apply(codes(s)), s * 4))
        }.sum
        (nid, d)
      }.sortBy { case (nid, d) => (d, nid) }.take(k)
      scored.zipWithIndex.map { case ((nid, d), i) =>
        (qid, nid, d, (i + 1).toLong)
      }
    }.sortBy(r => (r._1, r._4))
    assert(got.toSeq == want.toSeq)
  }

  test("ivfpqTopK ≡ naive composed replay; partitioning invariant") {
    val df = corpus(100, 8).repartition(7)
    val queries = df.filter($"vec_id" < 3)
    val k = 4
    val got = Pq.ivfpqTopK(df, queries, "vec_id", "embedding", k = k,
        nlist = 4, nProbe = 2, m = 2, ksub = 4, iters = 1)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._4))

    // structural: k ranked rows per query, adist non-decreasing
    assert(got.groupBy(_._1).forall { case (_, rs) =>
      rs.map(_._4).toSeq == (1L to k) &&
        rs.sortBy(_._4).map(_._3).sliding(2).forall(p => p.head <= p.last)
    })

    // naive replay from the tested primitives: centroids, assignment,
    // residual codebooks — then probe/encode/ADC re-derived in test code
    val cents = Similarity.ivfCentroids(df, "vec_id", "embedding", nlist = 4)
    val assigned = Similarity.ivfAssignRows(df, "vec_id", "embedding", cents)
    val books = Pq.codebooks(
      Pq.residualRows(assigned, "vec_id", "embedding", cents),
      "vec_id", "__res", m = 2, ksub = 4)
    val ds = books.head._3.length
    val centMap = cents.toMap
    def cos6(q: Seq[Float], c: Array[Double]): Double = {
      val d = q.zip(c).map { case (x, y) => x.toDouble * y }.sum
      val qq = q.map(x => x.toDouble * x).sum
      val cc = c.map(y => y * y).sum
      BigDecimal(d / (math.sqrt(qq) * math.sqrt(cc)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def enc(res: Seq[Double]): Seq[Int] = {
      val m = books.map(_._1).max + 1
      (0 until m).map { s =>
        books.filter(_._1 == s)
          .map(t => (Pq.micro(Pq.sqSubD(res, t._3, s * ds)), t._2)).min._2
      }
    }
    val cand = assigned.select($"vec_id", $"embedding", $"__cell")
      .as[(Long, Seq[Float], Int)].collect()
    val qs = queries.as[(Long, Seq[Float])].collect()
    val expected = qs.flatMap { case (qid, qv) =>
      val probed = cents.map { case (cell, c) => (cell, cos6(qv, c)) }
        .sortBy { case (cell, cs) => (-cs, cell) }.take(2).map(_._1).toSet
      val scored = cand.filter(c => probed.contains(c._3) && c._1 != qid)
        .map { case (nid, nv, cell) =>
          val c = centMap(cell)
          val qres = qv.indices.map(j => qv(j).toDouble - c(j))
          val nres = nv.indices.map(j => nv(j).toDouble - c(j))
          val codes = enc(nres)
          val adist = codes.zipWithIndex.map { case (code, s) =>
            val cent = books.find(t => t._1 == s && t._2 == code).get._3
            Pq.micro(Pq.sqSubD(qres, cent, s * ds))
          }.sum
          (qid, nid, adist)
        }
      scored.sortBy(t => (t._3, t._2)).take(k).zipWithIndex
        .map { case ((q, n, a), i) => (q, n, a, (i + 1).toLong) }
    }.sortBy(r => (r._1, r._4))
    assert(got.toSeq == expected.toSeq)

    // partitioning invariance
    val got2 = Pq.ivfpqTopK(df.repartition(3), queries, "vec_id", "embedding",
        k = k, nlist = 4, nProbe = 2, m = 2, ksub = 4, iters = 1)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._4))
    assert(got2.toSeq == got.toSeq)
  }

  test("indivisible dim is refused") {
    val ex = intercept[IllegalArgumentException] {
      Pq.codebooks(corpus(20, 9), "vec_id", "embedding", m = 2, ksub = 2)
    }
    assert(ex.getMessage.contains("not divisible"))
  }

  test("quantizeInt8 ≡ pure twin; codes bounded; extremes hit ±127; zero vector safe") {
    import spark.implicits._
    val vecs: Seq[(Long, Seq[Float])] = Seq(
      1L -> Seq(1.0f, -1.0f, 0.5f, -0.25f, 0.0f),
      2L -> Seq(0.003f, 0.001f, -0.002f, 0.004f, -0.004f),
      3L -> Seq(0.0f, 0.0f, 0.0f, 0.0f, 0.0f), // amax 0 → all-zero codes
      4L -> Seq(42.5f, -13.25f, 7.125f, 0.875f, -42.5f))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Pq.quantizeInt8(df, "vec_id", "embedding")
      .as[(Long, Long, Long, String, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    for ((id, v) <- vecs) {
      val (amax, q, mae) = Pq.quantizeInt8Pure(v)
      val r = got(id)
      assert(r._2 == v.size.toLong && r._3 == amax && r._9 == mae, s"vec $id")
      assert((r._5, r._6, r._7, r._8) == ((q(0), q(1), q(2), q(3))), s"vec $id")
      assert(q.forall(c => c >= -127 && c <= 127), s"vec $id range")
    }
    // the per-vector max lands exactly on ±127
    val (_, q1, _) = Pq.quantizeInt8Pure(vecs.head._2)
    assert(q1(0) == 127L && q1(1) == -127L)
    assert(got(3L)._3 == 0L && got(3L)._5 == 0L) // zero vector
    // reconstruction error is bounded by half a quantization step
    for ((id, v) <- vecs if id != 3L) {
      val (amax, _, mae) = Pq.quantizeInt8Pure(v)
      assert(mae <= amax / 254 + 1, s"vec $id mae $mae vs step ${amax / 254}")
    }
  }
}
