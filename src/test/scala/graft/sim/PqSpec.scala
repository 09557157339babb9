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

  test("indivisible dim is refused") {
    val ex = intercept[IllegalArgumentException] {
      Pq.codebooks(corpus(20, 9), "vec_id", "embedding", m = 2, ksub = 2)
    }
    assert(ex.getMessage.contains("not divisible"))
  }
}
