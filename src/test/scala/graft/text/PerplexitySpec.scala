package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PerplexitySpec extends SparkTestBase {
  import spark.implicits._

  private val reference = Seq(
    "the insurance policy covers general liability",
    "the policy includes an aggregate limit",
    "general liability coverage under the policy")

  private val corpus: Seq[(Long, String)] = Seq(
    1L -> "the insurance policy covers general liability",   // in-domain
    2L -> "the policy includes general liability coverage",  // near-domain
    3L -> "zebra quantum discotheque marmalade xylophone",   // out-of-domain
    4L -> "one",                                             // no bigram
    5L -> "")                                                // empty

  private val B1 = 256
  private val B2 = 2048

  test("lmScores ≡ pure twin; in-domain text scores lower nll per bigram") {
    val got = graft.io.Persisted.unpersistAfter(spark) {
      Perplexity.lmScores(corpus.toDF("doc_id", "text"), "doc_id", "text",
          reference.toDF("rt"), "rt", B1, B2)
        .as[(Long, Long, Long)].collect().toSet
    }
    val exp = Perplexity.lmScoresPure(corpus, reference, B1, B2).toSet
    assert(got == exp)
    val byId = got.map(r => r._1 -> r).toMap
    // bigram-less docs score exactly (0, 0)
    assert(byId(4L) == (4L, 0L, 0L) && byId(5L) == (5L, 0L, 0L))
    // avg nll: in-domain < out-of-domain
    def avg(id: Long) = byId(id)._3.toDouble / byId(id)._2
    assert(avg(1L) < avg(3L))
    assert(avg(2L) < avg(3L))
  }

  test("backoff levels: seen bigram < unseen bigram in seen context < unseen context") {
    val exp = Perplexity.lmScoresPure(
      Seq(1L -> "the insurance", 2L -> "the marmalade", 3L -> "marmalade zebra"),
      reference, B1, B2)
    val m = exp.map(r => r._1 -> r._3).toMap
    assert(m(1L) < m(2L), s"seen bigram ${m(1L)} !< backoff ${m(2L)}")
    // unseen context is the ln(B2) constant
    assert(m(3L) == math.round(math.log(B2.toDouble) * 1e6))
    // the seen-context backoff is ln(c1+B2): for a RARE context that's
    // marginally ABOVE the unseen-context constant (add-one smoothing
    // spreads the context's mass over all B2 events) — assert the exact
    // value rather than a naive ordering
    assert(m(2L) > m(3L) && m(2L) < m(3L) + 10000, m(2L).toString)
  }

  test("model tables broadcast by default; shuffle fallback on request") {
    val c = corpus.toDF("doc_id", "text")
    val r = reference.toDF("rt")
    val pB = Perplexity.lmScores(c, "doc_id", "text", r, "rt", B1, B2)
      .queryExecution.executedPlan.toString
    assert(pB.contains("BroadcastHashJoin") || pB.contains("BroadcastExchange"), pB)
    val pS = Perplexity.lmScores(c, "doc_id", "text", r, "rt", B1, B2,
      broadcastModel = false).queryExecution.executedPlan.toString
    // with AQE the tiny test-sized sides may still end up broadcast at
    // runtime; assert the REQUEST was honored in the pre-AQE plan instead
    val logical = Perplexity.lmScores(c, "doc_id", "text", r, "rt", B1, B2,
      broadcastModel = false).queryExecution.optimizedPlan.toString
    assert(!logical.contains("broadcast"), logical)
    graft.io.Persisted.release(spark)
    assert(pS != null)
  }

  test("scores are partitioning-invariant") {
    val base = graft.io.Persisted.unpersistAfter(spark) {
      Perplexity.lmScores(corpus.toDF("doc_id", "text").repartition(7),
          "doc_id", "text", reference.toDF("rt").repartition(3), "rt", B1, B2)
        .as[(Long, Long, Long)].collect().toSet
    }
    assert(base == Perplexity.lmScoresPure(corpus, reference, B1, B2).toSet)
  }
}
