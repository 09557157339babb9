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

  test("pplBuckets: per-language terciles, deterministic ties, avg is floor-div") {
    // 9 docs in lang a (3 per bucket), 4 in lang b (2/1/1 by ntile)
    val docs = (1L to 9L).map { i =>
      val t = if (i <= 3) "the insurance policy covers general liability"
      else if (i <= 6) "the policy includes general liability coverage"
      else "zebra quantum discotheque marmalade xylophone"
      (i, "a", t)
    } ++ Seq((10L, "b", "the policy includes an aggregate limit"),
      (11L, "b", "zebra quantum marmalade"),
      (12L, "b", "one"), (13L, "b", "the insurance policy"))
    val got = graft.io.Persisted.unpersistAfter(spark) {
      Perplexity.pplBuckets(docs.toDF("doc_id", "lang", "text"),
          "doc_id", "text", "lang", reference.toDF("rt"), "rt", B1, B2)
        .as[(Long, String, Long, Long, String)].collect()
    }
    val byId = got.map(r => r._1 -> r).toMap
    assert(got.length == 13)
    // avg = floor(nll/n); replay from the pure scorer
    val pure = Perplexity.lmScoresPure(
      docs.map(d => d._1 -> d._3), reference, B1, B2)
      .map(r => r._1 -> (if (r._2 == 0) 0L else r._3 / r._2)).toMap
    for ((id, _, n, avg, _) <- got)
      assert(avg == pure(id), s"doc $id: $avg vs ${pure(id)} (n=$n)")
    // lang a: the three identical-score groups land head/middle/tail in
    // id order (ties broken by doc_id)
    assert((1L to 3L).forall(byId(_)._5 == "head"))
    assert((4L to 6L).forall(byId(_)._5 == "middle"))
    assert((7L to 9L).forall(byId(_)._5 == "tail"))
    // lang b: ntile(3) of 4 rows = sizes 2/1/1 in score order; the
    // bigram-less doc scores 0 and sorts first
    val bBuckets = got.filter(_._2 == "b").sortBy(r => (r._4, r._1)).map(_._5)
    assert(bBuckets.toSeq == Seq("head", "head", "middle", "tail"))
    assert(byId(12L)._5 == "head") // avg 0 sorts first
  }

  test("contextGain: PMI-rate signal, pure parity, edge docs") {
    import org.apache.spark.sql.functions._
    // reference: strongly predictable bigrams ("to the", "the market")
    val ref = (1 to 30).map(_ => "we went to the market to the fair")
    // predictable doc vs a bag-of-words scramble of the same tokens
    val corpus = Seq(
      (1L, "we went to the market"),
      (2L, "market we the went to"),
      (3L, "single"),
      (4L, ""))
    val refDf = ref.toDF("text")
    val got = Perplexity.contextGain(corpus.toDF("doc_id", "text"),
        "doc_id", "text", refDf, "text")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val exp = Perplexity.contextGainPure(corpus, ref, 4096, 1024, 8192)
      .sortBy(_._1)
    assert(got == exp)
    val gain = got.map(r => r._1 -> r._5).toMap
    // the signal is RELATIVE (absolute gain carries the smoothing-mass
    // offset of the hashed model): in-distribution word order must beat
    // the scramble of the same tokens by a wide margin
    assert(gain(1L) > gain(2L) + 300000L, s"${gain(1L)} vs ${gain(2L)}")
    // bigram-less docs are all-zero
    assert(got.filter(r => r._1 >= 3L).forall(r =>
      r._2 == 0L && r._3 == 0L && r._4 == 0L && r._5 == 0L))
    // partitioning invariance
    val rep = Perplexity.contextGain(corpus.toDF("doc_id", "text")
        .repartition(5), "doc_id", "text", refDf.repartition(3), "text")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(rep == exp)
  }
}
