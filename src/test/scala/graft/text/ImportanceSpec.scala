package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ImportanceSpec extends SparkTestBase {
  import spark.implicits._

  // two "domains": insurance-flavored and cooking-flavored docs
  private val insurance = (1L to 15L).map(i =>
    (i, s"policy number $i general liability coverage limit applies per occurrence"))
  private val cooking = (16L to 30L).map(i =>
    (i, s"recipe $i simmer the onions then add garlic and fresh basil leaves"))
  private val shorties = Seq((31L, "word"), (32L, ""))
  private val corpus = insurance ++ cooking ++ shorties
  private val target = insurance.take(5).map(_._2) // target looks like insurance

  test("dsir scores: pure-twin parity, domain separation, short docs preserved") {
    val got = Importance.dsirScores(corpus.toDF("doc_id", "text"), "doc_id", "text",
        target.toDF("text"), "text", buckets = 256)
      .select("doc_id", "n_bigrams", "score_micro")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    graft.io.Persisted.release(spark)
    val pure = Importance.dsirScoresPure(corpus, target, buckets = 256).sortBy(_._1)
    assert(got == pure)
    // ranking separation: every insurance doc outscores every cooking doc
    val ins = got.filter(_._1 <= 15L).map(_._3)
    val cook = got.filter(r => r._1 >= 16L && r._1 <= 30L).map(_._3)
    assert(ins.min > cook.max)
    // bigram-less docs keep their row with zero score
    assert(got.find(_._1 == 31L).get == ((31L, 0L, 0L)))
    assert(got.find(_._1 == 32L).get == ((32L, 0L, 0L)))
  }

  test("dsir plan: weights broadcast into the bigram stream, rerun deterministic") {
    val df = corpus.toDF("doc_id", "text")
    val scored = Importance.dsirScores(df, "doc_id", "text",
      target.toDF("text"), "text", buckets = 256)
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
    val a = scored.select("doc_id", "score_micro").as[(Long, Long)].collect().toSet
    graft.io.Persisted.release(spark)
    val b = Importance.dsirScores(df, "doc_id", "text",
        target.toDF("text"), "text", buckets = 256)
      .select("doc_id", "score_micro").as[(Long, Long)].collect().toSet
    graft.io.Persisted.release(spark)
    assert(a == b)
  }
}
