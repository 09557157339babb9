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

  test("domainKl ≡ pure twin; self-identical domain scores ~0; drift scores higher") {
    val rows = Seq.tabulate(60) { i =>
      // domains a and b share the corpus-dominant vocabulary; c is drifted
      val dom = if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"
      val text = dom match {
        case "c" => "zebra quantum marmalade xylophone discotheque"
        case _   => "the table scan row filter value batch column"
      }
      (dom, text)
    }
    val B = 64
    val got = graft.io.Persisted.unpersistAfter(spark) {
      Importance.domainKl(rows.toDF("source", "text"), "source", "text", B)
        .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    }
    assert(got == Importance.domainKlPure(rows, B))
    val byDom = got.map(r => r._1 -> r._3).toMap
    // a and b are two thirds of the corpus each matching it → small KL;
    // c's vocabulary is disjoint from the majority → visibly larger
    assert(byDom("c") > byDom("a") && byDom("c") > byDom("b"),
      byDom.toString)
    // partitioning cannot move the integer sums
    val rep = graft.io.Persisted.unpersistAfter(spark) {
      Importance.domainKl(rows.toDF("source", "text").repartition(7),
          "source", "text", B)
        .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    }
    assert(rep == got)
  }
}
