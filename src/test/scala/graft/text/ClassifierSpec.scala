package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkTestBase {
  import spark.implicits._

  private val B = 512

  test("scoreLinear ≡ pure twin; featureless docs keep a zero row") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "quick quick quick"), // repeated features count per occurrence
      (3L, "one"),               // single token → no bigrams
      (4L, ""),                  // no features at all
      (5L, null.asInstanceOf[String]),
      (6L, "Punctuation, splits; tokens! right?")
    ).toDF("doc_id", "text")
    val w = Classifier.syntheticWeights(spark, B)
    val got = Classifier.scoreLinear(docs, "doc_id", "text", w, B)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    for ((id, text) <- Seq(1L -> "the quick brown fox jumps over the lazy dog",
        2L -> "quick quick quick", 3L -> "one", 4L -> "",
        6L -> "Punctuation, splits; tokens! right?")) {
      val (n, s, p) = Classifier.scoreLinearPure(text, B)
      assert(got(id) == ((n, s, p)), s"doc $id")
    }
    assert(got(5L) == ((0L, 0L, false)))
    // 9 tokens → 9 unigrams + 8 bigrams
    assert(got(1L)._1 == 17L)
    // tripled token: feature count 3 + 2 bigrams, score = 3·w(uni) + 2·w(bi)
    assert(got(2L)._1 == 5L)
  }

  test("weights broadcast by default; shuffle fallback agrees") {
    val docs = (1L to 40L).map(i => (i, s"token$i alpha beta gamma token${i % 7}"))
      .toDF("doc_id", "text")
    val w = Classifier.syntheticWeights(spark, B)
    val bc = Classifier.scoreLinear(docs, "doc_id", "text", w, B)
    val sh = Classifier.scoreLinear(docs, "doc_id", "text", w, B,
      broadcastModel = false)
    assert(bc.orderBy("doc_id").collect().toSeq ==
      sh.orderBy("doc_id").collect().toSeq)
    val plan = bc.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("synthetic weights are deterministic and bounded") {
    val w = Classifier.syntheticWeights(spark, 100)
      .as[(Long, Long)].collect().toMap
    assert(w.size == 100)
    assert(w.values.forall(v => v >= -1000 && v <= 1000))
    assert(w == Classifier.syntheticWeights(spark, 100).as[(Long, Long)]
      .collect().toMap)
  }
}
