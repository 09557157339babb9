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

  // ---------------------------------------------------------- training ----

  private val trainCorpus: Seq[(Long, String, Int)] =
    (0L until 24L).map { i =>
      val filler = s"doc$i filler words number ${i % 5}"
      if (i % 2 == 0) (i, s"excellent insightful prose $filler", 1)
      else (i, s"spam junk clickbait $filler", 0)
    }

  test("trainLinear ≡ pure twin, bit-exact across rounds and partitionings") {
    val df = trainCorpus.toDF("doc_id", "text", "label")
    val exp = Classifier.trainLinearPure(trainCorpus, B, rounds = 2)
    for (p <- Seq(1, 7)) {
      val got = Classifier.trainLinear(df.repartition(p), "doc_id", "text",
        "label", B, rounds = 2)
        .as[(Long, Long)].collect().toMap
      assert(got == exp, s"parts=$p")
      graft.io.Persisted.release(spark)
    }
  }

  test("trainLinear learns a separable corpus; weights feed scoreLinear") {
    val df = trainCorpus.toDF("doc_id", "text", "label")
    val w = Classifier.trainLinear(df, "doc_id", "text", "label", B, rounds = 3)
    val scored = Classifier.scoreLinear(df, "doc_id", "text", w, B)
      .as[(Long, Long, Long, Boolean)].collect()
    for ((id, _, _, pos) <- scored)
      assert(pos == (id % 2 == 0), s"doc $id misclassified after training")
    graft.io.Persisted.release(spark)
  }

  test("trainLinear: hard-sigmoid clamp and floor-div on negative gradients") {
    // one hot doc drives scores past the clamp; a negative-label doc with
    // odd feature counts exercises floorDiv rounding below zero
    val docs = Seq((1L, "hot hot hot hot hot hot hot", 1),
      (2L, "cold snap", 0), (3L, "", 1))
    val got = Classifier.trainLinear(docs.toDF("doc_id", "text", "label"),
      "doc_id", "text", "label", B, rounds = 3, lrDiv = 2L)
      .as[(Long, Long)].collect().toMap
    assert(got == Classifier.trainLinearPure(docs, B, rounds = 3, lrDiv = 2L))
    intercept[IllegalArgumentException](
      Classifier.trainLinear(docs.toDF("doc_id", "text", "label"),
        "doc_id", "text", "label", B, rounds = 0))
    graft.io.Persisted.release(spark)
  }
}
