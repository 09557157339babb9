package graft.text

import graft.SparkTestBase

class RakeSpec extends SparkTestBase {
  import spark.implicits._

  test("stopword set covers every language-profile word (documented contract)") {
    val profiles = TextAnalysis.LangProfiles.flatMap(_._2).toSet
    assert(profiles.subsetOf(Rake.Stopwords),
      s"missing: ${profiles -- Rake.Stopwords}")
  }

  test("hand-traced scores: degree rewards long collocations") {
    val text = "deep learning models. the deep learning revolution is here. " +
      "models are good."
    // phrases: [deep learning models] [deep learning revolution] [here]
    //          [models] [good]
    // deg/freq milli: deep 3000, learning 3000, revolution 3000,
    //                 models 4/2 -> 2000, here 1000, good 1000
    val got = Rake.keywords(text, 3)
    assert(got == Seq(("deep learning revolution", 9000L),
      ("deep learning models", 8000L), ("models", 2000L)))
    // k larger than the candidate set returns everything, ordered
    assert(Rake.keywords(text, 10).size == 5)
  }

  test("ties break on phrase text; stopword-only and empty docs are empty") {
    assert(Rake.keywords("alpha beta. gamma delta.", 2) ==
      Seq(("alpha beta", 4000L), ("gamma delta", 4000L)))
    assert(Rake.keywords("the and of to in is", 5).isEmpty)
    assert(Rake.keywords("", 5).isEmpty)
    // repeated phrase string ranks once, but feeds freq/deg twice
    val rep = Rake.keywords("red car. red car.", 5)
    assert(rep == Seq(("red car", 4000L)))
    intercept[IllegalArgumentException](Rake.keywords("x", 0))
  }

  test("keywordsDf: parity with the pure kernel, ranks, narrow plan") {
    val docs = Seq(
      (1L, "deep learning models. the deep learning revolution is here. " +
        "models are good."),
      (2L, "alpha beta. gamma delta."),
      (3L, "the and of"),                 // no candidates -> no rows
      (4L, null.asInstanceOf[String]))    // null-safe
    val q = Rake.keywordsDf(docs.toDF("doc_id", "text").repartition(3),
      "doc_id", "text", 3)
    val got = q.as[(Long, String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(r => (r._2, r._3)).toSeq)
      .toMap
    assert(got(1L) == Rake.keywords(docs.head._2, 3))
    assert(got(2L) == Seq(("alpha beta", 4000L), ("gamma delta", 4000L)))
    assert(!got.contains(3L) && !got.contains(4L))
    // ranks are 1-based and dense within a doc
    val ranks = q.as[(Long, String, Long, Long)].collect()
      .filter(_._1 == 1L).map(_._4).sorted.toSeq
    assert(ranks == Seq(1L, 2L, 3L))
    // the operator itself is narrow (the Exchange above is the test's
    // own repartition) — assert on the un-repartitioned plan
    val plan = Rake.keywordsDf(docs.toDF("doc_id", "text"),
      "doc_id", "text", 3).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
