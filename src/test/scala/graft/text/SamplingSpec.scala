package graft.text

import graft.SparkTestBase

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  test("stratified: md5-ranked per-stratum sample matches the pure twin") {
    val lang: Long => String = i => if (i % 3 == 0) "de" else "en"
    val docs = (1L to 40L).map(i => (i, lang(i))).toDF("doc_id", "lang")
    val got = Sampling.stratified(docs, "doc_id", "lang", 0.25)
      .select("doc_id", "lang", "sample_rank", "stratum_n")
      .as[(Long, String, Int, Long)].collect()
    val byLang = (1L to 40L).groupBy(lang)
    val exp = byLang.flatMap { case (l, ids) =>
      Sampling.stratifiedPure(ids.toSeq, 0.25).map(_ -> l)
    }.toSet
    assert(got.map(r => (r._1, r._2)).toSet == exp)
    // ceil(13 * .25)=4 de docs, ceil(27 * .25)=7 en docs
    assert(got.count(_._2 == "de") == 4)
    assert(got.count(_._2 == "en") == 7)
    // ranks are exactly 1..keep within each stratum; stratum_n is the
    // full stratum size, not the kept size
    for ((l, rows) <- got.groupBy(_._2)) {
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
      assert(rows.forall(_._4 == byLang(l).size))
    }
    // frac=1 keeps everything; out-of-range frac rejected
    assert(Sampling.stratified(docs, "doc_id", "lang", 1.0).count() == 40)
    intercept[IllegalArgumentException](
      Sampling.stratified(docs, "doc_id", "lang", 0.0))
  }

  test("hashThreshold: pure-twin parity, zero-shuffle plan, frac=1 keeps all") {
    val docs = (1L to 400L).map(i => (i, s"d$i")).toDF("doc_id", "payload")
    val kept = Sampling.hashThreshold(docs, "doc_id", 0.25)
      .select("doc_id").as[Long].collect().toSet
    val expect = (1L to 400L).filter(Sampling.hashThresholdPure(_, 0.25)).toSet
    assert(kept == expect)
    // binomial around frac·n, never exact by construction — sanity band only
    assert(kept.size > 60 && kept.size < 140, s"got ${kept.size}")
    assert(Sampling.hashThreshold(docs, "doc_id", 1.0).count() == 400)
    // scale shape: a pure filter — no exchange of any kind in the plan
    val plan = Sampling.hashThreshold(docs, "doc_id", 0.25)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    intercept[IllegalArgumentException](
      Sampling.hashThreshold(docs, "doc_id", 1.5))
  }
}
