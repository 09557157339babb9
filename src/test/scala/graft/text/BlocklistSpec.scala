package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BlocklistSpec extends SparkTestBase {
  import spark.implicits._

  private val words = Seq("spam", "junk")
  private val domains = Seq("bad.example", "worse.example")

  test("flags ≡ pure twin; density not presence; domain verdict independent") {
    val docs = Seq(
      (1L, "clean text with no problems at all", "ok.example"),
      (2L, "spam spam spam spam", "ok.example"),              // 1000 milli
      (3L, "one spam token inside a long enough document to stay", "ok.example"),
      (4L, "totally clean", "bad.example"),                   // domain kill
      (5L, "", "ok.example"),
      (6L, "junk and spam together", "worse.example")
    ).toDF("doc_id", "text", "source")
    val got = Blocklist.flags(docs, "doc_id", "text", "source",
        words, domains, ratioMilliThreshold = 200L)
      .as[(Long, String, Long, Long, Long, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    for ((id, text, dom) <- Seq((1L, "clean text with no problems at all", "ok.example"),
        (2L, "spam spam spam spam", "ok.example"),
        (3L, "one spam token inside a long enough document to stay", "ok.example"),
        (4L, "totally clean", "bad.example"), (5L, "", "ok.example"),
        (6L, "junk and spam together", "worse.example"))) {
      val (nt, nb, ratio, db, blocked) =
        Blocklist.flagsPure(text, dom, words.toSet, domains.toSet, 200L)
      assert(got(id) == ((id, dom, nt, nb, ratio, db, blocked)), s"doc $id")
    }
    assert(!got(1L)._7)                      // clean survives
    assert(got(2L)._5 == 1000L && got(2L)._7) // pure spam dies on density
    assert(!got(3L)._7)                      // one token in 10 = 100 milli < 200
    assert(got(4L)._6 && got(4L)._7)         // domain kill despite clean text
    assert(!got(5L)._7 && got(5L)._3 == 0L)  // empty text: ratio 0, survives
    assert(got(6L)._7)                       // both signals
  }

  test("plan is narrow: no exchange") {
    val docs = Seq((1L, "spam", "d")).toDF("doc_id", "text", "source")
    val plan = Blocklist.flags(docs, "doc_id", "text", "source",
      words, domains, 200L).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
