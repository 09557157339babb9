package graft.text

import graft.SparkTestBase

class PhraseMatchSpec extends SparkTestBase {
  import spark.implicits._

  test("automaton finds all occurrences incl. overlaps and nested phrases") {
    // "he"/"she"/"his"/"hers" — the canonical Aho-Corasick example
    val counts = PhraseMatch.countPure("ushers say she is hers",
      Seq("he", "she", "his", "hers"))
    // "ushers": she@1, he@2, hers@2; "say she": she, he; "hers": he, hers
    assert(counts == Map("he" -> 3L, "she" -> 2L, "hers" -> 2L))
    // self-overlapping phrase: automaton semantics count BOTH
    assert(PhraseMatch.countPure("aaa", Seq("aa")) == Map("aa" -> 2L))
    // no match → absent, not zero
    assert(PhraseMatch.countPure("xyz", Seq("he")).isEmpty)
    // matching is case-sensitive on the raw string: capital "He" missed
    assert(PhraseMatch.countPure("He said he did", Seq("he")) == Map("he" -> 1L))
  }

  test("automaton ≡ naive scan on random-ish text over a word dictionary") {
    val phrases = Seq("table scan", "row filter", "scan row", "value", "big table")
    val text = ("table scan row filter value big table scan row " * 7).trim
    val got = PhraseMatch.countPure(text, phrases)
    def naiveAll(t: String, p: String): Long = {
      var i = t.indexOf(p); var n = 0L
      while (i >= 0) { n += 1; i = t.indexOf(p, i + 1) } // overlap-allowing
      n
    }
    for (p <- phrases)
      assert(got.getOrElse(p, 0L) == naiveAll(text, p), p)
  }

  test("matchDf ≡ pure twin, zero exchanges, empty and null docs emit nothing") {
    val phrases = Seq("general liability", "aggregate limit", "policy")
    val docs = Seq(
      (1L, "the policy includes an aggregate limit per policy"),
      (2L, "general liability coverage under the policy"),
      (3L, "nothing relevant here"),
      (4L, null.asInstanceOf[String]))
    val out = PhraseMatch.matchDf(docs.toDF("doc_id", "text"), "doc_id",
      "text", phrases)
    val got = out.as[(Long, String, Long)].collect()
      .groupBy(_._1).map { case (id, rs) => id -> rs.map(r => r._2 -> r._3).toMap }
    for ((id, text) <- docs if text != null)
      assert(got.getOrElse(id, Map.empty) == PhraseMatch.countPure(text, phrases), s"doc $id")
    assert(!got.contains(3L) && !got.contains(4L))
    assert(got(1L)("policy") == 2L)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
