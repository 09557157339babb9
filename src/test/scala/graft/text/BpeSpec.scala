package graft.text

import graft.SparkTestBase

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  test("mergePair: canonical greedy left-to-right pass") {
    def m(s: String, a: String, b: String): String =
      Bpe.mergePair(s.split(" ").toVector, a, b).mkString(" ")
    assert(m("a b c", "a", "b") == "ab c")
    assert(m("a a a a", "a", "a") == "aa aa")
    assert(m("a a a", "a", "a") == "aa a")
    assert(m("x a b a b y", "a", "b") == "x ab ab y")
    assert(m("ab b", "a", "b") == "ab b") // symbols, not substrings
    assert(m("q", "a", "b") == "q")
  }

  test("trainMerges learns the dominant pairs in order, with exact counts") {
    // 'banana' x10: round 1 merges (a,n) count 20 → 'b an an a'. Round 2
    // three pairs tie at 10 — (an,a) wins ((an,*) < (b,*) on lhs, 'a' <
    // 'an' on rhs) → 'b an ana'. Round 3: (an,ana) beats (b,an) on lhs.
    val docs = Seq.fill(10)("banana").mkString(" ")
    val (merges, vocabDf) =
      Bpe.trainMerges(Seq(docs).toDF("text"), "text", k = 3)
    assert(merges.map(m => (m.round, m.lhs, m.rhs, m.pairCount)) == Seq(
      (1, "a", "n", 20L), (2, "an", "a", 10L), (3, "an", "ana", 10L)))
    val syms = vocabDf.select("syms").as[Seq[String]].collect().head
    assert(syms == Seq("b", "anana"))
    graft.io.Persisted.release(spark)
  }

  test("deterministic across partitioning; early stop on single-char vocab") {
    val words = (0 until 300).map(i => s"w${i % 7}token").mkString(" ")
    val df1 = Seq(words).toDF("text")
    val dfN = words.split(" ").toSeq.toDF("text").repartition(13)
    val (m1, _) = Bpe.trainMerges(df1, "text", k = 4)
    val (mN, _) = Bpe.trainMerges(dfN, "text", k = 4)
    assert(m1 == mN)
    graft.io.Persisted.release(spark)

    val (mE, vE) = Bpe.trainMerges(Seq("a b c a b").toDF("text"), "text", k = 5)
    assert(mE.isEmpty) // all words are single chars — no pair to merge
    assert(vE.count() == 3)
    graft.io.Persisted.release(spark)
  }
}
