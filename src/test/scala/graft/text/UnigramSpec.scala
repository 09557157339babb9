package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class UnigramSpec extends SparkTestBase {
  import spark.implicits._

  private val vocab = Unigram.seedVocab
  private val vmap = vocab.toMap

  test("viterbi picks the max-probability split, not the greedy one") {
    // "the" as one token (1.8) beats t+h+e (10.5) and th+e (5.75)
    assert(Unigram.viterbi("the", vmap) == (Seq("the"), 1800000L))
    // "theory": the(1.8)+or(2.3)+y(3.5) = 7.6 beats th+e+or+y (9.55) and
    // any char spelling (21.0)
    assert(Unigram.viterbi("theory", vmap)._1 == Seq("the", "or", "y"))
    // greedy longest-match would take "tion" upfront in "tions"… unigram
    // keeps it too (2.8 + 3.5 < any alternative) — but "ingest" shows the
    // DP: in+te? no — best is in(2.2)+g(3.5)+es(2.3)+t(3.5) = 11.5 vs
    // ing(2.6)+es(2.3)+t(3.5) = 8.4 → DP must NOT stop at the 2-char "in"
    assert(Unigram.viterbi("ingest", vmap)._1 == Seq("ing", "es", "t"))
    // single unknown-pair word falls back to chars
    assert(Unigram.viterbi("xq", vmap) == (Seq("x", "q"), 7000000L))
    assert(Unigram.viterbi("", vmap) == (Seq.empty, 0L))
    // digits and underscore are segmentable
    assert(Unigram.viterbi("a_1", vmap)._1 == Seq("a", "_", "1"))
    intercept[IllegalArgumentException](Unigram.viterbi("é", vmap))
  }

  test("tie-break: equal-cost paths choose the longest final token") {
    // craft a tie: tokens "ab"→X, "a"→Y, "b"→Z with Y+Z = X
    val v = Map("a" -> 2000000L, "b" -> 3000000L, "ab" -> 5000000L)
    val (pieces, cost) = Unigram.viterbi("ab", v)
    assert(cost == 5000000L)
    // smallest predecessor at the final cell = the single 2-char token
    assert(pieces == Seq("ab"))
  }

  test("segmentWords ≡ pure viterbi; zero-shuffle kernel") {
    val words = Seq(("the", 10L), ("theory", 3L), ("ingest", 2L),
      ("xq", 1L), ("constitution", 1L))
    val got = Unigram.segmentWords(words.toDF("word", "cnt"), vocab)
      .as[(String, Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    for ((w, c) <- words) {
      val (p, k) = Unigram.viterbi(w, vmap)
      assert(got(w) == ((c, p.mkString(" "), k)), w)
    }
    val plan = Unigram.segmentWords(words.toDF("word", "cnt"), vocab)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("emCounts: frequency-weighted exact counts, partitioning-invariant") {
    val words = Seq(("the", 10L), ("theory", 3L), ("thethe", 2L))
    // the→the×10; theory→the,or,y ×3; thethe→the,the ×2
    val exp = Unigram.emCountsPure(words, vocab)
    assert(exp("the") == 10L + 3L + 4L)
    assert(exp("or") == 3L && exp("y") == 3L)
    for (p <- Seq(1, 5)) {
      val got = Unigram.emCounts(words.toDF("word", "cnt").repartition(p), vocab)
        .as[(String, Long)].collect().toMap
      assert(got == exp, s"parts=$p")
    }
  }

  test("wordTable truncates at MaxWordLen and merges counts") {
    val docs = Seq("Constitutionally constitutionALLY the the",
      "constitutionally!").toDF("text")
    val got = Unigram.wordTable(docs, "text").as[(String, Long)]
      .collect().toMap
    assert(got == Map("constitution" -> 3L, "the" -> 2L))
    // every seed-vocab char is present so any word segments
    val (p, _) = Unigram.viterbi("constitution", vmap)
    assert(p.mkString == "constitution")
  }
}
