package graft.text

import graft.SparkTestBase

class WordPieceSpec extends SparkTestBase {
  import spark.implicits._

  private val vocab = Set(
    "a", "b", "c", "ab", "abc", "un", "aff", "he", "hello", "wor", "x",
    "##a", "##ab", "##c", "##aff", "##able", "##wor", "##ld", "##llo", "##y")

  test("greedy longest-match-first with continuation prefixes") {
    assert(WordPiece.segmentWord("abc", vocab) == Seq("abc"))
    assert(WordPiece.segmentWord("abca", vocab) == Seq("abc", "##a"))
    assert(WordPiece.segmentWord("abcab", vocab) == Seq("abc", "##ab"))
    assert(WordPiece.segmentWord("unaffable", vocab) == Seq("un", "##aff", "##able"))
    assert(WordPiece.segmentWord("affable", vocab) == Seq("aff", "##able"))
    assert(WordPiece.segmentWord("helloworld", vocab) == Seq("hello", "##wor", "##ld"))
    assert(WordPiece.segmentWord("heabc", vocab) == Seq("he", "##ab", "##c"))
    assert(WordPiece.segmentWord("ba", vocab) == Seq("b", "##a"))
  }

  test("whole-word UNK when any position fails, and on over-length words") {
    assert(WordPiece.segmentWord("q", vocab) == Seq(WordPiece.Unk))
    assert(WordPiece.segmentWord("aq", vocab) == Seq(WordPiece.Unk))
    // a valid prefix must not leak pieces before the failure
    assert(WordPiece.segmentWord("helloq", vocab) == Seq(WordPiece.Unk))
    assert(WordPiece.segmentWord("a" * 101, vocab) == Seq(WordPiece.Unk))
    assert(WordPiece.segmentWord("a" * 100, vocab) == Seq("a") ++ Seq.fill(99)("##a"))
    assert(WordPiece.segmentWord("", vocab) == Seq.empty)
  }

  test("segmentation round-trips: dropping ## prefixes re-concatenates to the word") {
    val words = Seq("abc", "abca", "abcab", "unaffable", "affable",
      "helloworld", "heabc", "ab", "ba", "hello")
    for (w <- words) {
      val ps = WordPiece.segmentWord(w, vocab)
      assert(ps.head.take(2) != "##", s"$w: first piece must be word-initial")
      assert(ps.map(_.stripPrefix("##")).mkString == w, s"$w")
    }
  }

  test("DF kernel equals the pure kernel and stays zero-shuffle") {
    val df = Seq((1L, "unaffable"), (2L, "aq"), (3L, "helloworld"))
      .toDF("id", "word")
    val out = WordPiece.segmented(df.repartition(3), "id", "word", vocab.toSeq)
    val got = out.as[(Long, String, String)].collect().toSet
    assert(got == Set(
      (1L, "unaffable", "un|##aff|##able"),
      (2L, "aq", "[UNK]"),
      (3L, "helloworld", "hello|##wor|##ld")))
    // the kernel itself adds no shuffle on top of the input
    val plan = WordPiece.segmented(df, "id", "word", vocab.toSeq)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
