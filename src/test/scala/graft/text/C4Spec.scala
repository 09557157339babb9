package graft.text

import graft.SparkTestBase

class C4Spec extends SparkTestBase {
  import spark.implicits._

  private val keepable =
    "This line has five words here." // ends in '.', ≥3 words

  test("line rules: terminal punctuation, min words, javascript veto") {
    val doc = Seq(
      keepable,
      "No terminal punctuation",          // dropped: no terminal punct
      "Short.",                           // dropped: < 3 words
      "Enable JavaScript to continue.",   // dropped: javascript
      "  Padded line survives trimming.  ",
      "",
      "Quoted words also survive fine!\"" // ends in quote
    ).mkString("\n")
    val (clean, nKept, _, _) = C4.clean(doc)
    assert(nKept == 3)
    assert(clean == Seq(keepable, "Padded line survives trimming.",
      "Quoted words also survive fine!\"").mkString("\n"))
  }

  test("page rules: min sentences, lorem ipsum / curly bracket veto") {
    val fiveSentences = Seq.fill(5)(keepable).mkString("\n")
    assert(C4.clean(fiveSentences)._4)
    // 4 sentences → dropped even though lines survive
    val four = Seq.fill(4)(keepable).mkString("\n")
    assert(!C4.clean(four)._4 && C4.clean(four)._2 == 4)
    // page veto fires on the ORIGINAL text, even in a dropped line
    assert(!C4.clean(fiveSentences + "\nlorem IPSUM boilerplate")._4)
    assert(!C4.clean(fiveSentences + "\nfunction f() { return 1; }")._4)
    // abbreviation-style periods all count toward the sentence floor
    val abbrev = "The U.S.A. has many regions."
    assert(C4.clean(abbrev)._3 == 4)
  }

  test("DataFrame and pure forms agree") {
    val docs = Seq(
      1L -> Seq.fill(5)(keepable).mkString("\n"),
      2L -> "one\ntwo\nthree",
      3L -> (Seq.fill(6)(keepable).mkString("\n") + "\n{ code }"),
      4L -> "A much longer sentence with enough words to count! Another one follows. And a third. A fourth one too. Plus a fifth.",
      5L -> "")
    val got = C4.cleanDf(docs.toDF("id", "t"), "id", "t")
      .as[(Long, String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    for ((id, text) <- docs) {
      val (c, n, s, k) = C4.clean(text)
      assert(got(id) == ((id, c, n, s, k)), s"doc $id")
    }
    // doc 4 is one long line: 5 sentence marks, kept
    assert(got(4L)._5 && got(4L)._4 == 5)
    assert(!got(5L)._5 && got(5L)._3 == 0)
  }

  test("three-sentence-span dedup: first occurrence survives, later ones removed") {
    val docs = Seq(
      1L -> "Alpha one. Beta two. Gamma three. Tail unique A.",
      2L -> "Prefix sentence here. Alpha one. Beta two. Gamma three.",
      3L -> "Alpha one. Beta two. Gamma three.",
      4L -> "Too. Short.")
    val got = C4.dupSentenceSpans(docs.toDF("id", "t"), "id", "t")
      .as[(Long, Int, Long)].collect().toSet
    val key = TextAnalysis.hash60("alpha one. beta two. gamma three.")
    // doc 1 span 0 is the global first; docs 2 (offset by its prefix) and 3
    // lose their occurrences; doc 4 has < 3 sentences
    assert(got == Set((2L, 1, key), (3L, 0, key)))
    // sentence splitting: punctuation kept, tail fragment kept, trims
    assert(C4.sentences("One. Two!  Three? tail frag") ==
      Seq("One.", "Two!", "Three?", "tail frag"))
    assert(C4.sentences("") == Seq.empty)
  }

  test("battery is a narrow plan: no Exchange") {
    val df = C4.cleanDf(Seq(1L -> "a.\nb.").toDF("id", "t"), "id", "t")
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
