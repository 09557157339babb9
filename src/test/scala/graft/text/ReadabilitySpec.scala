package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ReadabilitySpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "The cat sat on the mat."),
    (2L, "Hello world! This is fine. Okay?"),
    (3L, "table there the apple juggle"),   // silent-e battery, no terminator
    (4L, ""),                               // wordless -> NULL scores
    (5L, "123 456."),                       // vowel-less tokens floor at 1
    (6L, "  ...  !?  "),                    // punctuation-only: 0 sentences
    (7L, null.asInstanceOf[String]))        // null-safe: treated as empty

  private def df = docs.toDF("doc_id", "text")

  test("syllable heuristic: vowel runs, silent e, le guard, floor at 1") {
    assert(TextAnalysis.syllables("the") == 1)      // 1 run, no adjustment
    assert(TextAnalysis.syllables("table") == 2)    // ends in -le: keep both
    assert(TextAnalysis.syllables("there") == 1)    // silent trailing e
    assert(TextAnalysis.syllables("apple") == 2)    // -le again
    assert(TextAnalysis.syllables("juggle") == 2)
    assert(TextAnalysis.syllables("123") == 1)      // no vowels -> floor
    assert(TextAnalysis.syllables("e") == 1)        // 1 run: no silent-e rule
    // Column twin agrees on every token in the corpus
    val words = docs.flatMap(d => TextAnalysis.tokens(d._2)).distinct
    val got = words.toDF("w")
      .select(col("w"), TextAnalysis.syllablesCol(col("w")).as("s"))
      .as[(String, Int)].collect().toMap
    words.foreach(w => assert(got(w) == TextAnalysis.syllables(w), w))
  }

  test("hand-computed Flesch ease and FK grade in milli") {
    val got = TextAnalysis.readabilityDf(df, "doc_id", "text")
      .select("doc_id", "n_sentences", "n_words", "n_syllables",
        "ease_milli", "grade_milli")
      .as[(Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    // doc 1: 1 sentence, 6 words, 6 syllables -> wps 6000, spw 1000
    //   ease  = 206835 - 6090 - 84600 = 116145
    //   grade = 2340 + 11800 - 15590  = -1450
    assert(got(1L) == ((1L, 6L, 6L, Some(116145L), Some(-1450L))))
    // doc 2: 3 sentences, 6 words
    assert(got(2L)._1 == 3L && got(2L)._2 == 6L)
    // doc 4: wordless -> NULL scores, zero counts
    assert(got(4L) == ((0L, 0L, 0L, None, None)))
    // doc 5: 1 sentence, 2 digit tokens flooring at one syllable each
    //   -> wps 2000, spw 1000: ease = 206835 - 2030 - 84600 = 120205,
    //      grade = 780 + 11800 - 15590 = -3010
    assert(got(5L) == ((1L, 2L, 2L, Some(120205L), Some(-3010L))))
    // doc 6: punctuation-only -> 0 sentences AND 0 words
    assert(got(6L) == ((0L, 0L, 0L, None, None)))
    // doc 7: null text must behave as empty, not size(null) = -1
    assert(got(7L) == ((0L, 0L, 0L, None, None)))
  }

  test("DataFrame form matches the pure twin on every document") {
    val got = TextAnalysis.readabilityDf(df.repartition(5), "doc_id", "text")
      .select("doc_id", "n_sentences", "n_words", "n_syllables",
        "ease_milli", "grade_milli")
      .as[(Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    docs.foreach { case (id, text) =>
      assert(got(id) == TextAnalysis.readability(text), s"doc $id")
    }
  }

  test("narrow plan: no exchange anywhere") {
    val plan = TextAnalysis.readabilityDf(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
