package graft.text

import graft.SparkTestBase

class SliceStatsSpec extends SparkTestBase {
  import spark.implicits._

  // -------------------------------------------------- token efficiency ----
  private val effDocs = Seq(
    (1L, "en", "the cat sat on the mat"),
    (2L, "en", "it's a test, truly!"),        // punctuation splits bpe tokens
    (3L, "de", "straße größe"),               // 2-byte chars: bytes > chars
    (4L, "de", ""))                           // empty doc still counted

  test("tokenEfficiencyStats: per-slice sums and milli vs the pure twin") {
    val got = TextAnalysis.tokenEfficiencyStats(
        effDocs.toDF("doc_id", "lang", "text").repartition(3), "lang", "text")
      .select("slice", "n_docs", "total_bytes", "ws_tokens", "bpe_tokens",
        "bytes_per_ws_milli", "bytes_per_bpe_milli")
      .as[(String, Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7)))
      .toMap
    for (lang <- Seq("en", "de")) {
      val texts = effDocs.filter(_._2 == lang).map(_._3)
      val e = TextAnalysis.tokenEfficiencyPure(texts)
      assert(got(lang) == ((e._1, e._2, e._3, e._4, e._5, e._6)), lang)
    }
    // hand-check en: 22 + 19 bytes, ws = 6 + 4, bpe = 6 + ("it ' s a test , truly !" = 8)
    assert(got("en") == ((2L, 41L, 10L, 14L, Some(4100L), Some(2928L))))
    // de: "straße größe" = 12 chars but 15 UTF-8 bytes (ß/ö are 2-byte),
    // ws 2; the empty doc contributes only to n_docs
    assert(got("de")._1 == 2L && got("de")._2 == 15L && got("de")._3 == 2L)
  }

  test("tokenEfficiencyStats: tokenless slice yields NULL milli, not 0") {
    val got = TextAnalysis.tokenEfficiencyStats(
        Seq((1L, "x", "!!!")).toDF("doc_id", "s", "text"), "s", "text")
      .select("ws_tokens", "bpe_tokens", "bytes_per_ws_milli")
      .as[(Long, Long, Option[Long])].head()
    assert(got._1 == 1L)        // "!!!" is one whitespace token
    assert(got._2 == 3L)        // but three bpe punctuation tokens
    val empty = TextAnalysis.tokenEfficiencyStats(
        Seq((1L, "x", "")).toDF("doc_id", "s", "text"), "s", "text")
      .select("bytes_per_ws_milli", "bytes_per_bpe_milli")
      .as[(Option[Long], Option[Long])].head()
    assert(empty == ((None, None)))
  }

  // -------------------------------------------------- Wilson lower bound ---
  test("wilsonLowerMilli: hand value, clamps, and double-formula agreement") {
    // k=8, n=10: p̂=800 milli; double formula gives ≈ 0.49016
    val v = TextAnalysis.wilsonLowerMilli(8L, 10L)
    val z = 1.96
    val exact = (8 + z * z / 2 - z * math.sqrt(8.0 * 2 / 10 + z * z / 4)) /
      (10 + z * z)
    assert(math.abs(v - math.round(exact * 1000)) <= 2, s"$v vs $exact")
    assert(TextAnalysis.wilsonLowerMilli(0L, 50L) == 0L)
    assert(TextAnalysis.wilsonLowerMilli(5L, 5L) < 1000L)   // never certain
    // more evidence at the same rate -> strictly higher bound
    assert(TextAnalysis.wilsonLowerMilli(80L, 100L) >
      TextAnalysis.wilsonLowerMilli(8L, 10L))
    assert(TextAnalysis.wilsonLowerMilli(800L, 1000L) >
      TextAnalysis.wilsonLowerMilli(80L, 100L))
    // bound never exceeds the observed rate
    for ((k, n) <- Seq((1L, 3L), (7L, 9L), (499L, 1000L), (1L, 1L)))
      assert(TextAnalysis.wilsonLowerMilli(k, n) <= 1000L * k / n, s"$k/$n")
    intercept[IllegalArgumentException](TextAnalysis.wilsonLowerMilli(2L, 1L))
  }

  test("sliceQualityWilson: DF ≡ pure twin over hand-built slices") {
    val rows = (1L to 10L).map(i => (i, "small", i <= 8)) ++
      (1L to 100L).map(i => (i, "large", i <= 80)) ++
      (1L to 7L).map(i => (i, "none", false))
    val got = TextAnalysis.sliceQualityWilson(
        rows.toDF("doc_id", "slice", "good").repartition(5), "slice", "good")
      .select("slice", "n_docs", "n_good", "good_milli", "wilson_lower_milli")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("small") ==
      ((10L, 8L, 800L, TextAnalysis.wilsonLowerMilli(8L, 10L))))
    assert(got("large") ==
      ((100L, 80L, 800L, TextAnalysis.wilsonLowerMilli(80L, 100L))))
    assert(got("none") == ((7L, 0L, 0L, 0L)))
    // the ranking property the operator exists for
    assert(got("large")._4 > got("small")._4)
  }
}
