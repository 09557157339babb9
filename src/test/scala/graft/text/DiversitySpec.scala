package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DiversitySpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "en", "the cat sat on the mat"),
    (2L, "en", "the cat sat"),
    (3L, "de", "der hund der hund der hund"),
    (4L, "de", ""),                       // tokenless doc contributes nothing
    (5L, "fr", "un"))                     // shorter than n=2 -> only unigrams

  private def df = docs.toDF("doc_id", "lang", "text")

  test("per-slice totals, distincts, and milli match the pure twin") {
    val got = TextAnalysis.distinctNgramStats(df, "lang", "text", Seq(1, 2))
      .select("slice", "n", "total_ngrams", "distinct_ngrams", "distinct_milli")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    for (lang <- Seq("en", "de", "fr"); n <- Seq(1, 2)) {
      val texts = docs.filter(_._2 == lang).map(_._3)
      val exp = TextAnalysis.distinctNgramStatsPure(texts, n)
      if (exp._1 == 0L)
        assert(!got.contains((lang, n.toLong)), s"$lang n=$n should be absent")
      else
        assert(got((lang, n.toLong)) == exp, s"$lang n=$n")
    }
    // hand-check: en unigrams = 9 total, distinct {the,cat,sat,on,mat} = 5
    assert(got(("en", 1L)) == ((9L, 5L, 555L)))
    // de bigrams: "der hund" x3 + "hund der" x2 -> 5 total, 2 distinct
    assert(got(("de", 2L)) == ((5L, 2L, 400L)))
    // fr has no bigrams at all
    assert(!got.contains(("fr", 2L)))
  }

  test("ngramsCol: short-doc guard returns empty, not a descending sequence") {
    val grams = df.select(
        TextAnalysis.ngramsCol(TextAnalysis.tokensCol(col("text")), 3).as("g"))
      .as[Seq[String]].collect()
    assert(grams.forall(g => g != null))
    // the 1-token and 0-token docs yield empty arrays
    assert(grams.count(_.isEmpty) == 2)
    // repeated trigram counted per occurrence downstream; array keeps order
    val en = df.filter(col("doc_id") === 1)
      .select(TextAnalysis.ngramsCol(TextAnalysis.tokensCol(col("text")), 2).as("g"))
      .as[Seq[String]].head()
    assert(en == Seq("the cat", "cat sat", "sat on", "on the", "the mat"))
  }

  test("oovStats: per-slice coverage vs the pure twin, broadcast plan") {
    val vocab = Seq("the", "cat", "der").toDF("token")
    val q = TextAnalysis.oovStats(df, "lang", "text", vocab)
    val got = q.select("slice", "n_tokens", "n_oov", "oov_milli")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4)))
      .toMap
    val vset = Set("the", "cat", "der")
    for (lang <- Seq("en", "de", "fr")) {
      val texts = docs.filter(_._2 == lang).map(_._3)
      assert(got(lang) == TextAnalysis.oovStatsPure(texts, vset), lang)
    }
    // en: 9 tokens, oov = {sat x2, on, mat} = 4 -> 444 milli
    assert(got("en") == ((9L, 4L, 444L)))
    // the vocab side must broadcast — the corpus never shuffles by token
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // a duplicated vocab row cannot double-count matches
    val dup = TextAnalysis.oovStats(df, "lang", "text",
      Seq("the", "the", "cat", "der").toDF("token"))
      .select("slice", "n_tokens").as[(String, Long)].collect().toMap
    assert(dup("en") == 9L)
    intercept[IllegalArgumentException](
      TextAnalysis.oovStats(df, "lang", "text", Seq(1).toDF("notok")))
  }

  test("partitioning invariance and refusals") {
    val a = TextAnalysis.distinctNgramStats(df, "lang", "text", Seq(1, 2, 3))
      .collect().map(_.toString).sorted.toSeq
    val b = TextAnalysis.distinctNgramStats(df.repartition(7), "lang", "text",
      Seq(1, 2, 3)).collect().map(_.toString).sorted.toSeq
    assert(a == b)
    intercept[IllegalArgumentException](
      TextAnalysis.distinctNgramStats(df, "lang", "text", Seq.empty))
    intercept[IllegalArgumentException](
      TextAnalysis.distinctNgramStats(df, "lang", "text", Seq(0)))
    intercept[IllegalArgumentException](
      TextAnalysis.distinctNgramStats(df, "lang", "text", Seq(1, 1)))
  }

  test("pmiCollocations: exact integer PMI, ordering, floors") {
    // "new york" always adjacent; "the" everywhere (low PMI)
    val texts = Seq(
      "flights to new york from the coast",
      "new york is the city that never sleeps",
      "the new york subway and the old tram",
      "the weather in new york is the usual")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TextAnalysis.pmiCollocations(docs, "text", minCount = 2, topK = 10)
      .as[(String, String, Long, Long)].collect().toSeq
    val exp = TextAnalysis.pmiCollocationsPure(texts, 2, 10)
    assert(got == exp)
    // the always-adjacent rare pair beats any "the"-pair
    assert(got.head._1 == "new" && got.head._2 == "york" && got.head._3 == 4L)
    assert(got.forall(r => r._3 >= 2L))
    // partitioning invariance
    val rep = TextAnalysis.pmiCollocations(docs.repartition(7), "text", 2, 10)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(rep == exp)
    intercept[IllegalArgumentException](
      TextAnalysis.pmiCollocations(docs, "text", 0, 10))
  }
}
