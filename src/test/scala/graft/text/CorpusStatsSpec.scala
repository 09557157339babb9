package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CorpusStatsSpec extends SparkTestBase {
  import spark.implicits._

  // ---------------------------------------------------- length outliers ----
  private val lenDocs =
    (Seq.fill(4)(10) :+ 100).zipWithIndex.map { case (n, i) =>
      (i.toLong, "mono", "x" * n) } ++
    ((1 to 7) :+ 100).zipWithIndex.map { case (n, i) =>
      (100L + i, "spread", "y" * n) }

  test("lengthOutliers: hand medians/MADs incl. the degenerate MAD=0 case") {
    val got = CorpusStats.lengthOutliers(
        lenDocs.toDF("doc_id", "lang", "text").repartition(5),
        "doc_id", "lang", "text")
      .select("doc_id", "slice", "len", "median_len", "mad", "outlier")
      .as[(Long, String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // mono: lens [10,10,10,10,100] -> median 10, MAD 0; only the 100 deviates
    assert(got(0L)._4 == 10L && got(0L)._5 == 0L && !got(0L)._6)
    assert(got(4L)._3 == 100L && got(4L)._6)   // MAD=0: any deviation flags
    // spread: lens 1..7,100 -> lower median 4, MAD 2; |x-4|>6 flags only 100
    assert(got(100L)._4 == 4L && got(100L)._5 == 2L)
    assert((100L to 106L).forall(i => !got(i)._6))
    assert(got(107L)._3 == 100L && got(107L)._6)
    // pure-twin parity per slice
    for (slice <- Seq("mono", "spread")) {
      val rows = lenDocs.filter(_._2 == slice)
      val (m, mad, flags) = CorpusStats.lengthOutliersPure(
        rows.map(_._3.length.toLong))
      rows.map(_._1).zip(flags).foreach { case (id, f) =>
        assert(got(id)._4 == m && got(id)._5 == mad && got(id)._6 == f, id)
      }
    }
  }

  test("lengthOutliers: NULL-text docs dropped from stats AND output") {
    // 4×len-10 docs + one null-text doc: the NULL must not enter the
    // histogram (nulls-first window ordering would otherwise count it as
    // the smallest length and pull the median to 10 anyway here, but with
    // more nulls it skews low) and the doc emits NO row at all
    val rows = Seq((0L, "m", "x" * 10), (1L, "m", "x" * 10),
      (2L, "m", "x" * 10), (3L, "m", "x" * 40), (4L, "m", null))
    val got = CorpusStats.lengthOutliers(
        rows.toDF("doc_id", "lang", "text").repartition(3),
        "doc_id", "lang", "text")
      .select("doc_id", "len", "median_len", "mad", "outlier")
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(!got.contains(4L))                  // null-text doc: no output row
    assert(got.size == 4)
    assert(got(0L)._3 == 10L && got(0L)._4 == 0L)  // stats over 4 non-null lens
    assert(got(3L)._5)                         // MAD=0: the 40 deviates
  }

  test("sliceMedian: histogram-exact lower medians, NULL drop, pure twin") {
    val rows = Seq((1L, "a", Some(10L)), (2L, "a", Some(30L)),
      (3L, "a", Some(20L)), (4L, "a", None),
      (5L, "b", Some(7L)), (6L, "c", None))
    val got = CorpusStats.sliceMedian(
        rows.map(r => (r._1, r._2, r._3.map(Long.box).orNull))
          .toDF("id", "s", "v").repartition(3), "s", "v")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    // a: values {10,20,30} -> n=3 (NULL dropped), lower median 20
    assert(got("a") == ((3L, 20L)))
    assert(got("b") == ((1L, 7L)))
    assert(!got.contains("c"))            // all-NULL slice emits nothing
    assert(CorpusStats.sliceMedianPure(Seq(10L, 30L, 20L)) == Some((3L, 20L)))
    assert(CorpusStats.sliceMedianPure(Seq(1L, 2L)) == Some((2L, 1L)))
    assert(CorpusStats.sliceMedianPure(Nil).isEmpty)
  }

  test("slicePercentile: rank arithmetic, q=500 ≡ median, edges, pure twin") {
    val vs = Seq(10L, 20L, 30L, 40L, 50L, 60L, 70L, 80L, 90L, 100L)
    val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, "a", v) }
      .toDF("id", "s", "v").repartition(3)
    def pct(q: Int) = CorpusStats.slicePercentile(df, "s", "v", q)
      .select("n", "pct").as[(Long, Long)].head()
    // 0-based index (n-1)*q div 1000 over 10 values 10..100
    assert(pct(0) == ((10L, 10L)))       // min
    assert(pct(100) == ((10L, 10L)))     // idx (9*100)div 1000 = 0
    assert(pct(500) == ((10L, 50L)))     // idx 4 — the lower median
    assert(pct(900) == ((10L, 90L)))     // idx 8
    assert(pct(1000) == ((10L, 100L)))   // max
    // q=500 agrees with sliceMedian on the same data
    val med = CorpusStats.sliceMedian(df, "s", "v")
      .select("median").as[Long].head()
    assert(med == 50L && pct(500)._2 == med)
    for (q <- Seq(0, 100, 250, 500, 900, 1000))
      assert(Some(pct(q)) == CorpusStats.slicePercentilePure(vs, q), q)
    intercept[IllegalArgumentException](
      CorpusStats.slicePercentile(df, "s", "v", 1001))
    intercept[IllegalArgumentException](
      CorpusStats.slicePercentilePure(vs, 1001))
  }

  // ----------------------------------------------- domain concentration ----
  test("domainConcentration: hand HHI values and pure-twin parity") {
    val rows = Seq("a", "a", "a", "b").map(("s1", _)) ++
      Seq("z").map(("s2", _)) ++
      Seq("p", "q", "r", "t").map(("s3", _))
    val got = CorpusStats.domainConcentration(
        rows.toDF("lang", "domain").repartition(3), "lang", "domain")
      .select("slice", "n_docs", "n_domains", "hhi_micro", "top_share_milli")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // s1: counts {3,1} -> hhi = 10e6/16 = 625000, top share 750
    assert(got("s1") == ((4L, 2L, 625000L, 750L)))
    // s2: monoculture -> exactly 1e6
    assert(got("s2") == ((1L, 1L, 1000000L, 1000L)))
    // s3: uniform over 4 -> 250000
    assert(got("s3") == ((4L, 4L, 250000L, 250L)))
    for ((slice, _) <- got) {
      val doms = rows.filter(_._1 == slice).map(_._2)
      val e = CorpusStats.domainConcentrationPure(doms)
      assert(got(slice) == e, slice)
    }
  }

  // ------------------------------------------------- vocabulary growth -----
  test("vocabGrowth: hand curve, cumulative laws, pure-twin parity") {
    // doc i: common token x + t{i/4} -> firsts at ids 0, 0, 4, 8
    val rows = (0L to 9L).map(i => (i, s"x t${i / 4}"))
    val got = CorpusStats.vocabGrowth(
        rows.toDF("doc_id", "text").repartition(4), "doc_id", "text",
        buckets = 5)
      .select("bucket", "n_docs", "new_tokens", "cum_docs", "cum_tokens")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (0L, 2L, 2L, 2L, 2L), (1L, 2L, 0L, 4L, 2L), (2L, 2L, 1L, 6L, 3L),
      (3L, 2L, 0L, 8L, 3L), (4L, 2L, 1L, 10L, 4L)))
    assert(got == CorpusStats.vocabGrowthPure(rows, 5))
    // final cumulative = corpus totals
    assert(got.last._4 == 10L && got.last._5 == 4L)
    intercept[IllegalArgumentException](
      CorpusStats.vocabGrowth(rows.toDF("doc_id", "text"), "doc_id",
        "text", buckets = 1))
  }

  // -------------------------------------------------------- JS matrix ------
  test("jsDivergence: identical 0, disjoint ln2, parity, full matrix") {
    val docs = Seq(
      (1L, "a1", "alpha alpha beta"), (2L, "a2", "alpha alpha beta"),
      (3L, "b", "gamma delta gamma"),
      (4L, "c", "alpha gamma gamma"))
    val got = CorpusStats.jsDivergence(
        docs.toDF("doc_id", "lang", "text").repartition(3), "lang", "text")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // all C(4,2) ordered pairs present, even the disjoint one
    assert(got.size == 6)
    assert(got(("a1", "a2")) == 0L)             // identical distributions
    assert(got(("a1", "b")) == 693147L)         // zero shared vocabulary
    // parity with the pure twin on every pair
    val slices = Seq("a1", "a2", "b", "c")
      .map(s => s -> docs.filter(_._2 == s).map(_._3)).toMap
    for (x <- slices.keys; y <- slices.keys if x < y)
      assert(got((x, y)) == CorpusStats.jsDivergencePure(slices(x),
        slices(y)), s"$x/$y")
    // JS is bounded by ln 2 and non-negative
    assert(got.values.forall(v => v >= 0L && v <= 693147L))
  }

  // ------------------------------------------------ signal correlation -----
  test("signalCorrelation: exact ±1e6 on linear data, NULL on constants") {
    // "ab " * i: chars = 3i, ws = i, bpe = i -> all pairs perfectly linear
    val linear = (1 to 5).map(i => (i.toLong, "ab " * i))
    val got = CorpusStats.signalCorrelation(
        linear.toDF("doc_id", "text"), "text")
      .as[(Long, Option[Long], Option[Long], Option[Long])].head()
    assert(got == ((5L, Some(1000000L), Some(1000000L), Some(1000000L))))
    // identical docs -> zero variance -> NULL everywhere
    val const = Seq((1L, "same text"), (2L, "same text"))
    val g2 = CorpusStats.signalCorrelation(const.toDF("doc_id", "text"),
      "text").as[(Long, Option[Long], Option[Long], Option[Long])].head()
    assert(g2 == ((2L, None, None, None)))
    // pure twin: exact -1e6 on anti-correlated integers
    assert(CorpusStats.pearsonMicro(Seq(1L, 2L, 3L, 4L, 5L),
      Seq(10L, 8L, 6L, 4L, 2L)) == Some(-1000000L))
    assert(CorpusStats.pearsonMicro(Seq(1L, 1L), Seq(3L, 9L)).isEmpty)
    intercept[IllegalArgumentException](
      CorpusStats.pearsonMicro(Seq(1L), Seq(1L, 2L)))
  }

  test("signalCorrelation: DF ≡ pure twin on a varied corpus") {
    val docs = (1L to 40L).map { i =>
      val words = (0L until (i % 7) + 1).map(j => "w" * ((i + j) % 5 + 1).toInt)
      (i, words.mkString(" ") + (if (i % 3 == 0) "!!" else ""))
    }
    val got = CorpusStats.signalCorrelation(
        docs.toDF("doc_id", "text").repartition(4), "text")
      .as[(Long, Option[Long], Option[Long], Option[Long])].head()
    val x1 = docs.map(_._2.length.toLong)
    val x2 = docs.map(d => TextAnalysis.wsTokenCount(d._2).toLong)
    val x3 = docs.map(d => TextAnalysis.bpeTokenCount(d._2).toLong)
    assert(got == ((40L, CorpusStats.pearsonMicro(x1, x2),
      CorpusStats.pearsonMicro(x1, x3), CorpusStats.pearsonMicro(x2, x3))))
  }

  // ------------------------------------------------------- Zipf slope ------
  test("zipfSlope: sign, flat-vocab zero, pure-twin parity, guards") {
    val docs = Seq(
      (1L, "en", (Seq.fill(8)("alpha") ++ Seq.fill(4)("beta") ++
        Seq.fill(2)("gamma") ++ Seq("delta")).mkString(" ")),
      (2L, "flat", "aa bb cc dd"),     // uniform counts -> slope 0
      (3L, "tiny", "solo"))            // 1 token -> no output
    val got = CorpusStats.zipfSlope(
        docs.toDF("doc_id", "lang", "text").repartition(4), "lang", "text",
        k = 50)
      .select("slice", "n_ranks", "slope_milli")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(got("en")._2 < -500L, got("en"))   // steeply decreasing counts
    assert(got("flat") == ((4L, 0L)))
    assert(!got.contains("tiny"))
    for (slice <- Seq("en", "flat")) {
      val texts = docs.filter(_._2 == slice).map(_._3)
      assert(Some(got(slice)) == CorpusStats.zipfSlopePure(texts), slice)
    }
    // the corpus-scale top-k goes through the native bounded-heap operator
    val plan = CorpusStats.zipfSlope(
      docs.toDF("doc_id", "lang", "text"), "lang", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("GraftTopKPartial"), plan)
    intercept[IllegalArgumentException](
      CorpusStats.zipfSlope(docs.toDF("doc_id", "lang", "text"),
        "lang", "text", k = 1))
    intercept[IllegalArgumentException](
      CorpusStats.lengthOutliers(lenDocs.toDF("doc_id", "lang", "text"),
        "doc_id", "lang", "text", kMilli = 0L))
  }
}
