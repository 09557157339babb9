package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkTestBase {
  import TextAnalysis._
  import spark.implicits._

  val Texts: Seq[String] = Seq(
    "The quick brown fox jumps over the lazy dog, and that is that.",
    "el gato y la casa de los amigos es una historia que",
    "der hund und die katze das ist nicht ein problem zu",
    "le chat et la maison des amis est une histoire dans",
    "batch window spark order data column agg join small line",
    "Short.", "", "   ", "a b c d e f g h i j k l m n o p q r s t",
    "!!! ??? ;;; ...", "12345 67890 numbers only 99")

  test("hash60/hash32 parity with md5 hex parse") {
    // md5("abc") = 900150983cd24fb0...
    assert(hash60("abc") == java.lang.Long.parseLong("900150983cd24fb", 16))
    assert(hash32("abc") == java.lang.Long.parseLong("90015098", 16))
    val got = Seq("abc").toDF("s").select(hash60(col("s")), hash32(col("s"))).collect()(0)
    assert(got.getLong(0) == hash60("abc") && got.getLong(1) == hash32("abc"))
  }

  test("language id: CJK beats profiles; profiles pick by stopword count") {
    assert(langId("这是一个中文文档 with some english") == "zh")
    assert(langId(Texts(0)) == "en")
    assert(langId(Texts(1)) == "es")
    assert(langId(Texts(2)) == "de")
    assert(langId(Texts(3)) == "fr")
    assert(langId("no stopwords whatsoever xyzzy") == "en") // all-zero tie → first profile
  }

  test("token counting: whitespace and BPE-ish") {
    assert(wsTokenCount("a b  c") == 3)
    assert(wsTokenCount("  ") == 0)
    assert(wsTokenCount("a b\n") == 2) // trailing control whitespace (ADVICE)
    assert(wsTokenCount("\ta b\t") == 2)
    import spark.implicits._
    val edge = Seq("a b\n", "\ta b\t", "x\r\n", " ", "ab").toDF("t")
      .select(col("t"), wsTokenCountCol(col("t")).as("n")).collect()
    for (r <- edge)
      assert(r.getInt(1) == wsTokenCount(r.getString(0)), s"ws twin on ${r.getString(0).map(_.toInt)}")
    assert(bpeTokenCount("hello, world 42") == 5) // hello , world 4 2
    assert(bpeTokenCount("") == 0)
  }

  test("Column twins agree with pure forms across the corpus") {
    val df = Texts.toDF("text")
    val rows = df.select(col("text"),
      langIdCol(col("text")).as("lang"),
      wsTokenCountCol(col("text")).as("ws"),
      bpeTokenCountCol(col("text")).as("bpe"),
      qualityScoreCol(col("text")).as("q"),
      fingerprintCol(col("text")).as("fp"),
      tokensCol(col("text")).as("toks")).collect()
    for (r <- rows) {
      val t = r.getString(0)
      assert(r.getString(1) == langId(t), s"lang on '$t'")
      assert(r.getInt(2) == wsTokenCount(t), s"ws count on '$t'")
      assert(r.getInt(3) == bpeTokenCount(t), s"bpe count on '$t'")
      assert(math.abs(r.getDouble(4) - qualityScore(t)) < 1e-9, s"quality on '$t'")
      assert(r.getLong(5) == fingerprint(t), s"fingerprint on '$t'")
      assert(r.getSeq[String](6) == tokens(t), s"tokens on '$t'")
    }
  }

  test("quality score ranges and monotone signals") {
    assert(qualityScore("") >= 0.0 && qualityScore("") <= 1.0)
    val good = "The insurance policy describes the coverage and the limits that apply to the property. " * 6
    val bad = "!!!! 1234 ???? ;;;; 0000"
    assert(qualityScore(good) > qualityScore(bad))
  }

  test("gopher battery: pure and DataFrame forms agree; hand-checked ratios") {
    import spark.implicits._
    val battery = Seq(
      // para A repeats (A longer than B → char ratio > count ratio)
      1L -> "alpha beta gamma delta\n\nshort\n\nalpha beta gamma delta",
      // multi-line paragraph, duplicate lines inside one paragraph
      2L -> "one two\nthree four\none two\n\ntail para",
      // heavy n-gram repetition, single paragraph
      3L -> "spam ham spam ham spam ham spam",
      // whitespace-only paragraph boundaries, trailing blank lines
      4L -> "solo para\n   \n\n\n",
      5L -> "x") // 1 token: all top-n ratios 0
    val got = TextAnalysis.gopherStatsDf(battery.toDF("id", "t"), "id", "t")
      .as[(Long, Long, Double, Double, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    for ((id, text) <- battery) {
      val Some((n, dp, dpc, dlc, t2, t3, t4)) = TextAnalysis.gopherStats(text)
      assert(got(id) == ((id, n, dp, dpc, dlc, t2, t3, t4)), s"doc $id")
    }
    assert(got(1L)._3 == 0.333333)            // 1 dup para of 3
    assert(got(1L)._4 == 0.897959)            // 44 of 49 para chars in the dup group
    assert(got(2L)._5 == 0.424242)            // "one two" ×2 = 14 of 33 line chars
    assert(got(3L)._6 == 0.774194)            // tie → "ham spam" ×3, 24 of 31 chars
    assert(got(5L)._6 == 0.0 && got(5L)._7 == 0.0 && got(5L)._8 == 0.0)
    // whitespace-only docs carry no signal at all
    assert(TextAnalysis.gopherStats("  \n \n\n  ").isEmpty)
    assert(TextAnalysis.gopherStatsDf(Seq(9L -> "\n \n").toDF("id", "t"), "id", "t")
      .count() == 0)
  }

  test("language mix: per-paragraph id, majority primary, deterministic ties") {
    import spark.implicits._
    val docs = Seq(
      1L -> "the cat and the dog in that house\n\nel que los de la una es",
      2L -> "the and of that is\n\nthe cat and dog\n\nder und das ist nicht",
      3L -> "solo uno",           // one paragraph, not mixed
      4L -> "the and of\n\n中文内容")  // CJK override wins its paragraph
    val got = TextAnalysis.langMixDf(docs.toDF("id", "t"), "id", "t")
      .as[(Long, Long, Long, String, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    for ((id, text) <- docs) {
      val Some(exp) = TextAnalysis.langMix(text)
      assert(got(id) == exp, s"doc $id")
    }
    assert(got(1L) == ((2L, 2L, "en", true)))  // 1 en + 1 es → tie → en first
    assert(got(2L) == ((3L, 2L, "en", true)))  // 2 en beat 1 de
    assert(!got(3L)._4)
    assert(got(4L)._4 && got(4L)._2 == 2)
  }

  test("gopher quality battery: integer metrics, per-rule flags, parity") {
    import spark.implicits._
    val goodDoc = (("the quick brown fox and that have with " * 8) +
      "be to of lazy dog end").trim // 85 words, stopword-rich, alphabetic
    val docs = Seq(
      1L -> goodDoc,
      2L -> "short doc only five words.",                  // word-count fail
      3L -> (goodDoc + " " + Seq.fill(12)("#").mkString(" ")), // symbol fail
      4L -> (goodDoc + "\n- one\n- two\nplain line"),      // bullets ok (2 of 4)
      5L -> ("- a\n- b\n- c"),                             // 100% bullets fail
      6L -> (goodDoc.split(" ").map(w => w + "…").mkString("\n")), // ellipsis-end fail
      7L -> ("12 34 " * 40 + "the of"),                    // alpha-ratio fail
      8L -> ("zz yy xx ww vv uu " * 15))                   // stopword fail
    val got = TextAnalysis.gopherQualityDf(docs.toDF("id", "t"), "id", "t")
      .collect().map { r =>
        r.getLong(0) -> ((1 to 8).map(r.getLong).toSeq,
          (9 to 16).map(r.getBoolean).toSeq)
      }.toMap
    for ((id, text) <- docs)
      assert(got(id) == TextAnalysis.gopherQuality(text), s"doc $id")
    def kept(id: Long) = got(id)._2.last
    assert(kept(1L) && kept(4L))
    assert(!kept(2L) && !got(2L)._2.head)       // word-count flag down
    assert(!kept(3L) && !got(3L)._2(2))         // symbol flag down
    assert(!kept(5L) && !got(5L)._2(3))         // bullet flag down
    assert(!kept(6L) && !got(6L)._2(4))         // ellipsis-line flag down
    assert(!kept(7L) && !got(7L)._2(5))         // alpha flag down
    assert(!kept(8L) && !got(8L)._2(6))         // stopword flag down
  }

  test("dehyphenation: line-break joins, capitals and intra-line hyphens kept") {
    import spark.implicits._
    val cases = Seq(
      "exam-\nple" -> "example",
      "docu-\n   ment" -> "document",          // indent absorbed
      "frag-\nMent" -> "frag-\nMent",          // capital continuation kept
      "state-of-the-art" -> "state-of-the-art", // intra-line untouched
      "two-\nline bro-\nken" -> "twoline broken",
      "5-\nyear" -> "5-\nyear")                // digit before hyphen kept
    for ((in, out) <- cases)
      assert(TextAnalysis.dehyphenate(in) == out, in)
    val got = cases.map(_._1).toDF("t")
      .select(TextAnalysis.dehyphenateCol(col("t"))).as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("script mix: per-range counts, dominant with first-listed tie-break") {
    import spark.implicits._
    val docs = Seq(
      1L -> "hello world 123",
      2L -> "Привет hi",      // 6 cyrillic > 2 latin
      3L -> "ab中文",                                // 2 latin ties 2 cjk → latin (first listed)
      4L -> "!!! ---",                                       // nothing → none
      5L -> "あア한")                            // 2 kana > 1 hangul
    val cols = TextAnalysis.scriptMixCols(col("t"))
    val got = docs.toDF("id", "t").select(col("id") +: cols: _*)
      .collect().map(r => r.getLong(0) ->
        (Seq.tabulate(TextAnalysis.ScriptRanges.size)(i => r.getLong(i + 1)),
          r.getString(TextAnalysis.ScriptRanges.size + 1))).toMap
    for ((id, text) <- docs) {
      assert(got(id) == TextAnalysis.scriptMix(text), s"doc $id")
    }
    assert(got(2L)._2 == "cyrillic" && got(3L)._2 == "latin" &&
      got(4L)._2 == "none" && got(5L)._2 == "kana")
  }

  test("paragraph de-templating: first occurrence kept, order preserved") {
    import spark.implicits._
    val docs = Seq(
      1L -> "header nav\n\nbody one\n\nheader nav\n\nbody two\n\nheader nav",
      2L -> "only para",
      3L -> "a\n \n\nb\n\n\na", // messy separators still split
      4L -> "  \n\n   ")        // nothing survives
    val got = TextAnalysis.dedupParagraphsDf(docs.toDF("id", "t"), "id", "t")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    for ((id, text) <- docs) {
      val (c, n, rm) = TextAnalysis.dedupParagraphs(text)
      assert(got(id) == ((id, c, n, rm)), s"doc $id")
    }
    assert(got(1L)._2 == "header nav\n\nbody one\n\nbody two")
    assert(got(1L)._3 == 5 && got(1L)._4 == 2)
    assert(got(3L)._2 == "a\n\nb" && got(3L)._4 == 1)
    assert(got(4L)._2 == "" && got(4L)._3 == 0)
    // narrow plan: no Exchange
    val plan = TextAnalysis.dedupParagraphsDf(docs.toDF("id", "t"), "id", "t")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("mojibake repair: cp1252 round-trip, idempotence, Column/pure parity") {
    import spark.implicits._
    val clean = "café — the “naïve” résumé… 90° ©"
    // mechanical corruption: utf8 bytes of the clean string decoded cp1252;
    // chars outside the table (ï here) stay corrupted, everything else heals
    val bad = new String(clean.getBytes("UTF-8"), "windows-1252")
    val fixed = TextAnalysis.fixMojibake(bad)
    assert(fixed.contains("café") && fixed.contains("—") &&
      fixed.contains("“") && fixed.contains("résumé…") &&
      fixed.contains("90°") && fixed.contains("©"))
    // already-clean text is a fixpoint
    assert(TextAnalysis.fixMojibake(clean) == clean)
    assert(TextAnalysis.fixMojibake(fixed) == fixed)
    // Column form replays the pure chain exactly
    val got = Seq(bad, clean, "plain ascii.").toDF("t")
      .select(TextAnalysis.fixMojibakeCol(col("t"))).as[String].collect().toSeq
    assert(got == Seq(fixed, clean, "plain ascii."))
  }

  test("repetition stats: pure and DataFrame forms agree") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta\nalpha beta\ngamma delta\n  \n"), // 1 dup of 3 lines
      (2L, "the cat the cat the cat"), // top bigram 'the cat' 3/5... sliding
      (3L, "unique one\nunique two"),
      (4L, "x")).toDF("id", "t")
    val got = TextAnalysis.repetitionStatsDf(docs, "id", "t")
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    val rows = Seq(
      1L -> "alpha beta\nalpha beta\ngamma delta\n  \n",
      2L -> "the cat the cat the cat",
      3L -> "unique one\nunique two",
      4L -> "x")
    for ((id, text) <- rows) {
      val Some((n, dup, bg)) = TextAnalysis.repetitionStats(text)
      assert(got(id) == ((id, n, dup, bg)), s"doc $id")
    }
    assert(got(1L)._3 == 0.333333) // 1 duplicate line of 3
    assert(got(2L)._4 == 0.6) // 'the cat' occurs 3x of 5 bigrams
    assert(got(4L)._4 == 0.0) // <2 tokens → no bigram signal
  }

  test("fingerprint is whitespace/case insensitive, content sensitive") {
    assert(fingerprint("Hello  World") == fingerprint("hello world"))
    assert(fingerprint(" hello world \n") == fingerprint("hello world"))
    assert(fingerprint("hello world") != fingerprint("hello worlds"))
  }

  test("topTokensDf: counts, deterministic tie-break, distributed top-k plan") {
    import spark.implicits._
    val df = Seq("b a a", "c b a", "d d", "e").toDF("text")
    val top = TextAnalysis.topTokensDf(df, "text", 3)
    val got = top.as[(String, Long)].collect().toSeq
    // ties at count 2 (b, d) break on token text
    assert(got == Seq(("a", 3L), ("b", 2L), ("d", 2L)))
    assert(TextAnalysis.topTokensDf(df, "text", 4)
      .as[(String, Long)].collect().toSeq ==
      Seq(("a", 3L), ("b", 2L), ("d", 2L), ("c", 1L)))
    // plan: partial agg + TakeOrderedAndProject, never a global sort
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("pii scrub: redaction classes, ordering, Column/pure parity") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val samples = Seq(
      1L -> "mail a.b-c_d%e+f@sub.example.co and x@y.io now",
      2L -> "call (555) 123-4567 or 555-987-6543 or 555.111.2222",
      3L -> "ssn 123-45-6789 but order 123-456-7890 is a phone",
      4L -> "no pii here, just 12345 and v1.2.3",
      5L -> "combo: a@b.cc (111) 222-3333 999-88-7777")
    for ((_, t) <- samples) {
      val s = scrubPii(t)
      assert(!EmailRe.r.findFirstIn(s).isDefined, s)
      assert(!SsnRe.r.findFirstIn(s).isDefined, s)
    }
    assert(scrubPii(samples(2)._2) ==
      "ssn [SSN] but order [PHONE] is a phone")
    assert(piiCounts(samples(4)._2) == ((1, 1, 1)))
    assert(piiCounts(samples(3)._2) == ((0, 0, 0)))
    // Column twin parity over the sample corpus
    val df = samples.toDF("id", "t")
    val (e, p, n) = piiCountsCol(col("t"))
    val got = df.select(col("id"), scrubPiiCol(col("t")),
      e.cast("int"), p.cast("int"), n.cast("int"))
      .as[(Long, String, Int, Int, Int)].collect().sortBy(_._1)
    for (((id, t), (gid, clean, ge, gp, gn)) <- samples.zip(got)) {
      assert(id == gid)
      assert(clean == scrubPii(t), s"doc $id")
      assert(((ge, gp, gn)) == piiCounts(t), s"doc $id counts")
    }
  }

  test("foldAscii: accents, ligatures, fullwidth; Column ≡ pure; idempotent") {
    val cases = Seq(
      "Café naïve émigré" -> "Cafe naive emigre",
      "ÆØŁ straße Þing" -> "AEOL strasse THing",
      "ＦＵＬＬｗｉｄｔｈ　ＡＢＣ！" -> "FULLwidth ABC!",
      "Łódź đavola ığdır" -> "Lodz davola igdir",
      "plain ascii stays" -> "plain ascii stays",
      "中文 stays 中文" -> "中文 stays 中文") // non-Latin passes through
    for ((in, want) <- cases)
      assert(foldAscii(in) == want, in)
    val got = cases.map(_._1).toDF("t")
      .select(foldAsciiCol(col("t"))).as[String].collect().toSeq
    assert(got == cases.map(_._2))
    // idempotent: folding folded text is a no-op
    for ((_, want) <- cases) assert(foldAscii(want) == want)
    // table sanity: 1:1 arms align, no duplicate sources
    assert(foldFrom.length == foldTo.length)
    assert(foldFrom.distinct.length == foldFrom.length)
  }

  test("char entropy: pure ≡ DF, ordering and edge cases") {
    import TextAnalysis.charEntropy
    // uniform over 4 chars: H = ln 4 exactly (sum term is 4·2·ln2... per
    // count 2: lnMicro(2)·2·4 summed / 8)
    val (n, d, h) = charEntropy("aabbccdd")
    assert(n == 8 && d == 4)
    assert(Math.abs(h - Math.round(Math.log(4) * 1e6)) <= 1, h.toString)
    // single repeated char compresses to zero entropy
    assert(charEntropy("aaaaaaaa")._3 == 0L)
    // empty doc: defined as (0, 0, 0), not null
    assert(charEntropy("") == (0L, 0L, 0L))
    // more-random text scores strictly higher than repetitive text
    assert(charEntropy("abcdefgh")._3 > charEntropy("aabbccdd")._3)
    assert(charEntropy("aabbccdd")._3 > charEntropy("aaaaaaab")._3)
    val docs = Seq(("d1", "aabbccdd"), ("d2", "aaaaaaaa"), ("d3", ""),
      ("d4", "the quick brown fox"))
    val got = TextAnalysis.charEntropyDf(
      docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val want = docs.sortBy(_._1).map { case (id, t) =>
      val (nn, dd, hh) = charEntropy(t); (id, nn, dd, hh)
    }
    assert(got == want)
  }

  test("markdownStrip: every rule fires; Column ≡ pure; plan narrow") {
    import org.apache.spark.sql.functions.col
    val md = "# Title\n\n> a quote\n\nintro **bold** and *ital* and " +
      "`code x` here\n\n- item one\n- see [docs](http://e.com/d) now\n\n" +
      "```\nif (a < b) { dropped }\n```\n\n1. first\n2. second\n\n---\n\n" +
      "tail ![alt text](img.png) and <http://auto.link> done __under__ _em_"
    val want = "Title a quote intro bold and ital and code x here " +
      "item one see docs now first second tail alt text and done under em"
    assert(TextAnalysis.markdownStrip(md) == want)
    // null, empty, plain prose pass through
    assert(TextAnalysis.markdownStrip(null) == "")
    assert(TextAnalysis.markdownStrip("plain words stay") == "plain words stay")
    // documented limitation: snake_case loses underscores via emphasis rules
    assert(TextAnalysis.markdownStrip("a snake_case_name b") == "a snakecasename b")
    // unterminated fence: the block rule needs a closing pair and eats
    // nothing; the inline rule then consumes one empty ``-pair, leaving
    // the odd backtick — no text is lost
    assert(TextAnalysis.markdownStrip("pre ```no close") == "pre `no close")
    val df = Seq(("d1", md), ("d2", null: String)).toDF("id", "t")
    val out = df.select(col("id"),
      TextAnalysis.markdownStripCol(col("t")).as("c"))
      .as[(String, Option[String])].collect().toMap
    assert(out("d1").contains(want) && out("d2").isEmpty)
    val plan = df.select(TextAnalysis.markdownStripCol(col("t")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("ccScrub: Luhn gate separates cards from lookalike serials") {
    import TextAnalysis.{ccScrub, luhnValid}
    // classic test numbers: valid Visa/Amex; +1 on the check digit breaks
    assert(luhnValid("4111111111111111"))
    assert(luhnValid("378282246310005"))
    assert(!luhnValid("4111111111111112"))
    assert(!luhnValid("123456789012")) // 12 digits: too short by contract
    assert(ccScrub("pay 4111111111111111 now") == ("pay [CARD] now", 1, 1))
    // invalid candidate stays verbatim — it's an order id, not PII
    assert(ccScrub("order 4111111111111112 ok") ==
      ("order 4111111111111112 ok", 1, 0))
    // separators: spaces and dashes redact the same card
    assert(ccScrub("c 4111-1111-1111-1111 d 4111 1111 1111 1111 e")._1 ==
      "c [CARD] d [CARD] e")
    // SSN/phone shapes are far below 13 digits: zero candidates
    assert(ccScrub("ssn 123-45-6789 tel 555-123-4567") ==
      ("ssn 123-45-6789 tel 555-123-4567", 0, 0))
    assert(ccScrub(null) == ("", 0, 0))
  }

  test("confusableScrub: invisibles deleted, homoglyphs mapped, counts; Column ≡ pure") {
    import org.apache.spark.sql.functions.col
    import TextAnalysis.{confusableScrub, confusableCounts}
    // "free here" hiding a ZWSP and two Cyrillic е (U+0435)
    val dirty = "fr​ee hеrе sаle"
    assert(confusableScrub(dirty) == "free here sale")
    assert(confusableCounts(dirty) == ((1, 3)))
    // genuine non-lookalike Cyrillic survives untouched (ж has no twin)
    assert(confusableScrub("жизнь") == "жизнь")
    assert(confusableCounts("жизнь")._2 == 0)
    // uppercase + Greek mappings
    // uppercase Cyrillic С/А (U+0421/U+0410) and Greek Ο (U+039F)
    assert(confusableScrub("САLE Οk") == "CALE Ok")
    assert(confusableScrub(null) == "")
    val df = Seq(("d1", dirty), ("d2", null: String)).toDF("id", "t")
    val (inv, homo) = TextAnalysis.confusableCountsCol(col("t"))
    val out = df.select(col("id"),
      TextAnalysis.confusableScrubCol(col("t")).as("c"),
      inv.as("ni"), homo.as("nh"))
      .as[(String, Option[String], Option[Int], Option[Int])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("d1") == ((Some("free here sale"), Some(1), Some(3))))
    assert(out("d2") == ((None, None, None)))
    val plan = df.select(TextAnalysis.confusableScrubCol(col("t")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("ccScrubDf ≡ pure kernel and the plan is narrow") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      ("d1", "pay 4111111111111111 not 4111111111111112"),
      ("d2", "plain"), ("d3", null: String)).toDF("doc_id", "t")
    val got = TextAnalysis.ccScrubDf(docs, "doc_id", "t")
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == Set(
      ("d1", "pay [CARD] not 4111111111111112", 2L, 1L),
      ("d2", "plain", 0L, 0L), ("d3", "", 0L, 0L)))
    val plan = TextAnalysis.ccScrubDf(docs, "doc_id", "t")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
