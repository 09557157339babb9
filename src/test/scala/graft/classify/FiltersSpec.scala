package graft.classify

import graft.SparkTestBase
import graft.io.Synth
import org.apache.spark.sql.functions._

class FiltersSpec extends SparkTestBase {
  import Filters._

  // ------------------------------------------------------------------ F1 --
  test("F1 keeps pages with $ amounts >= 200") {
    assert(f1DollarPage("coverage limit $200 per occurrence"))
    assert(f1DollarPage("total $1,250,000 aggregate"))
    assert(f1DollarPage("spaced $ 250 works"))
    assert(f1DollarPage("$0,200 odd grouping")) // int("0200") == 200
  }

  test("F1 drops pages below the $200 bar or with skip words") {
    assert(!f1DollarPage("only $199 here"))
    assert(!f1DollarPage("$ , stray punctuation"))
    assert(!f1DollarPage("no amounts at all"))
    assert(!f1DollarPage("EXAMPLE: limit $5,000"))
    assert(!f1DollarPage("see the CALCULATION for $300"))
    assert(!f1DollarPage("how to file: $900")) // HOW TO matches uppercased text
    assert(!f1DollarPage("$000199 leading zeros"))
    assert(!f1DollarPage(null))
  }

  test("F1 non-ASCII case folding: shared-lower shortcut gated by isAscii") {
    // 'ſ' (U+017F) uppercases into 'S' but lowercases to itself: the
    // uppercase skip check sees SAMPLE, a lowercase check would not. The
    // hot path must therefore only use the shared lower copy for ASCII.
    val t = "ſample limit $500"
    assert(!isAscii(t) && isAscii("sample limit $500"))
    assert(!f1DollarPage(t)) // skip word via uppercase semantics
    assert(f1DollarPageLowered(t, t.toLowerCase)) // the lower shortcut differs...
    // ...which is exactly why Ep1Core gates it on isAscii
  }

  test("F1 skip word only guards the dollar filter, not F2") {
    val t = "EXAMPLE page with mortgagee clause and $5,000"
    assert(!f1DollarPage(t))
    assert(f2Keyword(t))
  }

  // ------------------------------------------------------------------ F2 --
  test("F2 matches all 15 keywords case-insensitively") {
    for (k <- InterestKeywords) {
      assert(f2Keyword(s"... ${k.toUpperCase} schedule ..."), k)
      assert(f2Keyword(s"prefix $k suffix"), k)
    }
    assert(!f2Keyword("nothing relevant"))
    assert(f2Keyword("LOSS PAYEE named below"))
  }

  // ------------------------------------------------------------------ F5 --
  test("F5 gibberish classifier edge cases") {
    assert(f5Gibberish(null))
    assert(f5Gibberish(""))
    assert(f5Gibberish("short"))                       // < 10 stripped chars
    assert(f5Gibberish("          x          " + " " * 480)) // >90% whitespace
    assert(f5Gibberish("\u0001\u0002\u0003" * 20))     // control chars
    assert(f5Gibberish("1234567890 " * 10))            // <20% ascii letters
    assert(f5Gibberish("■◆▓" * 40))                    // weird chars
    assert(!f5Gibberish("This is a perfectly ordinary page of policy text."))
  }

  // ------------------------------------------------------------------ F6 --
  test("F6 scrubs non-printables and collapses spaces") {
    assert(f6Scrub("ab  c") == "a b c")
    assert(f6Scrub("keep\nnewlines\tand\ttabs") == "keep\nnewlines\tand\ttabs")
  }

  // ------------------------------------------------------------------ F7 --
  test("F7 tier validation rejects >20% non-printable samples") {
    assert(f7TierInvalid(null))
    assert(f7TierInvalid(""))
    assert(f7TierInvalid("ab" + "" * 10))
    assert(!f7TierInvalid("perfectly clean text with one  only" + "x" * 50))
    assert(!f7TierInvalid("keep\nnewlines\tand\ttabs fine"))
  }

  // ------------------------------------------------------------------ F8 --
  test("F8 money scrub") {
    assert(f8ScrubMoney(null).isEmpty)
    assert(f8ScrubMoney("  ").isEmpty)
    assert(f8ScrubMoney("$").contains("$0"))
    assert(f8ScrubMoney("$0.00").contains("$0"))
    assert(f8ScrubMoney("$ 0.00").contains("$0"))
    assert(f8ScrubMoney(" $500 ").contains("$500"))
  }

  // ------------------------------------------- pure vs Catalyst parity ----
  test("Catalyst column forms agree with pure forms on a generated corpus") {
    import spark.implicits._
    val texts: Seq[String] =
      (0L until 60L).flatMap(i => Synth.mkDoc(i, 4).spans.map(_.text)) ++ Seq(
        "only $199 here", "coverage limit $200", "$1,250,000 aggregate",
        "EXAMPLE: limit $5,000", "ILLUSTRATION with mortgagee and $900",
        "$ , stray", "$000199", "$0,200", "loss payable to bank",
        "", "short", "\u0001\u0002\u0003" * 30, "1234567890 " * 10,
        "■◆▓" * 40, "ordinary long sentence about policies and coverage")
    val df = texts.toDF("text")
    val got = df.select(
      col("text"),
      f1DollarPageCol(col("text")).as("f1"),
      f2KeywordCol(col("text")).as("f2"),
      f3LooseDollarCol(col("text")).as("f3"),
      f4ExtendedKeywordCol(col("text")).as("f4"),
      f5GibberishCol(col("text")).as("f5"),
      f6ScrubCol(col("text")).as("f6"),
      f7TierInvalidCol(col("text")).as("f7")).collect()
    for (r <- got) {
      val t = r.getString(0)
      assert(r.getBoolean(1) == f1DollarPage(t), s"F1 mismatch on: ${t.take(80)}")
      assert(r.getBoolean(2) == f2Keyword(t), s"F2 mismatch on: ${t.take(80)}")
      assert(r.getBoolean(3) == f3LooseDollar(t), s"F3 mismatch on: ${t.take(80)}")
      assert(r.getBoolean(4) == f4ExtendedKeyword(t), s"F4 mismatch on: ${t.take(80)}")
      assert(r.getBoolean(5) == f5Gibberish(t), s"F5 mismatch on: ${t.take(80)}")
      assert(r.getString(6) == f6Scrub(t), s"F6 mismatch on: ${t.take(80)}")
      assert(r.getBoolean(7) == f7TierInvalid(t), s"F7 mismatch on: ${t.take(80)}")
    }
  }
}
