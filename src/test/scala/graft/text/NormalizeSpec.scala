package graft.text

import graft.SparkTestBase

class NormalizeSpec extends SparkTestBase {
  import spark.implicits._

  test("entityDecode: named, decimal, hex, single-pass, conservative") {
    assert(Normalize.entityDecode("a &amp; b &lt;c&gt;") == "a & b <c>")
    assert(Normalize.entityDecode("&#65;&#x42;&#x63;") == "ABc")
    // HTML5 numeric-reference markers are case-insensitive: &#X41; too
    assert(Normalize.entityDecode("&#X41;&#Xe9;") == "Aé")
    assert(Normalize.entityDecode("caf&eacute; &copy;2024") ==
      "caf\u00e9 \u00a92024")
    // single pass: the decoded &lt; is NOT re-decoded (HTML5 behavior)
    assert(Normalize.entityDecode("&amp;lt;") == "&lt;")
    // unknown names, bare ampersands, out-of-range and surrogate numerics
    // pass through verbatim
    assert(Normalize.entityDecode("&foo; & &#xD800; &#1114112; &#2;") ==
      "&foo; & &#xD800; &#1114112; &#2;")
    // allowed control refs: tab/LF/CR
    assert(Normalize.entityDecode("&#9;&#10;&#13;") == "\t\n\r")
    assert(Normalize.entityDecode("no entities") == "no entities")
    assert(Normalize.entityDecode(null) == null)
  }

  test("nfc: combining sequences compose; composed text is unchanged") {
    assert(Normalize.nfc("cafe\u0301") == "caf\u00e9")
    assert(Normalize.nfc("caf\u00e9") == "caf\u00e9")
    assert(Normalize.nfc("\u212b") == "\u00c5")  // ANGSTROM SIGN -> A-ring
    assert(Normalize.nfc("ascii") == "ascii")
  }

  test("normalizeDf: kernel parity, change flags, narrow plan") {
    val docs = Seq(
      (1L, "a &amp; b"),                // entity change only
      (2L, "cafe\u0301"),              // nfc change only
      (3L, "x &#233;e\u0301"),        // both: entity e-acute + composition
      (4L, "plain"))
    val q = Normalize.normalizeDf(docs.toDF("doc_id", "text"),
      "doc_id", "text")
    val got = q.as[(Long, String, Boolean, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == (("a & b", true, false)))
    assert(got(2L) == (("caf\u00e9", false, true)))
    assert(got(3L) == (("x \u00e9\u00e9", true, true)))
    assert(got(4L) == (("plain", false, false)))
    docs.foreach { case (id, t) =>
      val de = Normalize.entityDecode(t)
      assert(got(id)._1 == Normalize.nfc(de), id)
    }
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
