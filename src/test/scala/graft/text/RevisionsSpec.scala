package graft.text

import graft.SparkTestBase

class RevisionsSpec extends SparkTestBase {
  import spark.implicits._

  /** Textbook full-matrix Levenshtein for cross-checking the band. */
  private def full(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("banded kernel: textbook values, band ≡ full matrix, saturation") {
    assert(Revisions.editDistanceCapped("kitten", "sitting", 10) == 3)
    assert(Revisions.editDistanceCapped("flaw", "lawn", 10) == 2)
    assert(Revisions.editDistanceCapped("", "abc", 10) == 3)
    assert(Revisions.editDistanceCapped("abc", "abc", 10) == 0)
    // saturation: distance above the cap answers exactly cap + 1
    assert(Revisions.editDistanceCapped("aaaaaaaa", "bbbbbbbb", 3) == 4)
    // length-difference shortcut
    assert(Revisions.editDistanceCapped("a", "a" * 20, 5) == 6)
    // band ≡ full matrix on a deterministic battery whenever dist ≤ cap
    val words = Seq("", "a", "ab", "abcdef", "abcdeg", "xbcdef", "fedcba",
      "abcabcabc", "abcabxabc", "zzzzz", "abzde")
    for (x <- words; y <- words; cap <- Seq(1, 2, 3, 8)) {
      val exact = full(x, y)
      val got = Revisions.editDistanceCapped(x, y, cap)
      if (exact <= cap) assert(got == exact, s"'$x'/'$y' cap=$cap")
      else assert(got == cap + 1, s"'$x'/'$y' cap=$cap saturate")
    }
    intercept[IllegalArgumentException](
      Revisions.editDistanceCapped("a", "b", -1))
  }

  test("revisionDiffDf: caps, maxLen nulls, changed fraction, kernel parity") {
    val pairs = Seq(
      (1L, "hello world", "hello world"),        // dist 0
      (2L, "hello world", "Xello world"),        // dist 1 -> 90 milli
      (3L, "abcdefgh", "hgfedcba"),              // saturates at cap 3 -> 4
      (4L, "x" * 50, "x" * 50),                  // beyond maxLen -> NULLs
      (5L, null.asInstanceOf[String], "ab"))     // null = empty
    val got = Revisions.revisionDiffDf(pairs.toDF("id", "a", "b")
        .repartition(3), "id", "a", "b", cap = 3, maxLen = 20)
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((11L, 11L, Some(0L), Some(0L))))
    assert(got(2L) == ((11L, 11L, Some(1L), Some(90L))))
    assert(got(3L)._3 == Some(4L) && got(3L)._4.isEmpty)  // saturated floor
    assert(got(4L) == ((50L, 50L, None, None)))
    assert(got(5L) == ((0L, 2L, Some(2L), Some(1000L))))
    // the DF path (Spark's native threshold levenshtein) must agree with
    // the engine-independent banded kernel on every in-range pair
    pairs.filter(p => p._2 != null && p._2.length <= 20 &&
        p._3.length <= 20).foreach { case (id, x, y) =>
      assert(got(id)._3 ==
        Some(Revisions.editDistanceCapped(x, y, 3).toLong), id)
    }
    // code-point alignment: a non-BMP char is ONE edit unit in the
    // kernel, the native expression, and length() alike
    val gclef = new String(Character.toChars(0x1D11E))
    assert(Revisions.editDistanceCapped(gclef, "", 5) == 1)
    val nb = Revisions.revisionDiffDf(
        Seq((9L, gclef + "abc", "abc")).toDF("id", "a", "b"),
        "id", "a", "b", 3, 20)
      .as[(Long, Long, Long, Option[Long], Option[Long])].head()
    assert(nb == ((9L, 4L, 3L, Some(1L), Some(250L))))
    // whole-stage codegen projection: no Exchange, no typed kernel
    val plan = Revisions.revisionDiffDf(pairs.toDF("id", "a", "b"),
      "id", "a", "b", 3, 20).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("MapPartitions"),
      plan)
    intercept[IllegalArgumentException](
      Revisions.revisionDiffDf(pairs.toDF("id", "a", "b"), "id", "a", "b",
        cap = 0, maxLen = 10))
  }
}
