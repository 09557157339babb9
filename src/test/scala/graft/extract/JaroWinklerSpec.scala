package graft.extract

import graft.SparkTestBase

class JaroWinklerSpec extends SparkTestBase {
  import spark.implicits._

  private def r6(d: Double) =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("textbook values match the engine-native reference figures") {
    // figures probed from DuckDB's jaro_winkler_similarity (the oracle)
    assert(r6(Norms.jaroWinkler("MARTHA", "MARHTA")) == 0.961111)
    assert(r6(Norms.jaroWinkler("DWAYNE", "DUANE")) == 0.84)
    assert(r6(Norms.jaroWinkler("DIXON", "DICKSONX")) == 0.813333)
    assert(r6(Norms.jaroWinkler("crate", "trace")) == 0.733333)
    assert(r6(Norms.jaroWinkler("information", "informant")) == 0.941414)
    // boost threshold: below 0.7 the prefix bonus must NOT apply
    assert(r6(Norms.jaroWinkler("aaaaaa", "aabbbb")) == 0.555556)
    assert(r6(Norms.jaro("aaaaaa", "aabbbb")) ==
      r6(Norms.jaroWinkler("aaaaaa", "aabbbb")))
    // window 0: adjacent transposition of a 2-char string never matches
    assert(Norms.jaroWinkler("ab", "ba") == 0.0)
    assert(Norms.jaroWinkler("abc", "abc") == 1.0)
    assert(Norms.jaroWinkler("abc", "xyz") == 0.0)
    // empty-side convention: 0, including both-empty
    assert(Norms.jaroWinkler("", "") == 0.0)
    assert(Norms.jaroWinkler("a", "") == 0.0)
  }

  test("jaroWinklerDf: kernel parity, null-safe, narrow plan") {
    val pairs = Seq((1L, "martha", "marhta"), (2L, "same", "same"),
      (3L, null.asInstanceOf[String], "x"))
    val q = Norms.jaroWinklerDf(pairs.toDF("id", "a", "b"), "id", "a", "b")
    val got = q.as[(Long, Double)].collect().toMap
    assert(got(1L) == r6(Norms.jaroWinkler("martha", "marhta")))
    assert(got(2L) == 1.0 && got(3L) == 0.0)
    assert(!q.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
