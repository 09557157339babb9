package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class UrlBitextSpec extends SparkTestBase {
  import spark.implicits._

  private val rows: Seq[(Long, String)] = Seq(
    (1L, "https://a.com/en/docs/intro"),
    (2L, "https://a.com/fr/docs/intro"),   // mate of 1
    (3L, "https://a.com/de/docs/intro"),   // mate of 1 and 2
    (4L, "https://a.com/en/docs/other"),   // different page
    (5L, "https://b.org/pricing"),         // no language segment
    (6L, "https://a.com/en/docs/intro"),   // same url as 1 -> same-lang pair
    (7L, "https://c.net/enterprise/en"))   // 'enterprise' is NOT a code; trailing 'en' is

  private def df = rows.toDF("doc_id", "url")

  test("pairs match the pure twin; language segments drive the key") {
    val got = Web.urlBitextPairs(df, "doc_id", "url")
      .as[(Long, Long, String, String, String)].collect().toSet
    assert(got == Web.urlBitextPairsPure(rows).toSet)
    val pairs = got.map(p => (p._1, p._2))
    // the /en/-/fr/-/de/ trio pairs completely; id_a is the LANG-earlier
    // side (de < en < fr), ids break same-lang ties
    assert(pairs.contains((1L, 2L)) && pairs.contains((3L, 1L)) &&
      pairs.contains((3L, 2L)))
    // same URL twice -> same-lang pair (id tie-break), flagged by langs
    assert(got.exists(p => p._1 == 1L && p._2 == 6L && p._3 == "en" && p._4 == "en"))
    // different page and no-lang URLs never pair
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
    // a word CONTAINING a code is not a code (whole-segment match only);
    // doc 7 keys on its trailing /en segment and finds no mate
    assert(!pairs.exists(p => p._1 == 7L || p._2 == 7L))
  }

  test("maxGroup cap drops degenerate keys; partitioning invariance") {
    val big = (1L to 100L).map(i => (i, s"https://x.com/en/hub")) ++
      Seq((900L, "https://y.com/en/a"), (901L, "https://y.com/fr/a"))
    val got = Web.urlBitextPairs(big.toDF("doc_id", "url").repartition(7),
        "doc_id", "url", maxGroup = 32)
      .as[(Long, Long, String, String, String)].collect().toSet
    // the 100-doc hub key is dropped whole; the small key survives
    assert(got.map(p => (p._1, p._2)) == Set((900L, 901L)))
    intercept[IllegalArgumentException](
      Web.urlBitextPairs(df, "doc_id", "url", maxGroup = 1))
  }
}
