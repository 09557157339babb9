package graft.extract

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class NormsSpec extends SparkTestBase {
  import Norms._

  test("normalizeMoney corpus (hartford_done/llm4nano.py:45-71)") {
    assert(normalizeMoney(null).isEmpty)
    assert(normalizeMoney("  ").isEmpty)
    assert(normalizeMoney("$1,234").contains("1234"))
    assert(normalizeMoney("$ 1,000,000 ").contains("1000000"))
    assert(normalizeMoney("Included").contains("Included"))
    assert(normalizeMoney("INCLUDED").contains("Included"))
    assert(normalizeMoney("1%").contains("1%"))
    assert(normalizeMoney(" 2% ").contains("2%"))
    assert(normalizeMoney("Inside $10,000 / Outside $10,000")
      .contains("Inside $10,000 / Outside $10,000"))
    assert(normalizeMoney("no digits at all").isEmpty)
    assert(normalizeMoney("181472").contains("181472"))
  }

  test("moneyEqual compares under normalization") {
    assert(moneyEqual("$1,234", "1234"))
    assert(moneyEqual("included", "Included"))
    assert(!moneyEqual("$200", "$300"))
    assert(moneyEqual(null, "   ")) // both normalize to None
    assert(!moneyEqual("$5", null))
  }

  test("normName keeps alphanumerics lowercased (llm_pl_pol_cov.py:401-407)") {
    assert(normName("Money & Securities") == "moneysecurities")
    assert(normName("  B.P.P. (main)  ") == "bppmain")
    assert(normName(null) == "")
  }

  test("isNameVariation: suffix strip + positional diff <= 2 for len > 5") {
    assert(isNameVariation("FIRST NATIONAL BANK LLC", "FIRST NATIONAL BANK INC"))
    assert(isNameVariation("ACME HOLDINGS", "ACNE HOLDINGS"))
    assert(!isNameVariation("ABC", "ABD")) // too short
    assert(!isNameVariation("WHOLLY DIFFERENT NAME", "ANOTHER ENTITY XY"))
  }

  test("isNameVariation: OCR confusion-pair closure for len > 8") {
    assert(isNameVariation("HIGHLAND GRILL", "HIGHLAND GRI1L"))
    assert(isNameVariation("JOHNSON OIL CO", "J0HNSON OIL CO"))
    assert(isNameVariation("EAGLE POINT III", "EAGLE POINT 111"))
    assert(!isNameVariation("SHOR", "SH0R")) // too short for either path
  }

  test("baseName strips reference filename suffixes") {
    assert(baseName("acme_policy") == "acme")
    assert(baseName("acme_policy2") == "acme")
    assert(baseName("acme_ocr") == "acme")
    assert(baseName("acme_Package") == "acme")
    assert(baseName("acme") == "acme")
  }

  test("tolerantNorm: dates, money, addresses") {
    assert(tolerantNorm("09/26/2025") == "9/26/2025")
    assert(tolerantNorm("9/26/2025") == "9/26/2025")
    assert(tolerantNorm("12/05/2025") == "12/5/2025")
    assert(tolerantEqual("09/06/2025", "9/6/2025"))
    assert(!tolerantEqual("10/05/2025", "10/06/2025"))
    assert(tolerantNorm("$ 1,000,000") == "1000000")
    assert(tolerantEqual("$1,000", "1000."))
    assert(tolerantNorm("123 Main Road, Suite 4") == "123 main rd ste 4")
    assert(tolerantEqual("123 Main Road, Suite 4", "123 MAIN RD. STE 4"))
    assert(tolerantEqual("Acme Insurance Co", "ACME INSURANCE CO"))
    assert(!tolerantEqual("123 Main Rd", "124 Main Rd"))
    assert(tolerantNorm("  ") == null && tolerantNorm(null) == null)
    assert(tolerantNorm("2%") == "2%")
  }

  test("tolerantNormCol agrees with pure form") {
    import spark.implicits._
    val vals = Seq("09/26/2025", "9/26/2025", "12/05/2025", "$ 1,000,000",
      "1000.", "123 Main Road, Suite 4", "123 MAIN RD. STE 4",
      "Acme Insurance Co", "2%", "", "  ", null,
      "55 Oak Avenue", "55 Oak Ave.", "1 Elm Street\tApt 2")
    val rows = vals.toDF("v")
      .select(col("v"), tolerantNormCol(col("v")).as("t")).collect()
    for (r <- rows)
      assert(Option(r.getString(1)) == Option(tolerantNorm(r.getString(0))),
        s"tolerant mismatch on '${r.getString(0)}'")
  }

  test("Catalyst twins agree with pure forms") {
    import spark.implicits._
    val vals = Seq("$1,234", " Included ", "1%", "Inside $1 / Outside $2",
      "", "  ", "no digits", "181472", "$ 1,000,000", null)
    val df = vals.toDF("v")
    val rows = df.select(col("v"), normalizeMoneyCol(col("v")).as("m"),
      normNameCol(col("v")).as("n")).collect()
    for (r <- rows) {
      val v = r.getString(0)
      assert(Option(r.getString(1)) == normalizeMoney(v), s"money mismatch on '$v'")
      assert(r.getString(2) == normName(v), s"name mismatch on '$v'")
    }
    val ids = Seq("a_policy", "b_policy2", "c_ocr", "d_Package", "plain").toDF("id")
    val got = ids.select(baseNameCol(col("id"))).as[String].collect()
    assert(got.toSeq == Seq("a", "b", "c", "d", "plain"))
  }
}
