package graft.extract

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class FieldExtractorsSpec extends SparkTestBase {
  import FieldExtractors._
  import spark.implicits._

  // NOTE: blank lines bound the reference's multi-line captures
  // (`[^\n]+(?:\n[^\n]+){0,N}` stops at an empty line) — real ACORD text has
  // them between the boxed fields.
  val certText: String =
    """CERTIFICATE OF LIABILITY INSURANCE    ISSUE DATE: 01/15/2025
      |POLICY NUMBER: ABC-123_X
      |NAMED INSURED: ACME HOLDINGS LLC DBA: ACME GAS STATION
      |
      |MAILING ADDRESS: 1 Main St
      |  Springfield IL 62704
      |
      |POLICY PERIOD: FROM 02/01/2025 TO 02/01/2026
      |EACH OCCURRENCE LIMIT   $ 1,000,000
      |GENERAL AGGREGATE LIMIT (Other than Products) $ 2,000,000
      |PRODUCTS - COMP/OP AGG   $ INCLUDED
      |PERSONAL & ADV INJURY   $ 1,000,000
      |DAMAGE TO RENTED PREMISES   $ 100,000
      |MED EXP (Any one person)  $ 5,000
      |AGGREGATE LIMIT APPLIES PER: POLICY
      |CERTIFICATE NUMBER: CERT-777
      |REVISION NUMBER: TBD
      |""".stripMargin

  // NOTE: the reference's `[^\d]*` bridges are greedy and stop only at
  // digits, so amount rows must be separated by digit-bearing lines (as in a
  // real ACORD 140 table) — mirrors re.search greediness exactly.
  val propText: String =
    """PROPERTY SECTION
      |BUILDING    AMOUNT OF INSURANCE: 350,000
      |BUILDING DEDUCTIBLE: 1,000
      |BUSINESS PERSONAL PROPERTY  AMOUNT OF INSURANCE: 250,000
      |EQUIPMENT BREAKDOWN AMOUNT OF INSURANCE: INCLUDED
      |BUSINESS INCOME   AMOUNT OF INSURANCE: ACTUAL LOSS SUSTAINED
      |SPECIAL  REPLACEMENT COST
      |Class 1 pumps and equipment
      |schedule total $ 52,000
      |""".stripMargin

  def one(c: org.apache.spark.sql.Column, text: String): String = {
    val r = Seq(text).toDF("text").select(c.as("v")).collect()(0)
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("scalar fields: policy number, insured + DBA split, address, dates") {
    assert(one(policyNumber(col("text")), certText) == "ABC-123_X")
    assert(one(namedInsured(col("text")), certText) == "ACME HOLDINGS LLC")
    assert(one(dba(col("text")), certText) == "ACME GAS STATION")
    assert(one(mailingAddress(col("text")), certText) == "1 Main St Springfield IL 62704")
    assert(one(effectiveDate(col("text")), certText) == "02/01/2025")
    assert(one(expirationDate(col("text")), certText) == "02/01/2026")
    assert(one(issueDate(col("text")), certText) == "01/15/2025")
    assert(one(policyNumber(col("text")), "no fields at all") == null)
  }

  test("GL limits battery: six families, ordered alternates") {
    assert(one(glLimit(col("text"), "each_occurrence"), certText) == "1,000,000")
    assert(one(glLimit(col("text"), "general_aggregate"), certText) == "2,000,000")
    assert(one(glLimit(col("text"), "products_completed_operations"), certText) == "INCLUDED")
    assert(one(glLimit(col("text"), "personal_advertising_injury"), certText) == "1,000,000")
    assert(one(glLimit(col("text"), "damage_to_rented_premises"), certText) == "100,000")
    assert(one(glLimit(col("text"), "medical_expense"), certText) == "5,000")
    val m = Seq(certText).toDF("text").select(glLimits(col("text")).as("m"))
      .selectExpr("map_keys(m) as ks").as[Seq[String]].collect()(0)
    assert(m.toSet == GlLimitPatterns.map(_._1).toSet)
  }

  test("aggregate-applies-per and checkbox-style flags") {
    val r = Seq(certText).toDF("text").select(
      aggregateAppliesPer(col("text"), "POLICY"),
      aggregateAppliesPer(col("text"), "PROJECT"),
      aggregateAppliesPer(col("text"), "LOC")).collect()(0)
    assert(r.getBoolean(0) && !r.getBoolean(1) && !r.getBoolean(2))
  }

  test("property coverage table amounts and deductibles") {
    assert(one(propertyAmount(col("text"), "building"), propText) == "350,000")
    assert(one(propertyDeductible(col("text"), "building"), propText) == "1,000")
    assert(one(propertyAmount(col("text"), "business_personal_property"), propText) == "250,000")
    assert(one(propertyAmount(col("text"), "business_income"), propText) == "ACTUAL LOSS SUSTAINED")
    assert(one(propertyAmount(col("text"), "equipment_breakdown"), propText) == "INCLUDED")
    assert(one(propertyAmount(col("text"), "outdoor_signs"), propText) == null)
  }

  test("perils flags") {
    val r = Seq(propText).toDF("text").select(
      perilBasic(col("text")), perilBroad(col("text")),
      perilSpecial(col("text")), perilReplacementCost(col("text"))).collect()(0)
    assert(!r.getBoolean(0) && !r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3))
  }

  test("F10 validity filter rejects TBD/N/A/NONE") {
    assert(one(certificateNumber(col("text")), certText) == "CERT-777")
    assert(one(revisionNumber(col("text")), certText) == null) // TBD rejected
  }

  test("class-N amount probe and explicit building limit detector") {
    assert(one(classAmount(col("text"), 1), propText) == "52000")
    assert(one(classAmount(col("text"), 2), propText) == null)
    val buildings = Seq(
      "1 1 Building $ 350,000" -> true,
      "Building\n$ 983,892" -> true,
      "Building   425,000" -> true,
      "Building and Personal Property $ 500,000" -> false,
      "All Personal Property $ 500,000" -> false)
    for ((t, expected) <- buildings) {
      val got = Seq(t).toDF("text")
        .select(hasExplicitBuildingLimit(col("text"))).collect()(0).getBoolean(0)
      assert(got == expected, s"building-limit detector on: $t")
    }
  }
}
