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

  // ------------------------------------------------ §2.8 misc-field tail ---

  test("premiums: last match per pattern; PREMIUM pattern hits inside ADVANCE lines") {
    val t = "PREMIUM: $ 1,200.50\nADVANCE PREMIUM: $ 900\nTOTAL: 77\nTOTAL: 88\n"
    // the PREMIUM finditer also matches the "PREMIUM: $ 900" suffix of the
    // ADVANCE line (group 0 starts at PREMIUM), and the last match wins —
    // exactly the reference's overwrite behavior (qc_head.py:974-983)
    assert(one(totalPremium(col("text")), t) == "900")
    assert(one(advancePremium(col("text")), t) == "900")
    assert(one(premiumTotal(col("text")), t) == "88")
    assert(one(totalPremium(col("text")), "no money here") == null)
  }

  test("insurer name: greedy whitespace-spanning class, first-wins patterns") {
    assert(one(insurerName(col("text")), "INSURER: ACME INS CO 9, ADMITTED") == "ACME INS CO 9")
    // the class includes \s (and (?i) lowercases A-Z), so the capture runs
    // across the newline until the comma
    assert(one(insurerName(col("text")), "INSURING COMPANY: ZETA\nMUTUAL, x") == "ZETA\nMUTUAL")
    assert(one(insurerName(col("text")), "COMPANY: OMEGA GROUP, y") == "OMEGA GROUP")
    assert(one(insurerNaic(col("text")), "NAIC # A1230,") == "A1230")
    assert(one(insurerNaic(col("text")), "NAIC NO. 5512,") == "5512")
    assert(one(insurerNaic(col("text")), "NAIC: 9Q87,") == "9Q87")
  }

  test("WC excluded: gate + bare-keyword first match yields null (ref crashes)") {
    assert(one(wcExcluded(col("text")), "WORKERS COMPENSATION\nMEMBER EXCLUDED: N") == "N")
    // first alternation match is the captureless PROPRIETOR branch →
    // group(1) empty → null (the reference raises AttributeError here)
    assert(one(wcExcluded(col("text")), "COMPENSATION\nPROPRIETOR listed") == null)
    // gate: no WORKERS/COMPENSATION → field absent even though the
    // pattern would match
    assert(one(wcExcluded(col("text")), "MEMBER EXCLUDED: Y") == null)
  }

  test("auto flags: substring semantics make OWNED true under NON-OWNED") {
    val t = "AUTO coverage\nNON-OWNED AUTOS"
    def flag(label: String, text: String): Boolean =
      Seq(text).toDF("text").select(autoTypeFlag(col("text"), label))
        .collect()(0).getBoolean(0)
    assert(flag("NON-OWNED AUTOS", t) && flag("OWNED AUTOS", t))
    assert(!flag("ANY AUTO", t) && !flag("HIRED AUTOS", t))
    // a label always contains AUTO, so the gate can only be off when no
    // label is present at all (faithful: `'AUTO' in content_upper`)
    assert(!flag("ANY AUTO", "no vehicles mentioned"))
  }

  test("locations: pattern-major order, python strip, len>5, first-occurrence dedup") {
    val t = "ADDRESS: 9 Oak Avenue\n\nLOCATION: 12 Main Street\n\nADDRESS: 9 Oak Avenue\n\nPROPERTY: x1\n"
    val got = Seq(t).toDF("text").select(locations(col("text")).as("l"))
      .collect()(0).getSeq[String](0)
    // LOCATION pattern fires before ADDRESS (pattern-major), duplicate
    // ADDRESS capture dedups to one, the len<=5 PROPERTY value drops
    assert(got == Seq("12 Main Street", "9 Oak Avenue"))
  }

  test("occurrence-vs-claims-made precedence and holder family independence") {
    assert(one(occurrenceOrClaimsMade(col("text")), "OCCUR and CLAIMS-MADE") == "Occurrence")
    assert(one(occurrenceOrClaimsMade(col("text")), "CLAIMS-MADE only") == "Claims-Made")
    assert(one(occurrenceOrClaimsMade(col("text")), "CLAIMS MADE spaced") == null)
    val h = "CERTIFICATE HOLDER: City A\nADDITIONAL INSURED: Corp B\nLOSS PAYEE: Bank C\nMORTGAGEE: Trust D"
    assert(one(certificateHolder(col("text")), h) == "City A")
    assert(one(additionalInsured(col("text")), h) == "Corp B")
    assert(one(lossPayee(col("text")), h) == "Bank C")
    assert(one(mortgagee(col("text")), h) == "Trust D")
  }

  test("remaining tail fields: deductibles, operations, class, basis, remarks, cancellation") {
    assert(one(propertyDeductibleFallback(col("text")), "DEDUCTIBLE: $ 2,500") == "2,500")
    // alternation order: [0-9,]+ wins over [\d%]+ so the % is left behind
    assert(one(windstormDeductible(col("text")), "WINDSTORM OR HAIL DEDUCTIBLE: 5%") == "5")
    assert(one(descriptionOfOperations(col("text")),
      "DESCRIPTION OF OPERATIONS: retail fuel\nstation 7\n\nnext") == "retail fuel\nstation 7")
    assert(one(descriptionOfOperations(col("text")), "OPERATIONS: warehousing") == "warehousing")
    assert(one(classification(col("text")), "CLASS: 0932 service") == "0932 service")
    assert(one(premiumBasis(col("text")), "PREMIUM BASIS: gross sales") == "gross sales")
    assert(one(remarks(col("text")), "REMARKS: a\nb\n\nc") == "a\nb")
    assert(one(remarks(col("text")), "SPECIAL PROVISIONS: waiver") == "waiver")
    assert(one(remarks(col("text")), "SPECIAL CONDITIONS: none") == "none")
    assert(one(cancellationProvisions(col("text")), "CANCELLATION: 30 days\nnotice") == "30 days\nnotice")
    assert(one(aggregateAppliesPerText(col("text")),
      "AGGREGATE LIMIT APPLIES PER: POLICY X") == "POLICY X")
    assert(one(aggregateAppliesPerText(col("text")),
      "AGGREGATE APPLIES PER LOC") == "LOC")
  }
}
