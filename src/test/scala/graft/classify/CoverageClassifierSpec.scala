package graft.classify

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CoverageClassifierSpec extends SparkTestBase {
  import CoverageClassifier._

  // Representative coverage-name corpus exercising every include/exclude rule.
  val Names: Seq[String] = Seq(
    "Building", "Building - Location 2", "Building with Pumps & Canopy",
    "Business Personal Property", "BPP", "BPP main", "location bpp",
    "Business Personal Property - Off Premises", "BPP In Transit",
    "Newly Acquired BPP", "Coverage Extension BPP",
    "Money & Securities", "Money and Securities", "money security",
    "Counterfeit Money", "Money Orders and Counterfeit", "Forgery Money Securities",
    "Equipment Breakdown", "Equip. Breakdown", "Boiler and Machinery",
    "Boiler & Machinery", "Equipment Breakdown Deductible",
    "Equipment Breakdown Waiting Period", "EB Service Interruption Equipment Breakdown",
    "Outdoor Signs", "Outdoor Sign", "Signs", "Signs attached", "lighted signs",
    "Signs Description", "Outdoor Signs Deductible",
    "Employee Dishonesty", "employee dishon.", "Dishonesty",
    "Employee Dishonesty Deductible",
    "Pumps & Canopy", "Pumps and Canopy", "Pumps", "Pump", "Canopy", "Canopies",
    "station pumps", "front canopy",
    "Theft", "Theft Sublimit", "Theft Deductible",
    "Wind/Hail", "Windstorm", "Windstorm or Hail", "Wind Hail Deductible",
    "Business Income", "Business Income - ALS", "Business Income Waiting Period",
    "Business Income Deductible", "General Liability", "Umbrella")

  test("C1 building include/exclude") {
    assert(isBuilding("Building"))
    assert(isBuilding("Building - Location 2"))
    assert(!isBuilding("Building with Pumps & Canopy")) // C7's territory
    assert(!isBuilding("BPP"))
  }

  test("C2 BPP include/exclude extensions") {
    assert(isBpp("Business Personal Property"))
    assert(isBpp("BPP"))
    assert(isBpp("BPP main"))
    assert(isBpp("location bpp"))
    assert(!isBpp("Business Personal Property - Off Premises"))
    assert(!isBpp("BPP In Transit"))
    assert(!isBpp("Coverage Extension BPP"))
    assert(!isBpp("BPPX")) // token-boundary: not bpp exactly
  }

  test("C3 money & securities exclusions") {
    assert(isMoneySecurities("Money & Securities"))
    assert(isMoneySecurities("money security"))
    assert(!isMoneySecurities("Counterfeit Money"))       // no 'secur' anyway
    assert(!isMoneySecurities("Forgery Money Securities")) // excluded
    assert(!isMoneySecurities("Money Orders"))
  }

  test("C4 equipment breakdown exclusions") {
    assert(isEquipmentBreakdown("Equipment Breakdown"))
    assert(isEquipmentBreakdown("Boiler & Machinery"))
    assert(!isEquipmentBreakdown("Equipment Breakdown Deductible"))
    assert(!isEquipmentBreakdown("Equipment Breakdown Waiting Period"))
    assert(!isEquipmentBreakdown("EB Service Interruption Equipment Breakdown"))
  }

  test("C5 outdoor signs boundary forms") {
    assert(isOutdoorSigns("Outdoor Signs"))
    assert(isOutdoorSigns("Signs"))
    assert(isOutdoorSigns("Signs attached"))
    assert(isOutdoorSigns("lighted signs"))
    assert(!isOutdoorSigns("Signs Description"))
    assert(!isOutdoorSigns("Outdoor Signs Deductible"))
    assert(!isOutdoorSigns("Signage")) // no boundary match
  }

  test("C6 employee dishonesty forms") {
    assert(isEmployeeDishonesty("Employee Dishonesty"))
    assert(isEmployeeDishonesty("employee dishon."))
    assert(isEmployeeDishonesty("Dishonesty"))
    assert(!isEmployeeDishonesty("Employee Dishonesty Deductible"))
  }

  test("C7 three-level precedence") {
    // level 1 beats everything
    val l1 = pumpsCanopyItems(Seq(
      "Building with Pumps & Canopy" -> "500,000", "Pumps & Canopy" -> "100",
      "Pumps" -> "1", "Canopy" -> "2"))
    assert(l1.map(_.name) == Seq("Building with Pumps & Canopy"))
    // level 2 beats separate
    val l2 = pumpsCanopyItems(Seq("Pumps & Canopy" -> "100", "Pumps" -> "1"))
    assert(l2.map(_.name) == Seq("Pumps & Canopy"))
    // level 3: pumps then canopy, values carried
    val l3 = pumpsCanopyItems(Seq("Canopy" -> "2", "Pumps" -> "1"))
    assert(l3.map(i => (i.name, i.value)) == Seq(("Pumps", "1"), ("Canopy", "2")))
    assert(pumpsCanopyItems(Seq("Building" -> "x")).isEmpty)
  }

  test("C8-C10 theft / wind-hail / business income") {
    assert(isTheft("Theft"))
    assert(isTheft("Theft Sublimit"))
    assert(!isTheft("Theft Deductible"))
    assert(isWindHail("Windstorm"))
    assert(isWindHail("Wind/Hail"))
    assert(!isWindHail("Wind Hail Deductible"))
    assert(isBusinessIncome("Business Income"))
    assert(!isBusinessIncome("Business Income Waiting Period"))
    assert(!isBusinessIncome("Business Income Deductible"))
  }

  test("classify covers all dimensions in section order") {
    val items = classify(Seq(
      "Building" -> "900,000", "BPP" -> "250,000", "Theft" -> "Included",
      "Pumps" -> "50,000"))
    assert(items.map(_.dimension) == Seq("building", "bpp", "theft", "pumps_canopy"))
  }

  test("C11-C14 GL section limits with F8 scrub and skip-missing") {
    val items = glSectionLimits("commercial_general_liability", Map(
      "each_occurrence" -> "1,000,000", "general_aggregate" -> "$",
      "med_exp" -> "", "personal_adv_injury" -> null))
    assert(items.map(i => (i.limit_key, i.value)) ==
      Seq(("each_occurrence", "1,000,000"), ("general_aggregate", "$0")))
    assert(items.head.limit_label == "Each Occurrence")
    val umb = glSectionLimits("umbrella_liability", Map("aggregate" -> "2,000,000"))
    assert(umb.map(_.limit_label) == Seq("Umbrella Aggregate"))
    val epl = glSectionLimits("employment_practices_liability", Map("each_limit" -> "10,000"))
    assert(epl.map(_.limit_label) == Seq("EPL Each Limit"))
    val liq = glSectionLimits("liquor_liability",
      Map("each_limit" -> "5,000", "aggregate_limit" -> "$0.00"))
    assert(liq.map(_.value) == Seq("5,000", "$0"))
  }

  test("C15 presence list requires policy_number") {
    val sections = Map(
      "commercial_general_liability" -> Map("policy_number" -> "GL-1", "policy_eff" -> "01/01/2025"),
      "umbrella_liability" -> Map("policy_eff" -> "01/01/2025"), // no number → dropped
      "workers_compensation" -> Map("policy_number" -> "WC-9"))
    val got = presenceList(sections)
    assert(got.map(_.coverage_key) == Seq("commercial_general_liability", "workers_compensation"))
    assert(got.head.coverage_name == "Commercial General Liability")
  }

  test("C16 additional-interest 0/1/N normalization") {
    val two = Seq(Interest("A", "addr1"), Interest("B", "addr2"))
    assert(normalizeInterests(Some(two), Some("ignored"), None) == two)
    assert(normalizeInterests(None, Some("Solo LLC"), Some("1 Main St")) ==
      Seq(Interest("Solo LLC", "1 Main St")))
    assert(normalizeInterests(None, Some("Solo LLC"), None) == Seq(Interest("Solo LLC", "")))
    assert(normalizeInterests(None, None, None).isEmpty)
    assert(normalizeInterests(None, Some(""), Some("x")).isEmpty)
  }

  test("Column predicates agree with pure forms over the name corpus") {
    import spark.implicits._
    val df = Names.toDF("name")
    val rows = df.select(col("name"),
      isBuildingCol(col("name")), isBppCol(col("name")),
      isMoneySecuritiesCol(col("name")), isEquipmentBreakdownCol(col("name")),
      isOutdoorSignsCol(col("name")), isEmployeeDishonestyCol(col("name")),
      isTheftCol(col("name")), isWindHailCol(col("name")),
      isBusinessIncomeCol(col("name")), pumpsCanopyLevelCol(col("name"))).collect()
    for (r <- rows) {
      val n = r.getString(0)
      assert(r.getBoolean(1) == isBuilding(n), s"C1 on $n")
      assert(r.getBoolean(2) == isBpp(n), s"C2 on $n")
      assert(r.getBoolean(3) == isMoneySecurities(n), s"C3 on $n")
      assert(r.getBoolean(4) == isEquipmentBreakdown(n), s"C4 on $n")
      assert(r.getBoolean(5) == isOutdoorSigns(n), s"C5 on $n")
      assert(r.getBoolean(6) == isEmployeeDishonesty(n), s"C6 on $n")
      assert(r.getBoolean(7) == isTheft(n), s"C8 on $n")
      assert(r.getBoolean(8) == isWindHail(n), s"C9 on $n")
      assert(r.getBoolean(9) == isBusinessIncome(n), s"C10 on $n")
      assert(r.getInt(10) == pumpsCanopyLevel(n), s"C7 level on $n")
    }
  }
}
