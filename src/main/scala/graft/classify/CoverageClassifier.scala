package graft.classify

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The 16 deterministic coverage "dimension extractors" C1-C16 — pure
  * predicates over a certificate's `coverages` map, replacing the reference's
  * per-dimension Python loops (llm_pl_pol_cov.py:34-399,
  * llm_gl_pol_cov.py:41-203,306-336, pl_cov_additional_interests.py:96-116).
  *
  * Two forms with identical semantics:
  *  - pure Scala over `Seq[(name, value)]` (typed pipeline, precedence logic,
  *    test oracle);
  *  - a per-dimension `Column` predicate over a coverage-name column, for the
  *    exploded `map_entries` declarative pipeline (C7's three-level
  *    precedence is per-document, so its DF form classifies rows into
  *    precedence levels and a window keeps the winning level).
  */
object CoverageClassifier {

  final case class CoverageItem(dimension: String, name: String, value: String)

  private def lc(s: String): String = if (s == null) "" else s.strip().toLowerCase

  // ------------------------------------------------------------- C1 --------
  /** Building: "building" in name, except the combined
    * building+pump+canopy label (C7's territory). llm_pl_pol_cov.py:34-60. */
  def isBuilding(name: String): Boolean = {
    val n = lc(name)
    n.contains("building") &&
      !(n.contains("building") && n.contains("pump") && n.contains("canopy"))
  }

  def isBuildingCol(name: Column): Column = {
    val n = lower(trim(name))
    n.contains("building") && !(n.contains("pump") && n.contains("canopy"))
  }

  // ------------------------------------------------------------- C2 --------
  private val BppExtensions = Seq(
    "off premises", "off-premises", "away from premises", "in transit",
    "transit", "portable storage", "temporarily", "newly acquired",
    "newly constructed", "coverage extension", "extension")

  /** BPP main limit, not extensions. llm_pl_pol_cov.py:62-101. */
  def isBpp(name: String): Boolean = {
    val n = lc(name)
    val isB = n.contains("business personal property") || n == "bpp" ||
      n.startsWith("bpp ") || n.endsWith(" bpp")
    isB && !BppExtensions.exists(n.contains)
  }

  def isBppCol(name: Column): Column = {
    val n = lower(trim(name))
    val isB = n.contains("business personal property") || n === "bpp" ||
      n.startsWith("bpp ") || n.endsWith(" bpp")
    val ext = BppExtensions.map(k => n.contains(lit(k))).reduce(_ || _)
    isB && !ext
  }

  // ------------------------------------------------------------- C3 --------
  private val MsExclusions = Seq(
    "counterfeit", "money orders", "forgery", "alteration",
    "funds transfer", "computer fraud")

  /** Money & Securities. llm_pl_pol_cov.py:103-140. */
  def isMoneySecurities(name: String): Boolean = {
    val n = lc(name)
    val isMs = (n.contains("money") && n.contains("secur")) ||
      n.contains("money & securities") || n.contains("money and securities")
    isMs && !MsExclusions.exists(n.contains)
  }

  def isMoneySecuritiesCol(name: Column): Column = {
    val n = lower(trim(name))
    val isMs = (n.contains("money") && n.contains("secur")) ||
      n.contains("money & securities") || n.contains("money and securities")
    val ex = MsExclusions.map(k => n.contains(lit(k))).reduce(_ || _)
    isMs && !ex
  }

  // ------------------------------------------------------------- C4 --------
  private val EbExclusions = Seq(
    "deductible", "ded.", "coinsurance", "waiting period", "waiting",
    "service interruption")

  /** Equipment Breakdown. llm_pl_pol_cov.py:142-181. */
  def isEquipmentBreakdown(name: String): Boolean = {
    val n = lc(name)
    val isEb = n.contains("equipment breakdown") ||
      (n.contains("equip") && n.contains("breakdown")) ||
      n.contains("boiler and machinery") || n.contains("boiler & machinery")
    isEb && !EbExclusions.exists(n.contains)
  }

  def isEquipmentBreakdownCol(name: Column): Column = {
    val n = lower(trim(name))
    val isEb = n.contains("equipment breakdown") ||
      (n.contains("equip") && n.contains("breakdown")) ||
      n.contains("boiler and machinery") || n.contains("boiler & machinery")
    val ex = EbExclusions.map(k => n.contains(lit(k))).reduce(_ || _)
    isEb && !ex
  }

  // ------------------------------------------------------------- C5 --------
  private val DetailExclusions = Seq(
    "deductible", "ded.", "coinsurance", "waiting period", "waiting", "description")

  /** Outdoor Signs. llm_pl_pol_cov.py:183-222. */
  def isOutdoorSigns(name: String): Boolean = {
    val n = lc(name)
    val isOs = n.contains("outdoor sign") || n == "signs" ||
      n.startsWith("signs ") || n.endsWith(" signs")
    isOs && !DetailExclusions.exists(n.contains)
  }

  def isOutdoorSignsCol(name: Column): Column = {
    val n = lower(trim(name))
    val isOs = n.contains("outdoor sign") || n === "signs" ||
      n.startsWith("signs ") || n.endsWith(" signs")
    val ex = DetailExclusions.map(k => n.contains(lit(k))).reduce(_ || _)
    isOs && !ex
  }

  // ------------------------------------------------------------- C6 --------
  /** Employee Dishonesty. llm_pl_pol_cov.py:224-262. */
  def isEmployeeDishonesty(name: String): Boolean = {
    val n = lc(name)
    val isEd = n.contains("employee dishonesty") ||
      (n.contains("employee") && n.contains("dishon")) || n == "dishonesty"
    isEd && !DetailExclusions.exists(n.contains)
  }

  def isEmployeeDishonestyCol(name: Column): Column = {
    val n = lower(trim(name))
    val isEd = n.contains("employee dishonesty") ||
      (n.contains("employee") && n.contains("dishon")) || n === "dishonesty"
    val ex = DetailExclusions.map(k => n.contains(lit(k))).reduce(_ || _)
    isEd && !ex
  }

  // ------------------------------------------------------------- C7 --------
  /** Pumps/Canopy precedence levels: 1 = Building-with-P&C combined,
    * 2 = P&C combined, 3 = separate pumps/canopy, 0 = not pumps/canopy.
    * The winning level per document is the smallest non-zero present
    * (llm_pl_pol_cov.py:264-321); within level 3 both pumps and canopy
    * qualify, last occurrence of each winning in the reference's key scan.
    */
  def pumpsCanopyLevel(name: String): Int = {
    val n = lc(name)
    if (n.contains("building") && n.contains("pump") && n.contains("canopy")) 1
    else if (n.contains("pump") && n.contains("canopy")) 2
    else if (n == "pumps" || n == "pump" || n.startsWith("pumps ") || n.endsWith(" pumps") ||
      n == "canopy" || n == "canopies" || n.startsWith("canopy ") ||
      n.endsWith(" canopy") || n.endsWith(" canopies")) 3
    else 0
  }

  def pumpsCanopyLevelCol(name: Column): Column = {
    val n = lower(trim(name))
    when(n.contains("building") && n.contains("pump") && n.contains("canopy"), 1)
      .when(n.contains("pump") && n.contains("canopy"), 2)
      .when(n === "pumps" || n === "pump" || n.startsWith("pumps ") || n.endsWith(" pumps") ||
        n === "canopy" || n === "canopies" || n.startsWith("canopy ") ||
        n.endsWith(" canopy") || n.endsWith(" canopies"), 3)
      .otherwise(0)
  }

  /** C7 with full precedence over a document's coverages, reference
    * key-scan semantics: last key per slot wins; combined levels return a
    * single item, level 3 returns pumps then canopy. */
  def pumpsCanopyItems(coverages: Seq[(String, String)]): Seq[CoverageItem] = {
    var combinedBuilding: Option[String] = None
    var combinedPc: Option[String] = None
    var pumps: Option[String] = None
    var canopy: Option[String] = None
    for ((name, _) <- coverages) {
      val n = lc(name)
      if (n.contains("building") && n.contains("pump") && n.contains("canopy"))
        combinedBuilding = Some(name)
      else if (n.contains("pump") && n.contains("canopy")) combinedPc = Some(name)
      else if (n == "pumps" || n == "pump" || n.startsWith("pumps ") || n.endsWith(" pumps"))
        pumps = Some(name)
      else if (n == "canopy" || n == "canopies" || n.startsWith("canopy ") ||
        n.endsWith(" canopy") || n.endsWith(" canopies")) canopy = Some(name)
    }
    val m = coverages.toMap
    def item(k: String) = CoverageItem("pumps_canopy", k, m.getOrElse(k, null))
    combinedBuilding.map(k => Seq(item(k)))
      .orElse(combinedPc.map(k => Seq(item(k))))
      .getOrElse((pumps.toSeq ++ canopy.toSeq).map(item))
  }

  // ------------------------------------------------------------- C8 --------
  /** Theft (not its deductible rows). llm_pl_pol_cov.py:323-345. */
  def isTheft(name: String): Boolean = {
    val n = lc(name)
    n.contains("theft") && !n.contains("deductible") && !n.contains("ded.")
  }

  def isTheftCol(name: Column): Column = {
    val n = lower(trim(name))
    n.contains("theft") && !n.contains("deductible") && !n.contains("ded.")
  }

  // ------------------------------------------------------------- C9 --------
  /** Wind/Hail — note the reference's own logic makes bare "windstorm"
    * sufficient. llm_pl_pol_cov.py:347-372. */
  def isWindHail(name: String): Boolean = {
    val n = lc(name)
    val isWh = (n.contains("wind") && n.contains("hail")) || n.contains("windstorm")
    isWh && !n.contains("deductible") && !n.contains("ded.")
  }

  def isWindHailCol(name: Column): Column = {
    val n = lower(trim(name))
    ((n.contains("wind") && n.contains("hail")) || n.contains("windstorm")) &&
      !n.contains("deductible") && !n.contains("ded.")
  }

  // ------------------------------------------------------------ C10 --------
  /** Business Income. llm_pl_pol_cov.py:374-399. */
  def isBusinessIncome(name: String): Boolean = {
    val n = lc(name)
    n.contains("business income") && !n.contains("deductible") &&
      !n.contains("ded.") && !n.contains("waiting")
  }

  def isBusinessIncomeCol(name: Column): Column = {
    val n = lower(trim(name))
    n.contains("business income") && !n.contains("deductible") &&
      !n.contains("ded.") && !n.contains("waiting")
  }

  // ----------------------------------------------------- PL dimensions -----
  /** All single-row PL dimensions C1-C6, C8-C10 (C7 needs doc-level
    * precedence, see [[pumpsCanopyItems]]). Order matches the reference's
    * validation sections. */
  val PlDimensions: Seq[(String, String => Boolean)] = Seq(
    "building" -> isBuilding _,
    "bpp" -> isBpp _,
    "money_securities" -> isMoneySecurities _,
    "equipment_breakdown" -> isEquipmentBreakdown _,
    "outdoor_signs" -> isOutdoorSigns _,
    "employee_dishonesty" -> isEmployeeDishonesty _,
    "theft" -> isTheft _,
    "wind_hail" -> isWindHail _,
    "business_income" -> isBusinessIncome _)

  /** Classify a certificate's coverages map into dimension items (C1-C10). */
  def classify(coverages: Seq[(String, String)]): Seq[CoverageItem] = {
    val simple = for {
      (dim, pred) <- PlDimensions
      (name, value) <- coverages if pred(name)
    } yield CoverageItem(dim, name, value)
    simple ++ pumpsCanopyItems(coverages)
  }

  // ----------------------------------------------- C11-C14 (GL limits) -----
  /** Fixed key→label mapping per section; F8-scrubbed values, missing keys
    * skipped ("keep $0 (excluded), skip missing to avoid inventing").
    * llm_gl_pol_cov.py:41-203. */
  val GlSections: Seq[(String, Seq[(String, String)])] = Seq(
    "commercial_general_liability" -> Seq(
      "each_occurrence" -> "Each Occurrence",
      "damage_to_rented_premises" -> "Damage to Rented Premises (Ea occurrence)",
      "med_exp" -> "Med Exp (Any one person)",
      "personal_adv_injury" -> "Personal & Adv Injury",
      "general_aggregate" -> "General Aggregate",
      "products_comp_op_agg" -> "Products - Comp/Op Agg"),
    "umbrella_liability" -> Seq(
      "each_occurrence" -> "Umbrella Each Occurrence",
      "aggregate" -> "Umbrella Aggregate"),
    "employment_practices_liability" -> Seq(
      "each_limit" -> "EPL Each Limit",
      "aggregate_limit" -> "EPL Aggregate Limit"),
    "liquor_liability" -> Seq(
      "each_limit" -> "Liquor Liability Each Limit",
      "aggregate_limit" -> "Liquor Liability Aggregate Limit"))

  final case class LimitItem(coverage_section: String, limit_key: String,
      limit_label: String, value: String)

  /** Extract one section's limit items from its `limits` sub-map. */
  def glSectionLimits(section: String, limits: Map[String, String]): Seq[LimitItem] =
    for {
      (key, label) <- GlSections.toMap.apply(section)
      v <- Filters.f8ScrubMoney(limits.getOrElse(key, null))
    } yield LimitItem(section, key, label, v)

  // ------------------------------------------------------------ C15 --------
  /** Coverage-presence list: 8 sections, kept iff policy_number present.
    * llm_gl_pol_cov.py:306-336. */
  val PresenceSections: Seq[(String, String)] = Seq(
    "commercial_general_liability" -> "Commercial General Liability",
    "automobile_liability" -> "Automobile Liability",
    "umbrella_liability" -> "Umbrella Liability",
    "excess_liability" -> "Excess Liability",
    "workers_compensation" -> "Workers Compensation",
    "employment_practices_liability" -> "Employment Practices Liability",
    "liquor_liability" -> "Liquor Liability",
    "garagekeepers_liability" -> "Garagekeepers Liability")

  final case class PresenceItem(coverage_key: String, coverage_name: String,
      policy_number: String, policy_eff: String, policy_exp: String)

  def presenceList(sections: Map[String, Map[String, String]]): Seq[PresenceItem] =
    for {
      (key, display) <- PresenceSections
      cov <- sections.get(key)
      pn <- cov.get("policy_number") if pn != null && pn.nonEmpty
    } yield PresenceItem(key, display, pn,
      cov.getOrElse("policy_eff", null), cov.getOrElse("policy_exp", null))

  // ------------------------------------------------------------ C16 --------
  final case class Interest(name: String, address: String)

  /** Additional-interests 0/1/N normalization: array form takes precedence
    * over the flat single-interest form; else empty.
    * pl_cov_additional_interests.py:96-116. */
  def normalizeInterests(
      arrayForm: Option[Seq[Interest]],
      flatName: Option[String],
      flatAddress: Option[String]): Seq[Interest] =
    arrayForm match {
      case Some(xs) => xs
      case None =>
        flatName.filter(_.nonEmpty)
          .map(n => Seq(Interest(n, flatAddress.getOrElse("")))).getOrElse(Seq.empty)
    }
}
