package graft.extract

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The deterministic regex field-extraction battery — the reference's
  * retired-but-authoritative `extract_structured_fields` layer
  * (traveler/qc_head.py:612-1131) resurrected as Catalyst column functions.
  * Every field is a `coalesce` over its ordered pattern alternates
  * (first-matching-pattern-wins, as the reference's `for pattern: ... break`).
  *
  * All patterns run case-insensitively, matching the reference's
  * `re.IGNORECASE` — expressed as an inline `(?i)` flag so the Spark
  * `regexp_extract` expression stays codegen-friendly.
  */
object FieldExtractors {

  /** First-matching-pattern-wins over ordered alternates; empty → null. */
  def extractFirst(text: Column, patterns: Seq[String], group: Int = 1): Column = {
    val candidates = patterns.map { p =>
      val v = regexp_extract(text, "(?i)" + p, group)
      when(v === "", lit(null).cast("string")).otherwise(v)
    }
    coalesce(candidates: _*)
  }

  // --------------------------------------------------- scalar fields -------
  // traveler/qc_head.py:698-706
  val PolicyNumberPatterns = Seq(
    "POLICY\\s+(?:NUMBER|NO\\.?|#)\\s*[:_]?\\s*([A-Z0-9\\-_]+)",
    "POLICY\\s+(?:NUMBER|NO\\.?|#)\\s*([A-Z0-9\\-_]+)")

  def policyNumber(text: Column): Column = extractFirst(text, PolicyNumberPatterns)

  // traveler/qc_head.py:709-725 — named insured with DBA split
  val InsuredPatterns = Seq(
    "NAMED\\s+INSURED[:\\s]+([^\\n]+(?:\\n[^\\n]+){0,3})",
    "INSURED[:\\s]+([^\\n]+(?:\\n[^\\n]+){0,2})")

  def insuredRaw(text: Column): Column = extractFirst(text, InsuredPatterns)

  def namedInsured(text: Column): Column = {
    val raw = trim(insuredRaw(text))
    when(upper(raw).contains("DBA"),
      trim(element_at(split(raw, "(?i)\\s+DBA\\s*:?\\s*"), 1)))
      .otherwise(raw)
  }

  def dba(text: Column): Column = {
    val raw = trim(insuredRaw(text))
    val parts = split(raw, "(?i)\\s+DBA\\s*:?\\s*")
    when(upper(raw).contains("DBA") && size(parts) > 1, trim(element_at(parts, 2)))
      .otherwise(lit(null).cast("string"))
  }

  // traveler/qc_head.py:737-747 — mailing address, whitespace-collapsed
  val AddressPatterns = Seq(
    "MAILING\\s+ADDRESS[:\\s]+([^\\n]+(?:\\n[^\\n]+){0,2})",
    "ADDRESS[:\\s]+([^\\n]+(?:\\n[^\\n]+){0,2})")

  def mailingAddress(text: Column): Column =
    regexp_replace(trim(extractFirst(text, AddressPatterns)), "\\s+", " ")

  // traveler/qc_head.py:750-766 — effective/expiration dates
  def effectiveDate(text: Column): Column = extractFirst(text, Seq(
    "EFFECTIVE\\s+DATE[:\\s]+([0-9\\/\\-]+)",
    "FROM\\s+([0-9\\/\\-]+)\\s+TO\\s+[0-9\\/\\-]+"))

  def expirationDate(text: Column): Column = extractFirst(text, Seq(
    "EXPIRATION\\s+DATE[:\\s]+([0-9\\/\\-]+)",
    "POLICY\\s+EXP[:\\s]+([0-9\\/\\-]+)",
    "FROM\\s+[0-9\\/\\-]+\\s+TO\\s+([0-9\\/\\-]+)"))

  def issueDate(text: Column): Column =
    extractFirst(text, Seq("ISSUE\\s+DATE[:\\s]+([0-9\\/\\-]+)"))

  // ------------------------------------------------------ GL limits --------
  // traveler/qc_head.py:783-812 — six limit families, ordered alternates each
  val GlLimitPatterns: Seq[(String, Seq[String])] = Seq(
    "each_occurrence" -> Seq(
      "EACH\\s+OCCURRENCE\\s+LIMIT[^\\$]*\\$?\\s*([0-9,]+)",
      "EACH\\s+OCCURRENCE[^\\$]*\\$?\\s*([0-9,]+)"),
    "general_aggregate" -> Seq(
      "GENERAL\\s+AGGREGATE\\s+LIMIT\\s*\\([^\\)]*\\)[^\\$]*\\$\\.?\\s*([0-9,]+)",
      "GENERAL\\s+AGGREGATE\\s+LIMIT[^\\$]*\\$\\.?\\s*([0-9,]+)",
      "GENERAL\\s+AGGREGATE[^\\$]*\\$\\.?\\s*([0-9,]+)"),
    "products_completed_operations" -> Seq(
      "PRODUCTS\\s*[-]?\\s*COMP[/]?OP\\s+AGG[^\\$]*\\$?\\s*([0-9,]+|INCLUDED)",
      "PRODUCTS[/]?\\s*COMPLETED\\s+OPERATIONS[^\\$]*\\$?\\s*([0-9,]+|INCLUDED)",
      "PRODUCTS[^\\$]*AGGREGATE[^\\$]*\\$?\\s*([0-9,]+|INCLUDED)"),
    "personal_advertising_injury" -> Seq(
      "PERSONAL\\s+[&]?\\s*ADV[^\\$]*INJURY[^\\$]*\\$?\\s*([0-9,]+)",
      "PERSONAL\\s+[&]?\\s*ADVERTISING\\s+INJURY[^\\$]*\\$?\\s*([0-9,]+)"),
    "damage_to_rented_premises" -> Seq(
      "DAMAGE\\s+TO\\s+RENTED\\s+PREMISES[^\\$]*\\$?\\s*([0-9,]+)",
      "DAMAGE\\s+TO\\s+PREMISES\\s+RENTED[^\\$]*\\$?\\s*([0-9,]+)",
      "DAMAGE\\s+TO\\s+(?:PREMISES\\s+)?RENTED[^\\$]*\\$?\\s*([0-9,]+)"),
    "medical_expense" -> Seq(
      "MED\\s+EXP[^\\$]*\\$?\\s*([0-9,]+)",
      "MEDICAL\\s+EXPENSE\\s+LIMIT[^\\$]*\\$?\\s*([0-9,]+)",
      "MEDICAL\\s+EXPENSE[^\\$]*\\$?\\s*([0-9,]+)"))

  def glLimit(text: Column, family: String): Column =
    extractFirst(text, GlLimitPatterns.toMap.apply(family))

  /** All six GL limit families as a map column (absent families omitted). */
  def glLimits(text: Column): Column =
    map_filter(
      map_from_arrays(
        array(GlLimitPatterns.map { case (k, _) => lit(k) }: _*),
        array(GlLimitPatterns.map { case (_, pats) => extractFirst(text, pats) }: _*)),
      (_, v) => v.isNotNull)

  // traveler/qc_head.py:822-831 — aggregate-applies-per flags
  def aggregateAppliesPer(text: Column, which: String): Column =
    text.rlike(s"(?is)AGGREGATE.*APPLIES\\s+PER.*$which")

  // ------------------------------------------- property coverage table -----
  // traveler/qc_head.py:856-923 — amount/deductible per coverage, with
  // simple_* fallbacks tried after the labelled patterns.
  val PropertyCoveragePatterns: Seq[(String, Seq[String], Seq[String])] = Seq(
    ("building",
      Seq("BUILDING[^\\d]*AMOUNT\\s+OF\\s+INSURANCE[:\\s]*([0-9,]+|INCLUDED)",
        "BUILDING[:\\s]*([0-9,]+)"),
      Seq("BUILDING[^\\d]*DEDUCTIBLE[:\\s]*([0-9,]+|[\\d%]+)",
        "(?s)BUILDING.*?DEDUCTIBLE[:\\s]*([0-9,]+|[\\d%]+)")),
    ("business_personal_property",
      Seq("BUSINESS\\s+PERSONAL\\s+PROPERTY[^\\d]*AMOUNT\\s+OF\\s+INSURANCE[:\\s]*([0-9,]+|INCLUDED)",
        "BUSINESS\\s+PERSONAL\\s+PROPERTY[:\\s]*([0-9,]+)"),
      Seq("BUSINESS\\s+PERSONAL\\s+PROPERTY[^\\d]*DEDUCTIBLE[:\\s]*([0-9,]+|[\\d%]+)")),
    ("business_income",
      Seq("BUSINESS\\s+INCOME[^\\d]*AMOUNT\\s+OF\\s+INSURANCE[:\\s]*([0-9,]+|ACTUAL\\s+LOSS\\s+SUSTAINED|INCLUDED)",
        "BUSINESS\\s+INCOME[:\\s]*([0-9,]+|ACTUAL\\s+LOSS)"),
      Seq("BUSINESS\\s+INCOME[^\\d]*DEDUCTIBLE[:\\s]*([0-9,]+|[\\d%]+)")),
    ("equipment_breakdown",
      Seq("EQUIPMENT\\s+BREAKDOWN[^\\d]*AMOUNT\\s+OF\\s+INSURANCE[:\\s]*([0-9,]+|INCLUDED)"),
      Seq("EQUIPMENT\\s+BREAKDOWN[^\\d]*DEDUCTIBLE[:\\s]*([0-9,]+|[\\d%]+)")),
    ("employee_dishonesty",
      Seq("EMPLOYEE\\s+DISHONESTY[^\\d]*AMOUNT\\s+OF\\s+INSURANCE[:\\s]*([0-9,]+|INCLUDED)"),
      Seq("EMPLOYEE\\s+DISHONESTY[^\\d]*DEDUCTIBLE[:\\s]*([0-9,]+|[\\d%]+)")),
    ("money_securities",
      Seq("MONEY\\s+[&]?\\s*SECURITIES[^\\d]*AMOUNT\\s+OF\\s+INSURANCE[:\\s]*([0-9,]+|INCLUDED)"),
      Seq("MONEY\\s+[&]?\\s*SECURITIES[^\\d]*DEDUCTIBLE[:\\s]*([0-9,]+|[\\d%]+)")),
    ("pumps_canopy",
      Seq("PUMPS\\s+[&]?\\s*CANOPY[^\\d]*AMOUNT\\s+OF\\s+INSURANCE[:\\s]*([0-9,]+|INCLUDED)"),
      Seq("PUMPS\\s+[&]?\\s*CANOPY[^\\d]*DEDUCTIBLE[:\\s]*([0-9,]+|[\\d%]+)")),
    ("outdoor_signs",
      Seq("OUTDOOR\\s+SIGNS[^\\d]*AMOUNT\\s+OF\\s+INSURANCE[:\\s]*([0-9,]+|INCLUDED)"),
      Seq("OUTDOOR\\s+SIGNS[^\\d]*DEDUCTIBLE[:\\s]*([0-9,]+|[\\d%]+)")),
    ("windstorm_hail",
      Seq("WINDSTORM\\s+OR\\s+HAIL[^\\d]*AMOUNT\\s+OF\\s+INSURANCE[:\\s]*([0-9,]+|INCLUDED)"),
      Seq("WINDSTORM\\s+OR\\s+HAIL[^\\d]*DEDUCTIBLE[:\\s]*([0-9,]+|[\\d%]+)")))

  def propertyAmount(text: Column, coverage: String): Column = {
    val (_, amountPats, _) = PropertyCoveragePatterns.find(_._1 == coverage).get
    extractFirst(text, amountPats)
  }

  def propertyDeductible(text: Column, coverage: String): Column = {
    val (_, _, dedPats) = PropertyCoveragePatterns.find(_._1 == coverage).get
    extractFirst(text, dedPats)
  }

  // traveler/qc_head.py:925-937 — perils flags
  def perilBasic(text: Column): Column = text.rlike("(?i)\\bBASIC\\b")
  def perilBroad(text: Column): Column = text.rlike("(?i)\\bBROAD\\b")
  def perilSpecial(text: Column): Column = text.rlike("(?i)\\bSPECIAL\\b")
  def perilReplacementCost(text: Column): Column = text.rlike("(?i)REPLACEMENT\\s+COST")

  // traveler/qc_head.py:839-854 — certificate/revision number with
  // TBD/N/A/NONE validity filter (F10)
  private val InvalidValues = Seq("TBD", "N/A", "NONE", "")

  def validValue(v: Column): Column =
    when(v.isNull || upper(trim(v)).isin(InvalidValues.map(x => x: Any): _*),
      lit(null).cast("string")).otherwise(trim(v))

  def certificateNumber(text: Column): Column =
    validValue(extractFirst(text, Seq("CERTIFICATE\\s+NUMBER[:\\s]+([^\\n]+)")))

  def revisionNumber(text: Column): Column =
    validValue(extractFirst(text, Seq("REVISION\\s+NUMBER[:\\s]+([^\\n]+)")))

  // ------------------------------------------------- policy-text probes ----
  /** First `$ amount` within 200 chars after `Class N` (dot-all window),
    * money-normalized. Reference: hartford_done/llm4nano.py:212-226.
    */
  def classAmount(text: Column, classNo: Int): Column =
    Norms.normalizeMoneyCol(extractFirst(text,
      Seq(s"(?s)Class\\s*$classNo[\\s\\S]{0,200}?\\$$\\s*([0-9,]+)")))

  /** Explicit standalone Building limit present (negative lookahead excludes
    * the combined "Building and Personal Property" form name); three layout
    * styles — table, label, single-line.
    * Reference: hartford_done/llm4nano.py:229-244.
    */
  def hasExplicitBuildingLimit(text: Column): Column =
    text.rlike("(?mi)^\\s*\\d+\\s+\\d+\\s+Building(?!\\s+and\\s+Personal)\\b[\\s\\S]{0,80}?\\$\\s*[0-9,]+") ||
      text.rlike("(?mi)^\\s*Building(?!\\s+and\\s+Personal)\\b\\s*(?:\\n|\\s)+\\$\\s*[0-9,]+") ||
      text.rlike("(?mi)^\\s*Building(?!\\s+and\\s+Personal)\\b[\\t ]+\\$?\\s*[0-9,]+\\s*$")

  // ------------------------------------------------ §2.8 misc-field tail ---
  // traveler/qc_head.py:940-1116 — the remaining ~14 fields of the 40-field
  // battery: deductible fallbacks, locations list, premiums, insurer, NAIC,
  // producer contact, holder family, occurrence-vs-claims-made,
  // aggregate-applies-per capture, operations, WC, auto-type flags, class,
  // premium basis, remarks, cancellation.

  /** Python `.strip()` (all whitespace incl. newlines — SQL `trim` strips
    * spaces only), with the reference's `cleaned_fields` empty-string drop:
    * a whitespace-only capture becomes null, not "". */
  private def pyStrip(v: Column): Column =
    nullif(regexp_replace(v, "^\\s+|\\s+$", ""), lit(""))

  /** LAST match of a single pattern (the reference's finditer loops assign
    * per match, so the final assignment wins). Null when no match. */
  def lastMatch(text: Column, pattern: String, group: Int = 1): Column = {
    val arr = regexp_extract_all(text, lit("(?i)" + pattern), lit(group))
    when(size(arr) > 0, element_at(arr, lit(-1))).otherwise(lit(null).cast("string"))
  }

  // qc_head.py:940-949 — deductible fallbacks (tried when the property-table
  // pass produced none)
  def propertyDeductibleFallback(text: Column): Column =
    pyStrip(extractFirst(text, Seq("DEDUCTIBLE[:\\s]+\\$?\\s*([0-9,]+)")))

  def windstormDeductible(text: Column): Column =
    pyStrip(extractFirst(text, Seq("WINDSTORM[^\\$]*DEDUCTIBLE[:\\s]*([0-9,]+|[\\d%]+)")))

  // qc_head.py:951-965 — locations list: every match of every pattern in
  // pattern-major order, python-stripped, len>5 filter, first-occurrence
  // dedup (the reference's `if loc_text not in fields['locations']`)
  val LocationPatterns: Seq[String] = Seq(
    "LOCATION[/]?DESCRIPTION[:\\s]+([^\\n]+(?:\\n[^\\n]+){0,2})",
    "LOCATION[:\\s]+([^\\n]+(?:\\n[^\\n]+){0,2})",
    "PROPERTY[:\\s]+([^\\n]+(?:\\n[^\\n]+){0,2})",
    "ADDRESS[:\\s]+([^\\n]+(?:\\n[^\\n]+){0,2})")

  def locations(text: Column): Column = {
    val all = flatten(array(LocationPatterns.map(p =>
      regexp_extract_all(text, lit("(?i)" + p), lit(1))): _*))
    val stripped = transform(all, x => regexp_replace(x, "^\\s+|\\s+$", ""))
    array_distinct(filter(stripped, x => length(x) > 5))
  }

  // qc_head.py:967-983 — premiums: three finditer patterns whose group(0)
  // classification is statically per-pattern (a PREMIUM-pattern match never
  // contains ADVANCE because the match starts at "PREMIUM"), so each field
  // is the LAST match of its own pattern
  def totalPremium(text: Column): Column =
    lastMatch(text, "PREMIUM[:\\s]+\\$?\\s*([0-9,]+\\.?\\d*)")
  def premiumTotal(text: Column): Column =
    lastMatch(text, "TOTAL[:\\s]+\\$?\\s*([0-9,]+\\.?\\d*)")
  def advancePremium(text: Column): Column =
    lastMatch(text, "ADVANCE\\s+PREMIUM[:\\s]+\\$?\\s*([0-9,]+\\.?\\d*)")

  // qc_head.py:985-997 — insurer name: the reference's char class includes
  // \s, so the greedy capture runs across newlines until a char outside
  // [A-Z0-9\s&\-.] (faithfully kept; synthesis bounds it with ',' or ':')
  def insurerName(text: Column): Column = pyStrip(extractFirst(text, Seq(
    "INSURER[:\\s]+([A-Z0-9\\s&\\-\\.]+)",
    "INSURING\\s+COMPANY[:\\s]+([A-Z0-9\\s&\\-\\.]+)",
    "COMPANY[:\\s]+([A-Z0-9\\s&\\-\\.]+)")))

  // qc_head.py:999-1008
  def insurerNaic(text: Column): Column = pyStrip(extractFirst(text, Seq(
    "NAIC\\s+(?:#|NUMBER|NO\\.?)[:\\s]*([0-9A-Z]+)",
    "NAIC[:\\s]+([0-9A-Z]+)")))

  // qc_head.py:1010-1029 — producer/agency + contact
  def producerName(text: Column): Column = pyStrip(extractFirst(text, Seq(
    "PRODUCER[:\\s]+([^\\n]+(?:\\n[^\\n]+){0,2})",
    "AGENCY[:\\s]+([^\\n]+(?:\\n[^\\n]+){0,2})")))

  def producerPhone(text: Column): Column =
    pyStrip(extractFirst(text, Seq("PHONE[:\\s]+([0-9\\-\\(\\)\\s]+)")))

  def producerEmail(text: Column): Column =
    pyStrip(extractFirst(text, Seq("E[-]?MAIL[:\\s]+([^\\s\\n]+)")))

  // qc_head.py:1031-1047 — holder family: the reference loops all four
  // patterns WITHOUT break and each match classifies to its own field, so
  // the four are independent single extracts
  def certificateHolder(text: Column): Column =
    pyStrip(extractFirst(text, Seq("CERTIFICATE\\s+HOLDER[:\\s]+([^\\n]+)")))
  def additionalInsured(text: Column): Column =
    pyStrip(extractFirst(text, Seq("ADDITIONAL\\s+INSURED[:\\s]+([^\\n]+)")))
  def lossPayee(text: Column): Column =
    pyStrip(extractFirst(text, Seq("LOSS\\s+PAYEE[:\\s]+([^\\n]+)")))
  def mortgagee(text: Column): Column =
    pyStrip(extractFirst(text, Seq("MORTGAGEE[:\\s]+([^\\n]+)")))

  // qc_head.py:1049-1055 — OCCUR wins over CLAIMS-MADE when both present
  def occurrenceOrClaimsMade(text: Column): Column =
    when(text.rlike("(?i)(OCCUR|OCCURRENCE)"), lit("Occurrence"))
      .when(text.rlike("(?i)CLAIMS[-]?MADE"), lit("Claims-Made"))
      .otherwise(lit(null).cast("string"))

  // qc_head.py:1057-1060 — the capture form (the §2.8 boolean probes at
  // :822-831 are aggregateAppliesPer above)
  def aggregateAppliesPerText(text: Column): Column = pyStrip(extractFirst(text,
    Seq("AGGREGATE\\s+(?:LIMIT\\s+)?APPLIES\\s+PER[:\\s]+([^\\n]+)")))

  // qc_head.py:1062-1071
  def descriptionOfOperations(text: Column): Column = pyStrip(extractFirst(text, Seq(
    "DESCRIPTION\\s+OF\\s+OPERATIONS[:\\s]+([^\\n]+(?:\\n[^\\n]+){0,5})",
    "OPERATIONS[:\\s]+([^\\n]+(?:\\n[^\\n]+){0,3})")))

  // qc_head.py:1073-1080 — WC excluded flag, gated on WORKERS/COMPENSATION.
  // The reference regex's alternation captures only in the MEMBER EXCLUDED
  // branch; when the first match is a bare keyword (PROPRIETOR etc.) the
  // reference raises AttributeError on group(1) — here that case yields
  // null (a documented deviation: crash → absent field).
  def wcExcluded(text: Column): Column =
    when(upper(text).contains("WORKERS") || upper(text).contains("COMPENSATION"),
      pyStrip(extractFirst(text,
        Seq("PROPRIETOR|PARTNER|EXECUTIVE\\s+OFFICER|MEMBER\\s+EXCLUDED[:\\s]+([YN/A]+)"))))
      .otherwise(lit(null).cast("string"))

  // qc_head.py:1082-1091 — auto-type flags: plain substring probes on the
  // uppercased text, gated on AUTO/AUTOMOBILE; note "OWNED AUTOS" is a
  // substring of "NON-OWNED AUTOS", so owned is true whenever non-owned is
  // (faithful to the reference's `auto_type in content_upper`)
  val AutoTypes: Seq[(String, String)] = Seq(
    "any_auto" -> "ANY AUTO", "owned_autos" -> "OWNED AUTOS",
    "hired_autos" -> "HIRED AUTOS", "scheduled_autos" -> "SCHEDULED AUTOS",
    "non_owned_autos" -> "NON-OWNED AUTOS")

  def autoTypeFlag(text: Column, label: String): Column =
    upper(text).contains("AUTO") && upper(text).contains(label)

  // qc_head.py:1093-1096
  def classification(text: Column): Column =
    pyStrip(extractFirst(text, Seq("CLASS[:\\s]+([^\\n]+)")))

  // qc_head.py:1098-1101
  def premiumBasis(text: Column): Column =
    pyStrip(extractFirst(text, Seq("PREMIUM\\s+BASIS[:\\s]+([^\\n]+)")))

  // qc_head.py:1103-1112 — first-wins over the three remark forms
  def remarks(text: Column): Column = pyStrip(extractFirst(text, Seq(
    "REMARKS[:\\s]+([^\\n]+(?:\\n[^\\n]+){0,10})",
    "SPECIAL\\s+PROVISIONS[:\\s]+([^\\n]+(?:\\n[^\\n]+){0,5})",
    "SPECIAL\\s+CONDITIONS[:\\s]+([^\\n]+(?:\\n[^\\n]+){0,5})")))

  // qc_head.py:1114-1116
  def cancellationProvisions(text: Column): Column = pyStrip(extractFirst(text,
    Seq("CANCELLATION[:\\s]+([^\\n]+(?:\\n[^\\n]+){0,3})")))
}
