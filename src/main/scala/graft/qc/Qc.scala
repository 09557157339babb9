package graft.qc

import graft.extract.Norms

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** QC stage operators: the guardrail semi-join J4, the deterministic
  * cert-vs-policy path compare J5, and the summary recomputations A1/A4.
  */
object Qc {

  // ----------------------------------------------------------- J4 ----------
  /** Guardrail filter: keep validation rows whose normalized name has
    * bidirectional substring containment with any requested item; if nothing
    * matched, fall back to the first N validations; cap at N requested.
    * Reference: llm_pl_pol_cov.py:409-446.
    *
    * Cardinalities are per-document and tiny (≤ ~10 rows each side), so the
    * distributed shape is a per-row typed function, not a cluster-wide join.
    */
  def guardrailFilter[T](
      validations: Seq[T], validationName: T => String,
      requestedNames: Seq[String]): Seq[T] = {
    if (requestedNames.isEmpty) return Seq.empty
    val requestedNorms = requestedNames.map(Norms.normName).filter(_.nonEmpty)
    if (requestedNorms.isEmpty) return Seq.empty
    val filtered = validations.filter { v =>
      val n = Norms.normName(validationName(v))
      n.nonEmpty && requestedNorms.exists(r => n.contains(r) || r.contains(n))
    }
    val result = if (filtered.isEmpty) validations.take(requestedNames.length) else filtered
    result.take(requestedNames.length)
  }

  /** J4 as a DataFrame plan for when validations and requested items live in
    * separate tables: a theta containment join (left-semi) on the `docCol`
    * equi-key, with the head-N fallback and cap expressed by per-doc windows.
    * `valDf` needs (docCol, nameCol, seqCol) plus payload; `reqDf` needs
    * (docCol, reqNameCol).
    *
    * All three derived relations (`req`, `matchCount`, `reqCount`) are
    * corpus-sized — one or more rows per document — so none is broadcast:
    * every join here has an equality key on `docCol` and runs as a shuffle
    * join (or whatever AQE picks at runtime). Forcing `broadcast()` on a
    * per-document relation OOMs at corpus scale; QcSpec asserts the physical
    * plan contains no BroadcastExchange over these sides.
    *
    * `seqCol` is the caller's stable per-doc insertion-order column (span
    * offset, file line, a row index materialized at ingest...). The reference
    * semantics of the head-N fallback is "first N in file order"
    * (llm_pl_pol_cov.py:409-446); deriving order from partition layout
    * (e.g. monotonically_increasing_id) would pick different rows after a
    * repartition or task retry, so an explicit column is required.
    */
  def guardrailJoinDf(valDf: DataFrame, reqDf: DataFrame, docCol: String,
      nameCol: String, reqNameCol: String, seqCol: String): DataFrame = {
    require(valDf.columns.contains(seqCol),
      s"guardrailJoinDf: valDf must carry the stable order column '$seqCol'")
    val vNorm = Norms.normNameCol(col(nameCol))
    val rNorm = Norms.normNameCol(col(reqNameCol))
    // the cap N counts ALL requested rows (even ones normalizing to empty),
    // but a doc participates only if >=1 request normalizes non-empty —
    // exactly guardrailFilter's requestedNames.length / requestedNorms guard
    val reqAll = reqDf.select(col(docCol), rNorm.as("__req_norm"))
    val req = reqAll.filter(col("__req_norm") =!= "")
    val reqCount = reqAll.groupBy(docCol).agg(count(lit(1)).as("__n_req"),
      max(col("__req_norm") =!= "").as("__has_norm"))

    val withNorm = valDf.withColumn("__v_norm", vNorm)
      .withColumn("__seq", col(seqCol))
    val matched = withNorm
      .join(req,
        withNorm(docCol) === req(docCol) && col("__v_norm") =!= "" &&
          (col("__v_norm").contains(col("__req_norm")) ||
            col("__req_norm").contains(col("__v_norm"))),
        "left_semi")
    val matchCount = matched.groupBy(docCol).agg(count(lit(1)).as("__n_match"))

    // fallback: docs with requested items but zero matches take head-N
    val w = Window.partitionBy(docCol).orderBy("__seq")
    val fallback = withNorm
      .join(matchCount, Seq(docCol), "left_anti")
      .withColumn("__rn", row_number().over(w))
    val capped = matched.withColumn("__rn", row_number().over(w))
      .unionByName(fallback)
      .join(reqCount, Seq(docCol), "inner") // no requested → empty
      .filter(col("__has_norm") && col("__rn") <= col("__n_req"))
    capped.drop("__v_norm", "__seq", "__rn", "__n_req", "__has_norm")
  }

  // ----------------------------------------------------------- J5 ----------
  /** One field-path check row. */
  final case class Mismatch(field: String, certificate: String, policy: String)
  final case class QcResult(status: String, mismatches: Seq[Mismatch])

  /** The 19 path-pairs of the deterministic QC compare
    * (hartford_done/llm4nano.py:94-155): (field, certPath, policyPath) with
    * "0" segments indexing lists. */
  val Checks: Seq[(String, Seq[String], Seq[String])] = Seq(
    ("property.policy_number", Seq("property", "policy_number"), Seq("property", "policy_number")),
    ("property.effective_date", Seq("property", "effective_date"), Seq("property", "policy_period", "effective_date")),
    ("property.expiration_date", Seq("property", "expiration_date"), Seq("property", "policy_period", "expiration_date")),
    ("gl.policy_number", Seq("general_liability", "policy_number"), Seq("general_liability", "policy_number")),
    ("gl.effective_date", Seq("general_liability", "effective_date"), Seq("general_liability", "policy_period", "effective_date")),
    ("gl.expiration_date", Seq("general_liability", "expiration_date"), Seq("general_liability", "policy_period", "expiration_date")),
    ("gl.limits.each_occurrence", Seq("general_liability", "limits", "each_occurrence"), Seq("general_liability", "limits", "each_occurrence")),
    ("gl.limits.general_aggregate", Seq("general_liability", "limits", "general_aggregate"), Seq("general_liability", "limits", "general_aggregate")),
    ("gl.limits.products_completed_operations_aggregate", Seq("general_liability", "limits", "products_completed_operations_aggregate"), Seq("general_liability", "limits", "products_completed_operations_aggregate")),
    ("gl.limits.personal_advertising_injury", Seq("general_liability", "limits", "personal_advertising_injury"), Seq("general_liability", "limits", "personal_advertising_injury")),
    ("gl.limits.damage_to_rented_premises", Seq("general_liability", "limits", "damage_to_rented_premises"), Seq("general_liability", "limits", "damage_to_rented_premises")),
    ("gl.limits.medical_expense", Seq("general_liability", "limits", "medical_expense"), Seq("general_liability", "limits", "medical_expense")),
    ("property.locations[0].business_personal_property", Seq("property", "locations", "0", "business_personal_property"), Seq("property", "locations", "0", "business_personal_property")),
    ("property.locations[0].building", Seq("property", "locations", "0", "building"), Seq("property", "locations", "0", "building")),
    ("property.locations[0].business_income", Seq("property", "locations", "0", "business_income"), Seq("property", "locations", "0", "business_income")),
    ("property.locations[0].deductible", Seq("property", "locations", "0", "deductible"), Seq("property", "locations", "0", "deductible")),
    ("policy.property.outdoor_signs_limit", Seq("property", "locations", "0", "outdoor_signs"), Seq("property", "outdoor_signs_limit")),
    ("policy.property.windstorm_or_hail", Seq("property", "locations", "0", "windstorm_or_hail"), Seq("property", "windstorm_or_hail")),
    ("policy.property.theft_sublimit", Seq("property", "locations", "0", "theft_sublimit"), Seq("property", "theft_sublimit")))

  /** Resolve a path through nested maps/lists ("0" = list index). */
  def resolvePath(root: Any, path: Seq[String]): Option[String] = {
    var cur: Any = root
    for (k <- path) {
      cur = cur match {
        case m: Map[_, _] if !k.forall(_.isDigit) || m.asInstanceOf[Map[String, Any]].contains(k) =>
          m.asInstanceOf[Map[String, Any]].getOrElse(k, null)
        case l: Seq[_] if k.forall(_.isDigit) =>
          val i = k.toInt
          if (i < l.length) l(i) else null
        case _ => null
      }
      if (cur == null) return None
    }
    cur match {
      case null => None
      case s: String => Some(s)
      case other => Some(other.toString)
    }
  }

  /** Deterministic cert-vs-policy compare (hartford_done strict null
    * semantics: one-sided null = mismatch; both-null = skip).
    * Location checks are dropped when the cert has no locations list.
    * Reference: hartford_done/llm4nano.py:78-209.
    *
    * `tolerant = true` switches equality and reporting to the
    * format-tolerant normalization ([[Norms.tolerantNorm]]): `09/26/2025` ≡
    * `9/26/2025`, `Rd` ≡ `Road`, case-insensitive names — the PL QC
    * semantics of llm_pl_pol.py:160-166. The default stays the strict
    * hartford money-only normalization.
    */
  def qcCompare(certificate: Map[String, Any], policy: Map[String, Any],
      tolerant: Boolean = false): QcResult = {
    val certLocations = certificate.get("property") match {
      case Some(p: Map[_, _]) => p.asInstanceOf[Map[String, Any]].get("locations") match {
        case Some(l: Seq[_]) => l.nonEmpty
        case _ => false
      }
      case _ => false
    }
    val checks =
      if (certLocations) Checks
      else Checks.filterNot { case (_, certPath, _) => certPath.contains("locations") }

    def eq(c: String, p: String): Boolean =
      if (tolerant) Norms.tolerantEqual(c, p) else Norms.moneyEqual(c, p)
    def norm(v: String): String =
      if (tolerant) Norms.tolerantNorm(v) else Norms.normalizeMoney(v).orNull

    val mismatches = checks.flatMap { case (field, certPath, polPath) =>
      val certVal = resolvePath(certificate, certPath)
      val polVal = resolvePath(policy, polPath)
      (certVal, polVal) match {
        case (None, None) => None
        case (Some(c), Some(p)) if eq(c, p) => None
        case _ => Some(Mismatch(field,
          certVal.map(norm).orNull, polVal.map(norm).orNull))
      }
    }
    QcResult(if (mismatches.isEmpty) "pass" else "needs_review", mismatches)
  }

  /** J5 as a DataFrame plan over two flattened key-value frames
    * `(docCol, field, value)` joined on the check dimension — the shape for
    * corpus-scale QC. Yields one row per (doc, field) mismatch plus the
    * per-doc status. Strict hartford_done null semantics via a full-outer
    * join per field.
    */
  def qcCompareDf(certKv: DataFrame, polKv: DataFrame, docCol: String): DataFrame = {
    val c = certKv.select(col(docCol), col("field"),
      Norms.normalizeMoneyCol(col("value")).as("certificate"))
      .filter(col("certificate").isNotNull)
    val p = polKv.select(col(docCol), col("field"),
      Norms.normalizeMoneyCol(col("value")).as("policy"))
      .filter(col("policy").isNotNull)
    val joined = c.join(p, Seq(docCol, "field"), "full_outer")
    joined.withColumn("is_mismatch",
      col("certificate").isNull || col("policy").isNull ||
        col("certificate") =!= col("policy"))
  }

  /** [[qcCompareDf]] with the format-tolerant normalization
    * ([[Norms.tolerantNormCol]]) instead of the strict money-only one:
    * date leading-zero, street-abbreviation and case differences stop
    * counting as mismatches. Reference: llm_pl_pol.py:160-166. */
  def qcCompareTolerantDf(certKv: DataFrame, polKv: DataFrame, docCol: String): DataFrame = {
    val c = certKv.select(col(docCol), col("field"),
      Norms.tolerantNormCol(col("value")).as("certificate"))
      .filter(col("certificate").isNotNull)
    val p = polKv.select(col(docCol), col("field"),
      Norms.tolerantNormCol(col("value")).as("policy"))
      .filter(col("policy").isNotNull)
    c.join(p, Seq(docCol, "field"), "full_outer")
      .withColumn("is_mismatch",
        col("certificate").isNull || col("policy").isNull ||
          col("certificate") =!= col("policy"))
  }

  /** [[qcCompareTolerantDf]] with an OCR-noise edit-distance budget on top:
    * after tolerant normalization, values within `maxEdits` Levenshtein
    * edits still count as a match — the tolerance a scanned-document QC
    * needs for single-glyph OCR slips ('O'→'0', dropped punctuation) that
    * [[Norms.isNameVariation]] (J6) handles only for same-length strings.
    * `levenshtein` is codegen'd and both-engine native, so the verdict
    * replays exactly. Null on either side is still a hard mismatch
    * (hartford-strict), and `edit_distance` rides along for audit. */
  def qcCompareFuzzyDf(certKv: DataFrame, polKv: DataFrame, docCol: String,
      maxEdits: Int = 1): DataFrame = {
    val c = certKv.select(col(docCol), col("field"),
      Norms.tolerantNormCol(col("value")).as("certificate"))
      .filter(col("certificate").isNotNull)
    val p = polKv.select(col(docCol), col("field"),
      Norms.tolerantNormCol(col("value")).as("policy"))
      .filter(col("policy").isNotNull)
    c.join(p, Seq(docCol, "field"), "full_outer")
      .withColumn("edit_distance",
        when(col("certificate").isNull || col("policy").isNull,
          lit(null).cast("long"))
          .otherwise(levenshtein(col("certificate"), col("policy")).cast("long")))
      .withColumn("is_mismatch",
        col("edit_distance").isNull || col("edit_distance") > maxEdits)
  }

  // ----------------------------------------------------------- A1 ----------
  final case class StatusCounts(total: Long, matched: Long, mismatched: Long, not_found: Long)

  /** Recompute MATCH/MISMATCH/NOT_FOUND counts from a validation array
    * ("avoid hallucinated totals"). Reference: llm_gl_pol_cov.py:235-251,
    * llm_pl_pol_cov.py:448-565. */
  def statusCounts(statuses: Seq[String]): StatusCounts = {
    var (m, mm, nf) = (0L, 0L, 0L)
    statuses.foreach { s =>
      val u = if (s == null) "" else s.toUpperCase
      if (u == "MATCH") m += 1
      else if (u == "MISMATCH") mm += 1
      else if (u == "NOT_FOUND") nf += 1
    }
    StatusCounts(statuses.length, m, mm, nf)
  }

  /** PRESENT/NOT_PRESENT variant for coverage-presence validations.
    * Reference: llm_gl_pol_cov.py:268-279. */
  def presenceCounts(statuses: Seq[String]): (Long, Long, Long) = {
    var (p, np) = (0L, 0L)
    statuses.foreach { s =>
      val u = if (s == null) "" else s.toUpperCase
      if (u == "PRESENT") p += 1 else if (u == "NOT_PRESENT") np += 1
    }
    (statuses.length, p, np)
  }

  /** A1 as a single-shuffle DataFrame aggregation over
    * `(groupCols..., status)` rows. */
  def statusCountsDf(df: DataFrame, groupCols: Seq[String], statusCol: String = "status"): DataFrame = {
    val u = upper(coalesce(col(statusCol), lit("")))
    df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("total"),
      count(when(u === "MATCH", 1)).as("matched"),
      count(when(u === "MISMATCH", 1)).as("mismatched"),
      count(when(u === "NOT_FOUND", 1)).as("not_found"))
  }

  // ----------------------------------------------------------- A4 ----------
  /** Summary-total consistency patch: force total = size of the array.
    * Reference: policy_additional_interests.py:291-295. */
  def patchSummaryTotal(df: DataFrame, arrayCol: String, totalCol: String = "total"): DataFrame =
    df.withColumn(totalCol, size(col(arrayCol)))

  // ----------------------------------------------------------- A5 ----------
  /** Keyword-presence validation: valid iff content > 100 chars; report
    * which expected keywords appear. Reference: traveler/qc_head.py:490-540. */
  val SectionKeywords: Map[String, Seq[String]] = Map(
    "GL" -> Seq("limit", "aggregate", "occurrence"),
    "PROPERTY" -> Seq("building", "property", "coverage"))

  def validateSection(coverage: String, content: String): (Boolean, Seq[String]) = {
    val valid = content != null && content.length > 100
    val low = if (content == null) "" else content.toLowerCase
    val found = SectionKeywords.getOrElse(coverage, Seq.empty).filter(low.contains)
    (valid, found)
  }

  def validateSectionCols(coverage: Column, content: Column): (Column, Column) = {
    val valid = coalesce(length(content), lit(0)) > 100
    val kws = SectionKeywords.toSeq.foldLeft(lit(null).cast("array<string>")) {
      case (acc, (cov, kws)) =>
        when(coverage === cov,
          filter(array(kws.map(lit): _*), k => lower(content).contains(k))).otherwise(acc)
    }
    (valid, coalesce(kws, array()))
  }
}
