package graft.extract

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Normalization scalar functions used by the QC/compare stages, each in a
  * pure-Scala form (typed pipeline + test oracle) and a Catalyst `Column`
  * form (declarative pipeline) with identical semantics.
  *
  * Reference: hartford_done/llm4nano.py:45-76 (money), llm_pl_pol_cov.py:401-407
  * (name norm), pl_cov_additional_interests.py:118-157 (name variation),
  * policy_extract.py:53-65,709-711 (base-name strip).
  */
object Norms {

  // ------------------------------------------------------------- money -----
  /** Normalize money-like values to digits-only | "Included" | %-verbatim |
    * inside/outside-verbatim | null. Reference: hartford_done/llm4nano.py:45-71.
    */
  def normalizeMoney(value: String): Option[String] = {
    if (value == null) return None
    val v = value.strip()
    if (v.isEmpty) return None
    if (v.toLowerCase == "included") return Some("Included")
    if (v.endsWith("%")) return Some(v)
    val low = v.toLowerCase
    if (low.contains("inside") || low.contains("outside")) return Some(v)
    val digits = v.filter(_.isDigit)
    if (digits.isEmpty) None else Some(digits)
  }

  def normalizeMoneyCol(value: Column): Column = {
    val v = regexp_replace(value, "^\\p{javaWhitespace}+|\\p{javaWhitespace}+$", "")
    val low = lower(v)
    when(value.isNull || v === "", lit(null).cast("string"))
      .when(low === "included", lit("Included"))
      .when(v.endsWith("%"), v)
      .when(low.contains("inside") || low.contains("outside"), v)
      .otherwise {
        val digits = regexp_replace(v, "[^0-9]", "")
        when(digits === "", lit(null).cast("string")).otherwise(digits)
      }
  }

  /** Equality under money normalization. Reference: hartford_done/llm4nano.py:74-76. */
  def moneyEqual(a: String, b: String): Boolean = normalizeMoney(a) == normalizeMoney(b)

  // -------------------------------------------------------- name norm ------
  /** Lowercase, alphanumerics only — loose coverage-name matching key.
    * Reference: llm_pl_pol_cov.py:401-407.
    */
  def normName(s: String): String =
    if (s == null) "" else s.toLowerCase.filter(_.isLetterOrDigit)

  def normNameCol(s: Column): Column =
    coalesce(regexp_replace(lower(s), "[^\\p{javaLetterOrDigit}]", ""), lit(""))

  // ---------------------------------------------------- name variation -----
  private val EntitySuffixes = Seq(" LLC", " INC", " CORP", " L.L.C.", " I.N.C.", " CORP.")
  private val OcrPairs = Seq(("G", "H"), ("H", "G"), ("O", "0"), ("0", "O"), ("I", "1"), ("1", "I"))

  /** OCR-tolerant fuzzy name equality: entity-suffix strip, positional
    * difference <= 2 for equal-length names > 5 chars, and OCR confusion-pair
    * substitution closure for names > 8 chars. NOTE: exact reference
    * semantics — positional diff count (not edit distance), and the suffix
    * replace applies anywhere in the string, as `.replace` does.
    * Reference: pl_cov_additional_interests.py:118-157.
    */
  def isNameVariation(name1: String, name2: String): Boolean = {
    if (name1 == null || name2 == null) return false
    var n1 = name1.toUpperCase
    var n2 = name2.toUpperCase
    for (s <- EntitySuffixes) { n1 = n1.replace(s, ""); n2 = n2.replace(s, "") }
    if (n1.length == n2.length) {
      val diff = n1.zip(n2).count { case (a, b) => a != b }
      if (diff <= 2 && n1.length > 5) return true
    }
    if (n1.length > 8 && n2.length > 8) {
      val v1 = n1 +: OcrPairs.map { case (o, n) => n1.replace(o, n) }
      val v2 = n2 +: OcrPairs.map { case (o, n) => n2.replace(o, n) }
      for (a <- v1; b <- v2) if (a == b) return true
    }
    false
  }

  // ----------------------------------------------- tolerant QC compare -----
  /** Street-type abbreviations folded by the tolerant compare (Rd ≡ Road
    * etc.). Reference: llm_pl_pol.py:160-166 names date and address
    * tolerance; the abbreviation list is the standard USPS core set. */
  val AddressAbbrev: Seq[(String, String)] = Seq(
    "road" -> "rd", "street" -> "st", "avenue" -> "ave", "drive" -> "dr",
    "boulevard" -> "blvd", "lane" -> "ln", "highway" -> "hwy", "suite" -> "ste")

  private val DateFullRe = "^\\d{1,2}/\\d{1,2}/\\d{4}$"
  private val DateZeroStrip = "^0?(\\d{1,2})/0?(\\d{1,2})/(\\d{4})$"
  private val MoneyLikeRe = "^\\$?\\s*[0-9][0-9,\\.]*$"

  /** Format-tolerant normalization for QC value compare:
    *  - `M/D/YYYY` ≡ `MM/DD/YYYY` (leading zeros stripped),
    *  - money-like strings reduced to digits,
    *  - everything else case-folded with `[.,#]` punctuation spaced out,
    *    street-type words abbreviated ([[AddressAbbrev]]), whitespace
    *    collapsed — so `123 Main Road, Suite 4` ≡ `123 MAIN RD. STE 4`.
    * Null/blank → null. Reference: llm_pl_pol.py:160-166.
    */
  def tolerantNorm(value: String): String = {
    if (value == null) return null
    val t = value.replaceAll("^\\s+|\\s+$", "")
    if (t.isEmpty) return null
    if (t.matches(DateFullRe))
      t.replaceAll(DateZeroStrip, "$1/$2/$3")
    else if (t.matches(MoneyLikeRe))
      t.replaceAll("[^0-9]", "")
    else {
      var x = t.toLowerCase.replaceAll("[.,#]", " ")
      for ((full, ab) <- AddressAbbrev) x = x.replaceAll("\\b" + full + "\\b", ab)
      x.replaceAll("\\s+", " ").replaceAll("^\\s+|\\s+$", "")
    }
  }

  def tolerantNormCol(value: Column): Column = {
    val t = regexp_replace(value, "^\\s+|\\s+$", "")
    val dateNorm = regexp_replace(t, DateZeroStrip, "$1/$2/$3")
    val addr0 = regexp_replace(lower(t), "[.,#]", " ")
    val addr1 = AddressAbbrev.foldLeft(addr0) { case (c, (full, ab)) =>
      regexp_replace(c, "\\b" + full + "\\b", ab)
    }
    val addr = regexp_replace(regexp_replace(addr1, "\\s+", " "), "^\\s+|\\s+$", "")
    when(value.isNull || t === "", lit(null).cast("string"))
      .when(t.rlike(DateFullRe), dateNorm)
      .when(t.rlike(MoneyLikeRe), regexp_replace(t, "[^0-9]", ""))
      .otherwise(addr)
  }

  /** Equality under the tolerant normalization. */
  def tolerantEqual(a: String, b: String): Boolean = tolerantNorm(a) == tolerantNorm(b)

  // ---------------------------------------------------- base-name strip ----
  /** Strip document-id suffixes the reference's filename conventions add.
    * Reference: policy_extract.py:53-65,709-711; traveler/qc_head.py:1150-1158.
    */
  private val SuffixRe = "(_policy2|_policy|_ocr|_Package)$"

  def baseName(docId: String): String =
    if (docId == null) null else docId.replaceAll(SuffixRe, "")

  def baseNameCol(docId: Column): Column = regexp_replace(docId, SuffixRe, "")

  // ----------------------------------------------------- Jaro–Winkler ------
  /** Jaro similarity (Jaro 1989): match window max(⌊max(len)/2⌋−1, 0),
    * transpositions = half the out-of-order matched positions; either
    * side empty → 0 (the engine convention — DuckDB's native
    * jaro_similarity agrees, including jw('','') = 0). */
  def jaro(a: String, b: String): Double = {
    val (la, lb) = (a.length, b.length)
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aFlag = new Array[Boolean](la)
    val bFlag = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bFlag(j) && a.charAt(i) == b.charAt(j)) {
          aFlag(i) = true; bFlag(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aFlag(i)) {
        while (!bFlag(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    (md / la + md / lb + (md - t / 2) / md) / 3.0
  }

  /** Jaro–Winkler (Winkler 1990): prefix boost (≤ 4 chars, scale 0.1)
    * applied only above the standard 0.7 threshold — the tie-breaking
    * name-similarity tier next to [[nameVariation]]'s Hamming rule for
    * producer/insurer/holder entity resolution. Bit-for-bit comparable
    * to DuckDB's native jaro_winkler_similarity (the oracle). */
  def jaroWinkler(a: String, b: String): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return j
    var l = 0
    val max = math.min(4, math.min(a.length, b.length))
    while (l < max && a.charAt(l) == b.charAt(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  /** Per-pair Jaro–Winkler rounded half-up at 6 decimals (the repetition
    * r6 idiom) over a (idCol, aCol, bCol) relation — zero-shuffle typed
    * kernel. */
  def jaroWinklerDf(pairs: org.apache.spark.sql.DataFrame, idCol: String,
      aCol: String, bCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val schema = StructType(Seq(pairs.schema(idCol),
      StructField("jw", DoubleType, nullable = false)))
    pairs.select(col(idCol), col(aCol), col(bCol))
      .mapPartitions(_.map { r =>
        val v = jaroWinkler(Option(r.getString(1)).getOrElse(""),
          Option(r.getString(2)).getOrElse(""))
        Row(r.get(0), BigDecimal(v)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      })(Encoders.row(schema))
  }
}
