package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Character-level normalization passes for extracted web/PDF text:
  * HTML entity decoding and Unicode NFC composition. Both are
  * zero-shuffle per-row kernels (the ccScrub/Clones typed-Row idiom) —
  * pure functions of one string, no exchange at any corpus size.
  */
object Normalize {

  /** Named entities decoded by [[entityDecode]] — the fixed, versioned
    * table (everything else, including unknown names, passes through
    * verbatim; a silent best-guess on &foo; would corrupt code corpora). */
  val NamedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "mdash" -> "—",
    "ndash" -> "–", "hellip" -> "…", "rsquo" -> "’",
    "lsquo" -> "‘", "rdquo" -> "”", "ldquo" -> "“",
    "copy" -> "©", "reg" -> "®", "trade" -> "™",
    "deg" -> "°", "middot" -> "·", "laquo" -> "«",
    "raquo" -> "»", "eacute" -> "é", "szlig" -> "ß",
    "uuml" -> "ü", "ouml" -> "ö", "auml" -> "ä",
    "ntilde" -> "ñ", "ccedil" -> "ç")

  private val EntityRe =
    java.util.regex.Pattern.compile(
      "&(#[xX][0-9A-Fa-f]{1,6}|#[0-9]{1,7}|[A-Za-z]{1,10});")

  /** Decode HTML entities in one pass: the named table above, decimal
    * `&#NNN;`, and hex `&#xHH;`. Numeric references outside Unicode, on
    * surrogates, or on control chars other than tab/LF/CR stay verbatim
    * (the conservative choice for a training corpus — a broken entity is
    * better kept visible than silently mapped). Single pass, left to
    * right: `&amp;lt;` becomes `&lt;` and is NOT re-decoded (the HTML5
    * behavior; double-decoding is the classic corpus corruption). */
  def entityDecode(text: String): String = {
    if (text == null || text.indexOf('&') < 0) return text
    val m = EntityRe.matcher(text)
    // java.lang.StringBuilder: the 3-arg append is the (CharSequence,
    // from, to) overload — on Scala's StringBuilder the same call
    // auto-tuples into append(Any) and writes "(text,0,2)"
    val out = new java.lang.StringBuilder
    var last = 0
    while (m.find()) {
      out.append(text, last, m.start())
      val body = m.group(1)
      val rep: Option[String] =
        if (body.startsWith("#")) {
          val cp = try {
            if (body.length > 1 && (body.charAt(1) == 'x' || body.charAt(1) == 'X'))
              Integer.parseInt(body.substring(2), 16)
            else Integer.parseInt(body.substring(1), 10)
          } catch { case _: NumberFormatException => -1 }
          val ok = cp >= 0 && cp <= 0x10ffff &&
            !(cp >= 0xd800 && cp <= 0xdfff) &&
            (cp >= 0x20 || cp == 0x9 || cp == 0xa || cp == 0xd)
          if (ok) Some(new String(Character.toChars(cp))) else None
        } else NamedEntities.get(body)
      out.append(rep.getOrElse(m.group()))
      last = m.end()
    }
    out.append(text, last, text.length)
    out.toString
  }

  /** Unicode NFC composition (the canonical form every tokenizer and
    * dedup fingerprint should see: "e" + COMBINING ACUTE and "é" must
    * hash identically). Normalization of assigned characters is
    * stability-guaranteed across Unicode versions, so the JVM kernel and
    * any engine's nfc function agree. */
  def nfc(text: String): String =
    if (text == null) null
    else java.text.Normalizer.normalize(text, java.text.Normalizer.Form.NFC)

  /** Per-document normalization pass: entity-decode then NFC-compose,
    * with change flags for monitoring (a slice where `entity_changed`
    * spikes was double-escaped upstream). Zero-shuffle typed kernel. */
  def normalizeDf(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{BooleanType, StringType, StructField,
      StructType}
    val schema = StructType(Seq(df.schema(idCol),
      StructField("text_norm", StringType, nullable = true),
      StructField("entity_changed", BooleanType, nullable = false),
      StructField("nfc_changed", BooleanType, nullable = false)))
    df.select(col(idCol), col(textCol))
      .mapPartitions(_.map { r =>
        val t = r.getString(1)
        val de = entityDecode(t)
        val n = nfc(de)
        Row(r.get(0), n, de != t, n != de)
      })(Encoders.row(schema))
  }
}
