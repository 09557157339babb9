package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL ingest with a quarantine side channel — the entry point that
  * turns a crawl dump of JSON lines into typed rows WITHOUT dropping the
  * garbage silently. At corpus scale some fraction of lines is always
  * truncated (killed writers), malformed (encoding bugs), or missing
  * required fields (schema drift); a pipeline that `.filter(isNotNull)`s
  * them away cannot answer "what did we lose this crawl?".
  *
  * [[parseLines]] keeps EVERY input line and attaches
  * `(quarantined, reason)`: reason `corrupt` when the line does not parse
  * against the expected schema (Catalyst `from_json`, PERMISSIVE — a
  * malformed document yields a null struct), or `missing:<field>` for the
  * first required field that is null (schema drift / JSON null both
  * count: required means present AND non-null). Parsing is a codegen'd
  * expression over the scan — ZERO shuffles at any corpus size; callers
  * split on the flag and route the quarantine branch to its own sink.
  */
object Jsonl {

  /** Reserved struct field carrying the raw text of a malformed line. */
  val CorruptField = "_corrupt_record"

  /** Parse `lineCol` of `df` against `schema`. Output: the schema's
    * columns (null for unparsable lines) + `quarantined` + `reason`;
    * other input columns are dropped (the line IS the record). */
  def parseLines(df: DataFrame, lineCol: String, schema: StructType,
      required: Seq[String]): DataFrame = {
    require(required.forall(schema.fieldNames.contains),
      s"required fields ${required.mkString(",")} must be in the schema")
    require(!schema.fieldNames.contains(CorruptField),
      s"$CorruptField is reserved for the malformed-line channel")
    // PERMISSIVE from_json yields an ALL-NULL struct for a malformed line
    // (not a null struct), indistinguishable from valid-but-empty JSON —
    // the corrupt-record channel is the only reliable malformed signal
    val parsed = df.withColumn("__p",
      from_json(col(lineCol), schema.add(CorruptField, "string"),
        Map("columnNameOfCorruptRecord" -> CorruptField)))
    val missing = required.map(f =>
      when(col(s"__p.$f").isNull, lit(s"missing:$f")))
    val reason = when(col(s"__p.$CorruptField").isNotNull, lit("corrupt"))
      .otherwise(if (missing.isEmpty) lit(null).cast("string")
        else coalesce(missing :+ lit(null).cast("string"): _*))
    parsed
      .withColumn("reason", reason)
      .withColumn("quarantined", col("reason").isNotNull)
      .select(schema.fieldNames.map(f => col(s"__p.$f").as(f)) ++
        Seq(col("quarantined"), col("reason")): _*)
  }
}
