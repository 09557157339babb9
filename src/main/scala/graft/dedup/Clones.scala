package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Type-2 (alpha-renamed) code-clone detection — the code-corpus member
  * of the dedup family. Exact dedup catches byte-identical files and
  * MinHash catches near-identical text, but copied CODE is routinely
  * re-identifier-ed (`fooCount` → `n`, `tmp1` → `acc`); the standard
  * normalization (Baker 1995 parameterized matching; CCFinder's
  * token-class rename) maps every non-keyword identifier to its
  * first-occurrence index and every number literal to `num`, so two
  * functions that differ only in naming and constants share one canonical
  * token string.
  *
  * Shape at scale: the normalize+fingerprint kernel is zero-shuffle
  * per-row work; grouping is ONE partial-agg groupBy on the 60-bit
  * canonical fingerprint + one equi-join back (the k-anon shape — a
  * boilerplate file cloned 10⁸ times is one build row, never a buffered
  * window partition).
  */
object Clones {

  /** Longest-match-first token classes: identifier, integer literal, any
    * single non-space char. Shared verbatim with the SQL oracle (RE2 and
    * java.util.regex both take the first matching alternative). */
  val TokenPattern = "[A-Za-z_][A-Za-z0-9_]*|[0-9]+|\\S"

  /** Identifiers that keep their spelling — renaming `if` would erase
    * structure. Deliberately small and language-agnostic. */
  val Keywords: Set[String] = Set("def", "return", "if", "else", "while",
    "for", "class", "val", "var", "import", "new", "null", "true", "false")

  private val IdentRe = "[A-Za-z_][A-Za-z0-9_]*".r
  private val NumRe = "[0-9]+".r

  /** Canonical alpha-renamed token string of one code fragment. */
  def normalize(code: String): String = {
    val m = java.util.regex.Pattern.compile(TokenPattern).matcher(code)
    val out = new StringBuilder
    val ids = scala.collection.mutable.HashMap.empty[String, String]
    while (m.find()) {
      val tk = m.group()
      val mapped =
        if (IdentRe.matches(tk) && !Keywords(tk))
          ids.getOrElseUpdate(tk, s"id${ids.size}")
        else if (NumRe.matches(tk)) "num"
        else tk
      if (out.nonEmpty) out += ' '
      out ++= mapped
    }
    out.toString
  }

  /** Per-document canonical fingerprint + clone-group size:
    * (idCol, fingerprint, group_n). Docs sharing a fingerprint are
    * type-2 clones of each other. */
  def cloneGroups(df: DataFrame, idCol: String, codeCol: String): DataFrame = {
    require(df.columns.contains(idCol) && df.columns.contains(codeCol),
      s"missing $idCol or $codeCol")
    // typed Row kernel with an explicit encoder so the id column keeps its
    // type (the shingleRows idiom)
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(df.schema(idCol),
      StructField("fingerprint", LongType, nullable = false)))
    val fps = df.select(col(idCol), col(codeCol))
      .mapPartitions(_.map { r =>
        Row(r.get(0), graft.text.TextAnalysis.hash60(normalize(
          Option(r.getString(1)).getOrElse(""))))
      })(Encoders.row(schema))
    val sizes = fps.groupBy("fingerprint")
      .agg(count(lit(1)).as("group_n"))
    fps.join(sizes, "fingerprint")
      .select(col(idCol), col("fingerprint"), col("group_n"))
  }
}
