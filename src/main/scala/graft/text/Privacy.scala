package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quasi-identifier privacy operators for corpus release.
  *
  * PII scrubbing ([[TextAnalysis.piiScrub]]/[[TextAnalysis.ccScrubDf]])
  * redacts direct identifiers inside free text; this module handles the
  * STRUCTURED side of a release: combinations of quasi-identifier (QI)
  * columns that single out small groups of records even though no single
  * column is identifying (Sweeney 2002, "k-anonymity: a model for
  * protecting privacy"; Machanavajjhala et al. 2007, "l-diversity").
  *
  * A table is k-anonymous over its QI columns when every occurring QI
  * combination covers at least k records; groups below k get their QI
  * values suppressed (nulled) rather than dropped, so record counts and
  * the non-QI payload survive. l-diversity additionally demands at least
  * l DISTINCT sensitive values inside each kept group — a group of 50
  * records that all share one salary is 50-anonymous but leaks the salary
  * the moment membership is known.
  */
object Privacy {

  /** Suppression-model k-anonymity with an l-diversity verdict.
    *
    * Output = every input row with
    *  - the QI columns nulled when the row's QI group has fewer than k rows
    *  - `group_n`      rows sharing this QI combination (always emitted)
    *  - `n_sensitive`  distinct sensitive values in the group
    *  - `suppressed`   group_n < k
    *  - `l_diverse`    NOT suppressed AND n_sensitive >= l
    *
    * Shape at scale: ONE partial-agg groupBy over the QI columns (the
    * shuffle carries at most one row per distinct QI combination per map
    * partition) + one equi-join back on the QI key. The join is null-safe
    * (`<=>`) so rows with null QI values form their own group instead of
    * silently never matching. A hot QI combination (millions of rows
    * sharing one (country, segment)) is harmless: it aggregates map-side
    * and joins as one build row. Nothing is collected.
    */
  def kAnonymize(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
      k: Int, l: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(l >= 1, s"l must be >= 1: $l")
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(qiCols.forall(df.columns.contains),
      s"missing QI columns: ${qiCols.filterNot(df.columns.contains)}")
    require(df.columns.contains(sensitiveCol), s"missing $sensitiveCol")
    require(!qiCols.contains(sensitiveCol),
      "the sensitive column cannot also be a quasi-identifier")

    val stats = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      // join keys must not collide with the probe side's own columns
      .select(qiCols.map(c => col(c).as(s"__qi_$c")) :+
        col("group_n") :+ col("n_sensitive"): _*)

    val joinCond = qiCols.map(c => col(c) <=> col(s"__qi_$c"))
      .reduce(_ && _)
    val joined = df.join(stats, joinCond)
    val suppressed = col("group_n") < k
    val outCols =
      df.columns.toSeq.map { c =>
        if (qiCols.contains(c))
          when(suppressed, lit(null).cast(df.schema(c).dataType))
            .otherwise(col(c)).as(c)
        else col(c)
      } ++ Seq(
        col("group_n"),
        col("n_sensitive"),
        suppressed.as("suppressed"),
        (!suppressed && col("n_sensitive") >= l).as("l_diverse"))
    joined.select(outCols: _*)
  }

  /** Pure twin of [[kAnonymize]] for spec parity: rows are
    * (id, QI values, sensitive value); returns per id
    * (group_n, n_sensitive, suppressed, l_diverse). */
  def kAnonymizePure(rows: Seq[(Long, Seq[Option[String]], String)],
      k: Int, l: Int): Map[Long, (Long, Long, Boolean, Boolean)] = {
    require(k >= 1 && l >= 1)
    val groups = rows.groupBy(_._2)
    rows.map { case (id, qi, _) =>
      val g = groups(qi)
      val n = g.size.toLong
      val ns = g.map(_._3).distinct.size.toLong
      val sup = n < k
      id -> (n, ns, sup, !sup && ns >= l)
    }.toMap
  }

  // ------------------------------------------------ noisy count release ----

  /** 2^60, the [[TextAnalysis.hash60]] range — the uniform-draw denominator. */
  private val H = 1L << 60

  private def lnMicroCol(x: Column): Column = round(log(x) * 1e6).cast("long")
  private val lnHMicro = Math.round(Math.log(H.toDouble) * 1e6)

  /** Laplace-mechanism count release (Dwork et al. 2006), seeded variant:
    * per-group noisy counts `count + Lap(1/ε)` with the draw derived from
    * hash60(salt:key) through the inverse CDF —
    * `noise = -b·sgn(u-½)·ln(1-2|u-½|)`, b = 1/ε — in the repo's integer
    * micro-nat discipline (one `div` per group, lnMicro differences, no
    * engine-dependent RNG).
    *
    * REPRODUCIBLE noise, not private against an adversary who knows the
    * salt: real DP requires secret randomness, so production deployments
    * must treat `salt` as a secret drawn fresh per release. The seeded
    * form is what a data-release PIPELINE needs in test and audit: byte-
    * stable outputs, replayable by the oracle engine. Sensitivity is 1
    * (unit-weight count queries).
    *
    * Shape at scale: ONE partial-agg groupBy; the noise math is a narrow
    * projection over the (bounded-key) aggregate. Output:
    * (groupCols…, noisy_micro) — the true count is deliberately absent.
    */
  def dpCounts(df: DataFrame, groupCols: Seq[String], epsMilli: Long,
      salt: String): DataFrame = {
    require(epsMilli >= 1, s"epsMilli must be >= 1: $epsMilli")
    require(groupCols.nonEmpty && groupCols.forall(df.columns.contains),
      s"bad group columns: $groupCols")
    val key = concat_ws(":", lit(salt) +: groupCols.map(c =>
      col(c).cast("string")): _*)
    val h = TextAnalysis.hash60(key)
    val c = h * 2 - H                       // 2^60·(2u - 1) ∈ [-H, H)
    val sign = when(c >= 0, 1L).otherwise(-1L)
    val lnTail = lnMicroCol(greatest(lit(H) - abs(c), lit(1L))) - lnHMicro
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .withColumn("__sign", sign)
      .withColumn("__ln", lnTail)
      .withColumn("__noise_micro", expr(s"-(1000 * __sign * __ln) div $epsMilli"))
      .withColumn("noisy_micro", col("__n") * 1000000L + col("__noise_micro"))
      .select(groupCols.map(col) :+ col("noisy_micro"): _*)
  }

  // ------------------------------------------------ keyed pseudonymization -

  /** Keyed pseudonymization — the linkability-preserving alternative to
    * [[TextAnalysis.piiScrub]]'s redaction: every email becomes
    * `user<h6>@anon.invalid` and every phone number `555-<h4>`, where the
    * digits come from hash60(salt:identifier) — so the SAME identifier maps
    * to the SAME pseudonym corpus-wide (joins, co-occurrence and dedup
    * still work on the released data) while the raw value is gone. Phone
    * hashing keys on the DIGITS ONLY, so "(555) 123-4567" and
    * "555.123.4567" link to one pseudonym. Like [[dpCounts]], the salt
    * must be a per-release secret for any privacy claim — the keyed form
    * is a pseudonymization, not anonymization (GDPR art. 4(5) terms).
    *
    * Zero-shuffle typed kernel (per-match computed replacements have no
    * `regexp_replace` form — the ccScrub precedent). */
  def pseudonymize(text: String, salt: String): (String, Long, Long) = {
    def h(s: String, mod: Long): Long =
      java.lang.Long.remainderUnsigned(TextAnalysis.hash60(s"$salt:$s"), mod)
    var nEmail = 0L
    var nPhone = 0L
    val afterEmail = java.util.regex.Pattern.compile(TextAnalysis.EmailRe)
      .matcher(text).replaceAll { m =>
        nEmail += 1
        f"user${h(m.group().toLowerCase, 1000000L)}%06d@anon.invalid"
      }
    val clean = java.util.regex.Pattern.compile(TextAnalysis.PhoneRe)
      .matcher(afterEmail).replaceAll { m =>
        nPhone += 1
        f"555-${h(m.group().replaceAll("[^0-9]", ""), 10000L)}%04d"
      }
    (clean, nEmail, nPhone)
  }

  /** Distributed [[pseudonymize]] over (idCol, textCol); id type kept. */
  def pseudonymizeDf(df: DataFrame, idCol: String, textCol: String,
      salt: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(df.schema(idCol),
      StructField("clean", StringType, nullable = false),
      StructField("n_email", LongType, nullable = false),
      StructField("n_phone", LongType, nullable = false)))
    df.select(col(idCol), col(textCol))
      .mapPartitions { it =>
        it.map { r =>
          val (c, e, p) = pseudonymize(
            if (r.isNullAt(1)) "" else r.getString(1), salt)
          org.apache.spark.sql.Row(r.get(0), c, e, p)
        }
      }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Pure twin of [[dpCounts]] for one group. */
  def dpCountPure(groupVals: Seq[String], n: Long, epsMilli: Long,
      salt: String): Long = {
    val h = TextAnalysis.hash60((salt +: groupVals).mkString(":"))
    val c = h * 2 - H
    val sign = if (c >= 0) 1L else -1L
    val lnTail = Math.round(Math.log(math.max(H - math.abs(c), 1L).toDouble)
      * 1e6) - lnHMicro
    val noise = -(1000L * sign * lnTail) / epsMilli
    n * 1000000L + noise
  }
}
