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
}
