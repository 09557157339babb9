package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** UT1-style blocklist filtering (the Université Toulouse 1 adult/spam
  * lists used by CCNet, RefinedWeb, and FineWeb): a document is dropped
  * when its DOMAIN is on the blocked-domain list, or when its bad-word
  * DENSITY crosses a threshold — density, not presence, because a single
  * incidental token must not kill a long document (RefinedWeb §3.1).
  *
  * Both lists are ordinary Scala sequences (production loads the real UT1
  * snapshot; the contract query pins a deterministic miniature). Density is
  * exact integer milli: blocked·1000 div tokens, so the gate replays it.
  *
  * Plan shape: fully narrow — token filter against a literal array and one
  * isin per row; no shuffle, no join. The word list rides the plan as a
  * literal (a real UT1 word list is ~25k entries ≈ 300 KB of literal array
  * — still fine; a multi-MB list would switch to a broadcast join on the
  * exploded token, the [[Classifier]] shape).
  */
object Blocklist {

  /** Flags per document: token counts, blocked-word count, exact milli
    * density, the domain verdict, and the combined drop decision. */
  def flags(df: DataFrame, idCol: String, textCol: String, domainCol: String,
      words: Seq[String], domains: Seq[String],
      ratioMilliThreshold: Long): DataFrame = {
    require(words.nonEmpty && domains.nonEmpty, "empty blocklist")
    val t = TextAnalysis.tokensCol(col(textCol))
    val wordsArr = array(words.map(lit): _*)
    df.select(col(idCol), col(domainCol).as("domain"),
        size(t).cast("long").as("n_tokens"),
        size(filter(t, x => array_contains(wordsArr, x))).cast("long")
          .as("n_blocked"))
      .withColumn("blocked_ratio_milli",
        expr("n_blocked * 1000L div greatest(n_tokens, 1L)"))
      .withColumn("domain_blocked", col("domain").isin(domains: _*))
      .withColumn("is_blocked",
        col("domain_blocked") || col("blocked_ratio_milli") >= ratioMilliThreshold)
  }

  /** Pure twin for one (text, domain). */
  def flagsPure(text: String, domain: String, words: Set[String],
      domains: Set[String], ratioMilliThreshold: Long)
      : (Long, Long, Long, Boolean, Boolean) = {
    val t = TextAnalysis.tokens(text)
    val nb = t.count(words.contains).toLong
    val ratio = nb * 1000L / math.max(t.size.toLong, 1L)
    val db = domains.contains(domain)
    (t.size.toLong, nb, ratio, db, db || ratio >= ratioMilliThreshold)
  }
}
