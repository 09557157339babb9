package graft.pipeline

import graft.dedup.Dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level near-duplicate JOB entry points: the dedup operators with the
  * skew levers ON by default and every dropped hot key logged.
  *
  * The operators in [[graft.dedup.Dedup]] default their caps OFF so the
  * oracle-parity contract queries replay bit-for-bit in DuckDB; that default
  * is wrong for a production corpus, where one viral shingle (a boilerplate
  * sentence shared by millions of pages) or one hot band bucket (every empty
  * doc fingerprints to 0) degrades the candidate join to O(n²). Anything
  * job-sized goes through here, where the caps are on unless explicitly
  * disabled and the drop counts are visible in the driver log — silent
  * truncation would read as "covered everything" when it didn't.
  */
object DedupJob {

  /** Default skew caps. `maxDf`: shingles appearing in more docs than this
    * are dropped from candidate generation and verification (a shingle
    * shared by >10k docs is boilerplate, not evidence of duplication).
    * `maxBucket`: LSH band buckets holding more docs than this are skipped
    * for candidate enumeration (pairs stay reachable through their other
    * bands; a whole dropped fingerprint group is exact-dup territory). */
  final case class Caps(maxDf: Int = 10000, maxBucket: Int = 10000)

  /** What the caps dropped, returned alongside the pairs and logged. */
  final case class DropReport(hot_shingles: Long, hot_buckets: Long)

  private def info(msg: String): Unit = println(s"[graft] $msg")

  /** MinHash/LSH near-dup with caps on. `report = true` (default) runs a
    * counting pre-pass over the hot-key relations so the log states exactly
    * what was dropped; pass `report = false` to skip the extra scans when
    * the job is latency-bound and the caps alone suffice. */
  def minhashNearDuplicates(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 32, bands: Int = 8, minJ: Double = 0.5,
      caps: Caps = Caps(), report: Boolean = true): (DataFrame, DropReport) = {
    val drops = if (!report) DropReport(-1, -1) else {
      val hotShingles = Dedup.shingleRows(df, idCol, textCol, n).distinct()
        .groupBy("sh").agg(countDistinct(col(idCol)).as("df"))
        .filter(col("df") > caps.maxDf).count()
      val hotBuckets = Dedup.minhashBandRows(df, idCol, textCol, n, k, bands)
        .groupBy("band").agg(count(lit(1)).as("n"))
        .filter(col("n") > caps.maxBucket).count()
      info(s"minhash dedup: dropping $hotShingles hot shingles (df > ${caps.maxDf}) " +
        s"and $hotBuckets hot band buckets (> ${caps.maxBucket} docs)")
      DropReport(hotShingles, hotBuckets)
    }
    (Dedup.minhashDuplicates(df, idCol, textCol, n, k, bands, minJ,
      maxDf = caps.maxDf, maxBucket = caps.maxBucket), drops)
  }

  /** SimHash near-dup with the hot-band cap on. */
  def simhashNearDuplicates(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, caps: Caps = Caps(),
      report: Boolean = true): (DataFrame, DropReport) = {
    val drops = if (!report) DropReport(-1, -1) else {
      val hotBuckets = Dedup.simhashBandRows(df, idCol, textCol)
        .groupBy("band").agg(count(lit(1)).as("n"))
        .filter(col("n") > caps.maxBucket).count()
      info(s"simhash dedup: dropping $hotBuckets hot band buckets " +
        s"(> ${caps.maxBucket} docs)")
      DropReport(0, hotBuckets)
    }
    (Dedup.simhashDuplicates(df, idCol, textCol, maxHamming,
      maxBucket = caps.maxBucket), drops)
  }

  /** Exact n-gram Jaccard pairs with the viral-shingle cap on. */
  def jaccardNearDuplicates(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minJ: Double = 0.5, caps: Caps = Caps(),
      report: Boolean = true): (DataFrame, DropReport) = {
    val drops = if (!report) DropReport(-1, -1) else {
      val hotShingles = Dedup.shingleRows(df, idCol, textCol, n).distinct()
        .groupBy("sh").agg(countDistinct(col(idCol)).as("df"))
        .filter(col("df") > caps.maxDf).count()
      info(s"jaccard dedup: dropping $hotShingles hot shingles (df > ${caps.maxDf})")
      DropReport(hotShingles, 0)
    }
    (Dedup.jaccardPairs(df, idCol, textCol, n, minJ, maxDf = caps.maxDf), drops)
  }
}
