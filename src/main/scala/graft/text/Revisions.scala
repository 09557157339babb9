package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Revision tracking between document versions (re-crawls, editing
  * passes, OCR re-runs): exact capped Levenshtein distance per pair.
  * The complement to the fingerprint tiers — MinHash answers "are these
  * near-dups?", this answers "HOW MUCH changed?" for the pairs that
  * matter (same doc_id across snapshots), driving re-embed / re-train
  * decisions and crawl-freshness stats.
  *
  * Scale discipline: full Levenshtein is O(n·m) — unusable on long docs.
  * The kernel is the standard BANDED DP: O(len·cap) time, O(cap) space,
  * exact for every distance ≤ cap, and `cap + 1` as the saturated
  * answer beyond (a revision that changed more than `cap` edits is
  * "rewritten" — the exact count carries no extra signal). Pairs longer
  * than `maxLen` chars skip the DP entirely and report NULL (compare
  * fingerprints instead at that size). Zero-shuffle typed kernel.
  */
object Revisions {

  /** Exact Levenshtein distance when ≤ cap, else cap + 1. Banded DP:
    * only the 2·cap+1 diagonal window is evaluated. Operates on Unicode
    * CODE POINTS (a non-BMP char is one edit unit), matching both
    * Spark's native levenshtein and DuckDB's — the three
    * implementations agree on every input, including emoji. */
  def editDistanceCapped(a: String, b: String, cap: Int): Int = {
    require(cap >= 0, s"cap must be >= 0: $cap")
    editDistanceCappedCp(a.codePoints().toArray, b.codePoints().toArray, cap)
  }

  private def editDistanceCappedCp(a: Array[Int], b: Array[Int],
      cap: Int): Int = {
    val (la, lb) = (a.length, b.length)
    if (math.abs(la - lb) > cap) return cap + 1
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = cap + 1
    var prev = Array.fill(lb + 1)(inf)
    var cur = Array.fill(lb + 1)(inf)
    var j = 0
    while (j <= math.min(lb, cap)) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= la) {
      val lo = math.max(1, i - cap)
      val hi = math.min(lb, i + cap)
      java.util.Arrays.fill(cur, inf)
      if (i <= cap) cur(0) = i
      j = lo
      while (j <= hi) {
        val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) -1 else 0)
        val del = prev(j)
        val ins = cur(j - 1)
        var best = math.min(math.min(sub + 1, del + 1), ins + 1)
        if (best > inf) best = inf
        cur(j) = best
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    math.min(prev(lb), inf)
  }

  /** Per-pair revision stats over a (idCol, aCol, bCol) relation:
    * lengths, capped distance, and changed fraction in milli
    * (1000·dist div max(len)); dist and the fraction are NULL when
    * either side exceeds `maxLen` (fingerprint territory) and the
    * fraction is additionally NULL when the distance saturated at
    * cap + 1 (a floor, not a measurement).
    *
    * Built on Spark's NATIVE 3-arg `levenshtein(a, b, threshold)` (a
    * codegen'd, internally band-optimized, code-point-based expression —
    * −1 above the threshold maps to the saturated cap + 1), so the whole
    * operator is one narrow whole-stage-codegen projection; the banded
    * kernel above stays as the engine-independent pure twin the spec
    * cross-checks against. */
  def revisionDiffDf(pairs: DataFrame, idCol: String, aCol: String,
      bCol: String, cap: Int, maxLen: Int): DataFrame = {
    require(cap >= 1 && maxLen >= 1, s"bad cap/maxLen: $cap/$maxLen")
    val a = coalesce(col(aCol), lit(""))
    val b = coalesce(col(bCol), lit(""))
    val d0 = levenshtein(a, b, cap)
    pairs.select(col(idCol),
        length(a).cast("long").as("len_a"),
        length(b).cast("long").as("len_b"),
        when(length(a) > maxLen || length(b) > maxLen,
          lit(null).cast("long"))
          .otherwise(when(d0 === -1, lit(cap + 1)).otherwise(d0)
            .cast("long")).as("dist"))
      .withColumn("changed_milli",
        when(col("dist").isNull || col("dist") > cap,
          lit(null).cast("long"))
          .otherwise(expr("1000 * dist div greatest(greatest(len_a, len_b), 1L)")))
  }
}
