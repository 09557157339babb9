package graft.ranges

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Range/interval operators R1-R6 — the reference's "window functions".
  * Pure forms feed the per-partition typed pipeline and the test oracle;
  * DataFrame forms are the classic gaps-and-islands plan (lag → new-group
  * flag → running sum as group id → min/max per group).
  */
object Islands {

  /** R1 — buffer + interval merge (policy_filter.py:154-178).
    * Each hit page becomes [max(minPage, p-b), min(maxPage, p+b)]; ranges are
    * sorted by start and merged when `start <= prev_end + 1` (adjacency
    * merges too). `allPages` supplies the clamping domain.
    */
  def mergeRanges(pages: Seq[Int], allPages: Seq[Int], buffer: Int): Seq[(Int, Int)] = {
    if (pages.isEmpty || allPages.isEmpty) return Seq.empty
    val minP = allPages.min
    val maxP = allPages.max
    val ranges = pages
      .map(p => (math.max(minP, p - buffer), math.min(maxP, p + buffer)))
      .sortBy(r => (r._1, r._2))
    ranges.foldLeft(Vector.empty[(Int, Int)]) { case (acc, (s, e)) =>
      if (acc.nonEmpty && s <= acc.last._2 + 1)
        acc.init :+ ((acc.last._1, math.max(acc.last._2, e)))
      else acc :+ ((s, e))
    }
  }

  /** R1 as a DataFrame plan. Input: one row per hit, columns
    * `keyCols :+ page :+ minPage :+ maxPage`. Output: `keyCols, range_start,
    * range_end`. One shuffle on the key (reused by both windows).
    */
  def mergeRangesDf(hits: DataFrame, keyCols: Seq[String], pageCol: String,
      minPageCol: String, maxPageCol: String, buffer: Int): DataFrame = {
    val start = greatest(col(minPageCol), col(pageCol) - buffer)
    val end = least(col(maxPageCol), col(pageCol) + buffer)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy("start", "end")
    hits
      .withColumn("start", start)
      .withColumn("end", end)
      // project to exactly (keys, start, end) and dedupe BEFORE the window:
      // two hits can clamp to the SAME (start,end) (both endpoints at the
      // domain edge), and tied rows under ORDER BY(start,end) carry
      // asymmetric prev_end/new_grp flags — whichever tie comes first gets
      // the island-break flag — so the grp assignment would depend on the
      // physical row order, i.e. on partitioning. Distinct rows make the
      // window order total and the merge partitioning-invariant (the same
      // fix the DuckDB oracles apply with SELECT DISTINCT, where the
      // non-total order demonstrably flipped islands run-to-run).
      .select((keyCols.map(col) :+ col("start") :+ col("end")): _*)
      .distinct()
      .withColumn("prev_end",
        max(col("end")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_grp",
        when(col("prev_end").isNull || col("start") > col("prev_end") + 1, 1).otherwise(0))
      .withColumn("grp",
        sum(col("new_grp")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy((keyCols.map(col) :+ col("grp")): _*)
      .agg(min("start").as("range_start"), max("end").as("range_end"))
      .drop("grp")
  }

  /** R2 — neighbor expansion (policy_additional_interests.py:112-120):
    * set-union of p±1..radius, floored at 0, no merge.
    */
  def expandNeighbors(pages: Seq[Int], radius: Int): Seq[Int] =
    pages.flatMap(p => (p - radius) to (p + radius)).filter(_ >= 0).distinct.sorted

  /** R4 — kept pages of merged ranges, with the reference's quirk: a range
    * whose endpoint page is missing from the boundary set is silently dropped
    * (policy_filter.py:201). Returns the kept pages in ascending order.
    */
  def keptPages(ranges: Seq[(Int, Int)], boundaries: Set[Int]): Seq[Int] =
    ranges
      .filter { case (a, b) => boundaries.contains(a) && boundaries.contains(b) }
      .flatMap { case (a, b) => (a to b).filter(boundaries.contains) }
      .distinct
      .sorted

  /** R6 — first-K cap: sort pages ascending, keep the first K
    * (policy_additional_interests.py:123-131).
    */
  def firstK(pages: Seq[Int], k: Int): Seq[Int] = pages.sorted.take(k)
}
