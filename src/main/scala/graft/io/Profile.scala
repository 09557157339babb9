package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass dataset profiler — the sanity gate before any expensive corpus
  * job: per-column row count, null count, exact distinct count, and
  * lexicographic min/max over the stringified values.
  *
  * Shape: columns are stacked into (col_name, value) pairs with ONE narrow
  * explode, then a single partial-aggregated groupBy over at most
  * |columns| keys — one scan and one bounded shuffle regardless of the
  * corpus size or the number of profiled columns. The exact distinct count
  * expands each group by its distinct values inside the aggregation; for a
  * 100 TB corpus where a profiled column is near-unique, swap it for the
  * mergeable HLL ([[graft.sketch.Sketches.hllDistinct]], 256 bytes per
  * column) — the profiler keeps the exact form because its job is to be
  * the ground truth the sketches are judged against.
  *
  * Values are compared as strings (cast once, documented): min/max are
  * lexicographic byte order, which is what an engine-independent profile
  * can promise across numeric/date/string columns in one output schema.
  */
object Profile {

  /** (col_name, n_rows, n_null, n_distinct, min_str, max_str) per profiled
    * column. Nulls count into n_rows, not into n_distinct or min/max. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    val stacked = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*)).as("cv"))
      .select(col("cv.col_name").as("col_name"), col("cv.v").as("v"))
    stacked.groupBy("col_name").agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
      count_distinct(col("v")).as("n_distinct"),
      min(col("v")).as("min_str"),
      max(col("v")).as("max_str"))
  }
}
