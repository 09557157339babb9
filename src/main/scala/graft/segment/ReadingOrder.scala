package graft.segment

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Layout → reading order: the PDF-layout-analyzer stage that turns
  * positioned page fragments into the ordered span sequence the rest of
  * the engine consumes (the north-star contract: ordered
  * (kind, text, media_ref, offset) per document).
  *
  * Column model — the midline-gutter heuristic, integer-exact: a page is
  * TWO-COLUMN iff no fragment crosses the page midline and both sides are
  * non-empty; the midline is data-derived per page as the center of the
  * fragment bounding box (`min(x)` .. `max(x+w)`), carried in half-units
  * (`mid2 = min(x) + max(x+w)`) so the math never leaves integers. A page
  * with any crossing fragment (a full-width heading, a table) falls back
  * to single-column order — the conservative failure mode: order is then
  * top-to-bottom, never column-scrambled.
  *
  * Reading order: page asc, then column (left before right on two-column
  * pages), then (y, x, text) — a total order, so offsets are
  * deterministic under any partitioning.
  *
  * Plan: two window passes over (doc, page) for the midline/column
  * decision and one row_number over the doc — hash exchange on the doc
  * id, in-partition sorts bounded by fragments-per-doc. Coordinates are
  * integral units (PDF points ×10, pixels — any monotone ints).
  *
  * Output: (idCol, kind, text, media_ref, offset) with offset the 0-based
  * reading position — feed straight into the interleave/extraction
  * stages.
  */
object ReadingOrder {

  def orderSpans(frags: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val pw = Window.partitionBy(col(idCol), col("page"))
    val x2 = col("x") * 2
    val xw2 = (col("x") + col("w")) * 2
    val staged = frags
      .withColumn("__mid2", min(col("x")).over(pw) + max(col("x") + col("w")).over(pw))
      // entirely-left: right edge at or before the midline; entirely-right:
      // left edge at or after it (half-unit comparison keeps integers)
      .withColumn("__isLeft", xw2 <= col("__mid2"))
      .withColumn("__isRight", x2 >= col("__mid2"))
      .withColumn("__crosses", !(col("__isLeft") || col("__isRight")))
    val decided = staged
      .withColumn("__twoCol",
        !max(col("__crosses")).over(pw) &&
          max(col("__isLeft")).over(pw) && max(col("__isRight")).over(pw))
      .withColumn("__colRank",
        when(col("__twoCol") && col("__isRight"), 1).otherwise(0))
    val ord = Window.partitionBy(col(idCol))
      .orderBy(col("page"), col("__colRank"), col("y"), col("x"), col("text"))
    decided
      .withColumn("offset", (row_number().over(ord) - 1).cast("int"))
      .select(col(idCol), col("kind"), col("text"), col("media_ref"),
        col("offset"))
  }
}
