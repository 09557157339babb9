package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Contiguous 0-based global row IDs in a caller-chosen total order —
  * zipWithIndex for DataFrames, WITHOUT the single-partition window that
  * `row_number() OVER (ORDER BY …)` plans (one task materializes the whole
  * table: the classic 100 TB driver-shaped bottleneck). Training pipelines
  * need this constantly: stable example IDs after curation, shard-internal
  * offsets, join keys for parallel corpora.
  *
  * Shape: range-repartition on the order key, sort within partitions, then
  * RDD `zipWithIndex` over that ONE lineage: its internal count job
  * (numPartitions longs to the driver) and its assignment pass run on the
  * SAME RDD, so the range shuffle is materialized once and both read
  * identical partitions. The earlier DataFrame formulation (count job +
  * broadcast-offset join as two separate query executions over
  * `spark_partition_id` / `monotonically_increasing_id`) let the two
  * executions disagree on the range partitioning at scale — duplicate and
  * overlapping ids at 50k rows, caught by the sf1 gate and pinned in
  * IdsSpec. The deliberate drop to the RDD API is exactly the "genuine
  * per-partition imperative logic" carve-out: a cross-job consistency
  * guarantee Catalyst does not offer.
  *
  * The order columns must be a TOTAL order (include a unique tie-breaker);
  * ties would make the assignment within a tie group
  * partition-placement-dependent.
  */
object Ids {

  /** Append `idCol` with contiguous 0-based IDs in `orderCols` order.
    * `numPartitions <= 0` keeps the session's shuffle parallelism. */
  def assign(df: DataFrame, orderCols: Seq[String],
      idCol: String = "global_id", numPartitions: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    require(!df.columns.contains(idCol), s"column already exists: $idCol")
    val order: Seq[Column] = orderCols.map(col)
    val ranged =
      (if (numPartitions > 0) df.repartitionByRange(numPartitions, order: _*)
       else df.repartitionByRange(order: _*))
        .sortWithinPartitions(order: _*)
    val spark = df.sparkSession
    val schema = org.apache.spark.sql.types.StructType(
      ranged.schema.fields :+ org.apache.spark.sql.types.StructField(
        idCol, org.apache.spark.sql.types.LongType, nullable = false))
    val withId = ranged.rdd.zipWithIndex().map { case (row, idx) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ idx)
    }
    spark.createDataFrame(withId, schema)
  }
}
