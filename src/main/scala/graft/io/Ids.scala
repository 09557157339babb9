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
  *  1. one COUNT job: per-partition row counts (`spark_partition_id()`
  *     groupBy — numPartitions rows to the driver, bounded);
  *  2. driver prefix-sum → (partition_id, offset) table, broadcast-joined
  *     back on `spark_partition_id()`;
  *  3. `global_id = offset + local_index`, where the local index is the
  *     low 33 bits of `monotonically_increasing_id()` (documented layout:
  *     partition ID in the upper 31 bits, per-partition record number in
  *     the lower 33 — asserted in IdsSpec so a layout change fails loudly).
  *
  * Determinism: the two jobs (count + final) replay the same deterministic
  * plan — parquet splits are stable and the range partitioner samples with
  * a fixed per-partition seed — so partition contents are identical across
  * them. The order columns must be a TOTAL order (include a unique
  * tie-breaker); ties would make the assignment within a tie group
  * partition-placement-dependent.
  */
object Ids {

  /** 33-bit local-record mask of `monotonically_increasing_id`. */
  private val LocalMask = (1L << 33) - 1L

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
    // nondeterministic leaves (mid/pid) pin this projection ABOVE the sort —
    // Catalyst will not reorder it, so local indices follow the sorted order
    val indexed = ranged
      .withColumn("__pid", spark_partition_id())
      .withColumn("__local", monotonically_increasing_id().bitwiseAND(LocalMask))
    val counts = indexed.groupBy(col("__pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft(0L)(_ + _._2).zip(counts.map(_._1))
      .map { case (off, pid) => (pid, off) }
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = offsets.toSeq.toDF("__opid", "__offset")
    indexed.join(broadcast(offsetDf), col("__pid") === col("__opid"))
      .withColumn(idCol, col("__offset") + col("__local"))
      .drop("__pid", "__local", "__opid", "__offset")
  }
}
