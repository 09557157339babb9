package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout: interleave the bits of two key columns so
  * that rows close in BOTH dimensions land close on the curve — then range
  * partition + sort by the curve value before writing. Parquet row-group
  * min/max stats on the original columns then stay tight in every file, so
  * a scan filtered on EITHER dimension skips most row groups; a plain
  * lexicographic sort gives that for the leading column only. This is the
  * layout step a 100 TB corpus runs once so that every later
  * `WHERE k1 BETWEEN … AND k2 BETWEEN …` reads a sliver.
  *
  * The curve value is pure bit arithmetic on non-negative ints — exact,
  * engine-independent, and cheap (a 2·bits-term codegen'd expression). */
object Layout {

  /** Morton-interleave the low `bits` bits of two non-negative longs:
    * bit i of `a` → bit 2i, bit i of `b` → bit 2i+1. Values ≥ 2^bits are
    * rejected in-plan (a silently truncated key would break curve
    * locality). */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    val max = 1L << bits
    val guarded = when(a < 0 || a >= max || b < 0 || b >= max,
      raise_error(lit(s"zValue: key outside [0, 2^$bits)"))).otherwise(lit(0L))
    (0 until bits).foldLeft(guarded) { (acc, i) =>
      acc +
        shiftleft(shiftright(a, i).bitwiseAND(1L), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(1L), 2 * i + 1)
    }
  }

  /** Pure twin of [[zValue]]. */
  def zValuePure(a: Long, b: Long, bits: Int): Long = {
    require(bits >= 1 && bits <= 31 && a >= 0 && b >= 0 &&
      a < (1L << bits) && b < (1L << bits))
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Inverse of [[zValuePure]] — (a, b) back from the curve value. */
  def zInversePure(z: Long, bits: Int): (Long, Long) = {
    var a = 0L; var b = 0L
    var i = 0
    while (i < bits) {
      a |= ((z >> (2 * i)) & 1L) << i
      b |= ((z >> (2 * i + 1)) & 1L) << i
      i += 1
    }
    (a, b)
  }

  /** Lay `df` out along the Z-curve of (`colA`, `colB`): range partition
    * into `partitions` files by curve value, sort within each. The range
    * partitioner samples curve values, so file boundaries adapt to the
    * data distribution (no manual histogram). Write the result with
    * `.write.parquet(...)` to materialize the layout. */
  def zOrdered(df: DataFrame, colA: String, colB: String, bits: Int,
      partitions: Int): DataFrame = {
    require(partitions >= 1, s"partitions must be >= 1: $partitions")
    df.withColumn("__z", zValue(col(colA).cast("long"), col(colB).cast("long"), bits))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
