package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling levers for the giant-document / hot-key cases the north
  * rule calls out. AQE (enabled by every entry point) re-plans skewed
  * shuffle joins at runtime; these helpers handle the cases AQE cannot see:
  *
  *  - hot keys in joins → deterministic salting (explode the small side over
  *    the salt domain, spread the big side's hot-key rows across salts);
  *  - giant documents skewing the narrow extraction stage → size-aware
  *    rebalance so tasks see comparable byte budgets regardless of input
  *    layout.
  */
object Skew {

  /** Deterministic salt in [0, n) from the given columns (no randomness —
    * reruns and resumes stay reproducible). */
  def saltCol(n: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(n))

  /** Salt a skewed join: the big side's rows of one hot key spread over `n`
    * salts (derived from a discriminator column — e.g. a row id or offset —
    * so rows of the SAME key land on different salts); the small side is
    * exploded over the full salt domain. Join on (keys :+ salt). One hot
    * partition becomes `n` balanced ones at the cost of replicating the
    * small side n-fold. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      discriminator: Column, n: Int, joinType: String = "inner"): DataFrame = {
    val bigSalted = big.withColumn("__salt", saltCol(n, discriminator))
    val smallExploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    bigSalted.join(smallExploded, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Size-aware rebalance for per-row heavy stages: partition by
    * hash(size-magnitude, row discriminator) so giant rows scatter across
    * partitions instead of clustering by input order. No global sort — this
    * stays a single shuffle and survives any scale. */
  def rebalanceBySize(df: DataFrame, sizeExpr: Column, discriminator: Column,
      partitions: Int): DataFrame =
    df.repartition(partitions,
      pmod(hash(ceil(log2(greatest(sizeExpr, lit(1)))), discriminator), lit(partitions)))
}
