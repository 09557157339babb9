package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout: the run-once organization step that removes the
  * shuffle from every FUTURE join and aggregation on the bucket keys.
  *
  * At 100 TB the dominant cost of a key join is the exchange: both sides
  * rewrite the entire corpus across the network every time the join runs.
  * Writing the corpus bucketed by its join key (hash(key) mod buckets, one
  * file group per bucket, sorted within buckets) moves that cost to write
  * time — paid once — after which any join or groupBy on the key reads
  * co-located buckets and the planner drops the Exchange (and, with sorted
  * buckets, the per-task Sort) entirely. This is the disk-layout sibling of
  * [[Layout.zOrdered]]: Z-order makes SCANS skip row groups in two
  * dimensions; bucketing makes JOINS shuffle-free in the bucketed dimension.
  *
  * Pick the bucket count like a shuffle-partition count at write time: data
  * volume / bucket ≈ a comfortable task (128-512 MB). Both join sides must
  * be bucketed into the SAME count for the exchange-free plan.
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed and sorted by `keys`
    * (overwrite). The table lands in the session's warehouse directory and
    * is readable back with `spark.table(name)`.
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      buckets: Int): Unit = {
    require(keys.nonEmpty, "bucketing requires at least one key column")
    require(buckets >= 1, s"bucket count must be >= 1, got $buckets")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // a previous JVM may have left the managed location behind with no
    // catalog entry; CTAS refuses to reuse such a location, so clear it
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = warehouse.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    if (fs.exists(warehouse)) fs.delete(warehouse, true)
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Read a bucketed table back; the scan carries the bucket layout so the
    * planner can prove co-location. */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Rendezvous / highest-random-weight shard assignment (Thaler &
    * Ravishankar 1998) — the stable alternative to `pmod(hash, S)`: doc d
    * goes to `argmax over s of hash60("rv:s:d")`. Growing S→S+1 moves ONLY
    * the docs whose new-shard score wins (≈ n/(S+1) of them, each straight
    * to the new shard); a mod-hash reshard moves ≈ half the corpus. That
    * is the difference between topping up a 100 TB bucketed layout and
    * rewriting it.
    *
    * Completely narrow (a per-row argmax over an S-element generated
    * array); determinism and the tie rule (higher score, then LOWER shard
    * id — struct max compares fields in order, so the id is negated) are
    * engine-replayable md5 arithmetic.
    */
  def rendezvousShard(df: DataFrame, idCol: String, shards: Int): DataFrame = {
    require(shards >= 1, s"shards must be >= 1: $shards")
    import org.apache.spark.sql.functions._
    val scores = transform(sequence(lit(0), lit(shards - 1)), s =>
      struct(graft.text.TextAnalysis.hash60(
        concat_ws(":", lit("rv"), s.cast("string"), col(idCol).cast("string")))
        .as("h"), (-s).as("ns")))
    df.withColumn("shard",
      (-array_max(scores).getField("ns")).cast("int"))
  }

  /** Pure twin of [[rendezvousShard]] for one id. */
  def rendezvousShardPure(id: String, shards: Int): Int = {
    require(shards >= 1)
    (0 until shards).maxBy(s =>
      (graft.text.TextAnalysis.hash60(s"rv:$s:$id"), -s))
  }
}
