package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Length-bucketed batch assembly — the padding-efficiency step for
  * sequence-level training (SFT / encoder batches), complementing
  * [[Packing]]'s concat-then-split pretraining tape: each doc keeps its
  * boundaries, docs of similar token length batch together, and every
  * batch pads to its bucket's fixed length (the next power of two), so
  * the kernel shapes stay cacheable and the waste is the bucket rounding,
  * not the corpus's length spread.
  *
  * Scale shape: the batch index is a window, and a window partitioned
  * only by bucket would sort a corpus-scale slice in one task (lengths
  * concentrate in a few buckets). So the window is sharded exactly like
  * [[Packing]]: docs land on shard md5(id) % nShards, `row_number` runs
  * per (bucket, shard), and batch ids are (bucket, shard, local index div
  * batchSize) — one hash shuffle, every stage wide. Deterministic
  * (md5 shard + md5 order, no RNG), so an oracle replays it exactly.
  */
object Batching {

  /** Next power of two ≥ `tokens` as a Column (tokens ≥ 1): 2^bitlen(t-1)
    * via the binary-string length — integer-exact, unlike a log2 round
    * trip (DuckDB replays with `1::BIGINT << length(bin(t-1))`). */
  def bucketCol(tokens: Column): Column =
    when(tokens <= 1, 1L)
      // functions.shiftleft only takes a literal shift — the SQL builtin
      // accepts a column one
      .otherwise(call_function("shiftleft", lit(1L),
        length(bin(tokens - 1)).cast("int")))

  /** Per-doc batch assignment over whitespace-token counts. Docs with
    * zero tokens are dropped (nothing to batch). Output: (id, n_tokens,
    * bucket, shard, batch_idx, pos_in_batch). */
  def assign(df: DataFrame, idCol: String, textCol: String,
      batchSize: Int, nShards: Int): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val shard = pmod(TextAnalysis.hash60(col(idCol).cast("string")), lit(nShards.toLong))
    val w = Window.partitionBy(col("bucket"), col("shard"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.select(col(idCol),
        TextAnalysis.wsTokenCountCol(col(textCol)).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("bucket", bucketCol(col("n_tokens")))
      .withColumn("shard", shard)
      .withColumn("__rn", row_number().over(w) - 1)
      .withColumn("batch_idx", expr(s"__rn div ${batchSize.toLong}"))
      .withColumn("pos_in_batch", pmod(col("__rn"), lit(batchSize.toLong)))
      .drop("__rn")
  }

  /** Batch-level padding report: one row per (bucket, shard, batch_idx)
    * with the doc count, real token sum, padded size (n_docs · bucket —
    * every sequence in the batch pads to the bucket length) and the waste
    * in integer milli units. The corpus-level weighted mean of
    * `waste_milli` is the number a batching config is tuned on. */
  def paddingReport(df: DataFrame, idCol: String, textCol: String,
      batchSize: Int, nShards: Int): DataFrame =
    assign(df, idCol, textCol, batchSize, nShards)
      .groupBy(col("bucket"), col("shard"), col("batch_idx"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        max(col("n_tokens")).as("max_tokens"))
      .withColumn("padded_tokens", col("n_docs") * col("bucket"))
      .withColumn("waste_milli",
        expr("(1000 * (padded_tokens - sum_tokens)) div padded_tokens"))

  /** Pure twin of [[bucketCol]]. */
  def bucketPure(tokens: Long): Long = {
    require(tokens >= 1, s"tokens must be >= 1: $tokens")
    if (tokens <= 1) 1L else java.lang.Long.highestOneBit(tokens - 1) << 1
  }
}
