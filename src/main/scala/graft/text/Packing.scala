package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing — the pretraining "concatenate then
  * split" step: documents are laid end-to-end on a token tape and the
  * tape is cut into fixed `budget`-token training sequences, so a doc may
  * straddle a cut (`is_split`).
  *
  * Scale shape: a single global tape would need a one-partition window
  * (the classic scale-killer), so the tape is sharded — each doc lands on
  * shard md5(id) % nShards, the cumulative token sum is a window
  * partitioned BY SHARD ordered by id, and sequence ids are made globally
  * unique as shard * 2^40 + seq-within-shard. The plan is one hash
  * shuffle on the shard key plus a per-partition sort; with nShards sized
  * to the cluster (≥ executors × cores) every stage stays wide at corpus
  * scale. All of it is deterministic (md5 sharding, id ordering) — no RNG,
  * so an oracle replays it exactly.
  */
object Packing {

  /** Globally-unique sequence id base: shards are separated by 2^40
    * sequences (a shard would need > 10^12 tokens × budget to overflow —
    * beyond the 10^12-doc design point per shard by construction). */
  val SeqBase: Long = 1L << 40

  /** Per-doc packing assignment over whitespace tokens.
    *
    * `shuffleOrder = true` lays the tape in md5(id) order instead of id
    * order — the deterministic corpus shuffle a pretraining run wants
    * before packing (adjacent source docs land in different sequences),
    * still RNG-free and replayable.
    *
    * Output: (id, shard, n_tokens, tok_start, seq_first, seq_last,
    * offset_in_seq, is_split) — tok_start is the doc's first-token
    * position on its shard's tape, seq_first/seq_last the global ids of
    * the sequences holding its first/last token (equal when not split;
    * zero-token docs are pinned to seq_first). */
  def pack(df: DataFrame, idCol: String, textCol: String,
      budget: Int, nShards: Int, shuffleOrder: Boolean = false): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val shard = pmod(TextAnalysis.hash60(col(idCol).cast("string")), lit(nShards.toLong))
    val ord =
      if (shuffleOrder) Seq(md5(col(idCol).cast("string")), col(idCol))
      else Seq(col(idCol))
    val w = Window.partitionBy("shard").orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), shard.as("shard"),
        TextAnalysis.wsTokenCountCol(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("tok_end", sum("n_tokens").over(w))
      .withColumn("tok_start", col("tok_end") - col("n_tokens"))
      // `div` = exact integer division (both operands nonnegative longs);
      // a double floor() would lose exactness past 2^53 tokens
      .withColumn("seq_first",
        col("shard") * SeqBase + expr(s"tok_start div ${budget.toLong}"))
      .withColumn("seq_last",
        when(col("n_tokens") === 0, col("seq_first")).otherwise(
          col("shard") * SeqBase + expr(s"(tok_end - 1) div ${budget.toLong}")))
      .withColumn("offset_in_seq", pmod(col("tok_start"), lit(budget.toLong)))
      .withColumn("is_split", col("seq_first") =!= col("seq_last"))
      .drop("tok_end")
  }

  /** Pure single-shard twin of [[pack]] for spec cross-checking: docs as
    * (id, nTokens) already in shard order; returns (id, tokStart,
    * seqFirst, seqLast, offsetInSeq) with shard taken as 0. */
  def packPure(docs: Seq[(Long, Long)], budget: Long): Seq[(Long, Long, Long, Long, Long)] = {
    var cum = 0L
    docs.map { case (id, n) =>
      val start = cum
      cum += n
      val first = start / budget
      val last = if (n == 0) first else (cum - 1) / budget
      (id, start, first, last, start % budget)
    }
  }
}
