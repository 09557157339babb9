package graft.text

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** WordPiece segmentation (Wu et al. 2016; the BERT tokenizer's subword
  * step): greedy longest-match-first against a fixed vocabulary, with
  * non-initial pieces carrying the `##` continuation prefix and any word
  * that cannot be fully covered collapsing to `[UNK]` as a whole — the
  * standard semantics, chosen over BPE's merge-replay when the vocabulary
  * is given rather than trained (serving-side tokenization, token-count
  * budgeting against a deployed model's vocab).
  *
  * Scale shape: the vocabulary (30k entries for real models, ~1 MB)
  * broadcasts once; segmentation is a pure per-row kernel over a typed
  * mapPartitions — zero shuffles, embarrassingly parallel, the same plan
  * at 10⁹ documents as at 10. Complements [[Bpe]] (which TRAINS merges);
  * this APPLIES a vocab.
  */
object WordPiece {

  val Unk = "[UNK]"

  /** Greedy longest-match segmentation of one word. Returns `Seq(Unk)` when
    * any position fails to match (whole-word UNK, BERT semantics) or the
    * word exceeds `maxLen` characters. */
  def segmentWord(word: String, vocab: Set[String], maxLen: Int = 100): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    if (word.length > maxLen) return Seq(Unk)
    val pieces = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    while (start < word.length) {
      var end = word.length
      var found: String = null
      while (found == null && end > start) {
        val raw = word.substring(start, end)
        val cand = if (start > 0) "##" + raw else raw
        if (vocab.contains(cand)) found = cand else end -= 1
      }
      if (found == null) return Seq(Unk)
      pieces += found
      start = end
    }
    pieces.toSeq
  }

  /** (id, word) → (id, word, pieces) with pieces `|`-joined in order.
    * Broadcast vocab, zero-shuffle typed kernel. */
  def segmented(df: DataFrame, idCol: String, wordCol: String,
      vocab: Seq[String], maxLen: Int = 100): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(vocab.toSet)
    val in = df.select(col(idCol).cast("long"), col(wordCol).cast("string"))
      .as[(Long, String)](Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
    in.mapPartitions { it =>
      val v = bc.value
      it.map { case (id, w) => (id, w, segmentWord(w, v, maxLen).mkString("|")) }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.STRING))
      .toDF(idCol, wordCol, "pieces")
  }
}
