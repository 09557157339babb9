package graft.text

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Unigram-LM subword segmentation (Kudo 2018; the SentencePiece "unigram"
  * model): a word's segmentation is the token sequence maximizing
  * Π p(tokenᵢ) over a weighted vocabulary — Viterbi dynamic programming
  * per word, unlike [[WordPiece]]'s greedy longest-match (which can commit
  * to a prefix that strands the suffix) and [[Bpe]]'s merge replay (which
  * fixes ONE segmentation per pair history). Probabilities live as integer
  * MICRO-NAT costs (cost = −ln p · 10⁶, precomputed, never an engine-side
  * ln), so the DP compares exact int64 sums and every engine picks the
  * same path — ties broken by (cost, earliest split point), i.e. the
  * longest final token.
  *
  * Training is HARD (Viterbi) EM, the standard deterministic approximation
  * of SentencePiece's full EM: the E-step assigns each word its single
  * best segmentation under the current costs and accumulates exact integer
  * token counts weighted by word frequency; the M-step (count → new cost
  * via −ln(c/C)) is a trivial driver-side table rebuild and necessarily
  * floats, so the ORACLE gates the E-step — which is where all the
  * distributed work and all the ordering hazards are.
  *
  * Scale shape: segmentation runs over the DISTINCT word table (Heaps'
  * law: ≪ corpus size — the same reduction [[Bpe]] exploits), vocabulary
  * broadcasts once, the DP is a pure per-row kernel over a typed
  * mapPartitions — zero shuffles beyond the distinct. Words are capped at
  * `MaxWordLen` characters (longer tails are hapax noise; the cap also
  * bounds the replay's unrolled DP depth).
  */
object Unigram {

  /** DP depth cap — words truncate to this many chars on BOTH engines. */
  val MaxWordLen = 12

  /** Seed vocabulary: every char `tokensCol` can emit ([a-z0-9_]) so any
    * word segments, plus common English subwords at lower cost. Costs are
    * integer micro-nats (smaller = more probable), chosen so multi-char
    * tokens beat their char-by-char spellings but rare pairs do not. */
  val seedVocab: Seq[(String, Long)] = {
    val chars = (('a' to 'z') ++ ('0' to '9') :+ '_')
      .map(c => c.toString -> 3500000L)
    val subwords = Seq(
      "the" -> 1800000L, "ing" -> 2600000L, "tion" -> 2800000L,
      "and" -> 2000000L, "ent" -> 2700000L, "ter" -> 2700000L,
      "ati" -> 2900000L, "ion" -> 2650000L,
      "er" -> 2200000L, "on" -> 2200000L, "an" -> 2200000L,
      "re" -> 2250000L, "at" -> 2300000L, "en" -> 2300000L,
      "es" -> 2300000L, "or" -> 2300000L, "te" -> 2350000L,
      "ed" -> 2350000L, "is" -> 2350000L, "it" -> 2350000L,
      "al" -> 2400000L, "ar" -> 2400000L, "st" -> 2400000L,
      "to" -> 2400000L, "nt" -> 2400000L, "ll" -> 2450000L,
      "in" -> 2200000L, "he" -> 2250000L, "th" -> 2250000L,
      "de" -> 2400000L, "se" -> 2400000L, "le" -> 2400000L)
    chars ++ subwords
  }

  /** Longest vocab token (bounds the DP's inner scan). */
  def maxTokenLen(vocab: Seq[(String, Long)]): Int =
    vocab.iterator.map(_._1.length).max

  /** Viterbi segmentation of one (already truncated) word: the token
    * sequence with minimal total cost, ties broken by preferring the
    * smaller predecessor position at each DP cell (= longest final token).
    * Returns (pieces, total cost). Empty word → (Seq.empty, 0). A word
    * containing a char absent from the vocab (impossible with
    * [[seedVocab]] over [[TextAnalysis.tokensCol]] output) throws. */
  def viterbi(word: String, vocab: Map[String, Long]): (Seq[String], Long) = {
    if (word.isEmpty) return (Seq.empty, 0L)
    val n = word.length
    val maxTok = vocab.keysIterator.map(_.length).max
    val cost = Array.fill(n + 1)(Long.MaxValue)
    val prev = Array.fill(n + 1)(-1)
    cost(0) = 0L
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxTok)
      while (j < i) {
        if (cost(j) != Long.MaxValue) {
          vocab.get(word.substring(j, i)) match {
            case Some(c) =>
              val cand = cost(j) + c
              // strict < keeps the SMALLEST j on ties (j ascends)…
              if (cand < cost(i)) { cost(i) = cand; prev(i) = j }
            case None => ()
          }
        }
        j += 1
      }
      i += 1
    }
    require(cost(n) != Long.MaxValue, s"unsegmentable word: $word")
    val pieces = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = n
    while (p > 0) { pieces.prepend(word.substring(prev(p), p)); p = prev(p) }
    (pieces.toSeq, cost(n))
  }

  /** Distinct-word table of a corpus: (word, cnt), words lowercased by the
    * shared tokenizer and truncated to [[MaxWordLen]]; counts merge across
    * the truncation. One partial-agg shuffle on the word. */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.tokensCol(col(textCol))).as("__w"))
      .select(substring(col("__w"), 1, MaxWordLen).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Segment every word of a (word, cnt) table: (word, cnt, pieces
    * space-joined, cost_micro). Broadcast vocab, zero-shuffle typed
    * kernel. */
  def segmentWords(words: DataFrame, vocab: Seq[(String, Long)]): DataFrame = {
    val bc = words.sparkSession.sparkContext.broadcast(vocab.toMap)
    val in = words.select(col("word").cast("string"), col("cnt").cast("long"))
      .as[(String, Long)](Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
    in.mapPartitions { it =>
      val v = bc.value
      it.map { case (w, c) =>
        val (pieces, cost) = viterbi(w, v)
        (w, c, pieces.mkString(" "), cost)
      }
    }(Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.STRING,
      Encoders.scalaLong))
      .toDF("word", "cnt", "pieces", "cost_micro")
  }

  /** Hard-EM E-step: exact expected token counts under the current vocab —
    * c(t) = Σ_words cnt(word) · occurrences of t in viterbi(word). One
    * bounded-key shuffle (|vocab| keys) after the zero-shuffle
    * segmentation kernel. Output: (token, cnt). */
  def emCounts(words: DataFrame, vocab: Seq[(String, Long)]): DataFrame =
    segmentWords(words, vocab)
      .select(col("cnt"), explode(split(col("pieces"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(sum("cnt").as("cnt"))

  /** Pure twin of [[emCounts]] over (word, cnt) pairs (words pre-truncated
    * like [[wordTable]] does). */
  def emCountsPure(words: Seq[(String, Long)],
      vocab: Seq[(String, Long)]): Map[String, Long] = {
    val v = vocab.toMap
    words.foldLeft(Map.empty[String, Long]) { case (acc, (w, c)) =>
      viterbi(w, v)._1.foldLeft(acc)((a, t) =>
        a.updated(t, a.getOrElse(t, 0L) + c))
    }
  }
}
