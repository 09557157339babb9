package graft.text

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multi-phrase dictionary matching with Aho–Corasick (Aho & Corasick
  * 1975; the FlashText idea re-popularized it for corpus curation): find
  * every occurrence of every dictionary phrase in one pass over the text,
  * independent of dictionary size — the entity-tagging / brand-filter /
  * PII-term-inventory pass that regex alternation cannot survive at 25k+
  * phrases (an alternation regex re-scans per branch; the automaton walks
  * each character exactly once, following failure links).
  *
  * Matching is case-sensitive on the raw string and counts ALL
  * occurrences, including self-overlapping ones ("aa" occurs twice in
  * "aaa") — the automaton's natural semantics. Phrases that cannot
  * self-overlap (no proper prefix equal to a proper suffix — e.g. any
  * two-word phrase of distinct words) count identically to a
  * non-overlapping left scan, which is what the SQL oracle replays.
  *
  * Plan shape: the automaton builds ONCE on the driver from the phrase
  * list and rides a broadcast; matching is a zero-shuffle typed
  * mapPartitions emitting (id, phrase, n_matches > 0) rows. Output rows
  * are bounded by |docs|·|phrases| but in practice by actual hits — docs
  * without matches emit nothing.
  */
object PhraseMatch {

  /** Immutable automaton: goto/fail/output tables over a dense node array.
    * Children are per-node sorted (char, next) arrays — binary-searched,
    * cache-friendly, serializable for the broadcast. */
  final class Automaton private[PhraseMatch] (
      private[PhraseMatch] val childKeys: Array[Array[Char]],
      private[PhraseMatch] val childVals: Array[Array[Int]],
      private[PhraseMatch] val fail: Array[Int],
      private[PhraseMatch] val outputs: Array[Array[Int]],
      val phrases: Array[String]) extends Serializable {

    private def step(state: Int, c: Char): Int = {
      var s = state
      while (true) {
        val i = java.util.Arrays.binarySearch(childKeys(s), c)
        if (i >= 0) return childVals(s)(i)
        if (s == 0) return 0
        s = fail(s)
      }
      0 // unreachable
    }

    /** Count of occurrences per phrase index (all matches, overlaps
      * included). */
    def countAll(text: String): Array[Long] = {
      val counts = new Array[Long](phrases.length)
      if (text == null) return counts
      var s = 0
      var i = 0
      while (i < text.length) {
        s = step(s, text.charAt(i))
        val out = outputs(s)
        var j = 0
        while (j < out.length) { counts(out(j)) += 1; j += 1 }
        i += 1
      }
      counts
    }
  }

  /** Build the automaton: trie, then BFS failure links, outputs merged
    * along the failure chain (the standard construction). */
  def build(phrases: Seq[String]): Automaton = {
    require(phrases.nonEmpty && phrases.forall(p => p != null && p.nonEmpty),
      "phrases must be non-empty strings")
    require(phrases.distinct.size == phrases.size, "duplicate phrases")
    // mutable trie
    val children = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.TreeMap.empty[Char, Int])
    val ends = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    phrases.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        s = children(s).getOrElseUpdate(c, {
          children += scala.collection.mutable.TreeMap.empty[Char, Int]
          ends += Nil
          children.size - 1
        })
      }
      ends(s) = pi :: ends(s)
    }
    val n = children.size
    val fail = new Array[Int](n)
    val out = Array.fill(n)(List.empty[Int])
    for (s <- 0 until n) out(s) = ends(s)
    val queue = scala.collection.mutable.Queue.empty[Int]
    children(0).foreach { case (_, v) => fail(v) = 0; queue += v }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      children(s).foreach { case (c, v) =>
        var f = fail(s)
        while (f != 0 && !children(f).contains(c)) f = fail(f)
        fail(v) = if (children(f).contains(c) && children(f)(c) != v)
          children(f)(c) else 0
        out(v) = out(v) ++ out(fail(v))
        queue += v
      }
    }
    new Automaton(
      children.map(_.keys.toArray).toArray,
      children.map(_.values.toArray).toArray,
      fail, out.map(_.sorted.toArray), phrases.toArray)
  }

  /** Pure twin: (phrase, count) for every phrase with ≥ 1 match. */
  def countPure(text: String, phrases: Seq[String]): Map[String, Long] = {
    val a = build(phrases)
    a.phrases.zip(a.countAll(text)).filter(_._2 > 0).toMap
  }

  /** (idCol, phrase, n_matches) per document × matched phrase; docs and
    * phrases without matches emit no row. One broadcast automaton, one
    * zero-shuffle typed pass. */
  def matchDf(df: DataFrame, idCol: String, textCol: String,
      phrases: Seq[String]): DataFrame = {
    val auto = build(phrases)
    val bc = df.sparkSession.sparkContext.broadcast(auto)
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("phrase", StringType, nullable = false),
      StructField("n_matches", LongType, nullable = false)))
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .mapPartitions { it =>
        val a = bc.value
        it.flatMap { row =>
          val id = row.getLong(0)
          val text = if (row.isNullAt(1)) null else row.getString(1)
          val counts = a.countAll(text)
          counts.indices.iterator.filter(counts(_) > 0)
            .map(i => Row(id, a.phrases(i), counts(i)))
        }
      }(Encoders.row(outSchema))
  }
}
