package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PackingSpec extends SparkTestBase {
  import spark.implicits._

  test("pack: single-shard tape matches the pure twin; splits and zero-token docs") {
    // nShards=1 makes the tape exactly the pure sequential layout by doc_id
    val docs = Seq((1L, "a b c"), (2L, "d e"), (3L, "   "), (4L, ("w " * 9).trim))
      .toDF("doc_id", "text")
    val got = Packing.pack(docs, "doc_id", "text", budget = 4, nShards = 1)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "tok_start", "seq_first", "seq_last",
        "offset_in_seq", "is_split")
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect().toSeq
    val pure = Packing.packPure(Seq((1L, 3L), (2L, 2L), (3L, 0L), (4L, 9L)), 4)
    assert(got.map(_._1) == pure.map(_._1))
    for ((g, (id, start, first, last, off)) <- got.zip(pure)) {
      assert(g._3 == start, s"doc $id tok_start")
      assert(g._4 == first, s"doc $id seq_first")
      assert(g._5 == last, s"doc $id seq_last")
      assert(g._6 == off, s"doc $id offset")
      assert(g._7 == (first != last), s"doc $id is_split")
    }
    // doc 2 straddles the 4-token cut; zero-token doc 3 is pinned, unsplit
    assert(got(1)._7 && !got(2)._7 && got(3)._7)
  }

  test("pack: shards are disjoint sequence-id spaces; window is per-shard, not global") {
    val docs = (1L to 64L).map(i => (i, ("tok " * (i % 7 + 1).toInt).trim))
      .toDF("doc_id", "text")
    val packed = Packing.pack(docs, "doc_id", "text", budget = 8, nShards = 4)
    val rows = packed.select("doc_id", "shard", "n_tokens", "tok_start", "seq_first")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 64)
    // every sequence id decodes back to its shard
    assert(rows.forall { case (_, sh, _, _, sq) => sq / Packing.SeqBase == sh })
    // per shard, the tape is gapless: sorted tok_starts == cumsum of tokens
    for ((_, g) <- rows.groupBy(_._2)) {
      val inOrder = g.sortBy(_._1) // shard window orders by doc_id
      var cum = 0L
      for ((id, _, n, start, _) <- inOrder) {
        assert(start == cum, s"doc $id tape gap")
        cum += n
      }
    }
    // scale shape: the cumulative-sum window must hash-partition on the
    // shard key, never collapse to a single partition
    val plan = packed.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
    assert(plan.contains("hashpartitioning(shard"), plan)
  }

  test("pack: md5 shuffle order reorders the tape but stays gapless and deterministic") {
    val docs = (1L to 32L).map(i => (i, ("tok " * (i % 5 + 1).toInt).trim))
      .toDF("doc_id", "text")
    def run() = Packing.pack(docs, "doc_id", "text", budget = 8, nShards = 2,
      shuffleOrder = true).select("doc_id", "shard", "n_tokens", "tok_start")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val a = run()
    assert(a == run()) // replayable: no RNG anywhere
    // per shard the tape is gapless in md5 order, and that order is not id order
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(id: Long) = md.digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    var reordered = false
    for ((_, g) <- a.groupBy(_._2)) {
      val inOrder = g.sortBy(r => (hex(r._1), r._1))
      var cum = 0L
      for ((id, _, n, start) <- inOrder) {
        assert(start == cum, s"doc $id tape gap in shuffled order")
        cum += n
      }
      if (inOrder.map(_._1) != inOrder.map(_._1).sorted) reordered = true
    }
    assert(reordered, "md5 order coincided with id order on every shard")
  }
}
