package graft.pipeline

import graft.SparkTestBase
import graft.io.TableIO
import org.apache.spark.sql.functions._

class TakedownJobSpec extends SparkTestBase {
  import spark.implicits._

  private def buildCorpus(dir: String): Unit = {
    val corpus = (0L to 99L).map(i => (i, s"doc $i text", (i % 8).toInt))
      .toDF("doc_id", "text", "partition_id")
    TableIO.writePartitioned(corpus, s"$dir/corpus")
  }

  private def served(tmp: String): Seq[Long] =
    TakedownJob.readWithOverlay(spark, s"$tmp/corpus", s"$tmp/overlay",
      s"$tmp/lineage").select("doc_id").as[Long].collect().sorted.toSeq

  test("only affected partitions rewrite; overlay read = anti-join; resume") {
    val tmp = java.nio.file.Files.createTempDirectory("takedown").toString
    buildCorpus(tmp)
    // ids 5,13 -> partition 5; 16 -> partition 0; partitions 1-4,6,7 clean
    Seq(5L, 13L, 16L).toDF("doc_id").write.parquet(s"$tmp/deletes")

    val rows = TakedownJob.runJob(spark, s"$tmp/corpus", s"$tmp/deletes",
      s"$tmp/overlay", s"$tmp/lineage")
    assert(rows.map(_.partition_id).sorted == Seq(0, 5))
    // ids 0..99 over i%8: partitions 0-3 hold 13 docs, 4-7 hold 12
    val byPid = rows.map(r => r.partition_id -> r).toMap
    assert(byPid(5).docs_in == 12L && byPid(5).docs_out == 10L &&
      byPid(5).spans_out == 2L)
    assert(byPid(0).docs_in == 13L && byPid(0).docs_out == 12L &&
      byPid(0).spans_out == 1L)

    // the overlay holds ONLY the two rewritten partitions
    val overlayDirs = new java.io.File(s"$tmp/overlay").listFiles()
      .map(_.getName).filter(_.startsWith("partition_id=")).sorted.toSeq
    assert(overlayDirs == Seq("partition_id=0", "partition_id=5"))

    // served corpus = base anti-join deletes, exactly; base untouched
    assert(served(tmp) == (0L to 99L).filterNot(Set(5L, 13L, 16L)).toSeq)
    assert(spark.read.parquet(s"$tmp/corpus").count() == 100L)

    // rerun: the served view holds no listed docs -> no-op
    assert(TakedownJob.runJob(spark, s"$tmp/corpus", s"$tmp/deletes",
      s"$tmp/overlay", s"$tmp/lineage").isEmpty)

    // lost-lineage redo is idempotent: same served corpus either way
    val servedBefore = served(tmp)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$tmp/lineage"))
    val redo = TakedownJob.runJob(spark, s"$tmp/corpus", s"$tmp/deletes",
      s"$tmp/overlay", s"$tmp/lineage")
    assert(redo.map(_.partition_id).sorted == Seq(0, 5))
    assert(served(tmp) == servedBefore)
  }

  test("grown delete list re-rewrites committed partitions, keeps old deletions") {
    val tmp = java.nio.file.Files.createTempDirectory("takedown3").toString
    buildCorpus(tmp)
    Seq(5L).toDF("doc_id").write.parquet(s"$tmp/deletes")
    val r1 = TakedownJob.runJob(spark, s"$tmp/corpus", s"$tmp/deletes",
      s"$tmp/overlay", s"$tmp/lineage")
    assert(r1.map(_.partition_id) == Seq(5))
    // a month later id 13 (same partition) joins the list
    Seq(5L, 13L).toDF("doc_id").write.mode("overwrite")
      .parquet(s"$tmp/deletes")
    val r2 = TakedownJob.runJob(spark, s"$tmp/corpus", s"$tmp/deletes",
      s"$tmp/overlay", s"$tmp/lineage")
    assert(r2.map(_.partition_id) == Seq(5))
    // id 5's earlier deletion survives the second rewrite
    assert(r2.head.docs_in == 11L && r2.head.spans_out == 1L)
    assert(served(tmp) == (0L to 99L).filterNot(Set(5L, 13L)).toSeq)

    // the list grows again to EVERY remaining doc of partition 5: the
    // stale overlay dir must be dropped (an empty dynamic overwrite
    // touches nothing), the docs must vanish, and the run must converge
    val all5 = (0L to 99L).filter(_ % 8 == 5)
    all5.toDF("doc_id").write.mode("overwrite").parquet(s"$tmp/deletes")
    val r3 = TakedownJob.runJob(spark, s"$tmp/corpus", s"$tmp/deletes",
      s"$tmp/overlay", s"$tmp/lineage")
    assert(r3.map(_.partition_id) == Seq(5))
    assert(r3.head.docs_in == 10L && r3.head.docs_out == 0L &&
      r3.head.spans_out == 10L)
    assert(!new java.io.File(s"$tmp/overlay/partition_id=5").exists())
    assert(served(tmp) == (0L to 99L).filterNot(_ % 8 == 5).toSeq)
    assert(TakedownJob.runJob(spark, s"$tmp/corpus", s"$tmp/deletes",
      s"$tmp/overlay", s"$tmp/lineage").isEmpty)
  }

  test("fully-deleted partition vanishes despite a fileless overlay dir") {
    val tmp = java.nio.file.Files.createTempDirectory("takedown4").toString
    buildCorpus(tmp)
    // every doc of partition 7: ids ≡ 7 (mod 8)
    val all7 = (0L to 99L).filter(_ % 8 == 7)
    all7.toDF("doc_id").write.parquet(s"$tmp/deletes")
    val rows = TakedownJob.runJob(spark, s"$tmp/corpus", s"$tmp/deletes",
      s"$tmp/overlay", s"$tmp/lineage")
    assert(rows.map(_.partition_id) == Seq(7))
    assert(rows.head.docs_in == 12L && rows.head.docs_out == 0L &&
      rows.head.spans_out == 12L)
    // exclusion keys on the LINEAGE, not overlay listings — the deleted
    // docs must be gone even though the overlay wrote zero files
    assert(served(tmp) == (0L to 99L).filterNot(_ % 8 == 7).toSeq)
    // and the rerun is still a no-op
    assert(TakedownJob.runJob(spark, s"$tmp/corpus", s"$tmp/deletes",
      s"$tmp/overlay", s"$tmp/lineage").isEmpty)
  }

  test("per-partition wall_ms measures only its own partition, not the batch") {
    val tmp = java.nio.file.Files.createTempDirectory("takedown5").toString
    buildCorpus(tmp)
    // one listed doc per partition -> all 8 partitions rewrite in ONE batch
    (0L to 7L).toDF("doc_id").write.parquet(s"$tmp/deletes")
    val t0 = System.nanoTime()
    val rows = TakedownJob.runJob(spark, s"$tmp/corpus", s"$tmp/deletes",
      s"$tmp/overlay", s"$tmp/lineage", commitBatch = 8)
    val elapsedMs = (System.nanoTime() - t0) / 1000000
    assert(rows.size == 8)
    // independence pin: with a cumulative per-batch t0 each later row
    // accumulates every earlier partition's time and the sum lands near
    // (k/2)x the batch wall (~4x here); per-partition t0 keeps the sum of
    // sequential rewrites at or under the run's own wall clock
    assert(rows.map(_.wall_ms).sum <= elapsedMs,
      s"sum of per-partition wall_ms ${rows.map(_.wall_ms).sum} exceeds " +
        s"the run's wall $elapsedMs ms — cumulative batch timing regressed")
  }

  test("overlay read switches to broadcast lineage joins past the isin cap") {
    val tmp = java.nio.file.Files.createTempDirectory("takedown6").toString
    buildCorpus(tmp)
    Seq(5L, 16L).toDF("doc_id").write.parquet(s"$tmp/deletes")
    TakedownJob.runJob(spark, s"$tmp/corpus", s"$tmp/deletes",
      s"$tmp/overlay", s"$tmp/lineage")
    val viaIsin = TakedownJob.readWithOverlay(spark, s"$tmp/corpus",
      s"$tmp/overlay", s"$tmp/lineage")
    val viaJoin = TakedownJob.readWithOverlay(spark, s"$tmp/corpus",
      s"$tmp/overlay", s"$tmp/lineage", isinPruneMax = 0)
    // the scale form (no In-list) plans lineage JOINS on both sides...
    val plan = viaJoin.queryExecution.optimizedPlan.toString
    assert(plan.contains("Join LeftAnti") && plan.contains("Join LeftSemi"),
      s"expected lineage anti+semi joins in the large-committed-set plan:\n$plan")
    assert(!viaIsin.queryExecution.optimizedPlan.toString.contains("Join LeftAnti"))
    // ...and serves the identical corpus
    assert(viaJoin.select("doc_id").as[Long].collect().sorted.toSeq ==
      viaIsin.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("kill windows: uncommitted overlay invisible; audit-first stale dir self-heals") {
    val tmp = java.nio.file.Files.createTempDirectory("takedown7").toString
    buildCorpus(tmp)
    // establish a committed overlay for partition 5 (drops doc 5)
    Seq(5L).toDF("doc_id").write.parquet(s"$tmp/deletes")
    TakedownJob.runJob(spark, s"$tmp/corpus", s"$tmp/deletes",
      s"$tmp/overlay", s"$tmp/lineage")
    val consistent = (0L to 99L).filterNot(_ == 5L)
    assert(served(tmp) == consistent)

    // WINDOW 1 — kill between overlay data write and lineage append:
    // partition 3's overlay holds garbage (a half-written rewrite) with NO
    // lineage row. A concurrent reader must keep serving partition 3 from
    // the BASE — uncommitted overlay files are invisible.
    spark.range(1).select(lit(99999L).as("doc_id"), lit("junk").as("text"),
        lit(3).as("partition_id"))
      .write.partitionBy("partition_id").mode("append").parquet(s"$tmp/overlay")
    assert(served(tmp) == consistent)
    // rerun with partition 3 now affected: the rewrite replaces the junk
    // (dynamic overwrite) and commits; doc 3 vanishes, junk never appears
    Seq(5L, 3L).toDF("doc_id").write.mode("overwrite").parquet(s"$tmp/deletes")
    TakedownJob.runJob(spark, s"$tmp/corpus", s"$tmp/deletes",
      s"$tmp/overlay", s"$tmp/lineage")
    assert(served(tmp) == (0L to 99L).filterNot(Set(3L, 5L)))

    // WINDOW 2 — the audit-first full-deletion path: lineage row for the
    // all-deleted partition landed, the stale overlay dir did NOT drop.
    // Reconstruct that exact state by hand: delete every remaining doc of
    // partition 5 in lineage terms only.
    graft.io.TableIO.appendLineage(spark, Seq(graft.model.LineageRow(
      5, 11, 0, 11, 1)), s"$tmp/lineage")
    // the reader still serves the stale (committed) overlay copy — the
    // documented self-healing window, NOT data loss or a crash
    assert(served(tmp) == (0L to 99L).filterNot(Set(3L, 5L)))
    // the next run re-finds the listed survivors and completes the drop
    val all5 = (0L to 99L).filter(_ % 8 == 5)
    (all5 :+ 3L).toDF("doc_id").write.mode("overwrite").parquet(s"$tmp/deletes")
    TakedownJob.runJob(spark, s"$tmp/corpus", s"$tmp/deletes",
      s"$tmp/overlay", s"$tmp/lineage")
    assert(!new java.io.File(s"$tmp/overlay/partition_id=5").exists())
    assert(served(tmp) == (0L to 99L).filterNot(i => i % 8 == 5 || i == 3L))
    // converged: rerun is a no-op
    assert(TakedownJob.runJob(spark, s"$tmp/corpus", s"$tmp/deletes",
      s"$tmp/overlay", s"$tmp/lineage").isEmpty)
  }

  test("no-op delete list and missing-overlay read") {
    val tmp = java.nio.file.Files.createTempDirectory("takedown2").toString
    buildCorpus(tmp)
    Seq(100000L).toDF("doc_id").write.parquet(s"$tmp/deletes")
    val rows = TakedownJob.runJob(spark, s"$tmp/corpus", s"$tmp/deletes",
      s"$tmp/overlay", s"$tmp/lineage")
    assert(rows.isEmpty)
    // no overlay/lineage was ever written -> read falls through to base
    assert(served(tmp).size == 100)
    // refusals
    intercept[IllegalArgumentException] {
      val bad = (1L to 5L).map(i => (i, "t")).toDF("doc_id", "text")
      bad.write.parquet(s"$tmp/flat")
      TakedownJob.runJob(spark, s"$tmp/flat", s"$tmp/deletes",
        s"$tmp/o2", s"$tmp/l2")
    }
  }
}
