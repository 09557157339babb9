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

    // served corpus = base anti-join deletes, exactly
    val served = TakedownJob.readWithOverlay(spark, s"$tmp/corpus",
      s"$tmp/overlay").select("doc_id").as[Long].collect().sorted.toSeq
    assert(served == (0L to 99L).filterNot(Set(5L, 13L, 16L)).toSeq)
    // base bytes untouched
    val base = spark.read.parquet(s"$tmp/corpus")
    assert(base.count() == 100L)

    // rerun: everything committed -> no partitions processed
    val again = TakedownJob.runJob(spark, s"$tmp/corpus", s"$tmp/deletes",
      s"$tmp/overlay", s"$tmp/lineage")
    assert(again.isEmpty)

    // lost-lineage redo is idempotent: same overlay content either way
    val servedBefore = served
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$tmp/lineage"))
    val redo = TakedownJob.runJob(spark, s"$tmp/corpus", s"$tmp/deletes",
      s"$tmp/overlay", s"$tmp/lineage")
    assert(redo.map(_.partition_id).sorted == Seq(0, 5))
    val servedAfter = TakedownJob.readWithOverlay(spark, s"$tmp/corpus",
      s"$tmp/overlay").select("doc_id").as[Long].collect().sorted.toSeq
    assert(servedAfter == servedBefore)
  }

  test("no-op delete list and missing-overlay read") {
    val tmp = java.nio.file.Files.createTempDirectory("takedown2").toString
    buildCorpus(tmp)
    Seq(100000L).toDF("doc_id").write.parquet(s"$tmp/deletes")
    val rows = TakedownJob.runJob(spark, s"$tmp/corpus", s"$tmp/deletes",
      s"$tmp/overlay", s"$tmp/lineage")
    assert(rows.isEmpty)
    // no overlay was ever written -> read falls through to the base
    val served = TakedownJob.readWithOverlay(spark, s"$tmp/corpus",
      s"$tmp/overlay")
    assert(served.count() == 100L)
    // refusals
    intercept[IllegalArgumentException] {
      val bad = (1L to 5L).map(i => (i, "t")).toDF("doc_id", "text")
      bad.write.parquet(s"$tmp/flat")
      TakedownJob.runJob(spark, s"$tmp/flat", s"$tmp/deletes",
        s"$tmp/o2", s"$tmp/l2")
    }
  }
}
