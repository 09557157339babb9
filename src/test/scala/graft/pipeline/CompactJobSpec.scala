package graft.pipeline

import graft.SparkTestBase
import graft.io.TableIO
import org.apache.spark.sql.functions._

class CompactJobSpec extends SparkTestBase {
  import spark.implicits._

  private def listDataFiles(dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(n => !n.startsWith("_") && !n.startsWith("."))
  }

  test("compaction is content-identical, collapses files, resumes as a no-op") {
    val tmp = java.nio.file.Files.createTempDirectory("compact").toString
    // 3 partitions × 6 files each (repartition(6) within each partition)
    val rows = (0 until 300).map(i => (i.toLong, s"text $i", i % 3))
    rows.toDF("doc_id", "text", "partition_id")
      .repartition(6)
      .write.partitionBy("partition_id").parquet(s"$tmp/in")
    (0 until 3).foreach { p =>
      assert(listDataFiles(s"$tmp/in/partition_id=$p").size > 1, s"p$p")
    }

    // huge target → exactly one file per partition
    val r1 = CompactJob.runJob(spark, s"$tmp/in", s"$tmp/out", s"$tmp/lineage",
      targetBytes = 1L << 30, commitBatch = 2)
    assert(r1.map(_.partition_id).sorted == Seq(0, 1, 2))
    assert(r1.forall(_.docs_in > 1))   // files before
    assert(r1.forall(_.docs_out == 1)) // files after
    assert(r1.map(_.spans_out).sum == 300)
    (0 until 3).foreach { p =>
      assert(listDataFiles(s"$tmp/out/partition_id=$p").size == 1, s"p$p")
    }

    // content identity: the rewritten table holds exactly the input rows
    val in = spark.read.parquet(s"$tmp/in")
      .select("doc_id", "text", "partition_id")
      .as[(Long, String, Int)].collect().toSet
    val out = spark.read.parquet(s"$tmp/out")
      .select("doc_id", "text", "partition_id")
      .as[(Long, String, Int)].collect().toSet
    assert(out == in)

    // rerun: everything committed → no-op
    val r2 = CompactJob.runJob(spark, s"$tmp/in", s"$tmp/out", s"$tmp/lineage",
      targetBytes = 1L << 30)
    assert(r2.isEmpty)
    assert(TableIO.readLineage(spark, s"$tmp/lineage").count() == 3)
  }

  test("tiny target splits a partition into multiple files") {
    val tmp = java.nio.file.Files.createTempDirectory("compact2").toString
    (0 until 2000).map(i => (i.toLong, ("x" * 100) + i, 0))
      .toDF("doc_id", "text", "partition_id")
      .repartition(4)
      .write.partitionBy("partition_id").parquet(s"$tmp/in")
    val bytes = {
      val p = new org.apache.hadoop.fs.Path(s"$tmp/in/partition_id=0")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).filter(_.isFile).map(_.getLen).sum
    }
    val target = bytes / 3 + 1 // expect ceil(bytes/target) = 3 output files
    val r = CompactJob.runJob(spark, s"$tmp/in", s"$tmp/out", s"$tmp/lineage",
      targetBytes = target)
    assert(r.size == 1 && r.head.docs_out == 3, r)
    assert(listDataFiles(s"$tmp/out/partition_id=0").size == 3)
    assert(spark.read.parquet(s"$tmp/out").count() == 2000)
  }

  test("refusals: non-partitioned input, non-positive target") {
    val tmp = java.nio.file.Files.createTempDirectory("compact3").toString
    Seq((1L, "a")).toDF("doc_id", "text").write.parquet(s"$tmp/flat")
    intercept[IllegalArgumentException](
      CompactJob.runJob(spark, s"$tmp/flat", s"$tmp/o", s"$tmp/l"))
    Seq((1L, "a", 0)).toDF("doc_id", "text", "partition_id")
      .write.partitionBy("partition_id").parquet(s"$tmp/in")
    intercept[IllegalArgumentException](
      CompactJob.runJob(spark, s"$tmp/in", s"$tmp/o", s"$tmp/l",
        targetBytes = 0))
  }
}
