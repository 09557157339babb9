package graft.pipeline

import graft.SparkTestBase
import graft.classify.Boilerplate
import graft.io.TableIO

class BoilerplateJobSpec extends SparkTestBase {
  import spark.implicits._

  private def mkDocs(n: Int): Seq[(String, String)] =
    (0 until n).map { i =>
      val nav = s"""<a href="/a">Home</a> <a href="/b">More</a> | extra"""
      val body = s"Document $i body paragraph with plenty of words to be real content. " * 2
      (f"doc$i%03d", Seq(nav, s"Heading $i", body).mkString("\n\n"))
    }

  test("strip job: lineage commits, resume no-op, output matches pure form") {
    val tmp = java.nio.file.Files.createTempDirectory("bpjob").toString
    val docs = mkDocs(24)
    docs.toDF("doc_id", "text").write.parquet(s"$tmp/in")

    val r1 = BoilerplateJob.runJob(spark, s"$tmp/in", s"$tmp/out", s"$tmp/lineage",
      nPartitions = 4, commitBatch = 2)
    assert(r1.map(_.partition_id).distinct.size == 4)
    assert(r1.map(_.docs_in).sum == 24)

    // rerun: nothing pending
    val r2 = BoilerplateJob.runJob(spark, s"$tmp/in", s"$tmp/out", s"$tmp/lineage",
      nPartitions = 4, commitBatch = 2)
    assert(r2.isEmpty)
    assert(TableIO.readLineage(spark, s"$tmp/lineage").count() == 4)

    // written spans == pure classifier output per doc
    val got = spark.read.parquet(s"$tmp/out")
      .select("doc_id", "kind", "text", "offset")
      .as[(String, String, String, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(r => (r._2, r._3, r._4)).toSeq).toMap
    for ((id, text) <- docs) {
      val pure = Boilerplate.contentSpans(text).map(s => (s.kind, s.text, s.offset))
      assert(got(id) == pure, s"spans for $id")
    }
    // boilerplate nav blocks never reach the output
    assert(!got.values.flatten.exists(_._2.contains("Home")))
  }

  test("strip job: partial lineage resumes exactly the missing partitions") {
    val tmp = java.nio.file.Files.createTempDirectory("bpjob2").toString
    mkDocs(16).toDF("doc_id", "text").write.parquet(s"$tmp/in")
    // commit only some partitions by aborting after the first batch:
    // simulate by running with a lineage pre-seeded from a first full run,
    // then deleting two partitions' lineage rows
    BoilerplateJob.runJob(spark, s"$tmp/in", s"$tmp/out", s"$tmp/lineage", nPartitions = 4)
    val lineage = TableIO.readLineage(spark, s"$tmp/lineage").collect()
    val keep = lineage.filter(_.partition_id < 2)
    val fs = new java.io.File(s"$tmp/lineage")
    fs.listFiles().foreach(_.delete()); fs.delete()
    TableIO.appendLineage(spark, keep.toSeq, s"$tmp/lineage")

    val r = BoilerplateJob.runJob(spark, s"$tmp/in", s"$tmp/out", s"$tmp/lineage", nPartitions = 4)
    assert(r.map(_.partition_id).sorted == Seq(2, 3))
  }
}
