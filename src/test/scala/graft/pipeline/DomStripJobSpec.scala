package graft.pipeline

import graft.SparkTestBase
import graft.io.TableIO
import graft.model.{Doc, Span}

class DomStripJobSpec extends SparkTestBase {
  import spark.implicits._

  private def mkDocs(n: Int, parts: Int): Seq[Doc] =
    (0 until n).map { i =>
      Doc(f"doc$i%03d", Seq(
        Span("text", s"<div><h1>Doc $i</h1><p>real body words here</p>" +
          "<a href=\"/m\">more</a></div>", null, 0),
        Span("media", null, s"img-$i", 1),
        Span("text", "<nav><a>only nav links</a></nav>", null, 2),
        Span("text", s"plain tail $i", null, 3)), i % parts)
    }

  test("dom strip job: lineage commits, resume no-op, interleaving kept") {
    val tmp = java.nio.file.Files.createTempDirectory("domjob").toString
    val docs = mkDocs(24, 4)
    docs.toDF().write.partitionBy("partition_id").parquet(s"$tmp/in")

    val r1 = DomStripJob.runJob(spark, s"$tmp/in", s"$tmp/out",
      s"$tmp/lineage", commitBatch = 2)
    assert(r1.map(_.partition_id).distinct.size == 4)
    assert(r1.map(_.docs_in).sum == 24)
    // 3 surviving spans per doc: cleaned div, media passthrough, plain tail
    assert(r1.map(_.spans_out).sum == 24L * 3)

    val r2 = DomStripJob.runJob(spark, s"$tmp/in", s"$tmp/out",
      s"$tmp/lineage", commitBatch = 2)
    assert(r2.isEmpty)
    assert(TableIO.readLineage(spark, s"$tmp/lineage").count() == 4)

    val got = spark.read.parquet(s"$tmp/out")
      .select("doc_id", "kind", "text", "media_ref", "offset")
      .as[(String, String, String, String, Int)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._5).map(r => (r._2, r._3, r._4, r._5)).toSeq)
      .toMap
    for (i <- 0 until 24) {
      val id = f"doc$i%03d"
      assert(got(id) == Seq(
        ("text", s"Doc $i real body words here", null, 0),
        ("media", null, s"img-$i", 1),
        ("text", s"plain tail $i", null, 3)), id)
    }
  }
}
