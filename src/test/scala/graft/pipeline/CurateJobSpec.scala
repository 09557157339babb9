package graft.pipeline

import graft.SparkTestBase
import graft.io.TableIO

class CurateJobSpec extends SparkTestBase {
  import spark.implicits._

  // texts sized to exercise every gate: Gopher needs >= 50 words and >= 2
  // stop words; the blocklist density gate kills 'slow'-heavy docs; the
  // classifier sign splits what remains
  private def mkDocs(n: Int): Seq[(String, String, String)] =
    (0 until n).map { i =>
      val base = ("the table holds a value and the scan is of rows " +
        "that filter data in a batch with more words to pass gates ") * 3
      val text =
        if (i % 5 == 0) ("slow " * 60).trim              // density-blocked
        else if (i % 5 == 1) "too short"                  // Gopher-killed
        else base + s"tail token$i"
      val dom = if (i % 7 == 0) "src3" else s"src${i % 4}"
      (f"doc$i%03d", dom, text)
    }

  test("curate job: lineage commits, resume no-op, rows match the pure kernel") {
    val tmp = java.nio.file.Files.createTempDirectory("curjob").toString
    val docs = mkDocs(24)
    docs.toDF("doc_id", "source", "text").write.parquet(s"$tmp/in")

    val cfg = CurateJob.Config()
    val r1 = CurateJob.runJob(spark, s"$tmp/in", s"$tmp/out", s"$tmp/lineage",
      cfg, nPartitions = 4, commitBatch = 2)
    assert(r1.map(_.partition_id).distinct.size == 4)
    assert(r1.map(_.docs_in).sum == 24)

    val r2 = CurateJob.runJob(spark, s"$tmp/in", s"$tmp/out", s"$tmp/lineage",
      cfg, nPartitions = 4, commitBatch = 2)
    assert(r2.isEmpty)
    assert(TableIO.readLineage(spark, s"$tmp/lineage").count() == 4)

    val got = spark.read.parquet(s"$tmp/out")
      .select("doc_id", "n_tokens", "blocked", "gopher_kept",
        "clf_score_milli", "kept", "clean_text")
      .as[(String, Long, Boolean, Boolean, Long, Boolean, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(got.size == 24)
    for ((id, dom, text) <- docs) {
      val (nt, blocked, gq, score, kept, clean) =
        CurateJob.curateDoc(text, dom, cfg)
      assert(got(id) == ((id, nt, blocked, gq, score, kept, clean)), s"doc $id")
    }
    // the gates actually fire: density kills %5==0, Gopher kills %5==1,
    // domain kills src3 docs even with clean text
    assert(docs.filter(_._1.drop(3).toInt % 5 == 0)
      .forall(d => got(d._1)._3 && !got(d._1)._6))
    assert(docs.filter(_._1.drop(3).toInt % 5 == 1)
      .forall(d => !got(d._1)._4 && !got(d._1)._6))
    assert(docs.filter(d => d._2 == "src3" && d._1.drop(3).toInt % 5 > 1)
      .forall(d => got(d._1)._3))
    // lineage survivors == kept rows; token sum matches
    val keptRows = got.values.filter(_._6)
    assert(r1.map(_.docs_out).sum == keptRows.size.toLong)
    assert(r1.map(_.spans_out).sum == keptRows.map(_._2).sum)
    assert(keptRows.nonEmpty, "battery should pass someone")
  }

  test("missing source column defaults to never-domain-blocked") {
    val tmp = java.nio.file.Files.createTempDirectory("curjob2").toString
    Seq(("d1", ("the table holds a value and the scan is of rows " +
      "that filter data in a batch with more words to pass gates ") * 2))
      .toDF("doc_id", "text").write.parquet(s"$tmp/in")
    val r = CurateJob.runJob(spark, s"$tmp/in", s"$tmp/out", s"$tmp/lineage",
      CurateJob.Config(), nPartitions = 2)
    assert(r.map(_.docs_in).sum == 1)
    val row = spark.read.parquet(s"$tmp/out")
      .select("blocked").as[Boolean].collect()
    assert(row.toSeq == Seq(false))
  }

  test("explicit partition_id column is honored, not re-derived") {
    val tmp = java.nio.file.Files.createTempDirectory("curjob3").toString
    // every doc pinned to partition 7 — if the job re-derived partitions
    // from hash(doc_id), the lineage would span several ids
    mkDocs(6).map { case (id, dom, text) => (id, dom, text, 7) }
      .toDF("doc_id", "source", "text", "partition_id")
      .write.parquet(s"$tmp/in")
    val rows = CurateJob.runJob(spark, s"$tmp/in", s"$tmp/out", s"$tmp/lineage",
      CurateJob.Config(), nPartitions = 4, commitBatch = 2)
    assert(rows.map(_.partition_id) == Seq(7))
    assert(rows.head.docs_in == 6)
  }
}
