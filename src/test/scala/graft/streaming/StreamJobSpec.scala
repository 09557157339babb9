package graft.streaming

import graft.SparkTestBase
import graft.io.Synth
import graft.pipeline.{Ep1Config, ExtractJob}

import java.nio.file.Files

class StreamJobSpec extends SparkTestBase {

  test("streaming EP1 over file source matches the batch pipeline") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream").toString
    val in = s"$dir/in"; val out = s"$dir/out"; val ckpt = s"$dir/ckpt"

    val docs = Synth.generate(spark, 40, 4)
    docs.toDF().write.parquet(in)

    val q = StreamJob.run(spark, in, out, ckpt, Ep1Config())
    q.awaitTermination(120000)

    val streamed = spark.read.parquet(out).as[graft.model.Doc].collect()
      .map(d => d.doc_id -> d.spans).toMap
    val batch = ExtractJob.runTyped(docs, Ep1Config()).collect()
      .map(d => d.doc_id -> d.spans).toMap
    assert(streamed.keySet == batch.keySet)
    for ((id, spans) <- batch) assert(streamed(id) == spans, s"doc $id")
  }

  test("restart with same checkpoint is a no-op (no duplicate output)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream2").toString
    val in = s"$dir/in"; val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    Synth.generate(spark, 10, 2).toDF().write.parquet(in)

    StreamJob.run(spark, in, out, ckpt).awaitTermination(120000)
    val n1 = spark.read.parquet(out).count()
    StreamJob.run(spark, in, out, ckpt).awaitTermination(120000)
    val n2 = spark.read.parquet(out).count()
    assert(n1 == n2 && n1 == 10)
  }
}
