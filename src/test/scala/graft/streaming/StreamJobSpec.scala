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

  test("dedupStream: cross-batch duplicate drop, first arrival survives") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(Long, String, String)]
    val docs = input.toDF()
      .select(col("_1").cast("timestamp").as("event_time"),
        col("_2").as("marker"), col("_3").as("text"))
    val q = StreamJob.dedupStream(docs, "text", "1 hour")
      .writeStream.format("memory").queryName("dd").outputMode("append").start()

    input.addData((100L, "b1", "Alpha Text"), (110L, "b1", "beta"))
    q.processAllAvailable()
    // same normalized fp across batches ('  alpha   text ' ≡ 'Alpha Text');
    // a genuinely new text passes
    input.addData((200L, "b2", "  alpha   text "), (210L, "b2", "gamma"))
    q.processAllAvailable()
    // duplicate within one batch also collapses
    input.addData((300L, "b3", "delta"), (301L, "b3", "delta"))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("dd").as[(java.sql.Timestamp, String, String, Long)]
      .collect()
    assert(got.length == 4)
    val byText = got.map(r => r._3.trim.toLowerCase.replaceAll("\\s+", " ") -> r._2).toMap
    assert(byText == Map("alpha text" -> "b1", "beta" -> "b1",
      "gamma" -> "b2", "delta" -> "b3"))
    // fp is the exact-dedup fingerprint (cross-operator agreement)
    for (r <- got)
      assert(r._4 == graft.text.TextAnalysis.hash60(
        r._3.trim.toLowerCase.replaceAll("\\s+", " ")))
  }

  test("watermarked windowed metrics: append finalization + late-data drop") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // (epoch seconds, span text) → docs with event_time + one text span
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF()
      .select(col("_1").cast("timestamp").as("event_time"),
        array(struct(lit("text").as("kind"), col("_2").as("text"),
          lit("").as("media_ref"), lit(0).as("offset"))).as("spans"))
    val q = StreamJob.windowedMetrics(docs, "10 seconds", "5 minutes")
      .writeStream.format("memory").queryName("wm").outputMode("append").start()

    input.addData((100L, "aa"), (120L, "bbb")) // window [0,300)
    q.processAllAvailable()
    input.addData((700L, "c")) // watermark → 690; [0,300) and [300,600) finalize
    q.processAllAvailable()
    input.addData((50L, "LATE")) // before watermark 690 → dropped entirely
    q.processAllAvailable()
    input.addData((2000L, "flush")) // watermark → 1990; [600,900) finalizes
    q.processAllAvailable()
    q.stop()

    val got = spark.table("wm").as[(Long, String, Long, Long)].collect().toSet
    // [0,300) has only the two pre-watermark rows (late row dropped);
    // [600,900) has the 700s row; the flush row's window never finalized
    assert(got == Set((0L, "text", 2L, 5L), (600L, "text", 1L, 1L)))
  }

  test("windowedDistinct: HLL per finalized window equals the batch sketch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(Long, String)]
    val docs = input.toDF()
      .select(col("_1").cast("timestamp").as("event_time"), col("_2").as("v"))
    val q = StreamJob.windowedDistinct(docs, "v", "10 seconds", "5 minutes")
      .writeStream.format("memory").queryName("wd").outputMode("append").start()
    // window [0,300): 9 distinct values arriving across two batches, dups
    val w0 = (1 to 9).map(i => (10L + i, s"u${i}")) ++ Seq((200L, "u1"), (250L, "u2"))
    input.addData(w0: _*)
    q.processAllAvailable()
    input.addData((700L, "x1")) // watermark 690 → [0,300) finalizes
    q.processAllAvailable()
    input.addData((2000L, "flush")) // [600,900) finalizes
    q.processAllAvailable()
    q.stop()
    val got = spark.table("wd").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // the streamed estimate must equal the batch sketch over the same set
    val (batch0, _) = graft.sketch.Sketches.hllDistinctPure(w0.map(_._2).distinct)
    assert(got(0L) == ((batch0, 11L)))
    val (batch600, _) = graft.sketch.Sketches.hllDistinctPure(Seq("x1"))
    assert(got(600L) == ((batch600, 1L)))
    assert(batch600 == 1L) // linear counting lands exactly at tiny n
    assert(!got.contains(1800L)) // the flush window never finalized
  }

  test("custom state: flatMapGroupsWithState assembles docs on event-time session gap") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.model.{Doc, Span}
    import graft.pipeline.{Ep1Config, Ep1Core}
    import graft.segment.PageSegmenter.renderMarker
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def ev(doc: String, t: Long, kind: String, text: String, off: Int) =
      StreamJob.SpanEvent(doc, new java.sql.Timestamp(t * 1000), kind, text, "", off)
    val aSpans = Seq(
      Span("ocr", renderMarker(1) + "alpha $500", "", 0),
      Span("text", renderMarker(1) + "mortgagee on file", "", 1))
    val bSpans = Seq(Span("text", renderMarker(1) + "loss payee listed", "", 0))

    val input = MemoryStream[StreamJob.SpanEvent]
    val q = StreamJob.assembleDocs(input.toDS(), gapSeconds = 30)
      .writeStream.format("memory").queryName("asm").outputMode("append").start()
    input.addData(ev("A", 100, "ocr", aSpans(0).text, 0), ev("A", 101, "text", aSpans(1).text, 1))
    q.processAllAvailable()
    input.addData(ev("B", 500, "text", bSpans(0).text, 0)) // watermark 490 > A's 131
    q.processAllAvailable()
    input.addData(ev("C", 2000, "text", "flush", 0)) // watermark 1990 > B's 530
    q.processAllAvailable()
    q.stop()

    val got = spark.table("asm").as[Doc].collect().map(d => d.doc_id -> d.spans).toMap
    // A and B closed their session gaps and were extracted; C's gap is open
    assert(got.keySet == Set("A", "B"))
    assert(got("A") == Ep1Core.process(Doc("A", aSpans, 0), Ep1Config()))
    assert(got("B") == Ep1Core.process(Doc("B", bSpans, 0), Ep1Config()))
    assert(got("A").nonEmpty && got("B").nonEmpty)
  }

  test("minhashDupStream: online near-dup pairs match the signature estimate") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.dedup.Dedup
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val tA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val tB = "one two three four five six seven eight nine ten"
    val tC = tA.replace("kappa", "lambda") // near-dup of A
    def ev(id: Long, t: Long, text: String) =
      StreamJob.MinhashDocEvent(id, new java.sql.Timestamp(t * 1000), text)

    val input = MemoryStream[StreamJob.MinhashDocEvent]
    val q = StreamJob.minhashDupStream(input.toDS(), minSimMilli = 500)
      .writeStream.format("memory").queryName("mh").outputMode("append").start()
    input.addData(ev(1, 100, tA), ev(2, 110, tB))
    q.processAllAvailable()
    // cross-batch: doc 3 is an exact dup of 1, doc 4 a near-dup
    input.addData(ev(3, 200, tA), ev(4, 210, tC))
    q.processAllAvailable()
    q.stop()

    val raw = spark.table("mh").as[(Long, Long, Long, Long)].collect().toSeq
    val pairs = raw.map(r => (r._1, r._2, r._3)).distinct.sortBy(p => (p._1, p._2))
    // expected sims from the batch signature estimator
    def sim(a: String, b: String): Long = {
      val (sa, sb) = (Dedup.minhashSignature(a, 3, 32), Dedup.minhashSignature(b, 3, 32))
      1000L * sa.zip(sb).count(p => p._1 == p._2) / 32
    }
    val exp = Seq((1L, 3L, sim(tA, tA)), (1L, 4L, sim(tA, tC)), (3L, 4L, sim(tA, tC)))
      .filter(_._3 >= 500).sortBy(p => (p._1, p._2))
    assert(pairs == exp, s"got $pairs want $exp")
    assert(sim(tA, tA) == 1000L)
    // an exact dup shares all 8 bands → the (1,3) pair emits once per band
    assert(raw.count(r => r._1 == 1L && r._2 == 3L) == 8)
    // doc 2 never pairs
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("minhashDupStream: maxBucket cap stores first arrivals, still pairs against them") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    def ev(id: Long, ts: Long) =
      StreamJob.MinhashDocEvent(id, new java.sql.Timestamp(ts * 1000), t)
    val input = MemoryStream[StreamJob.MinhashDocEvent]
    val q = StreamJob.minhashDupStream(input.toDS(), minSimMilli = 500, maxBucket = 1)
      .writeStream.format("memory").queryName("mhc").outputMode("append").start()
    input.addData(ev(1, 100), ev(3, 200), ev(5, 300))
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("mhc").as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2)).distinct.toSet
    // only doc 1 is stored; 3 and 5 pair against it but never against each
    // other (the hot-bucket drop, applied online)
    assert(pairs == Set((1L, 3L), (1L, 5L)))
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

  test("streaming DOM strip over file source matches the batch operator") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-domstream").toString
    val in = s"$dir/in"; val out = s"$dir/out"; val ckpt = s"$dir/ckpt"

    val docs = (0 until 20).map { i =>
      graft.model.Doc(f"d$i%02d", Seq(
        graft.model.Span("text",
          s"<div><h1>T $i</h1><p>body $i</p><a>more</a></div>", null, 0),
        graft.model.Span("media", null, s"img-$i", 1),
        graft.model.Span("text", "<nav><a>links only</a></nav>", null, 2)),
        i % 4)
    }
    docs.toDF().write.parquet(in)

    val q = StreamJob.domStrip(spark, in, out, ckpt)
    q.awaitTermination(120000)

    val streamed = spark.read.parquet(out)
      .select("doc_id", "kind", "text", "media_ref", "offset")
      .as[(String, String, String, String, Int)].collect().sortBy(r => (r._1, r._5))
    val batchRows = docs.toDF()
      .select(col("doc_id"), explode(col("spans")).as("sp"))
      .select(col("doc_id"), col("sp.kind").as("kind"), col("sp.text").as("text"),
        col("sp.media_ref").as("media_ref"), col("sp.offset").as("offset"))
    val batch = graft.segment.Dom.stripInterleaved(batchRows)
      .as[(String, String, String, String, Int)].collect().sortBy(r => (r._1, r._5))
    assert(streamed.toSeq == batch.toSeq)
    // restart with the same checkpoint appends nothing
    StreamJob.domStrip(spark, in, out, ckpt).awaitTermination(120000)
    assert(spark.read.parquet(out).count() == batch.length)
  }

  test("streaming JSONL quarantine matches the batch parse; restart no-op") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-jsonlstream").toString
    val in = s"$dir/in"; val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("title", StringType)))
    val lines = Seq(
      """{"id": 1, "title": "a"}""",
      """{"id": 2""",             // corrupt
      """{"id": 3}""")            // missing title
    lines.toDF("line").write.parquet(in)
    StreamJob.jsonlStream(spark, in, out, ckpt, schema, Seq("title"))
      .awaitTermination(120000)
    val streamed = spark.read.parquet(out)
      .as[(Option[Long], Option[String], Boolean, Option[String])]
      .collect().sortBy(_._1)
    val batch = graft.io.Jsonl.parseLines(lines.toDF("line"), "line",
      schema, Seq("title"))
      .as[(Option[Long], Option[String], Boolean, Option[String])]
      .collect().sortBy(_._1)
    assert(streamed.toSeq == batch.toSeq && streamed.length == 3)
    StreamJob.jsonlStream(spark, in, out, ckpt, schema, Seq("title"))
      .awaitTermination(120000)
    assert(spark.read.parquet(out).count() == 3)
  }

  test("streaming sessionization: gap close, timeout flush, batch parity") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def ev(userId: Long, sec: Long, id: Long) =
      StreamJob.UserEvent(userId, new java.sql.Timestamp(sec * 1000L), id)

    val input = MemoryStream[StreamJob.UserEvent]
    val q = StreamJob.sessionStream(input.toDS(), gapSeconds = 1800)
      .writeStream.format("memory").queryName("sess").outputMode("append").start()

    // user 1: two sessions split by a >30min gap inside ONE batch;
    // user 2: one session that stays open
    input.addData(ev(1, 1000, 1), ev(1, 1500, 2), ev(1, 1500 + 1801, 3),
      ev(2, 1200, 4))
    q.processAllAvailable()
    val afterBatch1 = spark.table("sess").as[(Long, Long, Long, Long)].collect().toSet
    // user 1's FIRST session closed by the gap rule; user 2's session then
    // timed out in the no-data batch (watermark 3291s passed its 3000s
    // timeout); user 1's second session (timeout 5101s) stays open
    assert(afterBatch1 == Set(
      (1L, 1000000000L, 1500000000L, 2L),
      (2L, 1200000000L, 1200000000L, 1L)), s"got $afterBatch1")

    // an event far in the future advances the watermark past every open
    // session's last+gap -> user 1's second session and user 2's session
    // flush by TIMEOUT; the sentinel's own session stays open
    input.addData(ev(99, 1000000, 5))
    q.processAllAvailable()
    input.addData(ev(99, 1000001, 6)) // nudge one more batch so timeouts fire
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sess").as[(Long, Long, Long, Long)].collect().toSet
    val expected = Set(
      (1L, 1000000000L, 1500000000L, 2L),
      (1L, 3301000000L, 3301000000L, 1L),
      (2L, 1200000000L, 1200000000L, 1L))
    assert(got == expected, s"got $got")

    // exact boundary: a gap of exactly 30min does NOT split (strict >)
    val input2 = MemoryStream[StreamJob.UserEvent]
    val q2 = StreamJob.sessionStream(input2.toDS(), gapSeconds = 1800)
      .writeStream.format("memory").queryName("sess2").outputMode("append").start()
    input2.addData(ev(7, 1000, 1), ev(7, 1000 + 1800, 2))
    q2.processAllAvailable()
    input2.addData(ev(99, 2000000, 3))
    q2.processAllAvailable()
    input2.addData(ev(99, 2000001, 4))
    q2.processAllAvailable()
    q2.stop()
    val got2 = spark.table("sess2").as[(Long, Long, Long, Long)].collect().toSet
    assert(got2 == Set((7L, 1000000000L, 2800000000L, 2L)), s"got $got2")
  }

  test("streamStreamJoin: inner matches within tolerance, across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val lIn = MemoryStream[(Long, Long, String)]
    val rIn = MemoryStream[(Long, Long, String)]
    val left = lIn.toDF().select(col("_1").as("k"),
      col("_2").cast("timestamp").as("lt"), col("_3").as("lval"))
    val right = rIn.toDF().select(col("_1").as("rk"),
      col("_2").cast("timestamp").as("rt"), col("_3").as("rval"))
    // delay wider than the data's time span: the batch-2 row at ts=950 must
    // not be late-dropped (watermark after batch 1 is max(ts) - delay)
    val q = StreamJob.streamStreamJoin(left, right, "k", "rk", "lt", "rt",
        toleranceSeconds = 60, watermarkDelay = "2 hours")
      .select(col("k"), col("lval"), col("rval"))
      .writeStream.format("memory").queryName("ssj").outputMode("append").start()

    lIn.addData((1L, 1000L, "a"), (2L, 5000L, "b"))
    rIn.addData((1L, 1030L, "x"), (1L, 1100L, "y"), (2L, 4990L, "z"))
    q.processAllAvailable()
    // a later right-side batch still joins the buffered left row (state)
    rIn.addData((1L, 950L, "w"))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ssj").as[(Long, String, String)].collect().toSet
    // (1,1100,"y") is 100s from lt=1000 — outside the 60s band
    val expected = Set((1L, "a", "x"), (2L, "b", "z"), (1L, "a", "w"))
    assert(got == expected, s"got $got")

    // shared column names are rejected up front
    val bad = intercept[IllegalArgumentException] {
      StreamJob.streamStreamJoin(left, left, "k", "k", "lt", "lt", 60)
    }
    assert(bad.getMessage.contains("disjoint"))
  }
}
