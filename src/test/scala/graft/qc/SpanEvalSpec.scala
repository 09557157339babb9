package graft.qc

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SpanEvalSpec extends SparkTestBase {
  import spark.implicits._

  private def rows(t: (String, String, String, String, Int)*) =
    t.toSeq.toDF("doc_id", "kind", "text", "media_ref", "offset")

  test("identical sequences are exact with perfect P/R") {
    val g = rows(("d1", "text", "a", "", 0), ("d1", "media", "", "m1", 1))
    val got = SpanEval.spanSeqEval(g, g).as[
      (String, Long, Long, Long, Long, Boolean, Option[Long], Option[Long], Option[Long])]
      .collect().toSeq
    assert(got == Seq(("d1", 2L, 2L, 2L, 2L, true,
      Some(1000L), Some(1000L), Some(1000L))))
  }

  test("order swap: exact=false, bag P/R stay perfect, pos_matched drops") {
    val g = rows(("d1", "text", "a", "", 0), ("d1", "text", "b", "", 1))
    val a = rows(("d1", "text", "b", "", 0), ("d1", "text", "a", "", 1))
    val r = SpanEval.spanSeqEval(a, g).collect().head
    assert(!r.getAs[Boolean]("exact"))
    assert(r.getAs[Long]("pos_matched") == 0L)
    assert(r.getAs[Long]("bag_matched") == 2L)
    assert(r.getAs[Long]("precision_milli") == 1000L)
    assert(r.getAs[Long]("recall_milli") == 1000L)
  }

  test("dropped span: recall < 1000, precision = 1000; mutated text hits both") {
    val g = rows(("d1", "text", "a", "", 0), ("d1", "text", "b", "", 1),
      ("d1", "text", "c", "", 2))
    val dropped = rows(("d1", "text", "a", "", 0), ("d1", "text", "b", "", 1))
    val r1 = SpanEval.spanSeqEval(dropped, g).collect().head
    assert(r1.getAs[Long]("precision_milli") == 1000L)
    assert(r1.getAs[Long]("recall_milli") == 666L) // 2000 div 3
    assert(r1.getAs[Long]("f1_milli") == (2L * 1000 * 666) / (1000 + 666))
    val mutated = rows(("d1", "text", "a", "", 0), ("d1", "text", "X", "", 1),
      ("d1", "text", "c", "", 2))
    val r2 = SpanEval.spanSeqEval(mutated, g).collect().head
    assert(r2.getAs[Long]("pos_matched") == 2L)
    assert(r2.getAs[Long]("bag_matched") == 2L)
    assert(r2.getAs[Long]("precision_milli") == 666L)
    assert(r2.getAs[Long]("recall_milli") == 666L)
  }

  test("duplicate spans pair one-to-one, never many-to-many") {
    // gold has the span twice, actual three times: bag intersection is 2
    val g = rows(("d1", "text", "x", "", 0), ("d1", "text", "x", "", 1))
    val a = rows(("d1", "text", "x", "", 0), ("d1", "text", "x", "", 1),
      ("d1", "text", "x", "", 2))
    val r = SpanEval.spanSeqEval(a, g).collect().head
    assert(r.getAs[Long]("bag_matched") == 2L)
    assert(r.getAs[Long]("pos_matched") == 2L)
    assert(!r.getAs[Boolean]("exact"))
  }

  test("doc on one side only: counts 0, undefined ratios null") {
    val g = rows(("only_gold", "text", "a", "", 0))
    val a = rows(("only_actual", "text", "a", "", 0))
    val m = SpanEval.spanSeqEval(a, g).collect()
      .map(r => r.getAs[String]("doc_id") -> r).toMap
    val og = m("only_gold")
    assert(og.getAs[Long]("n_actual") == 0L && og.isNullAt(og.fieldIndex("precision_milli")))
    assert(og.getAs[Long]("recall_milli") == 0L)
    val oa = m("only_actual")
    assert(oa.getAs[Long]("n_gold") == 0L && oa.isNullAt(oa.fieldIndex("recall_milli")))
    assert(oa.getAs[Long]("precision_milli") == 0L)
    assert(!og.getAs[Boolean]("exact") && !oa.getAs[Boolean]("exact"))
  }

  test("null media_ref matches null, not empty string") {
    val g = Seq(("d1", "media", "", Option.empty[String], 0),
      ("d2", "media", "", Option(""), 0))
      .toDF("doc_id", "kind", "text", "media_ref", "offset")
    val a = Seq(("d1", "media", "", Option.empty[String], 0),
      ("d2", "media", "", Option.empty[String], 0))
      .toDF("doc_id", "kind", "text", "media_ref", "offset")
    val m = SpanEval.spanSeqEval(a, g).collect()
      .map(r => r.getAs[String]("doc_id") -> r.getAs[Boolean]("exact")).toMap
    assert(m == Map("d1" -> true, "d2" -> false))
  }

  test("partitioning invariance and summary roll-up") {
    val g = (1 to 40).flatMap(d => (0 until 3).map(i =>
      (s"d$d", "text", s"s$d-$i", "", i)))
    val gDf = g.toDF("doc_id", "kind", "text", "media_ref", "offset")
    // perturb every 4th doc: drop its last span
    val aDf = gDf.filter(!(expr("cast(substr(doc_id,2) as int) % 4 = 0") &&
      col("offset") === 2))
    val e1 = SpanEval.spanSeqEval(aDf, gDf)
    val e2 = SpanEval.spanSeqEval(aDf.repartition(13), gDf.repartition(7))
    assert(e1.orderBy("doc_id").collect().toSeq ==
      e2.orderBy("doc_id").collect().toSeq)
    val s = SpanEval.spanSeqSummary(e1).collect().head
    assert(s.getAs[Long]("n_docs") == 40L && s.getAs[Long]("n_exact") == 30L)
    assert(s.getAs[Long]("exact_rate_milli") == 750L)
    assert(s.getAs[Long]("gold_spans") == 120L)
    assert(s.getAs[Long]("actual_spans") == 110L)
    assert(s.getAs[Long]("micro_precision_milli") == 1000L)
    assert(s.getAs[Long]("micro_recall_milli") == (110L * 1000) / 120)
  }
}
