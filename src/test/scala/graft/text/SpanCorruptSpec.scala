package graft.text

import graft.SparkTestBase

class SpanCorruptSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, (1 to 23).map(i => s"w$i").mkString(" ")),
    (2L, "  leading   and trailing   "),
    (3L, ""),
    (4L, (1 to 10).map(i => s"t$i").mkString(" ")))

  private def df = docs.toDF("doc_id", "text")

  test("DF matches the pure twin on every doc") {
    val got = SpanCorrupt.corrupt(df, "doc_id", "text")
      .select("doc_id", "input_text", "target_text", "n_spans", "n_masked")
      .as[(Long, String, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    for ((id, text) <- docs)
      assert(got(id) == SpanCorrupt.corruptPure(id, text), s"doc $id")
    // empty doc: empty input/target, zero spans
    assert(got(3L) == (("", "", 0L, 0L)))
  }

  test("input + target reconstruct the canonical document") {
    for ((id, text) <- docs) {
      val (in, tgt, spans, masked) = SpanCorrupt.corruptPure(id, text)
      // parse target: "<extra_id_k> tok tok <extra_id_k+1> tok ..."
      val spanMap = scala.collection.mutable.Map.empty[String, List[String]]
      var cur: String = null
      for (t <- tgt.split(" ").filter(_.nonEmpty)) {
        if (t.startsWith("<extra_id_")) { cur = t; spanMap(cur) = Nil }
        else spanMap(cur) = spanMap(cur) :+ t
      }
      assert(spanMap.size == spans)
      assert(spanMap.values.map(_.size.toLong).sum == masked)
      val rebuilt = in.split(" ").filter(_.nonEmpty).flatMap { t =>
        if (t.startsWith("<extra_id_")) spanMap(t) else Seq(t)
      }.mkString(" ")
      val canonical = text.trim.split("\\s+").filter(_.nonEmpty).mkString(" ")
      assert(rebuilt == canonical, s"doc $id")
      // sentinels are consecutively numbered from 0 in input order
      val sentinels = in.split(" ").filter(_.startsWith("<extra_id_"))
      assert(sentinels.toSeq ==
        (0 until spans.toInt).map(k => s"<extra_id_$k>"))
    }
  }

  test("corruption rate lands near maxSpan/2/blockTokens on a long corpus") {
    val long = (1L to 50L).map(i =>
      (i, (1 to 400).map(j => s"x$j").mkString(" ")))
    val got = SpanCorrupt.corrupt(long.toDF("doc_id", "text"), "doc_id", "text")
      .selectExpr("sum(n_masked)", "sum(n_spans)").as[(Long, Long)].head()
    val rate = got._1.toDouble / (50 * 400)
    assert(rate > 0.10 && rate < 0.20, s"rate $rate") // expect ~0.15
    // mean span length ~ (1+2+3)/3 = 2 over masking blocks
    val meanSpan = got._1.toDouble / got._2
    assert(meanSpan > 1.7 && meanSpan < 2.3, s"mean span $meanSpan")
  }

  test("refusals") {
    intercept[IllegalArgumentException](
      SpanCorrupt.corrupt(df, "doc_id", "text", blockTokens = 1))
    intercept[IllegalArgumentException](
      SpanCorrupt.corrupt(df, "doc_id", "text", blockTokens = 10, maxSpan = 10))
  }
}
