package graft.io

import graft.SparkTestBase
import org.apache.spark.sql.types._

class JsonlSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("title", StringType),
    StructField("body", StringType)))

  private def run(lines: Seq[String], required: Seq[String] = Seq("title")) =
    Jsonl.parseLines(lines.toDF("line"), "line", schema, required)
      .as[(Option[Long], Option[String], Option[String], Boolean,
        Option[String])].collect().toSeq

  test("valid, corrupt, and missing-required lines are all kept and flagged") {
    val out = run(Seq(
      """{"id": 1, "title": "t1", "body": "b1"}""",
      """{"id": 2, "title": "t2""", // truncated: corrupt
      """{"id": 3, "body": "b3"}""", // title absent: missing
      """{"id": 4, "title": null, "body": "b4"}""", // JSON null: missing
      "not json at all"))
    assert(out == Seq(
      (Some(1L), Some("t1"), Some("b1"), false, None),
      (None, None, None, true, Some("corrupt")),
      (Some(3L), None, Some("b3"), true, Some("missing:title")),
      (Some(4L), None, Some("b4"), true, Some("missing:title")),
      (None, None, None, true, Some("corrupt"))))
  }

  test("first missing required field wins; no required = never missing") {
    val out = run(Seq("""{"body": "only"}"""), required = Seq("id", "title"))
    assert(out == Seq((None, None, Some("only"), true, Some("missing:id"))))
    val none = run(Seq("""{"body": "only"}"""), required = Nil)
    assert(none == Seq((None, None, Some("only"), false, None)))
  }

  test("escapes round-trip: quotes, backslash, newline, unicode") {
    val body = "a \"quoted\" \\ back\nslash é中"
    val line = Seq(("x", body)).toDF("title", "body")
      .selectExpr("to_json(struct(1L AS id, title, body)) AS line")
      .as[String].collect().head
    val out = run(Seq(line))
    assert(out == Seq((Some(1L), Some("x"), Some(body), false, None)))
  }

  test("plan is narrow (no Exchange); unknown required field refused") {
    val plan = Jsonl.parseLines(Seq("{}").toDF("line"), "line", schema,
      Seq("title")).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    intercept[IllegalArgumentException](
      Jsonl.parseLines(Seq("{}").toDF("line"), "line", schema, Seq("nope")))
  }
}
