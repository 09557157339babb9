package graft.qc

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class QcSpec extends SparkTestBase {
  import Qc._

  // ------------------------------------------------------------------ J4 --
  case class V(name: String, status: String)

  test("J4 guardrail: bidirectional containment match") {
    val validations = Seq(V("Building Coverage", "MATCH"), V("Theft", "MATCH"),
      V("Unrelated", "MISMATCH"))
    val got = guardrailFilter[V](validations, _.name, Seq("Building"))
    assert(got.map(_.name) == Seq("Building Coverage")) // 'building' ⊂ 'buildingcoverage'
  }

  test("J4 guardrail: no requested items → empty") {
    assert(guardrailFilter[V](Seq(V("a", "MATCH")), _.name, Seq.empty).isEmpty)
    assert(guardrailFilter[V](Seq(V("a", "MATCH")), _.name, Seq("", "  &&  ")).isEmpty)
  }

  test("J4 guardrail: head-N fallback when nothing matches, cap at N") {
    val validations = Seq(V("x1", "MATCH"), V("x2", "MATCH"), V("x3", "MATCH"))
    val got = guardrailFilter[V](validations, _.name, Seq("building", "theft"))
    assert(got.map(_.name) == Seq("x1", "x2")) // first-2 fallback
    // cap: 3 matches but only 1 requested
    val capped = guardrailFilter[V](
      Seq(V("theft a", "M"), V("theft b", "M"), V("theft c", "M")), _.name, Seq("theft"))
    assert(capped.size == 1)
  }

  test("J4 DataFrame form agrees with pure form") {
    import spark.implicits._
    val valDf = Seq(
      ("d1", "Building Coverage", 0), ("d1", "Theft", 1), ("d1", "Unrelated", 2),
      ("d2", "x1", 0), ("d2", "x2", 1), ("d2", "x3", 2),
      ("d3", "anything", 0)).toDF("doc_id", "name", "seq")
    val reqDf = Seq(
      ("d1", "Building"), ("d2", "building"), ("d2", "theft")).toDF("doc_id", "req")
    val got = guardrailJoinDf(valDf, reqDf, "doc_id", "name", "req", "seq")
      .select("doc_id", "name").as[(String, String)].collect().toSet
    assert(got == Set(("d1", "Building Coverage"), ("d2", "x1"), ("d2", "x2")))
  }

  test("J4 forms agree when a requested name normalizes to empty") {
    import spark.implicits._
    // "##" normalizes to "": it must still count toward the cap N (pure form
    // caps at requestedNames.length) but not qualify a doc by itself
    val valDf = Seq(
      ("d1", "Building Coverage", 0), ("d1", "Building Annex", 1), ("d1", "Other", 2),
      ("d2", "anything", 0), ("d2", "more", 1)).toDF("doc_id", "name", "seq")
    val reqDf = Seq(
      ("d1", "Building"), ("d1", "##"), // cap 2, one empty norm
      ("d2", "##")).toDF("doc_id", "req") // all-empty norms → doc dropped
    val got = guardrailJoinDf(valDf, reqDf, "doc_id", "name", "req", "seq")
      .select("doc_id", "name").as[(String, String)].collect().toSet
    val pure = guardrailFilter[(String, Int)](
      Seq(("Building Coverage", 0), ("Building Annex", 1), ("Other", 2)),
      (v: (String, Int)) => v._1, Seq("Building", "##")).map(_._1).toSet
    assert(pure == Set("Building Coverage", "Building Annex"))
    assert(got == pure.map(("d1", _)))
    assert(guardrailFilter[(String, Int)](Seq(("anything", 0)),
      (v: (String, Int)) => v._1, Seq("##")).isEmpty)
  }

  test("J4 DataFrame form is invariant under repartitioning") {
    import spark.implicits._
    // a fallback doc with many candidates: partition layout must not change
    // which 'first N' rows the fallback selects
    val rows = (0 until 40).map(i => ("dF", f"cand$i%02d", i)) ++
      Seq(("dM", "Building Coverage", 0), ("dM", "Other", 1))
    val reqDf = Seq(("dF", "zzz"), ("dF", "qqq"), ("dM", "building")).toDF("doc_id", "req")
    val layouts = Seq(
      rows.toDF("doc_id", "name", "seq"),
      rows.toDF("doc_id", "name", "seq").repartition(7),
      rows.reverse.toDF("doc_id", "name", "seq").repartition(3, col("name")))
    val results = layouts.map { valDf =>
      guardrailJoinDf(valDf, reqDf, "doc_id", "name", "req", "seq")
        .select("doc_id", "name").as[(String, String)].collect().toSet
    }
    assert(results.forall(_ == results.head))
    assert(results.head == Set(("dF", "cand00"), ("dF", "cand01"), ("dM", "Building Coverage")))
  }

  test("J4 plan never forces a broadcast of the corpus-sized relations") {
    import spark.implicits._
    // req/matchCount/reqCount are per-document (corpus-sized) relations: a
    // forced broadcast() hint on any of them OOMs at 100× scale. With the
    // auto-broadcast threshold off, the static physical plan must contain no
    // BroadcastExchange — proving every broadcast that DOES appear in
    // production comes from AQE's runtime size estimates, never a hint.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val valDf = Seq(("d1", "Building Coverage", 0), ("d2", "x1", 0))
        .toDF("doc_id", "name", "seq")
      val reqDf = Seq(("d1", "Building"), ("d2", "theft")).toDF("doc_id", "req")
      val plan = guardrailJoinDf(valDf, reqDf, "doc_id", "name", "req", "seq")
        .queryExecution.sparkPlan.toString
      assert(!plan.contains("BroadcastExchange"), plan)
      // and the join result is still correct without any broadcast
      val got = guardrailJoinDf(valDf, reqDf, "doc_id", "name", "req", "seq")
        .select("doc_id", "name").as[(String, String)].collect().toSet
      assert(got == Set(("d1", "Building Coverage"), ("d2", "x1")))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  // ------------------------------------------------------------------ J5 --
  def cert(locations: Boolean): Map[String, Any] = Map(
    "property" -> (Map(
      "policy_number" -> "P-123",
      "effective_date" -> "09/26/2025") ++
      (if (locations) Map("locations" -> Seq(Map(
        "building" -> "$350,000", "deductible" -> "1,000"))) else Map.empty)),
    "general_liability" -> Map(
      "policy_number" -> "GL-9",
      "limits" -> Map("each_occurrence" -> "$1,000,000")))

  val policy: Map[String, Any] = Map(
    "property" -> Map(
      "policy_number" -> "P-123",
      "policy_period" -> Map("effective_date" -> "9/26/2025"), // differs as string
      "locations" -> Seq(Map("building" -> "350000", "deductible" -> "1000"))),
    "general_liability" -> Map(
      "policy_number" -> "GL-9",
      "limits" -> Map("each_occurrence" -> "1000000")))

  test("J5 money-normalized equality passes; both-null skipped") {
    val r = qcCompare(cert(locations = true), policy)
    // date "09/26/2025" vs "9/26/2025" normalize to 09262025 vs 9262025 → mismatch
    assert(r.status == "needs_review")
    assert(r.mismatches.map(_.field) == Seq("property.effective_date"))
    assert(r.mismatches.head.certificate == "09262025")
    assert(r.mismatches.head.policy == "9262025")
  }

  test("J5 tolerant compare accepts date/format variants the strict one flags") {
    // strict flags 09/26/2025 vs 9/26/2025 (previous test); tolerant passes
    val r = qcCompare(cert(locations = true), policy, tolerant = true)
    assert(r.status == "pass", r.mismatches.toString)
    // a genuinely different date still mismatches, reported in tolerant form
    val p2 = policy.updated("property",
      policy("property").asInstanceOf[Map[String, Any]]
        .updated("policy_period", Map("effective_date" -> "10/01/2025")))
    val r2 = qcCompare(cert(locations = true), p2, tolerant = true)
    assert(r2.mismatches.map(_.field) == Seq("property.effective_date"))
    assert(r2.mismatches.head.certificate == "9/26/2025")
    assert(r2.mismatches.head.policy == "10/1/2025")
  }

  test("J5 tolerant DataFrame form normalizes dates and addresses") {
    import spark.implicits._
    val certKv = Seq(
      ("d1", "eff", "09/26/2025"), ("d1", "addr", "123 Main Road, Suite 4"),
      ("d1", "amt", "$1,000"), ("d1", "bad", "10/05/2025")).toDF("doc_id", "field", "value")
    val polKv = Seq(
      ("d1", "eff", "9/26/2025"), ("d1", "addr", "123 MAIN RD. STE 4"),
      ("d1", "amt", "1000."), ("d1", "bad", "10/06/2025")).toDF("doc_id", "field", "value")
    val got = qcCompareTolerantDf(certKv, polKv, "doc_id")
      .select("field", "is_mismatch").as[(String, Boolean)].collect().toMap
    assert(got == Map("eff" -> false, "addr" -> false, "amt" -> false, "bad" -> true))
  }

  test("J5 fuzzy DataFrame form: edit budget passes 1 slip, fails 2, nulls stay hard") {
    import spark.implicits._
    val certKv = Seq(
      ("d1", "name", "ACME HOLDINGS LLC"), ("d1", "addr", "123 Main Road"),
      ("d1", "two", "JOHNSON & SONS"), ("d1", "gone", null))
      .toDF("doc_id", "field", "value")
    val polKv = Seq(
      ("d1", "name", "ACME HOLD1NGS LLC"), ("d1", "addr", "123 MAIN RD"),
      ("d1", "two", "J0HNSON & S0NS"), ("d1", "gone", "present"))
      .toDF("doc_id", "field", "value")
    val got = qcCompareFuzzyDf(certKv, polKv, "doc_id", maxEdits = 1)
      .select("field", "edit_distance", "is_mismatch")
      .as[(String, Option[Long], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("name") == ((Some(1L), false))) // one OCR slip inside budget
    assert(got("addr") == ((Some(0L), false))) // abbreviation normalizes away
    assert(got("two") == ((Some(2L), true)))   // two slips exceed budget
    assert(got("gone") == ((None, true)))      // one-sided null stays hard
  }

  test("J5 one-sided null is a mismatch (hartford_done strict semantics)") {
    val p2 = policy.updated("general_liability", Map("policy_number" -> "GL-9"))
    val r = qcCompare(cert(locations = false), p2)
    assert(r.mismatches.exists(m =>
      m.field == "gl.limits.each_occurrence" && m.policy == null && m.certificate == "1000000"))
  }

  test("J5 location checks dropped when cert has no locations") {
    val r = qcCompare(cert(locations = false), policy)
    assert(!r.mismatches.exists(_.field.contains("locations")))
    assert(!r.mismatches.exists(_.field.startsWith("policy.property.")))
  }

  test("J5 DataFrame form flags the same mismatches") {
    import spark.implicits._
    val certKv = Seq(
      ("d1", "a", "$100"), ("d1", "b", "$200"), ("d1", "only_cert", "$5")).toDF("doc_id", "field", "value")
    val polKv = Seq(
      ("d1", "a", "100"), ("d1", "b", "999"), ("d1", "only_pol", "$7")).toDF("doc_id", "field", "value")
    val got = qcCompareDf(certKv, polKv, "doc_id")
      .select("field", "is_mismatch").as[(String, Boolean)].collect().toMap
    assert(got == Map("a" -> false, "b" -> true, "only_cert" -> true, "only_pol" -> true))
  }

  // ------------------------------------------------------------------ A1 --
  test("A1 status counts recompute") {
    val c = statusCounts(Seq("MATCH", "match", "MISMATCH", "NOT_FOUND", "weird", null))
    assert(c == StatusCounts(6, 2, 1, 1))
    assert(presenceCounts(Seq("PRESENT", "NOT_PRESENT", "PRESENT", null)) == ((4L, 2L, 1L)))
  }

  test("A1 DataFrame aggregation matches pure counts") {
    import spark.implicits._
    val df = Seq(("cgl", "MATCH"), ("cgl", "match"), ("cgl", "MISMATCH"),
      ("umb", "NOT_FOUND"), ("umb", null)).toDF("category", "status")
    // (total, matched, mismatched, not_found) per category
    val m = statusCountsDf(df, Seq("category")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(m("cgl") == ((3L, 2L, 1L, 0L)))
    assert(m("umb") == ((2L, 0L, 0L, 1L)))
  }

  // ------------------------------------------------------------------ A5 --
  test("A5 section keyword validation") {
    val longGl = "x" * 101 + " the aggregate limit per occurrence"
    val (valid, found) = validateSection("GL", longGl)
    assert(valid && found == Seq("limit", "aggregate", "occurrence"))
    val (v2, f2) = validateSection("PROPERTY", "short building")
    assert(!v2 && f2 == Seq("building"))
    val (v3, f3) = validateSection("OTHER", "anything at all " * 20)
    assert(v3 && f3.isEmpty)
  }
}
