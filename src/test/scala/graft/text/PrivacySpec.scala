package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkTestBase {
  import spark.implicits._

  // (id, city, segment, salary): city+segment is the QI pair
  private val rows = Seq(
    (1L, "berlin", "a", "50k"),
    (2L, "berlin", "a", "60k"),
    (3L, "berlin", "a", "60k"),
    (4L, "paris", "a", "70k"),   // singleton group -> suppressed
    (5L, "berlin", "b", "50k"),
    (6L, "berlin", "b", "50k"))  // 2-group, 1 distinct salary

  private def df = rows.toDF("id", "city", "segment", "salary")

  test("suppression + verdicts match the hand-derived groups") {
    val got = Privacy.kAnonymize(df, Seq("city", "segment"), "salary", k = 2, l = 2)
      .select("id", "city", "segment", "group_n", "n_sensitive",
        "suppressed", "l_diverse")
      .as[(Long, Option[String], Option[String], Long, Long, Boolean, Boolean)]
      .collect().sortBy(_._1)
    // (berlin,a): n=3, 2 salaries -> kept, diverse
    assert(got(0) == ((1L, Some("berlin"), Some("a"), 3L, 2L, false, true)))
    // paris singleton: QI nulled, suppressed, never l_diverse
    assert(got(3) == ((4L, None, None, 1L, 1L, true, false)))
    // (berlin,b): kept but NOT l-diverse (one shared salary)
    assert(got(4) == ((5L, Some("berlin"), Some("b"), 2L, 1L, false, false)))
    // non-QI payload survives suppression
    val salaries = Privacy.kAnonymize(df, Seq("city", "segment"), "salary", 2, 2)
      .select("id", "salary").as[(Long, String)].collect().toMap
    assert(salaries == rows.map(r => r._1 -> r._4).toMap)
  }

  test("null QI values form their own group (null-safe join)") {
    val withNull = df.withColumn("city",
      when(col("id") >= 5, lit(null)).otherwise(col("city")))
    val byId = Privacy.kAnonymize(withNull, Seq("city", "segment"), "salary", 2, 1)
      .select("id", "group_n").as[(Long, Long)].collect().toMap
    // ids 5,6 share (null, "b") -> group of 2, kept
    assert(byId(5L) == 2L && byId(6L) == 2L)
    // every input row comes back exactly once even with null keys
    assert(byId.keySet == rows.map(_._1).toSet)
  }

  test("pure-twin parity across partitionings") {
    val pure = Privacy.kAnonymizePure(
      rows.map(r => (r._1, Seq(Option(r._2), Option(r._3)), r._4)), k = 2, l = 2)
    for (parts <- Seq(1, 7)) {
      val got = Privacy.kAnonymize(df.repartition(parts),
          Seq("city", "segment"), "salary", 2, 2)
        .select("id", "group_n", "n_sensitive", "suppressed", "l_diverse")
        .as[(Long, Long, Long, Boolean, Boolean)].collect()
      assert(got.length == rows.length)
      for ((id, n, ns, sup, ld) <- got)
        assert(pure(id) == ((n, ns, sup, ld)), s"id=$id parts=$parts")
    }
  }

  test("dpCounts: pure-twin parity, invariance, noise shape") {
    val many = (1L to 2000L).map(i => (i, s"g${i % 200}"))
      .toDF("id", "grp")
    val got = Privacy.dpCounts(many, Seq("grp"), epsMilli = 1000, salt = "s1")
      .select("grp", "noisy_micro").as[(String, Long)].collect().toMap
    assert(got.size == 200)
    for ((g, noisy) <- got)
      assert(noisy == Privacy.dpCountPure(Seq(g), 10L, 1000, "s1"), g)
    // partitioning cannot move the noise
    val rep = Privacy.dpCounts(many.repartition(13), Seq("grp"), 1000, "s1")
      .select("grp", "noisy_micro").as[(String, Long)].collect().toMap
    assert(rep == got)
    // Laplace shape over 200 seeded draws: roughly sign-balanced, mean
    // |noise| within 3x of b = 1/eps = 1e6 micro
    val noise = got.map { case (_, v) => v - 10L * 1000000L }
    val pos = noise.count(_ > 0)
    assert(pos > 60 && pos < 140, s"sign balance $pos/200")
    val meanAbs = noise.map(math.abs).sum / noise.size
    assert(meanAbs > 300000L && meanAbs < 3000000L, s"meanAbs $meanAbs")
    // a different salt moves every draw
    val other = Privacy.dpCounts(many, Seq("grp"), 1000, "s2")
      .select("grp", "noisy_micro").as[(String, Long)].collect().toMap
    assert(other.count { case (g, v) => v != got(g) } > 190)
    intercept[IllegalArgumentException](
      Privacy.dpCounts(many, Seq("grp"), 0, "s1"))
    intercept[IllegalArgumentException](
      Privacy.dpCounts(many, Seq("nope"), 1000, "s1"))
  }

  test("pseudonymize: stable keyed pseudonyms, format linking, counts") {
    val (c1, e1, p1) = Privacy.pseudonymize(
      "mail Bob@Ex.COM or call (555) 123-4567", "s")
    val (c2, e2, p2) = Privacy.pseudonymize(
      "bob@ex.com again, phone 555.123.4567", "s")
    assert(e1 == 1 && p1 == 1 && e2 == 1 && p2 == 1)
    // same identifier (case/format-insensitive) -> same pseudonym
    val pseudo1 = "user\\d{6}@anon\\.invalid".r.findFirstIn(c1).get
    assert(c2.contains(pseudo1))
    val phone1 = "555-\\d{4}".r.findFirstIn(c1).get
    assert(c2.contains(phone1))
    // a different salt unlinks
    val (c3, _, _) = Privacy.pseudonymize("bob@ex.com", "other")
    assert(!c3.contains(pseudo1))
    // raw values are gone; non-PII text untouched
    assert(!c1.toLowerCase.contains("bob@ex.com") && !c1.contains("123-4567"))
    assert(Privacy.pseudonymize("plain text 12-34", "s") ==
      (("plain text 12-34", 0L, 0L)))
    // DF twin: id type preserved, rows match the pure kernel
    val df = Seq((7L, "x bob@ex.com y"), (8L, null.asInstanceOf[String]))
      .toDF("doc_id", "t")
    val got = Privacy.pseudonymizeDf(df, "doc_id", "t", "s")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(got(0) == ((7L, Privacy.pseudonymize("x bob@ex.com y", "s")._1, 1L, 0L)))
    assert(got(1) == ((8L, "", 0L, 0L)))
  }

  test("refusals") {
    intercept[IllegalArgumentException](
      Privacy.kAnonymize(df, Seq("city"), "salary", k = 0, l = 1))
    intercept[IllegalArgumentException](
      Privacy.kAnonymize(df, Seq("city"), "salary", k = 1, l = 0))
    intercept[IllegalArgumentException](
      Privacy.kAnonymize(df, Seq.empty, "salary", 2, 2))
    intercept[IllegalArgumentException](
      Privacy.kAnonymize(df, Seq("nope"), "salary", 2, 2))
    intercept[IllegalArgumentException](
      Privacy.kAnonymize(df, Seq("salary"), "salary", 2, 2))
  }
}
