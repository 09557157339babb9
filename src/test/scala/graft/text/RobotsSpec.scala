package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RobotsSpec extends SparkTestBase {
  import spark.implicits._

  private val robotsA =
    """# policy file
      |User-agent: *
      |Disallow: /private
      |Allow: /private/ok # the one public subtree
      |Disallow:
      |
      |User-agent: GraftBot
      |User-agent: otherbot
      |Allow: /private
      |Disallow: /tmp
      |""".stripMargin

  test("parse: groups, multi-agent runs, comments, empty-path no-op") {
    val rules = Robots.parse(robotsA)
    assert(rules.toSet == Set(
      ("*", false, "/private"),
      ("*", true, "/private/ok"),
      ("graftbot", true, "/private"),
      ("graftbot", false, "/tmp"),
      ("otherbot", true, "/private"),
      ("otherbot", false, "/tmp")))
    // DataFrame parse agrees
    val df = Robots.parseRules(Seq(("a.com", robotsA)).toDF("host", "txt"),
      "host", "txt").as[(String, String, Boolean, String)].collect().toSet
    assert(df == rules.map(r => ("a.com", r._1, r._2, r._3)).toSet)
  }

  test("isAllowed: longest prefix wins, allow beats disallow on tie, default allow") {
    val rules = Robots.parse(robotsA)
    // star group for an unknown agent
    assert(Robots.isAllowed(rules, "randombot", "/private/x") ==
      (false, "disallow:/private"))
    assert(Robots.isAllowed(rules, "randombot", "/private/ok/y") ==
      (true, "allow:/private/ok"))
    assert(Robots.isAllowed(rules, "randombot", "/open") == (true, ""))
    // exact-agent group replaces star entirely (case-insensitive)
    assert(Robots.isAllowed(rules, "GRAFTBOT", "/private/x") ==
      (true, "allow:/private"))
    assert(Robots.isAllowed(rules, "graftbot", "/tmp/x") ==
      (false, "disallow:/tmp"))
    // tie length: allow wins
    val tie = Seq(("*", false, "/a"), ("*", true, "/a"))
    assert(Robots.isAllowed(tie, "x", "/a/z")._1)
  }

  test("evaluate: per-URL verdicts match the pure twin; passthrough kept") {
    val rules = Robots.parseRules(
      Seq(("a.com", robotsA), ("b.com", "User-agent: *\nDisallow: /\n"))
        .toDF("host", "txt"), "host", "txt")
    val urls = Seq(
      (1L, "http://a.com/private/x"),
      (2L, "http://a.com/private/ok/y"),
      (3L, "http://a.com"),            // empty path → "/"
      (4L, "http://b.com/anything"),
      (5L, "http://c.com/no-robots")   // host without rules → allowed
    ).toDF("id", "url")
    val got = Robots.evaluate(urls, "url", rules, "GraftBot")
      .select("id", "url", "allowed", "rule")
      .as[(Long, String, Boolean, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "http://a.com/private/x", true, "allow:/private"),
      (2L, "http://a.com/private/ok/y", true, "allow:/private"),
      (3L, "http://a.com", true, ""),
      (4L, "http://b.com/anything", false, "disallow:/"),
      (5L, "http://c.com/no-robots", true, "")))
    // and every verdict agrees with the pure twin on the same inputs
    val pureA = Robots.parse(robotsA)
    val pureB = Robots.parse("User-agent: *\nDisallow: /\n")
    val paths = Map(1L -> "/private/x", 2L -> "/private/ok/y", 3L -> "/",
      4L -> "/anything", 5L -> "/no-robots")
    for ((id, _, allowed, rule) <- got) {
      val pure = id match {
        case 4L => Robots.isAllowed(pureB, "graftbot", paths(id))
        case 5L => (true, "")
        case _  => Robots.isAllowed(pureA, "graftbot", paths(id))
      }
      assert(pure == ((allowed, rule)), s"url $id")
    }
  }
}
