package graft.join

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TemporalJoinsSpec extends SparkTestBase {
  import spark.implicits._

  private def leftDf = Seq(
    // (key, ts, payload)
    (1L, 10L, "a"), (1L, 20L, "b"), (1L, 20L, "b2"), (1L, 5L, "early"),
    (2L, 100L, "c"), (3L, 7L, "nokey")
  ).toDF("k", "ts", "payload")

  private def rightDf = Seq(
    // (key, ts, price) — unique per (key, ts); one genuine null value
    (1L, 8L, java.lang.Long.valueOf(80L)),
    (1L, 20L, java.lang.Long.valueOf(200L)),
    (1L, 15L, null.asInstanceOf[java.lang.Long]),
    (2L, 40L, java.lang.Long.valueOf(400L))
  ).toDF("k", "rts", "price")

  test("asofJoin: backward match, tie matches, genuine null preserved") {
    val got = TemporalJoins.asofJoin(leftDf, rightDf, "k", "ts", "rts", Seq("price"))
      .select("k", "ts", "payload", "matched_rts", "price")
      .as[(Long, Long, String, Option[Long], Option[Long])].collect().toSet
    assert(got == Set(
      (1L, 10L, "a", Some(8L), Some(80L)),
      (1L, 20L, "b", Some(20L), Some(200L)),   // tie: rts == ts matches
      (1L, 20L, "b2", Some(20L), Some(200L)),
      (1L, 5L, "early", None, None),           // nothing at-or-before
      (2L, 100L, "c", Some(40L), Some(400L)),
      (3L, 7L, "nokey", None, None)))          // key absent on the right
    // the matched row's own null value must come through as null, not be
    // skipped back to the previous non-null right row
    val g2 = TemporalJoins.asofJoin(
      Seq((1L, 16L, "x")).toDF("k", "ts", "payload"),
      rightDf, "k", "ts", "rts", Seq("price"))
      .select("matched_rts", "price").as[(Option[Long], Option[Long])].head()
    assert(g2 == (Some(15L), None))
  }

  test("asofJoin: tolerance nulls out stale matches") {
    val got = TemporalJoins.asofJoin(leftDf, rightDf, "k", "ts", "rts",
        Seq("price"), toleranceMicros = Some(5L))
      .select("k", "ts", "matched_rts", "price")
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
    assert(got.contains((1L, 10L, Some(8L), Some(80L))))   // age 2 <= 5
    assert(got.contains((2L, 100L, None, None)))           // age 60 > 5
  }

  test("asofJoin ≡ naive inequality-join baseline on random data") {
    val rnd = new scala.util.Random(7)
    val lft = Seq.tabulate(300)(i => (rnd.nextInt(5).toLong, rnd.nextInt(50).toLong, i.toLong))
      .toDF("k", "ts", "row_id")
    // unique (k, rts): distinct pairs
    val rgt = Seq.tabulate(200)(i => (rnd.nextInt(5).toLong, rnd.nextInt(50).toLong))
      .distinct.map { case (k, t) => (k, t, k * 1000 + t) }
      .toDF("k", "rts", "v")
    val got = TemporalJoins.asofJoin(lft, rgt, "k", "ts", "rts", Seq("v"))
      .select("row_id", "matched_rts", "v")
      .as[(Long, Option[Long], Option[Long])].collect().toSet
    val naive = lft.as("l").join(rgt.as("r"),
        col("l.k") === col("r.k") && col("l.ts") >= col("r.rts"), "left")
      .groupBy(col("l.row_id"))
      .agg(max(struct(col("r.rts"), col("r.v"))).as("m"))
      .select(col("row_id"), col("m.rts"), col("m.v"))
      .as[(Long, Option[Long], Option[Long])].collect().toSet
    assert(got == naive)
  }

  test("asofJoin: duplicate right (key, ts) rows are refused") {
    val dup = Seq((1L, 8L, 1L), (1L, 8L, 2L)).toDF("k", "rts", "price")
    val ex = intercept[Exception] {
      TemporalJoins.asofJoin(leftDf, dup, "k", "ts", "rts", Seq("price")).collect()
    }
    assert(ex.getMessage != null)
  }

  test("asofJoin plan: one key exchange, no nested-loop or cartesian join") {
    val plan = TemporalJoins.asofJoin(leftDf, rightDf, "k", "ts", "rts", Seq("price"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // union-and-fill: hash-partitioned window, not a join at all
    assert(plan.contains("hashpartitioning(__k"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("rangeJoin: inclusive bounds, bucket-boundary straddling, no dup pairs") {
    val pts = Seq((1L, 0L, 10L), (1L, 15L, 11L), (1L, 30L, 12L), (2L, 15L, 13L))
      .toDF("k", "ts", "pid")
    val ivs = Seq((1L, 0L, 15L, 20L), (1L, 14L, 31L, 21L), (2L, 16L, 40L, 22L),
        (1L, 9L, 5L, 99L)) // inverted interval dropped
      .toDF("ik", "s", "e", "iid")
    // bucket width 4 forces every interval across several buckets
    val got = TemporalJoins.rangeJoin(pts, "k", "ts", ivs, "ik", "s", "e", 4L)
      .select("pid", "iid").as[(Long, Long)].collect().toList
    assert(got.size == got.toSet.size, s"duplicate pairs in $got")
    assert(got.toSet == Set((10L, 20L), (11L, 20L), (11L, 21L), (12L, 21L)))
  }

  test("rangeJoin ≡ naive between-join on random data; negative ts bucket correctly") {
    val rnd = new scala.util.Random(11)
    val pts = Seq.tabulate(250)(i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(200).toLong - 100L, i.toLong))
      .toDF("k", "ts", "pid")
    val ivs = Seq.tabulate(60) { i =>
      val s = rnd.nextInt(200).toLong - 100L
      (rnd.nextInt(4).toLong, s, s + rnd.nextInt(30).toLong, i.toLong)
    }.toDF("ik", "s", "e", "iid")
    val got = TemporalJoins.rangeJoin(pts, "k", "ts", ivs, "ik", "s", "e", 7L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = pts.join(ivs, pts("k") === ivs("ik") && pts("ts").between(ivs("s"), ivs("e")))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == naive)
  }

  test("rangeJoin: timestamps above 2^53 bucket exactly (integral div)") {
    // adjacent bucket indices up near 2^62 differ by 1 in a quotient far
    // beyond double precision — a float division path collapses them
    val base = (1L << 62) + 1L
    val pts = Seq((1L, base, 10L), (1L, base + 3L, 11L), (1L, base + 6L, 12L))
      .toDF("k", "ts", "pid")
    val ivs = Seq((1L, base, base + 1L, 20L), (1L, base + 3L, base + 4L, 21L),
      (1L, base + 5L, base + 7L, 22L)).toDF("ik", "s", "e", "iid")
    val got = TemporalJoins.rangeJoin(pts, "k", "ts", ivs, "ik", "s", "e", 3L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 20L), (11L, 21L), (12L, 22L)))
  }

  test("intervalOverlapJoin ≡ naive overlap join; pairs exactly once; negatives ok") {
    val rnd = new scala.util.Random(23)
    val l = Seq.tabulate(120) { i =>
      val s = rnd.nextInt(200).toLong - 100L
      (rnd.nextInt(4).toLong, s, s + rnd.nextInt(40).toLong, i.toLong)
    }.toDF("lk", "ls", "le", "lid")
    val r = Seq.tabulate(90) { i =>
      val s = rnd.nextInt(200).toLong - 100L
      (rnd.nextInt(4).toLong, s, s + rnd.nextInt(25).toLong, i.toLong)
    }.toDF("rk", "rs", "re", "rid")
    val got = TemporalJoins.intervalOverlapJoin(l, "lk", "ls", "le",
      r, "rk", "rs", "re", 7L)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    // exactly once: the multiset has no duplicates even for pairs spanning
    // many shared buckets
    assert(got.size == got.toSet.size, "duplicate pair emissions")
    val naive = l.join(r, l("lk") === r("rk") &&
        l("ls") <= r("re") && r("rs") <= l("le"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got.toSet == naive)
  }

  test("intervalOverlapJoin: degenerate intervals dropped, huge longs bucket exactly") {
    val base = (1L << 62) + 1L
    val l = Seq((1L, base, base + 5L, 1L), (1L, base + 10L, base + 4L, 2L))
      .toDF("lk", "ls", "le", "lid") // lid=2 degenerate (end < start)
    val r = Seq((1L, base + 3L, base + 8L, 10L), (1L, base + 6L, base + 9L, 11L))
      .toDF("rk", "rs", "re", "rid")
    val got = TemporalJoins.intervalOverlapJoin(l, "lk", "ls", "le",
      r, "rk", "rs", "re", 3L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L))) // [base, base+5] × [base+3, base+8] only
  }

  test("intervalOverlapJoin plan: equi-join on (key, bucket), no nested-loop") {
    val l = Seq((1L, 0L, 5L, 1L)).toDF("lk", "ls", "le", "lid")
    val r = Seq((1L, 3L, 8L, 10L)).toDF("rk", "rs", "re", "rid")
    val plan = TemporalJoins.intervalOverlapJoin(l, "lk", "ls", "le",
      r, "rk", "rs", "re", 7L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("rangeJoin plan: equi-join on (key, bucket), no nested-loop") {
    val pts = Seq((1L, 0L, 10L)).toDF("k", "ts", "pid")
    val ivs = Seq((1L, 0L, 15L, 20L)).toDF("ik", "s", "e", "iid")
    val plan = TemporalJoins.rangeJoin(pts, "k", "ts", ivs, "ik", "s", "e", 4L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Join"), plan)
  }
}
