package graft.io

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SnapshotSpec extends SparkTestBase {
  import spark.implicits._

  test("diff: added/removed/changed/unchanged, null-safe fingerprints") {
    val oldSnap = Seq(
      ("a", Some(1L)), ("b", Some(2L)), ("c", Some(3L)),
      ("n", Option.empty[Long])).toDF("url", "fp")
    val newSnap = Seq(
      ("b", Some(2L)), ("c", Some(30L)), ("d", Some(4L)),
      ("n", Option.empty[Long])).toDF("url", "fp")
    val got = Snapshot.diff(oldSnap, newSnap, "url", "fp")
      .as[(String, String, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val pure = Snapshot.diffPure(
      Map("a" -> Some(1L), "b" -> Some(2L), "c" -> Some(3L), "n" -> None),
      Map("b" -> Some(2L), "c" -> Some(30L), "d" -> Some(4L), "n" -> None))
    assert(got == pure)
    assert(got("a")._1 == "removed" && got("b")._1 == "unchanged" &&
      got("c")._1 == "changed" && got("d")._1 == "added" &&
      got("n")._1 == "unchanged") // null <=> null
  }

  test("plan: one full-outer key join, no cartesian") {
    val a = (1L to 50L).map(i => (s"u$i", i)).toDF("url", "fp")
    val b = (25L to 75L).map(i => (s"u$i", i * 2)).toDF("url", "fp")
    val plan = Snapshot.diff(a, b, "url", "fp")
      .queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter") && !plan.contains("Cartesian"), plan)
  }

  // ------------------------------------------------------- SCD2 merge -----

  private val corpus = Seq(
    // key, fp, valid_from, valid_to (None = open)
    ("a", 10L, 1L, None),          // unchanged in increment
    ("b", 20L, 1L, None),          // changed in increment
    ("c", 30L, 1L, None),          // missing from increment
    ("b", 19L, 0L, Some(1L)),      // closed history — must pass through
    ("z", 99L, 0L, Some(1L)))      // closed history, key absent everywhere
  private val inc = Map("a" -> 10L, "b" -> 21L, "d" -> 40L)

  private def corpusDf = corpus
    .map { case (k, fp, f, t) => (k, fp, f, t.map(Long.box).orNull) }
    .toDF("url", "fp", "valid_from", "valid_to")
  private def incDf = inc.toSeq.toDF("url", "fp")

  test("scd2 merge: insert/change/keep/history semantics ≡ pure twin") {
    for (closeMissing <- Seq(false, true)) {
      val got = Snapshot.scd2Merge(corpusDf, incDf, "url", "fp", 2L, closeMissing)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
      val exp = Snapshot.scd2MergePure(corpus, inc, 2L, closeMissing)
      assert(got.sorted == exp.sorted, s"closeMissing=$closeMissing")
      // exactly one open row per live key
      val openPerKey = got.filter(_._4.isEmpty).groupBy(_._1).view.mapValues(_.size)
      assert(openPerKey.values.forall(_ == 1))
      // the changed key carries full history: closed at 1, closed at 2, open at 2
      assert(got.filter(_._1 == "b").sortBy(r => (r._3, r._4.getOrElse(Long.MaxValue))) ==
        Seq(("b", 19L, 0L, Some(1L)), ("b", 20L, 1L, Some(2L)), ("b", 21L, 2L, None)))
      // the missing key closes only under closeMissing
      assert(got.contains(("c", 30L, 1L, if (closeMissing) Some(2L) else None)))
      // inserts open at the new snapshot
      assert(got.contains(("d", 40L, 2L, None)))
    }
  }

  test("scd2 merge: history branch never joins; merge is idempotent on no-ops") {
    // Catalyst narrows the full-outer to one-sided outers per union branch
    // (the null-side filters make that legal) — assert only the shape that
    // matters: key equi-joins, no cartesian
    val plan = Snapshot.scd2Merge(corpusDf, incDf, "url", "fp", 2L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Join") && !plan.contains("Cartesian"), plan)
    // re-merging the SAME increment at the next snapshot changes nothing
    // (all fingerprints now match open rows; d is open too)
    val once = Snapshot.scd2Merge(corpusDf, incDf, "url", "fp", 2L)
    val twice = Snapshot.scd2Merge(once, incDf, "url", "fp", 3L)
    assert(twice.collect().map(_.toSeq).toSet == once.collect().map(_.toSeq).toSet)
  }

  test("scd2 asOf: each snapshot reads exactly its own state") {
    val merged = Snapshot.scd2Merge(corpusDf, incDf, "url", "fp", 2L)
    def state(id: Long): Map[String, Long] =
      Snapshot.asOf(merged, id).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    // at 0: only the history rows were live
    assert(state(0L) == Map("b" -> 19L, "z" -> 99L))
    // at 1: the pre-merge open corpus
    assert(state(1L) == Map("a" -> 10L, "b" -> 20L, "c" -> 30L))
    // at 2: the post-merge state (b changed, d inserted)
    assert(state(2L) == Map("a" -> 10L, "b" -> 21L, "c" -> 30L, "d" -> 40L))
  }
}
