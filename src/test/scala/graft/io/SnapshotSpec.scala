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
}
