package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crawl-snapshot reconciliation: what changed between two corpus
  * snapshots keyed by canonical URL (or any stable doc key)? The
  * incremental-ingest planner runs on this — `added` and `changed` rows
  * feed re-extraction, `removed` rows feed tombstoning, `unchanged` rows
  * skip the pipeline entirely.
  *
  * Shape: ONE full-outer equi-join on the key — the canonical two-snapshot
  * reconciliation plan; both sides shuffle once on the key, fingerprint
  * compare is per-row. At 100 TB the key join is the only cost, and AQE
  * handles per-host skew. */
object Snapshot {

  /** (key, status, old_fp, new_fp) for every key present in either
    * snapshot; `status` ∈ added | removed | changed | unchanged. Null
    * fingerprints on present rows compare with null-safe equality (two
    * null fingerprints = unchanged). */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, keyCol: String,
      fpCol: String): DataFrame = {
    val o = oldSnap.select(col(keyCol).as("__key"),
      col(fpCol).as("old_fp"), lit(true).as("__in_old"))
    val n = newSnap.select(col(keyCol).as("__key"),
      col(fpCol).as("new_fp"), lit(true).as("__in_new"))
    o.join(n, Seq("__key"), "full_outer")
      .select(col("__key").as(keyCol),
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(col("old_fp") <=> col("new_fp"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        col("old_fp"), col("new_fp"))
  }

  /** Pure twin: key → (status, old_fp, new_fp). */
  def diffPure(oldSnap: Map[String, Option[Long]],
      newSnap: Map[String, Option[Long]])
      : Map[String, (String, Option[Long], Option[Long])] = {
    (oldSnap.keySet ++ newSnap.keySet).map { k =>
      val status = (oldSnap.get(k), newSnap.get(k)) match {
        case (None, Some(_)) => "added"
        case (Some(_), None) => "removed"
        case (Some(a), Some(b)) if a == b => "unchanged"
        case _ => "changed"
      }
      k -> (status, oldSnap.get(k).flatten, newSnap.get(k).flatten)
    }.toMap
  }
}
