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

  /** SCD-Type-2 merge of a crawl increment into the versioned corpus
    * dimension — the MERGE INTO an Iceberg-style corpus table needs for
    * incremental maintenance with full history (when did this URL's
    * content change?), expressed as a plain plan any engine runs:
    *
    *  - history rows (valid_to set) pass through UNTOUCHED and never join;
    *  - open rows (valid_to null) full-outer-join the increment on the key:
    *      · same fingerprint (null-safe)  → stay open as-is,
    *      · different fingerprint         → close at `snapshotId` + insert
    *                                        a new open row,
    *      · key only in increment         → insert a new open row,
    *      · key only in corpus            → stays open unless
    *                                        `closeMissing` (absence in a
    *                                        PARTIAL crawl is not deletion —
    *                                        that default matters);
    *
    * exactly one open row per key is preserved as an invariant. Plan: the
    * ONE key-equi full-outer join (both sides shuffle once), history is a
    * scan-only union branch — at 100 TB the untouched history never moves.
    *
    * Input/output schema: (key, fp, valid_from, valid_to) with null
    * valid_to = open; the increment is (key, fp). */
  def scd2Merge(corpus: DataFrame, increment: DataFrame, keyCol: String,
      fpCol: String, snapshotId: Long,
      closeMissing: Boolean = false): DataFrame = {
    val history = corpus.filter(col("valid_to").isNotNull)
      .select(col(keyCol), col(fpCol), col("valid_from"), col("valid_to"))
    val open = corpus.filter(col("valid_to").isNull)
      .select(col(keyCol).as("__key"), col(fpCol).as("__ofp"),
        col("valid_from").as("__ofrom"), lit(true).as("__in_old"))
    val inc = increment
      .select(col(keyCol).as("__key"), col(fpCol).as("__nfp"),
        lit(true).as("__in_new"))
    val joined = open.join(inc, Seq("__key"), "full_outer")
    val changed = col("__in_old").isNotNull && col("__in_new").isNotNull &&
      !(col("__ofp") <=> col("__nfp"))
    // the surviving/closing version of the OLD row
    val oldRows = joined.filter(col("__in_old").isNotNull)
      .select(col("__key").as(keyCol), col("__ofp").as(fpCol),
        col("__ofrom").as("valid_from"),
        when(changed || (lit(closeMissing) && col("__in_new").isNull),
          lit(snapshotId)).otherwise(lit(null).cast("long")).as("valid_to"))
    // the NEW open row for inserts and changes
    val newRows = joined.filter(col("__in_new").isNotNull &&
        (col("__in_old").isNull || changed))
      .select(col("__key").as(keyCol), col("__nfp").as(fpCol),
        lit(snapshotId).as("valid_from"),
        lit(null).cast("long").as("valid_to"))
    history.unionByName(oldRows).unionByName(newRows)
  }

  /** Time-travel read over an SCD2 table: the rows valid AT `snapshotId`
    * — `valid_from <= id AND (valid_to IS NULL OR valid_to > id)`. A pure
    * scan filter: with the table laid out / partitioned by `valid_from`,
    * both predicates push down to row-group pruning, so reading an old
    * snapshot never scans versions written after it. */
  def asOf(scd2: DataFrame, snapshotId: Long): DataFrame =
    scd2.filter(col("valid_from") <= snapshotId &&
      (col("valid_to").isNull || col("valid_to") > snapshotId))

  /** Pure twin of [[scd2Merge]]: rows as (key, fp, from, toOpt). */
  def scd2MergePure(corpus: Seq[(String, Long, Long, Option[Long])],
      increment: Map[String, Long], snapshotId: Long,
      closeMissing: Boolean = false): Seq[(String, Long, Long, Option[Long])] = {
    val history = corpus.filter(_._4.isDefined)
    val open = corpus.filter(_._4.isEmpty)
    val openKeys = open.map(_._1).toSet
    val oldRows = open.map { case (k, fp, from, _) =>
      increment.get(k) match {
        case Some(nfp) if nfp != fp => (k, fp, from, Some(snapshotId))
        case Some(_) => (k, fp, from, None)
        case None =>
          (k, fp, from, if (closeMissing) Some(snapshotId) else None)
      }
    }
    val changedOrNew = increment.toSeq.collect {
      case (k, nfp) if !openKeys.contains(k) ||
          open.exists(o => o._1 == k && o._2 != nfp) =>
        (k, nfp, snapshotId, None)
    }
    history ++ oldRows ++ changedOrNew
  }
}
