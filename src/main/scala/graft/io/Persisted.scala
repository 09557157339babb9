package graft.io

import org.apache.spark.sql.{Dataset, SparkSession}

import scala.collection.mutable

/** Session-scoped registry of the relations graft operators leave persisted
  * for the caller's action.
  *
  * The LSH/clustering operators ([[graft.dedup.Dedup.jaccardPairs]],
  * [[graft.dedup.Dedup.minhashDuplicates]],
  * [[graft.dedup.Dedup.simhashDuplicates]],
  * [[graft.dedup.Dedup.connectedComponents]],
  * [[graft.sim.Similarity.rhpNearDupPairs]]) persist an internal relation
  * that feeds several branches of the ONE plan they return — they cannot
  * unpersist before the caller materializes that plan, or the expensive
  * scan would recompute per branch. The session CacheManager holds such
  * caches until explicitly released, so a long-lived session that runs many
  * operators would accumulate them. `spark.catalog.clearCache()` works but
  * also evicts the caller's own caches.
  *
  * This registry is the precise lever: operators [[track]] what they
  * persist, and callers release exactly that — nothing else — via
  * [[release]] or the scoped [[unpersistAfter]].
  */
object Persisted {
  private val reg = mutable.Map.empty[SparkSession, mutable.Buffer[Dataset[_]]]

  /** Drop dead entries so the registry stays bounded even for callers that
    * never call [[release]]: datasets already evicted some other way (an
    * operator's own early unpersist, a blanket `clearCache()` — still a
    * sanctioned release path) and sessions that have been stopped. Runs
    * inside every [[track]]/[[trackedCount]]; without it the strong
    * references here would pin plans (and stopped sessions) for the JVM
    * lifetime. Caller must hold the monitor. */
  private def prune(): Unit = {
    reg.filterInPlace { (s, buf) =>
      if (s.sparkContext.isStopped) false
      else {
        val live = buf.filter(_.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
        buf.clear(); buf ++= live
        buf.nonEmpty
      }
    }
  }

  /** Register a dataset an operator leaves persisted for the caller's
    * action. Returns it unchanged. */
  private[graft] def track[T](ds: Dataset[T]): Dataset[T] = synchronized {
    prune()
    reg.getOrElseUpdate(ds.sparkSession, mutable.Buffer.empty) += ds
    ds
  }

  /** Number of tracked (not yet released, still-cached) relations for this
    * session. */
  def trackedCount(spark: SparkSession): Int =
    synchronized { prune(); reg.get(spark).map(_.size).getOrElse(0) }

  /** Unpersist every operator-persisted relation of this session and clear
    * the registry. Idempotent — already-unpersisted datasets no-op — and it
    * leaves the caller's own caches alone. */
  def release(spark: SparkSession): Unit = {
    val tracked = synchronized { reg.remove(spark) }
    tracked.foreach(_.foreach(_.unpersist(blocking = false)))
  }

  /** Run `action`, then [[release]] this session's operator caches (those
    * persisted during the action plus any still tracked from before — the
    * intended use is one scope per materialization). */
  def unpersistAfter[T](spark: SparkSession)(action: => T): T =
    try action finally release(spark)
}
