package graft.pipeline

import graft.dedup.Dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level near-duplicate JOB entry points: the dedup operators with the
  * skew levers ON by default and every dropped hot key logged.
  *
  * The operators in [[graft.dedup.Dedup]] default their caps OFF so the
  * oracle-parity contract queries replay bit-for-bit in DuckDB; that default
  * is wrong for a production corpus, where one viral shingle (a boilerplate
  * sentence shared by millions of pages) or one hot band bucket (every empty
  * doc fingerprints to 0) degrades the candidate join to O(n²). Anything
  * job-sized goes through here, where the caps are on unless explicitly
  * disabled and the drop counts are visible in the driver log — silent
  * truncation would read as "covered everything" when it didn't.
  */
object DedupJob {

  /** Default skew caps. `maxDf`: shingles appearing in more docs than this
    * are dropped from candidate generation and verification (a shingle
    * shared by >10k docs is boilerplate, not evidence of duplication).
    * `maxBucket`: LSH band buckets holding more docs than this are skipped
    * for candidate enumeration (pairs stay reachable through their other
    * bands; a whole dropped fingerprint group is exact-dup territory). */
  final case class Caps(maxDf: Int = 10000, maxBucket: Int = 10000)

  /** What the caps dropped, returned alongside the pairs and logged. */
  final case class DropReport(hot_shingles: Long, hot_buckets: Long)

  private def info(msg: String): Unit = println(s"[graft] $msg")

  /** MinHash/LSH near-dup with caps on. `report = true` (default) runs a
    * counting pre-pass over the hot-key relations so the log states exactly
    * what was dropped; pass `report = false` to skip the extra scans when
    * the job is latency-bound and the caps alone suffice. */
  def minhashNearDuplicates(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 32, bands: Int = 8, minJ: Double = 0.5,
      caps: Caps = Caps(), report: Boolean = true): (DataFrame, DropReport) = {
    val drops = if (!report) DropReport(-1, -1) else {
      val hotShingles = Dedup.shingleRows(df, idCol, textCol, n).distinct()
        .groupBy("sh").agg(countDistinct(col(idCol)).as("df"))
        .filter(col("df") > caps.maxDf).count()
      val hotBuckets = Dedup.minhashBandRows(df, idCol, textCol, n, k, bands)
        .groupBy("band").agg(count(lit(1)).as("n"))
        .filter(col("n") > caps.maxBucket).count()
      info(s"minhash dedup: dropping $hotShingles hot shingles (df > ${caps.maxDf}) " +
        s"and $hotBuckets hot band buckets (> ${caps.maxBucket} docs)")
      DropReport(hotShingles, hotBuckets)
    }
    (Dedup.minhashDuplicates(df, idCol, textCol, n, k, bands, minJ,
      maxDf = caps.maxDf, maxBucket = caps.maxBucket), drops)
  }

  /** SimHash near-dup with the hot-band cap on. */
  def simhashNearDuplicates(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, caps: Caps = Caps(),
      report: Boolean = true): (DataFrame, DropReport) = {
    val drops = if (!report) DropReport(-1, -1) else {
      val hotBuckets = Dedup.simhashBandRows(df, idCol, textCol)
        .groupBy("band").agg(count(lit(1)).as("n"))
        .filter(col("n") > caps.maxBucket).count()
      info(s"simhash dedup: dropping $hotBuckets hot band buckets " +
        s"(> ${caps.maxBucket} docs)")
      DropReport(0, hotBuckets)
    }
    (Dedup.simhashDuplicates(df, idCol, textCol, maxHamming,
      maxBucket = caps.maxBucket), drops)
  }

  /** Exact n-gram Jaccard pairs with the viral-shingle cap on. */
  def jaccardNearDuplicates(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minJ: Double = 0.5, caps: Caps = Caps(),
      report: Boolean = true): (DataFrame, DropReport) = {
    val drops = if (!report) DropReport(-1, -1) else {
      val hotShingles = Dedup.shingleRows(df, idCol, textCol, n).distinct()
        .groupBy("sh").agg(countDistinct(col(idCol)).as("df"))
        .filter(col("df") > caps.maxDf).count()
      info(s"jaccard dedup: dropping $hotShingles hot shingles (df > ${caps.maxDf})")
      DropReport(hotShingles, 0)
    }
    (Dedup.jaccardPairs(df, idCol, textCol, n, minJ, maxDf = caps.maxDf), drops)
  }

  /** Day-over-day incremental near-dup with PERSISTED band-table state —
    * the job shape a rolling crawl actually runs. The corpus table carries a
    * `snapshot` column; each invocation processes ONE snapshot:
    *
    *  1. already committed (its bands partition exists) → no-op, return 0;
    *  2. otherwise band the new snapshot only, pair it against the
    *     accumulated band table ([[Dedup.minhashIncrementalDuplicates]] —
    *     the old corpus is never re-paired, verification text is semi-join
    *     pruned to candidates);
    *  3. write the pairs to `outDir/snapshot=<id>` (dynamic overwrite →
    *     rerun-safe), THEN commit the snapshot's bands into
    *     `stateDir/snapshot=<id>` — bands-last ordering makes the bands
    *     partition the commit marker, so a kill between the writes replays
    *     the pairs write idempotently on rerun.
    *
    * Invariant (DedupJobSpec): after snapshots s1..sn run in order, the
    * UNION of all pair partitions equals the batch [[Dedup.minhashDuplicates]]
    * over the whole corpus — each pair is emitted exactly once, by the
    * snapshot that completed it.
    *
    * `maxBucket` verdicts are per-run (counted over state ∪ increment), so
    * a bucket that goes hot in snapshot 7 is capped from snapshot 7 onward —
    * earlier snapshots' emitted pairs are immutable, as they must be. */
  def runIncremental(corpus: DataFrame, idCol: String, textCol: String,
      snapshotCol: String, snapshotId: String, stateDir: String,
      outDir: String, n: Int = 3, k: Int = 32, bands: Int = 8,
      minJ: Double = 0.5, maxBucket: Int = 10000): Long = {
    val spark = corpus.sparkSession
    val newDocs = corpus.filter(col(snapshotCol) === snapshotId)
      .select(col(idCol), col(textCol))
    val emptyBands =
      Dedup.minhashBandRows(newDocs.limit(0), idCol, textCol, n, k, bands)
    // a kill inside the very first state write leaves the directory present
    // but with no committed data files — path existence alone is NOT the
    // marker; an unreadable/empty state means "nothing committed yet"
    val (oldBands, committed) =
      if (!graft.io.TableIO.exists(spark, stateDir)) (emptyBands, Set.empty[String])
      else try {
        val st = spark.read.parquet(stateDir)
        val snaps = st.select(col("snapshot").cast("string")).distinct()
          .collect().map(_.getString(0)).toSet
        (st.select(col(idCol), col("band")), snaps)
      } catch {
        case _: org.apache.spark.sql.AnalysisException =>
          (emptyBands, Set.empty[String])
      }
    if (committed.contains(snapshotId)) {
      info(s"incremental dedup: snapshot $snapshotId already committed — no-op")
      return 0L
    }
    val oldDocs = corpus
      .filter(col(snapshotCol).cast("string").isin(committed.toSeq: _*))
      .select(col(idCol), col(textCol))
    // band the increment ONCE: the same relation feeds candidate
    // generation and the state commit
    val newBands = Dedup.minhashBandRows(newDocs, idCol, textCol, n, k, bands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.io.Persisted.track(newBands)
    try {
      val pairs = Dedup.minhashIncrementalDuplicates(oldBands, oldDocs, newDocs,
        idCol, textCol, n, k, bands, minJ, maxBucket, newBands = Some(newBands))
        .withColumn("snapshot", lit(snapshotId))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      graft.io.Persisted.track(pairs)
      val emitted = pairs.count()
      // an empty write would commit no data files (nothing to overwrite and
      // nothing stale to replace — a killed attempt leaves only _temporary)
      if (emitted > 0)
        pairs.write.partitionBy("snapshot")
          .option("partitionOverwriteMode", "dynamic")
          .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(outDir)
      pairs.unpersist(blocking = false)
      // commit marker: the snapshot's bands join the state LAST
      newBands.withColumn("snapshot", lit(snapshotId))
        .write.partitionBy("snapshot")
        .option("partitionOverwriteMode", "dynamic")
        .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(stateDir)
      info(s"incremental dedup: snapshot $snapshotId committed — " +
        s"$emitted pairs, state now has ${committed.size + 1} snapshots")
      emitted
    } finally newBands.unpersist(blocking = false)
  }
}
