package graft.pipeline

import graft.io.TableIO
import graft.model.LineageRow

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Takedown processing — the deletion job a long-lived training corpus
  * legally needs (GDPR erasure, DMCA, opt-out lists): remove every
  * document whose id appears in a delete-list table from a
  * `partition_id`-partitioned corpus. At 100 TB the delete list is a few
  * thousand ids against billions of docs; a naive anti-join rewrite is a
  * full-corpus write. This job is the partition-granular copy-on-write
  * shape (Iceberg's COW rewrite): ONLY the partitions that still hold a
  * listed document are rewritten — into an OVERLAY table, and
  * [[TakedownJob.readWithOverlay]] serves the corpus as
  * (base minus COMMITTED partitions) ∪ (overlay restricted to committed
  * partitions). The base table's bytes are never touched, so the job
  * composes with snapshotting/time travel and avoids Spark's (correct)
  * refusal to overwrite a path it is reading.
  *
  * The LINEAGE is the commit marker AND the serving filter: a partition
  * switches from base to overlay exactly when its lineage row lands, so
  * a kill between data write and lineage append leaves the reader on
  * the consistent base copy and the rerun re-does that partition — and a
  * partition whose docs are ALL deleted (overlay writes zero files) is
  * still excluded from the base, because exclusion keys on the lineage,
  * not on overlay directory listings.
  *
  * Affected partitions are computed from the CURRENT SERVED VIEW (base +
  * committed overlay), with ONE column-pruned scan (id + partition
  * column only) semi-joined against the BROADCAST delete list. That
  * makes every run self-healing: a finished run finds zero affected
  * partitions (natural no-op resume); a GROWN delete list re-affects
  * exactly the committed partitions whose overlay copy still holds a
  * newly-listed doc, and the rewrite source is the served view, so
  * earlier deletions are preserved. The append-only lineage doubles as
  * the audit history (docs_in = rows before, docs_out = rows kept,
  * spans_out = rows deleted, per partition per run).
  *
  * One deliberate ordering exception: a partition whose EVERY remaining
  * doc is deleted commits its audit row BEFORE dropping the stale
  * overlay dir (dynamic overwrite of an empty frame touches nothing).
  * A kill in that window leaves the old files serving until the next
  * run re-finds and re-deletes them (self-healing); the opposite order
  * would apply the deletion with a permanent gap in the legal record.
  * The drop itself is checked — a failed delete aborts the run rather
  * than leaving the audit claiming a deletion the overlay still serves.
  */
object TakedownJob {

  /** @param deletesPath parquet with one `idCol` column — the delete list
    * @param overlayPath output overlay table (rewritten partitions only)
    * @return one lineage row per partition rewritten this run */
  def runJob(spark: SparkSession, corpusPath: String, deletesPath: String,
      overlayPath: String, lineagePath: String, idCol: String = "doc_id",
      commitBatch: Int = 8): Seq[LineageRow] = {
    val base = spark.read.parquet(corpusPath)
    require(base.columns.contains("partition_id"),
      s"$corpusPath is not a partition_id-partitioned table")
    require(base.columns.contains(idCol), s"$corpusPath lacks $idCol")
    val deletes = broadcast(
      spark.read.parquet(deletesPath).select(col(idCol)).distinct())
    val view = readWithOverlay(spark, corpusPath, overlayPath, lineagePath)
    // column-pruned affected-partition scan over the SERVED view — a
    // finished run matches nothing (resume), a grown list re-affects
    // committed partitions whose overlay copy still holds a listed doc
    val pending = view.select(col(idCol), col("partition_id"))
      .join(deletes, Seq(idCol), "left_semi")
      .select(col("partition_id").cast("int")).distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    val all = scala.collection.mutable.ArrayBuffer.empty[LineageRow]
    val liveRdds = spark.sparkContext.getPersistentRDDs.keySet
    val overlayRoot = new org.apache.hadoop.fs.Path(overlayPath)
    val fs = overlayRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    pending.grouped(commitBatch).foreach { batch =>
      val rows = batch.map { pid =>
        // t0 INSIDE the per-partition map: each audit row's wall_ms
        // measures only ITS partition's rewrite (taken once per batch it
        // would accumulate every earlier partition's time — a misleading
        // legal record for batches > 1)
        val t0 = System.nanoTime()
        val part = view.filter(col("partition_id") === pid)
        val before = part.count()
        // localCheckpoint, not persist(): a grown-list rerun READS this
        // partition through the overlay path and then dynamically
        // OVERWRITES the same path — persist() leaves the read-overwrite
        // cycle intact if a cache block is lost and recomputed during the
        // overwrite's commit window; the checkpoint truncates lineage so
        // the write never re-reads its own source files
        val kept = part.join(deletes, Seq(idCol), "left_anti")
          .localCheckpoint(true)
        val keptCnt = kept.count()
        val partDir = new org.apache.hadoop.fs.Path(
          s"$overlayPath/partition_id=$pid")
        val row = LineageRow(pid, before, keptCnt, before - keptCnt,
          (System.nanoTime() - t0) / 1000000)
        if (keptCnt == 0) {
          // dynamic overwrite of an EMPTY frame touches nothing, so the
          // stale overlay dir must be dropped explicitly. AUDIT-FIRST
          // here: commit the lineage row, then delete — a kill between
          // the two leaves the stale files serving briefly, but the next
          // run's affected-scan re-finds and re-deletes them (self-
          // healing), whereas delete-first would apply the deletion with
          // a permanent gap in the legal audit history. The delete must
          // succeed or the run aborts (an unchecked failure would leave
          // the audit claiming a deletion the overlay still serves).
          TableIO.appendLineage(spark, Seq(row), lineagePath)
          if (fs.exists(partDir))
            require(fs.delete(partDir, true),
              s"takedown: failed to delete stale overlay dir $partDir")
        } else {
          // write before the lineage append — the commit contract (the
          // batched append below is the commit marker); `after` is the
          // counted keptCnt — the persisted frame that was written, no
          // extra read-back pass
          TableIO.writePartitioned(
            kept.withColumn("partition_id", lit(pid)), overlayPath)
        }
        (row, keptCnt == 0)
      }
      TableIO.appendLineage(spark,
        rows.filterNot(_._2).map(_._1), lineagePath)
      // drop ONLY the checkpoint blocks this batch created (a blanket
      // clearCache would clobber a host application's caches); without
      // this a long run holds every batch's checkpointed partitions in
      // executor storage until the ContextCleaner happens to run
      val batchRdds = spark.sparkContext.getPersistentRDDs.keySet -- liveRdds
      spark.sparkContext.getPersistentRDDs
        .filter { case (id, _) => batchRdds.contains(id) }
        .values.foreach(_.unpersist(blocking = false))
      all ++= rows.map(_._1)
    }
    all.toSeq
  }

  /** Below this many committed partitions the read uses literal `isin`
    * filters (static directory pruning at planning time); above it the
    * plan switches to broadcast joins on the lineage relation — a
    * 10^5-10^6-partition real table would otherwise carry a giant In-list
    * in the plan and pay its planning-time cost. */
  val IsinPruneMax: Int = 1000

  /** Serve the post-takedown corpus: base partitions without a committed
    * lineage row, union the overlay restricted to COMMITTED partitions.
    * Keying both sides on the lineage keeps the read consistent through
    * every failure window (un-committed overlay files are ignored, and a
    * fully-deleted partition disappears even though the overlay holds no
    * files for it).
    *
    * Pruning strategy is size-dependent: up to [[IsinPruneMax]] committed
    * partitions, literal `isin` filters prune base directories at
    * planning time (the few-thousand-takedowns common case); past that
    * the committed set stays distributed and both sides become broadcast
    * lineage joins (anti on base, semi on overlay) — no driver
    * collect, no In-list, scale-independent plan size. */
  def readWithOverlay(spark: SparkSession, corpusPath: String,
      overlayPath: String, lineagePath: String,
      isinPruneMax: Int = IsinPruneMax): DataFrame = {
    val base = spark.read.parquet(corpusPath)
    if (!TableIO.exists(spark, lineagePath)) return base
    val committedDf = TableIO.readLineage(spark, lineagePath).toDF()
      .select(col("partition_id").cast("int").as("partition_id")).distinct()
    // bounded peek: collect at most isinPruneMax+1 ids to pick the form
    val head = committedDf.limit(isinPruneMax + 1)
      .collect().map(_.getInt(0)).toSeq
    if (head.isEmpty) return base
    val small = head.size <= isinPruneMax
    val kept =
      if (small) base.filter(!col("partition_id").isin(head: _*))
      else base.join(broadcast(committedDf), Seq("partition_id"), "left_anti")
    // an overlay whose every rewrite was a full deletion holds no
    // partition dirs at all — reading it would fail schema inference
    val p = new org.apache.hadoop.fs.Path(overlayPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasData = fs.exists(p) && fs.listStatus(p)
      .exists(_.getPath.getName.startsWith("partition_id="))
    if (!hasData) kept
    else {
      val overlay = spark.read.parquet(overlayPath)
      val committedOverlay =
        if (small) overlay.filter(col("partition_id").isin(head: _*))
        else overlay.join(broadcast(committedDf), Seq("partition_id"), "left_semi")
      kept.unionByName(committedOverlay)
    }
  }
}
