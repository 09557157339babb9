package graft.pipeline

import graft.io.TableIO
import graft.model.LineageRow

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Takedown processing — the deletion job a long-lived training corpus
  * legally needs (GDPR erasure, DMCA, opt-out lists): remove every
  * document whose id appears in a delete-list table from a
  * `partition_id`-partitioned corpus. At 100 TB the delete list is a few
  * thousand ids against billions of docs; a naive anti-join rewrite is a
  * full-corpus write. This job is the partition-granular copy-on-write
  * shape (Iceberg's COW rewrite): ONLY the partitions that actually hold
  * a listed document are rewritten — into an OVERLAY table, and
  * [[TakedownJob.readWithOverlay]] serves the corpus as
  * (base minus overlaid partitions) ∪ overlay. The base table's bytes
  * are never touched, so the job composes with snapshotting/time travel
  * and avoids Spark's (correct) refusal to overwrite a path it is
  * reading.
  *
  * Affected partitions come from ONE column-pruned scan (id + partition
  * column only — parquet never materializes text/spans for it)
  * semi-joined against the BROADCAST delete list.
  *
  * Same commit contract as every job here ([[ExtractJob.runJob]]): data
  * written FIRST, lineage appended after — the lineage append is the
  * commit marker. A kill between the two re-does that partition
  * idempotently; a rerun processes exactly the affected partitions
  * missing from the lineage. The lineage doubles as the audit log every
  * takedown process must keep (docs_in = rows before, docs_out = rows
  * kept, spans_out = rows deleted, per partition).
  */
object TakedownJob {

  /** @param deletesPath parquet with one `idCol` column — the delete list
    * @param overlayPath output overlay table (rewritten partitions only)
    * @return one lineage row per partition rewritten this run */
  def runJob(spark: SparkSession, corpusPath: String, deletesPath: String,
      overlayPath: String, lineagePath: String, idCol: String = "doc_id",
      commitBatch: Int = 8): Seq[LineageRow] = {
    val corpus = spark.read.parquet(corpusPath)
    require(corpus.columns.contains("partition_id"),
      s"$corpusPath is not a partition_id-partitioned table")
    require(corpus.columns.contains(idCol), s"$corpusPath lacks $idCol")
    val deletes = broadcast(
      spark.read.parquet(deletesPath).select(col(idCol)).distinct())
    // column-pruned affected-partition scan + resume anti-join
    val affectedDf = corpus.select(col(idCol), col("partition_id"))
      .join(deletes, Seq(idCol), "left_semi")
    val pending = TableIO.pendingPartitions(affectedDf, lineagePath)
    val all = scala.collection.mutable.ArrayBuffer.empty[LineageRow]
    pending.grouped(commitBatch).foreach { batch =>
      val t0 = System.nanoTime()
      val rows = batch.map { pid =>
        val part = corpus.filter(col("partition_id") === pid)
        val before = part.count()
        val kept = part.join(deletes, Seq(idCol), "left_anti")
        // write before the lineage append — the commit contract
        TableIO.writePartitioned(
          kept.withColumn("partition_id", lit(pid)), overlayPath)
        val after = spark.read.parquet(overlayPath)
          .filter(col("partition_id") === pid).count()
        LineageRow(pid, before, after, before - after,
          (System.nanoTime() - t0) / 1000000)
      }
      TableIO.appendLineage(spark, rows, lineagePath)
      all ++= rows
    }
    all.toSeq
  }

  /** Serve the post-takedown corpus: base partitions NOT in the overlay,
    * union the overlay's rewritten partitions. The `isin` filter on the
    * partition column prunes the base scan at planning time — overlaid
    * directories are never opened. Overlay partition ids come from one
    * filesystem listing (no data read). */
  def readWithOverlay(spark: SparkSession, corpusPath: String,
      overlayPath: String): DataFrame = {
    val base = spark.read.parquet(corpusPath)
    if (!TableIO.exists(spark, overlayPath)) return base
    val p = new Path(overlayPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pids = fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("partition_id="))
      .map(_.stripPrefix("partition_id=").toInt)
    if (pids.isEmpty) base
    else base.filter(!col("partition_id").isin(pids: _*))
      .unionByName(spark.read.parquet(overlayPath))
  }
}
