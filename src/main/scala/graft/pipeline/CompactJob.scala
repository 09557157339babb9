package graft.pipeline

import graft.io.TableIO
import graft.model.LineageRow

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction — the table-maintenance job a long-lived corpus
  * needs (the Iceberg `rewrite_data_files` shape): streaming appends and
  * per-batch commits leave `partition_id=N` directories full of KB-sized
  * parquet files, and at 100 TB the scan cost is then dominated by file
  * OPENS (footer reads, scheduling), not bytes. Rewrite each partition's
  * rows into ceil(bytes / targetBytes) files, content-identical.
  *
  * Same commit contract as every job here ([[ExtractJob.runJob]]):
  * data written with dynamic partition overwrite FIRST, lineage row
  * appended after — the lineage append is the commit marker, so a kill
  * between the two re-does that partition idempotently, and a rerun
  * processes exactly the partitions missing from the lineage (anti-join).
  * LineageRow mapping for this job: docs_in = files before, docs_out =
  * files after, spans_out = rows rewritten.
  *
  * Scale: each partition compacts independently (one `repartition(nOut)`
  * shuffle of just that partition's rows); nothing global, nothing
  * collected beyond one FileStatus listing per partition. Pacing is
  * driver-sequential per partition (the target-file-count differs per
  * partition, so each gets its own small job) — maintenance runs are
  * background work where this is the norm; parallelize across partitions
  * by running several compactors over disjoint partition ranges, each
  * with its own lineage path.
  */
object CompactJob {

  /** @return one lineage row per newly-compacted partition. */
  def runJob(spark: SparkSession, inputPath: String, outputPath: String,
      lineagePath: String, targetBytes: Long = 128L << 20,
      commitBatch: Int = 8): Seq[LineageRow] = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val input = spark.read.parquet(inputPath)
    require(input.columns.contains("partition_id"),
      s"$inputPath is not a partition_id-partitioned table")
    val fs = new Path(inputPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pending = TableIO.pendingPartitions(input, lineagePath)
    val all = scala.collection.mutable.ArrayBuffer.empty[LineageRow]
    pending.grouped(commitBatch).foreach { batch =>
      val t0 = System.nanoTime()
      val rows = batch.map { pid =>
        val dir = new Path(s"$inputPath/partition_id=$pid")
        val files = fs.listStatus(dir).filter { st =>
          val n = st.getPath.getName
          st.isFile && !n.startsWith("_") && !n.startsWith(".")
        }
        val bytesIn = files.map(_.getLen).sum
        val nOut = math.max(1L,
          (bytesIn + targetBytes - 1) / targetBytes).toInt
        val part = input.filter(col("partition_id") === pid)
          .repartition(nOut)
        // write before the lineage append — the commit contract
        TableIO.writePartitioned(
          part.withColumn("partition_id", lit(pid)), outputPath)
        val rowsOut = spark.read.parquet(outputPath)
          .filter(col("partition_id") === pid).count()
        val filesOut = fs.listStatus(
          new Path(s"$outputPath/partition_id=$pid")).count { st =>
          val n = st.getPath.getName
          st.isFile && !n.startsWith("_") && !n.startsWith(".")
        }
        LineageRow(pid, files.length.toLong, filesOut.toLong, rowsOut,
          (System.nanoTime() - t0) / 1000000)
      }
      TableIO.appendLineage(spark, rows, lineagePath)
      all ++= rows
    }
    all.toSeq
  }
}
