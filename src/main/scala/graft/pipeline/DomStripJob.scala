package graft.pipeline

import graft.io.TableIO
import graft.model.LineageRow
import graft.segment.Dom

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The north-star HTML extraction stage as a resumable job over the
  * interleaved span table `(doc_id, spans array<struct<kind,text,media_ref,
  * offset>>, partition_id)`: text spans are DOM-tokenized and replaced with
  * their non-anchor node text (all-anchor spans dropped), media spans pass
  * through untouched, and every surviving span keeps its original offset so
  * `(doc_id, offset)` restores the interleaving — written with the same
  * per-partition commit contract as [[ExtractJob.runJob]] (dynamic
  * partition overwrite, one lineage row `(partition_id, docs_in, docs_out,
  * spans_out, wall_ms)` per committed partition, resume = left-anti join
  * against the lineage).
  *
  * Plan per batch: one posexplode + the zero-shuffle
  * [[Dom.stripInterleaved]]; the only exchange is the writer's. */
object DomStripJob {

  def runJob(spark: SparkSession, inputPath: String, outputPath: String,
      lineagePath: String, commitBatch: Int = 8): Seq[LineageRow] = {
    val input = spark.read.parquet(inputPath)
    val pending = TableIO.pendingPartitions(input, lineagePath)
    val all = scala.collection.mutable.ArrayBuffer.empty[LineageRow]
    pending.grouped(commitBatch).foreach { batch =>
      val t0 = System.nanoTime()
      val docs = input.filter(col("partition_id").isin(batch: _*))
      val rows = docs.select(col("doc_id"), col("partition_id"),
          explode(col("spans")).as("span"))
        .select(col("doc_id"), col("span.kind").as("kind"),
          col("span.text").as("text"), col("span.media_ref").as("media_ref"),
          col("span.offset").as("offset"), col("partition_id"))
      val outDf = Dom.stripInterleaved(rows, Seq("partition_id")).cache()
      TableIO.writePartitioned(outDf, outputPath)
      val stats = docs.groupBy("partition_id").agg(count(lit(1)).as("docs_in"))
        .join(outDf.groupBy("partition_id")
          .agg(countDistinct("doc_id").as("docs_out"),
            count(lit(1)).as("spans_out")),
          Seq("partition_id"), "left")
        .na.fill(0L, Seq("docs_out", "spans_out"))
        .collect()
      val wallMs = (System.nanoTime() - t0) / 1000000
      val lineage = stats.map(r => LineageRow(
        r.getAs[Int]("partition_id"), r.getAs[Long]("docs_in"),
        r.getAs[Long]("docs_out"), r.getAs[Long]("spans_out"), wallMs)).toSeq
      TableIO.appendLineage(spark, lineage, lineagePath)
      outDf.unpersist()
      all ++= lineage
    }
    all.toSeq
  }
}
