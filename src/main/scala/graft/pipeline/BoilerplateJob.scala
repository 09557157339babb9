package graft.pipeline

import graft.classify.Boilerplate
import graft.io.TableIO
import graft.model.LineageRow

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The north-star boilerplate-strip stage as a resumable job, with the same
  * commit contract as [[ExtractJob.runJob]]: partitions are processed in
  * batches, output written with dynamic partition overwrite, a lineage row
  * `(partition_id, docs_in, docs_out, spans_out, wall_ms)` appended per
  * committed partition, and a rerun processes exactly the partitions missing
  * from the lineage (left-anti join). Input: a raw `(doc_id, text)` table;
  * a `partition_id` column is honored if present, else derived
  * deterministically from `hash(doc_id)` so resume is stable across runs.
  */
object BoilerplateJob {

  def withPartitions(df: DataFrame, nPartitions: Int): DataFrame =
    if (df.columns.contains("partition_id")) df
    else df.withColumn("partition_id",
      pmod(hash(col("doc_id")), lit(nPartitions)).cast("int"))

  def runJob(spark: SparkSession, inputPath: String, outputPath: String,
      lineagePath: String, nPartitions: Int = 32, commitBatch: Int = 8): Seq[LineageRow] = {
    val input = withPartitions(spark.read.parquet(inputPath), nPartitions)
    val pending = TableIO.pendingPartitions(input, lineagePath)
    val all = scala.collection.mutable.ArrayBuffer.empty[LineageRow]
    import spark.implicits._
    pending.grouped(commitBatch).foreach { batch =>
      val t0 = System.nanoTime()
      val docs = input.filter(col("partition_id").isin(batch: _*))
      // typed per-partition classification — narrow and zero-shuffle like
      // the EP1 kernel (the declarative contentSpansDf twin pays a doc_id
      // window shuffle for the offset renumbering; the pure form computes
      // offsets per doc in place). Pure ≡ Column is asserted in
      // BoilerplateSpec, so the two paths cannot drift.
      val spans = docs.select(col("doc_id"), col("partition_id"), col("text"))
        .as[(String, Int, String)]
        .mapPartitions(_.flatMap { case (id, pid, text) =>
          Boilerplate.contentSpans(text).map(s =>
            (id, s.kind, s.text, s.media_ref, s.offset, pid))
        }).toDF("doc_id", "kind", "text", "media_ref", "offset", "partition_id")
      val outDf = spans.cache()
      TableIO.writePartitioned(outDf, outputPath)
      // docs with zero content spans still count as processed (docs_in from
      // the input side; docs_out/spans_out from the written relation)
      val stats = docs.groupBy("partition_id").agg(count(lit(1)).as("docs_in"))
        .join(outDf.groupBy("partition_id")
          .agg(countDistinct("doc_id").as("docs_out"), count(lit(1)).as("spans_out")),
          Seq("partition_id"), "left")
        .na.fill(0L, Seq("docs_out", "spans_out"))
        .collect()
      val wallMs = (System.nanoTime() - t0) / 1000000
      val rows = stats.map(r => LineageRow(
        r.getAs[Int]("partition_id"), r.getAs[Long]("docs_in"),
        r.getAs[Long]("docs_out"), r.getAs[Long]("spans_out"), wallMs)).toSeq
      TableIO.appendLineage(spark, rows, lineagePath)
      outDf.unpersist()
      all ++= rows
    }
    all.toSeq
  }
}
