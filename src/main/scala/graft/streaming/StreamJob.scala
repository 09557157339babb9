package graft.streaming

import graft.model.Doc
import graft.pipeline.{Ep1Config, ExtractJob}

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ingest for the extraction pipeline. The reference is strictly
  * batch (SURVEY.md §2.11), so streaming is an additive capability: new
  * document files land in the input directory, each micro-batch runs the
  * same per-document EP1 core (narrow, zero-shuffle), and output is appended
  * partition-by-partition — the batch and streaming paths share the exact
  * same operator (`ExtractJob.runTyped`), so semantics cannot drift.
  */
object StreamJob {

  /** Transform a streaming Dataset[Doc] with the EP1 core. Usable on any
    * source (file, Kafka-shaped, memory) — the pipeline is stateless
    * per-document, so no watermark/state management is needed. */
  def transform(docs: Dataset[Doc], cfg: Ep1Config = Ep1Config()): Dataset[Doc] =
    ExtractJob.runTyped(docs, cfg)

  /** File-source streaming job: watch `inputPath` for new parquet files of
    * the docs schema, extract, append to `outputPath`. Checkpointed —
    * restart resumes from the last committed micro-batch (the streaming
    * analog of the lineage anti-join). */
  def run(spark: SparkSession, inputPath: String, outputPath: String,
      checkpointPath: String, cfg: Ep1Config = Ep1Config(),
      maxFilesPerTrigger: Int = 16): StreamingQuery = {
    import spark.implicits._
    val in = spark.readStream
      .schema(Synth.docSchema(spark))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputPath)
      .as[Doc]
    transform(in, cfg).writeStream
      .format("parquet")
      .option("path", outputPath)
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Watermarked tumbling-window extraction metrics over streaming docs
    * carrying an `event_time` timestamp column next to `spans`:
    * (window_start epoch-seconds, kind, n_spans, n_chars).
    *
    * Append output mode — each window emits exactly once, when the
    * watermark (max event time seen minus `watermarkDelay`) passes the
    * window end; rows arriving later than the watermark are dropped from
    * the aggregation (asserted in StreamJobSpec with a MemoryStream).
    * Works identically on a batch DataFrame (watermark is a no-op there),
    * which is what the DuckDB oracle replays. */
  def windowedMetrics(docs: org.apache.spark.sql.DataFrame,
      watermarkDelay: String = "10 seconds",
      windowDuration: String = "5 minutes"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    docs.withWatermark("event_time", watermarkDelay)
      .select(col("event_time"), explode(col("spans")).as("span"))
      .groupBy(window(col("event_time"), windowDuration), col("span.kind").as("kind"))
      .agg(count(lit(1)).as("n_spans"), sum(length(col("span.text"))).as("n_chars"))
      .select(col("window.start").cast("long").as("window_start"), col("kind"),
        col("n_spans"), col("n_chars"))
  }

  private object Synth {
    def docSchema(spark: SparkSession): org.apache.spark.sql.types.StructType = {
      import spark.implicits._
      implicitly[org.apache.spark.sql.Encoder[Doc]].schema
    }
  }
}
