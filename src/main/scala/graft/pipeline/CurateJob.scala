package graft.pipeline

import graft.io.TableIO
import graft.model.LineageRow
import graft.text.{Blocklist, Classifier, TextAnalysis}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The per-document curation battery as ONE resumable, zero-shuffle stage —
  * what a 100 TB corpus pass actually runs between ingest and dedup:
  *
  *   text repairs (cp1252 mojibake chain, line-break de-hyphenation)
  *   → UT1-style blocklist (domain verdict + bad-word density)
  *   → Gopher quality rules (integer metrics, exact rational thresholds)
  *   → hashed-linear quality classifier (integer milli-weight score)
  *
  * A document survives when the blocklist passes, the Gopher `kept`
  * verdict holds, and the classifier score is positive. Every stage is the
  * PURE twin of an oracled operator (BlocklistSpec / TextAnalysisSpec /
  * ClassifierSpec pin each against its Column form), composed per document
  * inside one typed mapPartitions — no shuffle anywhere; the classifier
  * here uses the deterministic hashed weights ([[Classifier.scoreLinear]]
  * with a trained weight table is the broadcast-join variant when a real
  * model ships).
  *
  * Commit contract identical to [[BoilerplateJob.runJob]]: batches of
  * partitions, dynamic partition overwrite, one lineage row per committed
  * partition, rerun = left-anti join against the lineage (idempotent
  * resume). `docs_out` counts survivors; `spans_out` carries the
  * survivors' token total (the volume the next stage will read). */
object CurateJob {

  final case class Config(
      words: Seq[String] = Seq("slow", "gibberish"),
      domains: Seq[String] = Seq("src3", "src7", "src13"),
      ratioMilliThreshold: Long = 40L,
      clfBuckets: Int = 4096)

  /** One curated row. */
  final case class CuratedDoc(doc_id: String, partition_id: Int,
      n_tokens: Long, blocked: Boolean, gopher_kept: Boolean,
      clf_score_milli: Long, kept: Boolean, clean_text: String)

  /** Pure per-doc kernel — the composition the job maps. */
  def curateDoc(text: String, domain: String, cfg: Config)
      : (Long, Boolean, Boolean, Long, Boolean, String) = {
    val repaired = TextAnalysis.dehyphenate(
      TextAnalysis.fixMojibake(if (text == null) "" else text))
    val (nt, _, _, _, blocked) = Blocklist.flagsPure(repaired,
      if (domain == null) "" else domain,
      cfg.words.toSet, cfg.domains.toSet, cfg.ratioMilliThreshold)
    val gopherKept = TextAnalysis.gopherQuality(repaired)._2.last
    val (_, score, positive) = Classifier.scoreLinearPure(repaired, cfg.clfBuckets)
    val kept = !blocked && gopherKept && positive
    (nt, blocked, gopherKept, score, kept, repaired)
  }

  def withPartitions(df: DataFrame, nPartitions: Int): DataFrame =
    if (df.columns.contains("partition_id")) df
    else df.withColumn("partition_id",
      pmod(hash(col("doc_id")), lit(nPartitions)).cast("int"))

  def runJob(spark: SparkSession, inputPath: String, outputPath: String,
      lineagePath: String, cfg: Config = Config(), nPartitions: Int = 32,
      commitBatch: Int = 8): Seq[LineageRow] = {
    val raw = spark.read.parquet(inputPath)
    val src = if (raw.columns.contains("source")) col("source") else lit("")
    // an explicit partition_id column is honored (the shared contract with
    // BoilerplateJob) — carry it through the projection or withPartitions
    // would silently re-derive it
    val base = Seq(col("doc_id").cast("string").as("doc_id"),
      src.cast("string").as("source"), col("text").cast("string").as("text"))
    val projected =
      if (raw.columns.contains("partition_id"))
        raw.select(base :+ col("partition_id").cast("int").as("partition_id"): _*)
      else raw.select(base: _*)
    val input = withPartitions(projected, nPartitions)
    val pending = TableIO.pendingPartitions(input, lineagePath)
    val all = scala.collection.mutable.ArrayBuffer.empty[LineageRow]
    import spark.implicits._
    pending.grouped(commitBatch).foreach { batch =>
      val t0 = System.nanoTime()
      val docs = input.filter(col("partition_id").isin(batch: _*))
      val curated = docs.select(col("doc_id"), col("partition_id"),
          col("source"), col("text"))
        .as[(String, Int, String, String)]
        .mapPartitions(_.map { case (id, pid, dom, text) =>
          val (nt, blocked, gq, score, kept, clean) = curateDoc(text, dom, cfg)
          CuratedDoc(id, pid, nt, blocked, gq, score, kept, clean)
        }).toDF()
      val outDf = curated.cache()
      TableIO.writePartitioned(outDf, outputPath)
      val stats = docs.groupBy("partition_id").agg(count(lit(1)).as("docs_in"))
        .join(outDf.groupBy("partition_id").agg(
          sum(when(col("kept"), 1L).otherwise(0L)).as("docs_out"),
          sum(when(col("kept"), col("n_tokens")).otherwise(0L)).as("spans_out")),
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
