package graft

import graft.io.{Synth, TableIO}
import graft.pipeline.{Ep1Config, ExtractJob}

import org.apache.spark.sql.SparkSession

/** spark-submit entrypoint for the extraction engine.
  *
  * Usage:
  *   graft.Main gen <nDocs> <nPartitions> <inputPath>
  *   graft.Main run <inputPath> <outputPath> <lineagePath> [commitBatch]
  *   graft.Main strip <inputPath> <outputPath> <lineagePath> [commitBatch]
  *   graft.Main domstrip <inputPath> <outputPath> <lineagePath> [commitBatch]
  *   graft.Main curate <inputPath> <outputPath> <lineagePath> [commitBatch]
  *   graft.Main dedup <inputPath> <outputPath> [minJ] [maxDf] [maxBucket]
  *   graft.Main incdedup <corpusPath> <statePath> <outputPath> <snapshotId> [minJ] [maxBucket]
  *
  * `run` is resumable: partitions already present in the lineage table are
  * skipped (left-anti join), so re-submitting a killed job completes exactly
  * the pending partitions.
  *
  * `strip` runs the north-star boilerplate stage over a raw document table
  * `(doc_id, text)` (markup allowed): blocks classified by link/text
  * density, boilerplate dropped, heading/body content spans written out —
  * with the same per-partition lineage + resume contract as `run`.
  */
object Main {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cores]"))
      .appName("graft-extract")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .config("spark.graft.topk.rewrite", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      args.toList match {
        case "gen" :: n :: parts :: path :: Nil =>
          // sortWithinPartitions before a dynamic-partition write: without
          // it every task holds one OPEN parquet writer per partition value
          // (parts × row-group buffers per task → heap exhaustion on small
          // drivers); sorted, each task streams partition values one writer
          // at a time
          Synth.generate(spark, n.toLong, parts.toInt).toDF()
            .sortWithinPartitions("partition_id")
            .write.partitionBy("partition_id").mode("overwrite").parquet(path)
          println(s"[graft] wrote ${n} docs to $path")
        case "run" :: in :: out :: lineage :: rest =>
          val batch = rest.headOption.map(_.toInt).getOrElse(8)
          val rows = ExtractJob.runJob(spark, in, out, lineage, Ep1Config(), batch)
          val committed = TableIO.readLineage(spark, lineage).count()
          println(s"[graft] processed ${rows.length} partitions this run " +
            s"(docs=${rows.map(_.docs_in).sum}, spans=${rows.map(_.spans_out).sum}); " +
            s"lineage now has $committed committed partitions")
        case "strip" :: in :: out :: lineage :: rest =>
          val batch = rest.headOption.map(_.toInt).getOrElse(8)
          val rows = graft.pipeline.BoilerplateJob.runJob(spark, in, out, lineage,
            commitBatch = batch)
          val committed = TableIO.readLineage(spark, lineage).count()
          println(s"[graft] boilerplate strip: processed ${rows.length} partitions this run " +
            s"(docs=${rows.map(_.docs_in).sum}, content spans=${rows.map(_.spans_out).sum}); " +
            s"lineage now has $committed committed partitions")
        case "domstrip" :: in :: out :: lineage :: rest =>
          val batch = rest.headOption.map(_.toInt).getOrElse(8)
          val rows = graft.pipeline.DomStripJob.runJob(spark, in, out, lineage,
            commitBatch = batch)
          val committed = TableIO.readLineage(spark, lineage).count()
          println(s"[graft] dom strip: processed ${rows.length} partitions this run " +
            s"(docs=${rows.map(_.docs_in).sum}, spans=${rows.map(_.spans_out).sum}); " +
            s"lineage now has $committed committed partitions")
        case "curate" :: in :: out :: lineage :: rest =>
          // the full per-doc quality battery (repairs → blocklist → Gopher
          // rules → classifier) as one zero-shuffle resumable stage
          val batch = rest.headOption.map(_.toInt).getOrElse(8)
          val rows = graft.pipeline.CurateJob.runJob(spark, in, out, lineage,
            commitBatch = batch)
          val committed = TableIO.readLineage(spark, lineage).count()
          println(s"[graft] curate: processed ${rows.length} partitions this run " +
            s"(docs=${rows.map(_.docs_in).sum}, kept=${rows.map(_.docs_out).sum}, " +
            s"kept tokens=${rows.map(_.spans_out).sum}); " +
            s"lineage now has $committed committed partitions")
        case "compact" :: in :: out :: lineage :: rest =>
          // small-file compaction: rewrite each partition into
          // ceil(bytes/targetBytes) files, content-identical, resumable
          val target = rest.headOption.map(_.toLong).getOrElse(128L << 20)
          val rows = graft.pipeline.CompactJob.runJob(spark, in, out, lineage,
            targetBytes = target)
          val committed = TableIO.readLineage(spark, lineage).count()
          println(s"[graft] compact: processed ${rows.length} partitions this run " +
            s"(files ${rows.map(_.docs_in).sum} -> ${rows.map(_.docs_out).sum}, " +
            s"rows=${rows.map(_.spans_out).sum}); " +
            s"lineage now has $committed committed partitions")
        case "incdedup" :: corpus :: state :: out :: snap :: rest =>
          // day-over-day incremental near-dup: corpus parquet carries a
          // `snapshot` column; each invocation processes one snapshot
          // against the persisted band-table state (rerun = no-op)
          val minJ = rest.headOption.map(_.toDouble).getOrElse(0.5)
          val maxBucket = rest.drop(1).headOption.map(_.toInt).getOrElse(10000)
          val emitted = graft.pipeline.DedupJob.runIncremental(
            spark.read.parquet(corpus), "doc_id", "text", "snapshot", snap,
            state, out, minJ = minJ, maxBucket = maxBucket)
          println(s"[graft] incdedup: snapshot $snap emitted $emitted pairs")
        case "takedown" :: corpus :: deletes :: overlay :: lineage :: rest =>
          // GDPR/DMCA takedown: rewrite ONLY the partitions holding listed
          // doc_ids into a copy-on-write overlay; base bytes untouched;
          // lineage = audit log + resume marker (rerun = no-op)
          val batch = rest.headOption.map(_.toInt).getOrElse(8)
          val rows = graft.pipeline.TakedownJob.runJob(spark, corpus,
            deletes, overlay, lineage, commitBatch = batch)
          // takedown lineage is append-only with one row per partition PER
          // RUN — count DISTINCT partitions, or a grown-list rerun inflates
          // the summary (curate/compact commit each partition exactly once,
          // so their raw counts stay correct)
          val committed = TableIO.readLineage(spark, lineage).toDF()
            .select("partition_id").distinct().count()
          println(s"[graft] takedown: rewrote ${rows.length} partitions this run " +
            s"(rows before=${rows.map(_.docs_in).sum}, " +
            s"kept=${rows.map(_.docs_out).sum}, " +
            s"deleted=${rows.map(_.spans_out).sum}); " +
            s"lineage now has $committed committed partitions")
        case "dedup" :: in :: out :: rest =>
          // corpus near-dup pairs over a (doc_id, text) table with the skew
          // caps ON (DedupJob defaults) and the drops logged — the
          // production MinHash/LSH path, drivable end-to-end
          val minJ = rest.headOption.map(_.toDouble).getOrElse(0.5)
          val caps = graft.pipeline.DedupJob.Caps(
            maxDf = rest.lift(1).map(_.toInt).getOrElse(10000),
            maxBucket = rest.lift(2).map(_.toInt).getOrElse(10000))
          val docs = spark.read.parquet(in).select("doc_id", "text")
          val (pairs, drops) = graft.pipeline.DedupJob.minhashNearDuplicates(
            docs, "doc_id", "text", minJ = minJ, caps = caps)
          pairs.write.mode("overwrite").parquet(out)
          val n = spark.read.parquet(out).count()
          // release exactly the LSH operators' persisted relations (not a
          // blanket clearCache — a host application's caches stay cached)
          graft.io.Persisted.release(spark)
          println(s"[graft] dedup: wrote $n near-dup pairs to $out " +
            s"(minJ=$minJ, dropped hot shingles=${drops.hot_shingles}, " +
            s"hot buckets=${drops.hot_buckets})")
        case _ =>
          System.err.println("usage: graft.Main gen <nDocs> <nPartitions> <path> | " +
            "run <in> <out> <lineage> [commitBatch] | strip <in> <out> <lineage> [commitBatch] | " +
            "domstrip <in> <out> <lineage> [commitBatch] | " +
            "curate <in> <out> <lineage> [commitBatch] | " +
            "compact <in> <out> <lineage> [targetBytes] | " +
            "dedup <in> <out> [minJ] [maxDf] [maxBucket] | " +
            "incdedup <corpus> <state> <out> <snapshotId> [minJ] [maxBucket] | " +
            "takedown <corpus> <deletes> <overlay> <lineage> [commitBatch]")
          sys.exit(2)
      }
    } finally spark.stop()
  }
}
