package graft.streaming

import graft.model.Doc
import graft.pipeline.{Ep1Config, ExtractJob}

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, explode}
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

  /** Streaming north-star DOM strip: watch `inputPath` for new parquet
    * files of the interleaved span-doc schema, explode, run the stateless
    * zero-shuffle [[graft.segment.Dom.stripInterleaved]] (HTML text spans
    * cleaned, media spans passed through with their offsets), append span
    * rows to `outputPath`. Checkpointed — restart resumes from the last
    * committed micro-batch; batch ≡ stream is asserted in StreamJobSpec
    * (the strip is per-row, so the streaming plan is the batch plan under
    * a micro-batch scheduler). */
  def domStrip(spark: SparkSession, inputPath: String, outputPath: String,
      checkpointPath: String, maxFilesPerTrigger: Int = 16): StreamingQuery = {
    val in = spark.readStream
      .schema(Synth.docSchema(spark))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputPath)
    val rows = in.select(col("doc_id"), explode(col("spans")).as("span"))
      .select(col("doc_id"), col("span.kind").as("kind"),
        col("span.text").as("text"), col("span.media_ref").as("media_ref"),
        col("span.offset").as("offset"))
    graft.segment.Dom.stripInterleaved(rows).writeStream
      .format("parquet")
      .option("path", outputPath)
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** The JSONL quarantine ingest as a stream: raw crawl lines arrive as a
    * file-source stream and every line leaves flagged (the Jsonl.parseLines
    * contract) — the shape a live crawl ingest actually runs. Stateless
    * per-row expression, so stream output ≡ batch output row-for-row. */
  def jsonlStream(spark: SparkSession, inputPath: String, outputPath: String,
      checkpointPath: String,
      schema: org.apache.spark.sql.types.StructType, required: Seq[String],
      maxFilesPerTrigger: Int = 16): StreamingQuery = {
    val lineSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("line",
        org.apache.spark.sql.types.StringType)))
    val in = spark.readStream
      .schema(lineSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputPath)
    graft.io.Jsonl.parseLines(in, "line", schema, required).writeStream
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

  /** Streaming distinct-count per tumbling window via the HyperLogLog
    * sketch ([[graft.sketch.Sketches.HllAggregator]]): exact streaming
    * distinct needs an unbounded per-window value set in the state store;
    * the sketch caps state at 256 BYTES per window regardless of
    * cardinality — the only distinct-count that survives a
    * billion-events-per-window stream. Same watermark + append
    * finalization contract as [[windowedMetrics]], and the same
    * cross-engine-exact estimator as the batch path, so the oracle replays
    * finalized windows bit-for-bit. Output:
    * (window_start, hll_distinct, n_rows). */
  def windowedDistinct(docs: org.apache.spark.sql.DataFrame, valueCol: String,
      watermarkDelay: String = "10 seconds",
      windowDuration: String = "5 minutes"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val agg = udaf(new graft.sketch.Sketches.HllAggregator)
    docs.withWatermark("event_time", watermarkDelay)
      .groupBy(window(col("event_time"), windowDuration))
      .agg(agg(md5(col(valueCol).cast("string"))).as("__h"),
        count(lit(1)).as("n_rows"))
      .select(col("window.start").cast("long").as("window_start"),
        col("__h._1").as("hll_distinct"), col("n_rows"))
  }

  /** Streaming exact dedup: drop rows whose normalized-text fingerprint
    * (same trim/case-fold/whitespace-squash + hash60 as
    * [[graft.dedup.Dedup.exactDuplicates]]) has already been seen, using
    * Spark's built-in `dropDuplicatesWithinWatermark` state store — the
    * idiomatic tool, preferred over hand-rolled flatMapGroupsWithState
    * state. State holds one entry per distinct fingerprint and is evicted
    * once the watermark passes `event_time + watermarkDelay`, so memory is
    * bounded by the distinct volume inside the watermark horizon, not the
    * stream's lifetime (size the delay to the dedup window you actually
    * need; cross-horizon dedup is [[graft.dedup.Bloom]]'s job).
    *
    * Which duplicate survives is whichever the state store sees first —
    * so for deterministic downstream results feed FULL-ROW-identical
    * duplicates (then any survivor is the same row), or treat survivors
    * as representatives only. Output adds the `fp` column. */
  def dedupStream(docs: org.apache.spark.sql.DataFrame,
      textCol: String = "text",
      watermarkDelay: String = "10 seconds"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    docs.withWatermark("event_time", watermarkDelay)
      .withColumn("fp", graft.text.TextAnalysis.hash60(
        regexp_replace(trim(lower(col(textCol))), "\\s+", " ")))
      .dropDuplicatesWithinWatermark("fp")
  }

  /** One document arriving on a crawl stream (near-dup input). */
  final case class MinhashDocEvent(doc_id: Long,
      event_time: java.sql.Timestamp, text: String)

  final case class BandEvent(band: Long, doc_id: Long,
      event_ms: Long, sig: Seq[Long])

  /** Per-band-bucket state: (doc_id, signature) entries in arrival order,
    * plus the latest event time seen (drives horizon eviction). */
  final case class BandBucketState(
      entries: Seq[(Long, Seq[Long])], lastEventMs: Long)

  /** Streaming MinHash+LSH near-duplicate detection — the online twin of
    * [[graft.dedup.Dedup.minhashDuplicates]]: each arriving doc is
    * signatured and banded IN THE MAP (per-row work, no shuffle), band
    * events are grouped by band key, and custom state
    * (`flatMapGroupsWithState`) holds the bucket's recent (doc_id,
    * signature) entries so a new arrival emits a candidate pair against
    * every stored neighbor immediately — dedup verdicts stream out with
    * the crawl instead of waiting for a batch window.
    *
    * Verification DEVIATES from the batch path by design: batch re-reads
    * candidate texts and computes exact shingle Jaccard; a stream cannot
    * hold texts in state, so the verdict is the MinHash estimate itself —
    * `sim_milli = 1000·|{i : sigA_i = sigB_i}| div k`, the unbiased
    * estimator of Jaccard the signatures exist to provide.
    *
    * Scale/skew: state per bucket is capped at `maxBucket` entries
    * (arrival order wins; later docs in a hot bucket still PAIR against
    * the stored entries but are not stored — the same boilerplate-bucket
    * cap as the batch path's `maxBucket`, applied online). A bucket idle
    * past `horizonSeconds` (event time) times out and drops its state, so
    * memory is bounded by active buckets × maxBucket × k longs, not by
    * stream lifetime. A pair sharing several bands emits once per shared
    * band — downstream dedups on (id_a, id_b) (the read-back `distinct`).
    *
    * In-batch determinism: events inside one micro-batch are processed in
    * (event_time, doc_id) order, so replays and retries emit identical
    * pairs. */
  def minhashDupStream(docs: Dataset[MinhashDocEvent],
      n: Int = 3, k: Int = 32, bands: Int = 8, minSimMilli: Long = 500,
      maxBucket: Int = 64, horizonSeconds: Long = 3600,
      watermarkDelay: String = "10 seconds"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import docs.sparkSession.implicits._
    require(k % bands == 0, "k must divide into bands")
    val r = k / bands
    val events = docs.flatMap { e =>
      val sh = graft.dedup.Dedup.shingles(e.text, n)
      if (sh.isEmpty) Iterator.empty
      else {
        val sig = (0 until k).map(i =>
          sh.iterator.map(s => graft.text.TextAnalysis.hash60(s"$i:$s")).min)
        graft.dedup.Dedup.lshBandKeys(sig, bands, r).iterator
          .map(b => BandEvent(b, e.doc_id, e.event_time.getTime, sig))
      }
    }
    events
      .withColumn("event_time", (col("event_ms") / 1000).cast("timestamp"))
      .withWatermark("event_time", watermarkDelay)
      .as[(Long, Long, Long, Seq[Long], java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[BandBucketState, (Long, Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_, events, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val prev = state.getOption
            var entries = prev.map(_.entries).getOrElse(Seq.empty)
            val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
            val evs = events.toSeq.sortBy(e => (e._3, e._2))
            for (e <- evs) {
              val (id, ms, sig) = (e._2, e._3, e._4)
              for ((oid, osig) <- entries if oid != id) {
                val m = (0 until k).count(i => sig(i) == osig(i)).toLong
                val simMilli = 1000L * m / k
                if (simMilli >= minSimMilli)
                  out += ((math.min(oid, id), math.max(oid, id), simMilli, ms))
              }
              if (entries.size < maxBucket) entries :+= (id, sig)
            }
            val lastMs = math.max(prev.map(_.lastEventMs).getOrElse(0L),
              evs.map(_._3).max)
            state.update(BandBucketState(entries, lastMs))
            state.setTimeoutTimestamp(lastMs + horizonSeconds * 1000L)
            out.iterator
          }
      }
      .toDF("id_a", "id_b", "sim_milli", "event_ms")
  }

  /** One user interaction arriving on a stream (sessionization input). */
  final case class UserEvent(user_id: Long,
      event_time: java.sql.Timestamp, event_id: Long)

  /** Open-session state: first/last event epoch-MICROS + event count
    * (micros, not millis — the batch oracle compares gaps at the parquet
    * timestamp's full precision). */
  final case class SessionWindow(startUs: Long, lastUs: Long, n: Long)

  /** Full-precision epoch micros of a Timestamp (getTime alone truncates
    * to millis; the sub-milli residue lives in getNanos). */
  private def epochMicros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  /** Streaming sessionization with CUSTOM STATE (`flatMapGroupsWithState`) —
    * the streaming twin of the batch `sessionize` contract query: events
    * grouped per user, a session closes when the gap to the next event
    * exceeds `gapSeconds` (emitted immediately) or when the event-time
    * watermark passes `last event + gap` (group timeout — the open session
    * emits exactly once, the streaming analog of the batch query's final
    * session per user). Built-in session windows
    * (`session_window(event_time, gap)`) could express the aggregate shape,
    * but the custom-state form also carries per-session derived state
    * downstream (and is the documented pattern this engine uses for
    * order-dependent state).
    *
    * Determinism: events inside a micro-batch are processed in
    * (event_time, event_id) order, so replays emit identical sessions. The
    * strict-`>` gap rule matches the batch oracle exactly.
    *
    * Scale/state: one `SessionWindow` (3 longs) per OPEN session — memory is
    * bounded by concurrently active users inside the watermark horizon, not
    * by stream lifetime; timeouts evict every idle session.
    *
    * Output: (user_id, session_start_us, session_end_us, n_events). */
  def sessionStream(events: Dataset[UserEvent], gapSeconds: Long = 1800,
      watermarkDelay: String = "10 seconds"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    val gapUs = gapSeconds * 1000000L
    events.withWatermark("event_time", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionWindow, (Long, Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId, evs, state) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single((userId, s.startUs, s.lastUs, s.n))
          } else {
            val sorted = evs.toSeq.sortBy(e => (epochMicros(e.event_time), e.event_id))
            val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
            var cur = state.getOption
            for (e <- sorted) {
              val us = epochMicros(e.event_time)
              cur match {
                case Some(s) if us - s.lastUs > gapUs =>
                  out += ((userId, s.startUs, s.lastUs, s.n))
                  cur = Some(SessionWindow(us, us, 1L))
                case Some(s) =>
                  cur = Some(SessionWindow(s.startUs, math.max(s.lastUs, us), s.n + 1))
                case None =>
                  cur = Some(SessionWindow(us, us, 1L))
              }
            }
            val s = cur.get
            state.update(s)
            // timeout API is millis; round UP so the timeout never fires
            // before last + gap in micros
            state.setTimeoutTimestamp((s.lastUs + gapUs + 999L) / 1000L)
            out.iterator
          }
      }
      .toDF("user_id", "session_start_us", "session_end_us", "n_events")
  }

  /** One span arriving as a streaming event. */
  final case class SpanEvent(doc_id: String, event_time: java.sql.Timestamp,
      kind: String, text: String, media_ref: String, offset: Int)

  /** Per-doc assembly state: buffered spans + the latest event time seen. */
  final case class DocState(spans: Seq[graft.model.Span], lastEventMs: Long)

  /** Streaming document assembly with CUSTOM STATE
    * (`flatMapGroupsWithState`): span events are buffered per doc_id, and
    * when the event-time watermark passes `last span + gapSeconds` the group
    * times out, the buffered spans are assembled into a document, the EP1
    * extraction core runs on it, and the extracted doc is emitted exactly
    * once (append mode). The session-gap close mirrors the lineage-commit
    * idea at per-doc granularity: a doc emits only when provably complete
    * under the watermark. */
  def assembleDocs(spans: Dataset[SpanEvent], gapSeconds: Long = 30,
      watermarkDelay: String = "10 seconds",
      cfg: Ep1Config = Ep1Config()): Dataset[Doc] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import spans.sparkSession.implicits._
    spans.withWatermark("event_time", watermarkDelay)
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState[DocState, Doc](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (docId, events, state) =>
          if (state.hasTimedOut) {
            val buffered = state.get.spans
            state.remove()
            val doc = Doc(docId, buffered.sortBy(_.offset), 0)
            Iterator.single(doc.copy(spans = graft.pipeline.Ep1Core.process(doc, cfg)))
          } else {
            val prev = state.getOption
            val evs = events.toSeq
            val spansNow = prev.map(_.spans).getOrElse(Seq.empty) ++
              evs.map(e => graft.model.Span(e.kind, e.text, e.media_ref, e.offset))
            val lastMs = math.max(prev.map(_.lastEventMs).getOrElse(0L),
              evs.map(_.event_time.getTime).max)
            state.update(DocState(spansNow, lastMs))
            state.setTimeoutTimestamp(lastMs + gapSeconds * 1000L)
            Iterator.empty
          }
      }
  }

  /** Watermarked STREAM-STREAM equi-join with an event-time tolerance band —
    * the two-unbounded-sides join Structured Streaming supports only when
    * both inputs are watermarked AND the join condition bounds how far apart
    * matching event times can be (the range condition is what lets the state
    * store evict: a buffered left row can be dropped once the right-side
    * watermark passes `leftTime + tolerance`, and vice versa). The curation
    * use: enrich a crawl's text-span stream with its media-sidecar stream
    * (or a metadata feed) without landing either to storage first.
    *
    * Inner join only here: inner matches emit the moment the partner
    * arrives, so the output is exactly the batch join whenever no row
    * arrives later than the watermark allows — which is what the DuckDB
    * oracle replays. (Outer stream-stream joins additionally emit
    * null-padded rows on watermark passage; their finalization timing is
    * trigger-dependent, so they are exercised in the spec via multi-batch
    * MemoryStreams rather than oracled.)
    *
    * Column contract: the two sides must have DISJOINT column names (rename
    * before calling) — the joined row carries both sides' columns verbatim.
    *
    * Scale/state: state is bounded by rows inside the watermark horizon ×
    * tolerance on each side, not stream lifetime. The join itself shuffles
    * both sides by the equi-key exactly like the batch join; skewed keys
    * skew here too (cap or salt upstream — the [[graft.io.Skew]] levers
    * apply before the watermark). */
  def streamStreamJoin(lhs: org.apache.spark.sql.DataFrame,
      rhs: org.apache.spark.sql.DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      toleranceSeconds: Long,
      watermarkDelay: String = "10 seconds"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(toleranceSeconds >= 0, s"negative tolerance: $toleranceSeconds")
    val overlap = lhs.columns.toSet.intersect(rhs.columns.toSet)
    require(overlap.isEmpty, s"sides must have disjoint columns, shared: $overlap")
    val l = lhs.withWatermark(leftTime, watermarkDelay)
    val r = rhs.withWatermark(rightTime, watermarkDelay)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTime) >= col(leftTime) - expr(s"INTERVAL $toleranceSeconds SECONDS") &&
        col(rightTime) <= col(leftTime) + expr(s"INTERVAL $toleranceSeconds SECONDS"),
      "inner")
  }

  /** One value arriving on the frequent-items stream. `flush = true` rows
    * are sentinels: they update nothing and make the shard emit its
    * current summary. */
  final case class MgEvent(shard: Int, value: String,
      event_time: java.sql.Timestamp, flush: Boolean)

  /** Serializable Misra-Gries summary state for one shard. */
  final case class MgShardState(keys: Seq[String], counts: Seq[Long])

  /** Streaming Misra-Gries frequent-items — the online twin of
    * [[graft.sketch.HeavyHitters.heavyHitters]]: values hash-shard in the
    * map, each shard's `flatMapGroupsWithState` state is ONE k-counter
    * summary (`k`·(string+long) — constant, stream-lifetime-independent),
    * and a `flush` sentinel makes a shard emit its current
    * (shard, value, mg_count) rows. Because a value always lands on its
    * own shard, the per-shard MG bound applies to the value's FULL stream:
    * undercount ≤ n_shard/(k+1), so every item with global count >
    * total/den (den ≤ k+1) is guaranteed present at flush time no matter
    * how micro-batches sliced the stream — the emitted candidates feed
    * the same exact batch rescore as the batch operator, and THAT output
    * is deterministic even though the raw candidate set is order-
    * dependent (the documented MG property).
    *
    * In-batch determinism: a batch's events process in (event_time,
    * value) order with sentinels last within their timestamp.
    */
  def mgStream(events: Dataset[MgEvent], k: Int,
      watermarkDelay: String = "1 hour"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    require(k >= 1, s"k must be >= 1: $k")
    events
      .withWatermark("event_time", watermarkDelay)
      .groupByKey(_.shard)
      .flatMapGroupsWithState[MgShardState, (Int, String, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (shard, evs, state) =>
          val m = state.getOption
            .map(s => collection.mutable.HashMap(s.keys.zip(s.counts): _*))
            .getOrElse(collection.mutable.HashMap.empty[String, Long])
          val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
          // flush sorts AFTER updates at the same timestamp (false < true)
          for (e <- evs.toSeq.sortBy(e => (e.event_time.getTime, e.flush, e.value))) {
            if (e.flush)
              out ++= m.toSeq.sortBy(_._1).map { case (v, c) => (shard, v, c) }
            else graft.sketch.HeavyHitters.mgUpdatePure(m, e.value, k)
          }
          state.update(MgShardState(m.keys.toSeq, m.keys.toSeq.map(m)))
          out.iterator
      }
      .toDF("shard", "value", "mg_count")
  }

  private object Synth {
    def docSchema(spark: SparkSession): org.apache.spark.sql.types.StructType = {
      import spark.implicits._
      implicitly[org.apache.spark.sql.Encoder[Doc]].schema
    }
  }
}