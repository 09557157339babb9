package graft

/** Per-query expected-range bands for the [[Bench]] sweep, encoded from
  * BASELINE.md's fast-mode expected-range records (sf0.1, local[32],
  * this host) so the sweep can check itself: a query whose best-of-N
  * lands above 2× its band gets ONE automatic re-run after a driver GC
  * (fresh pass — first-in-sweep JIT, a stray compaction, or BlockManager
  * litter from a neighbor query otherwise ships an inflated number with
  * no flag), and a violation that survives the re-run is recorded in the
  * JSON as `band_violations` instead of passing silently. The global
  * calibration control catches whole-sweep slow mode; this catches the
  * per-query anomalies it cannot (round-4 VERDICT item 1).
  *
  * Bands are UPPER bounds of the recorded fast-mode range with modest
  * headroom — not targets. Queries without a row land under ~2.5 s in
  * every recorded fast sweep ([[DefaultBand]]); a new heavy query must
  * add its measured row here (BASELINE.md documents each).
  */
object BenchBands {

  /** Fast-mode ceiling for every query without an explicit band. */
  val DefaultBand = 2.5

  /** Above `2 × band`: one GC'd re-run, then flag if still above. */
  val ViolationFactor = 2.0

  /** Bands are calibrated at sf0.1 on this host; a sweep at another
    * scale multiplies every band by SPARK_GRAFT_BAND_SCALE (e.g. ~15 for
    * the 10x sf1 corpus) so the violation flags stay meaningful instead
    * of firing on every query. */
  val Scale: Double =
    sys.env.getOrElse("SPARK_GRAFT_BAND_SCALE", "1.0").toDouble

  val bands: Map[String, Double] = Map(
    // iterative connected-components family: per-round shuffles dominate
    "dedup_canonical" -> 16.0,
    "dedup_best_of_cluster" -> 11.0,
    "dedup_clusters" -> 8.0,
    "dedup_clusters_alt" -> 7.0,
    // LSH / inverted-index candidate joins
    "bm25_topk" -> 15.0,
    "minhash_dups" -> 13.0,
    "ann_recall" -> 3.2,
    // graphs (iterative, unrolled rounds)
    "pagerank_dangling" -> 11.0,
    "pagerank" -> 3.5,
    "hits_scores" -> 4.5,
    "kcore" -> 3.5,
    "label_prop" -> 3.0,
    // driver-paced trainers
    "bpe_batch" -> 9.0,
    "bpe_merges" -> 4.5,
    "bpe_segment" -> 3.5,
    // corpus-wide multi-stage analysis
    "repetition_stats" -> 6.0,
    "profile_stats" -> 9.0,
    "selection_e2e" -> 4.5,
    "qc_compare" -> 4.2,
    "qc_tolerant" -> 3.5,
    "ngram_jaccard" -> 4.2,
    "ccnet_buckets" -> 3.0,
    "readability_by_slice" -> 2.8,
    "distinct_ngrams" -> 2.8,
    // corpus-wide span-equality evaluator (double full-outer by design)
    "span_eval" -> 10.0,
    "span_eval_summary" -> 6.0,
    // real checkpointed streams (input staged once per JVM; pass 2's
    // best excludes the one-time input write)
    "stream_join" -> 6.0,
    "stream_assemble" -> 4.2,
    "stream_session" -> 3.5,
    "stream_minhash" -> 2.8,
    "stream_topk" -> 2.8,
    // multimodal real-decode corpora
    "media_meta" -> 4.0,
    "media_frames" -> 4.0,
    "media_resize" -> 4.0,
    // EP2/EP3 composed pipelines
    "ep2_tables_output" -> 6.0,
    "ep2_page_relation" -> 5.0,
    // the round-4 evidence-weak cluster: bands at the recorded fast
    // values (+headroom) so a recurrence flags instead of shipping
    "lm_perplexity" -> 2.8,
    "context_gain" -> 2.4,
    "line_dedup" -> 2.0,
    "stream_extract" -> 2.5,
    "link_graph" -> 3.0,
    "hybrid_rrf" -> 2.6)

  def band(name: String): Double = bands.getOrElse(name, DefaultBand) * Scale
}
