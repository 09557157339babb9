package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: print the formatted physical plan of named contract
  * queries (all of them with no args). Used to keep plans honest — pushed
  * filters, broadcast vs shuffle joins, whole-stage codegen spans — without
  * wiring a notebook. `SPARK_GRAFT_SF_DIR` selects the data scale.
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .config("spark.graft.topk.rewrite", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // queries whose CONSTRUCTION executes work (streaming run to completion,
    // eager candidate materialization) — audited only when named explicitly,
    // so a bare plan sweep stays side-effect-free and fast
    val eagerConstructors =
      Set("stream_extract", "stream_window", "stream_assemble", "stream_dedup",
        "stream_domstrip", "stream_hll", "stream_minhash", "stream_session",
        "minhash_dups", "minhash_incremental", "bpe_merges", "bpe_segment", "bpe_batch",
        "cms_freq", "cms_merge", "bloom_dedup", "bloom_merge", "ingest_e2e",
        "bucket_join",
        "pq_topk", "ivfpq_topk", "pagerank_dangling",
        "dedup_clusters_alt", "dedup_best_of_cluster", "hits_scores",
        "redirect_resolve", "budget_select", "stream_jsonl",
        "stream_join", "global_ids", "heavy_hitters",
        // kcenter runs its driver-paced selection rounds at construction;
        // snm_pairs ranks through Ids.assign (a count job + prefix-sum)
        "kcenter_select", "snm_pairs", "stream_topk", "water_fill")
    val names =
      if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted.filterNot(eagerConstructors)
      else args.toSeq
    names.foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries.get(n) match {
        case Some(fn) => fn(spark, sfDir).explain("formatted")
        case None => println(s"(unknown query '$n' — known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")})")
      }
    }
    spark.stop()
  }
}
