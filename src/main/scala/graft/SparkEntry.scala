package graft

import graft.classify.{Boilerplate => BP, CoverageClassifier => CC, Filters}
import graft.dedup.Dedup
import graft.extract.{FieldExtractors => FE, Norms}
import graft.io.Synth
import graft.media.Media
import graft.model.Doc
import graft.pipeline.{Ep1Config, ExtractJob}
import graft.qc.Qc
import graft.ranges.Islands
import graft.sim.Similarity
import graft.text.{C4, Importance, Packing, Sampling, Web, TextAnalysis => TA}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract: one query per implemented operator family (SURVEY.md §2)
  * over the shared test tables, each with an exactly-equivalent DuckDB oracle
  * in [[SparkEntry.oracleSql]]. Numeric outputs are BIGINT/DOUBLE on both
  * sides; money aggregates go through cents (`cast(round(x*100) as bigint)`)
  * so sums are order-independent integers; all hashing is md5-derived and
  * engine-reproducible.
  */
object SparkEntry {

  private def rd(spark: SparkSession, dir: String, table: String): DataFrame =
    spark.read.parquet(s"$dir/$table.parquet")

  /** Shared synthesized registrable-domain fixture (pure function of
    * doc_id) — ONE definition for the domain-keyed queries
    * (domain_wilson, domain_hhi, temperature_alloc) and, via
    * [[synthDomainSql]], their oracles. */
  private def synthDomain(id: Column): Column =
    when(pmod(id, lit(4)) === 0, lit("news.co.uk"))
      .otherwise(concat(lit("site"), pmod(id, lit(10)).cast("string"),
        lit(".org")))

  private val synthDomainSql: String =
    "CASE WHEN doc_id%4=0 THEN 'news.co.uk' " +
      "ELSE 'site'||(doc_id%10)::VARCHAR||'.org' END"

  /** Shared BM25 retrieval fixture (three fixed queries over the
    * injected doc text) — feeds both `bm25_topk` and the `hybrid_rrf`
    * fusion. */
  private def bm25Fixture(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val queries = Seq(1L -> "mortgagee bank", 2L -> "duplicate content block",
      3L -> "policy limit payment").toDF("qid", "qtext")
    graft.sim.SparseSim.bm25TopK(
      rd(s, d, "documents").withColumn("t2", docText)
        .select(col("doc_id"), col("t2")),
      "doc_id", "t2", queries, "qid", "qtext", k = 10, k1 = 1.5)
  }

  /** Shared fixture for the substring-dedup queries (`substring_dedup`,
    * `selection_e2e`): every 5th doc gets the same pasted boilerplate
    * sentence. ONE definition feeds both Spark entries and (via
    * [[disclaimerSentence]]) both SQL oracles — editing it in one place
    * keeps all four derivations in lockstep. */
  private val disclaimerSentence =
    " standard legal disclaimer all liability is limited to the amounts stated herein"
  private def disclaimerPage: Column =
    when(pmod(col("doc_id"), lit(5)) === 0,
      concat(col("text"), lit(disclaimerSentence)))
      .otherwise(col("text"))

  /** Containment fixture: every 31st doc IS the bare disclaimer — a small
    * page fully quoted inside every %5 disclaimer-carrying doc, the
    * asymmetric partial-mirror shape Jaccard misses. */
  private def containmentPage: Column =
    when(pmod(col("doc_id"), lit(31)) === 0, lit(disclaimerSentence.trim))
      .otherwise(disclaimerPage)

  private val cleanupRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private val streamInputsPrepared =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def rmrfPath(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val stream = java.nio.file.Files.walk(p)
      try stream.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => java.nio.file.Files.delete(f))
      finally stream.close()
    }

  /** Per-JVM temp tree for a streaming contract query. The checkpoint and
    * output subtrees are cleared on EVERY invocation (a live checkpoint must
    * never be reused across runs), but the deterministic input parquet is
    * written only ONCE per (JVM, input key): repeated invocations in one JVM
    * — the bench's best-of-N passes — then time the stream itself, not the
    * input's parquet write. The pid suffix keeps concurrent JVMs disjoint
    * (they cannot delete each other's live checkpoints); a shutdown hook
    * removes the tree on exit. Returns (inputDir, outputDir, checkpointDir). */
  private def streamDirs(name: String, inputKey: String)(
      writeInput: String => Unit): (String, String, String) = {
    val base = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft-$name-${ProcessHandle.current().pid()}")
    if (cleanupRegistered.add(base.toString))
      Runtime.getRuntime.addShutdownHook(
        new Thread(() => try rmrfPath(base) catch { case _: Throwable => () }))
    rmrfPath(base.resolve("out"))
    rmrfPath(base.resolve("ck"))
    val in = base.resolve("in-" + Integer.toHexString(inputKey.hashCode))
    if (streamInputsPrepared.add(in.toString)) {
      rmrfPath(in)
      writeInput(in.toString)
    }
    (in.toString, base.resolve("out").toString, base.resolve("ck").toString)
  }

  /** Flagship: EP1 extraction over the deterministic synthetic corpus —
    * typed zero-shuffle pipeline, spans exploded to rows. */
  def ep1Extract(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val docs: org.apache.spark.sql.Dataset[Doc] = Synth.generate(spark, 200, 8)
    ExtractJob.runTyped(docs, Ep1Config()).toDF()
      .select(col("doc_id"), posexplode(col("spans")).as(Seq("pos", "span")))
      .select(col("doc_id"), col("span.offset").cast("long").as("offset"),
        col("span.kind").as("kind"), col("span.text").as("text"),
        col("span.media_ref").as("media_ref"))
  }

  def entry(spark: SparkSession): DataFrame = ep1Extract(spark)

  // ---------------------------------------------------------------------- //
  // Derived deterministic inputs shared (by construction) with the oracles //
  // ---------------------------------------------------------------------- //

  /** lineitem-derived page text: amounts straddling the $200 bar, skip words
    * on every 7th order. */
  private def pageText: Column =
    concat(lit("item "), col("l_linenumber").cast("string"),
      lit(" limit $"), pmod(col("l_partkey"), lit(400)).cast("string"),
      when(pmod(col("l_orderkey"), lit(7)) === 0, lit(" see EXAMPLE calculation"))
        .otherwise(lit("")))

  /** documents-derived text with keyword/dup/truncation injections. */
  private def docText: Column =
    when(pmod(col("doc_id"), lit(13)) === 0,
      concat(col("text"), lit(" mortgagee: FIRST NATIONAL BANK")))
      .when(pmod(col("doc_id"), lit(17)) === 0, lit("duplicate content block"))
      .when(pmod(col("doc_id"), lit(11)) === 0, substring(col("text"), 1, 5))
      .otherwise(col("text"))

  /** Expected-record schema shared by jsonl_ingest / stream_jsonl. */
  private val jsonlSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("title",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("n",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("body",
      org.apache.spark.sql.types.StringType)))

  /** JSONL lines per document — every 7th truncated mid-JSON (corrupt),
    * every 11th missing the required title (schema drift); shared by the
    * batch and streaming quarantine-ingest queries and replayed by their
    * common oracle. */
  private def jsonlLines(s: SparkSession, d: String): DataFrame = {
    val full = to_json(struct(col("doc_id").cast("long").as("id"),
      concat(lit("T"), col("doc_id").cast("string")).as("title"),
      col("n_chars").cast("long").as("n"), col("text").as("body")))
    val noTitle = to_json(struct(col("doc_id").cast("long").as("id"),
      col("n_chars").cast("long").as("n"), col("text").as("body")))
    val line = when(pmod(col("doc_id"), lit(7)) === 0,
      substring(full, 1, 10))
      .when(pmod(col("doc_id"), lit(11)) === 0, noTitle)
      .otherwise(full)
    rd(s, d, "documents").select(line.as("line"))
  }

  /** Deterministic HTML page per document for the dom_nodes/dom_main
    * contract queries: title + nav anchors + main div (h1, one or two
    * paragraphs sliced from the document text, an optional inline-link
    * paragraph) + footer, seasoned with a comment, a script body holding a
    * bare `<`, and a `>` inside a quoted attribute — every piece a pure
    * function of (doc_id, text) the DuckDB oracle re-renders. */
  private def domHtml: Column = {
    val id = col("doc_id").cast("string")
    val seed = conv(substring(md5(id), 1, 8), 16, 10).cast("long")
    def slice(from: Int) =
      trim(regexp_replace(substring(col("text"), from, 60), "\\s+", " "))
    concat(
      lit("<html><head><title>T"), id,
      lit("</title><script>var x = 1 < 2;</script></head><body>" +
        "<nav><a href=\"/\">Home</a> <a href=\"/about\">About "), id,
      lit("</a></nav>"),
      when(pmod(seed, lit(3)) === 0, lit("<!-- promo -->")).otherwise(lit("")),
      lit("<div class=\"main\" data-x=\"a>b\"><h1>Doc "), id,
      lit("</h1><p>"), slice(1), lit("</p>"),
      when(pmod(seed, lit(2)) === 0,
        concat(lit("<p>"), slice(61), lit("</p>"))).otherwise(lit("")),
      when(pmod(seed, lit(5)) === 0,
        lit("<p>Extra <a href=\"/x\">inline link</a> tail</p>"))
        .otherwise(lit("")),
      lit("</div><footer>(c) 2026 <a href=\"/privacy\">Privacy</a>" +
        "</footer></body></html>"))
  }

  /** lineitem-derived HTML text-span body shared by dom_interleaved and
    * stream_domstrip (and their common oracle): every 11th order is an
    * all-anchor nav (dropped by the strip), the rest a div with h1 + a
    * qty/price paragraph + a boilerplate anchor. */
  private def domSpanText: Column =
    when(pmod(col("l_orderkey"), lit(11)) === 0,
      lit("<nav><a href=\"/\">related item links</a></nav>"))
      .otherwise(concat(lit("<div><h1>Item "),
        col("l_linenumber").cast("string"),
        lit("</h1><p>qty "), col("l_quantity").cast("long").cast("string"),
        lit(" price "), pmod(col("l_partkey"), lit(1000)).cast("string"),
        lit("</p><a href=\"/m\">more</a></div>")))

  private def domMediaRef: Column =
    concat(lit("img-"), col("l_orderkey").cast("string"), lit("-"),
      col("l_linenumber").cast("string"))

  /** Rendered marker documents shared by the qc_head_meta/content contract
    * queries: one page per (orderkey, linenumber), bodies derived from
    * partkeys, concatenated in page order behind PAGE marker blocks. */
  /** Per-(order, page) body rows shared by the qc_head_* queries (and
    * replayed verbatim by their oracles). */
  private def qcHeadPages(s: SparkSession, d: String): org.apache.spark.sql.Dataset[(Long, Int, String)] = {
    import s.implicits._
    rd(s, d, "lineitem")
      .groupBy(col("l_orderkey").as("k"), col("l_linenumber").cast("int").as("page"))
      .agg(min("l_partkey").as("pk"))
      .select(col("k"), col("page"),
        concat(lit("item page "), col("page").cast("string"),
          lit(" of order "), col("k").cast("string"),
          lit(" limit $"), pmod(col("pk"), lit(400)).cast("string"),
          when(pmod(col("pk"), lit(7)) === 0, lit(" see EXAMPLE calculation"))
            .otherwise(lit(""))).as("body"))
      .as[(Long, Int, String)]
  }

  private def qcHeadDocs(s: SparkSession, d: String): org.apache.spark.sql.Dataset[(Long, String)] = {
    import s.implicits._
    qcHeadPages(s, d)
      .groupByKey(_._1)
      .mapGroups { (k: Long, it: Iterator[(Long, Int, String)]) =>
        val txt = it.toSeq.sortBy(_._2)
          .map { case (_, pg, b) => graft.segment.PageSegmenter.renderMarker(pg) + b }
          .mkString
        (k, txt)
      }
  }

  /** Span documents shared by the ep2_* contract queries: per order, an
    * unmarked ocr preamble (exercises the page-1 default), then per page a
    * marker-headed text span, an unmarked ocr span (inherits the page via
    * forward-fill), and on every 3rd page an unmarked table span. */
  private def ep2Docs(s: SparkSession, d: String): org.apache.spark.sql.Dataset[Doc] = {
    import s.implicits._
    import graft.model.{Kind, Span}
    rd(s, d, "lineitem")
      .groupBy(col("l_orderkey").as("k"), col("l_linenumber").cast("int").as("p"))
      .agg(min(pmod(col("l_partkey"), lit(1000))).as("b"))
      .as[(Long, Int, Long)]
      .groupByKey(_._1)
      .mapGroups { (k: Long, it: Iterator[(Long, Int, Long)]) =>
        val rows = it.toSeq.sortBy(_._2)
        val spans = scala.collection.mutable.ArrayBuffer.empty[Span]
        spans += Span(Kind.Ocr, s"preamble of doc $k", null, 0)
        for ((_, p, b) <- rows) {
          spans += Span(Kind.Text,
            graft.segment.PageSegmenter.renderMarker(p) + s"text body $b of page $p",
            null, p * 10 + 1)
          spans += Span(Kind.Ocr, s"ocr body $b page $p", null, p * 10 + 2)
          if (p % 3 == 0) spans += Span(Kind.Table, s"r1|$b\nr2|${b + 1}", null, p * 10 + 3)
        }
        Doc(k.toString, spans.toSeq, (k % 8).toInt)
      }
  }

  /** Gold + perturbed-actual span tables for the span_eval contract queries
    * (exploded rows, no Doc round-trip). Gold: per (order k, page p) a text
    * span at offset 2p and a media span at 2p+1. Actual plants disjoint
    * deterministic defects on page 1: k%13=0 drops the media span (recall),
    * k%17=0 (not 13) swaps the two offsets (order-only), k%19=0 (not 13/17)
    * mutates the text (both), and k%23=0 appends a spurious span at a huge
    * offset (precision). */
  private def spanEvalFrames(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    // the (k, p, b) aggregate feeds FIVE branches (gold text/media, actual
    // text/media, extra) — persist it or the lineitem scan+agg runs 5x
    val pg = graft.io.Persisted.track(
      rd(s, d, "lineitem")
        .groupBy(col("l_orderkey").as("k"), col("l_linenumber").cast("int").as("p"))
        .agg(min(pmod(col("l_partkey"), lit(1000))).as("b"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val id = col("k").cast("string").as("doc_id")
    val body = concat(lit("body "), col("b").cast("string"),
      lit(" page "), col("p").cast("string"))
    val mref = concat(lit("mm-"), col("k").cast("string"),
      lit("-"), col("p").cast("string"))
    val gold = pg.select(id, lit("text").as("kind"), body.as("text"),
        lit("").as("media_ref"), (col("p") * 2).cast("int").as("offset"))
      .unionAll(pg.select(id, lit("media").as("kind"), lit("").as("text"),
        mref.as("media_ref"), (col("p") * 2 + 1).cast("int").as("offset")))
    val swap = pmod(col("k"), lit(17)) === 0 && pmod(col("k"), lit(13)) =!= 0 &&
      col("p") === 1
    val actText = pg.select(id, lit("text").as("kind"),
      when(pmod(col("k"), lit(19)) === 0 && pmod(col("k"), lit(13)) =!= 0 &&
        pmod(col("k"), lit(17)) =!= 0 && col("p") === 1,
        concat(body, lit(" MUTATED"))).otherwise(body).as("text"),
      lit("").as("media_ref"),
      when(swap, col("p") * 2 + 1).otherwise(col("p") * 2).cast("int").as("offset"))
    val actMedia = pg
      .filter(!(pmod(col("k"), lit(13)) === 0 && col("p") === 1))
      .select(id, lit("media").as("kind"), lit("").as("text"),
        mref.as("media_ref"),
        when(swap, col("p") * 2).otherwise(col("p") * 2 + 1).cast("int").as("offset"))
    val extra = pg.filter(pmod(col("k"), lit(23)) === 0)
      .select(col("k")).distinct()
      .select(col("k").cast("string").as("doc_id"), lit("text").as("kind"),
        lit("extra span").as("text"), lit("").as("media_ref"),
        lit(1000000).as("offset"))
    (actText.unionAll(actMedia).unionAll(extra), gold)
  }

  /** Interleaved docs with media spans derived from lineitem (one doc per
    * order): per page a caption text span plus a media span with ref
    * `mm-<k>-<page>`; every 5th page's media span carries an EMPTY ref and
    * must be dropped by the metadata stage's ref filter. Replaces the
    * Synth-only corpus so the md5-replay oracles apply (round-3 VERDICT
    * item 3). */
  private def mediaDocs(s: SparkSession, d: String): org.apache.spark.sql.Dataset[Doc] = {
    import s.implicits._
    import graft.model.{Kind, Span}
    rd(s, d, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_linenumber").cast("int").as("p"))
      .distinct()
      .as[(Long, Int)]
      .groupByKey(_._1)
      .mapGroups { (k: Long, it: Iterator[(Long, Int)]) =>
        val pages = it.map(_._2).toSeq.sorted
        val spans = scala.collection.mutable.ArrayBuffer.empty[Span]
        for (p <- pages) {
          spans += Span(Kind.Text, s"caption $p of doc $k", "", p * 3)
          spans += Span(Kind.Media, "",
            if (p % 5 == 0) "" else s"mm-$k-$p", p * 3 + 1)
        }
        Doc(k.toString, spans.toSeq, (k % 8).toInt)
      }
  }

  /** Two-source EP1 docs rendered from lineitem — the full-cascade corpus
    * shared by ep1_oracle (batch) and stream_extract (same corpus through
    * the checkpointed streaming job): per page an ocr span (with '###'
    * gibberish, dollar amounts straddling the F1 bar, skip words, keywords,
    * and doc-level padding flipping the A2 gate) and a text span. `maxKey`
    * bounds the corpus for the streaming twin (replayed by the oracle's
    * WHERE). */
  private def ep1OracleDocs(s: SparkSession, d: String,
      maxKey: Long = Long.MaxValue): org.apache.spark.sql.Dataset[Doc] = {
    import s.implicits._
    import graft.model.{Kind => MKind, Span => MSpan}
    val pages = rd(s, d, "lineitem")
      .filter(col("l_orderkey") <= maxKey)
      .groupBy(col("l_orderkey").as("k"), col("l_linenumber").cast("int").as("page"))
      .agg(min("l_partkey").as("pk"), min("l_suppkey").as("sk"))
    val rendered = pages.select(col("k"), col("page"),
      when(pmod(col("pk"), lit(17)) === 0, lit("###"))
        .otherwise(concat(lit("ocr page "), col("page").cast("string"),
          lit(" of "), col("k").cast("string"),
          lit(" limit $"), pmod(col("pk"), lit(400)).cast("string"),
          when(pmod(col("pk"), lit(11)) === 0, lit(" loss payee noted")).otherwise(lit("")),
          when(pmod(col("pk"), lit(7)) === 0, lit(" see EXAMPLE calculation")).otherwise(lit("")),
          when(pmod(col("k"), lit(2)) === 0, repeat(lit(" pad"), 75)).otherwise(lit(""))))
        .as("obody"),
      concat(lit("text page "), col("page").cast("string"),
        lit(" of "), col("k").cast("string"),
        lit(" amount $"), pmod(col("sk"), lit(400)).cast("string"),
        when(pmod(col("sk"), lit(13)) === 0, lit(" mortgagee listed")).otherwise(lit("")))
        .as("tbody"))
    rendered.as[(Long, Int, String, String)]
      .groupByKey(_._1)
      .mapGroups { (k: Long, it: Iterator[(Long, Int, String, String)]) =>
        val spans = it.toSeq.sortBy(_._2).flatMap { case (_, pg, ob, tb) =>
          Seq(MSpan(MKind.Ocr, graft.segment.PageSegmenter.renderMarker(pg) + ob, "", pg * 2),
            MSpan(MKind.Text, graft.segment.PageSegmenter.renderMarker(pg) + tb, "", pg * 2 + 1))
        }
        Doc(k.toString, spans, (k % 8).toInt)
      }
  }

  /** Shared fixture for the temporal-join contract queries: clicks as the
    * probe side, purchases aggregated to one row per (user_id, ts) — the
    * as-of right side must be (key, ts)-unique — with cent-exact values. */
  private def asofFixture(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val ev = rd(s, d, "events").select(col("event_id"), col("user_id"),
      unix_micros(col("ts").cast("timestamp")).as("us"), col("event_type"),
      col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "us")
    val purch = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("us").as("pus"))
      .agg(sum(round(col("value") * 100).cast("long")).as("purchase_cents"))
    (clicks, purch)
  }

  private val moneyVariants = Seq(
    "$1,234", "Included", "2%", "Inside $10,000 / Outside $10,000",
    "", "$ 500 ", "no digits here", "$0.00")

  // ---------------------------------------------------------------------- //

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ------------------------------------------------- relational core ----
    "q1_agg" -> ((s, d) => {
      rd(s, d, "lineitem").groupBy("l_returnflag", "l_linestatus").agg(
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long")).as("revenue_cents"),
        count(lit(1)).as("count_order"))
    }),

    "q3_top_orders" -> ((s, d) => {
      val rev = rd(s, d, "lineitem").groupBy("l_orderkey")
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long")).as("revenue_cents"))
      rev.orderBy(col("revenue_cents").desc, col("l_orderkey")).limit(10)
    }),

    "region_order_counts" -> ((s, d) => {
      rd(s, d, "orders")
        .join(rd(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(rd(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(rd(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
    }),

    "top3_orders_per_customer" -> ((s, d) => {
      // the TRUE window-plan comparator for topk_native/topk_rewrite: the
      // sessions now default spark.graft.topk.rewrite=true, so pin this
      // query's plan to the window form (flag lowered around the lazy
      // optimizedPlan, which caches in this QueryExecution) — otherwise
      // the native-vs-window bench pair would silently compare the native
      // operator to itself. (The kept rnk column already blocks the
      // rewrite shape, but the pin is explicit and asserted.)
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val df = rd(s, d, "orders").withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rnk").cast("long").as("rnk"))
      val key = org.apache.spark.sql.graftshim.WindowTopKRewrite.ConfKey
      val prev = s.conf.getOption(key)
      s.conf.set(key, "false")
      try {
        require(df.queryExecution.optimizedPlan.toString.contains("Window"),
          "expected the pinned window plan")
      } finally prev.fold(s.conf.unset(key))(s.conf.set(key, _))
      df
    }),

    // The same top-3-per-customer through the NATIVE whole-operator plan
    // (custom LogicalPlan -> GraftTopKPartial/Final SparkPlans): bounded
    // per-key heaps on the map side, <= k rows per key per partition through
    // the exchange, no per-group sort — versus the window form above that
    // shuffles and sorts every order row of every customer.
    "topk_native" -> ((s, d) =>
      org.apache.spark.sql.graftshim.GraftTopK.perKey(
        rd(s, d, "orders"),
        keys = Seq("o_custkey"),
        order = Seq(("o_totalprice", true), ("o_orderkey", false)),
        k = 3)
        .select(col("o_custkey"), col("o_orderkey"))),

    // The SAME query written as the ordinary window idiom, rewritten to the
    // native operator by the injected optimizer rule
    // (spark.graft.topk.rewrite): the flag is raised only around plan
    // optimization (cached in this QueryExecution), and construction FAILS
    // if the rewrite did not fire — a silently-kept window would still pass
    // the oracle and hide a rule regression.
    "topk_rewrite" -> ((s, d) => {
      org.apache.spark.sql.graftshim.GraftRegistration.ensure(s)
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val df = rd(s, d, "orders").withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"))
      val key = org.apache.spark.sql.graftshim.WindowTopKRewrite.ConfKey
      val prev = s.conf.getOption(key)
      s.conf.set(key, "true")
      try {
        val opt = df.queryExecution.optimizedPlan
        require(opt.toString.contains("TopKPerKey"),
          s"window-to-TopK rewrite did not fire:\n$opt")
      } finally prev.fold(s.conf.unset(key))(s.conf.set(key, _))
      df
    }),

    "sessionize" -> ((s, d) => {
      val ev = rd(s, d, "events")
        .select(col("user_id"),
          // parquet timestamp is NTZ; session TZ is UTC, so this matches
          // DuckDB's naive epoch_us exactly
          unix_micros(col("ts").cast("timestamp")).as("us"), col("event_id"))
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      ev.withColumn("prev", lag("us", 1).over(w))
        .withColumn("new_sess",
          when(col("prev").isNull || col("us") - col("prev") > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("sess", sum("new_sess").over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sess")
        .agg(min("us").as("session_start_us"), max("us").as("session_end_us"),
          count(lit(1)).as("n_events"))
        .select("user_id", "session_start_us", "session_end_us", "n_events")
    }),

    "event_type_stats" -> ((s, d) => {
      rd(s, d, "events").groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
    }),

    // The hot-key join lever as a contract query: the big side (events) is
    // salted on a per-row discriminator so one hot join key spreads across 8
    // partitions, the small side replicates 8-fold, and the join result is
    // provably identical to the unsalted join — the oracle recomputes the
    // weighted aggregate WITHOUT any join, so a dropped or duplicated row
    // from the salting would break parity.
    "salted_join" -> ((s, d) => {
      val ev = rd(s, d, "events")
      val dim = ev.select(col("event_type")).distinct()
        .withColumn("weight", length(col("event_type")).cast("long"))
      graft.io.Skew.saltedJoin(ev, dim, Seq("event_type"), col("event_id"), n = 8)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long") * col("weight"))
            .as("weighted_cents"))
    }),

    // The co-located-join lever: both sides written ONCE as bucketed+sorted
    // managed tables on the join key, then joined back — the planner proves
    // co-location from the bucket layout and plans the join with NO exchange
    // on either side (asserted in BucketingSpec). At 100 TB this moves the
    // corpus-wide join shuffle to write time, paid once.
    "bucket_join" -> ((s, d) => {
      val orders = rd(s, d, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
      val cust = rd(s, d, "customer").select("c_custkey", "c_nationkey")
      graft.io.Bucketing.writeBucketed(orders, "graft_orders_bucketed", Seq("o_custkey"), 8)
      graft.io.Bucketing.writeBucketed(cust, "graft_customer_bucketed", Seq("c_custkey"), 8)
      val o = s.table("graft_orders_bucketed")
      val c = s.table("graft_customer_bucketed")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("price_cents"))
    }),

    // Backward as-of join (TemporalJoins.asofJoin — union-and-forward-fill,
    // one key shuffle, never an inequality join): every click event gets the
    // most recent at-or-before purchase of the same user. The oracle is
    // DuckDB's native ASOF LEFT JOIN — an independent engine's
    // implementation of the same semantics, not a replay of ours.
    "asof_join" -> ((s, d) => {
      val (clicks, purch) = asofFixture(s, d)
      graft.join.TemporalJoins.asofJoin(
        clicks, purch, "user_id", "us", "pus", Seq("purchase_cents"))
    }),

    // Same join with a 1-hour tolerance: matches older than the window are
    // nulled, exercising the staleness path end-to-end.
    "asof_tolerance" -> ((s, d) => {
      val (clicks, purch) = asofFixture(s, d)
      graft.join.TemporalJoins.asofJoin(
        clicks, purch, "user_id", "us", "pus", Seq("purchase_cents"),
        toleranceMicros = Some(3600L * 1000000L))
    }),

    // Interval containment join (TemporalJoins.rangeJoin — time-bucketed
    // equi-join; a raw BETWEEN join would plan as BroadcastNestedLoopJoin):
    // all (click, purchase-window) pairs where the click lands within 24
    // hours after a purchase by the same user. 6-hour buckets.
    "range_join" -> ((s, d) => {
      val (clicks, purch) = asofFixture(s, d)
      val ivs = purch.select(col("user_id").as("iu"), col("pus").as("win_start"),
        (col("pus") + 86400L * 1000000L).as("win_end"))
      graft.join.TemporalJoins.rangeJoin(
          clicks.withColumnRenamed("user_id", "cu"), "cu", "us",
          ivs, "iu", "win_start", "win_end", 21600L * 1000000L)
        .select(col("event_id"), col("cu").as("user_id"), col("us"),
          col("win_start"))
    }),

    "interval_overlap" -> ((s, d) => {
      // interval × interval overlap join (sessions vs incidents shape):
      // click intervals vs purchase intervals per user, bucket-cover
      // equi-join with the one-bucket-owns-the-pair rule — no dedup pass,
      // no per-key cross product
      val ev = rd(s, d, "events").select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"), col("event_type"))
      val l = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("lid"), col("user_id").as("lk"),
          col("us").as("ls"),
          (col("us") + pmod(col("event_id"), lit(50)) * 60000000L).as("le"))
      val r = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("rid"), col("user_id").as("rk"),
          col("us").as("rs"),
          (col("us") + pmod(col("event_id"), lit(30)) * 60000000L).as("re"))
      graft.join.TemporalJoins.intervalOverlapJoin(l, "lk", "ls", "le",
          r, "rk", "rs", "re", bucketUnits = 3600L * 1000000L)
        .select(col("lid"), col("rid"),
          (least(col("le"), col("re")) - greatest(col("ls"), col("rs")))
            .as("overlap_micros"))
    }),

    // --------------------------------------------- extraction semantics ---
    "f1_dollar_filter" -> ((s, d) => {
      rd(s, d, "lineitem").withColumn("text", pageText)
        .filter(Filters.f1DollarPageCol(col("text")))
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("page"))
    }),

    "f2_keyword_filter" -> ((s, d) => {
      rd(s, d, "documents").withColumn("t2", docText)
        .filter(Filters.f2KeywordCol(col("t2")))
        .select("doc_id")
    }),

    "f5_gibberish" -> ((s, d) => {
      rd(s, d, "documents").withColumn("t2", docText)
        .select(col("doc_id"), Filters.f5GibberishCol(col("t2")).as("is_gibberish"))
    }),

    "f6_scrub" -> ((s, d) => {
      rd(s, d, "documents")
        .withColumn("noisy", concat(col("text"), lit("\u0001\u0002  tail")))
        .select(col("doc_id"),
          length(Filters.f6ScrubCol(col("noisy"))).cast("long").as("clean_len"))
    }),

    "money_norm" -> ((s, d) => {
      val v = element_at(
        array(moneyVariants.map(lit): _*),
        (pmod(col("p_partkey"), lit(moneyVariants.length)) + 1).cast("int"))
      rd(s, d, "part").select(col("p_partkey"), v.as("raw"),
        Norms.normalizeMoneyCol(v).as("normalized"))
    }),

    "islands_merge" -> ((s, d) => {
      val li = rd(s, d, "lineitem")
      val hits = li.filter(col("l_quantity") >= 45)
        .select(col("l_orderkey").as("k"), col("l_linenumber").cast("long").as("page"))
        .distinct()
      val dom = li.groupBy(col("l_orderkey").as("k"))
        .agg(min(col("l_linenumber")).cast("long").as("min_page"),
          max(col("l_linenumber")).cast("long").as("max_page"))
      Islands.mergeRangesDf(hits.join(dom, Seq("k")), Seq("k"),
        "page", "min_page", "max_page", buffer = 1)
        .select(col("k"), col("range_start").cast("long").as("range_start"),
          col("range_end").cast("long").as("range_end"))
    }),

    "r2_neighbors" -> ((s, d) => {
      rd(s, d, "lineitem").filter(col("l_quantity") >= 45)
        .select(col("l_orderkey").as("k"), col("l_linenumber").cast("long").as("p"))
        .select(col("k"), explode(sequence(col("p") - 2, col("p") + 2)).as("page"))
        .filter(col("page") >= 0).distinct()
    }),

    "r4_range_slice" -> ((s, d) => {
      val li = rd(s, d, "lineitem")
      val pages = li.select(col("l_orderkey").as("k"),
        col("l_linenumber").cast("long").as("page")).distinct()
      val hits = li.filter(col("l_quantity") >= 45)
        .select(col("l_orderkey").as("k"), col("l_linenumber").cast("long").as("page"))
        .distinct()
      val dom = pages.groupBy("k")
        .agg(min("page").as("min_page"), max("page").as("max_page"))
      val ranges = Islands.mergeRangesDf(hits.join(dom, Seq("k")), Seq("k"),
        "page", "min_page", "max_page", buffer = 1)
      val valid = ranges
        .join(pages.withColumnRenamed("page", "range_start"), Seq("k", "range_start"), "left_semi")
        .join(pages.withColumnRenamed("page", "range_end"), Seq("k", "range_end"), "left_semi")
      pages.join(valid, Seq("k"))
        .filter(col("page").between(col("range_start"), col("range_end")))
        .select("k", "page").distinct()
    }),

    "j1_interleave" -> ((s, d) => {
      val li = rd(s, d, "lineitem")
      val a = li.filter(col("l_returnflag") === "R")
        .groupBy(col("l_orderkey").as("k"), col("l_linenumber").cast("long").as("page"))
        .agg(min(col("l_partkey")).as("pk"))
        .select(col("k"), col("page"), concat(lit("R:"), col("pk").cast("string")).as("ocr_text"))
      val b = li.filter(col("l_linestatus") === "F")
        .groupBy(col("l_orderkey").as("k"), col("l_linenumber").cast("long").as("page"))
        .agg(min(col("l_partkey")).as("pk"))
        .select(col("k"), col("page"), concat(lit("F:"), col("pk").cast("string")).as("text_text"))
      a.join(b, Seq("k", "page"), "full_outer")
        .select(col("k"), col("page"),
          coalesce(col("ocr_text"), lit("[Page not found in ocr extraction]")).as("ocr_text"),
          coalesce(col("text_text"), lit("[Page not found in text extraction]")).as("text_text"))
    }),

    "p2_first_wins" -> ((s, d) => {
      val w = Window.partitionBy("k", "page").orderBy("l_linenumber")
      rd(s, d, "lineitem")
        .select(col("l_orderkey").as("k"), pmod(col("l_suppkey"), lit(3)).as("page"),
          col("l_linenumber"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("k"), col("page").cast("long").as("page"),
          col("l_linenumber").cast("long").as("winner_line"))
    }),

    "j2_three_way" -> ((s, d) => {
      // 3-way interleave in the reference's source order (table ≺ text ≺
      // ocr = pdfplumber ≺ PyMuPDF ≺ Tesseract) with per-source placeholders
      val li = rd(s, d, "lineitem")
      def rel(cond: Column, tag: String): DataFrame = li.filter(cond)
        .groupBy(col("l_orderkey").as("doc_id"), col("l_linenumber").cast("long").as("page"))
        .agg(min("l_partkey").as("pk"))
        .select(col("doc_id"), col("page"),
          concat(lit(tag + ":"), col("pk").cast("string")).as("text"))
      graft.interleave.Interleave.interleave(Seq(
        "table" -> rel(col("l_returnflag") === "R", "T"),
        "text" -> rel(col("l_linestatus") === "F", "X"),
        "ocr" -> rel(pmod(col("l_partkey"), lit(3)) === 0, "O")))
        .select(col("doc_id"), col("page"), col("kind"),
          col("source_rank").cast("long").as("source_rank"), col("text"))
    }),

    "f7_tier_invalid" -> ((s, d) => {
      val noisy = when(pmod(col("doc_id"), lit(5)) === 0,
        concat(repeat(lit("\u0001"), 200), col("text")))
        .when(pmod(col("doc_id"), lit(7)) === 0, lit(""))
        .otherwise(col("text"))
      rd(s, d, "documents")
        .select(col("doc_id"), Filters.f7TierInvalidCol(noisy).as("invalid"))
    }),

    "f10_valid_value" -> ((s, d) => {
      val variants = Seq("TBD", " n/a ", "NONE", "", "  ", "CERT-42", "tbd!", "ok value ")
      val v = element_at(array(variants.map(lit): _*),
        (pmod(col("p_partkey"), lit(variants.length)) + 1).cast("int"))
      rd(s, d, "part").select(col("p_partkey"), v.as("raw"),
        FE.validValue(v).as("valid_value"))
    }),

    "a4_patch_total" -> ((s, d) => {
      // summary-total consistency patch: total forced to array size
      val df = rd(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("items"),
          lit(999L).as("total"))
      Qc.patchSummaryTotal(df, "items")
        .select(col("doc_id"), col("total").cast("long").as("total"))
    }),

    "p5_line_number" -> ((s, d) => {
      // P5 over rendered marker documents: line number and containing page
      // of each boundary's start position
      import s.implicits._
      rd(s, d, "lineitem")
        .groupBy(col("l_orderkey").as("k"), col("l_linenumber").cast("int").as("page"))
        .agg(min("l_partkey").as("pk"))
        .select(col("k"), col("page"), concat(lit("body "), col("pk").cast("string")).as("body"))
        .as[(Long, Int, String)].groupByKey(_._1)
        .flatMapGroups { (k: Long, it: Iterator[(Long, Int, String)]) =>
          val rows = it.toSeq.sortBy(_._2)
          val txt = rows.map { case (_, pg, b) =>
            graft.segment.PageSegmenter.renderMarker(pg) + b }.mkString
          val bounds = graft.segment.PageSegmenter.p1Boundaries(txt)
          val idx = new graft.qc.QcHead.BoundaryIndex(bounds)
          bounds.iterator.map(b => (k, b.page.toLong,
            graft.qc.QcHead.lineNumber(txt, b.start).toLong,
            idx.pageAt(b.start + 1).toLong))
        }.toDF("k", "page", "line_no", "page_at")
    }),

    "p4_property_prune" -> ((s, d) => {
      val pages = rd(s, d, "lineitem").select(
        col("l_orderkey").as("k"), col("l_linenumber").cast("long").as("page"),
        when(pmod(col("l_partkey"), lit(5)) === 0,
          lit("PROPERTY SECTION with Building details"))
          .when(pmod(col("l_partkey"), lit(5)) === 1, lit("PROPERTY SECTION other"))
          .otherwise(lit("plain page")).as("text")).distinct()
      val hasSection = pages.filter(col("text").contains("PROPERTY SECTION"))
        .select("k").distinct()
      val matchW = Window.partitionBy("k").orderBy("page")
      val firstMatch = pages
        .filter(col("page") =!= 1 && col("text").contains("PROPERTY SECTION") &&
          (col("text").contains("Building") || col("text").contains("Business Income") ||
            col("text").contains("Equipment Breakdown")))
        .withColumn("rn", row_number().over(matchW)).filter(col("rn") === 1)
        .select("k", "page")
      val pruned = pages.join(hasSection, Seq("k"), "left_semi")
        .join(firstMatch.withColumnRenamed("page", "mpage"), Seq("k"), "left")
        .filter(col("page") === 1 || col("page") === col("mpage"))
        .select("k", "page")
      val untouched = pages.join(hasSection, Seq("k"), "left_anti").select("k", "page")
      pruned.unionByName(untouched).distinct()
    }),

    // ----------------------------------------------- classification -------
    "coverage_classify" -> ((s, d) => {
      val names = Seq(
        "Building", "Building - Location 2", "Building with Pumps & Canopy",
        "Business Personal Property", "BPP", "BPP In Transit",
        "Money & Securities", "Counterfeit Money", "Equipment Breakdown",
        "Equipment Breakdown Deductible", "Outdoor Signs", "Signs Description",
        "Employee Dishonesty", "Pumps & Canopy", "Pumps", "Canopy",
        "Theft", "Theft Deductible", "Windstorm", "Business Income")
      val name = element_at(array(names.map(lit): _*),
        (pmod(col("p_partkey"), lit(names.length)) + 1).cast("int"))
      rd(s, d, "part").select(col("p_partkey"), name.as("name"),
        CC.isBuildingCol(name).as("is_building"),
        CC.isBppCol(name).as("is_bpp"),
        CC.isMoneySecuritiesCol(name).as("is_money_securities"),
        CC.isEquipmentBreakdownCol(name).as("is_equipment_breakdown"),
        CC.isOutdoorSignsCol(name).as("is_outdoor_signs"),
        CC.isEmployeeDishonestyCol(name).as("is_employee_dishonesty"),
        CC.isTheftCol(name).as("is_theft"),
        CC.isWindHailCol(name).as("is_wind_hail"),
        CC.isBusinessIncomeCol(name).as("is_business_income"),
        CC.pumpsCanopyLevelCol(name).cast("long").as("pc_level"))
    }),

    "c7_precedence" -> ((s, d) => {
      val names = Seq(
        "Building with Pumps & Canopy", "Pumps & Canopy", "Pumps", "Canopy",
        "Building", "Theft")
      val name = element_at(array(names.map(lit): _*),
        (pmod(col("p_partkey"), lit(names.length)) + 1).cast("int"))
      rd(s, d, "part")
        .select(pmod(col("p_partkey"), lit(30)).as("grp"),
          CC.pumpsCanopyLevelCol(name).cast("long").as("lvl"))
        .groupBy("grp")
        .agg(min(when(col("lvl") > 0, col("lvl"))).as("winning_level"))
    }),

    "gl_limits_extract" -> ((s, d) => {
      val text = concat(
        lit("POLICY NUMBER: POL-"), col("c_custkey").cast("string"),
        lit("\nEACH OCCURRENCE LIMIT  $ 1,000,000\nGENERAL AGGREGATE LIMIT  $ "),
        (pmod(col("c_custkey"), lit(4)) + 1).cast("string"), lit(",000,000\n"),
        when(pmod(col("c_custkey"), lit(3)) === 0,
          lit("MED EXP (Any one person) $ 5,000\n")).otherwise(lit("")))
      rd(s, d, "customer").select(col("c_custkey"),
        FE.policyNumber(text).as("policy_number"),
        FE.glLimit(text, "each_occurrence").as("each_occurrence"),
        FE.glLimit(text, "general_aggregate").as("general_aggregate"),
        FE.glLimit(text, "medical_expense").as("med_exp"))
    }),

    "gl_section_limits" -> ((s, d) => {
      // C11-C14: per-section limit families through the F8 money scrub,
      // over deterministically synthesized limit maps (every scrub branch
      // exercised: kept, $0-normalized, empty-skipped, missing-skipped)
      import s.implicits._
      val sections = CC.GlSections.map(_._1)
      val variants = Seq("$1,000,000", "$0.00", "", "$", null, " $2,000,000 ")
      rd(s, d, "customer").select(col("c_custkey")).as[Long].flatMap { k =>
        val section = sections((k % 4).toInt)
        val limits = CC.GlSections.toMap.apply(section).zipWithIndex.map {
          case ((key, _), i) => key -> variants(((k + i) % 6).toInt)
        }.toMap
        CC.glSectionLimits(section, limits).map(li =>
          (k, li.coverage_section, li.limit_key, li.limit_label, li.value))
      }.toDF("c_custkey", "coverage_section", "limit_key", "limit_label", "value")
    }),

    "c15_presence_list" -> ((s, d) => {
      // C15: coverage-presence list — sections kept iff present with a
      // non-empty policy number
      import s.implicits._
      rd(s, d, "customer").select(col("c_custkey")).as[Long].flatMap { k =>
        val sections = CC.PresenceSections.zipWithIndex.flatMap { case ((key, _), i) =>
          if ((k + i) % 3 == 0) None
          else Some(key -> Map(
            "policy_number" -> (if ((k + i) % 4 == 0) "" else s"PN-$k-$i"),
            "policy_eff" -> "01/01/2025",
            "policy_exp" -> (if ((k + i) % 5 == 0) null else "01/01/2026")))
        }.toMap
        CC.presenceList(sections).map(p =>
          (k, p.coverage_key, p.coverage_name, p.policy_number, p.policy_eff, p.policy_exp))
      }.toDF("c_custkey", "coverage_key", "coverage_name", "policy_number",
        "policy_eff", "policy_exp")
    }),

    "c16_interests" -> ((s, d) => {
      // C16: additional-interests 0/1/N normalization — array form wins,
      // flat form falls back, empty name yields nothing
      import s.implicits._
      rd(s, d, "customer").select(col("c_custkey")).as[Long].flatMap { k =>
        val (arrayForm, flatName, flatAddress) = (k % 4) match {
          case 0 => (Some(Seq(CC.Interest(s"Bank $k", s"$k Main St"),
            CC.Interest(s"Lender $k", ""))), None, None)
          case 1 => (None, Some(s"Sole Interest $k"), Some(s"$k Oak Ave"))
          case 2 => (None, Some(""), Some(s"$k Elm Rd"))
          case _ => (None, None, None)
        }
        CC.normalizeInterests(arrayForm, flatName, flatAddress)
          .zipWithIndex.map { case (in, i) => (k, i.toLong, in.name, in.address) }
      }.toDF("c_custkey", "idx", "name", "address")
    }),

    // ------------------------------------ §2.8 field-extraction battery ----
    // Each query synthesizes deterministic policy-shaped text from customer
    // keys (same construction replayed verbatim in the DuckDB oracle) and
    // runs the FieldExtractors battery over it — the regexes themselves are
    // the system under test, exercised across present/absent/alternate-form
    // variants including every pattern alternate in the coalesce chains.

    "prop_table_extract" -> ((s, d) => {
      // traveler/qc_head.py:856-923 — the 9-coverage property table:
      // amounts + deductibles, labelled + fallback forms, INCLUDED /
      // ACTUAL LOSS SUSTAINED / percent-deductible alternates, missing lines
      val k = col("c_custkey")
      val labels = Seq(
        "BUILDING", "BUSINESS PERSONAL PROPERTY", "BUSINESS INCOME",
        "EQUIPMENT BREAKDOWN", "EMPLOYEE DISHONESTY", "MONEY & SECURITIES",
        "PUMPS & CANOPY", "OUTDOOR SIGNS", "WINDSTORM OR HAIL")
      def std(i: Int) = concat((pmod(k + i, lit(9)) + 1).cast("string"), lit(",000"))
      def amtVal(label: String, i: Int): Column = label match {
        case "BUSINESS INCOME" =>
          when(pmod(k + i, lit(2)) === 0, lit("ACTUAL LOSS SUSTAINED")).otherwise(std(i))
        case "EQUIPMENT BREAKDOWN" =>
          when(pmod(k + i, lit(2)) === 0, lit("INCLUDED")).otherwise(std(i))
        case _ => std(i)
      }
      def block(label: String, i: Int): Column = {
        val labelled = concat(lit(s"$label AMOUNT OF INSURANCE: "),
          amtVal(label, i), lit("\n"))
        val amtLine =
          if (label == "BUILDING")
            // every 5th doc uses the unlabelled fallback form (pattern 2)
            when(pmod(k, lit(5)) === 0, lit("BUILDING: 750,000\n"))
              .when(pmod(k + i, lit(3)) =!= 2, labelled).otherwise(lit(""))
          else when(pmod(k + i, lit(3)) =!= 2, labelled).otherwise(lit(""))
        val dedVal = when(pmod(k + i, lit(5)) === 0,
          concat((pmod(k + i, lit(3)) + 1).cast("string"), lit("%")))
          .otherwise(concat(lit("1,"), pmod(k + i, lit(9)).cast("string"), lit("00")))
        val dedLine = when(pmod(k + i, lit(4)) =!= 3,
          concat(lit(s"$label DEDUCTIBLE: "), dedVal, lit("\n"))).otherwise(lit(""))
        concat(amtLine, dedLine)
      }
      val text = concat(labels.zipWithIndex.map { case (l, i) => block(l, i) }: _*)
      val covKeys = FE.PropertyCoveragePatterns.map(_._1)
      rd(s, d, "customer").withColumn("__t", text).select(
        k +: col("__t").as("ptext") +: covKeys.flatMap { c =>
          Seq(FE.propertyAmount(col("__t"), c).as(s"${c}_amt"),
            FE.propertyDeductible(col("__t"), c).as(s"${c}_ded"))
        }: _*)
    }),

    "perils_flags" -> ((s, d) => {
      // traveler/qc_head.py:925-937 — BASIC/BROAD/SPECIAL/REPLACEMENT COST
      // flags; BASICALLY proves the \b word boundary holds
      val k = col("c_custkey")
      val text = concat(
        when(pmod(k, lit(2)) === 0, lit("Covered Causes of Loss: BASIC\n")).otherwise(lit("")),
        when(pmod(k, lit(4)) === 1, lit("BASICALLY unrelated words\n")).otherwise(lit("")),
        when(pmod(k, lit(3)) === 0, lit("BROAD form applies\n")).otherwise(lit("")),
        when(pmod(k, lit(5)) =!= 1, lit("SPECIAL causes of loss included\n")).otherwise(lit("")),
        when(pmod(k, lit(7)) === 0, lit("valued at REPLACEMENT COST\n"))
          .otherwise(lit("actual cash value\n")))
      rd(s, d, "customer").withColumn("__t", text).select(k, col("__t").as("ptext"),
        FE.perilBasic(col("__t")).as("peril_basic"),
        FE.perilBroad(col("__t")).as("peril_broad"),
        FE.perilSpecial(col("__t")).as("peril_special"),
        FE.perilReplacementCost(col("__t")).as("peril_replacement_cost"))
    }),

    "insured_dba" -> ((s, d) => {
      // traveler/qc_head.py:709-725 — named insured with DBA split: labelled
      // + fallback patterns, multi-line capture, lowercase dba, no-insured
      val k = col("c_custkey")
      val ks = k.cast("string")
      val text =
        when(pmod(k, lit(4)) === 0,
          concat(lit("POLICY NUMBER: POL-"), ks,
            lit("\nNAMED INSURED: Acme Holdings "), ks, lit(" DBA: Joes Diner "), ks))
          .when(pmod(k, lit(4)) === 1,
            concat(lit("NAMED INSURED: Solo Corp "), ks, lit("\nSecond Line Inc")))
          .when(pmod(k, lit(4)) === 2,
            concat(lit("INSURED: Fallback LLC "), ks, lit(" dba Side Biz "), ks))
          .otherwise(lit("no insured block here"))
      rd(s, d, "customer").withColumn("__t", text).select(k,
        FE.insuredRaw(col("__t")).as("insured_raw"),
        FE.namedInsured(col("__t")).as("named_insured"),
        FE.dba(col("__t")).as("dba"))
    }),

    "head_dates" -> ((s, d) => {
      // traveler/qc_head.py:737-766 — mailing address (whitespace-collapsed,
      // multi-line) + effective/expiration/issue dates across all alternates
      val k = col("c_custkey")
      val ks = k.cast("string")
      val text = concat(
        when(pmod(k, lit(3)) === 0,
          concat(lit("EFFECTIVE DATE: 01/15/2025\nEXPIRATION DATE: 01/15/2026\nISSUE DATE: 12/0"),
            (pmod(k, lit(9)) + 1).cast("string"), lit("/2024\n")))
          .when(pmod(k, lit(3)) === 1, lit("coverage runs FROM 03/01/2025 TO 03/01/2026\n"))
          .otherwise(lit("POLICY EXP: 07/04/2027\n")),
        when(pmod(k, lit(2)) === 0,
          concat(lit("MAILING ADDRESS: "), ks, lit(" Main St\nSuite 12")))
          .otherwise(concat(lit("ADDRESS: "), ks, lit(" Oak Ave"))))
      rd(s, d, "customer").withColumn("__t", text).select(k,
        FE.mailingAddress(col("__t")).as("mailing_address"),
        FE.effectiveDate(col("__t")).as("effective_date"),
        FE.expirationDate(col("__t")).as("expiration_date"),
        FE.issueDate(col("__t")).as("issue_date"))
    }),

    "policy_probes" -> ((s, d) => {
      // hartford_done/llm4nano.py:212-244 + qc_head.py:822-831 — the policy
      // text probes: aggregate-applies-per flags, Class-N amount windows
      // (money-normalized), explicit standalone Building limit (3 layout
      // styles, negative-lookahead exclusion of the combined form)
      val k = col("c_custkey")
      val text = concat(
        when(pmod(k, lit(3)) === 0, lit("GENERAL AGGREGATE LIMIT APPLIES PER: POLICY\n"))
          .when(pmod(k, lit(3)) === 1, lit("AGGREGATE LIMIT APPLIES PER LOCATION\n"))
          .otherwise(lit("")),
        when(pmod(k, lit(2)) === 0,
          concat(lit("Class 1 rating basis\nPremium $ 12,"),
            pmod(k, lit(10)).cast("string"), lit("00\n"))).otherwise(lit("")),
        when(pmod(k, lit(4)) === 0, lit("Class 2 subtotal $ 9,999\n")).otherwise(lit("")),
        when(pmod(k, lit(5)) === 0, lit("10 20 Building\nblah $ 100,000\n"))
          .when(pmod(k, lit(5)) === 1, lit("Building\n$ 250,000\n"))
          .when(pmod(k, lit(5)) === 2, lit("Building and Personal Property $ 400,000\n"))
          .when(pmod(k, lit(5)) === 3, lit("Building   $300,000\n"))
          .otherwise(lit("")))
      rd(s, d, "customer").withColumn("__t", text).select(k,
        FE.aggregateAppliesPer(col("__t"), "POLICY").as("agg_per_policy"),
        FE.aggregateAppliesPer(col("__t"), "PROJECT").as("agg_per_project"),
        FE.aggregateAppliesPer(col("__t"), "LOCATION").as("agg_per_location"),
        FE.classAmount(col("__t"), 1).as("class1_amount"),
        FE.classAmount(col("__t"), 2).as("class2_amount"),
        FE.hasExplicitBuildingLimit(col("__t")).as("has_building_limit"))
    }),

    "gl_limits_tail" -> ((s, d) => {
      // qc_head.py:783-812 — the 3 GL limit families gl_limits_extract does
      // not cover: products-comp/op (INCLUDED alternate), personal & adv
      // injury (null on the unmatched AND spelling), damage-to-rented (both
      // word orders, missing line)
      val k = col("c_custkey")
      val text = concat(
        lit("PRODUCTS - COMP/OP AGG $ "),
        when(pmod(k, lit(2)) === 0, lit("2,000,000")).otherwise(lit("INCLUDED")), lit("\n"),
        when(pmod(k, lit(3)) === 2, lit("PERSONAL AND ADVERTISING INJURY $ 500,000\n"))
          .otherwise(lit("PERSONAL & ADV INJURY $ 1,000,000\n")),
        when(pmod(k, lit(4)) === 3, lit(""))
          .when(pmod(k, lit(2)) === 0, lit("DAMAGE TO RENTED PREMISES (Ea occurrence) $ 100,000\n"))
          .otherwise(lit("DAMAGE TO PREMISES RENTED TO YOU $ 50,000\n")))
      rd(s, d, "customer").withColumn("__t", text).select(k,
        FE.glLimit(col("__t"), "products_completed_operations").as("products_comp_op"),
        FE.glLimit(col("__t"), "personal_advertising_injury").as("personal_adv_injury"),
        FE.glLimit(col("__t"), "damage_to_rented_premises").as("damage_rented"))
    }),

    "misc_fields_head" -> ((s, d) => {
      // qc_head.py:967-1060 — the misc-field tail, head half: premiums
      // (last-match-per-pattern), insurer name (greedy \s-spanning class,
      // comma-bounded), NAIC, producer name/phone/email, the holder family
      // (4 independent extracts), occurrence-vs-claims-made precedence,
      // aggregate-applies-per capture form. Blank lines fence the
      // multi-line captures so each variant's expected value is readable.
      val k = col("c_custkey")
      val ks = k.cast("string")
      val d10 = pmod(k, lit(10)).cast("string")
      val text = concat(
        when(pmod(k, lit(3)) === 0,
          concat(lit("PREMIUM: $ 1,200.50\nADVANCE PREMIUM: $ 9"), d10, lit("0\n\n")))
          .when(pmod(k, lit(3)) === 1,
            concat(lit("TOTAL: 3,4"), d10, lit("0\nPREMIUM: 777\n\n")))
          .otherwise(lit("")),
        when(pmod(k, lit(4)) === 0,
          concat(lit("INSURER: ACME INSURANCE CO "), d10, lit(", ADMITTED\nNAIC # A123"), d10, lit(",\n\n")))
          .when(pmod(k, lit(4)) === 1,
            concat(lit("INSURING COMPANY: ZETA MUTUAL "), d10, lit(", STOCK\nNAIC NO. 55"), d10, lit(",\n\n")))
          .when(pmod(k, lit(4)) === 2,
            concat(lit("COMPANY: OMEGA GROUP 7"), d10, lit(", NON-ADMITTED\nNAIC: 9Q8"), d10, lit(",\n\n")))
          .otherwise(lit("")),
        when(pmod(k, lit(5)) === 0,
          concat(lit("PRODUCER: Smith & Jones Agency "), ks,
            lit("\nSuite 4\n\nPHONE: (555) 123-40"), d10,
            lit("\nE-MAIL: agent"), ks, lit("@example.com\n\n")))
          .when(pmod(k, lit(5)) === 1,
            concat(lit("AGENCY: Brown Bros "), ks, lit("\n\nEMAIL: b"), ks, lit("@x.org\n\n")))
          .when(pmod(k, lit(5)) === 2, concat(lit("PHONE: 555-000"), d10, lit("\n\n")))
          .otherwise(lit("")),
        when(pmod(k, lit(6)) === 0,
          concat(lit("CERTIFICATE HOLDER: City of Springfield "), ks,
            lit("\nADDITIONAL INSURED: Land Corp "), ks, lit("\n\n")))
          .when(pmod(k, lit(6)) === 1, concat(lit("LOSS PAYEE: First Bank "), ks, lit("\n\n")))
          .when(pmod(k, lit(6)) === 2, concat(lit("MORTGAGEE: Home Trust "), ks, lit("\n\n")))
          .when(pmod(k, lit(6)) === 3, concat(lit("CERTIFICATE HOLDER: County "), ks, lit("\n\n")))
          .otherwise(lit("")),
        when(pmod(k, lit(7)) === 0, lit("written on an OCCURRENCE basis\n"))
          .when(pmod(k, lit(7)) === 1, lit("CLAIMS-MADE form applies\n"))
          .when(pmod(k, lit(7)) === 2, lit("CLAIMS MADE wording without hyphen\n"))
          .when(pmod(k, lit(7)) === 3, lit("policies may OCCUR and CLAIMS-MADE both\n"))
          .otherwise(lit("")),
        when(pmod(k, lit(2)) === 0, lit("AGGREGATE LIMIT APPLIES PER: POLICY X PROJECT\n"))
          .otherwise(lit("AGGREGATE APPLIES PER LOC\n")))
      rd(s, d, "customer").withColumn("__t", text).select(k,
        FE.totalPremium(col("__t")).as("total_premium"),
        FE.premiumTotal(col("__t")).as("premium_total"),
        FE.advancePremium(col("__t")).as("advance_premium"),
        FE.insurerName(col("__t")).as("insurer_name"),
        FE.insurerNaic(col("__t")).as("insurer_naic"),
        FE.producerName(col("__t")).as("producer_name"),
        FE.producerPhone(col("__t")).as("producer_phone"),
        FE.producerEmail(col("__t")).as("producer_email"),
        FE.certificateHolder(col("__t")).as("certificate_holder"),
        FE.additionalInsured(col("__t")).as("additional_insured"),
        FE.lossPayee(col("__t")).as("loss_payee"),
        FE.mortgagee(col("__t")).as("mortgagee"),
        FE.occurrenceOrClaimsMade(col("__t")).as("occurrence_or_claims_made"),
        FE.aggregateAppliesPerText(col("__t")).as("aggregate_applies_per"))
    }),

    "misc_fields_tail" -> ((s, d) => {
      // qc_head.py:940-949 + 1062-1116 — tail half: deductible fallbacks,
      // description-of-operations, WC-excluded gate (incl. the bare-keyword
      // first match the reference crashes on → null here), the 5 auto-type
      // substring flags (OWNED⊂NON-OWNED quirk), classification, premium
      // basis, remarks first-wins, cancellation
      val k = col("c_custkey")
      val d10 = pmod(k, lit(10)).cast("string")
      val text = concat(
        when(pmod(k, lit(3)) === 0, lit("DEDUCTIBLE: $ 2,500\n\n"))
          .when(pmod(k, lit(3)) === 1,
            concat(lit("WINDSTORM OR HAIL DEDUCTIBLE: "), d10, lit("%\n\n")))
          .otherwise(lit("")),
        when(pmod(k, lit(4)) === 0,
          concat(lit("DESCRIPTION OF OPERATIONS: retail fuel sales\nstation "), d10, lit("\n\n")))
          .when(pmod(k, lit(4)) === 1,
            concat(lit("OPERATIONS: warehousing "), d10, lit("\n\n")))
          .otherwise(lit("")),
        when(pmod(k, lit(5)) === 0, lit("WORKERS COMPENSATION\nMEMBER EXCLUDED: N\n\n"))
          .when(pmod(k, lit(5)) === 1, lit("COMPENSATION schedule\nPROPRIETOR listed\n\n"))
          .when(pmod(k, lit(5)) === 2, lit("MEMBER EXCLUDED: Y\n\n"))
          .otherwise(lit("")),
        when(pmod(k, lit(6)) === 0, lit("AUTOMOBILE LIABILITY\nANY AUTO\nHIRED AUTOS\n\n"))
          .when(pmod(k, lit(6)) === 1, lit("AUTO coverage\nNON-OWNED AUTOS\n\n"))
          .when(pmod(k, lit(6)) === 2, lit("SCHEDULED AUTOS and OWNED AUTOS\n\n"))
          .otherwise(lit("")),
        when(pmod(k, lit(7)) === 0,
          concat(lit("CLASS: 0932 service station "), d10, lit("\n\n"))).otherwise(lit("")),
        when(pmod(k, lit(2)) === 0, lit("PREMIUM BASIS: gross sales\n\n")).otherwise(lit("")),
        when(pmod(k, lit(8)) === 0, lit("REMARKS: see endorsements\nsecond line\n\n"))
          .when(pmod(k, lit(8)) === 1,
            concat(lit("SPECIAL PROVISIONS: waiver applies "), d10, lit("\n\n")))
          .when(pmod(k, lit(8)) === 2, lit("SPECIAL CONDITIONS: none noted\n\n"))
          .otherwise(lit("")),
        when(pmod(k, lit(9)) === 0, lit("CANCELLATION: 30 days notice\nto holder\n\n"))
          .otherwise(lit("")))
      rd(s, d, "customer").withColumn("__t", text).select(k,
        FE.propertyDeductibleFallback(col("__t")).as("property_deductible"),
        FE.windstormDeductible(col("__t")).as("windstorm_deductible"),
        FE.descriptionOfOperations(col("__t")).as("description_of_operations"),
        FE.wcExcluded(col("__t")).as("wc_excluded"),
        FE.autoTypeFlag(col("__t"), "ANY AUTO").as("any_auto"),
        FE.autoTypeFlag(col("__t"), "OWNED AUTOS").as("owned_autos"),
        FE.autoTypeFlag(col("__t"), "HIRED AUTOS").as("hired_autos"),
        FE.autoTypeFlag(col("__t"), "SCHEDULED AUTOS").as("scheduled_autos"),
        FE.autoTypeFlag(col("__t"), "NON-OWNED AUTOS").as("non_owned_autos"),
        FE.classification(col("__t")).as("classification"),
        FE.premiumBasis(col("__t")).as("premium_basis"),
        FE.remarks(col("__t")).as("remarks"),
        FE.cancellationProvisions(col("__t")).as("cancellation_provisions"))
    }),

    "locations_list" -> ((s, d) => {
      // qc_head.py:951-965 — the locations list: all matches of all 4
      // patterns in pattern-major order, python-stripped, len>5 filter,
      // first-occurrence dedup; exploded to (key, loc_idx, location) rows.
      // Variant 0 carries a literal duplicate (two identical ADDRESS
      // blocks) to prove the dedup; variant 2's short value proves the
      // len>5 drop.
      val k = col("c_custkey")
      val d10 = pmod(k, lit(10)).cast("string")
      val text = concat(
        when(pmod(k, lit(4)) === 0,
          concat(lit("ADDRESS: 9 Oak Avenue Unit "), d10,
            lit("\n\nADDRESS: 9 Oak Avenue Unit "), d10, lit("\n\n")))
          .when(pmod(k, lit(4)) === 1,
            concat(lit("LOCATION/DESCRIPTION: 12 Main Street Floor "), d10,
              lit("\n\nPROPERTY: brick warehouse "), d10, lit("\n\n")))
          .when(pmod(k, lit(4)) === 2, lit("LOCATION: x1\n\n"))
          .otherwise(lit("LOCATION: 700 Industrial Parkway\n\n")))
      rd(s, d, "customer").withColumn("__t", text)
        .select(k, posexplode(FE.locations(col("__t"))))
        .select(k, col("pos").cast("long").as("loc_idx"), col("col").as("location"))
    }),

    "c7_items" -> ((s, d) => {
      // C7 item-level: pumpsCanopyItems' last-key-wins slot scan + 3-level
      // precedence returning items (llm_pl_pol_cov.py:264-321) — combined
      // forms yield one item, level 3 yields pumps then canopy
      import s.implicits._
      rd(s, d, "customer").select(col("c_custkey")).as[Long].flatMap { k =>
        val covs: Seq[(String, String)] = (k % 6) match {
          case 0 => Seq("Building with Pumps & Canopy" -> s"$$${k}00", "Pumps" -> "shadowed")
          case 1 => Seq("Pumps & Canopy" -> s"pc-$k", "Canopy" -> "shadowed")
          case 2 => Seq("Pumps" -> s"p-$k", "Canopy" -> s"c-$k")
          case 3 => Seq("Pumps" -> s"only-$k")
          case 4 => Seq("Theft" -> "no pc coverage")
          case _ => Seq("Pump" -> "stale", "Pumps" -> s"win-$k")
        }
        CC.pumpsCanopyItems(covs).zipWithIndex.map { case (it, i) =>
          (k, i.toLong, it.name, it.value)
        }
      }.toDF("c_custkey", "idx", "name", "value")
    }),

    "ep2_page_relation" -> ((s, d) => {
      // EP2 pageRelation over real span docs: marker page extraction,
      // forward-fill of page identity across unmarked spans (window over
      // offset order), page-1 default before the first marker, marker strip
      // + trim — one row per (kind, span), all three kinds
      val docs = ep2Docs(s, d)
      graft.pipeline.CertJob.ReferenceOrder
        .map(kind => graft.pipeline.CertJob.pageRelation(docs, kind)
          .withColumn("kind", lit(kind)))
        .reduce(_ unionByName _)
        .select(col("doc_id"), col("kind"), col("page").cast("long").as("page"),
          col("text"))
    }),

    "ep2_tables_output" -> ((s, d) => {
      // S12 — structured-tables side output (cert_extract_gl.py:214-220):
      // table spans split into rows, page identity from the forward-fill
      graft.pipeline.CertJob.tablesSideOutput(ep2Docs(s, d))
        .select(col("doc_id"), col("page").cast("long").as("page"),
          posexplode(col("rows")).as(Seq("ri", "tr")))
        .select(col("doc_id"), col("page"), col("ri").cast("long").as("ri"), col("tr"))
    }),

    "reading_order" -> ((s, d) => {
      // layout analyzer: positioned page fragments → ordered span sequence
      // (the north-star contract's "ordered (kind, text, media_ref,
      // offset)"); k%3=0 docs are clean two-column pages (left column read
      // fully before right), the rest carry a midline-crossing heading that
      // forces the conservative single-column fallback; media fragments
      // ride along in position
      val pg = rd(s, d, "lineitem")
        .groupBy(col("l_orderkey").as("k"), col("l_linenumber").cast("int").as("p"))
        .agg(min(pmod(col("l_partkey"), lit(1000))).as("b"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      graft.io.Persisted.track(pg)
      val id = col("k").cast("string").as("doc_id")
      def frag(x: Int, y: Column, w: Int, kind: String, text: Column,
          ref: Column) =
        Seq(id, col("p").as("page"), lit(x).as("x"), y.cast("int").as("y"),
          lit(w).as("w"), lit(kind).as("kind"), text.as("text"),
          ref.as("media_ref"))
      val f1 = pg.select(frag(0, pmod(col("b"), lit(50)), 40, "text",
        concat(lit("A-"), col("p").cast("string"), lit("-"), col("b").cast("string")),
        lit("")): _*)
      val f2 = pg.select(frag(60, pmod(col("b") * 7, lit(50)), 40, "text",
        concat(lit("B-"), col("p").cast("string"), lit("-"), col("b").cast("string")),
        lit("")): _*)
      val f3 = pg.filter(pmod(col("k"), lit(3)) =!= 0)
        .select(frag(10, lit(0), 80, "text",
          concat(lit("H-"), col("p").cast("string")), lit("")): _*)
      val f4 = pg.filter(pmod(col("p"), lit(2)) === 0)
        .select(frag(60, pmod(col("b") * 3, lit(50)) + 1, 40, "media",
          lit(""), concat(lit("im-"), col("k").cast("string"), lit("-"),
            col("p").cast("string"))): _*)
      graft.segment.ReadingOrder.orderSpans(
        f1.unionAll(f2).unionAll(f3).unionAll(f4))
    }),

    "span_eval" -> ((s, d) => {
      // North-rule acceptance invariant as a distributed metric: per-doc
      // span-sequence equality (kind, text, media_ref, order) vs a gold
      // table, plus bag-level P/R that separates content errors from order
      // errors. The actual corpus plants four deterministic defect families
      // (drop / order-swap / text-mutation / spurious-extra) the metric must
      // localize exactly.
      val (a, g) = spanEvalFrames(s, d)
      graft.qc.SpanEval.spanSeqEval(a, g)
    }),

    "span_eval_summary" -> ((s, d) => {
      // Corpus roll-up of span_eval: doc exact-match rate + span micro P/R
      // in exact milli units — the one-row report of a full extraction run.
      val (a, g) = spanEvalFrames(s, d)
      graft.qc.SpanEval.spanSeqSummary(graft.qc.SpanEval.spanSeqEval(a, g))
    }),

    "qc_compare" -> ((s, d) => {
      val o = rd(s, d, "orders")
      val certKv = o.select(col("o_orderkey").as("doc"), lit("total").as("field"),
        concat(lit("$"), round(col("o_totalprice") * 100).cast("long").cast("string"))
          .as("value"))
      val polKv = o.select(col("o_orderkey").as("doc"), lit("total").as("field"),
        when(pmod(col("o_orderkey"), lit(5)) === 0, lit("different"))
          .otherwise(round(col("o_totalprice") * 100).cast("long").cast("string"))
          .as("value"))
      Qc.qcCompareDf(certKv, polKv, "doc")
        .select(col("doc"), col("field"), col("is_mismatch"))
    }),

    "j4_guardrail" -> ((s, d) => {
      // guardrail containment semi-join over deterministically grouped
      // customers: every 5th customer requests a name; every 10th requests
      // its own (a guaranteed containment match), the rest request
      // non-matching sentinels so whole docs exercise the head-N fallback
      val c = rd(s, d, "customer")
      val valDf = c.select(pmod(col("c_custkey"), lit(97)).as("doc"),
        col("c_name").as("name"), col("c_custkey").as("seq"))
      val reqDf = c.filter(pmod(col("c_custkey"), lit(5)) === 0)
        .select(pmod(col("c_custkey"), lit(97)).as("doc"),
          when(pmod(col("c_custkey"), lit(10)) === 0, col("c_name"))
            .otherwise(concat(lit("ZZZNOMATCH"), col("c_custkey").cast("string")))
            .as("req"))
      Qc.guardrailJoinDf(valDf, reqDf, "doc", "name", "req", "seq")
        .select(col("doc"), col("name"), col("seq"))
    }),

    "qc_tolerant" -> ((s, d) => {
      // format-tolerant QC compare: equal-after-normalization dates,
      // addresses and money; a real date mismatch; a one-sided null
      val o = rd(s, d, "orders")
      val m = pmod(col("o_orderkey"), lit(5))
      val amt = round(col("o_totalprice")).cast("long").cast("string")
      val certV = when(m === 0, lit("09/26/2025"))
        .when(m === 1, lit("123 Main Road, Suite 4"))
        .when(m === 2, concat(lit("$ "), amt))
        .when(m === 3, lit("10/05/2025"))
        .otherwise(lit(null).cast("string"))
      val polV = when(m === 0, lit("9/26/2025"))
        .when(m === 1, lit("123 MAIN RD. STE 4"))
        .when(m === 2, amt)
        .when(m === 3, lit("10/06/2025"))
        .otherwise(lit("present"))
      val certKv = o.select(col("o_orderkey").as("doc"), lit("f").as("field"), certV.as("value"))
      val polKv = o.select(col("o_orderkey").as("doc"), lit("f").as("field"), polV.as("value"))
      Qc.qcCompareTolerantDf(certKv, polKv, "doc")
        .select(col("doc"), col("field"), col("certificate"), col("policy"),
          col("is_mismatch"))
    }),

    "qc_fuzzy" -> ((s, d) => {
      // OCR-noise edit-distance compare: 1 glyph slip passes (budget 1),
      // 2 slips fail, abbreviation-only differences normalize to distance
      // 0, one-sided null stays a hard mismatch
      val o = rd(s, d, "orders")
      val m = pmod(col("o_orderkey"), lit(5))
      val certV = when(m === 0, lit("ACME HOLDINGS LLC"))
        .when(m === 1, lit("123 Main Road, Suite 4"))
        .when(m === 2, lit("JOHNSON & SONS"))
        .when(m === 3, lit("NORTH RIVER MILLS"))
        .otherwise(lit(null).cast("string"))
      val polV = when(m === 0, lit("ACME HOLD1NGS LLC")) // 1 edit
        .when(m === 1, lit("123 MAIN RD. STE 4"))        // norm-equal
        .when(m === 2, lit("J0HNSON & S0NS"))            // 2 edits
        .when(m === 3, lit("NORTH RIVER MILLS"))
        .otherwise(lit("present"))                       // cert-side null
      val certKv = o.select(col("o_orderkey").as("doc"), lit("f").as("field"), certV.as("value"))
      val polKv = o.select(col("o_orderkey").as("doc"), lit("f").as("field"), polV.as("value"))
      Qc.qcCompareFuzzyDf(certKv, polKv, "doc", maxEdits = 1)
        .select(col("doc"), col("field"), col("certificate"), col("policy"),
          col("edit_distance"), col("is_mismatch"))
    }),

    "summary_counts" -> ((s, d) => {
      val status = when(col("o_orderstatus") === "F", "MATCH")
        .when(col("o_orderstatus") === "O", "MISMATCH")
        .otherwise("NOT_FOUND")
      Qc.statusCountsDf(
        rd(s, d, "orders").select(col("o_orderpriority"), status.as("status")),
        Seq("o_orderpriority"))
    }),

    "name_norm" -> ((s, d) => {
      rd(s, d, "part").select(col("p_partkey"),
        Norms.normNameCol(col("p_name")).as("norm_name"),
        Norms.baseNameCol(concat(col("p_brand"), lit("_policy"))).as("base_brand"))
    }),

    "boilerplate_blocks" -> ((s, d) => {
      // north-star stage: link-density + text-density block classification
      // over synthetic pages wrapping each document in nav/footer chrome,
      // a short heading line, and the document body
      val page = concat(
        lit("<a href=\"/home\">Home</a> | <a href=\"/about\">About Us</a> | " +
          "<a href=\"/contact\">Contact</a>\n\n"),
        lit("Section "), pmod(col("doc_id"), lit(7)).cast("string"), lit("\n\n"),
        col("text"),
        lit("\n\nCopyright 2026 <a href=\"/terms\">Terms of Service</a> " +
          "and <a href=\"/privacy\">Privacy</a>"))
      BP.blocksDf(rd(s, d, "documents").withColumn("page", page), "doc_id", "page")
    }),

    // -------------------------------------------------- text analysis -----
    "repetition_stats" -> ((s, d) => {
      // Gopher-style repetition rules over a line-structured variant of each
      // document: 4 substring lines with one guaranteed duplicate and a
      // doc-varying tail (corpus text has no newlines of its own)
      val l1 = substring(col("text"), 1, 80)
      val l2 = substring(col("text"), 41, 80)
      val l4 = when(pmod(col("doc_id"), lit(3)) === 0, substring(col("text"), 1, 80))
        .otherwise(substring(col("text"), 81, 80))
      val text2 = concat_ws("\n", l1, l2, l1, l4)
      TA.repetitionStatsDf(
        rd(s, d, "documents").withColumn("t2", text2), "doc_id", "t2")
    }),

    "gopher_quality" -> ((s, d) => {
      // the Gopher quality-rule battery over a line-structured corpus
      // variant: every 11th doc is too short, bullet / hash-symbol /
      // ellipsis lines rotate in on small moduli; integer metrics + exact
      // rational thresholds, so the oracle replays every rule bit-exactly
      val id = col("doc_id")
      val t2 = when(pmod(id, lit(11)) === 0, substring(col("text"), 1, 30))
        .otherwise(concat_ws("\n",
          substring(col("text"), 1, 400),
          when(pmod(id, lit(5)) === 0, lit("- bullet item"))
            .otherwise(lit("Normal and solid line with the words.")),
          when(pmod(id, lit(7)) === 0, lit("# # # # # # # # # # # #"))
            .otherwise(lit("that have with more easy text.")),
          when(pmod(id, lit(3)) === 0, lit("trailing thought..."))
            .otherwise(lit("Closing line of the page."))))
      TA.gopherQualityDf(
        rd(s, d, "documents").withColumn("t2", t2), "doc_id", "t2")
    }),

    "gopher_stats" -> ((s, d) => {
      // the full Gopher repetition battery over a paragraph/line-structured
      // variant (corpus text has no newlines of its own): paragraph A
      // repeated, a two-line paragraph, and an every-3rd-doc spam tail that
      // moves the top-n-gram signals
      val a = substring(col("text"), 1, 60)
      val b = substring(col("text"), 61, 60)
      val text2 = concat(a, lit("\n\n"), b, lit("\n"), a, lit("\n\n"), a,
        when(pmod(col("doc_id"), lit(3)) === 0,
          lit("\n\nword word word word")).otherwise(lit("")))
      TA.gopherStatsDf(
        rd(s, d, "documents").withColumn("t2", text2), "doc_id", "t2")
    }),

    "pipeline_e2e" -> ((s, d) => {
      // the full training-data pipeline over one corpus, composed from the
      // individually-oracled stages: chrome-wrapped pages → boilerplate
      // strip (heading/body blocks only) → per-doc content reassembly in
      // block order → language id + quality scoring + token accounting →
      // quality gate → exact dedup on normalized content. One narrow
      // explode, one groupBy shuffle, one fingerprint window — no join
      // until the final flag attach.
      val page = concat(
        lit("<a href=\"/home\">Home</a> | <a href=\"/about\">About Us</a> | " +
          "<a href=\"/contact\">Contact</a>\n\n"),
        lit("Section "), pmod(col("doc_id"), lit(7)).cast("string"), lit("\n\n"),
        col("text"),
        lit("\n\nCopyright 2026 <a href=\"/terms\">Terms of Service</a> " +
          "and <a href=\"/privacy\">Privacy</a>"))
      // blocksDf (not contentSpansDf): the per-doc offset window would add a
      // Sort+Window exchange only for array_sort to re-derive the same order
      // from block_idx
      val blocks = BP.blocksDf(
        rd(s, d, "documents").withColumn("page", page), "doc_id", "page")
        .filter(col("label").isin("heading", "body"))
      val content = blocks.groupBy("doc_id").agg(
        array_join(transform(array_sort(collect_list(struct(col("block_idx"), col("text")))),
          x => x.getField("text")), "\n").as("content"),
        count(lit(1)).cast("long").as("n_blocks"))
      val scored = content.select(col("doc_id"), col("content"), col("n_blocks"),
        TA.langIdCol(col("content")).as("lang_pred"),
        TA.qualityScoreCol(col("content")).as("quality"),
        TA.wsTokenCountCol(col("content")).cast("long").as("ws_tokens"),
        TA.bpeTokenCountCol(col("content")).cast("long").as("bpe_tokens"))
      val gated = scored.filter(col("quality") >= 0.65)
      // passthrough columns ride through the fingerprint window — no join
      // back, so the strip+score subtree is computed once, not twice
      Dedup.exactDuplicates(gated, "doc_id", "content",
        passthrough = Seq("lang_pred", "quality", "ws_tokens", "bpe_tokens", "n_blocks"))
        .select(col("doc_id"), col("lang_pred"), col("quality"), col("ws_tokens"),
          col("bpe_tokens"), col("n_blocks"), col("canonical_id"), col("is_duplicate"))
    }),

    "lang_mix" -> ((s, d) => {
      // per-paragraph language mix over a multilingual corpus variant: a
      // prose paragraph plus rotating es / zh / de / fr / absent
      // paragraphs; the oracle replays the per-paragraph classifier, the
      // majority vote, and the zh<en<es<de<fr tie-break
      val id = col("doc_id")
      val p2 = when(pmod(id, lit(3)) === 0, lit("el que los de la una es aqui"))
        .otherwise(lit("the and of to in is that more"))
      val p3 = when(pmod(id, lit(4)) === 0, lit("中文内容测试"))
        .when(pmod(id, lit(4)) === 1, lit("der die und das ist nicht ein zu"))
        .when(pmod(id, lit(4)) === 2, lit("le la les des et est une dans"))
        .otherwise(lit(""))
      val t2 = concat_ws("\n\n", substring(col("text"), 1, 80), p2, p3)
      TA.langMixDf(rd(s, d, "documents").withColumn("t2", t2),
        "doc_id", "t2")
    }),

    "lang_id" -> ((s, d) => {
      rd(s, d, "documents").select(col("doc_id"),
        TA.langIdCol(col("text")).as("lang_pred"))
    }),

    "domain_stats" -> ((s, d) => {
      // the per-domain curation table every mixture/cap decision reads:
      // docs keyed by synthesized URLs over a 10-site space (with co.uk
      // PSL tails folding subdomains), aggregated to (domain, n_docs,
      // total ws tokens, total chars, max doc tokens). ONE partial-agg
      // groupBy on the registrable domain — token sums combine map-side,
      // so a mega-domain never ships raw docs. Integer-only metrics; the
      // oracle re-renders the domain key and replays the aggregation
      val id = col("doc_id")
      val url = concat(lit("https://www.sub"), pmod(id, lit(3)).cast("string"),
        lit(".site"), pmod(id, lit(10)).cast("string"),
        when(pmod(id, lit(4)) === 0, lit(".News.CO.UK")).otherwise(lit(".org")),
        lit("/p/"), id.cast("string"))
      rd(s, d, "documents").select(id, url.as("url"), col("text"))
        .select(
          Web.registrableDomain(Web.host(col("url"))).as("domain"),
          TA.wsTokenCountCol(col("text")).cast("long").as("__tok"),
          length(col("text")).cast("long").as("__chars"))
        .groupBy("domain").agg(
          count(lit(1)).as("n_docs"),
          sum("__tok").as("total_ws_tokens"),
          sum("__chars").as("total_chars"),
          max("__tok").as("max_doc_tokens"))
    }),

    "url_normalize" -> ((s, d) => {
      // URL hygiene over synthesized crawl URLs: every variant axis (scheme
      // case, userinfo, default vs explicit port, empty path, tracking
      // params, fragments, two-label public suffixes) is a pure function of
      // doc_id, so the oracle re-renders the EXPECTED canonical form
      // directly — a defect anywhere in normalizeUrl / host /
      // registrableDomain breaks parity. Zero-shuffle narrow projection.
      val id = col("doc_id")
      val str = id.cast("string")
      val url = concat(
        when(pmod(id, lit(2)) === 0, lit("HTTPS")).otherwise(lit("http")), lit("://"),
        when(pmod(id, lit(17)) === 0, lit("u:p@")).otherwise(lit("")),
        lit("WWW.Site"), pmod(id, lit(7)).cast("string"),
        when(pmod(id, lit(5)) === 0, lit(".News.CO.UK")).otherwise(lit(".Example.COM")),
        when(pmod(id, lit(3)) === 0,
          when(pmod(id, lit(2)) === 0, lit(":443")).otherwise(lit(":80")))
          .when(pmod(id, lit(3)) === 1, lit(":8080")).otherwise(lit("")),
        when(pmod(id, lit(11)) === 0, lit("")).otherwise(concat(lit("/P/"), str)),
        when(pmod(id, lit(4)) === 0, lit("?b=2&utm_source=nl&a=1"))
          .when(pmod(id, lit(4)) === 1, lit("?gclid=z"))
          .when(pmod(id, lit(4)) === 2, lit("?z=9&y=8&fbclid=k")).otherwise(lit("")),
        when(pmod(id, lit(6)) === 0, concat(lit("#sec"), str)).otherwise(lit("")))
      rd(s, d, "documents").select(id, url.as("url"))
        .select(col("doc_id"), col("url"),
          Web.normalizeUrl(col("url")).as("url_norm"),
          Web.host(col("url")).as("host"),
          Web.registrableDomain(Web.host(col("url"))).as("domain"))
    }),

    "psl_domains" -> ((s, d) => {
      // full public-suffix-list matching (graft_regdomain over the
      // bundled rule file): eight host shapes per doc_id covering normal
      // 2-label rules, the *.ck and *.kawasaki.jp WILDCARDS, the !www.ck
      // and !city.kawasaki.jp EXCEPTIONS, depth-3 ICANN rules
      // (k12.ca.us), private-section rules (s3.amazonaws.com), and the
      // unlisted-TLD default. Hosts are pure functions of doc_id so the
      // oracle re-renders the EXPECTED eTLD+1 directly — an independent
      // replay of the PSL algorithm's outcome on every shape.
      // Zero-shuffle narrow codegen projection.
      val id = col("doc_id")
      val m3 = pmod(id, lit(3)).cast("string")
      val m5 = pmod(id, lit(5)).cast("string")
      val host = when(pmod(id, lit(8)) === 0,
          concat(lit("www.sub"), m3, lit(".site"), m5, lit(".co.uk")))
        .when(pmod(id, lit(8)) === 1,
          concat(lit("b"), m3, lit(".shop.ex"), m5, lit(".ck")))
        .when(pmod(id, lit(8)) === 2, lit("shop.www.ck"))
        .when(pmod(id, lit(8)) === 3,
          concat(lit("sub"), m3, lit(".city.kawasaki.jp")))
        .when(pmod(id, lit(8)) === 4,
          concat(lit("x.a.ward"), m5, lit(".kawasaki.jp")))
        .when(pmod(id, lit(8)) === 5,
          concat(lit("www.school"), m5, lit(".k12.ca.us")))
        .when(pmod(id, lit(8)) === 6,
          concat(lit("img.b"), m5, lit(".s3.amazonaws.com")))
        .otherwise(concat(lit("cdn.sub.host"), m5, lit(".unlisted"), m3))
      rd(s, d, "documents").select(id, host.as("host"))
        .select(col("doc_id"), col("host"),
          Web.registrableDomain(col("host")).as("domain"))
    }),

    "surt_keys" -> ((s, d) => {
      // SURT archive keys over the url_normalize fixture URLs (same
      // pure-function construction, so the oracle re-renders the
      // expected key directly)
      val id = col("doc_id")
      val str = id.cast("string")
      val url = concat(
        when(pmod(id, lit(2)) === 0, lit("HTTPS")).otherwise(lit("http")), lit("://"),
        when(pmod(id, lit(17)) === 0, lit("u:p@")).otherwise(lit("")),
        lit("WWW.Site"), pmod(id, lit(7)).cast("string"),
        when(pmod(id, lit(5)) === 0, lit(".News.CO.UK")).otherwise(lit(".Example.COM")),
        when(pmod(id, lit(3)) === 0,
          when(pmod(id, lit(2)) === 0, lit(":443")).otherwise(lit(":80")))
          .when(pmod(id, lit(3)) === 1, lit(":8080")).otherwise(lit("")),
        when(pmod(id, lit(11)) === 0, lit("")).otherwise(concat(lit("/P/"), str)),
        when(pmod(id, lit(4)) === 0, lit("?b=2&utm_source=nl&a=1"))
          .when(pmod(id, lit(4)) === 1, lit("?gclid=z"))
          .when(pmod(id, lit(4)) === 2, lit("?z=9&y=8&fbclid=k")).otherwise(lit("")),
        when(pmod(id, lit(6)) === 0, concat(lit("#sec"), str)).otherwise(lit("")))
      rd(s, d, "documents").select(id, url.as("url"))
        .select(col("doc_id"), graft.text.Web.surt(col("url")).as("surt"))
    }),

    "key_skew" -> ((s, d) => {
      // the pre-join skew report: per-user row counts of the events table
      // summarized to max/percentiles/skew ratio — the decision input for
      // salting / AQE hints / hot-key caps
      graft.io.Skew.keySkew(rd(s, d, "events"), Seq("user_id"))
    }),

    "triangle_count" -> ((s, d) => {
      // per-node triangle counts via degree-oriented wedge join over a
      // deterministic tripartite-with-shortcuts graph (each doc plants one
      // guaranteed triangle; cross-doc sharing adds more). The oracle
      // counts triangles INDEPENDENTLY (id-ordered triple join), so a
      // defect in the orientation trick cannot self-confirm.
      val id = col("doc_id")
      val doc = rd(s, d, "documents").select(col("doc_id"))
      val e1 = doc.select(pmod(id, lit(20)).as("s"), (pmod(id, lit(15)) + 20).as("d"))
      val e2 = doc.select((pmod(id, lit(15)) + 20).as("s"), (pmod(id, lit(11)) + 40).as("d"))
      val e3 = doc.select(pmod(id, lit(20)).as("s"), (pmod(id, lit(11)) + 40).as("d"))
      graft.graph.Triangles.perNode(e1.unionAll(e2).unionAll(e3), "s", "d")
    }),

    "link_graph" -> ((s, d) => {
      // host-graph construction: synthesized pages whose own URL and anchor
      // targets are pure functions of doc_id — the oracle re-renders the
      // expected (src_domain, dst_domain) edge weights directly, so a
      // defect in href extraction, host folding, PSL logic, self-edge
      // filtering, or the count aggregation breaks parity
      val id = col("doc_id")
      val src = concat(lit("https://www.S"), pmod(id, lit(7)).cast("string"),
        when(pmod(id, lit(5)) === 0, lit(".News.CO.UK")).otherwise(lit(".org")),
        lit("/p/"), id.cast("string"))
      val html = concat(
        lit("<p>See <a href=\"https://D"), pmod(id, lit(9)).cast("string"),
        lit(".Site"), pmod(id, lit(4)).cast("string"),
        lit(".COM/a\">one</a> <a href=\"/rel\">rel</a>"),
        when(pmod(id, lit(3)) === 0,
          lit(" <a href=\"http://News.CO.UK/b?x=1\">two</a>" +
            " <a href=\"#f\">frag</a>")).otherwise(lit("")),
        lit("</p>"))
      Web.linkEdges(
        rd(s, d, "documents").select(src.as("url"), html.as("html")),
        "url", "html")
    }),

    "cocitation_pairs" -> ((s, d) => {
      // co-citation similarity (Small 1973) over a synthesized page→domain
      // citation table: every edge is a pure function of doc_id so the
      // oracle re-renders the edge list and replays dedup, the out-degree
      // hub cap (doc_id%97 pages cite 6 extra domains and exceed cap 4 —
      // dropped entirely), the src self-join, and the pair counts
      val id = col("doc_id")
      val src = concat(lit("p"), id.cast("string"))
      val base = rd(s, d, "documents").select(id)
      val e = base.select(src.as("src"),
          concat(lit("site"), pmod(id, lit(6)).cast("string")).as("dst"))
        .unionAll(base.select(src.as("src"),
          concat(lit("site"), pmod(id * 2 + 1, lit(6)).cast("string"))
            .as("dst")))
        .unionAll(base.filter(pmod(id, lit(3)) === 0)
          .select(src.as("src"), lit("hub.com").as("dst")))
        .unionAll(base.filter(pmod(id, lit(97)) === 0)
          .select(src.as("src"),
            explode(transform(sequence(lit(0), lit(5)),
              k => concat(lit("x"), k.cast("string")))).as("dst")))
      graph.Cocitation.pairs(e, "src", "dst", maxOut = 4)
    }),

    "html_meta" -> ((s, d) => {
      // head-metadata battery over synthesized page HTML: every field axis
      // (presence, attribute order, tag case, canonical-URL transport noise)
      // is a pure function of doc_id, so the oracle re-renders the EXPECTED
      // five fields directly — a defect in any extraction regex or the
      // canonical normalization breaks parity. Zero-shuffle projection.
      val id = col("doc_id")
      val str = id.cast("string")
      val title = when(pmod(id, lit(7)) === 0, lit(""))
        .when(pmod(id, lit(7)) === 1,
          concat(lit("<TITLE> Doc "), str, lit(" overview </TITLE>")))
        .otherwise(concat(lit("<title> Doc "), str, lit(" overview </title>")))
      val desc = when(pmod(id, lit(11)) === 0, lit(""))
        .when(pmod(id, lit(2)) === 0,
          concat(lit("<meta name=\"description\" content=\"Desc "),
            pmod(id, lit(5)).cast("string"), lit("\">")))
        .otherwise(concat(lit("<meta content=\"Desc "),
          pmod(id, lit(5)).cast("string"), lit("\" name=\"description\">")))
      val og = when(pmod(id, lit(3)) === 0,
          concat(lit("<meta property=\"og:title\" content=\"OG "), str, lit("\">")))
        .when(pmod(id, lit(3)) === 1,
          concat(lit("<meta content=\"OG "), str, lit("\" property=\"og:title\">")))
        .otherwise(lit(""))
      val canon = when(pmod(id, lit(4)) === 0,
          concat(lit("<link rel=\"canonical\" href=\"HTTP://Ex.com:80/p/"),
            str, lit("?utm_c=1\">")))
        .when(pmod(id, lit(4)) === 1,
          concat(lit("<link href=\"https://ex.org/"), str,
            lit("#frag\" rel=\"canonical\">")))
        .otherwise(lit(""))
      val langAttr = when(pmod(id, lit(5)) === 0, lit(" lang=\"EN\""))
        .when(pmod(id, lit(5)) === 1, lit(" lang=\"fr-FR\"")).otherwise(lit(""))
      val html = concat(lit("<html"), langAttr, lit("><head>"), title, desc,
        og, canon, lit("</head><body><p>body</p></body></html>"))
      Web.htmlMetaDf(
        rd(s, d, "documents").select(id, html.as("html")), "doc_id", "html")
    }),

    "anchor_texts" -> ((s, d) => {
      // anchor-text aggregation over synthesized pages: targets and texts
      // are pure functions of doc_id, with URL-variant noise (tracking
      // params, scheme/host case, default port) that MUST pool after
      // normalization, an empty-text anchor that MUST drop, and a top-k cut
      // at k=2 with count-then-text ordering; the oracle re-renders the
      // (dst, anchor) relation directly and replays the aggregation
      val id = col("doc_id")
      val dstK = pmod(id, lit(5)).cast("string")
      val html = concat(
        lit("<p><a href=\"http://T"), dstK, lit(".com/page?utm_x=1\">Alpha</a> "),
        lit("<a class=\"x\" href=\"http://t"), dstK, lit(".com/page\">Beta "),
        pmod(id, lit(3)).cast("string"), lit("</a>"),
        lit("<a href=\"http://t"), dstK, lit(".com/page\"> </a>"),
        when(pmod(id, lit(4)) === 0,
          concat(lit(" <a href=\"HTTPS://Hub.example.org:443/\">Gamma "),
            pmod(id, lit(3)).cast("string"), lit("</a>"))).otherwise(lit("")),
        lit("</p>"))
      Web.anchorTextsDf(
        rd(s, d, "documents").select(html.as("html")), "html", k = 2)
    }),

    "c4_clean" -> ((s, d) => {
      // the C4 line-cleaning battery over a line-structured variant of the
      // corpus (corpus text has no newlines of its own): kept/dropped
      // lines, the javascript line veto, the lorem-ipsum / curly-bracket
      // page vetoes, and the 5-sentence floor all vary by doc_id; the
      // oracle replays the full rule set over the identical lines
      val id = col("doc_id")
      val a = substring(col("text"), 1, 30)
      val t2 = concat_ws("\n",
        concat(lit("Intro line with words "), a, lit(".")),
        lit("no terminal punctuation line"),
        lit("Short."),
        when(pmod(id, lit(4)) === 0, lit("Please enable JavaScript now."))
          .otherwise(lit("Second real line stays here!")),
        when(pmod(id, lit(6)) === 0, lit("This mentions lorem ipsum dolor."))
          .otherwise(lit("Third line asks a question? Yes. It does. Clearly.")),
        when(pmod(id, lit(9)) === 0, lit("code block { return one; }"))
          .otherwise(lit("Final line of the page.")))
      C4.cleanDf(rd(s, d, "documents").withColumn("t2", t2), "doc_id", "t2")
    }),

    "mojibake_fix" -> ((s, d) => {
      // mojibake repair over corpus text with a cp1252-corrupted suffix on
      // two thirds of the docs (the rest stay clean): the oracle re-renders
      // the EXPECTED repaired text directly — including the deliberately
      // unhealable sequence (A-tilde + macron, i.e. corrupted 'i
      // diaeresis', not in the table) — so a defect in any table entry,
      // the chain order, or literal-vs-regex semantics breaks parity
      val id = col("doc_id")
      val corrupt = lit("\u0063\u0061\u0066\u00c3\u00a9\u0020\u00e2\u20ac\u201d\u0020\u00e2\u20ac\u0153\u006e\u0061\u00c3\u00af\u0076\u0065\u00e2\u20ac\u00a6\u0020\u0039\u0030\u00c2\u00b0")
      val raw = when(pmod(id, lit(3)) === 0, col("text"))
        .otherwise(concat(substring(col("text"), 1, 40), lit(" "), corrupt))
      rd(s, d, "documents").select(id, raw.as("__raw"))
        .select(id, TA.fixMojibakeCol(col("__raw")).as("fixed"),
          (TA.fixMojibakeCol(col("__raw")) =!= col("__raw")).as("changed"))
    }),

    "quality_score" -> ((s, d) => {
      rd(s, d, "documents").select(col("doc_id"),
        TA.qualityScoreCol(col("text")).as("quality"))
    }),

    "char_entropy" -> ((s, d) => {
      // compressibility quality signal: per-doc char-histogram Shannon
      // entropy in micro-nats (one rounded ln per distinct count — the
      // Importance integer-log idiom); repeated-char boilerplate scores
      // near 0, random gibberish near the alphabet ceiling
      TA.charEntropyDf(rd(s, d, "documents"), "doc_id", "text")
    }),

    "readability" -> ((s, d) => {
      // Flesch reading-ease + Flesch–Kincaid grade in integer milli: the
      // dictionary-free readability tier of the quality battery (collapsed
      // ease flags OCR noise / templated jargon; grade is the difficulty
      // bucketing key). Completely narrow — codegen'd array math per row
      TA.readabilityDf(rd(s, d, "documents"), "doc_id", "text")
    }),

    "length_percentiles" -> ((s, d) => {
      // per-language p10/p50/p90 doc-length spread by the same rank
      // arithmetic slicePercentile encodes, evaluated in ONE pass: one
      // histogram, one cumulative window, three conditional mins — no
      // joins, no reliance on physical-plan exchange reuse (the oracle
      // has the identical shape)
      val hist = rd(s, d, "documents")
        .select(col("lang").as("slice"),
          length(col("text")).cast("long").as("v"))
        .groupBy("slice", "v").agg(count(lit(1)).as("c"))
      hist.withColumn("cm", sum("c").over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("slice").orderBy("v")))
        .join(hist.groupBy("slice").agg(sum("c").as("n")), "slice")
        .groupBy("slice")
        .agg(first("n").as("n"),
          min(when(expr("cm >= (n-1)*100 div 1000 + 1"), col("v")))
            .as("p10"),
          min(when(expr("cm >= (n-1)*500 div 1000 + 1"), col("v")))
            .as("p50"),
          min(when(expr("cm >= (n-1)*900 div 1000 + 1"), col("v")))
            .as("p90"))
    }),

    "readability_by_slice" -> ((s, d) => {
      // datasheet rollup: per-language lower-median Flesch ease and FK
      // grade via the histogram-exact sliceMedian primitive (milli
      // scores are bounded-cardinality integers; wordless NULL-score
      // docs drop out) — the corpus shuffles once per metric into a
      // (slice, value) histogram, never sorts
      // BOTH medians from ONE readability pass: the two metrics melt
      // into a compound (lang#metric) slice key so the expensive
      // sentence/syllable projection runs once (two separate
      // sliceMedian calls would re-evaluate it — their exchanges differ
      // and ReusedExchange cannot dedup them), then pivot back
      val docs = rd(s, d, "documents")
      val r = TA.readabilityDf(docs, "doc_id", "text")
        .join(docs.select("doc_id", "lang"), "doc_id")
      val melted = r.select(col("lang"), explode(array(
          struct(lit("ease").as("m"), col("ease_milli").as("v")),
          struct(lit("grade").as("m"), col("grade_milli").as("v"))))
          .as("e"))
        .select(concat(col("lang"), lit("#"), col("e.m")).as("sl"),
          col("e.v").as("v"))
      graft.text.CorpusStats.sliceMedian(melted, "sl", "v")
        .select(expr("split(slice, '#')[0]").as("slice"),
          expr("split(slice, '#')[1]").as("__m"), col("n"), col("median"))
        .groupBy("slice")
        .agg(max(when(col("__m") === "ease", col("n"))).as("n"),
          max(when(col("__m") === "ease", col("median")))
            .as("median_ease_milli"),
          max(when(col("__m") === "grade", col("median")))
            .as("median_grade_milli"))
    }),

    "quality_top_fraction" -> ((s, d) => {
      // dynamic per-language thresholding (the keep-top-X% curation rule):
      // instead of one global score cutoff, each language keeps its own
      // top quartile by entropy — percent_rank over a (lang) window, ties
      // broken by doc_id so the kept set is deterministic. Integer score,
      // exact double percent_rank in both engines.
      val docs = rd(s, d, "documents")
      val scored = TA.charEntropyDf(docs, "doc_id", "text")
        .join(docs.select(col("doc_id"),
          TA.langIdCol(col("text")).as("lang")), Seq("doc_id"))
      val w = Window.partitionBy("lang")
        .orderBy(col("entropy_micro").desc, col("doc_id"))
      scored.select(col("doc_id"), col("lang"), col("entropy_micro"),
        (percent_rank().over(w) <= 0.25).as("keep"))
    }),

    // the CurateJob kernel as a gated query: repairs → blocklist → Gopher
    // rules → classifier, composed per doc in one zero-shuffle typed map.
    // On this ASCII corpus the repair stages must be no-ops — if the
    // kernel's mojibake/de-hyphenation passes ever mangled clean text, the
    // raw-text oracle breaks, which is exactly the regression to catch.
    "curate_battery" -> ((s, d) => {
      import s.implicits._
      val cfg = graft.pipeline.CurateJob.Config()
      rd(s, d, "documents")
        .select(col("doc_id").cast("string"), col("source"), col("text"))
        .as[(String, String, String)]
        .map { case (id, dom, text) =>
          val (nt, blocked, gq, score, kept, _) =
            graft.pipeline.CurateJob.curateDoc(text, dom, cfg)
          (id, nt, blocked, gq, score, kept)
        }.toDF("doc_id", "n_tokens", "blocked", "gopher_kept",
          "clf_score_milli", "kept")
    }),

    // UT1-style blocklist filter (Blocklist.flags): blocked-DOMAIN verdict
    // plus bad-word DENSITY in exact integer milli (RefinedWeb keeps a
    // long doc with one incidental token; kills pure spam). The miniature
    // lists pin the contract; production swaps in the real UT1 snapshot.
    "blocklist_filter" -> ((s, d) =>
      graft.text.Blocklist.flags(rd(s, d, "documents"), "doc_id", "text",
        "source", words = Seq("slow", "gibberish"),
        domains = Seq("src3", "src7", "src13"), ratioMilliThreshold = 40L)),

    // fastText-style hashed linear classifier inference
    // (Classifier.scoreLinear): unigram+bigram features hashed into 4096
    // buckets, integer milli-weights summed per doc, broadcast model — the
    // wiki-vs-crawl quality-classifier scoring pass of CCNet/GPT-3-style
    // curation. The synthetic weight table is itself md5-derived, so the
    // oracle rebuilds model AND inference from scratch.
    "quality_classifier" -> ((s, d) => {
      graft.text.Classifier.scoreLinear(rd(s, d, "documents"), "doc_id",
        "text", graft.text.Classifier.syntheticWeights(s, 4096), 4096)
    }),

    // Distributed hard-sigmoid LR training (Classifier.trainLinear): two
    // full-batch rounds over docText with label = (doc_id%13=0) — the docs
    // carrying the injected mortgagee tokens — so the learned weights are a
    // genuine separation, not just arithmetic; the oracle unrolls both
    // rounds (integer milli, floor-div) and matches every weight exactly.
    "lr_train" -> ((s, d) =>
      graft.text.Classifier.trainLinear(
        rd(s, d, "documents").withColumn("t2", docText)
          .withColumn("y", (pmod(col("doc_id"), lit(13)) === 0).cast("int"))
          .select(col("doc_id"), col("t2"), col("y")),
        "doc_id", "t2", "y", buckets = 4096, rounds = 2)),

    "token_efficiency" -> ((s, d) => {
      // per-language tokenizer-efficiency datasheet: UTF-8 bytes per
      // ws/bpe token in integer milli — THE tokenizer-swap comparison
      // metric; one partial-agg groupBy, sums combine map-side
      TA.tokenEfficiencyStats(rd(s, d, "documents"), "lang", "text")
    }),

    "domain_wilson" -> ((s, d) => {
      // evidence-aware domain quality ranking: Wilson lower bound (z=1.96,
      // integer milli) on the per-domain rate of ≥30-ws-token docs over
      // the domain_stats fixture key — 4/5 and 4000/5000 share p̂ but not
      // the bound, so caps stop rewarding tiny lucky domains
      val id = col("doc_id")
      val domain = synthDomain(id)
      TA.sliceQualityWilson(
        rd(s, d, "documents").select(domain.as("domain"),
          (TA.wsTokenCountCol(col("text")) >= 30).as("good")),
        "domain", "good")
    }),

    "length_outliers" -> ((s, d) => {
      // Hampel median/MAD length-outlier gate per language: histogram-
      // exact lower medians (the only corpus-scale exchange is the
      // (slice, len) partial-agg groupBy; the corpus itself never sorts),
      // broadcast stat join back, cross-multiplied k=3 rule
      graft.text.CorpusStats.lengthOutliers(
        rd(s, d, "documents"), "doc_id", "lang", "text")
    }),

    "domain_hhi" -> ((s, d) => {
      // per-language domain concentration: exact integer-micro HHI via
      // DECIMAL(38,0) (replayed with int128 on the oracle side) + top
      // domain share — the "is this slice secretly one website?" gate
      val id = col("doc_id")
      val domain = synthDomain(id)
      graft.text.CorpusStats.domainConcentration(
        rd(s, d, "documents").select(col("lang"), domain.as("domain")),
        "lang", "domain")
    }),

    "name_jw" -> ((s, d) => {
      // entity-resolution scoring: Jaro–Winkler over synthesized
      // insurer-name pairs (identity / transposition / deletion /
      // suffix / unrelated, pure functions of doc_id); oracle = DuckDB's
      // NATIVE jaro_winkler_similarity — an independent implementation
      val id = col("doc_id")
      val names = Seq("acme insurance company", "globex mutual holdings",
        "initech property casualty", "umbrella corp underwriters",
        "stark industries assurance", "wayne enterprises group",
        "tyrell surety partners", "hooli national indemnity")
      val a = element_at(array(names.map(lit): _*),
        (pmod(id, lit(8)) + 1).cast("int"))
      val base = rd(s, d, "documents").select(id, a.as("a"))
        .withColumn("b", when(pmod(id, lit(5)) === 0, col("a"))
          .when(pmod(id, lit(5)) === 1,
            expr("concat(substring(a,2,1), substring(a,1,1), substring(a,3))"))
          .when(pmod(id, lit(5)) === 2,
            expr("concat(substring(a,1,2), substring(a,4))"))
          .when(pmod(id, lit(5)) === 3, concat(col("a"), lit(" llc")))
          .otherwise(lit("unrelated name co")))
      graft.extract.Norms.jaroWinklerDf(base, "doc_id", "a", "b")
    }),

    "lsh_curve" -> ((s, d) => {
      // the S-curve of the default MinHash config (k=32 = 8 bands × r=4):
      // candidate probability 1−(1−J^r)^b at 39 Jaccard permille steps,
      // in an exact truncated-integer chain (squaring order shared with
      // the oracle verbatim) — the tuning table next to minhash_recall
      // that justifies the band/row choice before a 100 TB run
      s.range(0, 39, 1, 4).select(((col("id") + 1) * 25).as("j_milli"))
        .withColumn("j_r_milli", expr(
          "j_milli*j_milli div 1000 * j_milli div 1000 * j_milli div 1000"))
        .withColumn("__q", lit(1000L) - col("j_r_milli"))
        .withColumn("__q2", expr("__q*__q div 1000"))
        .withColumn("__q4", expr("__q2*__q2 div 1000"))
        .withColumn("candidate_milli",
          lit(1000L) - expr("__q4*__q4 div 1000"))
        .select("j_milli", "j_r_milli", "candidate_milli")
    }),

    "revision_diff" -> ((s, d) => {
      // re-crawl revision stats: paired old/new text synthesized per
      // doc_id (identity / 1-char substitution / 5-char append /
      // reversal); banded Levenshtein capped at 16, docs > 300 chars
      // skip to NULL (fingerprint territory). Oracle = DuckDB's NATIVE
      // levenshtein under least() — an independent implementation
      val id = col("doc_id")
      val t = col("text")
      val b = when(pmod(id, lit(4)) === 0, t)
        .when(pmod(id, lit(4)) === 1,
          concat(lit("X"), expr("substring(text, 2)")))
        .when(pmod(id, lit(4)) === 2, concat(t, lit(" tail")))
        .otherwise(reverse(t))
      graft.text.Revisions.revisionDiffDf(
        rd(s, d, "documents").select(id, t.as("a"), b.as("b")),
        "doc_id", "a", "b", cap = 16, maxLen = 300)
    }),

    "signal_corr" -> ((s, d) => {
      // signal-redundancy audit: exact integer-micro Pearson between
      // chars / ws tokens / bpe tokens over the full corpus — one narrow
      // projection + ONE global reduce to a single row
      graft.text.CorpusStats.signalCorrelation(
        rd(s, d, "documents"), "text")
    }),

    "takedown_by_content" -> ((s, d) => {
      // copyright takedowns name CONTENT, not doc ids: expand the listed
      // ids to their normalized-text fingerprints and anti-join the
      // corpus on the fingerprint, so byte-identical mirrors of an
      // infringing work vanish with it (the exact-dedup complement to
      // takedown_filter's id anti-join); both sides broadcast-bounded
      // NULL fingerprints (null text) are pinned out on BOTH sides:
      // anti-join keeps NULL keys while SQL NOT IN would drop them —
      // the one place their semantics diverge
      val docs = rd(s, d, "documents")
        .withColumn("__fp", TA.fingerprintCol(col("text")))
        .filter(col("__fp").isNotNull)
      val listedFps = docs.filter(pmod(col("doc_id"), lit(59)) === 0)
        .select(col("__fp")).distinct()
      docs.join(broadcast(listedFps), Seq("__fp"), "left_anti")
        .select(col("doc_id"))
    }),

    "takedown_filter" -> ((s, d) => {
      // relational twin of pipeline/TakedownJob: corpus anti-join a
      // broadcast delete list (doc_id%13 stands in for the GDPR/DMCA
      // list); the job itself adds the partition-pruned COW overlay and
      // is spec+spark-submit driven
      val del = rd(s, d, "documents").select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(13)) === 0)
      rd(s, d, "documents").join(broadcast(del), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
    }),

    "normalize_text" -> ((s, d) => {
      // entity-decode + NFC composition pass over synthesized raw text
      // (entities, a decomposed e+combining-acute, and deliberate
      // passthrough cases are pure functions of doc_id); zero-shuffle
      // typed kernel — the oracle replays the fixture's entity set as
      // literal replaces and the composition via nfc_normalize
      val id = col("doc_id")
      val raw = concat(lit("T"), id.cast("string"),
        when(pmod(id, lit(3)) === 0, lit(" &amp; &lt;tag&gt;"))
          .otherwise(lit("")),
        when(pmod(id, lit(4)) === 0, lit(" café")).otherwise(lit("")),
        when(pmod(id, lit(7)) === 0, lit(" &#8212; &eacute;"))
          .otherwise(lit("")),
        when(pmod(id, lit(11)) === 0, lit(" &foo; &#xD800;"))
          .otherwise(lit("")))
      graft.text.Normalize.normalizeDf(
        rd(s, d, "documents").select(id, raw.as("raw")), "doc_id", "raw")
    }),

    "temperature_alloc" -> ((s, d) => {
      // square-root temperature sampling (α=0.5, the mBERT/XLM-R
      // rebalancing): per-domain budget ∝ floor(√n) — the one temperature
      // that stays integer-exact; tail domains boosted without the head
      // drowning them
      val id = col("doc_id")
      val domain = synthDomain(id)
      graft.text.Sampling.sqrtTemperatureAlloc(
        rd(s, d, "documents").select(domain.as("domain")), "domain",
        budget = 100000L)
    }),

    "langid_confusion" -> ((s, d) => {
      // language-ID eval harness: docs with KNOWN truth synthesized from
      // the classifier's own stopword profiles; doc_id%5 docs get the
      // NEXT language's full profile appended — the 8-vs-8/9-vs-9 ties
      // resolve by the documented profile order, flipping exactly the
      // fr+en case, so the confusion matrix is deterministically
      // non-diagonal and the oracle re-renders text AND replays the
      // cascade
      val id = col("doc_id")
      val m4 = pmod(id, lit(4))
      val profs = TA.LangProfiles.map { case (l, ws) =>
        l -> ws.mkString(" ") }.toMap
      val truth = when(m4 === 0, "en").when(m4 === 1, "es")
        .when(m4 === 2, "de").otherwise("fr")
      val baseText = when(m4 === 0, profs("en")).when(m4 === 1, profs("es"))
        .when(m4 === 2, profs("de")).otherwise(profs("fr"))
      val nextText = when(m4 === 0, profs("es")).when(m4 === 1, profs("de"))
        .when(m4 === 2, profs("fr")).otherwise(profs("en"))
      val text = concat(baseText,
        when(pmod(id, lit(5)) === 0, concat(lit(" "), nextText))
          .otherwise(lit("")))
      rd(s, d, "documents")
        .select(truth.as("lang_true"), TA.langIdCol(text).as("lang_pred"))
        .groupBy("lang_true", "lang_pred").agg(count(lit(1)).as("n"))
    }),

    "vocab_growth" -> ((s, d) => {
      // Heaps-law vocabulary growth curve over 10 ingestion-order
      // buckets: one token-min shuffle + a 10-row running sum; the
      // health probe for unbounded junk vocabulary vs early flatline
      graft.text.CorpusStats.vocabGrowth(rd(s, d, "documents"), "doc_id",
        "text", buckets = 10)
    }),

    "js_divergence" -> ((s, d) => {
      // pairwise Jensen–Shannon divergence between language slices in
      // exact integer micro-nats: the distribution-shift matrix for
      // mixture decisions; exclusive-token mass folded in closed form so
      // the join touches only shared vocabulary
      graft.text.CorpusStats.jsDivergence(rd(s, d, "documents"), "lang",
        "text")
    }),

    "zipf_slope" -> ((s, d) => {
      // Zipf rank-frequency slope per language over the top-50 vocab:
      // one (slice, token) count shuffle, native bounded-heap top-k
      // (GraftTopK), integer micro-nat least squares with ONE toward-zero
      // division — natural text lands near -1000 milli
      graft.text.CorpusStats.zipfSlope(rd(s, d, "documents"), "lang",
        "text", k = 50)
    }),

    "token_counts" -> ((s, d) => {
      rd(s, d, "documents").select(col("doc_id"),
        TA.wsTokenCountCol(col("text")).cast("long").as("ws_tokens"),
        TA.bpeTokenCountCol(col("text")).cast("long").as("bpe_tokens"),
        length(col("text")).cast("long").as("n_chars"))
    }),

    "fingerprint" -> ((s, d) => {
      rd(s, d, "documents").select(col("doc_id"),
        TA.fingerprintCol(col("text")).as("fp"))
    }),

    // --------------------------------------------------------- dedup ------
    "exact_dedup" -> ((s, d) => {
      Dedup.exactDuplicates(
        rd(s, d, "documents").withColumn("t2", docText).select(col("doc_id"), col("t2")),
        "doc_id", "t2")
        .select(col("doc_id"), col("canonical_id"), col("group_size"),
          col("is_duplicate"))
    }),

    // Exact distributed percentiles: Spark's `percentile` (sort-based exact
    // linear interpolation) vs DuckDB's quantile_cont — two engines' exact
    // quantile implementations must agree to 6dp. (approx_percentile is the
    // sketch alternative; like HLL it is not cross-engine replayable.)
    "percentiles" -> ((s, d) => {
      rd(s, d, "lineitem").groupBy("l_returnflag").agg(
        round(expr("percentile(l_quantity, 0.25)"), 6).as("qty_p25"),
        round(expr("percentile(l_quantity, 0.5)"), 6).as("qty_p50"),
        round(expr("percentile(l_extendedprice, 0.75)"), 6).as("price_p75"))
    }),

    // KMV distinct-count sketch (Sketches.kmvDistinct): typed Aggregator
    // with a bounded k-smallest-hash buffer — map-side combine, one sketch
    // shuffle — whose estimate is a pure set function, so DuckDB replays
    // it exactly (HLL never could). Exact count alongside for error
    // visibility in the gate output.
    "kmv_distinct" -> ((s, d) => {
      val li = rd(s, d, "lineitem")
      graft.sketch.Sketches.kmvDistinct(li, Seq("l_returnflag"), "l_partkey", 64)
        .join(li.groupBy("l_returnflag")
          .agg(count_distinct(col("l_partkey")).as("distinct_exact")),
          Seq("l_returnflag"))
    }),

    // Misra-Gries heavy hitters (HeavyHitters.heavyHitters): the
    // frequent-items sketch next to KMV/CMS/HLL/Bloom. The stream is a
    // deterministic skewed derivation (two hot keys at ~20% each over a
    // unique cold tail — ~60% of rows are singleton keys, so the k=16
    // summary genuinely compresses a corpus-scale key space). Candidates
    // come from per-partition MG + treeReduce merge; the exact rescore
    // groupBy shuffles only the ≤16 candidate keys' rows. The output is
    // deterministic (MG's no-false-negative window at den ≤ k+1 makes the
    // exact threshold filter partition-layout-independent) and the oracle
    // is the plain exact threshold.
    "heavy_hitters" -> ((s, d) => {
      val stream = rd(s, d, "lineitem").select(
        when(pmod(col("l_orderkey") + col("l_linenumber"), lit(10)) < 4,
          concat(lit("hot-"),
            pmod(col("l_orderkey") + col("l_linenumber"), lit(2))))
          .otherwise(concat(lit("cold-"), col("l_orderkey"), lit("-"),
            col("l_linenumber")))
          .as("value"))
      graft.sketch.HeavyHitters.heavyHitters(stream, "value", k = 16, den = 8)
    }),

    // HyperLogLog distinct sketch (Sketches.hllDistinct): the production
    // 256-byte-register sketch with every step pinned to engine-neutral
    // integer/string math — hex-string rho (no float log2), exact-rational
    // α_256 through one 128-bit division, and a JVM-precomputed
    // linear-counting table embedded verbatim in the oracle. Two groups
    // exercise BOTH estimator branches: per-returnflag part keys take the
    // raw harmonic path (~2000 distinct over 256 registers), the 7-value
    // line numbers the small-range linear-counting branch. Exact counts
    // alongside for error visibility, as with kmv_distinct.
    "hll_distinct" -> ((s, d) => {
      val li = rd(s, d, "lineitem")
      val pairs = li.select(concat(lit("pk:"), col("l_returnflag")).as("grp"),
          col("l_partkey").cast("string").as("v"))
        .unionAll(li.select(lit("ln:all").as("grp"),
          col("l_linenumber").cast("string").as("v")))
      graft.sketch.Sketches.hllDistinct(pairs, "grp", "v")
        .join(pairs.groupBy("grp")
          .agg(count_distinct(col("v")).as("distinct_exact")), Seq("grp"))
    }),

    // HLL register mergeability (Sketches.hllRegisters +
    // hllEstimateFromRegisters): per-snapshot registers union+max into the
    // union's registers WITHOUT rescanning rows — the property that lets a
    // 100 TB pipeline keep per-day sketches and answer any date range by
    // register merge. The query runs BOTH paths (per-half registers merged
    // vs one direct sketch); the oracle asserts the set identity, so a
    // broken merge shows up as est_merged ≠ est_direct.
    "hll_merge" -> ((s, d) => {
      val li = rd(s, d, "lineitem")
      def half(m: Int) = li.filter(pmod(col("l_orderkey"), lit(2)) === m)
        .select(lit("pk").as("grp"), col("l_partkey").cast("string").as("v"))
      val Sk = graft.sketch.Sketches
      val merged = Sk.hllRegisters(half(0), "grp", "v")
        .unionAll(Sk.hllRegisters(half(1), "grp", "v"))
        .groupBy("grp", "bucket").agg(max("reg").as("reg"))
      val estM = Sk.hllEstimateFromRegisters(merged, "grp")
        .withColumnRenamed("hll_est", "est_merged")
        .withColumnRenamed("zero_regs", "zero_merged")
      val estD = Sk.hllDistinct(
          li.select(lit("pk").as("grp"), col("l_partkey").cast("string").as("v")),
          "grp", "v")
        .withColumnRenamed("hll_est", "est_direct").drop("zero_regs")
      estM.join(estD, Seq("grp"))
        .withColumn("merge_exact", col("est_merged") === col("est_direct"))
    }),

    // KMV synopsis mergeability (Sketches.kmvSynopsis/kmvMergeSynopses/
    // kmvEstimateFromSynopsis): per-snapshot k-smallest-hash synopses
    // union + re-take-k into the union's synopsis without rescanning rows
    // (each half's k smallest contain every candidate for the union's).
    // Both paths run for real; the oracle's set identity makes a broken
    // merge show up as est_merged ≠ est_direct.
    "kmv_merge" -> ((s, d) => {
      val li = rd(s, d, "lineitem")
      def half(m: Int) = li.filter(pmod(col("l_orderkey"), lit(2)) === m)
        .select(lit("pk").as("grp"), col("l_partkey").cast("string").as("v"))
      val Sk = graft.sketch.Sketches
      val merged = Sk.kmvMergeSynopses(64, Seq("grp"),
        Sk.kmvSynopsis(half(0), Seq("grp"), "v", 64),
        Sk.kmvSynopsis(half(1), Seq("grp"), "v", 64))
      val estM = Sk.kmvEstimateFromSynopsis(merged, Seq("grp"), 64)
        .withColumnRenamed("distinct_est", "est_merged")
      val estD = Sk.kmvDistinct(
          li.select(lit("pk").as("grp"), col("l_partkey").cast("string").as("v")),
          Seq("grp"), "v", 64)
        .withColumnRenamed("distinct_est", "est_direct")
      estM.join(estD, Seq("grp"))
        .withColumn("merge_exact", col("est_merged") === col("est_direct"))
    }),

    "kmv_overlap" -> ((s, d) => {
      // snapshot-overlap estimation from synopses alone: how much do the
      // even-order and odd-order halves' partkey sets overlap — answered
      // from two 64-row synopses, no corpus rescan (Beyer et al. 2007)
      val li = rd(s, d, "lineitem")
      def half(m: Int) = li.filter(pmod(col("l_orderkey"), lit(2)) === m)
        .select(lit("pk").as("grp"), col("l_partkey").cast("string").as("v"))
      val Sk = graft.sketch.Sketches
      Sk.kmvOverlap(
        Sk.kmvSynopsis(half(0), Seq("grp"), "v", 64),
        Sk.kmvSynopsis(half(1), Seq("grp"), "v", 64),
        Seq("grp"), 64)
    }),

    // CMS mergeability (Sketches.cmsMerge): every counter is a sum over
    // input rows, so per-half sketches elementwise-add into EXACTLY the
    // union's sketch — collisions included. Both sketches are built for
    // real; the probe battery must agree cell-for-cell with one direct
    // build (and the collision-exact freq_exact ride-along).
    "cms_merge" -> ((s, d) => {
      val t = rd(s, d, "documents").withColumn("t2", docText)
        .select(col("doc_id"), col("t2"))
      val Sk = graft.sketch.Sketches
      def half(m: Int) = t.filter(pmod(col("doc_id"), lit(2)) === m)
      val merged = Sk.cmsMerge(Seq(
        Sk.cmsBuild(half(0), "t2", width = 512, depth = 3),
        Sk.cmsBuild(half(1), "t2", width = 512, depth = 3)), width = 512, depth = 3)
      val direct = Sk.cmsBuild(t, "t2", width = 512, depth = 3)
      val probes = t.groupBy("t2")
        .agg(min("doc_id").as("doc_id"), count(lit(1)).as("freq_exact"))
      Sk.cmsEstimate(
          Sk.cmsEstimate(probes, "t2", merged, 512, 3, estCol = "freq_merged"),
          "t2", direct, 512, 3, estCol = "freq_direct")
        .withColumn("merge_exact", col("freq_merged") === col("freq_direct"))
        .select("doc_id", "freq_merged", "freq_direct", "freq_exact", "merge_exact")
    }),

    // Z-order curve values (Layout.zValue) over a 2-D key grid — the
    // layout step that makes BOTH filter dimensions row-group-skippable
    // (LayoutSpec asserts the bounding-box property of the full zOrdered
    // repartition; the curve math is what the oracle replays bit-exactly).
    "zorder_layout" -> ((s, d) => {
      rd(s, d, "lineitem")
        .select(pmod(col("l_orderkey"), lit(256)).as("ka"),
          pmod(col("l_partkey"), lit(256)).as("kb"))
        .distinct()
        .withColumn("zval", graft.io.Layout.zValue(col("ka"), col("kb"), 8))
    }),

    // contiguous 0-based global IDs (io.Ids.assign) in a scrambled total
    // order — zipWithIndex without the single-partition window: range
    // partition + per-partition counts + driver prefix-sum + broadcast
    // offsets. The oracle is the window form the operator exists to avoid.
    "global_ids" -> ((s, d) => {
      val docs = rd(s, d, "documents")
        .select(col("doc_id"), pmod(col("doc_id"), lit(7)).as("grp"))
      graft.io.Ids.assign(docs, Seq("grp", "doc_id"), numPartitions = 8)
        .select(col("doc_id"), col("grp"), col("global_id"))
    }),

    // DOM tokenization (Dom.nodesDf): stack-based HTML → ordered text-node
    // rows, run over HTML synthesized from each document (title / nav
    // anchors / main div / optional second paragraph / optional inline-link
    // paragraph / footer, plus a comment, a script body with a bare `<`,
    // and a `>` inside a quoted attribute). The template is a deterministic
    // function of (doc_id, text), so the oracle replays the node list —
    // path, depth, anchor flag, collapsed text, word counts — without
    // parsing any HTML: a tokenizer defect shifts or corrupts rows and
    // breaks parity. Plan: typed mapPartitions, zero exchanges.
    "dom_nodes" -> ((s, d) => {
      val docs = rd(s, d, "documents").select(col("doc_id"), domHtml.as("html"))
      graft.segment.Dom.nodesDf(docs, "doc_id", "html")
    }),

    // North-star interleaved strip (Dom.stripInterleaved): HTML text spans
    // DOM-cleaned (anchor text dropped, all-anchor spans removed), media
    // spans passed through untouched, every survivor keeping its original
    // offset so (doc_id, offset) restores the interleaving. Zero-shuffle
    // plan; the oracle re-renders both branches from the same lineitem
    // derivation.
    "dom_interleaved" -> ((s, d) => {
      val li = rd(s, d, "lineitem").filter(col("l_orderkey") <= 20000)
      val textSpans = li.select(
        col("l_orderkey").cast("string").as("doc_id"),
        lit("text").as("kind"), domSpanText.as("text"),
        lit(null).cast("string").as("media_ref"),
        (col("l_linenumber") * 2).cast("int").as("offset"))
      val mediaSpans = li.filter(pmod(col("l_partkey"), lit(3)) === 0).select(
        col("l_orderkey").cast("string").as("doc_id"),
        lit("media").as("kind"),
        lit(null).cast("string").as("text"),
        domMediaRef.as("media_ref"),
        (col("l_linenumber") * 2 + 1).cast("int").as("offset"))
      graft.segment.Dom.stripInterleaved(textSpans.unionByName(mediaSpans))
    }),

    // Multimodal training-format serialization (Interleave.toMarkdown):
    // interleaved spans rendered as MMC4-style markdown — text blocks
    // verbatim, media spans as ![](media_ref) placeholders, blank-line
    // joined in offset order (the interleaving position IS the training
    // signal). ONE per-doc partial-agg groupBy; the oracle replays the
    // render with an ordered string_agg over the same span derivation.
    "interleave_markdown" -> ((s, d) => {
      val li = rd(s, d, "lineitem").filter(col("l_orderkey") <= 20000)
      val textSpans = li.select(
        col("l_orderkey").cast("string").as("doc_id"),
        lit("text").as("kind"), domSpanText.as("text"),
        lit(null).cast("string").as("media_ref"),
        (col("l_linenumber") * 2).cast("int").as("offset"))
      val mediaSpans = li.filter(pmod(col("l_partkey"), lit(3)) === 0).select(
        col("l_orderkey").cast("string").as("doc_id"),
        lit("media").as("kind"),
        lit(null).cast("string").as("text"),
        domMediaRef.as("media_ref"),
        (col("l_linenumber") * 2 + 1).cast("int").as("offset"))
      graft.interleave.Interleave.toMarkdown(
        textSpans.unionByName(mediaSpans))
    }),

    // Caption-candidate alignment (Interleave.nearestCaption): each media
    // span paired with its nearest text span (ties → preceding) — the
    // deterministic candidate-extraction half of CLIP-style image-text
    // alignment. ONE per-doc window with a full tie-break order; the
    // oracle replays the ignore-nulls running last/first and the
    // distance rule.
    "caption_align" -> ((s, d) => {
      val li = rd(s, d, "lineitem").filter(col("l_orderkey") <= 20000)
      val textSpans = li.select(
        col("l_orderkey").cast("string").as("doc_id"),
        lit("text").as("kind"), domSpanText.as("text"),
        lit(null).cast("string").as("media_ref"),
        (col("l_linenumber") * 2).cast("int").as("offset"))
      val mediaSpans = li.filter(pmod(col("l_partkey"), lit(3)) === 0).select(
        col("l_orderkey").cast("string").as("doc_id"),
        lit("media").as("kind"),
        lit(null).cast("string").as("text"),
        domMediaRef.as("media_ref"),
        (col("l_linenumber") * 2 + 1).cast("int").as("offset"))
      graft.interleave.Interleave.nearestCaption(
        textSpans.unionByName(mediaSpans))
    }),

    // The ingest inverse (Interleave.fromMarkdown): the serialized corpus
    // parsed back to span rows — placeholders to media spans, dense block
    // positions as offsets. Composed as a REAL round-trip over toMarkdown;
    // the oracle re-renders the expected span relation with a window for
    // the dense positions.
    "markdown_spans" -> ((s, d) => {
      val li = rd(s, d, "lineitem").filter(col("l_orderkey") <= 20000)
      val textSpans = li.select(
        col("l_orderkey").cast("string").as("doc_id"),
        lit("text").as("kind"), domSpanText.as("text"),
        lit(null).cast("string").as("media_ref"),
        (col("l_linenumber") * 2).cast("int").as("offset"))
      val mediaSpans = li.filter(pmod(col("l_partkey"), lit(3)) === 0).select(
        col("l_orderkey").cast("string").as("doc_id"),
        lit("media").as("kind"),
        lit(null).cast("string").as("text"),
        domMediaRef.as("media_ref"),
        (col("l_linenumber") * 2 + 1).cast("int").as("offset"))
      graft.interleave.Interleave.fromMarkdown(
        graft.interleave.Interleave.toMarkdown(
          textSpans.unionByName(mediaSpans)), "doc_id", "md")
    }),

    // Readability-style main-container selection (Dom.mainContent): group
    // text nodes by parent path, score Σ(n_words − 3·n_link_words), keep
    // the per-doc argmax container's nodes. One partial-agg groupBy + one
    // per-doc window; the oracle replays scoring and argmax over the same
    // replayed node list.
    "dom_main" -> ((s, d) => {
      val docs = rd(s, d, "documents").select(col("doc_id"), domHtml.as("html"))
      graft.segment.Dom.mainContent(
        graft.segment.Dom.nodesDf(docs, "doc_id", "html"), "doc_id")
        .select(col("doc_id"), col("node_idx"), col("parent"), col("path"),
          col("text"), col("score"), col("content_words"))
    }),

    // HTML-table extraction (Dom.tablesDf): the structured-table side
    // output over <table> markup — header flags, 0-based (table,row,col)
    // indices, implied td/tr closes, an EMPTY cell (structure: a dropped
    // empty cell shifts every later col_idx), and a nested table whose text
    // belongs to the inner cell while the outer cell resumes after it.
    // Zero-shuffle typed mapPartitions; the oracle re-renders the expected
    // cell relation from the same template without parsing any HTML.
    "dom_tables" -> ((s, d) => {
      val id = col("doc_id").cast("string")
      val html = concat(
        lit("<html><body><p>intro "), id,
        lit("</p><table><tr><th>k</th><th>v</th></tr><tr><td>qty<td>"),
        col("n_chars").cast("string"),
        lit("</tr><tr><td>name "), id, lit("</td><td></td></tr></table>"),
        when(pmod(col("doc_id"), lit(4)) === 0,
          concat(lit("<table><tr><td>pre <table><tr><td>in "), id,
            lit("</td></tr></table>post</td></tr></table>")))
          .otherwise(lit("")),
        lit("</body></html>"))
      val docs = rd(s, d, "documents").select(col("doc_id"), html.as("html"))
      graft.segment.Dom.tablesDf(docs, "doc_id", "html")
    }),

    // Confusable-character scrub (TextAnalysis.confusableScrubCol):
    // zero-width chars deleted and Cyrillic/Greek homoglyphs mapped to
    // their Latin look-alikes, with detection counts — the obfuscated-spam
    // cleaner that must run BEFORE keyword filters and dedup shingling.
    // Template plants a ZWSP, three Cyrillic lookalikes, and (%3 docs) an
    // uppercase pair; the oracle re-renders the cleaned text and counts.
    "confusable_scrub" -> ((s, d) => {
      val id = col("doc_id").cast("string")
      val t = concat(lit("fr​ee hеrе sаle ref "), id,
        when(pmod(col("doc_id"), lit(3)) === 0,
          lit(" САLE")).otherwise(lit("")))
      val (inv, homo) = graft.text.TextAnalysis.confusableCountsCol(t)
      rd(s, d, "documents").select(col("doc_id"),
        graft.text.TextAnalysis.confusableScrubCol(t).as("clean"),
        inv.cast("long").as("n_invisible"),
        homo.cast("long").as("n_homoglyph"))
    }),

    // Table-to-markdown rendering (Dom.tablesToMarkdown): the extracted
    // cell rows serialized back as GitHub-markdown tables — the text-layer
    // form tabular content takes in a training corpus. Header separator
    // iff row 0 is all-header; two bounded-key groupBys; the oracle
    // re-renders every line (incl. the empty cell and the separator) from
    // the same template.
    "table_markdown" -> ((s, d) => {
      val id = col("doc_id").cast("string")
      val html = concat(
        lit("<html><body><p>intro "), id,
        lit("</p><table><tr><th>k</th><th>v</th></tr><tr><td>qty<td>"),
        col("n_chars").cast("string"),
        lit("</tr><tr><td>name "), id, lit("</td><td></td></tr></table>"),
        when(pmod(col("doc_id"), lit(4)) === 0,
          concat(lit("<table><tr><td>pre <table><tr><td>in "), id,
            lit("</td></tr></table>post</td></tr></table>")))
          .otherwise(lit("")),
        lit("</body></html>"))
      val docs = rd(s, d, "documents").select(col("doc_id"), html.as("html"))
      graft.segment.Dom.tablesToMarkdown(
        graft.segment.Dom.tablesDf(docs, "doc_id", "html"), "doc_id")
    }),

    // Luhn-gated card scrubbing (TextAnalysis.ccScrubDf): candidates that
    // pass the ISO 7812 checksum are redacted, lookalike serials stay
    // verbatim — presence-regex alone would mangle order ids. Each doc
    // carries a valid Visa test number (dashed twin on even docs) and an
    // always-invalid +1 variant; the oracle re-renders the expected
    // redaction, so a checksum defect in either direction breaks parity.
    "cc_scrub" -> ((s, d) => {
      val id = col("doc_id").cast("string")
      val t = concat(lit("pay 4111111111111111"),
        when(pmod(col("doc_id"), lit(2)) === 0,
          lit(" and 4111-1111-1111-1111")).otherwise(lit("")),
        lit(" not 4111111111111112 ref "), id)
      graft.text.TextAnalysis.ccScrubDf(
        rd(s, d, "documents").select(col("doc_id"), t.as("t")),
        "doc_id", "t")
    }),

    // Markdown strip (TextAnalysis.markdownStripCol): README/doc corpora
    // flattened to prose — fences dropped, inline code/links/images keep
    // their text, heading/quote/list markers and emphasis removed. A fixed
    // per-doc template exercises every rule; the oracle re-renders the
    // expected flat text as a pure function of (doc_id, n_chars) — no
    // regex replay, so engine regex dialects can't diverge.
    "markdown_strip" -> ((s, d) => {
      val id = col("doc_id").cast("string")
      val md = concat(
        lit("# Doc "), id, lit("\n\n> note "),
        col("n_chars").cast("string"),
        lit("\n\nbody **bold "), id,
        lit("** with `code` and [link "), id,
        lit("](http://x)\n\n- a\n- b "), id,
        lit("\n\n```\nif (a < b) skip "), id,
        lit("\n```\n\ntail done"))
      rd(s, d, "documents").select(col("doc_id"),
        graft.text.TextAnalysis.markdownStripCol(md).as("clean"))
    }),

    // Token-budget corpus selection (Sampling.budgetSelect): keep the
    // best-scoring docs until the cumulative cost fills the budget — an
    // EXACT global running sum via distributed prefix-sum (range exchange
    // + per-partition offsets prefix-summed on the driver, one row per
    // partition), never a single-partition global window. The oracle is
    // the plain SQL window cumsum the operator refuses to plan.
    "budget_select" -> ((s, d) => {
      Sampling.budgetSelect(
        rd(s, d, "documents").select(col("doc_id"),
          pmod(col("n_chars") * 31 + col("doc_id"), lit(1000)).as("q"),
          (pmod(col("n_chars"), lit(997)) + 1).as("c")),
        "doc_id", "q", "c", budget = 100000L)
    }),

    // RNG-free priority sampling (Sampling.prioritySample): weight ∝
    // n_chars, k=50, estimator weights attached (ŵ = max(w, τ)); selection
    // runs at full double precision, display columns rounded to 6dp.
    "priority_sample" -> ((s, d) => {
      Sampling.prioritySample(
        rd(s, d, "documents").select(col("doc_id"), col("n_chars").as("w")),
        "doc_id", "w", k = 50)
        .select(col("doc_id"), col("w"), round(col("priority"), 6).as("priority"),
          col("est_weight"))
    }),

    // Context-window chunking (Chunking.chunkDf): 32-token chunks with
    // 8-token overlap — completely narrow (zero exchanges at any corpus
    // size), integer-exact boundaries the oracle replays with list slicing.
    "doc_chunks" -> ((s, d) => {
      graft.text.Chunking.chunkDf(
        rd(s, d, "documents").withColumn("t2", docText)
          .select(col("doc_id"), col("t2")),
        "doc_id", "t2", chunkSize = 32, overlap = 8)
    }),

    // Content-defined chunking (Chunking.cdcChunks): window-hash cut
    // points, 2^6 expected chunk length 64, max-size cap 256; the oracle
    // replays every boundary and the verbatim chunk bytes.
    "cdc_chunks" -> ((s, d) =>
      graft.text.Chunking.cdcChunks(
        rd(s, d, "documents").withColumn("t2", docText)
          .select(col("doc_id"), col("t2")),
        "doc_id", "t2", windowLen = 16, maskBits = 6, maxLen = 256)),

    // BM25 top-k retrieval (SparseSim.bm25TopK): three probe queries against
    // the corpus inverted index; query side broadcasts, one row_number
    // window per query. k1=1.5 (not the 1.2 default) so every float
    // constant in the score (k1+1=2.5, 1-b=0.25, b·1000=750) is exactly
    // representable — no cross-engine ulp hazard in the literals.
    "bm25_topk" -> ((s, d) => bm25Fixture(s, d)),

    "hybrid_rrf" -> ((s, d) => {
      // hybrid retrieval: RRF-fuse the BM25 list with a coordination-
      // overlap retriever (|query tokens ∩ doc tokens|, a genuinely
      // different lexical signal) for the same three queries — docs hit
      // by BOTH retrievers rise, rank-based fusion needs no score
      // calibration. Both inputs are bounded top-10 lists
      import s.implicits._
      val queries = Seq(1L -> "mortgagee bank",
        2L -> "duplicate content block",
        3L -> "policy limit payment").toDF("qid", "qtext")
      val qt = queries.select(col("qid"), TA.tokensCol(col("qtext")).as("qt"))
      val overlap = rd(s, d, "documents").withColumn("t2", docText)
        .select(col("doc_id"), TA.tokensCol(col("t2")).as("dt"))
        .crossJoin(broadcast(qt))
        .withColumn("overlap", size(array_intersect(col("dt"), col("qt"))))
        .filter(col("overlap") > 0)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("qid")
            .orderBy(col("overlap").desc, col("doc_id"))))
        .filter(col("rank") <= 10)
        .select("qid", "doc_id", "rank")
      graft.sim.Fusion.rrf(
        Seq(bm25Fixture(s, d).select("qid", "doc_id", "rank"), overlap),
        "qid", "doc_id", "rank", kConst = 60, topK = 10)
    }),

    // Count-Min frequency sketch (Sketches.cmsBuild/Estimate): d×w counter
    // grid treeReduce-added, estimate = min over rows. w=512 forces real
    // collisions at both scales; the oracle replays cell counts and the
    // min, so over-counts must match exactly. Exact frequency alongside.
    "cms_freq" -> ((s, d) => {
      val t = rd(s, d, "documents").withColumn("t2", docText)
        .select(col("doc_id"), col("t2"))
      val sketch = graft.sketch.Sketches.cmsBuild(t, "t2", width = 512, depth = 3)
      val probes = t.groupBy("t2")
        .agg(min("doc_id").as("doc_id"), count(lit(1)).as("freq_exact"))
      graft.sketch.Sketches.cmsEstimate(probes, "t2", sketch, 512, 3)
        .select("doc_id", "freq_est", "freq_exact")
    }),

    // Sparse TF-IDF cosine pairs (SparseSim.tfidfPairs): inverted-index
    // candidates, milli-nat integer IDF weights (exact int64 dots/norms),
    // maxDf stopword cap live at both scales — at sf0.1 it genuinely drops
    // the injected duplicate-block tokens (df > 200), changing the result.
    "tfidf_pairs" -> ((s, d) => {
      graft.sim.SparseSim.tfidfPairs(
        rd(s, d, "documents").withColumn("t2", docText)
          .select(col("doc_id"), col("t2")),
        "doc_id", "t2", minCos = 0.5, maxDf = 200)
    }),

    // Incremental Bloom-filter dedup (Bloom.build/probe): the filter is
    // built over the even-doc_id half ("already ingested"), broadcast, and
    // the odd half probes it map-only. m is sized so the sf0.1 corpus
    // produces genuine false positives — the oracle replays the double
    // hashing exactly, so even those FPs must match bit-for-bit.
    "bloom_dedup" -> ((s, d) => {
      val t = rd(s, d, "documents").withColumn("t2", docText)
        .select(col("doc_id"), col("t2"))
      val filter = graft.dedup.Bloom.build(
        t.filter(pmod(col("doc_id"), lit(2)) === 0), "t2", m = 16384, k = 4)
      graft.dedup.Bloom.probe(
          t.filter(pmod(col("doc_id"), lit(2)) === 1), "t2", filter, m = 16384, k = 4)
        .select(col("doc_id"), col("flagged"))
    }),

    // Bloom filter mergeability (Bloom.merge): each bit is an OR over
    // input rows, so per-snapshot filters OR into EXACTLY the union's
    // filter. Thirds 0/1 build separately and merge; third 2 probes the
    // merged filter AND a direct build over thirds 0∪1 — the oracle's
    // single replay supplies both columns, so a broken merge (any flag
    // moved, false positives included) breaks parity.
    "bloom_merge" -> ((s, d) => {
      val t = rd(s, d, "documents").withColumn("t2", docText)
        .select(col("doc_id"), col("t2"))
      val B = graft.dedup.Bloom
      def third(m: Int) = t.filter(pmod(col("doc_id"), lit(3)) === m)
      val merged = B.merge(Seq(
        B.build(third(0), "t2", m = 16384, k = 4),
        B.build(third(1), "t2", m = 16384, k = 4)))
      val direct = B.build(
        t.filter(pmod(col("doc_id"), lit(3)) < 2), "t2", m = 16384, k = 4)
      B.probe(
          B.probe(third(2), "t2", merged, m = 16384, k = 4, flagCol = "flag_merged"),
          "t2", direct, m = 16384, k = 4, flagCol = "flag_direct")
        .withColumn("merge_exact", col("flag_merged") === col("flag_direct"))
        .select("doc_id", "flag_merged", "flag_direct", "merge_exact")
    }),

    "minhash_sig" -> ((s, d) => {
      Dedup.minhashSignaturesTyped(rd(s, d, "documents"), "doc_id", "text", n = 3, k = 4)
        .select(col("doc_id"),
          element_at(col("sig"), 1).as("s0"), element_at(col("sig"), 2).as("s1"),
          element_at(col("sig"), 3).as("s2"), element_at(col("sig"), 4).as("s3"))
    }),

    "simhash_fp" -> ((s, d) => {
      Dedup.simhashFingerprints(rd(s, d, "documents"), "doc_id", "text")
    }),

    "ngram_jaccard" -> ((s, d) => {
      Dedup.jaccardPairs(
        rd(s, d, "documents").withColumn("t2", docText).select(col("doc_id"), col("t2")),
        "doc_id", "t2", n = 3, minJ = 0.2)
        .select(col("id_a"), col("id_b"), col("jaccard"))
    }),

    "pii_scrub" -> ((s, d) => {
      // deterministic PII injections over documents; redaction + per-class
      // counts must match DuckDB's RE2 replay byte-for-byte
      val t = concat(col("text"),
        when(pmod(col("doc_id"), lit(5)) === 0,
          concat(lit(" contact agent"), col("doc_id").cast("string"),
            lit("@example.com"))).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(7)) === 0,
          lit(" call (555) 123-4567 or 555-987-6543")).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(9)) === 0,
          lit(" ssn 123-45-6789")).otherwise(lit("")))
      val withT = rd(s, d, "documents").withColumn("t", t)
      val (e, p, ssn) = TA.piiCountsCol(col("t"))
      withT.select(col("doc_id"), TA.scrubPiiCol(col("t")).as("clean"),
        e.cast("long").as("n_email"), p.cast("long").as("n_phone"),
        ssn.cast("long").as("n_ssn"))
    }),

    "k_anon" -> ((s, d) => {
      // structured-release privacy gate: (nation, segment) is the QI pair,
      // the sensitive attribute is the account balance coarsened to 2k
      // buckets (raw balances are all-distinct, which would make every
      // group trivially l-diverse)
      val c = rd(s, d, "customer").withColumn("bal_bucket",
        floor(col("c_acctbal") / lit(2000.0)).cast("long"))
      graft.text.Privacy.kAnonymize(
          c, Seq("c_nationkey", "c_mktsegment"), "bal_bucket", k = 10, l = 5)
        .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
          col("group_n"), col("n_sensitive"), col("suppressed"),
          col("l_diverse"))
    }),

    "slice_datasheet" -> ((s, d) => {
      // the release datasheet at (lang, source) granularity: doc/token/
      // char totals + docs participating in a CORPUS-wide exact-dup group
      val t = rd(s, d, "documents")
      val withFp = t.withColumn("__fp", TA.fingerprintCol(col("text")))
      val dupFp = withFp.groupBy("__fp").agg(count(lit(1)).as("__c"))
        .filter(col("__c") > 1).select(col("__fp"), lit(1L).as("__dup"))
      withFp.join(dupFp, Seq("__fp"), "left")
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum(TA.wsTokenCountCol(col("text")).cast("long")).as("n_ws_tokens"),
          sum(col("n_chars")).as("n_chars"),
          sum(when(col("__dup").isNotNull, 1L).otherwise(0L)).as("n_dup_docs"))
    }),

    "simhash_idf" -> ((s, d) => {
      // production-weighted SimHash: idf votes in integer micro-nats
      Dedup.simhashIdfFingerprints(rd(s, d, "documents"), "doc_id", "text")
    }),

    "context_gain" -> ((s, d) => {
      // per-doc mean bigram information gain (PMI rate) under the en-slice
      // reference — the relative predictability ranking signal
      val docs = rd(s, d, "documents")
      graft.text.Perplexity.contextGain(
        docs.withColumn("t2", docText).select(col("doc_id"), col("t2")),
        "doc_id", "t2",
        docs.filter(col("lang") === "en").select("text"), "text")
    }),

    "rake_keywords" -> ((s, d) => {
      // RAKE per-doc keywords (Rose et al. 2010): degree/frequency word
      // scores over stopword-delimited phrase runs, integer milli, top-3
      // per doc (score desc, phrase asc). Zero-shuffle typed kernel; the
      // oracle rebuilds phrases with a boundary-count window and replays
      // the full deg/freq join and ranking
      graft.text.Rake.keywordsDf(rd(s, d, "documents"), "doc_id", "text",
        topK = 3)
    }),

    "pmi_collocations" -> ((s, d) => {
      // top-25 adjacent-pair collocations by integer micro-nat PMI
      TA.pmiCollocations(rd(s, d, "documents"), "text",
        minCount = 20L, topK = 25)
    }),

    "bbit_minhash" -> ((s, d) => {
      // b-bit minwise hashing: 8-bit compressed 4-component signatures,
      // pairs bucketed on the first compressed byte, corrected estimator
      // next to the full-width one; bounded corpus for SF stability
      Dedup.bbitMinhashPairs(
        rd(s, d, "documents").filter(col("doc_id") <= 500),
        "doc_id", "text", n = 3, k = 4, b = 8)
    }),

    "water_fill" -> ((s, d) => {
      // exact water-filling source balancing: per-domain token totals
      // (the domain_cap fixture key) cut to the largest integer level
      // that fits a 15k-token budget
      val g = rd(s, d, "documents")
        .select(concat(col("source"), lit("-"),
          pmod(col("doc_id"), lit(7)).cast("string")).as("domain"),
          TA.wsTokenCountCol(col("text")).cast("long").as("tok"))
        .groupBy("domain").agg(sum("tok").as("tokens"))
      Sampling.waterFill(g, "domain", "tokens", budget = 15000L)
        .select(col("domain"), col("tokens"), col("alloc"), col("capped"))
    }),

    "ann_recall" -> ((s, d) => {
      // ANN parameter-tuning eval (the minhash_recall pattern for vector
      // search): per-query recall of IVF-Flat (nlist=8, nProbe=2) against
      // the exact brute-force top-10 truth
      val e = rd(s, d, "embeddings")
      val q = e.filter(col("vec_id") < 5)
      val truth = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 10)
        .select("query_id", "neighbor_id")
      val found = Similarity.ivfTopK(e, q, "vec_id", "embedding",
          k = 10, nlist = 8, nProbe = 2, iters = 1)
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("__hit"))
      truth.join(found, Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg(count(lit(1)).as("k_truth"),
          sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
        .withColumn("recall_milli", expr("1000 * n_hit div k_truth"))
    }),

    "url_bitext" -> ((s, d) => {
      // ParaCrawl-style URL-pattern alignment: synthetic site URLs carry
      // the doc's language as a path segment; mates share (site, page)
      // bounded to doc_id < 500 (the stream_minhash idiom) so both SFs
      // see the same 91-key fixture with ~5-doc groups under the cap
      val docs = rd(s, d, "documents").filter(col("doc_id") < 500)
        .select(col("doc_id"),
          concat(lit("https://site"), pmod(col("doc_id"), lit(7)).cast("string"),
            lit("/"), col("lang"), lit("/page"),
            pmod(col("doc_id"), lit(13)).cast("string")).as("url"))
      graft.text.Web.urlBitextPairs(docs, "doc_id", "url", maxGroup = 32)
    }),

    "release_e2e" -> ((s, d) => {
      // the privacy-release chain composed relationally: k-anonymity gate
      // (small (nation, segment) groups suppressed) -> seeded-Laplace
      // noisy counts over the kept groups; one agg + one join + one agg
      val c = rd(s, d, "customer").withColumn("bal_bucket",
        floor(col("c_acctbal") / lit(2000.0)).cast("long"))
      val gated = graft.text.Privacy.kAnonymize(
          c, Seq("c_nationkey", "c_mktsegment"), "bal_bucket", k = 10, l = 5)
        .filter(!col("suppressed"))
      graft.text.Privacy.dpCounts(gated,
        Seq("c_nationkey", "c_mktsegment"), epsMilli = 500, salt = "rel1")
    }),

    "pseudonymize" -> ((s, d) => {
      // keyed pseudonymization over the pii_scrub injection fixture:
      // linkable pseudonyms instead of redaction; SSNs are out of scope
      // here (redaction-only class) and pass through
      val t = concat(col("text"),
        when(pmod(col("doc_id"), lit(5)) === 0,
          concat(lit(" contact agent"), col("doc_id").cast("string"),
            lit("@example.com"))).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(7)) === 0,
          lit(" call (555) 123-4567 or 555-987-6543")).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(9)) === 0,
          lit(" ssn 123-45-6789")).otherwise(lit("")))
      graft.text.Privacy.pseudonymizeDf(
        rd(s, d, "documents").withColumn("t", t), "doc_id", "t", "pz1")
    }),

    "code_clones" -> ((s, d) => {
      // type-2 clone detection over a synthetic code corpus: 15 naming
      // variants x 40 structural seeds; renamed identifiers and changed
      // constants collapse, operator/arity differences do not
      val base = rd(s, d, "customer").filter(col("c_custkey") <= 600)
        .withColumn("g", pmod(col("c_custkey"), lit(40)))
        .withColumn("v", expr("cast(c_custkey div 40 as string)"))
        .withColumn("op", when(pmod(col("g"), lit(4)) === 0, lit("+"))
          .when(pmod(col("g"), lit(4)) === 1, lit("-"))
          .when(pmod(col("g"), lit(4)) === 2, lit("*")).otherwise(lit("/")))
        .withColumn("code", concat(lit("def fn"), col("v"), lit(" ( arg"),
          col("v"), lit(" , tmp"), col("v"), lit(" ) : return arg"), col("v"),
          expr("repeat(concat(' ', op, ' tmp', v), cast(g % 3 + 1 as int))"),
          lit(" ; "), col("g").cast("string")))
      graft.dedup.Clones.cloneGroups(
        base.select(col("c_custkey").as("doc_id"), col("code")),
        "doc_id", "code")
    }),

    "oov_rate" -> ((s, d) => {
      // tokenizer-coverage report: the corpus' own top-50 tokens as the
      // vocab, OOV fraction per language slice
      val docs = rd(s, d, "documents")
      TA.oovStats(docs, "lang", "text", TA.topTokensDf(docs, "text", 50))
        .select(col("slice"), col("n_tokens"), col("n_oov"), col("oov_milli"))
    }),

    "rendezvous_shard" -> ((s, d) => {
      // HRW stable sharding of the corpus into 8 shards
      graft.io.Bucketing.rendezvousShard(
        rd(s, d, "documents").select("doc_id"), "doc_id", 8)
        .select(col("doc_id"), col("shard"))
    }),

    "dp_counts" -> ((s, d) => {
      // seeded-Laplace noisy count release per market segment, eps=0.5
      graft.text.Privacy.dpCounts(rd(s, d, "customer"),
        Seq("c_mktsegment"), epsMilli = 500, salt = "dp1")
    }),

    "distinct_ngrams" -> ((s, d) => {
      // distinct-n diversity per language slice, n in {1,2,3}
      TA.distinctNgramStats(rd(s, d, "documents"), "lang", "text", Seq(1, 2, 3))
        .select(col("slice").as("lang"), col("n"), col("total_ngrams"),
          col("distinct_ngrams"), col("distinct_milli"))
    }),

    "snm_pairs" -> ((s, d) => {
      // sorted-neighborhood blocking: prefix of the lowered text as the
      // discriminating key, window 4 over the global (key, id) order
      val docs = rd(s, d, "documents")
        .select(col("doc_id"), substring(lower(col("text")), 1, 24).as("k"))
      graft.dedup.Blocking.sortedNeighborhood(docs, "doc_id", "k", 4)
        .select(col("id_a"), col("id_b"), col("rank_dist"))
    }),

    "kcenter_select" -> ((s, d) => {
      // greedy k-center coreset selection, 4 driver-paced rounds
      Similarity.kCenterSelect(rd(s, d, "embeddings"), "vec_id", "embedding", 4)
        .select(col("round"), col("vec_id"), col("dist2"))
    }),

    "audio_vad" -> ((s, d) => {
      // energy VAD through the REAL WAV decode path: frames of 64 samples,
      // active above the integer clip mean, hangover gap 1
      import s.implicits._
      val refs = rd(s, d, "supplier").select(
        concat(lit("wav-"), col("s_suppkey").cast("string")).as("ref"),
        (lit(256) + pmod(col("s_suppkey"), lit(512))).cast("int").as("n"))
        .as[(String, Int)]
      Media.vadSegments(refs, 64, 1000L, 1).toDF()
        .select(col("media_ref"), col("seg").cast("long").as("seg"),
          col("start_frame").cast("long").as("start_frame"),
          col("end_frame").cast("long").as("end_frame"),
          col("n_active").cast("long").as("n_active"))
    }),

    "video_scenes" -> ((s, d) => {
      // scene-cut detection over planted scene structure: frames inside a
      // scene share a seed (identical pixels), boundaries jump; hashes come
      // through the REAL PNG decode, cuts at aHash Hamming >= 8
      import s.implicits._
      val grp = pmod(col("c_custkey"), lit(30))
      val frames = rd(s, d, "customer").filter(col("c_custkey") <= 120)
        .select(concat(lit("scn-"), col("c_custkey").cast("string")).as("clip"),
          grp.as("g"))
        .select(col("clip"), col("g"),
          explode(sequence(lit(0), lit(7))).as("f"))
      val specs = frames.select(
        concat(col("clip"), lit("#"), col("f").cast("string")).as("ref"),
        TA.hash32(concat(lit("scene:"), col("g").cast("string"), lit(":"),
          expr("f div (2 + g % 3)").cast("string"))).as("seed"),
        (lit(16) + pmod(col("g"), lit(5))).cast("int").as("w"),
        (lit(12) + pmod(col("g"), lit(5))).cast("int").as("h"))
        .as[(String, Long, Int, Int)]
      val hashes = Media.imageHashes(specs).toDF()
        .select(split(col("media_ref"), "#").getItem(0).as("media_ref"),
          split(col("media_ref"), "#").getItem(1).cast("long").as("frame_index"),
          col("ahash_hi"), col("ahash_lo"))
      Media.sceneCuts(hashes, 8)
    }),

    "span_corrupt" -> ((s, d) => {
      // T5 denoising examples straight off the corpus: block-deterministic
      // span masking at the 15% default (blocks of 10, spans 0-3)
      graft.text.SpanCorrupt.corrupt(rd(s, d, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("input_text"), col("target_text"),
          col("n_spans"), col("n_masked"))
    }),

    "bitext_mine" -> ((s, d) => {
      // margin-based parallel-pair mining: even ids stand in for the source
      // language, odd ids for the target; both capped for a bounded oracle
      val e = rd(s, d, "embeddings")
      Similarity.bitextMine(
        e.filter(pmod(col("vec_id"), lit(2)) === 0 && col("vec_id") < 200),
        e.filter(pmod(col("vec_id"), lit(2)) === 1 && col("vec_id") < 200),
        "vec_id", "embedding", 4)
        .select(col("src_id"), col("dst_id"), col("cos_micro"),
          col("margin_milli"), col("is_best"))
    }),

    "curation_e2e" -> ((s, d) => {
      // the full pretraining-corpus curation chain in ONE plan: line-level
      // dedup of synthetic pages → token-count quality gate → zero-shuffle
      // hash sample → sequence packing of the survivors. Demonstrates the
      // operators compose relationally: one line-hash shuffle, one doc
      // groupBy, a pure filter, one shard window — nothing collected.
      val page = concat(lit("Home | About Us | Contact\n"), col("text"),
        lit("\nCopyright 2026 - All Rights Reserved"))
      val cleaned = Dedup.dedupLines(
        rd(s, d, "documents").withColumn("page", page),
        "doc_id", "page", maxOccurrences = 5)
      val gated = cleaned
        .withColumn("ws_tokens", TA.wsTokenCountCol(col("clean_text")).cast("long"))
        .filter(col("ws_tokens") >= 8)
      val sampled = Sampling.hashThreshold(gated, "doc_id", 0.5)
      Packing.pack(sampled, "doc_id", "clean_text", budget = 128, nShards = 4)
    }),

    "line_dedup" -> ((s, d) => {
      // CCNet-style line-level dedup over synthetic pages: corpus-wide
      // nav/footer chrome and per-group section headers repeat past the
      // cap; each doc's body line survives
      val page = concat(
        lit("Home | About Us | Contact\n"),
        lit("Section "), pmod(col("doc_id"), lit(7)).cast("string"), lit("\n"),
        col("text"), lit("\n"),
        lit("Copyright 2026 - All Rights Reserved"))
      Dedup.dedupLines(rd(s, d, "documents").withColumn("page", page),
        "doc_id", "page", maxOccurrences = 5)
    }),

    "decontaminate" -> ((s, d) => {
      // benchmark decontamination: docs with doc_id%23==0 stand in for an
      // eval suite; every corpus doc scored by 3-gram shingle overlap
      // against that inventory (the eval docs themselves score 1.0)
      val corpus = rd(s, d, "documents")
      val bench = corpus.filter(pmod(col("doc_id"), lit(23)) === 0)
      Dedup.contamination(corpus, "doc_id", "text", bench, "text",
        n = 3, minOverlap = 0.5)
    }),

    "seq_pack" -> ((s, d) =>
      // concat-then-split sequence packing: 8 md5 shards, 512-token budget
      Packing.pack(rd(s, d, "documents"), "doc_id", "text",
        budget = 512, nShards = 8)),

    "seq_pack_shuffled" -> ((s, d) =>
      // same packing with the deterministic md5 corpus shuffle on the tape
      Packing.pack(rd(s, d, "documents"), "doc_id", "text",
        budget = 512, nShards = 8, shuffleOrder = true)),

    "length_buckets" -> ((s, d) =>
      // padding-efficiency report for length-bucketed SFT batches: docs
      // bucket to the next power-of-two token length, batch ids come from
      // md5-sharded per-(bucket, shard) windows (the seq_pack idiom — no
      // corpus-scale single-partition window), waste in integer milli
      graft.text.Batching.paddingReport(rd(s, d, "documents"), "doc_id",
        "text", batchSize = 4, nShards = 4)),

    "epoch_plan" -> ((s, d) =>
      // fixed-token-budget data recipe: per-source token inventory (one
      // partial-agg groupBy) vs target milli-weights → needed tokens,
      // epochs (1000 = one pass), oversample flags — all integer math
      graft.text.Recipe.epochPlan(rd(s, d, "documents"), "source", "text",
        Map("src0" -> 400L, "src1" -> 300L, "src2" -> 200L, "src3" -> 100L),
        targetTokens = 50000L)),

    "sample_stratified" -> ((s, d) =>
      // deterministic 25% per-language sample, md5-ranked
      Sampling.stratified(rd(s, d, "documents"), "doc_id", "lang", 0.25)
        .select(col("doc_id"), col("lang"),
          col("sample_rank").cast("long").as("sample_rank"), col("stratum_n"))),

    "sample_hash" -> ((s, d) =>
      // scale-path sample: md5-threshold filter, zero shuffles at any size
      Sampling.hashThreshold(rd(s, d, "documents"), "doc_id", 0.25)
        .select(col("doc_id"), col("lang"), col("source"))),

    "domain_cap" -> ((s, d) => {
      // C4/CCNet-style per-domain cap: at most 10 docs per (synthetic)
      // domain, chosen by md5(id) rank — exact window baseline
      val docs = rd(s, d, "documents").withColumn("domain",
        concat_ws("-", col("source"), (col("doc_id") % 7).cast("string")))
      Sampling.domainCap(docs, "doc_id", "domain", 10)
        .select(col("doc_id"), col("domain"),
          col("domain_rank").cast("long").as("domain_rank"), col("domain_n"))
    }),

    "domain_cap_scalable" -> ((s, d) => {
      // skew-safe twin: integer hash32 prefilter bounds the window to
      // ~cap·slack rows per domain before the exact md5-rank cut
      val docs = rd(s, d, "documents").withColumn("domain",
        concat_ws("-", col("source"), (col("doc_id") % 7).cast("string")))
      Sampling.domainCapScalable(docs, "doc_id", "domain", 10, slack = 2)
        .select(col("doc_id"), col("domain"),
          col("domain_rank").cast("long").as("domain_rank"), col("domain_n"))
    }),

    "group_reservoir" -> ((s, d) => {
      // exact per-group cap as a mergeable bounded-buffer Aggregator —
      // same kept set as domain_cap (k smallest md5 per domain) but a
      // partial-agg plan: O(k) state per group, no window sort anywhere
      val docs = rd(s, d, "documents").withColumn("domain",
        concat_ws("-", col("source"), (col("doc_id") % 7).cast("string")))
      Sampling.groupReservoir(docs, "doc_id", "domain", 5)
        .select(col("doc_id"), col("domain"), col("res_rank"), col("group_n"))
    }),

    "mixture_sample" -> ((s, d) =>
      // domain-reweighting: prescribe per-language output doc counts — en
      // downsampled, de kept whole (target over-covers), zh deliberately
      // untargeted → dropped (mixture weights define the output universe)
      Sampling.mixtureSample(rd(s, d, "documents"), "doc_id", "lang",
        Map("en" -> 60L, "de" -> 100000L, "fr" -> 40L, "es" -> 40L))
        .select(col("doc_id"), col("lang"), col("stratum_n"),
          col("stratum_target"))),

    "substring_dedup" -> ((s, d) => {
      // exact substring dedup at 8-token spans: a boilerplate sentence
      // pasted into every 5th doc is stripped everywhere except one
      // canonical (md5-smallest) occurrence
      Dedup.dedupSubstrings(
        rd(s, d, "documents").withColumn("page", disclaimerPage),
        "doc_id", "page", k = 8, maxOccurrences = 1)
    }),

    "vocab_topk" -> ((s, d) =>
      // corpus-wide top-20 token vocabulary (distributed TopK, no global
      // sort; k < |vocab| so the cut and its tie-break actually bind)
      TA.topTokensDf(rd(s, d, "documents"), "text", 20)),

    // SCD2 snapshot merge (Snapshot.scd2Merge): increment at snapshot 2
    // into a corpus with open rows (%4≠3), closed history (%7); the
    // increment (%2) leaves %6 docs changed, odd docs untouched-open, %4=3
    // evens inserted — all four MERGE cases plus history pass-through in
    // one oracled plan.
    "scd2_merge" -> ((s, d) => {
      val docs = rd(s, d, "documents")
      val fp = TA.hash60(col("text"))
      val corpus = docs.filter(pmod(col("doc_id"), lit(4)) =!= 3)
        .select(col("doc_id"), fp.as("fp"), lit(1L).as("valid_from"),
          lit(null).cast("long").as("valid_to"))
        .unionByName(docs.filter(pmod(col("doc_id"), lit(7)) === 0)
          .select(col("doc_id"), TA.hash60(concat(col("text"), lit("old"))).as("fp"),
            lit(0L).as("valid_from"), lit(1L).cast("long").as("valid_to")))
      val inc = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(6)) === 0,
            TA.hash60(concat(col("text"), lit("v2")))).otherwise(fp).as("fp"))
      graft.io.Snapshot.scd2Merge(corpus, inc, "doc_id", "fp", snapshotId = 2L)
    }),

    // Deterministic train/val/test split (Sampling.datasetSplit): md5
    // permille buckets of the id — membership is a pure function of the
    // id, so docs never migrate between splits as the corpus grows.
    // Zero shuffles; the oracle replays bucket and cuts.
    "dataset_split" -> ((s, d) =>
      Sampling.datasetSplit(
        rd(s, d, "documents").select(col("doc_id")), "doc_id")),

    // Corpus datasheet: the one-row "datasheets for datasets" summary a
    // release ships — doc/token/char totals and the exact-dup count, all
    // integers, one scan + one final aggregate.
    "corpus_datasheet" -> ((s, d) => {
      val t = rd(s, d, "documents")
      t.agg(
        count(lit(1)).as("n_docs"),
        sum(TA.wsTokenCountCol(col("text")).cast("long")).as("n_ws_tokens"),
        sum(col("n_chars").cast("long")).as("n_chars"),
        (count(lit(1)) - countDistinct(TA.fingerprintCol(col("text"))))
          .as("n_exact_dups"))
    }),

    // Time-travel read (Snapshot.asOf): the corpus AS OF snapshot 1 — the
    // state before the snapshot-2 merge above ever happened. A pure scan
    // filter over the merged SCD2 table (prunable when laid out by
    // valid_from); the oracle applies the same validity predicate to its
    // merge replay.
    "scd2_asof" -> ((s, d) => {
      val docs = rd(s, d, "documents")
      val fp = TA.hash60(col("text"))
      val corpus = docs.filter(pmod(col("doc_id"), lit(4)) =!= 3)
        .select(col("doc_id"), fp.as("fp"), lit(1L).as("valid_from"),
          lit(null).cast("long").as("valid_to"))
        .unionByName(docs.filter(pmod(col("doc_id"), lit(7)) === 0)
          .select(col("doc_id"), TA.hash60(concat(col("text"), lit("old"))).as("fp"),
            lit(0L).as("valid_from"), lit(1L).cast("long").as("valid_to")))
      val inc = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(6)) === 0,
            TA.hash60(concat(col("text"), lit("v2")))).otherwise(fp).as("fp"))
      graft.io.Snapshot.asOf(
        graft.io.Snapshot.scd2Merge(corpus, inc, "doc_id", "fp",
          snapshotId = 2L),
        snapshotId = 1L)
    }),

    // Shingle-containment pairs (Dedup.containmentPairs): the %31 docs are
    // the bare disclaimer, fully contained in every %5 doc — near-zero
    // Jaccard, containment 1000; the oracle replays shingles, pair counts,
    // and both milli directions exactly.
    "containment_pairs" -> ((s, d) =>
      Dedup.containmentPairs(
        rd(s, d, "documents").withColumn("page", containmentPage)
          .select(col("doc_id"), col("page")),
        "doc_id", "page", n = 3, minMilli = 800)),

    // k-gram novelty triage (Dedup.noveltyScore) over the same pasted-
    // boilerplate fixture as substring_dedup: every 5th doc shares the
    // disclaimer's 8-grams (plus any organically shared spans), everything
    // else scores by its genuinely shared span mass; same tokenizer/hash as
    // the dedup pass so the two signals agree on what a span is.
    "novelty_score" -> ((s, d) =>
      Dedup.noveltyScore(
        rd(s, d, "documents").withColumn("page", disclaimerPage),
        "doc_id", "page", k = 8)),

    // JL random projection (Similarity.jlProject): 64-dim embeddings onto
    // 8 deterministic Rademacher directions, exact integer-micro output —
    // the oracle replays the sign mix and every coordinate sum bit-for-bit.
    "jl_project" -> ((s, d) =>
      Similarity.jlProject(rd(s, d, "embeddings"), "vec_id", "embedding", 8)),

    // Class-prototype mean pooling (Similarity.meanPool): per-label
    // element-wise mean of the embedding vectors in exact integer micro
    // (float sums are order-dependent; quantized sums are not) — ONE
    // partial-aggregated (label, dim) groupBy, relational output so a hot
    // label never builds per-key array state.
    "embed_pool" -> ((s, d) =>
      Similarity.meanPool(rd(s, d, "embeddings"), "label", "embedding")),

    // Hard-negative mining (Similarity.hardNegatives): per labeled query
    // the 5 nearest DIFFERENT-label vectors — the contrastive-training pair
    // miner; the oracle replays the label-filtered brute-force ranking.
    "hard_negatives" -> ((s, d) => {
      val e = rd(s, d, "embeddings")
      Similarity.hardNegatives(e, e.filter(col("vec_id") < 5), "vec_id",
        "embedding", "label", 5)
        .select(col("query_id"), col("query_label"), col("neighbor_id"),
          col("neighbor_label"), col("cos"), col("rank").cast("long").as("rnk"))
    }),

    "dedup_clusters" -> ((s, d) => {
      // near-dup pairs → connected components: min-label propagation to the
      // fixpoint, labelling every paired doc with its component's min id —
      // the keep-one-per-cluster stage of a production dedup pipeline
      val pairs = Dedup.jaccardPairs(
        rd(s, d, "documents").withColumn("t2", docText).select(col("doc_id"), col("t2")),
        "doc_id", "t2", n = 3, minJ = 0.2)
      Dedup.connectedComponents(pairs, "id_a", "id_b")
    }),

    "dedup_clusters_alt" -> ((s, d) => {
      // the SAME clustering through the alternating large-star/small-star
      // algorithm (Kiveris et al. 2014) — the long-diameter scale path:
      // O(log² n) rounds regardless of component shape, vs min-label's
      // O(diameter). Labels are min-of-component in both, so the identical
      // recursive-CTE oracle gates both implementations independently.
      val pairs = Dedup.jaccardPairs(
        rd(s, d, "documents").withColumn("t2", docText).select(col("doc_id"), col("t2")),
        "doc_id", "t2", n = 3, minJ = 0.2)
      Dedup.connectedComponentsAlternating(pairs, "id_a", "id_b")
    }),

    "dedup_canonical" -> ((s, d) => {
      // full corpus view: every doc tagged with its cluster and whether it
      // is the canonical (min-id) representative; singletons self-canonical
      val docs = rd(s, d, "documents").withColumn("t2", docText)
        .select(col("doc_id"), col("t2"))
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "t2", n = 3, minJ = 0.2)
      Dedup.canonicalize(rd(s, d, "documents").select(col("doc_id")), "doc_id", pairs)
        .select(col("doc_id"), col("cluster_id"), col("is_canonical"))
    }),

    "dedup_best_of_cluster" -> ((s, d) => {
      // quality-survivor canonical selection: within each dup cluster the
      // LONGEST text wins (ties → min id) — the production keep-best rule,
      // vs dedup_canonical's min-id rule; same clusters, different survivor
      val docs = rd(s, d, "documents").withColumn("t2", docText)
        .select(col("doc_id"), col("t2"),
          length(col("t2")).cast("long").as("n_chars2"))
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "t2", n = 3, minJ = 0.2)
      Dedup.canonicalizeByScore(docs.select("doc_id", "n_chars2"),
        "doc_id", "n_chars2", pairs)
        .select(col("doc_id"), col("cluster_id"), col("n_chars2"),
          col("is_canonical"))
    }),

    // ---------------------------------------------------- similarity ------
    "knn_topk" -> ((s, d) => {
      val e = rd(s, d, "embeddings")
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", 10)
        .select(col("query_id"), col("neighbor_id"), col("cos"),
          col("rank").cast("long").as("rnk"))
    }),

    "embedding_near_dup" -> ((s, d) => {
      Similarity.nearDupPairs(rd(s, d, "embeddings"), "vec_id", "embedding", 0.4002)
    }),

    "near_dup_bucketed" -> ((s, d) => {
      Similarity.bucketedNearDupPairs(rd(s, d, "embeddings"), "vec_id", "embedding",
        0.4002, p = 8)
    }),

    "rhp_near_dup" -> ((s, d) => {
      Similarity.rhpNearDupPairs(rd(s, d, "embeddings"), "vec_id", "embedding",
        0.4002, tables = 4, bits = 12)
    }),

    "sign_bucket_hist" -> ((s, d) => {
      rd(s, d, "embeddings")
        .select(Similarity.signBucketCol(col("embedding"), 8).cast("long").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
    }),

    "knn_classify" -> ((s, d) => {
      val e = rd(s, d, "embeddings")
      Similarity.knnClassify(e, e.filter(col("vec_id") < 20), "vec_id", "embedding",
        "label", 5)
        .select(col("query_id"), col("predicted_label").cast("long").as("predicted_label"))
    }),

    "ivf_topk" -> ((s, d) => {
      // IVF-Flat ANN: coarse quantizer trained on the corpus (hash-ordered
      // seeds + 1 Lloyd step — RNG-free, so the oracle replays training),
      // candidates indexed by typed argmin scan, queries probe 2 cells
      val e = rd(s, d, "embeddings")
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding",
        k = 10, nlist = 8, nProbe = 2, iters = 1)
        .select(col("query_id"), col("neighbor_id"), col("cos"),
          col("rank").cast("long").as("rnk"))
    }),

    // Sampled quantile sketch (Sketches.sampledQuantiles): the quantile
    // member of the sketch family — zero-shuffle hash-threshold draw
    // (dyadic frac 1/16 → the 2⁶⁰ cut is exact), one window over the
    // sketch-sized sample, rank = max(1, ceil(q·m))
    "quantile_sample" -> ((s, d) => {
      graft.sketch.Sketches.sampledQuantiles(
        rd(s, d, "lineitem").select(
          (col("l_orderkey") * 10 + col("l_linenumber")).as("id"),
          col("l_extendedprice").cast("double").as("v")),
        "id", "v", qs = Seq(0.25, 0.5, 0.9, 0.99), frac = 0.0625)
    }),

    // BPE merge training (Bpe.trainMerges): 3 merge rounds over the corpus
    // word-frequency table — the corpus shuffles once (vocab groupBy),
    // every round runs on the bounded vocab relation and collects exactly
    // one argmax rule. Deterministic total-order tie-break, int64 counts;
    // the oracle replays the 3 rounds with the wrapped-symbol replace
    // trick (canonical greedy merge semantics).
    "bpe_merges" -> ((s, d) => {
      import s.implicits._
      val (merges, vocabDf) =
        graft.text.Bpe.trainMerges(rd(s, d, "documents"), "text", k = 3)
      vocabDf.unpersist()
      merges.map(m => (m.round.toLong, m.lhs, m.rhs, m.pairCount))
        .toDF("round", "lhs", "rhs", "pair_count")
    }),

    // Batched BPE trainer (Bpe.trainMergesBatched): same 3 rules, but the
    // driver collects a candidate WINDOW per round and applies the longest
    // safe prefix as one batch — the production path for 30k-merge vocabs
    // (hundreds of driver rounds, not 30k). Oracle = the sequential replay:
    // batching is only correct if it is rule-for-rule sequential.
    "bpe_batch" -> ((s, d) => {
      import s.implicits._
      val (batches, vocabDf) =
        graft.text.Bpe.trainMergesBatched(rd(s, d, "documents"), "text", k = 3)
      vocabDf.unpersist()
      batches.flatten.map(m => (m.round.toLong, m.lhs, m.rhs, m.pairCount))
        .toDF("round", "lhs", "rhs", "pair_count")
    }),

    // The segmented vocab after those 3 merges: top-50 words by frequency
    // with their symbol sequences — a wrong rule anywhere upstream changes
    // the segmentation and breaks parity.
    "bpe_segment" -> ((s, d) => {
      val (_, vocabDf) =
        graft.text.Bpe.trainMerges(rd(s, d, "documents"), "text", k = 3)
      vocabDf.orderBy(col("cnt").desc, col("word")).limit(50)
        .select(col("word"), col("cnt"),
          concat_ws(" ", col("syms")).as("segmented"))
    }),

    // WordPiece greedy longest-match segmentation (applies a FIXED vocab —
    // the serving-side complement of bpe_* which trains one). The word
    // corpus derives from lineitem by wid; the oracle re-renders the
    // expected piece sequence per word from the independently hand-derived
    // greedy walk, so any kernel drift (match order, ## continuation
    // prefix, whole-word-UNK) breaks parity.
    "wordpiece_segment" -> ((s, d) => {
      val words = Seq("abc", "abca", "abcab", "unaffable", "affable", "aq",
        "q", "helloworld", "hello", "heabc", "ab", "ba")
      val vocab = Seq("a", "b", "c", "ab", "abc", "un", "aff", "he", "hello",
        "wor", "x", "##a", "##ab", "##c", "##aff", "##able", "##wor", "##ld",
        "##llo", "##y")
      val corpus = rd(s, d, "lineitem")
        .select(pmod(col("l_orderkey"), lit(words.size)).as("wid")).distinct()
        .withColumn("word",
          element_at(array(words.map(lit): _*), col("wid").cast("int") + 1))
      graft.text.WordPiece.segmented(corpus, "wid", "word", vocab)
    }),

    // Unigram-LM (SentencePiece) Viterbi segmentation over the corpus's
    // distinct-word table: max-probability split under integer micro-nat
    // costs, ties to the longest final token. The oracle replays the FULL
    // dynamic program — 12 unrolled DP positions + 12 path-walk steps —
    // so every piece boundary and every cost is gated, not a fixture.
    "unigram_segment" -> ((s, d) =>
      graft.text.Unigram.segmentWords(
        graft.text.Unigram.wordTable(rd(s, d, "documents"), "text"),
        graft.text.Unigram.seedVocab)),

    // Hard-EM E-step on the same model: exact frequency-weighted token
    // counts under the current vocab — the distributed half of a
    // SentencePiece training round (the M-step is a driver-side rebuild).
    "unigram_counts" -> ((s, d) =>
      graft.text.Unigram.emCounts(
        graft.text.Unigram.wordTable(rd(s, d, "documents"), "text"),
        graft.text.Unigram.seedVocab)),

    // Incremental crawl ingest as ONE plan: the committed corpus (even
    // doc_ids) contributes a Bloom filter (driver-held bytes in the probe
    // expression — the only cross-relation state); the increment (odd
    // doc_ids) is exact-deduped within batch (one fingerprint window),
    // probed against the corpus filter (probably-seen docs dropped,
    // FP-exact — the oracle replays the double hashing bit-for-bit), and
    // quality-gated. The corpus itself never shuffles.
    // JSONL ingest with quarantine (Jsonl.parseLines): lines rendered by
    // to_json per doc — every 7th truncated mid-JSON (corrupt), every
    // 11th missing the required title (schema drift) — parse back through
    // the corrupt-record channel; nothing is dropped, everything flagged.
    // Zero-shuffle codegen'd expression; the oracle re-renders the parsed
    // relation straight from the source columns (the round-trip means it
    // never needs JSON functions).
    "jsonl_ingest" -> ((s, d) =>
      graft.io.Jsonl.parseLines(jsonlLines(s, d), "line", jsonlSchema,
        required = Seq("title"))),

    // the SAME quarantine ingest as a REAL checkpointed stream (file
    // source → AvailableNow → append sink): stateless per-row parse makes
    // stream output ≡ batch output, so the oracle replay is identical
    "stream_jsonl" -> ((s, d) => {
      val (inDir, out, ck) = streamDirs("stream-jsonl", d) { p =>
        jsonlLines(s, d).coalesce(1).write.parquet(p)
      }
      graft.streaming.StreamJob.jsonlStream(s, inDir, out, ck, jsonlSchema,
        required = Seq("title")).awaitTermination()
      s.read.parquet(out)
    }),

    "ingest_e2e" -> ((s, d) => {
      val t = rd(s, d, "documents").withColumn("t2", docText)
        .select(col("doc_id"), col("t2"))
      val filter = graft.dedup.Bloom.build(
        t.filter(pmod(col("doc_id"), lit(2)) === 0), "t2", m = 16384, k = 4)
      val deduped = Dedup.exactDuplicates(
        t.filter(pmod(col("doc_id"), lit(2)) === 1), "doc_id", "t2",
        passthrough = Seq("t2"))
        .filter(!col("is_duplicate"))
      graft.dedup.Bloom.probe(deduped, "t2", filter, m = 16384, k = 4)
        .filter(!col("flagged"))
        .select(col("doc_id"), TA.qualityScoreCol(col("t2")).as("quality"),
          TA.wsTokenCountCol(col("t2")).cast("long").as("ws_tokens"))
        .filter(col("quality") >= 0.3)
    }),

    // Integer-micro PageRank (PageRank.ranks): host-centrality for crawl
    // seed weighting, 3 fixed iterations over a lineitem-derived edge list;
    // every step is int64 floor division, so the oracle's unrolled replay
    // is bit-identical under any partitioning
    "pagerank" -> ((s, d) => {
      graft.graph.PageRank.ranks(
        rd(s, d, "lineitem").select(
          pmod(col("l_orderkey"), lit(500)).as("src"),
          pmod(col("l_partkey"), lit(500)).as("dst")),
        "src", "dst", iters = 3)
    }),

    // One-pass dataset profiler (Profile.profile): per-column rows / nulls /
    // exact distinct / lexicographic min-max via one stacked explode and one
    // bounded-key aggregate — the pre-job sanity gate. rf_nullable
    // synthesizes a nullable column so the null accounting is exercised.
    "profile_stats" -> ((s, d) => {
      val li = rd(s, d, "lineitem").withColumn("rf_nullable",
        when(col("l_returnflag") === "A", lit(null).cast("string"))
          .otherwise(col("l_returnflag")))
      graft.io.Profile.profile(li,
        Seq("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus",
          "rf_nullable"))
    }),

    // Politeness-aware frontier scheduling (Frontier.waves): each URL gets
    // the wave number under which no host is fetched twice per wave — one
    // host-partitioned window, no global ordering.
    "crawl_schedule" -> ((s, d) => {
      val urls = rd(s, d, "lineitem").select(
        concat(lit("h"), pmod(col("l_orderkey"), lit(37))).as("host"),
        concat(lit("https://h"), pmod(col("l_orderkey"), lit(37)),
          lit(".example.com/p/"), col("l_orderkey"), lit("-"),
          col("l_linenumber")).as("url"),
        col("l_partkey").as("priority"))
      graft.text.Frontier.waves(urls, "host", "url", "priority")
    }),

    // Synchronous label propagation (LabelProp.labels): 3 deterministic
    // rounds of most-frequent-neighbor-label with smallest-label ties over
    // the symmetrized lineitem-derived graph — the oracle unrolls all three
    // rounds (join + count + arg-max window) in SQL.
    "label_prop" -> ((s, d) => {
      graft.graph.LabelProp.labels(
        rd(s, d, "lineitem").select(
          pmod(col("l_orderkey"), lit(400)).as("src"),
          pmod(col("l_partkey"), lit(400)).as("dst")),
        "src", "dst", iters = 3)
    }),

    // Redirect/rel=canonical chain resolution (Pointers.resolve): pointer
    // jumping squares the URL map each round, so 3 rounds resolve the
    // synthesized 7-hop chains (u_id -> u_{id-1} down to the u_{8k} roots)
    // in O(log chain) shuffles; a 2-cycle rides along and must come back
    // unconverged. The oracle unrolls all three f∘f rounds in SQL
    // (materialized CTEs — the unigram lesson) plus the chain-end probe.
    "redirect_resolve" -> ((s, d) => {
      import s.implicits._
      val e = rd(s, d, "documents")
        .filter(pmod(col("doc_id"), lit(8)) =!= 0)
        .select(concat(lit("u"), col("doc_id").cast("string")).as("src"),
          concat(lit("u"), (col("doc_id") - 1).cast("string")).as("dst"))
        .unionByName(Seq(("c1", "c2"), ("c2", "c1")).toDF("src", "dst"))
      graft.graph.Pointers.resolve(e, "src", "dst", rounds = 3)
    }),

    // k-core peel (KCore.core) over the squaring-map functional graph
    // a -> a^2 mod 97 — a scale-stable fixture (the 97 edges saturate at
    // every SF, so the peel structure is identical at sf0.01 and sf0.1):
    // 4 rounds at k=2 strip the tree tendrils and leave the cycles.
    "kcore" -> ((s, d) => {
      val a = pmod(col("l_orderkey"), lit(97))
      graft.graph.KCore.core(
        rd(s, d, "lineitem").select(a.as("src"), pmod(a * a, lit(97)).as("dst")),
        "src", "dst", k = 2, rounds = 4)
    }),

    // standard dangling-mass treatment (redistributeDangling = true): the
    // %700 dst space makes nodes 500-699 destination-only, so real dangling
    // mass exists and each iteration's (Σ dangling rank) div N lands in
    // every node's inflow — the oracle replays the three redistributions
    "pagerank_dangling" -> ((s, d) => {
      graft.graph.PageRank.ranks(
        rd(s, d, "lineitem").select(
          pmod(col("l_orderkey"), lit(500)).as("src"),
          pmod(col("l_partkey"), lit(700)).as("dst")),
        "src", "dst", iters = 3, redistributeDangling = true)
    }),

    // HITS hub/authority over the same %500→%700 graph as pagerank_dangling
    // (destination-only nodes are pure authorities, source-heavy nodes pure
    // hubs): 2 full (auth, hub) rounds with L1 micro normalization, all
    // int64 floor division — the oracle's unrolled replay is bit-identical
    "hits_scores" -> ((s, d) => {
      graft.graph.Hits.scores(
        rd(s, d, "lineitem").select(
          pmod(col("l_orderkey"), lit(500)).as("src"),
          pmod(col("l_partkey"), lit(700)).as("dst")),
        "src", "dst", iters = 2)
    }),

    "para_dedup" -> ((s, d) => {
      // within-doc paragraph de-templating over a paragraph-structured
      // corpus variant (text has no newlines of its own): paragraph A and B
      // each repeat, a whitespace-only fragment sits inside a separator
      // run, and every 3rd doc appends a unique tail — the oracle replays
      // the split/trim/first-occurrence logic over the identical text
      val id = col("doc_id")
      val a = substring(col("text"), 1, 50)
      val b = substring(col("text"), 51, 50)
      val t2 = concat(a, lit("\n\n"), b, lit("\n\n"), a, lit("\n\n  \n\n"), b,
        when(pmod(id, lit(3)) === 0,
          concat(lit("\n\ntail "), id.cast("string"))).otherwise(lit("")))
      TA.dedupParagraphsDf(
        rd(s, d, "documents").withColumn("t2", t2), "doc_id", "t2")
    }),

    "robots_eval" -> ((s, d) => {
      // robots.txt verdicts over four synthesized hosts: a star group with
      // comments and an empty-path no-op, an exact-agent group that
      // REPLACES star on host 1, a multi-user-agent run disallowing
      // everything on host 3, and five path shapes per doc (incl. the
      // empty path → "/"); the oracle re-renders the expected
      // (allowed, rule) verdicts directly from the doc_id axes
      val id = col("doc_id")
      val hk = pmod(id, lit(4))
      val urls = rd(s, d, "documents").select(id,
        concat(lit("http://h"), hk.cast("string"), lit(".com"),
          when(pmod(id, lit(5)) === 0, lit("/p/doc"))
            .when(pmod(id, lit(5)) === 1, lit("/p/ok/x"))
            .when(pmod(id, lit(5)) === 2, lit("/q/z"))
            .when(pmod(id, lit(5)) === 3, lit("/open"))
            .otherwise(lit(""))).as("url"))
      val hosts = rd(s, d, "documents")
        .select(pmod(col("doc_id"), lit(4)).as("hk")).distinct()
      val txt = concat(
        lit("# crawl policy\n\nUser-agent: *\nDisallow: /p\n" +
          "Allow: /p/ok # the public subtree\nDisallow:\n"),
        when(pmod(col("hk"), lit(2)) === 0, lit("Disallow: /q\n"))
          .otherwise(lit("")),
        when(col("hk") === 1,
          lit("\nUser-agent: GraftBot\nAllow: /p\nDisallow: /p/ok\n"))
          .otherwise(lit("")),
        when(col("hk") === 3,
          lit("\nUser-agent: graftbot\nUser-agent: otherbot\nDisallow: /\n"))
          .otherwise(lit("")))
      val robots = hosts.select(
        concat(lit("h"), col("hk").cast("string"), lit(".com")).as("host"),
        txt.as("robots_txt"))
      val rules = graft.text.Robots.parseRules(robots, "host", "robots_txt")
      graft.text.Robots.evaluate(urls, "url", rules, "GraftBot")
        .select(col("doc_id"), col("url"), col("allowed"), col("rule"))
    }),

    "web_curation_e2e" -> ((s, d) => {
      // the composed web-curation pass over one corpus variant: mojibake
      // repair → within-doc paragraph de-templating → C4 line cleaning,
      // chained as ONE zero-shuffle narrow projection (every stage is a
      // pure text function — this is the shape the 100 TB pass wants: one
      // scan, no intermediate materialization). Corpus text is pure ASCII
      // (asserted by the oracle's own re-render), so the heal touches only
      // the injected cp1252 suffix and the oracle can re-render every
      // output column, with the corpus-dependent sentence count replayed
      // from the same substring
      val id = col("doc_id")
      val a = substring(col("text"), 1, 40)
      val corrupt = lit("\u0063\u0061\u0066\u00c3\u00a9\u0020\u00e2\u20ac\u201d\u0020\u00e2\u20ac\u0153\u006e\u0061\u00c3\u00af\u0076\u0065\u00e2\u20ac\u00a6\u0020\u0039\u0030\u00c2\u00b0")
      val p1 = concat(lit("Intro words "), a, lit(" "), corrupt, lit("."))
      val t2 = concat_ws("\n\n", p1,
        lit("no punct line"), p1,
        lit("Second real line stays here! And more. Yes. Sure. Fine."),
        when(pmod(id, lit(3)) === 0, lit("A lorem ipsum veto here."))
          .otherwise(lit("Closing line ends well.")))
      val healed = rd(s, d, "documents")
        .withColumn("t2", TA.fixMojibakeCol(t2))
      val deduped = TA.dedupParagraphsDf(healed, "doc_id", "t2")
      val lines = C4.keptLinesCol(col("clean_text"))
      deduped
        .select(col("doc_id"), col("n_removed"), lines.as("__lines"),
          col("clean_text").as("__t"))
        .select(col("doc_id"), col("n_removed"),
          concat_ws("\n", col("__lines")).as("c4_text"),
          size(col("__lines")).cast("long").as("n_lines_kept"),
          C4.sentenceCountCol(concat_ws("\n", col("__lines")))
            .as("n_sentences"),
          (size(col("__lines")) >= 1 &&
            C4.sentenceCountCol(concat_ws("\n", col("__lines"))) >= C4.MinSentences &&
            !C4.pageVetoCol(col("__t"))).as("kept"))
    }),

    "dehyphenate" -> ((s, d) => {
      // line-break hyphen repair over corpus text with injected PDF-style
      // breaks (lowercase join, indent absorption, capital continuation
      // and digit-hyphen kept); corpus text has no newlines or hyphens
      // adjacent to breaks, so the oracle re-renders the expected repair
      val t2 = concat(substring(col("text"), 1, 40),
        lit(" exam-\nple docu-\n  ment frag-\nMent 5-\nyear end"))
      rd(s, d, "documents").select(col("doc_id"),
        TA.dehyphenateCol(t2).as("fixed"))
    }),

    "script_mix" -> ((s, d) => {
      // per-script character counts + dominant script over a mixed-script
      // corpus variant (short latin prefix + per-doc cyrillic / cjk /
      // greek / empty suffix); the oracle replays every range count and
      // the first-listed tie-break over the identical text
      val id = col("doc_id")
      val t2 = concat(substring(col("text"), 1, 6),
        when(pmod(id, lit(4)) === 0, lit(" Привет мир"))
          .when(pmod(id, lit(4)) === 1, lit(" 中文字词语句子"))
          .when(pmod(id, lit(4)) === 2, lit(" καλημέρα σας"))
          .otherwise(lit("")))
      rd(s, d, "documents").select(id, t2.as("t2"))
        .select(col("doc_id") +: TA.scriptMixCols(col("t2")): _*)
    }),

    "sentence_span_dedup" -> ((s, d) => {
      // C4's cross-document three-sentence-span dedup over the corpus with
      // an injected shared opener on every 4th doc: the first (doc, idx)
      // occurrence survives, every other one is reported removed —
      // including any NATURAL duplicate spans in the corpus prose, which
      // the oracle replays identically
      val id = col("doc_id")
      val t2 = concat(when(pmod(id, lit(4)) === 0,
        lit("Shared alpha one. Shared beta two. Shared gamma three. "))
        .otherwise(lit("")), col("text"))
      C4.dupSentenceSpans(
        rd(s, d, "documents").withColumn("t2", t2), "doc_id", "t2")
    }),

    "publish_date" -> ((s, d) => {
      // publish-date precedence over synthesized pages: meta (either
      // attribute order) beats <time> beats the /yyyy/mm(/dd)/ URL path,
      // day defaults to 01, a fifth of the docs are undatable; the oracle
      // re-renders the expected date from the doc_id axes
      val id = col("doc_id")
      val mm = lpad((pmod(id, lit(12)) + 1).cast("string"), 2, "0")
      val dd = lpad((pmod(id, lit(28)) + 1).cast("string"), 2, "0")
      val html = when(pmod(id, lit(5)) === 0,
          concat(lit("<meta property=\"article:published_time\" content=\"2026-"),
            mm, lit("-"), dd, lit("T09:00:00Z\">")))
        .when(pmod(id, lit(5)) === 1,
          concat(lit("<meta content=\"2025-"), mm, lit("-"), dd,
            lit("\" property=\"article:published_time\">")))
        .when(pmod(id, lit(5)) === 2,
          concat(lit("<time datetime=\"2024-"), mm, lit("-"), dd,
            lit("T00:00\">x</time>")))
        .otherwise(lit("<p>plain body</p>"))
      val url = when(pmod(id, lit(5)) === 3,
          concat(lit("http://s.com/2023/"), mm, lit("/"), dd, lit("/slug")))
        .when(pmod(id, lit(5)) === 4,
          when(pmod(id, lit(2)) === 0,
            concat(lit("http://s.com/blog/2022/"), mm, lit("/slug")))
            .otherwise(lit("http://s.com/undated/page")))
        .otherwise(concat(lit("http://s.com/p/"), id.cast("string")))
      rd(s, d, "documents").select(id, html.as("html"), url.as("url"))
        .select(col("doc_id"),
          Web.publishDate(col("html"), col("url")).as("pub_date"))
    }),

    "soft404_flags" -> ((s, d) => {
      // soft-404 verdicts: title-phrase hits on two fifths of the docs,
      // a 2-phrase body hit on every 3rd, a 1-phrase body near-miss on
      // every 3rd+1, corpus-derived clean bodies otherwise; the oracle
      // replays the title regex and the body phrase threshold
      val id = col("doc_id")
      val title = when(pmod(id, lit(5)) === 0, lit("404 Not Found"))
        .when(pmod(id, lit(5)) === 1, lit("Oops - page NOT FOUND"))
        .otherwise(lit("Doc overview page"))
      val body = when(pmod(id, lit(3)) === 0,
          lit("The page does not exist. Please try again."))
        .when(pmod(id, lit(3)) === 1, lit("This item has been removed."))
        .otherwise(concat(substring(col("text"), 1, 60), lit(".")))
      rd(s, d, "documents").select(id, title.as("title"), body.as("body"))
        .select(col("doc_id"), col("title"),
          Web.isSoft404(col("title"), col("body")).as("soft404"))
    }),

    "sitemap_urls" -> ((s, d) => {
      // sitemap flattening: two entries per doc plus a reversed-field
      // third on even docs, transport noise on the first loc; the oracle
      // re-renders the expected (url, lastmod) relation directly
      val id = col("doc_id")
      val str = id.cast("string")
      val k = pmod(id, lit(7)).cast("string")
      val m = (pmod(id, lit(9)) + 1).cast("string")
      val xml = concat(
        lit("<?xml version=\"1.0\"?><urlset><url><loc> HTTP://S"), k,
        lit(".com:80/p/"), str, lit("?utm_a=1 </loc><lastmod>2026-0"), m,
        lit("-01</lastmod></url><url><loc>https://s"), k, lit(".com/q/"),
        str, lit("</loc></url>"),
        when(pmod(id, lit(2)) === 0,
          concat(lit("<url><lastmod>2026-12-31</lastmod><loc>https://other.org/"),
            str, lit("#f</loc></url>"))).otherwise(lit("")),
        lit("</urlset>"))
      Web.sitemapUrlsDf(rd(s, d, "documents").select(id, xml.as("xml")),
        "xml", extraCols = Seq("doc_id"))
    }),

    "crawl_diff" -> ((s, d) => {
      // two crawl snapshots derived from one corpus: every 11th URL
      // vanishes, every 7th changes content, every 13th gains a fresh URL;
      // fingerprints are the exact-dedup md5 key, so the oracle replays
      // the full-outer reconciliation bit-exactly
      val docs = rd(s, d, "documents")
      val key = concat(lit("u"), col("doc_id").cast("string"))
      val oldSnap = docs.select(key.as("url"),
        TA.fingerprintCol(col("text")).as("fp"))
      val newText = when(pmod(col("doc_id"), lit(7)) === 0,
        concat(col("text"), lit(" updated"))).otherwise(col("text"))
      val newSnap = docs.filter(pmod(col("doc_id"), lit(11)) =!= 0)
        .select(key.as("url"), TA.fingerprintCol(newText).as("fp"))
        .unionByName(docs.filter(pmod(col("doc_id"), lit(13)) === 0)
          .select(concat(lit("new"), col("doc_id").cast("string")).as("url"),
            TA.fingerprintCol(concat(col("text"), lit(" fresh"))).as("fp")))
      graft.io.Snapshot.diff(oldSnap, newSnap, "url", "fp")
    }),

    "winnow_fps" -> ((s, d) => {
      // winnowing fingerprints (k=3, w=4) straight over the corpus text;
      // the oracle replays positional k-gram hashing and every
      // rolling-window min, so the sampling guarantee is byte-verified
      Dedup.winnowFingerprints(rd(s, d, "documents"), "doc_id", "text",
        n = 3, w = 4)
    }),

    "winnow_overlap" -> ((s, d) => {
      // overlap pairs via winnowing over a grouped-span corpus variant:
      // docs in the same %50 group share a 13-token prefix span with the
      // group token INTERLEAVED (every 3-gram carries it, so no span gram
      // crosses groups — a global span would pair every doc with every
      // other); span length is far past the w+n-1 guarantee bound, so
      // every same-group pair MUST surface. maxDf=120 exercises the
      // hot-fingerprint cap on incidental corpus-phrase collisions. The
      // oracle replays fingerprinting, the cap, and the bucketed pair join
      val id = col("doc_id")
      val g = concat(lit("g"), pmod(id, lit(50)).cast("string"))
      val t2 = concat(
        g, lit(" alpha "), g, lit(" beta "), g, lit(" gamma "),
        g, lit(" delta "), g, lit(" epsilon "), g, lit(" zeta "),
        substring(col("text"), 1, 100))
      Dedup.winnowOverlapPairs(rd(s, d, "documents").withColumn("t2", t2),
        "doc_id", "t2", n = 3, w = 4, minShared = 1, maxDf = 120)
    }),

    "pq_topk" -> ((s, d) => {
      // Product-quantized ANN (Pq.adcTopK): 4 codebooks of 8 centroids over
      // 16-dim subspaces, trained RNG-free (md5 seeds + 1 Lloyd step) so
      // the oracle replays training, encoding, and the int64 micro-unit ADC
      // sums end-to-end; candidates shuffle only nPartitions·nq·k heap rows
      val e = rd(s, d, "embeddings")
      graft.sim.Pq.adcTopK(e, e.filter(col("vec_id") < 5), "vec_id",
        "embedding", k = 10, m = 4, ksub = 8, iters = 1)
    }),

    // IVF-PQ ANN (Pq.ivfpqTopK) — the production faiss index shape: coarse
    // IVF cells + ONE product quantizer over pooled residuals + per-(query,
    // probed-cell) ADC tables. Both trainings are RNG-free, so the oracle
    // replays the ENTIRE index: centroid Lloyd step, cell assignment,
    // residual arithmetic, residual codebook Lloyd step, encoding, and the
    // int64 ADC sums. Candidates are scanned twice, narrowly (train, then
    // fused encode+score); only heap survivors shuffle.
    "ivfpq_topk" -> ((s, d) => {
      val e = rd(s, d, "embeddings")
      graft.sim.Pq.ivfpqTopK(e, e.filter(col("vec_id") < 5), "vec_id",
        "embedding", k = 10, nlist = 8, nProbe = 2, m = 4, ksub = 8, iters = 1)
    }),

    "selection_e2e" -> ((s, d) => {
      // the data-selection chain composed as ONE plan: strip duplicated
      // 8-token spans → DSIR-score the CLEANED text against the %11 target
      // slice → keep the 200 most target-like docs via distributed top-k
      // (orderBy+limit → TakeOrderedAndProject, never a global window).
      // clean feeds three consumers (target slice, corpus bigrams, final
      // row restore) — persisted under the Persisted caller-release
      // contract so the substring-dedup reassembly runs once
      val clean = graft.io.Persisted.track(Dedup.dedupSubstrings(
        rd(s, d, "documents").withColumn("page", disclaimerPage),
        "doc_id", "page", k = 8, maxOccurrences = 1)
        .select(col("doc_id"), col("clean_text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val target = clean.filter(pmod(col("doc_id"), lit(11)) === 0)
      Importance.dsirScores(clean, "doc_id", "clean_text",
          target, "clean_text", buckets = 256)
        .orderBy(col("score_micro").desc, col("doc_id")).limit(200)
        .select(col("doc_id"), col("n_bigrams"), col("score_micro"))
    }),

    "lm_perplexity" -> ((s, d) => {
      // CCNet-style perplexity filter: hashed-bigram conditional LM trained
      // on the lang='en' slice (raw text), scoring every doc's injected
      // text; exact integer micro-nats, two-level backoff gate-covered
      val docs = rd(s, d, "documents")
      graft.text.Perplexity.lmScores(
        docs.withColumn("t2", docText).select(col("doc_id"), col("t2")),
        "doc_id", "t2",
        docs.filter(col("lang") === "en").select("text"), "text",
        ctxBuckets = 1024, bigramBuckets = 8192)
    }),

    // CCNet head/middle/tail terciles (Perplexity.pplBuckets): the split
    // CCNet applies after perplexity scoring — per language, rank by mean
    // per-bigram NLL (exact integer division) and ntile(3); "head" is the
    // keep-outright third. Same trained model as lm_perplexity, so the
    // oracle extends that replay with the window.
    "ccnet_buckets" -> ((s, d) => {
      val docs = rd(s, d, "documents")
      graft.text.Perplexity.pplBuckets(
        docs.withColumn("t2", docText), "doc_id", "t2", "lang",
        docs.filter(col("lang") === "en").select("text"), "text",
        ctxBuckets = 1024, bigramBuckets = 8192)
    }),

    // ASCII folding (TA.foldAsciiCol): accents/ligatures/fullwidth to
    // ASCII before fingerprinting — the table is generated ONCE on the
    // JVM (NFD bases + pinned non-decomposables) and the oracle embeds
    // the same literals, so query-time needs no Unicode library. Docs are
    // seasoned with deterministic accent/ligature/fullwidth prefixes plus
    // an in-body accent substitution so every table arm fires.
    "unicode_fold" -> ((s, d) => {
      val id = col("doc_id")
      val t2 = concat(
        when(pmod(id, lit(4)) === 0, lit("Æther Øre łódź "))
          .when(pmod(id, lit(4)) === 1, lit("ＦＵＬＬｗｉｄｔｈ！ "))
          .when(pmod(id, lit(4)) === 2, lit("Café naïve ß "))
          .otherwise(lit("")),
        replace(col("text"), lit("a"), lit("á")))
      rd(s, d, "documents").select(id, t2.as("t2"))
        .select(id, TA.foldAsciiCol(col("t2")).as("folded"),
          length(col("t2")).cast("long").as("n_in"),
          length(TA.foldAsciiCol(col("t2"))).cast("long").as("n_out"))
    }),

    // Aho-Corasick multi-phrase matching (PhraseMatch.matchDf): one
    // broadcast automaton, one zero-shuffle pass, ALL occurrences counted
    // — the FlashText-style dictionary-tagging pass. The contract phrases
    // cannot self-overlap, so the oracle's non-overlapping replace-scan
    // count equals the automaton's all-match count exactly (the spec pins
    // the overlap semantics on a self-overlapping phrase separately).
    "phrase_match" -> ((s, d) =>
      graft.text.PhraseMatch.matchDf(rd(s, d, "documents"), "doc_id", "text",
        Seq("table scan", "row filter", "value table", "spark"))),

    // DoReMi-flavored mixture diagnostic (Importance.domainKl): KL of each
    // source's hashed-unigram distribution from the whole corpus, add-one
    // smoothed, micro-nat-rounded lns, int64 weighted sum, ONE truncated
    // division — the per-snapshot "which mixture slice drifted" number.
    "domain_kl" -> ((s, d) =>
      graft.text.Importance.domainKl(rd(s, d, "documents"), "source",
        "text", buckets = 256)),

    // Per-doc TF-IDF keyword extraction (SparseSim.tfidfKeywords): top-3
    // terms by exact tf·idf_micro with (score desc, term) total order —
    // the doc-tagging pass after curation.
    "tfidf_keywords" -> ((s, d) =>
      graft.sim.SparseSim.tfidfKeywords(rd(s, d, "documents"), "doc_id",
        "text", k = 3)),

    // Interpolated Kneser-Ney bigram LM head (KneserNey.knBigramLm): the
    // KenLM-style smoothed-count training step — bigram/context/type
    // counts plus P_KN with D carried as the exact rational 3/4, one
    // integer division per bigram. Top-100 by (count, w1, w2) keeps the
    // gate bounded; the count tables are the full model.
    "kn_bigram_lm" -> ((s, d) =>
      graft.text.KneserNey.knBigramLm(rd(s, d, "documents"), "text", k = 100)),

    // WARC ingest (Warc.parseDf): each document rendered as a two-record
    // WARC blob (request + response; every 7th doc a 404 body) and parsed
    // back by the real Content-Length-bounded parser. The blob is a pure
    // function of (doc_id, source, text), so the oracle re-renders the
    // expected records WITHOUT parsing (the domHtml idiom) — a boundary
    // or CRLF off-by-one in the parser shifts every field and breaks
    // parity. Zero-shuffle typed kernel.
    "warc_parse" -> ((s, d) => {
      val id = col("doc_id")
      val uri = concat(lit("https://"), col("source"),
        lit(".example.com/doc/"), id.cast("string"))
      val reqC = concat(lit("GET /doc/"), id.cast("string"), lit(" HTTP/1.1"))
      val body = when(pmod(id, lit(7)) === 0, lit("not found"))
        .otherwise(substring(col("text"), 1, 120))
      val statusLine = when(pmod(id, lit(7)) === 0, lit("404 Not Found"))
        .otherwise(lit("200 OK"))
      val respC = concat(lit("HTTP/1.1 "), statusLine,
        lit("\r\nContent-Type: text/html\r\n\r\n"), body)
      def rec(t: String, c: Column) = concat(
        lit("WARC/1.0\r\nWARC-Type: "), lit(t),
        lit("\r\nWARC-Target-URI: "), uri,
        lit("\r\nContent-Length: "), length(c).cast("string"),
        lit("\r\n\r\n"), c, lit("\r\n\r\n"))
      val blob = concat(rec("request", reqC), rec("response", respC))
      graft.io.Warc.parseDf(
        rd(s, d, "documents").select(id, blob.as("blob")), "doc_id", "blob")
    }),

    "dsir_score" -> ((s, d) => {
      // DSIR importance scoring: docs with doc_id%11==0 stand in for the
      // target domain; every corpus doc scored by hashed-bigram LLR in
      // exact integer micro-nats (the only float op is one ln per bucket)
      val corpus = rd(s, d, "documents")
      val target = corpus.filter(pmod(col("doc_id"), lit(11)) === 0)
      Importance.dsirScores(corpus, "doc_id", "text", target, "text",
        buckets = 256)
    }),

    // int8 scalar quantization (Pq.quantizeInt8): the faiss-SQ8 storage
    // format — per-vector scale, integer half-away rounding, md5 digest
    // over the codes so one drifted code breaks the gate. Zero-shuffle.
    "int8_quant" -> ((s, d) =>
      graft.sim.Pq.quantizeInt8(rd(s, d, "embeddings"), "vec_id", "embedding")),

    "semantic_dedup" -> ((s, d) =>
      // SemDeDup: IVF-clustered embedding cells, in-cell duplicate drop
      // with the keep-low-centroid-similarity precedence (one-pass rule);
      // training is RNG-free so the oracle replays it end-to-end
      Similarity.semanticDedup(rd(s, d, "embeddings"), "vec_id", "embedding",
        minCos = 0.4002, nlist = 8, iters = 1)
        .select(col("vec_id"), col("cell").cast("long").as("cell"),
          col("centroid_cos"), col("n_closer_dups"), col("is_kept"))),

    "f3_loose_dollar" -> ((s, d) => {
      val text = concat(lit("ref "), (col("l_partkey") * 37).cast("string"),
        lit(" amount $"), pmod(col("l_suppkey"), lit(10)).cast("string"))
      rd(s, d, "lineitem").withColumn("t", text)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("page"),
          Filters.f3LooseDollarCol(col("t")).as("hit"))
    }),

    "f4_extended_keyword" -> ((s, d) => {
      val text = when(pmod(col("doc_id"), lit(7)) === 0, concat(col("text"), lit(" payee: X")))
        .otherwise(col("text"))
      rd(s, d, "documents")
        .select(col("doc_id"), Filters.f4ExtendedKeywordCol(text).as("hit"))
    }),

    "r6_first_k" -> ((s, d) => {
      val w = Window.partitionBy("l_orderkey").orderBy("page")
      rd(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("page")).distinct()
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select("l_orderkey", "page")
    }),

    "a5_section_validation" -> ((s, d) => {
      val coverage = when(pmod(col("doc_id"), lit(2)) === 0, "GL").otherwise("PROPERTY")
      val df = rd(s, d, "documents").select(col("doc_id"), coverage.as("coverage"), col("text"))
      val (valid, kws) = Qc.validateSectionCols(col("coverage"), col("text"))
      df.select(col("doc_id"), col("coverage"), valid.as("valid"),
        array_join(kws, ",").as("keywords_found"))
    }),

    "a6_distinct_pages" -> ((s, d) => {
      rd(s, d, "lineitem").groupBy("l_orderkey")
        .agg(countDistinct(col("l_linenumber")).as("n_pages"))
    }),

    "ep1_oracle" -> ((s, d) => {
      // the FULL EP1 cascade (marker parse → A2 ocr gate → F1∨F2 hits →
      // R1 buffer merge → R4 slice → J1 interleave with placeholders →
      // offset renumber) over 2-source docs rendered from lineitem, span
      // text included — every stage deterministically replayable in SQL.
      // Bodies vary dollar amounts (F1), keywords (F2), skip words, a
      // '###' gibberish page, and doc-level padding that flips the A2
      // total-chars gate.
      import s.implicits._
      ep1OracleDocs(s, d)
        .flatMap { doc =>
          graft.pipeline.Ep1Core.process(doc, graft.pipeline.Ep1Config())
            .map(sp => (doc.doc_id.toLong, sp.offset.toLong, sp.kind, sp.text)).iterator
        }.toDF("k", "offset", "kind", "text")
    }),

    "ep1_extract" -> ((s, d) => {
      // the SAME cascade as ep1_oracle, but through the production job
      // path: ExtractJob.runRows decodes span structs straight off scan
      // rows (the parquet read-path idiom). runRows ≡ runTyped ≡ per-doc
      // Ep1Core.process, so the identical replay SQL now gates the
      // job-level plumbing (row decode, schema round-trip) too.
      val out = graft.pipeline.ExtractJob.runRows(
        ep1OracleDocs(s, d).toDF(), graft.pipeline.Ep1Config())
      out.select(col("doc_id").cast("long").as("k"),
          posexplode(col("spans")).as(Seq("pos", "span")))
        .select(col("k"), col("span.offset").cast("long").as("offset"),
          col("span.kind").as("kind"), col("span.text").as("text"))
    }),

    "media_meta" -> ((s, d) => {
      // metadata stage over interleaved docs (media-kind + non-empty-ref
      // filter, per-partition batch decode) — refs derive from lineitem so
      // the md5 stub math replays in SQL
      Media.extractMetadata(mediaDocs(s, d)).toDF()
        .select(col("media_ref"), col("doc_id"), col("format"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_frames").cast("long").as("n_frames"))
    }),

    "image_phash" -> ((s, d) => {
      // perceptual image hashing through the REAL decode path: 2000 images
      // in 400 pixel-identical groups (seed keyed by c_custkey%400); the
      // oracle replays the aHash from pixel arithmetic — PNG is lossless,
      // so any decode or box-filter defect breaks parity
      import s.implicits._
      val grp = pmod(col("c_custkey"), lit(400))
      val specs = rd(s, d, "customer").filter(col("c_custkey") <= 2000).select(
        concat(lit("img-"), col("c_custkey").cast("string")).as("ref"),
        TA.hash32(concat(lit("g"), grp.cast("string"))).as("seed"),
        (lit(16) + pmod(grp, lit(9))).cast("int").as("w"),
        (lit(12) + pmod(grp, lit(7))).cast("int").as("h"))
        .as[(String, Long, Int, Int)]
      Media.imageHashes(specs).toDF()
    }),

    "image_dups" -> ((s, d) => {
      // image near-dup pairs: equal perceptual hash, one groupBy-shaped
      // equi-join — the multimodal member of the dedup family
      import s.implicits._
      val grp = pmod(col("c_custkey"), lit(400))
      val specs = rd(s, d, "customer").filter(col("c_custkey") <= 2000).select(
        concat(lit("img-"), col("c_custkey").cast("string")).as("ref"),
        TA.hash32(concat(lit("g"), grp.cast("string"))).as("seed"),
        (lit(16) + pmod(grp, lit(9))).cast("int").as("w"),
        (lit(12) + pmod(grp, lit(7))).cast("int").as("h"))
        .as[(String, Long, Int, Int)]
      Media.imageDupPairs(Media.imageHashes(specs).toDF())
    }),

    "video_phash" -> ((s, d) => {
      // per-frame video perceptual hashing through the REAL container path:
      // 300 videos in 60 pixel-identical groups (seed keyed by
      // c_custkey%60), GPNG parse → sampled-frame ImageIO decode → aHash64
      // per frame; the oracle replays every sampled frame's hash from pixel
      // arithmetic (frame f of seed s is the synth image of s+f)
      import s.implicits._
      val grp = pmod(col("c_custkey"), lit(60))
      val specs = rd(s, d, "customer").filter(col("c_custkey") <= 300).select(
        concat(lit("vid-"), col("c_custkey").cast("string")).as("ref"),
        TA.hash32(concat(lit("v"), grp.cast("string"))).as("seed"),
        (lit(8) + pmod(grp, lit(5))).cast("int").as("nf"),
        (lit(16) + pmod(grp, lit(5))).cast("int").as("w"),
        (lit(12) + pmod(grp, lit(5))).cast("int").as("h"))
        .as[(String, Long, Int, Int, Int)]
      Media.videoHashes(specs, 4).toDF()
        .select(col("media_ref"), col("frame_index").cast("long").as("frame_index"),
          col("ahash_hi"), col("ahash_lo"))
    }),

    "video_dups" -> ((s, d) => {
      // video near-dup pairs: frame-aligned equal perceptual hashes on all
      // 4 sampled frames — the frame index is the LSH band id, so the join
      // buckets on (index, hash) and is never all-pairs
      import s.implicits._
      val grp = pmod(col("c_custkey"), lit(60))
      val specs = rd(s, d, "customer").filter(col("c_custkey") <= 300).select(
        concat(lit("vid-"), col("c_custkey").cast("string")).as("ref"),
        TA.hash32(concat(lit("v"), grp.cast("string"))).as("seed"),
        (lit(8) + pmod(grp, lit(5))).cast("int").as("nf"),
        (lit(16) + pmod(grp, lit(5))).cast("int").as("w"),
        (lit(12) + pmod(grp, lit(5))).cast("int").as("h"))
        .as[(String, Long, Int, Int, Int)]
      Media.videoDupPairs(Media.videoHashes(specs, 4).toDF(), minFrames = 4)
    }),

    "media_decode" -> ((s, d) => {
      // REAL image decode: deterministic synthetic pixels → real PNG encode
      // → JDK ImageIO decode → per-channel means. PNG is lossless, so the
      // oracle replays the means arithmetically; any defect in the
      // encode/decode/pixel-scan cycle breaks parity.
      import s.implicits._
      // bounded at 3000 images: the check verifies the decode cycle, not
      // scan throughput — without the cap the sweep would decode 10x more
      // PNGs at every scale factor for no extra signal
      val refs = rd(s, d, "customer").filter(col("c_custkey") <= 3000).select(
        concat(lit("img-"), col("c_custkey").cast("string")).as("ref"),
        (lit(16) + pmod(col("c_custkey"), lit(17))).cast("int").as("w"),
        (lit(12) + pmod(col("c_custkey"), lit(13))).cast("int").as("h"))
        .as[(String, Int, Int)]
      Media.decodeStats(refs).toDF()
        .select(col("media_ref"), col("format"),
          col("width").cast("long").as("width"), col("height").cast("long").as("height"),
          col("mean_r"), col("mean_g"), col("mean_b"))
    }),

    "audio_fingerprint" -> ((s, d) => {
      // energy-band fingerprint through the REAL WAV decode: 1000 clips in
      // 200 sample-identical groups; the oracle replays the fingerprint
      // from sample arithmetic (PCM in WAV is lossless)
      import s.implicits._
      val grp = pmod(col("c_custkey"), lit(200))
      val specs = rd(s, d, "customer").filter(col("c_custkey") <= 1000).select(
        concat(lit("au-"), col("c_custkey").cast("string")).as("ref"),
        TA.hash32(concat(lit("a"), grp.cast("string"))).as("seed"),
        (lit(200) + pmod(grp, lit(50))).cast("int").as("n"))
        .as[(String, Long, Int)]
      Media.audioFingerprints(specs).toDF()
    }),

    "media_audio" -> ((s, d) => {
      // REAL audio decode: synthetic 16-bit PCM → real WAV encode →
      // javax.sound decode → sample statistics, oracled arithmetically
      // (PCM in WAV is lossless)
      import s.implicits._
      val refs = rd(s, d, "supplier").select(
        concat(lit("wav-"), col("s_suppkey").cast("string")).as("ref"),
        (lit(256) + pmod(col("s_suppkey"), lit(512))).cast("int").as("n"))
        .as[(String, Int)]
      Media.decodeAudioStats(refs).toDF()
        .select(col("media_ref"), col("format"), col("n_samples"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("mean_abs"), col("peak"))
    }),

    "media_stub_meta" -> ((s, d) => {
      // the deterministic decode stub + resize over refs derived from part:
      // every metadata byte is md5-derived, so an independent engine can
      // replay the whole decode/resize math
      import s.implicits._
      rd(s, d, "part")
        .select(concat(lit("m-"), col("p_partkey").cast("string")).as("ref"))
        .as[String].mapPartitions(_.map { ref =>
          val (bytes, format, w, h, n) = Media.decodeStub(ref)
          val m = Media.MediaMeta(ref, "", format, w, h, n, bytes.length)
          val r = Media.resizeMeta(m, 256)
          (ref, format, w.toLong, h.toLong, n.toLong, bytes.length.toLong,
            r.width.toLong, r.height.toLong)
        }).toDF("media_ref", "format", "width", "height", "n_frames",
          "bytes_len", "rs_width", "rs_height")
    }),

    "media_stub_frames" -> ((s, d) => {
      // frame sampling (k=4 evenly spaced indices + md5 feature) replayed
      // from the same md5-derived metadata
      import s.implicits._
      val meta = rd(s, d, "part")
        .select(concat(lit("m-"), col("p_partkey").cast("string")).as("ref"))
        .as[String].mapPartitions(_.map { ref =>
          val (bytes, format, w, h, n) = Media.decodeStub(ref)
          Media.MediaMeta(ref, "", format, w, h, n, bytes.length)
        })
      Media.sampleFrames(meta, 4).toDF()
        .select(col("media_ref"), col("frame_index").cast("long").as("frame_index"),
          hex(col("feature")).as("feature_hex"))
    }),

    "media_frames" -> ((s, d) => {
      // deterministic frame sampling over doc-derived media metadata
      // (decode is the documented stub; sampling/batching plumbing is real)
      val meta = Media.extractMetadata(mediaDocs(s, d))
      Media.sampleFrames(meta, 4).toDF()
        .select(col("media_ref"), col("frame_index").cast("long").as("frame_index"),
          hex(col("feature")).as("feature_hex"))
    }),

    "media_resize" -> ((s, d) => {
      val meta = Media.extractMetadata(mediaDocs(s, d))
      Media.resize(meta, 256).toDF()
        .select(col("media_ref"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"))
    }),

    "media_video_frames" -> ((s, d) => {
      // REAL video-frame decode: synthetic frames → PNG-frame container
      // (GPNG) encode → container parse → evenly-spaced frame sampling →
      // ImageIO decode of only the sampled frames → per-frame channel means.
      // Lossless frames make the oracle an exact arithmetic replay; bounded
      // at 600 clips (the check verifies the decode cycle, not throughput)
      import s.implicits._
      val refs = rd(s, d, "customer").filter(col("c_custkey") <= 600).select(
        concat(lit("vid-"), col("c_custkey").cast("string")).as("ref"),
        (lit(1) + pmod(col("c_custkey"), lit(10))).cast("int").as("nf"),
        (lit(8) + pmod(col("c_custkey"), lit(9))).cast("int").as("w"),
        (lit(6) + pmod(col("c_custkey"), lit(7))).cast("int").as("h"))
        .as[(String, Int, Int, Int)]
      Media.decodeVideoFrames(refs, 4).toDF()
        .select(col("media_ref"), col("frame_index").cast("long").as("frame_index"),
          col("width").cast("long").as("width"), col("height").cast("long").as("height"),
          col("mean_r"), col("mean_g"), col("mean_b"))
    }),

    "stream_extract" -> ((s, d) => {
      // streaming EP1: same operator as batch, file source + AvailableNow
      // trigger + checkpoint, over the ep1_oracle corpus bounded to
      // l_orderkey <= 8000 — the DuckDB oracle replays the FULL cascade
      // (shared SQL with ep1_oracle, bounded WHERE), so the streamed path
      // is held to the same rows+schema+hash bar as the batch one
      import s.implicits._
      val (in, out, ck) = streamDirs("stream-contract", s"ep1docs-$d") { p =>
        ep1OracleDocs(s, d, maxKey = 8000L).toDF()
          .write.mode("overwrite").parquet(p)
      }
      graft.streaming.StreamJob.run(s, in, out, ck).awaitTermination()
      s.read.parquet(out)
        .select(col("doc_id"), posexplode(col("spans")).as(Seq("pos", "span")))
        .select(col("doc_id").cast("long").as("k"),
          col("span.offset").cast("long").as("offset"),
          col("span.kind").as("kind"), col("span.text").as("text"))
    }),

    "stream_dedup" -> ((s, d) => {
      // streaming stateful dedup (dropDuplicatesWithinWatermark), run as a
      // REAL stream and still exactly oracle-able: duplicates are made
      // FULL-ROW identical (doc_key = doc_id % 100 determines every
      // column), so whichever occurrence the state store keeps, the
      // surviving row set is the DISTINCT of the derivation.
      import org.apache.spark.sql.streaming.Trigger
      val base = 1767225600L // 2026-01-01 00:00:00 UTC
      val rows = rd(s, d, "documents").select(
        pmod(col("doc_id"), lit(100)).as("doc_key"),
        concat(lit("Body Variant  "), pmod(col("doc_id"), lit(100)).cast("string"))
          .as("text"),
        (lit(base) + pmod(col("doc_id"), lit(100))).cast("timestamp")
          .as("event_time"))
      val (inDir, out, ck) = streamDirs("stream-dedup", d) { p =>
        rows.coalesce(1).write.parquet(p)
      }
      val in = s.readStream.schema(rows.schema).parquet(inDir)
      graft.streaming.StreamJob.dedupStream(in, "text", "1 hour")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
        .awaitTermination()
      s.read.parquet(out).select("doc_key", "text", "fp")
    }),

    "stream_minhash" -> ((s, d) => {
      // streaming MinHash+LSH near-dup (custom band-bucket state), run as a
      // REAL checkpointed stream over the minhash_dups corpus (bounded to
      // doc_id <= 500 so both SFs see the same docs): pairs stream out as
      // docs arrive; verification is the signature-equality estimate (the
      // documented streaming deviation from batch exact-Jaccard). Read-back
      // distinct collapses the per-shared-band emissions.
      import org.apache.spark.sql.streaming.Trigger
      import s.implicits._
      val base = 1767225600L // 2026-01-01 00:00:00 UTC
      val rows = rd(s, d, "documents").filter(col("doc_id") <= 500)
        .withColumn("t2", docText)
        .select(col("doc_id"),
          (lit(base) + col("doc_id")).cast("timestamp").as("event_time"),
          col("t2").as("text"))
      val (inDir, out, ck) = streamDirs("stream-minhash", d) { p =>
        rows.coalesce(1).write.parquet(p)
      }
      val in = s.readStream.schema(rows.schema).parquet(inDir)
        .as[graft.streaming.StreamJob.MinhashDocEvent]
      graft.streaming.StreamJob.minhashDupStream(in,
        n = 3, k = 32, bands = 8, minSimMilli = 500,
        maxBucket = 1 << 20, horizonSeconds = 86400, watermarkDelay = "1 hour")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
        .awaitTermination()
      s.read.parquet(out).select("id_a", "id_b", "sim_milli").distinct()
    }),

    "stream_topk" -> ((s, d) => {
      // streaming Misra-Gries frequent items over a REAL checkpointed
      // stream: values hash-shard into 4 MG states of 8 counters, a
      // sentinel per shard flushes candidates, and the batch-side exact
      // rescore (the heavy_hitters contract) yields the deterministic
      // answer regardless of how micro-batches sliced the stream
      import org.apache.spark.sql.streaming.Trigger
      import s.implicits._
      val base = 1767225600L // 2026-01-01 00:00:00 UTC
      def corpus = rd(s, d, "lineitem").filter(col("l_orderkey") <= 20000)
        .select(when(pmod(col("l_orderkey"), lit(10)) < 3, lit("hot-a"))
          .when(pmod(col("l_orderkey"), lit(10)) < 6, lit("hot-b"))
          .otherwise(concat(lit("v"),
            pmod(col("l_orderkey"), lit(97)).cast("string"))).as("value"))
      val vals = corpus
        .withColumn("shard", pmod(TA.hash60(col("value")), lit(4)).cast("int"))
        .withColumn("event_time",
          (lit(base) + pmod(TA.hash60(col("value")), lit(3600)))
            .cast("timestamp"))
        .withColumn("flush", lit(false))
        .select("shard", "value", "event_time", "flush")
      val sent = s.range(4).select(col("id").cast("int").as("shard"),
        lit("").as("value"),
        lit(base + 86400).cast("timestamp").as("event_time"),
        lit(true).as("flush"))
      val rows = vals.unionByName(sent)
      val (inDir, out, ck) = streamDirs("stream-topk", d) { p =>
        rows.coalesce(1).write.parquet(p)
      }
      val in = s.readStream.schema(rows.schema).parquet(inDir)
        .as[graft.streaming.StreamJob.MgEvent]
      graft.streaming.StreamJob.mgStream(in, k = 8)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
        .awaitTermination()
      val cands = s.read.parquet(out).select("value").distinct()
      val tot = corpus.agg(count(lit(1)).as("__total"))
      corpus.join(cands, Seq("value"))
        .groupBy("value").agg(count(lit(1)).as("cnt"))
        .join(broadcast(tot))
        .filter(col("cnt") * 4 > col("__total"))
        .select(col("value"), col("cnt"))
    }),

    "stream_window" -> ((s, d) => {
      // watermarked tumbling-window aggregation, run as a REAL stream (file
      // source → append sink): docs rendered from lineitem with event_time
      // = epoch(2026-01-01) + k%3600s, one 'text' span per line. A sentinel
      // doc a day later pushes the watermark past every regular window, so
      // append mode finalizes exactly the 12 regular windows — the sentinel's
      // own window stays in state and never emits, which the oracle replays
      // by excluding it.
      import org.apache.spark.sql.streaming.Trigger
      val base = 1767225600L // 2026-01-01 00:00:00 UTC
      val spanT = struct(lit("text").as("kind"),
        concat(lit("p"), col("l_linenumber").cast("string"), lit("-"),
          col("l_orderkey").cast("string")).as("text"),
        lit("").as("media_ref"), col("l_linenumber").cast("int").as("offset"))
      // bounded: the check verifies watermark/window finalization semantics,
      // which 20k orders exercise identically to the full table
      val regular = rd(s, d, "lineitem").filter(col("l_orderkey") <= 20000)
        .groupBy(col("l_orderkey").as("doc_id"))
        .agg(collect_list(spanT).as("spans"))
        .select(col("doc_id").cast("string").as("doc_id"),
          (lit(base) + pmod(col("doc_id"), lit(3600))).cast("timestamp").as("event_time"),
          col("spans"))
      val sentinel = s.range(1).select(lit("sentinel").as("doc_id"),
        lit(base + 86400L).cast("timestamp").as("event_time"),
        array(struct(lit("text").as("kind"), lit("sentinel").as("text"),
          lit("").as("media_ref"), lit(0).as("offset"))).as("spans"))
      val (inDir, out, ck) = streamDirs("stream-window", d) { p =>
        regular.unionByName(sentinel).coalesce(1).write.parquet(p)
      }
      val in = s.readStream.schema(regular.schema).parquet(inDir)
      graft.streaming.StreamJob.windowedMetrics(in, "10 seconds", "5 minutes")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
        .awaitTermination()
      s.read.parquet(out)
    }),

    // Streaming sessionization with custom flatMapGroupsWithState state, run
    // as a REAL checkpointed stream over the events table (event_id <=
    // 20000): sessions close by the strict->30min gap rule or by event-time
    // timeout; a sentinel event in 2030 advances the watermark past every
    // open session's last+gap so ALL real sessions flush exactly once, and
    // the sentinel's own (still-open) session is filtered out. The oracle is
    // the SAME batch sessionize SQL as the `sessionize` query — stream ≡
    // batch on a complete corpus.
    "stream_session" -> ((s, d) => {
      import org.apache.spark.sql.streaming.Trigger
      val ev = rd(s, d, "events").filter(col("event_id") <= 20000)
        // parquet ts is NTZ; session TZ is UTC, so the cast to the
        // watermark-required LTZ type preserves the epoch DuckDB sees
        .select(col("user_id"), col("ts").cast("timestamp").as("event_time"),
          col("event_id"))
      val sentinel = s.range(1).select(lit(999999999L).as("user_id"),
        lit("2030-01-01 00:00:00").cast("timestamp").as("event_time"),
        lit(-1L).as("event_id"))
      val (inDir, out, ck) = streamDirs("stream-session", d) { p =>
        ev.unionByName(sentinel).coalesce(1).write.parquet(p)
      }
      import s.implicits._
      val in = s.readStream.schema(ev.schema).parquet(inDir)
        .as[graft.streaming.StreamJob.UserEvent]
      graft.streaming.StreamJob.sessionStream(in, gapSeconds = 1800)
        .filter(col("user_id") =!= 999999999L)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
        .awaitTermination()
      s.read.parquet(out)
    }),

    // Watermarked STREAM-STREAM inner join (StreamJob.streamStreamJoin),
    // run as a REAL checkpointed two-source stream: an orders-derived doc
    // stream joins a lineitem-derived span stream on the order key within a
    // ±60s event-time band. Inner matches emit on partner arrival, so with
    // both sides fully delivered the output IS the batch join — which the
    // oracle replays with plain epoch-second arithmetic (timestamps are
    // whole seconds, so interval math ≡ integer math exactly).
    "stream_join" -> ((s, d) => {
      import org.apache.spark.sql.streaming.Trigger
      val base = 1767225600L // 2026-01-01 00:00:00 UTC
      val docSide = rd(s, d, "orders").filter(col("o_orderkey") <= 2000)
        .select(col("o_orderkey").as("doc_id"),
          (lit(base) + pmod(col("o_orderkey"), lit(3600)))
            .cast("timestamp").as("doc_time"),
          round(col("o_totalprice") * 100).cast("long").as("o_cents"))
      // span events jittered around the doc time: linenumber*37 % 150 - 70
      // puts offsets in [-70, +78] — some inside the ±60s band, some out
      val spanSide = rd(s, d, "lineitem").filter(col("l_orderkey") <= 2000)
        .select(col("l_orderkey").as("span_key"),
          (lit(base) + pmod(col("l_orderkey"), lit(3600)) +
            pmod(col("l_linenumber") * 37, lit(150)) - 70)
            .cast("timestamp").as("span_time"),
          concat(lit("p"), col("l_linenumber").cast("string"), lit("-"),
            col("l_orderkey").cast("string")).as("span_text"))
      val (docDir, out, ck) = streamDirs("ssj-docs", d) { p =>
        docSide.coalesce(1).write.parquet(p)
      }
      val (spanDir, _, _) = streamDirs("ssj-spans", d) { p =>
        spanSide.coalesce(1).write.parquet(p)
      }
      val lhs = s.readStream.schema(docSide.schema).parquet(docDir)
      val rhs = s.readStream.schema(spanSide.schema).parquet(spanDir)
      graft.streaming.StreamJob.streamStreamJoin(lhs, rhs,
          "doc_id", "span_key", "doc_time", "span_time", toleranceSeconds = 60)
        .select(col("doc_id"), col("doc_time").cast("long").as("doc_ts"),
          col("o_cents"), col("span_time").cast("long").as("span_ts"),
          col("span_text"))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
        .awaitTermination()
      s.read.parquet(out)
    }),

    // streaming HLL (StreamJob.windowedDistinct): distinct part keys per
    // tumbling window as a REAL checkpointed stream — 256 B of sketch
    // state per window in the state store where exact distinct would hold
    // the full value set. Sentinel-flush finalization like stream_window;
    // the oracle replays every finalized window with the same
    // cross-engine-exact estimator as hll_distinct.
    "stream_hll" -> ((s, d) => {
      import org.apache.spark.sql.streaming.Trigger
      val base = 1767225600L // 2026-01-01 00:00:00 UTC
      val regular = rd(s, d, "lineitem").filter(col("l_orderkey") <= 20000)
        .select((lit(base) + pmod(col("l_orderkey"), lit(3600)))
          .cast("timestamp").as("event_time"),
          col("l_partkey").cast("string").as("v"))
      val sentinel = s.range(1).select(
        lit(base + 86400L).cast("timestamp").as("event_time"),
        lit("sentinel").as("v"))
      val (inDir, out, ck) = streamDirs("stream-hll", d) { p =>
        regular.unionByName(sentinel).coalesce(1).write.parquet(p)
      }
      val in = s.readStream.schema(regular.schema).parquet(inDir)
      graft.streaming.StreamJob.windowedDistinct(in, "v", "10 seconds", "5 minutes")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
        .awaitTermination()
      s.read.parquet(out)
    }),

    "stream_domstrip" -> ((s, d) => {
      // the north-star DOM strip as a REAL checkpointed stream (file source
      // → AvailableNow → append sink) over span docs grouped from the SAME
      // lineitem derivation as dom_interleaved — the stateless strip makes
      // stream output ≡ batch output, so the oracle replay is identical
      val li = rd(s, d, "lineitem").filter(col("l_orderkey") <= 20000)
      val textSpan = struct(lit("text").as("kind"), domSpanText.as("text"),
        lit(null).cast("string").as("media_ref"),
        (col("l_linenumber") * 2).cast("int").as("offset"))
      val mediaSpan = struct(lit("media").as("kind"),
        lit(null).cast("string").as("text"), domMediaRef.as("media_ref"),
        (col("l_linenumber") * 2 + 1).cast("int").as("offset"))
      val docs = li.select(col("l_orderkey").cast("string").as("doc_id"),
          when(pmod(col("l_partkey"), lit(3)) === 0,
            array(textSpan, mediaSpan)).otherwise(array(textSpan)).as("sp"))
        .groupBy("doc_id").agg(flatten(collect_list(col("sp"))).as("spans"))
        .withColumn("partition_id", lit(0))
      val (inDir, out, ck) = streamDirs("stream-domstrip", d) { p =>
        docs.coalesce(1).write.parquet(p)
      }
      graft.streaming.StreamJob.domStrip(s, inDir, out, ck).awaitTermination()
      s.read.parquet(out)
    }),

    "stream_assemble" -> ((s, d) => {
      // custom-state streaming (flatMapGroupsWithState): the ep1_oracle
      // corpus (bounded to l_orderkey <= 2000) arrives one SPAN EVENT per
      // row; docs assemble (sorted by offset — identical to the batch doc)
      // and run EP1 when the watermark closes their session gap (sentinel
      // doc a day later closes every regular gap, its own group never
      // emits). Oracled: per-doc span counts replay through the shared
      // EP1 cascade SQL; docs whose cascade output is empty emit n_spans=0.
      import s.implicits._
      import org.apache.spark.sql.streaming.Trigger
      val base = 1767225600L
      val events = ep1OracleDocs(s, d, maxKey = 2000L).toDF()
        .select(col("doc_id"), explode(col("spans")).as("span"))
        .select(col("doc_id"),
          (lit(base) + pmod(col("doc_id").cast("long"), lit(3600)))
            .cast("timestamp").as("event_time"),
          col("span.kind").as("kind"), col("span.text").as("text"),
          coalesce(col("span.media_ref"), lit("")).as("media_ref"),
          col("span.offset").cast("int").as("offset"))
      val sentinel = s.range(1).select(lit("sentinel").as("doc_id"),
        lit(base + 86400L).cast("timestamp").as("event_time"), lit("text").as("kind"),
        lit("flush").as("text"), lit("").as("media_ref"), lit(0).as("offset"))
      val (inDir, out, ck) = streamDirs("stream-assemble", d) { p =>
        events.unionByName(sentinel).coalesce(1).write.parquet(p)
      }
      val in = s.readStream.schema(events.schema).parquet(inDir)
        .as[graft.streaming.StreamJob.SpanEvent]
      graft.streaming.StreamJob.assembleDocs(in, gapSeconds = 30)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
        .awaitTermination()
      s.read.parquet(out)
        .select(col("doc_id"), size(col("spans")).cast("long").as("n_spans"))
    }),

    "minhash_dups" -> ((s, d) => {
      Dedup.minhashDuplicates(
        rd(s, d, "documents").withColumn("t2", docText).select(col("doc_id"), col("t2")),
        "doc_id", "t2", n = 3, k = 32, bands = 8, minJ = 0.5)
    }),

    // LSH RECALL measurement — the eval every production near-dup deploy
    // needs before trusting its band parameters: ground truth = exact
    // shingle-Jaccard pairs >= 0.5 (shared-shingle candidates, exact at this
    // threshold: J >= 0.5 implies a common shingle), found = the banded
    // MinHash path's rescored pairs (a subset of truth by construction, so
    // recall_milli is exact). One row: the (32,8)-band recall at 0.5.
    "minhash_recall" -> ((s, d) => {
      val docs = rd(s, d, "documents").withColumn("t2", docText)
        .select(col("doc_id"), col("t2"))
      val truth = Dedup.jaccardPairs(docs, "doc_id", "t2", n = 3, minJ = 0.5)
        .select(col("id_a"), col("id_b"))
      val found = Dedup.minhashDuplicates(docs, "doc_id", "t2",
          n = 3, k = 32, bands = 8, minJ = 0.5)
        .select(col("id_a"), col("id_b"), lit(1L).as("hit"))
      truth.join(found, Seq("id_a", "id_b"), "left")
        .agg(count(lit(1)).as("n_true"),
          coalesce(sum(col("hit")), lit(0L)).as("n_found"))
        .select(col("n_true"), col("n_found"),
          expr("n_found * 1000L div n_true").as("recall_milli"))
    }),

    // incremental LSH dedup (Dedup.minhashIncrementalDuplicates): the odd
    // half ("today's crawl") dedups against the even half's persisted band
    // table without re-pairing the old corpus; verification shingles are
    // semi-join-pruned to candidates only. The oracle replays the BATCH
    // cascade restricted to pairs touching a new doc — the invariant that
    // makes incremental dedup safe to run day over day.
    "minhash_incremental" -> ((s, d) => {
      val docs = rd(s, d, "documents").withColumn("t2", docText)
        .select(col("doc_id"), col("t2"))
      val old = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
      val nw = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
      val oldBands = Dedup.minhashBandRows(old, "doc_id", "t2", n = 3, k = 32, bands = 8)
      Dedup.minhashIncrementalDuplicates(oldBands, old, nw, "doc_id", "t2",
        n = 3, k = 32, bands = 8, minJ = 0.5)
    }),

    "simhash_dups" -> ((s, d) => {
      Dedup.simhashDuplicates(
        rd(s, d, "documents").withColumn("t2", docText).select(col("doc_id"), col("t2")),
        "doc_id", "t2", maxHamming = 3)
        .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
    }),

    "j6_name_variation" -> ((s, d) => {
      // OCR-tolerant name matching over deterministically noised pairs
      import s.implicits._
      rd(s, d, "customer").select(col("c_custkey"), upper(col("c_name")).as("n"))
        .as[(Long, String)]
        .map { case (k, n) =>
          val noisy = if (k % 3 == 0) n.replace('O', '0') else if (k % 3 == 1) n.replace('I', '1') else n + "X"
          (k, n, noisy, graft.extract.Norms.isNameVariation(n, noisy))
        }.toDF("c_custkey", "name", "noisy", "is_variation")
    }),

    "p1_boundaries" -> ((s, d) => {
      // P1 char-interval boundary parse over rendered marker documents
      import s.implicits._
      rd(s, d, "lineitem")
        .select(col("l_orderkey").as("k"), col("l_linenumber").as("page"),
          concat(lit("item page "), col("l_linenumber").cast("string"),
            lit(" of order "), col("l_orderkey").cast("string")).as("body"))
        .as[(Long, Int, String)]
        .groupByKey(_._1)
        .mapGroups { (k: Long, it: Iterator[(Long, Int, String)]) =>
          val txt = it.toSeq.sortBy(_._2)
            .map { case (_, pg, b) => graft.segment.PageSegmenter.renderMarker(pg) + b }
            .mkString
          (k, txt)
        }
        .flatMap { kt: (Long, String) =>
          graft.segment.PageSegmenter.p1Boundaries(kt._2)
            .map(b => (kt._1, b.page.toLong, b.start.toLong, b.end.toLong))
        }.toDF("k", "page", "start", "end")
    }),

    "p3_split" -> ((s, d) => {
      // P3 strict multiline split (marker retained, page-0 preamble)
      import s.implicits._
      rd(s, d, "lineitem")
        .select(col("l_orderkey").as("k"), col("l_linenumber").as("page"),
          concat(lit("line "), col("l_linenumber").cast("string")).as("body"))
        .as[(Long, Int, String)]
        .groupByKey(_._1)
        .mapGroups { (k: Long, it: Iterator[(Long, Int, String)]) =>
          val txt = "preamble text\r\n" + it.toSeq.sortBy(_._2)
            .map { case (_, pg, b) => graft.segment.PageSegmenter.renderMarker(pg) + b }
            .mkString
          (k, txt)
        }
        .flatMap { kt: (Long, String) =>
          graft.segment.PageSegmenter.p3SplitPages(kt._2)
            .map { case (pg, chunk) => (kt._1, pg.toLong, chunk.length.toLong) }
        }.toDF("k", "page", "chunk_len")
    }),

    "qc_head_meta" -> ((s, d) => {
      // EP3 sectioning (P1 → F1 → R1 → R7 fan-out → R5 slice → R8 assembly)
      // over rendered marker documents; section metadata is emitted so the
      // whole cascade is arithmetically replayable by the oracle
      import s.implicits._
      qcHeadDocs(s, d)
        .flatMap { kt: (Long, String) =>
          graft.qc.QcHead.sectionDocument(kt._2).toSeq.sortBy(_._1).flatMap {
            case (cov, res) => res.map { case (sec, valid, _) =>
              (kt._1, cov, sec.startPage.toLong, sec.endPage.toLong,
                sec.pageCount.toLong, sec.content.length.toLong, valid,
                sec.warnings.length.toLong)
            }
          }
        }.toDF("k", "coverage", "start_page", "end_page", "page_count",
          "content_len", "valid", "n_warnings")
    }),

    "qc_head_content" -> ((s, d) => {
      // R8 verbatim: the assembled section TEXT itself ([Match i] banners +
      // page chunks) plus the A5 found-keyword list — qc_head_meta proves
      // the cascade's arithmetic, this proves the bytes
      import s.implicits._
      qcHeadDocs(s, d)
        .flatMap { kt: (Long, String) =>
          graft.qc.QcHead.sectionDocument(kt._2).toSeq.sortBy(_._1).flatMap {
            case (cov, res) => res.map { case (sec, _, found) =>
              (kt._1, cov, sec.content, found.mkString(","))
            }
          }
        }.toDF("k", "coverage", "content", "found_kw")
    }),

    "qc_head_sections" -> ((s, d) => {
      // EP3 through the QcJob wrapper (fromSpans marker-flat assembly →
      // run) over a SPAN table derived from lineitem: per page a text span
      // holding marker+body (flat text ≡ qcHeadDocs by construction) plus
      // a media span fromSpans must drop — oracled by the same cascade
      // replay as qc_head_meta
      import s.implicits._
      import graft.model.{Kind, Span}
      val docs = qcHeadPages(s, d)
        .groupByKey(_._1)
        .mapGroups { (k: Long, it: Iterator[(Long, Int, String)]) =>
          val spans = it.toSeq.sortBy(_._2).flatMap { case (_, pg, b) =>
            Seq(Span(Kind.Text,
              graft.segment.PageSegmenter.renderMarker(pg) + b, "", pg * 2),
              Span(Kind.Media, "", s"fig-$k-$pg", pg * 2 + 1))
          }
          Doc(k.toString, spans, (k % 8).toInt)
        }
      val flat = graft.pipeline.QcJob.fromSpans(s, docs.toDF())
      graft.pipeline.QcJob.run(flat)
        .toDF().select(col("doc_id"), col("coverage"), col("start_page").cast("long"),
          col("end_page").cast("long"), col("page_count").cast("long"), col("valid"))
    }))

  // ---------------------------------------------------------------------- //

  /** DuckDB equivalents. Table paths are injected by the driver; per its
    * contract the SQL reads bare table names over the same parquet dir.
    * Every regexp_replace uses the 'g' flag (DuckDB default replaces only
    * the first match; Spark replaces all). */
  /** The EP3 cascade replay shared by qc_head_meta and qc_head_sections:
    * P1 boundaries arithmetically, F1 hits from the body construction,
    * R1 islands, R7 start-page existence + match indexing, R5
    * available-page end selection + warnings, R8 banner/chunk length
    * assembly and A5's length validation — everything up to the per-doc
    * `sec` relation; callers append their own final SELECT. */
  private val qcHeadCascadeSql: String =
    """WITH li AS (SELECT l_orderkey AS k, l_linenumber::INT AS page, min(l_partkey) AS pk
      |  FROM lineitem GROUP BY 1, 2),
      |b0 AS (SELECT k, page, pk,
      |  'item page '||page||' of order '||k||' limit $'||(pk%400)||
      |  (CASE WHEN pk%7=0 THEN ' see EXAMPLE calculation' ELSE '' END) AS body FROM li),
      |c AS (SELECT k, page, pk, 169 + length(page::VARCHAR) + length(body) AS clen FROM b0),
      |pos AS (SELECT k, page, pk, clen,
      |  coalesce(sum(clen) OVER (PARTITION BY k ORDER BY page
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),0) AS cum,
      |  sum(clen) OVER (PARTITION BY k) AS total FROM c),
      |bound AS (SELECT k, page, pk, cum+1 AS cstart,
      |  coalesce(lead(cum+1) OVER (PARTITION BY k ORDER BY page), total) AS cend FROM pos),
      |hits AS (SELECT k, page FROM bound WHERE pk%7 <> 0 AND pk%400 >= 200),
      |dom AS (SELECT k, min(page) AS mn, max(page) AS mx FROM bound GROUP BY 1),
      |r0 AS (SELECT DISTINCT h.k, greatest(d.mn, h.page-1) AS s, least(d.mx, h.page+1) AS e
      |  FROM hits h JOIN dom d ON h.k=d.k),
      |w AS (SELECT k, s, e, max(e) OVER (PARTITION BY k ORDER BY s, e
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe FROM r0),
      |g AS (SELECT k, s, e, sum(CASE WHEN pe IS NULL OR s > pe+1 THEN 1 ELSE 0 END)
      |  OVER (PARTITION BY k ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND
      |  CURRENT ROW) AS grp FROM w),
      |ranges AS (SELECT k, min(s) AS s, max(e) AS e FROM g GROUP BY k, grp),
      |-- range validity via an INNER JOIN on bound's unique (k,page) key,
      |-- NOT `WHERE EXISTS`: DuckDB's correlated-EXISTS decorrelation can
      |-- nondeterministically DUPLICATE the outer row under parallel
      |-- execution (observed ~30% of runs at sf0.1), which doubled a
      |-- section downstream; the join is 1:1 by construction
      |m0 AS (SELECT r.k, r.s, r.e, (r.e - r.s + 1) AS n_req FROM ranges r
      |  JOIN bound b ON b.k = r.k AND b.page = r.s),
      |m AS (SELECT k, s, e, n_req, row_number() OVER (PARTITION BY k ORDER BY s) AS idx FROM m0),
      |avail AS (SELECT m.k, m.idx, m.s, m.n_req, b.page, b.cend,
      |  row_number() OVER (PARTITION BY m.k, m.idx ORDER BY b.page) AS arn,
      |  count(*) OVER (PARTITION BY m.k, m.idx) AS cnt
      |  FROM m JOIN bound b ON b.k = m.k AND b.page >= m.s),
      |ends AS (SELECT k, idx, s, n_req, cnt,
      |  max(CASE WHEN arn = least(cnt, n_req) THEN page END) AS end_page,
      |  max(CASE WHEN arn = least(cnt, n_req) THEN cend END) AS end_char
      |  FROM avail GROUP BY 1, 2, 3, 4, 5),
      |ml AS (SELECT e.k, e.idx, e.s AS start_page, e.end_page,
      |  least(e.cnt, e.n_req) AS pcount,
      |  CASE WHEN e.cnt < e.n_req THEN 1 ELSE 0 END AS warn,
      |  bs.cstart AS start_char, e.end_char,
      |  180 + length(e.idx::VARCHAR) + length(e.s::VARCHAR) AS banner_len
      |  FROM ends e JOIN bound bs ON bs.k=e.k AND bs.page=e.s),
      |sec AS (SELECT k, min(start_page) AS sp, max(end_page) AS ep,
      |  sum(pcount) AS pc, sum(banner_len + (end_char - start_char)) AS cl,
      |  sum(warn) AS nw
      |  FROM ml WHERE end_char > start_char GROUP BY k)""".stripMargin

  /** Full EP1 cascade replay shared by ep1_oracle (batch) and
    * stream_extract (streamed, bounded corpus): body construction → A2 gate
    * (gibberish count + total chars) → per-kind F1∨F2 hits → islands merge
    * → R4 endpoint drop + slice → union → per-source placeholder interleave
    * → offset renumber. Span text compared verbatim. `where` bounds the
    * lineitem scan (empty for the full corpus). */
  private def ep1CascadeSql(where: String): String =
    s"""WITH li AS (SELECT l_orderkey AS k, l_linenumber::INT AS page,
      |  min(l_partkey) AS pk, min(l_suppkey) AS sk FROM lineitem $where GROUP BY 1, 2),
      |b AS (SELECT k, page, pk, sk,
      |  CASE WHEN pk%17=0 THEN '###' ELSE
      |    'ocr page '||page||' of '||k||' limit $$'||(pk%400)||
      |    (CASE WHEN pk%11=0 THEN ' loss payee noted' ELSE '' END)||
      |    (CASE WHEN pk%7=0 THEN ' see EXAMPLE calculation' ELSE '' END)||
      |    (CASE WHEN k%2=0 THEN repeat(' pad', 75) ELSE '' END)
      |  END AS obody,
      |  'text page '||page||' of '||k||' amount $$'||(sk%400)||
      |    (CASE WHEN sk%13=0 THEN ' mortgagee listed' ELSE '' END) AS tbody
      |  FROM li),
      |gate AS (SELECT k,
      |  (count(CASE WHEN pk%17=0 THEN 1 END)::DOUBLE / count(*) > 0.5
      |   OR sum(length(obody)) < 1000) AS drop_ocr FROM b GROUP BY 1),
      |oh AS (SELECT b.k, b.page FROM b JOIN gate g ON b.k=g.k
      |  WHERE NOT g.drop_ocr AND pk%17<>0 AND ((pk%7<>0 AND pk%400>=200) OR pk%11=0)),
      |th AS (SELECT k, page FROM b WHERE (sk%400>=200) OR sk%13=0),
      |dom AS (SELECT k, min(page) AS mn, max(page) AS mx FROM b GROUP BY 1),
      |or0 AS (SELECT DISTINCT h.k, greatest(d.mn,h.page-1) AS s, least(d.mx,h.page+1) AS e
      |  FROM oh h JOIN dom d ON h.k=d.k),
      |ow AS (SELECT k, s, e, max(e) OVER (PARTITION BY k ORDER BY s, e
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe FROM or0),
      |og AS (SELECT k, s, e, sum(CASE WHEN pe IS NULL OR s > pe+1 THEN 1 ELSE 0 END)
      |  OVER (PARTITION BY k ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp FROM ow),
      |oranges AS (SELECT k, min(s) AS s, max(e) AS e FROM og GROUP BY k, grp),
      |ovalid AS (SELECT r.* FROM oranges r
      |  WHERE EXISTS(SELECT 1 FROM b WHERE b.k=r.k AND b.page=r.s)
      |    AND EXISTS(SELECT 1 FROM b WHERE b.k=r.k AND b.page=r.e)),
      |okept AS (SELECT DISTINCT b.k, b.page FROM b JOIN ovalid v ON b.k=v.k
      |  AND b.page BETWEEN v.s AND v.e),
      |tr0 AS (SELECT DISTINCT h.k, greatest(d.mn,h.page-1) AS s, least(d.mx,h.page+1) AS e
      |  FROM th h JOIN dom d ON h.k=d.k),
      |tw AS (SELECT k, s, e, max(e) OVER (PARTITION BY k ORDER BY s, e
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe FROM tr0),
      |tg AS (SELECT k, s, e, sum(CASE WHEN pe IS NULL OR s > pe+1 THEN 1 ELSE 0 END)
      |  OVER (PARTITION BY k ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp FROM tw),
      |tranges AS (SELECT k, min(s) AS s, max(e) AS e FROM tg GROUP BY k, grp),
      |tvalid AS (SELECT r.* FROM tranges r
      |  WHERE EXISTS(SELECT 1 FROM b WHERE b.k=r.k AND b.page=r.s)
      |    AND EXISTS(SELECT 1 FROM b WHERE b.k=r.k AND b.page=r.e)),
      |tkept AS (SELECT DISTINCT b.k, b.page FROM b JOIN tvalid v ON b.k=v.k
      |  AND b.page BETWEEN v.s AND v.e),
      |union_ AS (SELECT k, page FROM okept UNION SELECT k, page FROM tkept),
      |rows_ AS (
      |  SELECT u.k, u.page, 0 AS rnk, 'ocr' AS kind,
      |    CASE WHEN ok.page IS NOT NULL THEN b.obody
      |      ELSE '[Page not found in ocr extraction]' END AS text
      |  FROM union_ u JOIN b ON b.k=u.k AND b.page=u.page
      |  LEFT JOIN okept ok ON ok.k=u.k AND ok.page=u.page
      |  UNION ALL
      |  SELECT u.k, u.page, 1, 'text',
      |    CASE WHEN tk.page IS NOT NULL THEN b.tbody
      |      ELSE '[Page not found in text extraction]' END
      |  FROM union_ u JOIN b ON b.k=u.k AND b.page=u.page
      |  LEFT JOIN tkept tk ON tk.k=u.k AND tk.page=u.page)
      |SELECT k, (row_number() OVER (PARTITION BY k ORDER BY page, rnk) - 1)::BIGINT AS "offset",
      |  kind, text
      |FROM rows_""".stripMargin

  /** Shared CTE chain for the span_eval oracles: renders the gold + planted
    * defect corpora (lockstep with [[spanEvalFrames]]) and replays
    * [[graft.qc.SpanEval.spanSeqEval]] — per-side position index, full-outer
    * positional match, dup-ranked bag intersection, integer-milli ratios. */
  private val spanEvalOracleCtes: String =
    """WITH pg AS (SELECT l_orderkey AS k, l_linenumber::INT AS p, min(l_partkey%1000) AS b
      |  FROM lineitem GROUP BY 1,2),
      |gold AS (
      |  SELECT k::VARCHAR AS doc_id, 'text' AS kind, 'body '||b||' page '||p AS text,
      |    '' AS media_ref, p*2 AS off FROM pg
      |  UNION ALL SELECT k::VARCHAR, 'media', '', 'mm-'||k||'-'||p, p*2+1 FROM pg),
      |act AS (
      |  SELECT k::VARCHAR AS doc_id, 'text' AS kind,
      |    CASE WHEN k%19=0 AND k%13<>0 AND k%17<>0 AND p=1
      |      THEN 'body '||b||' page '||p||' MUTATED'
      |      ELSE 'body '||b||' page '||p END AS text,
      |    '' AS media_ref,
      |    CASE WHEN k%17=0 AND k%13<>0 AND p=1 THEN p*2+1 ELSE p*2 END AS off FROM pg
      |  UNION ALL SELECT k::VARCHAR, 'media', '', 'mm-'||k||'-'||p,
      |    CASE WHEN k%17=0 AND k%13<>0 AND p=1 THEN p*2 ELSE p*2+1 END
      |    FROM pg WHERE NOT (k%13=0 AND p=1)
      |  UNION ALL SELECT DISTINCT k::VARCHAR, 'text', 'extra span', '', 1000000
      |    FROM pg WHERE k%23=0),
      |ai AS (SELECT doc_id, kind, text, media_ref,
      |  row_number() OVER (PARTITION BY doc_id ORDER BY off, kind, text) AS idx FROM act),
      |gi AS (SELECT doc_id, kind, text, media_ref,
      |  row_number() OVER (PARTITION BY doc_id ORDER BY off, kind, text) AS idx FROM gold),
      |ap AS (SELECT doc_id, idx, kind AS a_kind, text AS a_text, media_ref AS a_ref FROM ai),
      |gp AS (SELECT doc_id, idx, kind AS g_kind, text AS g_text, media_ref AS g_ref FROM gi),
      |pos AS (SELECT doc_id, count(a_kind) AS n_actual, count(g_kind) AS n_gold,
      |  sum(CASE WHEN a_kind=g_kind AND a_text=g_text AND a_ref=g_ref
      |    THEN 1 ELSE 0 END)::BIGINT AS pos_matched
      |  FROM ap FULL JOIN gp USING (doc_id, idx) GROUP BY 1),
      |ar AS (SELECT doc_id, kind, text, media_ref, row_number() OVER
      |  (PARTITION BY doc_id, kind, text, media_ref ORDER BY idx) AS dup_rank FROM ai),
      |gr AS (SELECT doc_id, kind, text, media_ref, row_number() OVER
      |  (PARTITION BY doc_id, kind, text, media_ref ORDER BY idx) AS dup_rank FROM gi),
      |bag AS (SELECT doc_id, count(*) AS bag_matched FROM ar
      |  JOIN gr USING (doc_id, kind, text, media_ref, dup_rank) GROUP BY 1),
      |per AS (SELECT pos.doc_id, n_gold, n_actual, pos_matched,
      |  coalesce(bag_matched, 0) AS bag_matched,
      |  (n_gold = n_actual AND pos_matched = n_gold) AS exact,
      |  CASE WHEN n_actual>0 THEN (1000*coalesce(bag_matched,0))//n_actual
      |    END AS precision_milli,
      |  CASE WHEN n_gold>0 THEN (1000*coalesce(bag_matched,0))//n_gold
      |    END AS recall_milli
      |  FROM pos LEFT JOIN bag ON pos.doc_id=bag.doc_id)
      |""".stripMargin

  /** Shared CTE chain for the image_phash/image_dups oracles: the synthetic
    * pixel grid unnested, integer grayscale, (coord·8) div edge box cells,
    * integer means, per-cell bits vs the 64-cell mean — lockstep with
    * [[graft.media.Media.aHash64]] over the losslessly-decoded PNG. */
  private val imagePhashOracleCtes: String =
    """WITH spec AS (SELECT 'img-'||c_custkey AS media_ref,
      |  ('0x'||substr(md5('g'||(c_custkey%400)),1,8))::BIGINT AS seed,
      |  (16 + (c_custkey%400)%9)::INT AS w, (12 + (c_custkey%400)%7)::INT AS h
      |  FROM customer WHERE c_custkey <= 2000),
      |pxx AS (SELECT media_ref, seed, w, h, unnest(range(w)) AS x FROM spec),
      |px AS (SELECT media_ref, seed, w, h, x, unnest(range(h)) AS y FROM pxx),
      |g AS (SELECT media_ref, ((y*8)//h)*8 + ((x*8)//w) AS c,
      |  (299*((x*31+y*17+seed)%256) + 587*((x*13+y*29+seed)%256)
      |    + 114*((x*7+y*43+seed)%256)) // 1000 AS gray
      |  FROM px),
      |cells AS (SELECT media_ref, c, sum(gray)//count(*) AS m FROM g GROUP BY 1,2),
      |ov AS (SELECT media_ref, sum(m)//64 AS om FROM cells GROUP BY 1),
      |bits AS (SELECT cells.media_ref,
      |  sum(CASE WHEN m > om AND c >= 32 THEN (1::BIGINT << (c-32))
      |    ELSE 0 END)::BIGINT AS ahash_hi,
      |  sum(CASE WHEN m > om AND c < 32 THEN (1::BIGINT << c)
      |    ELSE 0 END)::BIGINT AS ahash_lo
      |  FROM cells JOIN ov USING (media_ref) GROUP BY 1)
      |""".stripMargin

  /** Shared CTE chain for the video_phash/video_dups oracles: sampled-frame
    * indices by the evenly-spaced integer rule, then the [[imagePhashOracleCtes]]
    * aHash replay per (media_ref, frame_index) with frame seed = seed + index —
    * lockstep with [[graft.media.Media.videoFrameHashes]] over the real
    * GPNG-container decode. */
  private val videoPhashOracleCtes: String =
    """WITH spec AS (SELECT 'vid-'||c_custkey AS media_ref,
      |  ('0x'||substr(md5('v'||(c_custkey%60)),1,8))::BIGINT AS seed,
      |  (8 + (c_custkey%60)%5)::INT AS nf,
      |  (16 + (c_custkey%60)%5)::INT AS w, (12 + (c_custkey%60)%5)::INT AS h
      |  FROM customer WHERE c_custkey <= 300),
      |f0 AS (SELECT media_ref, seed, nf, w, h, least(4, nf) AS n,
      |  unnest(range(least(4, nf))) AS i FROM spec),
      |f AS (SELECT media_ref, w, h,
      |  (CASE WHEN n=1 THEN 0 ELSE (i*(nf-1))//(n-1) END)::BIGINT AS frame_index,
      |  seed + (CASE WHEN n=1 THEN 0 ELSE (i*(nf-1))//(n-1) END) AS fseed FROM f0),
      |pxx AS (SELECT media_ref, frame_index, fseed, w, h, unnest(range(w)) AS x FROM f),
      |px AS (SELECT media_ref, frame_index, fseed, w, h, x, unnest(range(h)) AS y FROM pxx),
      |g AS (SELECT media_ref, frame_index, ((y*8)//h)*8 + ((x*8)//w) AS c,
      |  (299*((x*31+y*17+fseed)%256) + 587*((x*13+y*29+fseed)%256)
      |    + 114*((x*7+y*43+fseed)%256)) // 1000 AS gray
      |  FROM px),
      |cells AS (SELECT media_ref, frame_index, c, sum(gray)//count(*) AS m
      |  FROM g GROUP BY 1,2,3),
      |ov AS (SELECT media_ref, frame_index, sum(m)//64 AS om FROM cells GROUP BY 1,2),
      |vbits AS (SELECT cells.media_ref, cells.frame_index,
      |  sum(CASE WHEN m > om AND c >= 32 THEN (1::BIGINT << (c-32))
      |    ELSE 0 END)::BIGINT AS ahash_hi,
      |  sum(CASE WHEN m > om AND c < 32 THEN (1::BIGINT << c)
      |    ELSE 0 END)::BIGINT AS ahash_lo
      |  FROM cells JOIN ov USING (media_ref, frame_index) GROUP BY 1,2)
      |""".stripMargin

  /** knn_topk / ivf_topk oracle bodies, shared with the ann_recall
    * composition (recall = found-in-truth fraction). */
  private val knnTopkOracleSql: String =
    """WITH e AS (SELECT vec_id, embedding FROM embeddings),
          |s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          |  round(list_sum(list_transform(list_zip(q.embedding, c.embedding), x -> x[1]::DOUBLE * x[2]::DOUBLE))
          |    / (sqrt(list_sum(list_transform(list_zip(q.embedding, q.embedding), x -> x[1]::DOUBLE * x[2]::DOUBLE)))
          |     * sqrt(list_sum(list_transform(list_zip(c.embedding, c.embedding), x -> x[1]::DOUBLE * x[2]::DOUBLE)))), 6) AS cos
          |  FROM e q JOIN e c ON q.vec_id < 5 AND c.vec_id <> q.vec_id)
          |SELECT query_id, neighbor_id, cos,
          |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id)::BIGINT AS rnk
          |FROM s QUALIFY rnk <= 10""".stripMargin

  private val ivfTopkOracleSql: String =
    """WITH e AS (SELECT vec_id, embedding FROM embeddings),
          |seeds AS (
          |  SELECT row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) - 1 AS cell,
          |         embedding AS c
          |  FROM e
          |  QUALIFY row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) <= 8),
          |a0 AS (
          |  SELECT e.vec_id, e.embedding, s.cell,
          |    round(list_sum(list_transform(list_zip(e.embedding, s.c), x -> x[1]::DOUBLE * x[2]::DOUBLE))
          |      / (sqrt(list_sum(list_transform(list_zip(e.embedding, e.embedding), x -> x[1]::DOUBLE * x[2]::DOUBLE)))
          |       * sqrt(list_sum(list_transform(list_zip(s.c, s.c), x -> x[1]::DOUBLE * x[2]::DOUBLE)))), 6) AS cs
          |  FROM e CROSS JOIN seeds s),
          |asg AS (
          |  SELECT vec_id, embedding, cell FROM a0
          |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell) = 1),
          |cm AS (
          |  SELECT cell, unnest(range(len(embedding))) AS pos,
          |         unnest(list_transform(embedding, x -> x::DOUBLE)) AS x
          |  FROM asg),
          |cents AS (
          |  SELECT cell, list(m ORDER BY pos) AS c FROM (
          |    SELECT cell, pos, round(avg(x), 6) AS m FROM cm GROUP BY 1, 2)
          |  GROUP BY cell),
          |casg AS (
          |  SELECT neighbor_id, ce, cell FROM (
          |    SELECT e.vec_id AS neighbor_id, e.embedding AS ce, c.cell,
          |      round(list_sum(list_transform(list_zip(e.embedding, c.c), x -> x[1]::DOUBLE * x[2]::DOUBLE))
          |        / (sqrt(list_sum(list_transform(list_zip(e.embedding, e.embedding), x -> x[1]::DOUBLE * x[2]::DOUBLE)))
          |         * sqrt(list_sum(list_transform(list_zip(c.c, c.c), x -> x[1]::DOUBLE * x[2]::DOUBLE)))), 6) AS cs
          |    FROM e CROSS JOIN cents c)
          |  QUALIFY row_number() OVER (PARTITION BY neighbor_id ORDER BY cs DESC, cell) = 1),
          |probe AS (
          |  SELECT query_id, qe, cell FROM (
          |    SELECT q.vec_id AS query_id, q.embedding AS qe, c.cell,
          |      round(list_sum(list_transform(list_zip(q.embedding, c.c), x -> x[1]::DOUBLE * x[2]::DOUBLE))
          |        / (sqrt(list_sum(list_transform(list_zip(q.embedding, q.embedding), x -> x[1]::DOUBLE * x[2]::DOUBLE)))
          |         * sqrt(list_sum(list_transform(list_zip(c.c, c.c), x -> x[1]::DOUBLE * x[2]::DOUBLE)))), 6) AS cs
          |    FROM e q CROSS JOIN cents c WHERE q.vec_id < 5)
          |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, cell) <= 2),
          |s AS (
          |  SELECT p.query_id, ca.neighbor_id,
          |    round(list_sum(list_transform(list_zip(p.qe, ca.ce), x -> x[1]::DOUBLE * x[2]::DOUBLE))
          |      / (sqrt(list_sum(list_transform(list_zip(p.qe, p.qe), x -> x[1]::DOUBLE * x[2]::DOUBLE)))
          |       * sqrt(list_sum(list_transform(list_zip(ca.ce, ca.ce), x -> x[1]::DOUBLE * x[2]::DOUBLE)))), 6) AS cos
          |  FROM probe p JOIN casg ca USING (cell) WHERE ca.neighbor_id <> p.query_id)
          |SELECT query_id, neighbor_id, cos,
          |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id)::BIGINT AS rnk
          |FROM s QUALIFY rnk <= 10""".stripMargin

  def oracleSql: Map[String, String] = {
    // shared fragments (kept in lockstep with the Spark derivations above)
    val docText =
      "CASE WHEN doc_id%13=0 THEN text || ' mortgagee: FIRST NATIONAL BANK' " +
        "WHEN doc_id%17=0 THEN 'duplicate content block' " +
        "WHEN doc_id%11=0 THEN substr(text,1,5) ELSE text END"
    val pageText =
      "'item '||l_linenumber||' limit $'||(l_partkey%400)||" +
        "(CASE WHEN l_orderkey%7=0 THEN ' see EXAMPLE calculation' ELSE '' END)"
    val toks = "list_filter(string_split_regex(lower(%s),'\\W+'), x -> x <> '')"
    // full BM25 replay body, shared by bm25_topk and the hybrid_rrf fusion
    val bm25OracleSql =
      s"""WITH t AS (SELECT doc_id, $docText AS t2 FROM documents),
         |tok AS (SELECT doc_id, unnest(${toks.format("t2")}) AS tok FROM t),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
         |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
         |st AS (SELECT count(*) AS n, round(avg(dl)*1000)::BIGINT AS avgdlm FROM dl),
         |dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
         |q(qid, qtext) AS (VALUES (1, 'mortgagee bank'),
         |  (2, 'duplicate content block'), (3, 'policy limit payment')),
         |qt AS (SELECT DISTINCT qid, unnest(${toks.format("qtext")}) AS tok FROM q),
         |idf AS (SELECT qid, qt.tok,
         |    round(ln((n - df + 0.5)/(df + 0.5) + 1)*1000)::BIGINT AS idfm, avgdlm
         |  FROM qt JOIN dfq USING (tok), st),
         |terms AS (SELECT qid, tf.doc_id,
         |    round(idfm * (tf * 2.5) / (tf + 1.5 * (0.25 + dl.dl * 750.0 / avgdlm)))::BIGINT AS sc
         |  FROM tf JOIN idf USING (tok) JOIN dl ON dl.doc_id = tf.doc_id),
         |sc AS (SELECT qid, doc_id, sum(sc)::BIGINT AS score_milli FROM terms GROUP BY 1, 2),
         |r AS (SELECT qid, doc_id,
         |    row_number() OVER (PARTITION BY qid ORDER BY score_milli DESC, doc_id) AS rk,
         |    score_milli FROM sc)
         |SELECT qid, doc_id, rk::BIGINT AS rank, score_milli FROM r WHERE rk <= 10""".stripMargin
    // full readability replay body, shared with the per-slice rollup
    val readabilityOracleSql =
      s"""WITH t AS (SELECT doc_id, text, ${toks.format("text")} AS toks
         |  FROM documents),
         |b AS (SELECT doc_id,
         |  len(list_filter(string_split_regex(text, '[.!?]+'),
         |      x -> regexp_replace(x, '^\\s+|\\s+$$', '', 'g') <> ''))::BIGINT AS n_sentences,
         |  len(toks)::BIGINT AS n_words,
         |  coalesce(list_sum(list_transform(toks, w ->
         |    greatest(CASE WHEN len(regexp_extract_all(w, '[aeiouy]+')) > 1
         |        AND w LIKE '%e' AND NOT w LIKE '%le'
         |      THEN len(regexp_extract_all(w, '[aeiouy]+')) - 1
         |      ELSE len(regexp_extract_all(w, '[aeiouy]+')) END, 1))), 0)::BIGINT AS n_syllables
         |  FROM t),
         |m AS (SELECT doc_id, n_sentences, n_words, n_syllables,
         |  1000 * n_words // greatest(n_sentences, 1) AS wps,
         |  CASE WHEN n_words = 0 THEN NULL
         |    ELSE 1000 * n_syllables // n_words END AS spw
         |  FROM b)
         |SELECT doc_id, n_sentences, n_words, n_syllables,
         |  (206835 - 1015 * wps // 1000 - 84600 * spw // 1000)::BIGINT AS ease_milli,
         |  (390 * wps // 1000 + 11800 * spw // 1000 - 15590)::BIGINT AS grade_milli
         |FROM m""".stripMargin

    // SQL twin of the Spark-side disclaimerPage fixture (same constant)
    val disclaimerCase =
      s"CASE WHEN doc_id%5=0 THEN text || '$disclaimerSentence' ELSE text END"
    // SQL twin of the Spark-side containmentPage fixture
    val containmentCase =
      s"CASE WHEN doc_id%31=0 THEN '${disclaimerSentence.trim}' " +
        s"WHEN doc_id%5=0 THEN text || '$disclaimerSentence' ELSE text END"
    def hash60(e: String) = s"('0x'||substr(md5($e),1,15))::BIGINT"
    // Unigram-LM Viterbi replay, generated: per word, MaxWordLen unrolled
    // DP positions (each keeping the (cost, prev)-minimal cell via a
    // window) then MaxWordLen path-walk steps re-assembling the pieces.
    // Shared by unigram_segment and unigram_counts.
    val unigramDp: String = {
      val maxW = graft.text.Unigram.MaxWordLen
      val maxT = graft.text.Unigram.maxTokenLen(graft.text.Unigram.seedVocab)
      val vocabVals = graft.text.Unigram.seedVocab
        .map { case (t, c) => s"('$t',$c)" }.mkString(",")
      val dps = (1 to maxW).map { i =>
        s"""d$i AS (SELECT word, $i AS i, cost, prev FROM (
           |  SELECT a.word, a.cost + v.c AS cost, a.i AS prev,
           |    row_number() OVER (PARTITION BY a.word ORDER BY a.cost + v.c, a.i) AS rn
           |  FROM a${i - 1} a JOIN voc v
           |    ON a.i >= $i - $maxT AND a.i < $i
           |   AND substr(a.word, a.i + 1, $i - a.i) = v.t
           |  WHERE length(a.word) >= $i) WHERE rn = 1),
           |a$i AS MATERIALIZED (SELECT * FROM a${i - 1} UNION ALL SELECT * FROM d$i)""".stripMargin
      }.mkString(",\n")
      val walks = (1 to maxW).map { k =>
        s"""p$k AS (SELECT p.word, p.cnt,
           |  CASE WHEN p.pos = 0 THEN 0 ELSE d.prev END AS pos,
           |  CASE WHEN p.pos = 0 THEN p.pieces
           |    ELSE substr(p.word, d.prev + 1, p.pos - d.prev) ||
           |      (CASE WHEN p.pieces = '' THEN '' ELSE ' ' END) || p.pieces END AS pieces,
           |  p.cost
           |  FROM p${k - 1} p LEFT JOIN a$maxW d
           |    ON p.word = d.word AND p.pos = d.i AND p.pos > 0)""".stripMargin
      }.mkString(",\n")
      // a$i AS MATERIALIZED: each cumulative DP relation is referenced
      // twice (next d and next a) — left inline, DuckDB re-expands the
      // chain into 2^MaxWordLen scans of the corpus ("too many open files")
      s"""WITH w AS MATERIALIZED (SELECT substr(tok, 1, $maxW) AS word, count(*) AS cnt FROM
         |  (SELECT unnest(${toks.format("text")}) AS tok FROM documents) GROUP BY 1),
         |voc(t, c) AS (VALUES $vocabVals),
         |a0 AS (SELECT word, 0 AS i, 0::BIGINT AS cost, -1 AS prev FROM w),
         |$dps,
         |fin AS (SELECT w.word, w.cnt, a.cost, a.i
         |  FROM w JOIN a$maxW a ON w.word = a.word AND a.i = length(w.word)),
         |p0 AS (SELECT word, cnt, length(word) AS pos, '' AS pieces, cost FROM fin),
         |$walks""".stripMargin
    }
    // HLL linear-counting table, precomputed once on the JVM and embedded
    // as literals so the oracle never calls engine-side ln
    val hllLcValues = (1 to graft.sketch.Sketches.HllM)
      .map(v => s"($v,${graft.sketch.Sketches.hllLinearCounting(v)})").mkString(",")
    // temporal-join fixture: clicks + (user, ts)-unique purchase rollup,
    // kept in lockstep with SparkEntry.asofFixture
    val asofCte =
      """e AS (SELECT event_id, user_id, epoch_us(ts) AS us, event_type, value FROM events),
        |c AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, us AS pus,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS purchase_cents
        |  FROM e WHERE event_type = 'purchase' GROUP BY 1, 2)""".stripMargin
    def hash32(e: String) = s"('0x'||substr(md5($e),1,8))::BIGINT"
    // n-gram Jaccard pair CTE chain (same derivation as the ngram_jaccard
    // oracle, ending in `pairs(id_a, id_b)` at threshold 0.2) — shared by
    // the connected-component cluster queries
    lazy val jacPairs =
      s"""t AS (SELECT doc_id, $docText AS t2 FROM documents),
         |tok AS (SELECT doc_id, ${toks.format("t2")} AS toks FROM t),
         |sh AS (SELECT doc_id,
         |  list_distinct(list_transform(range(len(toks)-2), i -> toks[i+1]||' '||toks[i+2]||' '||toks[i+3])) AS shl
         |  FROM tok WHERE len(toks) >= 3),
         |rows_ AS (SELECT doc_id, ${hash60("s")} AS sh FROM (SELECT doc_id, unnest(shl) AS s FROM sh)),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM rows_ GROUP BY 1),
         |common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
         |  FROM rows_ a JOIN rows_ b ON a.sh=b.sh AND a.doc_id < b.doc_id GROUP BY 1,2),
         |pairs AS (SELECT id_a, id_b
         |  FROM common JOIN sizes sa ON sa.doc_id=id_a JOIN sizes sb ON sb.doc_id=id_b
         |  WHERE round(c::DOUBLE/(sa.sz + sb.sz - c)::DOUBLE, 6) >= 0.2)""".stripMargin
    val f1 =
      "(NOT (contains(upper(%s),'EXAMPLE') OR contains(upper(%s),'CALCULATION') OR " +
        "contains(upper(%s),'HOW TO') OR contains(upper(%s),'SAMPLE') OR " +
        "contains(upper(%s),'ILLUSTRATION'))) AND " +
        "len(list_filter(regexp_extract_all(%s,'\\$\\s*([0-9,]+)',1), " +
        "x -> coalesce(try_cast(replace(x,',','') AS BIGINT),0) >= 200)) > 0"
    def f1On(c: String) = f1.replace("%s", c)
    val islands =
      """WITH hits AS (SELECT DISTINCT l_orderkey AS k, l_linenumber::BIGINT AS page
        |  FROM lineitem WHERE l_quantity >= 45),
        |dom AS (SELECT l_orderkey AS k, min(l_linenumber)::BIGINT AS mn,
        |  max(l_linenumber)::BIGINT AS mx FROM lineitem GROUP BY 1),
        |r AS (SELECT DISTINCT h.k, greatest(d.mn, h.page-1) AS s, least(d.mx, h.page+1) AS e
        |  FROM hits h JOIN dom d ON h.k=d.k),
        |w AS (SELECT k, s, e, max(e) OVER (PARTITION BY k ORDER BY s, e
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe FROM r),
        |g AS (SELECT k, s, e, sum(CASE WHEN pe IS NULL OR s > pe+1 THEN 1 ELSE 0 END)
        |  OVER (PARTITION BY k ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND
        |  CURRENT ROW) AS grp FROM w)
        |SELECT k, min(s) AS range_start, max(e) AS range_end FROM g GROUP BY k, grp""".stripMargin
    // sequential BPE replay — shared by bpe_merges AND bpe_batch (the
    // batched trainer is rule-for-rule identical by construction)
    val bpeMergesSql =
      s"""WITH tok AS (SELECT unnest(${toks.format("text")}) AS w FROM documents),
         |v0 AS (SELECT w AS word, count(*) AS cnt,
         |  list_filter(string_split(w, ''), x -> x <> '') AS syms FROM tok GROUP BY 1),
         |p1 AS (SELECT syms[j+1] AS l, syms[j+2] AS r, sum(cnt) AS pc
         |  FROM v0, unnest(range(len(syms)-1)) AS t(j) GROUP BY 1, 2),
         |b1 AS (SELECT l, r, pc FROM p1 ORDER BY pc DESC, l, r LIMIT 1),
         |v1 AS (SELECT word, cnt,
         |  regexp_extract_all(replace('['||array_to_string(syms,'][')||']',
         |    '['||b1.l||']['||b1.r||']', '['||b1.l||b1.r||']'), '\\[([^\\]]*)\\]', 1) AS syms
         |  FROM v0, b1),
         |p2 AS (SELECT syms[j+1] AS l, syms[j+2] AS r, sum(cnt) AS pc
         |  FROM v1, unnest(range(len(syms)-1)) AS t(j) GROUP BY 1, 2),
         |b2 AS (SELECT l, r, pc FROM p2 ORDER BY pc DESC, l, r LIMIT 1),
         |v2 AS (SELECT word, cnt,
         |  regexp_extract_all(replace('['||array_to_string(syms,'][')||']',
         |    '['||b2.l||']['||b2.r||']', '['||b2.l||b2.r||']'), '\\[([^\\]]*)\\]', 1) AS syms
         |  FROM v1, b2),
         |p3 AS (SELECT syms[j+1] AS l, syms[j+2] AS r, sum(cnt) AS pc
         |  FROM v2, unnest(range(len(syms)-1)) AS t(j) GROUP BY 1, 2),
         |b3 AS (SELECT l, r, pc FROM p3 ORDER BY pc DESC, l, r LIMIT 1)
         |SELECT 1::BIGINT AS round, l AS lhs, r AS rhs, pc::BIGINT AS pair_count FROM b1
         |UNION ALL SELECT 2::BIGINT, l, r, pc::BIGINT FROM b2
         |UNION ALL SELECT 3::BIGINT, l, r, pc::BIGINT FROM b3""".stripMargin

    Map(
      "q1_agg" ->
        """SELECT l_returnflag, l_linestatus,
          |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
          |  CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
          |  count(*) AS count_order
          |FROM lineitem GROUP BY 1, 2""".stripMargin,

      "q3_top_orders" ->
        """SELECT l_orderkey,
          |  CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
          |FROM lineitem GROUP BY 1 ORDER BY revenue_cents DESC, l_orderkey LIMIT 10""".stripMargin,

      "region_order_counts" ->
        """SELECT r_name, count(*) AS n_orders,
          |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
          |FROM orders JOIN customer ON o_custkey=c_custkey
          |JOIN nation ON c_nationkey=n_nationkey
          |JOIN region ON n_regionkey=r_regionkey GROUP BY 1""".stripMargin,

      "top3_orders_per_customer" ->
        """SELECT o_custkey, o_orderkey,
          |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)::BIGINT AS rnk
          |FROM orders QUALIFY rnk <= 3""".stripMargin,

      "topk_native" ->
        """SELECT o_custkey, o_orderkey FROM (
          |  SELECT o_custkey, o_orderkey,
          |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
          |  FROM orders) WHERE rn <= 3""".stripMargin,

      "topk_rewrite" ->
        """SELECT o_custkey, o_orderkey FROM (
          |  SELECT o_custkey, o_orderkey,
          |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
          |  FROM orders) WHERE rn <= 3""".stripMargin,

      "sessionize" ->
        """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
          |l AS (SELECT user_id, us, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM e),
          |s AS (SELECT user_id, us, CASE WHEN prev IS NULL OR us-prev > 1800000000 THEN 1 ELSE 0 END AS ns FROM l),
          |g AS (SELECT user_id, us, sum(ns) OVER (PARTITION BY user_id ORDER BY us
          |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess FROM s)
          |SELECT user_id, min(us) AS session_start_us, max(us) AS session_end_us,
          |  count(*) AS n_events FROM g GROUP BY user_id, sess""".stripMargin,

      "event_type_stats" ->
        """SELECT event_type, count(*) AS n,
          |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
          |FROM events GROUP BY 1""".stripMargin,

      // no join at all: if the salted join dropped or duplicated any row,
      // n or the weighted sum diverges
      "salted_join" ->
        """SELECT event_type, count(*) AS n,
          |  CAST(sum(CAST(round(value*100) AS BIGINT) * length(event_type)) AS BIGINT)
          |    AS weighted_cents
          |FROM events GROUP BY 1""".stripMargin,

      "bucket_join" ->
        """SELECT c_nationkey, count(*) AS n_orders,
          |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS price_cents
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |GROUP BY 1""".stripMargin,

      // independent-engine check: DuckDB's native ASOF LEFT JOIN vs our
      // union-and-forward-fill — same backward (>=, ties match) semantics
      "asof_join" ->
        s"""WITH $asofCte
           |SELECT c.event_id, c.user_id, c.us, p.pus AS matched_pus, p.purchase_cents
           |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.us >= p.pus""".stripMargin,

      "asof_tolerance" ->
        s"""WITH $asofCte,
           |j AS (SELECT c.event_id, c.user_id, c.us, p.pus, p.purchase_cents
           |  FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.us >= p.pus)
           |SELECT event_id, user_id, us,
           |  CASE WHEN us - pus <= 3600000000 THEN pus END AS matched_pus,
           |  CASE WHEN us - pus <= 3600000000 THEN purchase_cents END AS purchase_cents
           |FROM j""".stripMargin,

      "range_join" ->
        s"""WITH $asofCte
           |SELECT c.event_id, c.user_id, c.us, p.pus AS win_start
           |FROM c JOIN p ON c.user_id = p.user_id
           |  AND c.us BETWEEN p.pus AND p.pus + 86400000000""".stripMargin,

      "interval_overlap" ->
        """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS us, event_type FROM events),
          |l AS (SELECT event_id AS lid, user_id AS lk, us AS ls,
          |  us + (event_id%50)*60000000 AS le FROM ev WHERE event_type='click'),
          |r AS (SELECT event_id AS rid, user_id AS rk, us AS rs,
          |  us + (event_id%30)*60000000 AS re FROM ev WHERE event_type='purchase')
          |SELECT lid, rid,
          |  (least(le, re) - greatest(ls, rs))::BIGINT AS overlap_micros
          |FROM l JOIN r ON lk = rk AND ls <= re AND rs <= le""".stripMargin,

      "f1_dollar_filter" ->
        s"""WITH t AS (SELECT l_orderkey, l_linenumber::BIGINT AS page, $pageText AS text FROM lineitem)
           |SELECT l_orderkey, page FROM t WHERE ${f1On("text")}""".stripMargin,

      "f2_keyword_filter" ->
        s"""WITH t AS (SELECT doc_id, $docText AS t2 FROM documents)
           |SELECT doc_id FROM t WHERE lower(t2) LIKE '%mortgagee%' OR lower(t2) LIKE '%additional interest%'
           | OR lower(t2) LIKE '%additional insured%' OR lower(t2) LIKE '%loss payee%'
           | OR lower(t2) LIKE '%loss payable%' OR lower(t2) LIKE '%lienholder%'
           | OR lower(t2) LIKE '%lien holder%' OR lower(t2) LIKE '%secured party%'
           | OR lower(t2) LIKE '%secured parties%' OR lower(t2) LIKE '%mortgage holder%'""".stripMargin,

      "f5_gibberish" ->
        s"""WITH t AS (SELECT doc_id, $docText AS t2 FROM documents),
           |m AS (SELECT doc_id, t2, substr(t2,1,500) AS s FROM t),
           |x AS (SELECT doc_id, t2, greatest(length(s),1)::DOUBLE AS n,
           |  (greatest(length(s),1) - (length(s) - length(regexp_replace(s,'\\s','','g'))))::DOUBLE AS nonws,
           |  (length(s) - length(regexp_replace(s,'[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]','','g')))::DOUBLE AS nonprint,
           |  (length(s) - length(regexp_replace(s,'[A-Za-z]','','g')))::DOUBLE AS eng,
           |  length(regexp_replace(regexp_replace(s,'[\\x00-\\x7F]','','g'),'[\\p{L}\\p{N}]','','g'))::DOUBLE AS weird
           |  FROM m)
           |SELECT doc_id,
           |  (t2 IS NULL OR length(regexp_replace(t2,'^\\s+|\\s+$$','','g')) < 10
           |   OR nonws/n < 0.1 OR nonprint/n > 0.3 OR eng/n < 0.2 OR weird/n > 0.3) AS is_gibberish
           |FROM x""".stripMargin,

      "f6_scrub" ->
        """SELECT doc_id,
          |  length(regexp_replace(regexp_replace(text || chr(1) || chr(2) || '  tail',
          |    '[\x00-\x08\x0B\x0C\x0E-\x1F]', ' ', 'g'), ' +', ' ', 'g'))::BIGINT AS clean_len
          |FROM documents""".stripMargin,

      "money_norm" ->
        """WITH v AS (SELECT p_partkey,
          |  (['$1,234','Included','2%','Inside $10,000 / Outside $10,000','','$ 500 ','no digits here','$0.00'])[(p_partkey%8)+1] AS raw
          |  FROM part)
          |SELECT p_partkey, raw,
          |  CASE WHEN raw IS NULL OR trim(raw)='' THEN NULL
          |    WHEN lower(trim(raw))='included' THEN 'Included'
          |    WHEN ends_with(trim(raw),'%') THEN trim(raw)
          |    WHEN contains(lower(trim(raw)),'inside') OR contains(lower(trim(raw)),'outside') THEN trim(raw)
          |    WHEN regexp_replace(trim(raw),'[^0-9]','','g')='' THEN NULL
          |    ELSE regexp_replace(trim(raw),'[^0-9]','','g') END AS normalized
          |FROM v""".stripMargin,

      "islands_merge" -> islands,

      "r2_neighbors" ->
        """SELECT DISTINCT l_orderkey AS k, (l_linenumber + off)::BIGINT AS page
          |FROM lineitem, unnest([-2,-1,0,1,2]) AS t(off)
          |WHERE l_quantity >= 45 AND l_linenumber + off >= 0""".stripMargin,

      "r4_range_slice" ->
        s"""WITH pages AS (SELECT DISTINCT l_orderkey AS k, l_linenumber::BIGINT AS page FROM lineitem),
           |ranges AS ($islands),
           |valid AS (SELECT r.* FROM ranges r
           |  WHERE EXISTS(SELECT 1 FROM pages p WHERE p.k=r.k AND p.page=r.range_start)
           |    AND EXISTS(SELECT 1 FROM pages p WHERE p.k=r.k AND p.page=r.range_end))
           |SELECT DISTINCT p.k, p.page FROM pages p JOIN valid v ON p.k=v.k
           |WHERE p.page BETWEEN v.range_start AND v.range_end""".stripMargin,

      "j1_interleave" ->
        """WITH a AS (SELECT l_orderkey AS k, l_linenumber::BIGINT AS page,
          |  'R:'||min(l_partkey) AS ocr_text FROM lineitem WHERE l_returnflag='R' GROUP BY 1,2),
          |b AS (SELECT l_orderkey AS k, l_linenumber::BIGINT AS page,
          |  'F:'||min(l_partkey) AS text_text FROM lineitem WHERE l_linestatus='F' GROUP BY 1,2)
          |SELECT coalesce(a.k, b.k) AS k, coalesce(a.page, b.page) AS page,
          |  coalesce(a.ocr_text, '[Page not found in ocr extraction]') AS ocr_text,
          |  coalesce(b.text_text, '[Page not found in text extraction]') AS text_text
          |FROM a FULL OUTER JOIN b ON a.k=b.k AND a.page=b.page""".stripMargin,

      "p2_first_wins" ->
        """SELECT l_orderkey AS k, (l_suppkey%3)::BIGINT AS page,
          |  l_linenumber::BIGINT AS winner_line
          |FROM lineitem
          |QUALIFY row_number() OVER (PARTITION BY l_orderkey, l_suppkey%3 ORDER BY l_linenumber) = 1""".stripMargin,

      "j2_three_way" ->
        """WITH t1 AS (SELECT l_orderkey AS doc_id, l_linenumber::BIGINT AS page,
          |  'T:'||min(l_partkey) AS txt FROM lineitem WHERE l_returnflag='R' GROUP BY 1,2),
          |t2 AS (SELECT l_orderkey AS doc_id, l_linenumber::BIGINT AS page,
          |  'X:'||min(l_partkey) AS txt FROM lineitem WHERE l_linestatus='F' GROUP BY 1,2),
          |t3 AS (SELECT l_orderkey AS doc_id, l_linenumber::BIGINT AS page,
          |  'O:'||min(l_partkey) AS txt FROM lineitem WHERE l_partkey%3=0 GROUP BY 1,2),
          |u AS (SELECT doc_id, page FROM t1 UNION SELECT doc_id, page FROM t2
          |  UNION SELECT doc_id, page FROM t3)
          |SELECT u.doc_id, u.page, 'table' AS kind, 0::BIGINT AS source_rank,
          |  coalesce(t1.txt, '[Page not found in table extraction]') AS text
          |FROM u LEFT JOIN t1 ON u.doc_id=t1.doc_id AND u.page=t1.page
          |UNION ALL
          |SELECT u.doc_id, u.page, 'text', 1::BIGINT,
          |  coalesce(t2.txt, '[Page not found in text extraction]')
          |FROM u LEFT JOIN t2 ON u.doc_id=t2.doc_id AND u.page=t2.page
          |UNION ALL
          |SELECT u.doc_id, u.page, 'ocr', 2::BIGINT,
          |  coalesce(t3.txt, '[Page not found in ocr extraction]')
          |FROM u LEFT JOIN t3 ON u.doc_id=t3.doc_id AND u.page=t3.page""".stripMargin,

      "f7_tier_invalid" ->
        """WITH t AS (SELECT doc_id,
          |  CASE WHEN doc_id%5=0 THEN repeat(chr(1),200) || text
          |       WHEN doc_id%7=0 THEN '' ELSE text END AS t2 FROM documents),
          |s AS (SELECT doc_id, t2, substr(t2,1,500) AS smp FROM t)
          |SELECT doc_id,
          |  (t2 IS NULL OR length(t2)=0 OR
          |   (length(smp) - length(regexp_replace(smp,'[\x00-\x08\x0B\x0C\x0E-\x1F]','','g')))::DOUBLE
          |     / greatest(length(smp),1) > 0.2) AS invalid
          |FROM s""".stripMargin,

      "f10_valid_value" ->
        """WITH v AS (SELECT p_partkey,
          |  (['TBD',' n/a ','NONE','','  ','CERT-42','tbd!','ok value '])[(p_partkey%8)+1] AS raw
          |  FROM part)
          |SELECT p_partkey, raw,
          |  CASE WHEN raw IS NULL OR upper(trim(raw)) IN ('TBD','N/A','NONE','')
          |    THEN NULL ELSE trim(raw) END AS valid_value
          |FROM v""".stripMargin,

      "a4_patch_total" ->
        """SELECT doc_id, len(string_split(text, ' '))::BIGINT AS total
          |FROM documents""".stripMargin,

      "p5_line_number" ->
        """WITH li AS (SELECT l_orderkey AS k, l_linenumber::INT AS page
          |  FROM lineitem GROUP BY 1, 2)
          |SELECT k, page::BIGINT AS page,
          |  (4*(row_number() OVER (PARTITION BY k ORDER BY page) - 1) + 2)::BIGINT AS line_no,
          |  page::BIGINT AS page_at
          |FROM li""".stripMargin,

      "p4_property_prune" ->
        """WITH pages AS (SELECT DISTINCT l_orderkey AS k, l_linenumber::BIGINT AS page,
          |  CASE WHEN l_partkey%5=0 THEN 'PROPERTY SECTION with Building details'
          |       WHEN l_partkey%5=1 THEN 'PROPERTY SECTION other'
          |       ELSE 'plain page' END AS text FROM lineitem),
          |hs AS (SELECT DISTINCT k FROM pages WHERE contains(text,'PROPERTY SECTION')),
          |fm AS (SELECT k, page AS mpage FROM pages
          |  WHERE page <> 1 AND contains(text,'PROPERTY SECTION')
          |    AND (contains(text,'Building') OR contains(text,'Business Income')
          |         OR contains(text,'Equipment Breakdown'))
          |  QUALIFY row_number() OVER (PARTITION BY k ORDER BY page) = 1),
          |pruned AS (SELECT DISTINCT p.k, p.page FROM pages p JOIN hs ON p.k=hs.k
          |  LEFT JOIN fm ON p.k=fm.k WHERE p.page=1 OR p.page=fm.mpage),
          |untouched AS (SELECT DISTINCT p.k, p.page FROM pages p
          |  WHERE p.k NOT IN (SELECT k FROM hs))
          |SELECT * FROM pruned UNION SELECT * FROM untouched""".stripMargin,

      "coverage_classify" ->
        """WITH v AS (SELECT p_partkey,
          |  (['Building','Building - Location 2','Building with Pumps & Canopy',
          |    'Business Personal Property','BPP','BPP In Transit',
          |    'Money & Securities','Counterfeit Money','Equipment Breakdown',
          |    'Equipment Breakdown Deductible','Outdoor Signs','Signs Description',
          |    'Employee Dishonesty','Pumps & Canopy','Pumps','Canopy',
          |    'Theft','Theft Deductible','Windstorm','Business Income'])[(p_partkey%20)+1] AS name
          |  FROM part),
          |n AS (SELECT p_partkey, name, lower(trim(name)) AS ln FROM v)
          |SELECT p_partkey, name,
          |  contains(ln,'building') AND NOT (contains(ln,'pump') AND contains(ln,'canopy')) AS is_building,
          |  (contains(ln,'business personal property') OR ln='bpp' OR starts_with(ln,'bpp ') OR ends_with(ln,' bpp'))
          |    AND NOT (contains(ln,'off premises') OR contains(ln,'off-premises') OR contains(ln,'away from premises')
          |      OR contains(ln,'in transit') OR contains(ln,'transit') OR contains(ln,'portable storage')
          |      OR contains(ln,'temporarily') OR contains(ln,'newly acquired') OR contains(ln,'newly constructed')
          |      OR contains(ln,'coverage extension') OR contains(ln,'extension')) AS is_bpp,
          |  ((contains(ln,'money') AND contains(ln,'secur')) OR contains(ln,'money & securities') OR contains(ln,'money and securities'))
          |    AND NOT (contains(ln,'counterfeit') OR contains(ln,'money orders') OR contains(ln,'forgery')
          |      OR contains(ln,'alteration') OR contains(ln,'funds transfer') OR contains(ln,'computer fraud')) AS is_money_securities,
          |  (contains(ln,'equipment breakdown') OR (contains(ln,'equip') AND contains(ln,'breakdown'))
          |      OR contains(ln,'boiler and machinery') OR contains(ln,'boiler & machinery'))
          |    AND NOT (contains(ln,'deductible') OR contains(ln,'ded.') OR contains(ln,'coinsurance')
          |      OR contains(ln,'waiting period') OR contains(ln,'waiting') OR contains(ln,'service interruption')) AS is_equipment_breakdown,
          |  (contains(ln,'outdoor sign') OR ln='signs' OR starts_with(ln,'signs ') OR ends_with(ln,' signs'))
          |    AND NOT (contains(ln,'deductible') OR contains(ln,'ded.') OR contains(ln,'coinsurance')
          |      OR contains(ln,'waiting period') OR contains(ln,'waiting') OR contains(ln,'description')) AS is_outdoor_signs,
          |  (contains(ln,'employee dishonesty') OR (contains(ln,'employee') AND contains(ln,'dishon')) OR ln='dishonesty')
          |    AND NOT (contains(ln,'deductible') OR contains(ln,'ded.') OR contains(ln,'coinsurance')
          |      OR contains(ln,'waiting period') OR contains(ln,'waiting') OR contains(ln,'description')) AS is_employee_dishonesty,
          |  contains(ln,'theft') AND NOT contains(ln,'deductible') AND NOT contains(ln,'ded.') AS is_theft,
          |  ((contains(ln,'wind') AND contains(ln,'hail')) OR contains(ln,'windstorm'))
          |    AND NOT contains(ln,'deductible') AND NOT contains(ln,'ded.') AS is_wind_hail,
          |  contains(ln,'business income') AND NOT contains(ln,'deductible')
          |    AND NOT contains(ln,'ded.') AND NOT contains(ln,'waiting') AS is_business_income,
          |  (CASE WHEN contains(ln,'building') AND contains(ln,'pump') AND contains(ln,'canopy') THEN 1
          |    WHEN contains(ln,'pump') AND contains(ln,'canopy') THEN 2
          |    WHEN ln IN ('pumps','pump') OR starts_with(ln,'pumps ') OR ends_with(ln,' pumps')
          |      OR ln IN ('canopy','canopies') OR starts_with(ln,'canopy ')
          |      OR ends_with(ln,' canopy') OR ends_with(ln,' canopies') THEN 3
          |    ELSE 0 END)::BIGINT AS pc_level
          |FROM n""".stripMargin,

      "c7_precedence" ->
        """WITH v AS (SELECT p_partkey,
          |  lower(trim((['Building with Pumps & Canopy','Pumps & Canopy','Pumps','Canopy','Building','Theft'])[(p_partkey%6)+1])) AS ln
          |  FROM part),
          |l AS (SELECT p_partkey%30 AS grp,
          |  (CASE WHEN contains(ln,'building') AND contains(ln,'pump') AND contains(ln,'canopy') THEN 1
          |    WHEN contains(ln,'pump') AND contains(ln,'canopy') THEN 2
          |    WHEN ln IN ('pumps','pump') OR starts_with(ln,'pumps ') OR ends_with(ln,' pumps')
          |      OR ln IN ('canopy','canopies') OR starts_with(ln,'canopy ')
          |      OR ends_with(ln,' canopy') OR ends_with(ln,' canopies') THEN 3
          |    ELSE 0 END)::BIGINT AS lvl FROM v)
          |SELECT grp, min(CASE WHEN lvl > 0 THEN lvl END) AS winning_level
          |FROM l GROUP BY 1""".stripMargin,

      "gl_limits_extract" ->
        """WITH t AS (SELECT c_custkey,
          |  'POLICY NUMBER: POL-'||c_custkey||chr(10)||
          |  'EACH OCCURRENCE LIMIT  $ 1,000,000'||chr(10)||
          |  'GENERAL AGGREGATE LIMIT  $ '||((c_custkey%4)+1)||',000,000'||chr(10)||
          |  (CASE WHEN c_custkey%3=0 THEN 'MED EXP (Any one person) $ 5,000'||chr(10) ELSE '' END) AS text
          |  FROM customer)
          |SELECT c_custkey,
          |  nullif(regexp_extract(text,'(?i)POLICY\s+(?:NUMBER|NO\.?|#)\s*[:_]?\s*([A-Z0-9\-_]+)',1),'') AS policy_number,
          |  nullif(regexp_extract(text,'(?i)EACH\s+OCCURRENCE\s+LIMIT[^\$]*\$?\s*([0-9,]+)',1),'') AS each_occurrence,
          |  coalesce(
          |    nullif(regexp_extract(text,'(?i)GENERAL\s+AGGREGATE\s+LIMIT\s*\([^\)]*\)[^\$]*\$\.?\s*([0-9,]+)',1),''),
          |    nullif(regexp_extract(text,'(?i)GENERAL\s+AGGREGATE\s+LIMIT[^\$]*\$\.?\s*([0-9,]+)',1),''),
          |    nullif(regexp_extract(text,'(?i)GENERAL\s+AGGREGATE[^\$]*\$\.?\s*([0-9,]+)',1),'')) AS general_aggregate,
          |  coalesce(
          |    nullif(regexp_extract(text,'(?i)MED\s+EXP[^\$]*\$?\s*([0-9,]+)',1),''),
          |    nullif(regexp_extract(text,'(?i)MEDICAL\s+EXPENSE\s+LIMIT[^\$]*\$?\s*([0-9,]+)',1),''),
          |    nullif(regexp_extract(text,'(?i)MEDICAL\s+EXPENSE[^\$]*\$?\s*([0-9,]+)',1),'')) AS med_exp
          |FROM t""".stripMargin,

      "gl_section_limits" ->
        """WITH sec AS (SELECT c_custkey,
          |  (['commercial_general_liability','umbrella_liability',
          |    'employment_practices_liability','liquor_liability'])[(c_custkey%4)+1] AS section
          |  FROM customer),
          |keys AS (SELECT * FROM (VALUES
          |  ('commercial_general_liability',0,'each_occurrence','Each Occurrence'),
          |  ('commercial_general_liability',1,'damage_to_rented_premises','Damage to Rented Premises (Ea occurrence)'),
          |  ('commercial_general_liability',2,'med_exp','Med Exp (Any one person)'),
          |  ('commercial_general_liability',3,'personal_adv_injury','Personal & Adv Injury'),
          |  ('commercial_general_liability',4,'general_aggregate','General Aggregate'),
          |  ('commercial_general_liability',5,'products_comp_op_agg','Products - Comp/Op Agg'),
          |  ('umbrella_liability',0,'each_occurrence','Umbrella Each Occurrence'),
          |  ('umbrella_liability',1,'aggregate','Umbrella Aggregate'),
          |  ('employment_practices_liability',0,'each_limit','EPL Each Limit'),
          |  ('employment_practices_liability',1,'aggregate_limit','EPL Aggregate Limit'),
          |  ('liquor_liability',0,'each_limit','Liquor Liability Each Limit'),
          |  ('liquor_liability',1,'aggregate_limit','Liquor Liability Aggregate Limit'))
          |  t(section, i, limit_key, limit_label)),
          |j AS (SELECT c_custkey, k.section, k.limit_key, k.limit_label,
          |  (['$1,000,000','$0.00','','$',NULL,' $2,000,000 '])[((c_custkey + i)%6)+1] AS raw
          |  FROM sec s JOIN keys k ON s.section=k.section)
          |SELECT c_custkey, section AS coverage_section, limit_key, limit_label,
          |  CASE WHEN trim(raw) IN ('$','$0.00','$ 0.00') THEN '$0' ELSE trim(raw) END AS value
          |FROM j WHERE raw IS NOT NULL AND trim(raw) <> ''""".stripMargin,

      "c15_presence_list" ->
        """WITH keys AS (SELECT * FROM (VALUES
          |  ('commercial_general_liability','Commercial General Liability',0),
          |  ('automobile_liability','Automobile Liability',1),
          |  ('umbrella_liability','Umbrella Liability',2),
          |  ('excess_liability','Excess Liability',3),
          |  ('workers_compensation','Workers Compensation',4),
          |  ('employment_practices_liability','Employment Practices Liability',5),
          |  ('liquor_liability','Liquor Liability',6),
          |  ('garagekeepers_liability','Garagekeepers Liability',7))
          |  t(coverage_key, coverage_name, i)),
          |p AS (SELECT c_custkey, coverage_key, coverage_name,
          |  CASE WHEN (c_custkey+i)%4=0 THEN '' ELSE 'PN-'||c_custkey||'-'||i END AS policy_number,
          |  '01/01/2025' AS policy_eff,
          |  CASE WHEN (c_custkey+i)%5=0 THEN NULL ELSE '01/01/2026' END AS policy_exp
          |  FROM customer, keys WHERE (c_custkey + i)%3 <> 0)
          |SELECT c_custkey, coverage_key, coverage_name, policy_number, policy_eff, policy_exp
          |FROM p WHERE policy_number <> ''""".stripMargin,

      "c16_interests" ->
        """SELECT c_custkey, 0::BIGINT AS idx, 'Bank '||c_custkey AS name,
          |  c_custkey||' Main St' AS address FROM customer WHERE c_custkey%4=0
          |UNION ALL SELECT c_custkey, 1::BIGINT, 'Lender '||c_custkey, '' FROM customer WHERE c_custkey%4=0
          |UNION ALL SELECT c_custkey, 0::BIGINT, 'Sole Interest '||c_custkey,
          |  c_custkey||' Oak Ave' FROM customer WHERE c_custkey%4=1""".stripMargin,

      "prop_table_extract" ->
        """WITH t AS (SELECT c_custkey AS k,
          |  (CASE WHEN c_custkey%5=0 THEN 'BUILDING: 750,000'||chr(10)
          |        WHEN c_custkey%3<>2 THEN 'BUILDING AMOUNT OF INSURANCE: '||(c_custkey%9+1)||',000'||chr(10) ELSE '' END)||
          |  (CASE WHEN c_custkey%4<>3 THEN 'BUILDING DEDUCTIBLE: '||(CASE WHEN c_custkey%5=0 THEN (c_custkey%3+1)||'%' ELSE '1,'||(c_custkey%9)||'00' END)||chr(10) ELSE '' END)||
          |  (CASE WHEN (c_custkey+1)%3<>2 THEN 'BUSINESS PERSONAL PROPERTY AMOUNT OF INSURANCE: '||((c_custkey+1)%9+1)||',000'||chr(10) ELSE '' END)||
          |  (CASE WHEN (c_custkey+1)%4<>3 THEN 'BUSINESS PERSONAL PROPERTY DEDUCTIBLE: '||(CASE WHEN (c_custkey+1)%5=0 THEN ((c_custkey+1)%3+1)||'%' ELSE '1,'||((c_custkey+1)%9)||'00' END)||chr(10) ELSE '' END)||
          |  (CASE WHEN (c_custkey+2)%3<>2 THEN 'BUSINESS INCOME AMOUNT OF INSURANCE: '||(CASE WHEN (c_custkey+2)%2=0 THEN 'ACTUAL LOSS SUSTAINED' ELSE ((c_custkey+2)%9+1)||',000' END)||chr(10) ELSE '' END)||
          |  (CASE WHEN (c_custkey+2)%4<>3 THEN 'BUSINESS INCOME DEDUCTIBLE: '||(CASE WHEN (c_custkey+2)%5=0 THEN ((c_custkey+2)%3+1)||'%' ELSE '1,'||((c_custkey+2)%9)||'00' END)||chr(10) ELSE '' END)||
          |  (CASE WHEN (c_custkey+3)%3<>2 THEN 'EQUIPMENT BREAKDOWN AMOUNT OF INSURANCE: '||(CASE WHEN (c_custkey+3)%2=0 THEN 'INCLUDED' ELSE ((c_custkey+3)%9+1)||',000' END)||chr(10) ELSE '' END)||
          |  (CASE WHEN (c_custkey+3)%4<>3 THEN 'EQUIPMENT BREAKDOWN DEDUCTIBLE: '||(CASE WHEN (c_custkey+3)%5=0 THEN ((c_custkey+3)%3+1)||'%' ELSE '1,'||((c_custkey+3)%9)||'00' END)||chr(10) ELSE '' END)||
          |  (CASE WHEN (c_custkey+4)%3<>2 THEN 'EMPLOYEE DISHONESTY AMOUNT OF INSURANCE: '||((c_custkey+4)%9+1)||',000'||chr(10) ELSE '' END)||
          |  (CASE WHEN (c_custkey+4)%4<>3 THEN 'EMPLOYEE DISHONESTY DEDUCTIBLE: '||(CASE WHEN (c_custkey+4)%5=0 THEN ((c_custkey+4)%3+1)||'%' ELSE '1,'||((c_custkey+4)%9)||'00' END)||chr(10) ELSE '' END)||
          |  (CASE WHEN (c_custkey+5)%3<>2 THEN 'MONEY & SECURITIES AMOUNT OF INSURANCE: '||((c_custkey+5)%9+1)||',000'||chr(10) ELSE '' END)||
          |  (CASE WHEN (c_custkey+5)%4<>3 THEN 'MONEY & SECURITIES DEDUCTIBLE: '||(CASE WHEN (c_custkey+5)%5=0 THEN ((c_custkey+5)%3+1)||'%' ELSE '1,'||((c_custkey+5)%9)||'00' END)||chr(10) ELSE '' END)||
          |  (CASE WHEN (c_custkey+6)%3<>2 THEN 'PUMPS & CANOPY AMOUNT OF INSURANCE: '||((c_custkey+6)%9+1)||',000'||chr(10) ELSE '' END)||
          |  (CASE WHEN (c_custkey+6)%4<>3 THEN 'PUMPS & CANOPY DEDUCTIBLE: '||(CASE WHEN (c_custkey+6)%5=0 THEN ((c_custkey+6)%3+1)||'%' ELSE '1,'||((c_custkey+6)%9)||'00' END)||chr(10) ELSE '' END)||
          |  (CASE WHEN (c_custkey+7)%3<>2 THEN 'OUTDOOR SIGNS AMOUNT OF INSURANCE: '||((c_custkey+7)%9+1)||',000'||chr(10) ELSE '' END)||
          |  (CASE WHEN (c_custkey+7)%4<>3 THEN 'OUTDOOR SIGNS DEDUCTIBLE: '||(CASE WHEN (c_custkey+7)%5=0 THEN ((c_custkey+7)%3+1)||'%' ELSE '1,'||((c_custkey+7)%9)||'00' END)||chr(10) ELSE '' END)||
          |  (CASE WHEN (c_custkey+8)%3<>2 THEN 'WINDSTORM OR HAIL AMOUNT OF INSURANCE: '||((c_custkey+8)%9+1)||',000'||chr(10) ELSE '' END)||
          |  (CASE WHEN (c_custkey+8)%4<>3 THEN 'WINDSTORM OR HAIL DEDUCTIBLE: '||(CASE WHEN (c_custkey+8)%5=0 THEN ((c_custkey+8)%3+1)||'%' ELSE '1,'||((c_custkey+8)%9)||'00' END)||chr(10) ELSE '' END)
          |  AS ptext FROM customer)
          |SELECT k AS c_custkey, ptext,
          |  coalesce(nullif(regexp_extract(ptext,'(?i)BUILDING[^\d]*AMOUNT\s+OF\s+INSURANCE[:\s]*([0-9,]+|INCLUDED)',1),''),
          |           nullif(regexp_extract(ptext,'(?i)BUILDING[:\s]*([0-9,]+)',1),'')) AS building_amt,
          |  coalesce(nullif(regexp_extract(ptext,'(?i)BUILDING[^\d]*DEDUCTIBLE[:\s]*([0-9,]+|[\d%]+)',1),''),
          |           nullif(regexp_extract(ptext,'(?i)(?s)BUILDING.*?DEDUCTIBLE[:\s]*([0-9,]+|[\d%]+)',1),'')) AS building_ded,
          |  coalesce(nullif(regexp_extract(ptext,'(?i)BUSINESS\s+PERSONAL\s+PROPERTY[^\d]*AMOUNT\s+OF\s+INSURANCE[:\s]*([0-9,]+|INCLUDED)',1),''),
          |           nullif(regexp_extract(ptext,'(?i)BUSINESS\s+PERSONAL\s+PROPERTY[:\s]*([0-9,]+)',1),'')) AS business_personal_property_amt,
          |  nullif(regexp_extract(ptext,'(?i)BUSINESS\s+PERSONAL\s+PROPERTY[^\d]*DEDUCTIBLE[:\s]*([0-9,]+|[\d%]+)',1),'') AS business_personal_property_ded,
          |  coalesce(nullif(regexp_extract(ptext,'(?i)BUSINESS\s+INCOME[^\d]*AMOUNT\s+OF\s+INSURANCE[:\s]*([0-9,]+|ACTUAL\s+LOSS\s+SUSTAINED|INCLUDED)',1),''),
          |           nullif(regexp_extract(ptext,'(?i)BUSINESS\s+INCOME[:\s]*([0-9,]+|ACTUAL\s+LOSS)',1),'')) AS business_income_amt,
          |  nullif(regexp_extract(ptext,'(?i)BUSINESS\s+INCOME[^\d]*DEDUCTIBLE[:\s]*([0-9,]+|[\d%]+)',1),'') AS business_income_ded,
          |  nullif(regexp_extract(ptext,'(?i)EQUIPMENT\s+BREAKDOWN[^\d]*AMOUNT\s+OF\s+INSURANCE[:\s]*([0-9,]+|INCLUDED)',1),'') AS equipment_breakdown_amt,
          |  nullif(regexp_extract(ptext,'(?i)EQUIPMENT\s+BREAKDOWN[^\d]*DEDUCTIBLE[:\s]*([0-9,]+|[\d%]+)',1),'') AS equipment_breakdown_ded,
          |  nullif(regexp_extract(ptext,'(?i)EMPLOYEE\s+DISHONESTY[^\d]*AMOUNT\s+OF\s+INSURANCE[:\s]*([0-9,]+|INCLUDED)',1),'') AS employee_dishonesty_amt,
          |  nullif(regexp_extract(ptext,'(?i)EMPLOYEE\s+DISHONESTY[^\d]*DEDUCTIBLE[:\s]*([0-9,]+|[\d%]+)',1),'') AS employee_dishonesty_ded,
          |  nullif(regexp_extract(ptext,'(?i)MONEY\s+[&]?\s*SECURITIES[^\d]*AMOUNT\s+OF\s+INSURANCE[:\s]*([0-9,]+|INCLUDED)',1),'') AS money_securities_amt,
          |  nullif(regexp_extract(ptext,'(?i)MONEY\s+[&]?\s*SECURITIES[^\d]*DEDUCTIBLE[:\s]*([0-9,]+|[\d%]+)',1),'') AS money_securities_ded,
          |  nullif(regexp_extract(ptext,'(?i)PUMPS\s+[&]?\s*CANOPY[^\d]*AMOUNT\s+OF\s+INSURANCE[:\s]*([0-9,]+|INCLUDED)',1),'') AS pumps_canopy_amt,
          |  nullif(regexp_extract(ptext,'(?i)PUMPS\s+[&]?\s*CANOPY[^\d]*DEDUCTIBLE[:\s]*([0-9,]+|[\d%]+)',1),'') AS pumps_canopy_ded,
          |  nullif(regexp_extract(ptext,'(?i)OUTDOOR\s+SIGNS[^\d]*AMOUNT\s+OF\s+INSURANCE[:\s]*([0-9,]+|INCLUDED)',1),'') AS outdoor_signs_amt,
          |  nullif(regexp_extract(ptext,'(?i)OUTDOOR\s+SIGNS[^\d]*DEDUCTIBLE[:\s]*([0-9,]+|[\d%]+)',1),'') AS outdoor_signs_ded,
          |  nullif(regexp_extract(ptext,'(?i)WINDSTORM\s+OR\s+HAIL[^\d]*AMOUNT\s+OF\s+INSURANCE[:\s]*([0-9,]+|INCLUDED)',1),'') AS windstorm_hail_amt,
          |  nullif(regexp_extract(ptext,'(?i)WINDSTORM\s+OR\s+HAIL[^\d]*DEDUCTIBLE[:\s]*([0-9,]+|[\d%]+)',1),'') AS windstorm_hail_ded
          |FROM t""".stripMargin,

      "perils_flags" ->
        """WITH t AS (SELECT c_custkey,
          |  (CASE WHEN c_custkey%2=0 THEN 'Covered Causes of Loss: BASIC'||chr(10) ELSE '' END)||
          |  (CASE WHEN c_custkey%4=1 THEN 'BASICALLY unrelated words'||chr(10) ELSE '' END)||
          |  (CASE WHEN c_custkey%3=0 THEN 'BROAD form applies'||chr(10) ELSE '' END)||
          |  (CASE WHEN c_custkey%5<>1 THEN 'SPECIAL causes of loss included'||chr(10) ELSE '' END)||
          |  (CASE WHEN c_custkey%7=0 THEN 'valued at REPLACEMENT COST' ELSE 'actual cash value' END)||chr(10)
          |  AS ptext FROM customer)
          |SELECT c_custkey, ptext,
          |  regexp_matches(ptext,'(?i)\bBASIC\b') AS peril_basic,
          |  regexp_matches(ptext,'(?i)\bBROAD\b') AS peril_broad,
          |  regexp_matches(ptext,'(?i)\bSPECIAL\b') AS peril_special,
          |  regexp_matches(ptext,'(?i)REPLACEMENT\s+COST') AS peril_replacement_cost
          |FROM t""".stripMargin,

      "insured_dba" ->
        """WITH t AS (SELECT c_custkey,
          |  CASE WHEN c_custkey%4=0 THEN 'POLICY NUMBER: POL-'||c_custkey||chr(10)||'NAMED INSURED: Acme Holdings '||c_custkey||' DBA: Joes Diner '||c_custkey
          |       WHEN c_custkey%4=1 THEN 'NAMED INSURED: Solo Corp '||c_custkey||chr(10)||'Second Line Inc'
          |       WHEN c_custkey%4=2 THEN 'INSURED: Fallback LLC '||c_custkey||' dba Side Biz '||c_custkey
          |       ELSE 'no insured block here' END AS ptext FROM customer),
          |r AS (SELECT c_custkey, coalesce(
          |    nullif(regexp_extract(ptext,'(?i)NAMED\s+INSURED[:\s]+([^\n]+(?:\n[^\n]+){0,3})',1),''),
          |    nullif(regexp_extract(ptext,'(?i)INSURED[:\s]+([^\n]+(?:\n[^\n]+){0,2})',1),'')) AS insured_raw
          |  FROM t)
          |SELECT c_custkey, insured_raw,
          |  CASE WHEN contains(upper(trim(insured_raw)),'DBA')
          |    THEN trim(regexp_split_to_array(trim(insured_raw),'(?i)\s+DBA\s*:?\s*')[1])
          |    ELSE trim(insured_raw) END AS named_insured,
          |  CASE WHEN contains(upper(trim(insured_raw)),'DBA')
          |      AND len(regexp_split_to_array(trim(insured_raw),'(?i)\s+DBA\s*:?\s*'))>1
          |    THEN trim(regexp_split_to_array(trim(insured_raw),'(?i)\s+DBA\s*:?\s*')[2])
          |    END AS dba
          |FROM r""".stripMargin,

      "head_dates" ->
        """WITH t AS (SELECT c_custkey,
          |  (CASE WHEN c_custkey%3=0 THEN 'EFFECTIVE DATE: 01/15/2025'||chr(10)||'EXPIRATION DATE: 01/15/2026'||chr(10)||'ISSUE DATE: 12/0'||(c_custkey%9+1)||'/2024'||chr(10)
          |        WHEN c_custkey%3=1 THEN 'coverage runs FROM 03/01/2025 TO 03/01/2026'||chr(10)
          |        ELSE 'POLICY EXP: 07/04/2027'||chr(10) END)||
          |  (CASE WHEN c_custkey%2=0 THEN 'MAILING ADDRESS: '||c_custkey||' Main St'||chr(10)||'Suite 12'
          |        ELSE 'ADDRESS: '||c_custkey||' Oak Ave' END) AS ptext FROM customer)
          |SELECT c_custkey,
          |  regexp_replace(trim(coalesce(
          |    nullif(regexp_extract(ptext,'(?i)MAILING\s+ADDRESS[:\s]+([^\n]+(?:\n[^\n]+){0,2})',1),''),
          |    nullif(regexp_extract(ptext,'(?i)ADDRESS[:\s]+([^\n]+(?:\n[^\n]+){0,2})',1),''))),'\s+',' ','g') AS mailing_address,
          |  coalesce(
          |    nullif(regexp_extract(ptext,'(?i)EFFECTIVE\s+DATE[:\s]+([0-9\/\-]+)',1),''),
          |    nullif(regexp_extract(ptext,'(?i)FROM\s+([0-9\/\-]+)\s+TO\s+[0-9\/\-]+',1),'')) AS effective_date,
          |  coalesce(
          |    nullif(regexp_extract(ptext,'(?i)EXPIRATION\s+DATE[:\s]+([0-9\/\-]+)',1),''),
          |    nullif(regexp_extract(ptext,'(?i)POLICY\s+EXP[:\s]+([0-9\/\-]+)',1),''),
          |    nullif(regexp_extract(ptext,'(?i)FROM\s+[0-9\/\-]+\s+TO\s+([0-9\/\-]+)',1),'')) AS expiration_date,
          |  nullif(regexp_extract(ptext,'(?i)ISSUE\s+DATE[:\s]+([0-9\/\-]+)',1),'') AS issue_date
          |FROM t""".stripMargin,

      "policy_probes" ->
        """WITH t AS (SELECT c_custkey,
          |  (CASE WHEN c_custkey%3=0 THEN 'GENERAL AGGREGATE LIMIT APPLIES PER: POLICY'||chr(10)
          |        WHEN c_custkey%3=1 THEN 'AGGREGATE LIMIT APPLIES PER LOCATION'||chr(10) ELSE '' END)||
          |  (CASE WHEN c_custkey%2=0 THEN 'Class 1 rating basis'||chr(10)||'Premium $ 12,'||(c_custkey%10)||'00'||chr(10) ELSE '' END)||
          |  (CASE WHEN c_custkey%4=0 THEN 'Class 2 subtotal $ 9,999'||chr(10) ELSE '' END)||
          |  (CASE WHEN c_custkey%5=0 THEN '10 20 Building'||chr(10)||'blah $ 100,000'||chr(10)
          |        WHEN c_custkey%5=1 THEN 'Building'||chr(10)||'$ 250,000'||chr(10)
          |        WHEN c_custkey%5=2 THEN 'Building and Personal Property $ 400,000'||chr(10)
          |        WHEN c_custkey%5=3 THEN 'Building   $300,000'||chr(10) ELSE '' END) AS ptext
          |  FROM customer)
          |SELECT c_custkey,
          |  regexp_matches(ptext,'(?is)AGGREGATE.*APPLIES\s+PER.*POLICY') AS agg_per_policy,
          |  regexp_matches(ptext,'(?is)AGGREGATE.*APPLIES\s+PER.*PROJECT') AS agg_per_project,
          |  regexp_matches(ptext,'(?is)AGGREGATE.*APPLIES\s+PER.*LOCATION') AS agg_per_location,
          |  nullif(regexp_replace(coalesce(regexp_extract(ptext,'(?i)(?s)Class\s*1[\s\S]{0,200}?\$\s*([0-9,]+)',1),''),'[^0-9]','','g'),'') AS class1_amount,
          |  nullif(regexp_replace(coalesce(regexp_extract(ptext,'(?i)(?s)Class\s*2[\s\S]{0,200}?\$\s*([0-9,]+)',1),''),'[^0-9]','','g'),'') AS class2_amount,
          |  (c_custkey%5 IN (0,1,3)) AS has_building_limit
          |FROM t""".stripMargin,
      // policy_probes has_building_limit: the Spark side's negative lookahead
      // (?!\s+and\s+Personal) is inexpressible in RE2 (DuckDB), so the oracle
      // replays the expected flag arithmetically from the variant index —
      // variants 0/1/3 carry a standalone Building limit, 2 the combined
      // form, 4 none.

      "gl_limits_tail" ->
        """WITH t AS (SELECT c_custkey,
          |  'PRODUCTS - COMP/OP AGG $ '||(CASE WHEN c_custkey%2=0 THEN '2,000,000' ELSE 'INCLUDED' END)||chr(10)||
          |  (CASE WHEN c_custkey%3=2 THEN 'PERSONAL AND ADVERTISING INJURY $ 500,000'||chr(10)
          |        ELSE 'PERSONAL & ADV INJURY $ 1,000,000'||chr(10) END)||
          |  (CASE WHEN c_custkey%4=3 THEN ''
          |        WHEN c_custkey%2=0 THEN 'DAMAGE TO RENTED PREMISES (Ea occurrence) $ 100,000'||chr(10)
          |        ELSE 'DAMAGE TO PREMISES RENTED TO YOU $ 50,000'||chr(10) END) AS ptext
          |  FROM customer)
          |SELECT c_custkey,
          |  coalesce(
          |    nullif(regexp_extract(ptext,'(?i)PRODUCTS\s*[-]?\s*COMP[/]?OP\s+AGG[^\$]*\$?\s*([0-9,]+|INCLUDED)',1),''),
          |    nullif(regexp_extract(ptext,'(?i)PRODUCTS[/]?\s*COMPLETED\s+OPERATIONS[^\$]*\$?\s*([0-9,]+|INCLUDED)',1),''),
          |    nullif(regexp_extract(ptext,'(?i)PRODUCTS[^\$]*AGGREGATE[^\$]*\$?\s*([0-9,]+|INCLUDED)',1),'')) AS products_comp_op,
          |  coalesce(
          |    nullif(regexp_extract(ptext,'(?i)PERSONAL\s+[&]?\s*ADV[^\$]*INJURY[^\$]*\$?\s*([0-9,]+)',1),''),
          |    nullif(regexp_extract(ptext,'(?i)PERSONAL\s+[&]?\s*ADVERTISING\s+INJURY[^\$]*\$?\s*([0-9,]+)',1),'')) AS personal_adv_injury,
          |  coalesce(
          |    nullif(regexp_extract(ptext,'(?i)DAMAGE\s+TO\s+RENTED\s+PREMISES[^\$]*\$?\s*([0-9,]+)',1),''),
          |    nullif(regexp_extract(ptext,'(?i)DAMAGE\s+TO\s+PREMISES\s+RENTED[^\$]*\$?\s*([0-9,]+)',1),''),
          |    nullif(regexp_extract(ptext,'(?i)DAMAGE\s+TO\s+(?:PREMISES\s+)?RENTED[^\$]*\$?\s*([0-9,]+)',1),'')) AS damage_rented
          |FROM t""".stripMargin,

      "misc_fields_head" ->
        """WITH t AS (SELECT c_custkey,
          |  (CASE WHEN c_custkey%3=0 THEN 'PREMIUM: $ 1,200.50'||chr(10)||'ADVANCE PREMIUM: $ 9'||(c_custkey%10)||'0'||chr(10)||chr(10)
          |        WHEN c_custkey%3=1 THEN 'TOTAL: 3,4'||(c_custkey%10)||'0'||chr(10)||'PREMIUM: 777'||chr(10)||chr(10) ELSE '' END)||
          |  (CASE WHEN c_custkey%4=0 THEN 'INSURER: ACME INSURANCE CO '||(c_custkey%10)||', ADMITTED'||chr(10)||'NAIC # A123'||(c_custkey%10)||','||chr(10)||chr(10)
          |        WHEN c_custkey%4=1 THEN 'INSURING COMPANY: ZETA MUTUAL '||(c_custkey%10)||', STOCK'||chr(10)||'NAIC NO. 55'||(c_custkey%10)||','||chr(10)||chr(10)
          |        WHEN c_custkey%4=2 THEN 'COMPANY: OMEGA GROUP 7'||(c_custkey%10)||', NON-ADMITTED'||chr(10)||'NAIC: 9Q8'||(c_custkey%10)||','||chr(10)||chr(10) ELSE '' END)||
          |  (CASE WHEN c_custkey%5=0 THEN 'PRODUCER: Smith & Jones Agency '||c_custkey||chr(10)||'Suite 4'||chr(10)||chr(10)||'PHONE: (555) 123-40'||(c_custkey%10)||chr(10)||'E-MAIL: agent'||c_custkey||'@example.com'||chr(10)||chr(10)
          |        WHEN c_custkey%5=1 THEN 'AGENCY: Brown Bros '||c_custkey||chr(10)||chr(10)||'EMAIL: b'||c_custkey||'@x.org'||chr(10)||chr(10)
          |        WHEN c_custkey%5=2 THEN 'PHONE: 555-000'||(c_custkey%10)||chr(10)||chr(10) ELSE '' END)||
          |  (CASE WHEN c_custkey%6=0 THEN 'CERTIFICATE HOLDER: City of Springfield '||c_custkey||chr(10)||'ADDITIONAL INSURED: Land Corp '||c_custkey||chr(10)||chr(10)
          |        WHEN c_custkey%6=1 THEN 'LOSS PAYEE: First Bank '||c_custkey||chr(10)||chr(10)
          |        WHEN c_custkey%6=2 THEN 'MORTGAGEE: Home Trust '||c_custkey||chr(10)||chr(10)
          |        WHEN c_custkey%6=3 THEN 'CERTIFICATE HOLDER: County '||c_custkey||chr(10)||chr(10) ELSE '' END)||
          |  (CASE WHEN c_custkey%7=0 THEN 'written on an OCCURRENCE basis'||chr(10)
          |        WHEN c_custkey%7=1 THEN 'CLAIMS-MADE form applies'||chr(10)
          |        WHEN c_custkey%7=2 THEN 'CLAIMS MADE wording without hyphen'||chr(10)
          |        WHEN c_custkey%7=3 THEN 'policies may OCCUR and CLAIMS-MADE both'||chr(10) ELSE '' END)||
          |  (CASE WHEN c_custkey%2=0 THEN 'AGGREGATE LIMIT APPLIES PER: POLICY X PROJECT'||chr(10)
          |        ELSE 'AGGREGATE APPLIES PER LOC'||chr(10) END) AS ptext FROM customer)
          |SELECT c_custkey,
          |  (regexp_extract_all(ptext,'(?i)PREMIUM[:\s]+\$?\s*([0-9,]+\.?\d*)',1))[-1] AS total_premium,
          |  (regexp_extract_all(ptext,'(?i)TOTAL[:\s]+\$?\s*([0-9,]+\.?\d*)',1))[-1] AS premium_total,
          |  (regexp_extract_all(ptext,'(?i)ADVANCE\s+PREMIUM[:\s]+\$?\s*([0-9,]+\.?\d*)',1))[-1] AS advance_premium,
          |  nullif(regexp_replace(coalesce(
          |    nullif(regexp_extract(ptext,'(?i)INSURER[:\s]+([A-Z0-9\s&\-\.]+)',1),''),
          |    nullif(regexp_extract(ptext,'(?i)INSURING\s+COMPANY[:\s]+([A-Z0-9\s&\-\.]+)',1),''),
          |    nullif(regexp_extract(ptext,'(?i)COMPANY[:\s]+([A-Z0-9\s&\-\.]+)',1),'')),'^\s+|\s+$','','g'),'') AS insurer_name,
          |  nullif(regexp_replace(coalesce(
          |    nullif(regexp_extract(ptext,'(?i)NAIC\s+(?:#|NUMBER|NO\.?)[:\s]*([0-9A-Z]+)',1),''),
          |    nullif(regexp_extract(ptext,'(?i)NAIC[:\s]+([0-9A-Z]+)',1),'')),'^\s+|\s+$','','g'),'') AS insurer_naic,
          |  nullif(regexp_replace(coalesce(
          |    nullif(regexp_extract(ptext,'(?i)PRODUCER[:\s]+([^\n]+(?:\n[^\n]+){0,2})',1),''),
          |    nullif(regexp_extract(ptext,'(?i)AGENCY[:\s]+([^\n]+(?:\n[^\n]+){0,2})',1),'')),'^\s+|\s+$','','g'),'') AS producer_name,
          |  nullif(regexp_replace(nullif(regexp_extract(ptext,'(?i)PHONE[:\s]+([0-9\-\(\)\s]+)',1),''),'^\s+|\s+$','','g'),'') AS producer_phone,
          |  nullif(regexp_replace(nullif(regexp_extract(ptext,'(?i)E[-]?MAIL[:\s]+([^\s\n]+)',1),''),'^\s+|\s+$','','g'),'') AS producer_email,
          |  nullif(regexp_replace(nullif(regexp_extract(ptext,'(?i)CERTIFICATE\s+HOLDER[:\s]+([^\n]+)',1),''),'^\s+|\s+$','','g'),'') AS certificate_holder,
          |  nullif(regexp_replace(nullif(regexp_extract(ptext,'(?i)ADDITIONAL\s+INSURED[:\s]+([^\n]+)',1),''),'^\s+|\s+$','','g'),'') AS additional_insured,
          |  nullif(regexp_replace(nullif(regexp_extract(ptext,'(?i)LOSS\s+PAYEE[:\s]+([^\n]+)',1),''),'^\s+|\s+$','','g'),'') AS loss_payee,
          |  nullif(regexp_replace(nullif(regexp_extract(ptext,'(?i)MORTGAGEE[:\s]+([^\n]+)',1),''),'^\s+|\s+$','','g'),'') AS mortgagee,
          |  CASE WHEN regexp_matches(ptext,'(?i)(OCCUR|OCCURRENCE)') THEN 'Occurrence'
          |       WHEN regexp_matches(ptext,'(?i)CLAIMS[-]?MADE') THEN 'Claims-Made' END AS occurrence_or_claims_made,
          |  nullif(regexp_replace(nullif(regexp_extract(ptext,'(?i)AGGREGATE\s+(?:LIMIT\s+)?APPLIES\s+PER[:\s]+([^\n]+)',1),''),'^\s+|\s+$','','g'),'') AS aggregate_applies_per
          |FROM t""".stripMargin,

      "misc_fields_tail" ->
        """WITH t AS (SELECT c_custkey,
          |  (CASE WHEN c_custkey%3=0 THEN 'DEDUCTIBLE: $ 2,500'||chr(10)||chr(10)
          |        WHEN c_custkey%3=1 THEN 'WINDSTORM OR HAIL DEDUCTIBLE: '||(c_custkey%10)||'%'||chr(10)||chr(10) ELSE '' END)||
          |  (CASE WHEN c_custkey%4=0 THEN 'DESCRIPTION OF OPERATIONS: retail fuel sales'||chr(10)||'station '||(c_custkey%10)||chr(10)||chr(10)
          |        WHEN c_custkey%4=1 THEN 'OPERATIONS: warehousing '||(c_custkey%10)||chr(10)||chr(10) ELSE '' END)||
          |  (CASE WHEN c_custkey%5=0 THEN 'WORKERS COMPENSATION'||chr(10)||'MEMBER EXCLUDED: N'||chr(10)||chr(10)
          |        WHEN c_custkey%5=1 THEN 'COMPENSATION schedule'||chr(10)||'PROPRIETOR listed'||chr(10)||chr(10)
          |        WHEN c_custkey%5=2 THEN 'MEMBER EXCLUDED: Y'||chr(10)||chr(10) ELSE '' END)||
          |  (CASE WHEN c_custkey%6=0 THEN 'AUTOMOBILE LIABILITY'||chr(10)||'ANY AUTO'||chr(10)||'HIRED AUTOS'||chr(10)||chr(10)
          |        WHEN c_custkey%6=1 THEN 'AUTO coverage'||chr(10)||'NON-OWNED AUTOS'||chr(10)||chr(10)
          |        WHEN c_custkey%6=2 THEN 'SCHEDULED AUTOS and OWNED AUTOS'||chr(10)||chr(10) ELSE '' END)||
          |  (CASE WHEN c_custkey%7=0 THEN 'CLASS: 0932 service station '||(c_custkey%10)||chr(10)||chr(10) ELSE '' END)||
          |  (CASE WHEN c_custkey%2=0 THEN 'PREMIUM BASIS: gross sales'||chr(10)||chr(10) ELSE '' END)||
          |  (CASE WHEN c_custkey%8=0 THEN 'REMARKS: see endorsements'||chr(10)||'second line'||chr(10)||chr(10)
          |        WHEN c_custkey%8=1 THEN 'SPECIAL PROVISIONS: waiver applies '||(c_custkey%10)||chr(10)||chr(10)
          |        WHEN c_custkey%8=2 THEN 'SPECIAL CONDITIONS: none noted'||chr(10)||chr(10) ELSE '' END)||
          |  (CASE WHEN c_custkey%9=0 THEN 'CANCELLATION: 30 days notice'||chr(10)||'to holder'||chr(10)||chr(10) ELSE '' END) AS ptext
          |  FROM customer)
          |SELECT c_custkey,
          |  nullif(regexp_replace(nullif(regexp_extract(ptext,'(?i)DEDUCTIBLE[:\s]+\$?\s*([0-9,]+)',1),''),'^\s+|\s+$','','g'),'') AS property_deductible,
          |  nullif(regexp_replace(nullif(regexp_extract(ptext,'(?i)WINDSTORM[^\$]*DEDUCTIBLE[:\s]*([0-9,]+|[\d%]+)',1),''),'^\s+|\s+$','','g'),'') AS windstorm_deductible,
          |  nullif(regexp_replace(coalesce(
          |    nullif(regexp_extract(ptext,'(?i)DESCRIPTION\s+OF\s+OPERATIONS[:\s]+([^\n]+(?:\n[^\n]+){0,5})',1),''),
          |    nullif(regexp_extract(ptext,'(?i)OPERATIONS[:\s]+([^\n]+(?:\n[^\n]+){0,3})',1),'')),'^\s+|\s+$','','g'),'') AS description_of_operations,
          |  CASE WHEN contains(upper(ptext),'WORKERS') OR contains(upper(ptext),'COMPENSATION')
          |    THEN nullif(regexp_replace(nullif(regexp_extract(ptext,'(?i)PROPRIETOR|PARTNER|EXECUTIVE\s+OFFICER|MEMBER\s+EXCLUDED[:\s]+([YN/A]+)',1),''),'^\s+|\s+$','','g'),'') END AS wc_excluded,
          |  (contains(upper(ptext),'AUTO') AND contains(upper(ptext),'ANY AUTO')) AS any_auto,
          |  (contains(upper(ptext),'AUTO') AND contains(upper(ptext),'OWNED AUTOS')) AS owned_autos,
          |  (contains(upper(ptext),'AUTO') AND contains(upper(ptext),'HIRED AUTOS')) AS hired_autos,
          |  (contains(upper(ptext),'AUTO') AND contains(upper(ptext),'SCHEDULED AUTOS')) AS scheduled_autos,
          |  (contains(upper(ptext),'AUTO') AND contains(upper(ptext),'NON-OWNED AUTOS')) AS non_owned_autos,
          |  nullif(regexp_replace(nullif(regexp_extract(ptext,'(?i)CLASS[:\s]+([^\n]+)',1),''),'^\s+|\s+$','','g'),'') AS classification,
          |  nullif(regexp_replace(nullif(regexp_extract(ptext,'(?i)PREMIUM\s+BASIS[:\s]+([^\n]+)',1),''),'^\s+|\s+$','','g'),'') AS premium_basis,
          |  nullif(regexp_replace(coalesce(
          |    nullif(regexp_extract(ptext,'(?i)REMARKS[:\s]+([^\n]+(?:\n[^\n]+){0,10})',1),''),
          |    nullif(regexp_extract(ptext,'(?i)SPECIAL\s+PROVISIONS[:\s]+([^\n]+(?:\n[^\n]+){0,5})',1),''),
          |    nullif(regexp_extract(ptext,'(?i)SPECIAL\s+CONDITIONS[:\s]+([^\n]+(?:\n[^\n]+){0,5})',1),'')),'^\s+|\s+$','','g'),'') AS remarks,
          |  nullif(regexp_replace(nullif(regexp_extract(ptext,'(?i)CANCELLATION[:\s]+([^\n]+(?:\n[^\n]+){0,3})',1),''),'^\s+|\s+$','','g'),'') AS cancellation_provisions
          |FROM t""".stripMargin,

      "locations_list" ->
        """WITH t AS (SELECT c_custkey,
          |  (CASE WHEN c_custkey%4=0 THEN 'ADDRESS: 9 Oak Avenue Unit '||(c_custkey%10)||chr(10)||chr(10)||'ADDRESS: 9 Oak Avenue Unit '||(c_custkey%10)||chr(10)||chr(10)
          |        WHEN c_custkey%4=1 THEN 'LOCATION/DESCRIPTION: 12 Main Street Floor '||(c_custkey%10)||chr(10)||chr(10)||'PROPERTY: brick warehouse '||(c_custkey%10)||chr(10)||chr(10)
          |        WHEN c_custkey%4=2 THEN 'LOCATION: x1'||chr(10)||chr(10)
          |        ELSE 'LOCATION: 700 Industrial Parkway'||chr(10)||chr(10) END) AS ptext FROM customer),
          |l AS (SELECT c_custkey,
          |  regexp_extract_all(ptext,'(?i)LOCATION[/]?DESCRIPTION[:\s]+([^\n]+(?:\n[^\n]+){0,2})',1)
          |  || regexp_extract_all(ptext,'(?i)LOCATION[:\s]+([^\n]+(?:\n[^\n]+){0,2})',1)
          |  || regexp_extract_all(ptext,'(?i)PROPERTY[:\s]+([^\n]+(?:\n[^\n]+){0,2})',1)
          |  || regexp_extract_all(ptext,'(?i)ADDRESS[:\s]+([^\n]+(?:\n[^\n]+){0,2})',1) AS locs FROM t),
          |e AS (SELECT c_custkey, unnest(locs) AS loc0, unnest(generate_series(1,len(locs))) AS ord FROM l),
          |s AS (SELECT c_custkey, regexp_replace(loc0,'^\s+|\s+$','','g') AS location, ord FROM e),
          |d AS (SELECT c_custkey, location, min(ord) AS o FROM s WHERE len(location)>5 GROUP BY c_custkey, location)
          |SELECT c_custkey, row_number() OVER (PARTITION BY c_custkey ORDER BY o) - 1 AS loc_idx, location
          |FROM d""".stripMargin,

      "c7_items" ->
        """SELECT c_custkey, 0::BIGINT AS idx, 'Building with Pumps & Canopy' AS name,
          |  '$'||c_custkey||'00' AS value FROM customer WHERE c_custkey%6=0
          |UNION ALL SELECT c_custkey, 0::BIGINT, 'Pumps & Canopy', 'pc-'||c_custkey FROM customer WHERE c_custkey%6=1
          |UNION ALL SELECT c_custkey, 0::BIGINT, 'Pumps', 'p-'||c_custkey FROM customer WHERE c_custkey%6=2
          |UNION ALL SELECT c_custkey, 1::BIGINT, 'Canopy', 'c-'||c_custkey FROM customer WHERE c_custkey%6=2
          |UNION ALL SELECT c_custkey, 0::BIGINT, 'Pumps', 'only-'||c_custkey FROM customer WHERE c_custkey%6=3
          |UNION ALL SELECT c_custkey, 0::BIGINT, 'Pumps', 'win-'||c_custkey FROM customer WHERE c_custkey%6=5""".stripMargin,

      "ep2_page_relation" ->
        """WITH pg AS (SELECT l_orderkey AS k, l_linenumber::INT AS p, min(l_partkey%1000) AS b
          |  FROM lineitem GROUP BY 1, 2),
          |spans AS (
          |  SELECT k, 'ocr' AS kind, 'preamble of doc '||k AS text, 0 AS off
          |    FROM (SELECT DISTINCT k FROM pg)
          |  UNION ALL SELECT k, 'text', chr(10)||repeat('=',80)||chr(10)||'PAGE '||p||chr(10)||
          |    repeat('=',80)||chr(10)||'text body '||b||' of page '||p, p*10+1 FROM pg
          |  UNION ALL SELECT k, 'ocr', 'ocr body '||b||' page '||p, p*10+2 FROM pg
          |  UNION ALL SELECT k, 'table', 'r1|'||b||chr(10)||'r2|'||(b+1), p*10+3 FROM pg WHERE p%3=0),
          |m AS (SELECT k, kind, text, off,
          |  try_cast(nullif(regexp_extract(text,'^\s*={50,}\s*\n(?:PAGE|Page)\s+([0-9]+)\s*\n={50,}\n?',1),'') AS INT) AS mpage
          |  FROM spans),
          |filled AS (SELECT k, kind, text, off,
          |  coalesce(last_value(mpage IGNORE NULLS) OVER (PARTITION BY k ORDER BY off
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 1) AS page FROM m)
          |SELECT k::VARCHAR AS doc_id, kind, page::BIGINT AS page,
          |  regexp_replace(regexp_replace(text,'^\s*={50,}\s*\n(?:PAGE|Page)\s+([0-9]+)\s*\n={50,}\n?',''),
          |    '^\s+|\s+$','','g') AS text
          |FROM filled""".stripMargin,

      "ep2_tables_output" ->
        """WITH pg AS (SELECT l_orderkey AS k, l_linenumber::INT AS p, min(l_partkey%1000) AS b
          |  FROM lineitem GROUP BY 1, 2),
          |spans AS (
          |  SELECT k, 'ocr' AS kind, 'preamble of doc '||k AS text, 0 AS off
          |    FROM (SELECT DISTINCT k FROM pg)
          |  UNION ALL SELECT k, 'text', chr(10)||repeat('=',80)||chr(10)||'PAGE '||p||chr(10)||
          |    repeat('=',80)||chr(10)||'text body '||b||' of page '||p, p*10+1 FROM pg
          |  UNION ALL SELECT k, 'ocr', 'ocr body '||b||' page '||p, p*10+2 FROM pg
          |  UNION ALL SELECT k, 'table', 'r1|'||b||chr(10)||'r2|'||(b+1), p*10+3 FROM pg WHERE p%3=0),
          |m AS (SELECT k, kind, text, off,
          |  try_cast(nullif(regexp_extract(text,'^\s*={50,}\s*\n(?:PAGE|Page)\s+([0-9]+)\s*\n={50,}\n?',1),'') AS INT) AS mpage
          |  FROM spans),
          |filled AS (SELECT k, kind, text, off,
          |  coalesce(last_value(mpage IGNORE NULLS) OVER (PARTITION BY k ORDER BY off
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 1) AS page FROM m),
          |tt AS (SELECT k, page, string_split(text, chr(10)) AS parts
          |  FROM filled WHERE kind='table')
          |SELECT k::VARCHAR AS doc_id, page::BIGINT AS page, i-1 AS ri, parts[i] AS tr
          |FROM tt, unnest(generate_series(1, len(parts))) AS u(i)""".stripMargin,

      "reading_order" ->
        """WITH pg AS (SELECT l_orderkey AS k, l_linenumber::INT AS p, min(l_partkey%1000) AS b
          |  FROM lineitem GROUP BY 1, 2),
          |f AS (
          |  SELECT k::VARCHAR AS doc_id, k, p AS page, 0 AS x, (b%50)::INT AS y,
          |    40 AS w, 'text' AS kind, 'A-'||p||'-'||b AS text, '' AS media_ref FROM pg
          |  UNION ALL SELECT k::VARCHAR, k, p, 60, ((b*7)%50)::INT, 40, 'text',
          |    'B-'||p||'-'||b, '' FROM pg
          |  UNION ALL SELECT k::VARCHAR, k, p, 10, 0, 80, 'text', 'H-'||p, ''
          |    FROM pg WHERE k%3 <> 0
          |  UNION ALL SELECT k::VARCHAR, k, p, 60, ((b*3)%50+1)::INT, 40, 'media',
          |    '', 'im-'||k||'-'||p FROM pg WHERE p%2 = 0),
          |m AS (SELECT doc_id, page, x, y, w, kind, text, media_ref,
          |  min(x) OVER pw + max(x+w) OVER pw AS mid2 FROM f
          |  WINDOW pw AS (PARTITION BY doc_id, page)),
          |s2 AS (SELECT *, (x+w)*2 <= mid2 AS isl, x*2 >= mid2 AS isr FROM m),
          |dcd AS (SELECT *,
          |  (NOT bool_or(NOT (isl OR isr)) OVER pw)
          |    AND bool_or(isl) OVER pw AND bool_or(isr) OVER pw AS twocol
          |  FROM s2 WINDOW pw AS (PARTITION BY doc_id, page))
          |SELECT doc_id, kind, text, media_ref,
          |  (row_number() OVER (PARTITION BY doc_id ORDER BY page,
          |    CASE WHEN twocol AND isr THEN 1 ELSE 0 END, y, x, text) - 1)::INT
          |    AS "offset"
          |FROM dcd""".stripMargin,

      "span_eval" -> (spanEvalOracleCtes +
        """SELECT doc_id, n_gold, n_actual, pos_matched, bag_matched, exact,
          |  precision_milli, recall_milli,
          |  CASE WHEN coalesce(precision_milli,0)+coalesce(recall_milli,0) > 0
          |    THEN (2*precision_milli*recall_milli)//(precision_milli+recall_milli)
          |  END AS f1_milli
          |FROM per""".stripMargin),

      "span_eval_summary" -> (spanEvalOracleCtes +
        """SELECT count(*) AS n_docs,
          |  sum(CASE WHEN exact THEN 1 ELSE 0 END)::BIGINT AS n_exact,
          |  ((1000*sum(CASE WHEN exact THEN 1 ELSE 0 END))//count(*))::BIGINT
          |    AS exact_rate_milli,
          |  sum(n_gold)::BIGINT AS gold_spans, sum(n_actual)::BIGINT AS actual_spans,
          |  (CASE WHEN sum(n_actual)>0 THEN (1000*sum(bag_matched))//sum(n_actual)
          |    END)::BIGINT AS micro_precision_milli,
          |  (CASE WHEN sum(n_gold)>0 THEN (1000*sum(bag_matched))//sum(n_gold)
          |    END)::BIGINT AS micro_recall_milli
          |FROM per""".stripMargin),

      "qc_compare" ->
        """WITH c AS (SELECT o_orderkey AS doc, 'total' AS field,
          |  regexp_replace('$'||CAST(round(o_totalprice*100) AS BIGINT),'[^0-9]','','g') AS certificate FROM orders),
          |p AS (SELECT o_orderkey AS doc, 'total' AS field,
          |  CASE WHEN o_orderkey%5=0 THEN NULL
          |    ELSE CAST(CAST(round(o_totalprice*100) AS BIGINT) AS VARCHAR) END AS policy FROM orders)
          |SELECT c.doc, c.field,
          |  (p.policy IS NULL OR c.certificate <> p.policy) AS is_mismatch
          |FROM c LEFT JOIN p ON c.doc=p.doc AND c.field=p.field""".stripMargin,

      "j4_guardrail" ->
        """WITH v AS (SELECT c_custkey%97 AS doc, c_name AS name, c_custkey AS seq,
          |  regexp_replace(lower(c_name),'[^a-z0-9]','','g') AS vn FROM customer),
          |r2 AS (SELECT c_custkey%97 AS doc,
          |  regexp_replace(lower(CASE WHEN c_custkey%10=0 THEN c_name
          |    ELSE 'ZZZNOMATCH'||c_custkey END),'[^a-z0-9]','','g') AS rn
          |  FROM customer WHERE c_custkey%5=0),
          |rc AS (SELECT doc, count(*) AS n_req FROM r2 WHERE rn <> '' GROUP BY 1),
          |m AS (SELECT DISTINCT v.doc, v.name, v.seq FROM v JOIN r2 ON v.doc=r2.doc
          |  AND v.vn <> '' AND r2.rn <> '' AND (contains(v.vn, r2.rn) OR contains(r2.rn, v.vn))),
          |fb AS (SELECT v.doc, v.name, v.seq FROM v
          |  WHERE v.doc NOT IN (SELECT DISTINCT doc FROM m)),
          |u AS (SELECT doc, name, seq, row_number() OVER (PARTITION BY doc ORDER BY seq) AS rn_
          |  FROM (SELECT * FROM m UNION ALL SELECT * FROM fb))
          |SELECT u.doc, u.name, u.seq FROM u JOIN rc ON u.doc=rc.doc WHERE u.rn_ <= rc.n_req""".stripMargin,

      "qc_tolerant" ->
        """WITH base AS (SELECT o_orderkey AS doc, 'f' AS field, o_orderkey%5 AS m,
          |  CAST(round(o_totalprice) AS BIGINT)::VARCHAR AS amt FROM orders),
          |kv AS (SELECT doc, field,
          |  CASE m WHEN 0 THEN '09/26/2025' WHEN 1 THEN '123 Main Road, Suite 4'
          |    WHEN 2 THEN '$ '||amt WHEN 3 THEN '10/05/2025' ELSE NULL END AS cv,
          |  CASE m WHEN 0 THEN '9/26/2025' WHEN 1 THEN '123 MAIN RD. STE 4'
          |    WHEN 2 THEN amt WHEN 3 THEN '10/06/2025' ELSE 'present' END AS pv
          |  FROM base),
          |u AS (SELECT doc, field, 'c' AS side, cv AS v FROM kv
          |  UNION ALL SELECT doc, field, 'p', pv FROM kv),
          |t0 AS (SELECT doc, field, side, regexp_replace(v, '^\s+|\s+$', '', 'g') AS t FROM u),
          |nrm AS (SELECT doc, field, side,
          |  CASE WHEN t IS NULL OR t = '' THEN NULL
          |    WHEN regexp_matches(t, '^\d{1,2}/\d{1,2}/\d{4}$')
          |      THEN regexp_replace(t, '^0?(\d{1,2})/0?(\d{1,2})/(\d{4})$', '\1/\2/\3')
          |    WHEN regexp_matches(t, '^\$?\s*[0-9][0-9,\.]*$')
          |      THEN regexp_replace(t, '[^0-9]', '', 'g')
          |    ELSE regexp_replace(regexp_replace(
          |      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          |      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          |        lower(t), '[.,#]', ' ', 'g'),
          |        '\broad\b','rd','g'), '\bstreet\b','st','g'), '\bavenue\b','ave','g'),
          |        '\bdrive\b','dr','g'), '\bboulevard\b','blvd','g'), '\blane\b','ln','g'),
          |        '\bhighway\b','hwy','g'), '\bsuite\b','ste','g'),
          |      '\s+', ' ', 'g') END AS nv
          |  FROM t0),
          |trimmed AS (SELECT doc, field, side,
          |  regexp_replace(nv, '^\s+|\s+$', '', 'g') AS nv FROM nrm),
          |piv AS (SELECT doc, field,
          |  max(CASE WHEN side='c' THEN nv END) AS certificate,
          |  max(CASE WHEN side='p' THEN nv END) AS policy
          |  FROM trimmed GROUP BY 1, 2)
          |SELECT doc, field, certificate, policy,
          |  (certificate IS NULL OR policy IS NULL OR certificate <> policy) AS is_mismatch
          |FROM piv WHERE certificate IS NOT NULL OR policy IS NOT NULL""".stripMargin,

      // the qc_tolerant normalization chain with the edit-distance verdict
      // on top; both engines' native levenshtein
      "qc_fuzzy" ->
        """WITH base AS (SELECT o_orderkey AS doc, 'f' AS field, o_orderkey%5 AS m FROM orders),
          |kv AS (SELECT doc, field,
          |  CASE m WHEN 0 THEN 'ACME HOLDINGS LLC' WHEN 1 THEN '123 Main Road, Suite 4'
          |    WHEN 2 THEN 'JOHNSON & SONS' WHEN 3 THEN 'NORTH RIVER MILLS' ELSE NULL END AS cv,
          |  CASE m WHEN 0 THEN 'ACME HOLD1NGS LLC' WHEN 1 THEN '123 MAIN RD. STE 4'
          |    WHEN 2 THEN 'J0HNSON & S0NS' WHEN 3 THEN 'NORTH RIVER MILLS' ELSE 'present' END AS pv
          |  FROM base),
          |u AS (SELECT doc, field, 'c' AS side, cv AS v FROM kv
          |  UNION ALL SELECT doc, field, 'p', pv FROM kv),
          |t0 AS (SELECT doc, field, side, regexp_replace(v, '^\s+|\s+$', '', 'g') AS t FROM u),
          |nrm AS (SELECT doc, field, side,
          |  CASE WHEN t IS NULL OR t = '' THEN NULL
          |    WHEN regexp_matches(t, '^\d{1,2}/\d{1,2}/\d{4}$')
          |      THEN regexp_replace(t, '^0?(\d{1,2})/0?(\d{1,2})/(\d{4})$', '\1/\2/\3')
          |    WHEN regexp_matches(t, '^\$?\s*[0-9][0-9,\.]*$')
          |      THEN regexp_replace(t, '[^0-9]', '', 'g')
          |    ELSE regexp_replace(regexp_replace(
          |      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          |      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          |        lower(t), '[.,#]', ' ', 'g'),
          |        '\broad\b','rd','g'), '\bstreet\b','st','g'), '\bavenue\b','ave','g'),
          |        '\bdrive\b','dr','g'), '\bboulevard\b','blvd','g'), '\blane\b','ln','g'),
          |        '\bhighway\b','hwy','g'), '\bsuite\b','ste','g'),
          |      '\s+', ' ', 'g') END AS nv
          |  FROM t0),
          |trimmed AS (SELECT doc, field, side,
          |  regexp_replace(nv, '^\s+|\s+$', '', 'g') AS nv FROM nrm),
          |piv AS (SELECT doc, field,
          |  max(CASE WHEN side='c' THEN nv END) AS certificate,
          |  max(CASE WHEN side='p' THEN nv END) AS policy
          |  FROM trimmed GROUP BY 1, 2)
          |SELECT doc, field, certificate, policy,
          |  CASE WHEN certificate IS NULL OR policy IS NULL THEN NULL
          |    ELSE levenshtein(certificate, policy)::BIGINT END AS edit_distance,
          |  (certificate IS NULL OR policy IS NULL
          |    OR levenshtein(certificate, policy) > 1) AS is_mismatch
          |FROM piv WHERE certificate IS NOT NULL OR policy IS NOT NULL""".stripMargin,

      "summary_counts" ->
        """WITH s AS (SELECT o_orderpriority,
          |  CASE WHEN o_orderstatus='F' THEN 'MATCH' WHEN o_orderstatus='O' THEN 'MISMATCH'
          |    ELSE 'NOT_FOUND' END AS status FROM orders)
          |SELECT o_orderpriority, count(*) AS total,
          |  count(*) FILTER (WHERE upper(status)='MATCH') AS matched,
          |  count(*) FILTER (WHERE upper(status)='MISMATCH') AS mismatched,
          |  count(*) FILTER (WHERE upper(status)='NOT_FOUND') AS not_found
          |FROM s GROUP BY 1""".stripMargin,

      "name_norm" ->
        """SELECT p_partkey,
          |  regexp_replace(lower(p_name),'[^a-z0-9]','','g') AS norm_name,
          |  regexp_replace(p_brand||'_policy','(_policy2|_policy|_ocr|_Package)$','') AS base_brand
          |FROM part""".stripMargin,

      "boilerplate_blocks" ->
        """WITH pg AS (SELECT doc_id,
          |  '<a href="/home">Home</a> | <a href="/about">About Us</a> | <a href="/contact">Contact</a>'
          |  ||chr(10)||chr(10)||'Section '||(doc_id%7)||chr(10)||chr(10)||text||chr(10)||chr(10)||
          |  'Copyright 2026 <a href="/terms">Terms of Service</a> and <a href="/privacy">Privacy</a>' AS page
          |  FROM documents),
          |b AS (SELECT doc_id, string_split_regex(page, '\n\s*\n') AS blocks FROM pg),
          |e AS (SELECT doc_id, i AS block_idx, blocks[i+1] AS blk
          |  FROM b, unnest(range(len(blocks))) AS t(i)),
          |m AS (SELECT doc_id, block_idx, blk,
          |  regexp_replace(blk, '<[^>]*>', ' ', 'g') AS tagless,
          |  regexp_replace(coalesce(array_to_string(regexp_extract_all(blk, '(?is)<a[^>]*>(.*?)</a>', 1), ' '), ''),
          |    '<[^>]*>', ' ', 'g') AS linktext
          |  FROM e),
          |w AS (SELECT doc_id, block_idx,
          |  regexp_replace(regexp_replace(tagless, '^\s+|\s+$', '', 'g'), '\s+', ' ', 'g') AS text_,
          |  len(list_filter(string_split_regex(tagless,'\s+'), x -> x <> '')) AS n_words,
          |  len(list_filter(string_split_regex(linktext,'\s+'), x -> x <> '')) AS n_link_words,
          |  length(regexp_replace(regexp_replace(tagless,'^\s+|\s+$','','g'),'[^\n]','','g')) + 1 AS n_lines
          |  FROM m)
          |SELECT doc_id, block_idx::BIGINT AS block_idx,
          |  CASE WHEN n_words = 0 THEN 'empty'
          |       WHEN n_link_words::DOUBLE / greatest(n_words,1) > 0.33 THEN 'boilerplate'
          |       WHEN n_words <= 12 AND NOT regexp_matches(text_, '[.!?]$') THEN 'heading'
          |       ELSE 'body' END AS label,
          |  text_ AS text, n_words::BIGINT AS n_words, n_link_words::BIGINT AS n_link_words,
          |  round(n_link_words::DOUBLE / greatest(n_words,1), 6) AS link_density,
          |  round(n_words::DOUBLE / greatest(n_lines,1), 6) AS text_density
          |FROM w""".stripMargin,

      "repetition_stats" ->
        s"""WITH t AS (SELECT doc_id,
           |  substr(text,1,80) AS l1, substr(text,41,80) AS l2,
           |  CASE WHEN doc_id%3=0 THEN substr(text,1,80) ELSE substr(text,81,80) END AS l4
           |  FROM documents),
           |d2 AS (SELECT doc_id, l1||chr(10)||l2||chr(10)||l1||chr(10)||l4 AS t2 FROM t),
           |l AS (SELECT doc_id, regexp_replace(x, '^\\s+|\\s+$$', '', 'g') AS line
           |  FROM d2, unnest(string_split(t2, chr(10))) AS u(x)),
           |lf AS (SELECT doc_id, line FROM l WHERE line <> ''),
           |ls AS (SELECT doc_id, count(*) AS n_lines, count(DISTINCT line) AS nd FROM lf GROUP BY 1),
           |tk AS (SELECT doc_id, ${toks.format("t2")} AS toks FROM d2),
           |bg AS (SELECT doc_id, toks[i+1]||' '||toks[i+2] AS b
           |  FROM tk, unnest(range(greatest(len(toks)-1,0))) AS u(i)),
           |bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1,2),
           |bs AS (SELECT doc_id, max(c) AS top, sum(c) AS total FROM bc GROUP BY 1)
           |SELECT ls.doc_id, n_lines::BIGINT AS n_lines,
           |  round(CAST((n_lines-nd)::DOUBLE/n_lines AS VARCHAR)::DECIMAL(25,20),6)::DOUBLE AS dup_line_ratio,
           |  coalesce(round(CAST(top::DOUBLE/total AS VARCHAR)::DECIMAL(25,20),6)::DOUBLE, 0.0) AS top_bigram_ratio
           |FROM ls LEFT JOIN bs ON ls.doc_id = bs.doc_id""".stripMargin,

      "gopher_quality" ->
        s"""WITH d2 AS (SELECT doc_id,
           |  CASE WHEN doc_id%11=0 THEN substr(text,1,30)
           |  ELSE substr(text,1,400)||chr(10)||
           |    (CASE WHEN doc_id%5=0 THEN '- bullet item' ELSE 'Normal and solid line with the words.' END)||chr(10)||
           |    (CASE WHEN doc_id%7=0 THEN '# # # # # # # # # # # #' ELSE 'that have with more easy text.' END)||chr(10)||
           |    (CASE WHEN doc_id%3=0 THEN 'trailing thought...' ELSE 'Closing line of the page.' END)
           |  END AS t2 FROM documents),
           |b AS (SELECT doc_id, t2, regexp_replace(t2, '^\\s+|\\s+$$', '', 'g') AS t,
           |  ${toks.format("t2")} AS ks FROM d2),
           |w AS (SELECT doc_id, t2, t, ks,
           |  CASE WHEN length(t)=0 THEN [] ELSE string_split_regex(t, '\\s+') END AS ws,
           |  list_filter(list_transform(string_split(t2, chr(10)),
           |    x -> regexp_replace(x, '^\\s+|\\s+$$', '', 'g')), x -> x <> '') AS ls FROM b),
           |m AS (SELECT doc_id,
           |  len(ws)::BIGINT AS n_words,
           |  length(regexp_replace(t, '\\s+', '', 'g'))::BIGINT AS word_chars,
           |  ((length(t) - length(replace(t, '#', ''))) +
           |   len(regexp_extract_all(t, '\\.\\.\\.')) +
           |   (length(t) - length(replace(t, '…', ''))))::BIGINT AS n_symbols,
           |  len(ls)::BIGINT AS n_lines,
           |  len(list_filter(ls, x -> starts_with(x, '-') OR starts_with(x, '*')
           |    OR starts_with(x, '•')))::BIGINT AS n_bullet_lines,
           |  len(list_filter(ls, x -> ends_with(x, '...') OR ends_with(x, '…')))::BIGINT AS n_ellipsis_lines,
           |  len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))::BIGINT AS n_alpha_words,
           |  ((CASE WHEN list_contains(ks, 'the') THEN 1 ELSE 0 END) +
           |   (CASE WHEN list_contains(ks, 'be') THEN 1 ELSE 0 END) +
           |   (CASE WHEN list_contains(ks, 'to') THEN 1 ELSE 0 END) +
           |   (CASE WHEN list_contains(ks, 'of') THEN 1 ELSE 0 END) +
           |   (CASE WHEN list_contains(ks, 'and') THEN 1 ELSE 0 END) +
           |   (CASE WHEN list_contains(ks, 'that') THEN 1 ELSE 0 END) +
           |   (CASE WHEN list_contains(ks, 'have') THEN 1 ELSE 0 END) +
           |   (CASE WHEN list_contains(ks, 'with') THEN 1 ELSE 0 END))::BIGINT AS n_stop
           |  FROM w)
           |SELECT doc_id, n_words, word_chars, n_symbols, n_lines,
           |  n_bullet_lines, n_ellipsis_lines, n_alpha_words, n_stop,
           |  (n_words >= 50 AND n_words <= 100000) AS f_word_count,
           |  (word_chars >= 3*n_words AND word_chars <= 10*n_words) AS f_mean_len,
           |  (10*n_symbols <= n_words) AS f_symbols,
           |  (10*n_bullet_lines <= 9*n_lines) AS f_bullets,
           |  (10*n_ellipsis_lines <= 3*n_lines) AS f_ellipsis,
           |  (5*n_alpha_words >= 4*n_words) AS f_alpha,
           |  (n_stop >= 2) AS f_stop,
           |  ((n_words >= 50 AND n_words <= 100000) AND
           |   (word_chars >= 3*n_words AND word_chars <= 10*n_words) AND
           |   (10*n_symbols <= n_words) AND (10*n_bullet_lines <= 9*n_lines) AND
           |   (10*n_ellipsis_lines <= 3*n_lines) AND
           |   (5*n_alpha_words >= 4*n_words) AND (n_stop >= 2)) AS kept
           |FROM m""".stripMargin,

      "gopher_stats" ->
        s"""WITH t AS (SELECT doc_id, substr(text,1,60) AS a, substr(text,61,60) AS b FROM documents),
           |d2 AS (SELECT doc_id, a||chr(10)||chr(10)||b||chr(10)||a||chr(10)||chr(10)||a||
           |  (CASE WHEN doc_id%3=0 THEN chr(10)||chr(10)||'word word word word' ELSE '' END) AS t2 FROM t),
           |pv AS (SELECT doc_id, regexp_replace(x, '^\\s+|\\s+$$', '', 'g') AS v
           |  FROM d2, unnest(string_split_regex(t2, '\\n\\s*\\n')) AS u(x)),
           |pc AS (SELECT doc_id, v, count(*) AS c FROM pv WHERE v <> '' GROUP BY 1,2),
           |ps AS (SELECT doc_id, sum(c) AS pn, count(*) AS pnd, sum(c*length(v)) AS pchars,
           |  sum(CASE WHEN c>1 THEN c*length(v) ELSE 0 END) AS pdchars FROM pc GROUP BY 1),
           |lv AS (SELECT doc_id, regexp_replace(x, '^\\s+|\\s+$$', '', 'g') AS v
           |  FROM d2, unnest(string_split(t2, chr(10))) AS u(x)),
           |lc AS (SELECT doc_id, v, count(*) AS c FROM lv WHERE v <> '' GROUP BY 1,2),
           |ls AS (SELECT doc_id, sum(c*length(v)) AS lchars,
           |  sum(CASE WHEN c>1 THEN c*length(v) ELSE 0 END) AS ldchars FROM lc GROUP BY 1),
           |tk AS (SELECT doc_id, ${toks.format("t2")} AS toks FROM d2),
           |tkl AS (SELECT doc_id, toks, length(array_to_string(toks, ' ')) AS doclen FROM tk),
           |g2 AS (SELECT doc_id, doclen, array_to_string(toks[i+1:i+2], ' ') AS g
           |  FROM tkl, unnest(range(greatest(len(toks)-1,0))) AS u(i)),
           |c2 AS (SELECT doc_id, doclen, g, count(*) AS c FROM g2 GROUP BY 1,2,3),
           |t2g AS (SELECT doc_id, round(CAST(CAST(c*length(g) AS DOUBLE)/doclen AS VARCHAR)::DECIMAL(25,20),6)::DOUBLE AS r
           |  FROM c2 QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC) = 1),
           |g3 AS (SELECT doc_id, doclen, array_to_string(toks[i+1:i+3], ' ') AS g
           |  FROM tkl, unnest(range(greatest(len(toks)-2,0))) AS u(i)),
           |c3 AS (SELECT doc_id, doclen, g, count(*) AS c FROM g3 GROUP BY 1,2,3),
           |t3g AS (SELECT doc_id, round(CAST(CAST(c*length(g) AS DOUBLE)/doclen AS VARCHAR)::DECIMAL(25,20),6)::DOUBLE AS r
           |  FROM c3 QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC) = 1),
           |g4 AS (SELECT doc_id, doclen, array_to_string(toks[i+1:i+4], ' ') AS g
           |  FROM tkl, unnest(range(greatest(len(toks)-3,0))) AS u(i)),
           |c4 AS (SELECT doc_id, doclen, g, count(*) AS c FROM g4 GROUP BY 1,2,3),
           |t4g AS (SELECT doc_id, round(CAST(CAST(c*length(g) AS DOUBLE)/doclen AS VARCHAR)::DECIMAL(25,20),6)::DOUBLE AS r
           |  FROM c4 QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC) = 1)
           |SELECT ps.doc_id, pn::BIGINT AS n_paras,
           |  round(CAST((pn-pnd)::DOUBLE/pn AS VARCHAR)::DECIMAL(25,20),6)::DOUBLE AS dup_para_ratio,
           |  round(CAST(pdchars::DOUBLE/pchars AS VARCHAR)::DECIMAL(25,20),6)::DOUBLE AS dup_para_char_ratio,
           |  round(CAST(ldchars::DOUBLE/lchars AS VARCHAR)::DECIMAL(25,20),6)::DOUBLE AS dup_line_char_ratio,
           |  coalesce(t2g.r, 0.0) AS top2_char_ratio,
           |  coalesce(t3g.r, 0.0) AS top3_char_ratio,
           |  coalesce(t4g.r, 0.0) AS top4_char_ratio
           |FROM ps JOIN ls ON ps.doc_id = ls.doc_id
           |LEFT JOIN t2g ON ps.doc_id = t2g.doc_id
           |LEFT JOIN t3g ON ps.doc_id = t3g.doc_id
           |LEFT JOIN t4g ON ps.doc_id = t4g.doc_id""".stripMargin,

      "pipeline_e2e" ->
        s"""WITH pg AS (SELECT doc_id,
           |  '<a href="/home">Home</a> | <a href="/about">About Us</a> | <a href="/contact">Contact</a>'
           |  ||chr(10)||chr(10)||'Section '||(doc_id%7)||chr(10)||chr(10)||text||chr(10)||chr(10)||
           |  'Copyright 2026 <a href="/terms">Terms of Service</a> and <a href="/privacy">Privacy</a>' AS page
           |  FROM documents),
           |b AS (SELECT doc_id, string_split_regex(page, '\\n\\s*\\n') AS blocks FROM pg),
           |e AS (SELECT doc_id, i AS block_idx, blocks[i+1] AS blk
           |  FROM b, unnest(range(len(blocks))) AS t(i)),
           |m AS (SELECT doc_id, block_idx,
           |  regexp_replace(blk, '<[^>]*>', ' ', 'g') AS tagless,
           |  regexp_replace(coalesce(array_to_string(regexp_extract_all(blk, '(?is)<a[^>]*>(.*?)</a>', 1), ' '), ''),
           |    '<[^>]*>', ' ', 'g') AS linktext
           |  FROM e),
           |w AS (SELECT doc_id, block_idx,
           |  regexp_replace(regexp_replace(tagless, '^\\s+|\\s+$$', '', 'g'), '\\s+', ' ', 'g') AS text_,
           |  len(list_filter(string_split_regex(tagless,'\\s+'), x -> x <> '')) AS n_words,
           |  len(list_filter(string_split_regex(linktext,'\\s+'), x -> x <> '')) AS n_link_words
           |  FROM m),
           |lab AS (SELECT doc_id, block_idx, text_,
           |  CASE WHEN n_words = 0 THEN 'empty'
           |       WHEN n_link_words::DOUBLE / greatest(n_words,1) > 0.33 THEN 'boilerplate'
           |       WHEN n_words <= 12 AND NOT regexp_matches(text_, '[.!?]$$') THEN 'heading'
           |       ELSE 'body' END AS label
           |  FROM w),
           |c AS (SELECT doc_id, string_agg(text_, chr(10) ORDER BY block_idx) AS content,
           |  count(*)::BIGINT AS n_blocks
           |  FROM lab WHERE label IN ('heading','body') GROUP BY doc_id),
           |t2 AS (SELECT doc_id, content, n_blocks, ${toks.format("content")} AS toks,
           |  greatest(length(content),1)::DOUBLE AS n FROM c),
           |sc AS (SELECT doc_id, content, n_blocks,
           |  CASE WHEN length(regexp_replace(content,'[^\\x{4E00}-\\x{9FFF}]','','g')) > 0 THEN 'zh'
           |    WHEN len(list_filter(toks, t -> list_contains(['the','and','of','to','in','is','a','that'], t)))
           |      >= len(list_filter(toks, t -> list_contains(['el','la','de','que','los','las','una','es'], t)))
           |     AND len(list_filter(toks, t -> list_contains(['the','and','of','to','in','is','a','that'], t)))
           |      >= len(list_filter(toks, t -> list_contains(['der','die','und','das','ist','nicht','ein','zu'], t)))
           |     AND len(list_filter(toks, t -> list_contains(['the','and','of','to','in','is','a','that'], t)))
           |      >= len(list_filter(toks, t -> list_contains(['le','la','les','des','et','est','une','dans'], t))) THEN 'en'
           |    WHEN len(list_filter(toks, t -> list_contains(['el','la','de','que','los','las','una','es'], t)))
           |      >= len(list_filter(toks, t -> list_contains(['der','die','und','das','ist','nicht','ein','zu'], t)))
           |     AND len(list_filter(toks, t -> list_contains(['el','la','de','que','los','las','una','es'], t)))
           |      >= len(list_filter(toks, t -> list_contains(['le','la','les','des','et','est','une','dans'], t))) THEN 'es'
           |    WHEN len(list_filter(toks, t -> list_contains(['der','die','und','das','ist','nicht','ein','zu'], t)))
           |      >= len(list_filter(toks, t -> list_contains(['le','la','les','des','et','est','une','dans'], t))) THEN 'de'
           |    ELSE 'fr' END AS lang_pred,
           |  round(CAST(0.25*least(length(content)::DOUBLE/500.0, 1.0)
           |    + 0.35*((length(content)-length(regexp_replace(content,'[A-Za-z]','','g')))::DOUBLE/n)
           |    + 0.25*(1.0 - least(((length(content)-length(regexp_replace(content,'[.,;:!?]','','g')))::DOUBLE/n)*10.0, 1.0))
           |    + 0.15*least((len(list_filter(toks, t -> list_contains(['the','and','of','to','in','is','a','that'], t)))::DOUBLE
           |        / greatest(len(toks),1)::DOUBLE)*4.0, 1.0) AS VARCHAR)::DECIMAL(25,20), 4)::DOUBLE AS quality,
           |  (CASE WHEN length(regexp_replace(content,'^\\s+|\\s+$$','','g'))=0 THEN 0
           |    ELSE len(string_split_regex(regexp_replace(content,'^\\s+|\\s+$$','','g'),'\\s+')) END)::BIGINT AS ws_tokens,
           |  len(regexp_extract_all(content,'[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))::BIGINT AS bpe_tokens
           |  FROM t2),
           |g AS (SELECT * FROM sc WHERE quality >= 0.65),
           |f AS (SELECT doc_id, lang_pred, quality, ws_tokens, bpe_tokens, n_blocks,
           |  ${hash60("regexp_replace(trim(lower(content)),'\\s+',' ','g')")} AS fp FROM g)
           |SELECT doc_id, lang_pred, quality, ws_tokens, bpe_tokens, n_blocks,
           |  min(doc_id) OVER (PARTITION BY fp) AS canonical_id,
           |  doc_id <> min(doc_id) OVER (PARTITION BY fp) AS is_duplicate
           |FROM f""".stripMargin,

      "lang_mix" ->
        s"""WITH d2 AS (SELECT doc_id,
           |  substr(text,1,80)||chr(10)||chr(10)||
           |  (CASE WHEN doc_id%3=0 THEN 'el que los de la una es aqui'
           |        ELSE 'the and of to in is that more' END)||
           |  (CASE doc_id%4 WHEN 0 THEN chr(10)||chr(10)||'中文内容测试'
           |        WHEN 1 THEN chr(10)||chr(10)||'der die und das ist nicht ein zu'
           |        WHEN 2 THEN chr(10)||chr(10)||'le la les des et est une dans'
           |        ELSE '' END) AS t2 FROM documents),
           |pv AS (SELECT doc_id, regexp_replace(x, '^\\s+|\\s+$$', '', 'g') AS p
           |  FROM d2, unnest(string_split_regex(t2, '\\n\\s*\\n')) AS u(x)),
           |pp AS (SELECT doc_id, p, ${toks.format("p")} AS toks FROM pv WHERE p <> ''),
           |cnt AS (SELECT doc_id, p,
           |  len(list_filter(toks, t -> list_contains(['the','and','of','to','in','is','a','that'], t))) AS en,
           |  len(list_filter(toks, t -> list_contains(['el','la','de','que','los','las','una','es'], t))) AS es,
           |  len(list_filter(toks, t -> list_contains(['der','die','und','das','ist','nicht','ein','zu'], t))) AS de,
           |  len(list_filter(toks, t -> list_contains(['le','la','les','des','et','est','une','dans'], t))) AS fr
           |  FROM pp),
           |lg AS (SELECT doc_id,
           |  CASE WHEN length(regexp_replace(p,'[^\\x{4E00}-\\x{9FFF}]','','g')) > 0 THEN 'zh'
           |    WHEN en >= es AND en >= de AND en >= fr THEN 'en'
           |    WHEN es >= de AND es >= fr THEN 'es'
           |    WHEN de >= fr THEN 'de' ELSE 'fr' END AS lang FROM cnt),
           |c AS (SELECT doc_id, lang, count(*) AS c FROM lg GROUP BY 1, 2),
           |r AS (SELECT doc_id, lang, c, row_number() OVER (PARTITION BY doc_id
           |  ORDER BY c DESC, CASE lang WHEN 'zh' THEN 0 WHEN 'en' THEN 1
           |    WHEN 'es' THEN 2 WHEN 'de' THEN 3 ELSE 4 END) AS rn FROM c)
           |SELECT doc_id, sum(c)::BIGINT AS n_paras, count(*)::BIGINT AS n_langs,
           |  max(CASE WHEN rn = 1 THEN lang END) AS primary_lang,
           |  count(*) >= 2 AS mixed
           |FROM r GROUP BY doc_id""".stripMargin,

      "lang_id" ->
        s"""WITH t AS (SELECT doc_id, text, ${toks.format("text")} AS toks FROM documents),
           |c AS (SELECT doc_id, text,
           |  len(list_filter(toks, t -> list_contains(['the','and','of','to','in','is','a','that'], t))) AS en,
           |  len(list_filter(toks, t -> list_contains(['el','la','de','que','los','las','una','es'], t))) AS es,
           |  len(list_filter(toks, t -> list_contains(['der','die','und','das','ist','nicht','ein','zu'], t))) AS de,
           |  len(list_filter(toks, t -> list_contains(['le','la','les','des','et','est','une','dans'], t))) AS fr
           |  FROM t)
           |SELECT doc_id,
           |  CASE WHEN length(regexp_replace(text,'[^\\x{4E00}-\\x{9FFF}]','','g')) > 0 THEN 'zh'
           |    WHEN en >= es AND en >= de AND en >= fr THEN 'en'
           |    WHEN es >= de AND es >= fr THEN 'es'
           |    WHEN de >= fr THEN 'de' ELSE 'fr' END AS lang_pred
           |FROM c""".stripMargin,

      "key_skew" ->
        """WITH c AS (SELECT user_id::VARCHAR AS key, count(*) AS cnt
          |  FROM events GROUP BY 1),
          |r AS (SELECT key, cnt, row_number() OVER (ORDER BY cnt, key) AS rn FROM c),
          |s AS (SELECT sum(cnt)::BIGINT AS n_rows, count(*)::BIGINT AS n_keys,
          |  max(cnt)::BIGINT AS max_rows FROM r),
          |p50 AS (SELECT cnt::BIGINT AS p50_rows FROM r, s
          |  WHERE rn = (n_keys*50+99)//100),
          |p99 AS (SELECT cnt::BIGINT AS p99_rows FROM r, s
          |  WHERE rn = (n_keys*99+99)//100),
          |top AS (SELECT min(key) AS top_key FROM r, s WHERE cnt = max_rows)
          |SELECT n_rows, n_keys, max_rows, p50_rows, p99_rows,
          |  ((1000*max_rows*n_keys)//n_rows)::BIGINT AS skew_milli, top_key
          |FROM s, p50, p99, top""".stripMargin,

      // INDEPENDENT triangle count: id-ordered triple join (x<y<z), not a
      // replay of the degree-orientation plan
      "triangle_count" ->
        """WITH e AS (
          |  SELECT doc_id%20 AS s, doc_id%15 + 20 AS d FROM documents
          |  UNION ALL SELECT doc_id%15 + 20, doc_id%11 + 40 FROM documents
          |  UNION ALL SELECT doc_id%20, doc_id%11 + 40 FROM documents),
          |und AS (SELECT DISTINCT least(s,d) AS a, greatest(s,d) AS b
          |  FROM e WHERE s <> d),
          |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM und e1
          |  JOIN und e2 ON e2.a = e1.a AND e1.b < e2.b
          |  JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b),
          |c AS (SELECT x AS node FROM tri
          |  UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
          |SELECT node, count(*)::BIGINT AS triangles FROM c GROUP BY 1""".stripMargin,

      "link_graph" ->
        s"""WITH e AS (
           |  SELECT CASE WHEN doc_id%5=0 THEN 'news.co.uk'
           |    ELSE 's'||(doc_id%7)::VARCHAR||'.org' END AS src_domain,
           |  'site'||(doc_id%4)::VARCHAR||'.com' AS dst_domain FROM documents
           |  UNION ALL
           |  SELECT 's'||(doc_id%7)::VARCHAR||'.org', 'news.co.uk'
           |  FROM documents WHERE doc_id%3=0 AND doc_id%5<>0)
           |SELECT src_domain, dst_domain, count(*)::BIGINT AS n_links
           |FROM e GROUP BY 1, 2""".stripMargin,

      "cocitation_pairs" ->
        s"""WITH e AS (
           |  SELECT 'p'||doc_id::VARCHAR AS src,
           |    'site'||(doc_id%6)::VARCHAR AS dst FROM documents
           |  UNION ALL
           |  SELECT 'p'||doc_id::VARCHAR,
           |    'site'||((doc_id*2+1)%6)::VARCHAR FROM documents
           |  UNION ALL
           |  SELECT 'p'||doc_id::VARCHAR, 'hub.com' FROM documents
           |  WHERE doc_id%3=0
           |  UNION ALL
           |  SELECT 'p'||doc_id::VARCHAR, 'x'||k::VARCHAR
           |  FROM documents CROSS JOIN range(0,6) r(k) WHERE doc_id%97=0),
           |d AS (SELECT DISTINCT src, dst FROM e),
           |deg AS (SELECT src, count(*) AS n FROM d GROUP BY 1),
           |ok AS (SELECT d.src, d.dst FROM d JOIN deg USING (src)
           |  WHERE n <= 4)
           |SELECT a.dst AS dst_a, b.dst AS dst_b,
           |  count(*)::BIGINT AS n_cocitations
           |FROM ok a JOIN ok b ON a.src = b.src AND a.dst < b.dst
           |GROUP BY 1, 2""".stripMargin,

      "domain_stats" ->
        s"""WITH t AS (SELECT
           |  CASE WHEN doc_id%4=0 THEN 'news.co.uk'
           |       ELSE 'site'||(doc_id%10)::VARCHAR||'.org' END AS domain,
           |  (CASE WHEN length(regexp_replace(text,'^\\s+|\\s+$$','','g'))=0 THEN 0
           |    ELSE len(string_split_regex(regexp_replace(text,'^\\s+|\\s+$$','','g'),'\\s+')) END)::BIGINT AS tok,
           |  length(text)::BIGINT AS chars
           |  FROM documents)
           |SELECT domain, count(*)::BIGINT AS n_docs, sum(tok)::BIGINT AS total_ws_tokens,
           |  sum(chars)::BIGINT AS total_chars, max(tok)::BIGINT AS max_doc_tokens
           |FROM t GROUP BY domain""".stripMargin,

      "url_normalize" ->
        s"""WITH u AS (SELECT doc_id,
           |  (CASE WHEN doc_id%2=0 THEN 'HTTPS' ELSE 'http' END)||'://'||
           |  (CASE WHEN doc_id%17=0 THEN 'u:p@' ELSE '' END)||
           |  'WWW.Site'||(doc_id%7)::VARCHAR||
           |  (CASE WHEN doc_id%5=0 THEN '.News.CO.UK' ELSE '.Example.COM' END)||
           |  (CASE WHEN doc_id%3=0 THEN (CASE WHEN doc_id%2=0 THEN ':443' ELSE ':80' END)
           |        WHEN doc_id%3=1 THEN ':8080' ELSE '' END)||
           |  (CASE WHEN doc_id%11=0 THEN '' ELSE '/P/'||doc_id::VARCHAR END)||
           |  (CASE doc_id%4 WHEN 0 THEN '?b=2&utm_source=nl&a=1' WHEN 1 THEN '?gclid=z'
           |        WHEN 2 THEN '?z=9&y=8&fbclid=k' ELSE '' END)||
           |  (CASE WHEN doc_id%6=0 THEN '#sec'||doc_id::VARCHAR ELSE '' END) AS url,
           |  'www.site'||(doc_id%7)::VARCHAR||
           |  (CASE WHEN doc_id%5=0 THEN '.news.co.uk' ELSE '.example.com' END) AS h
           |  FROM documents)
           |SELECT doc_id, url,
           |  (CASE WHEN doc_id%2=0 THEN 'https' ELSE 'http' END)||'://'||h||
           |  (CASE WHEN doc_id%3=1 THEN ':8080' ELSE '' END)||
           |  (CASE WHEN doc_id%11=0 THEN '/' ELSE '/P/'||doc_id::VARCHAR END)||
           |  (CASE WHEN doc_id%4=0 THEN '?a=1&b=2' WHEN doc_id%4=2 THEN '?y=8&z=9'
           |        ELSE '' END) AS url_norm,
           |  h AS host,
           |  (CASE WHEN doc_id%5=0 THEN 'news.co.uk' ELSE 'example.com' END) AS domain
           |FROM u""".stripMargin,

      "psl_domains" ->
        s"""WITH h AS (SELECT doc_id,
           |  CASE doc_id % 8
           |  WHEN 0 THEN 'www.sub'||(doc_id%3)::VARCHAR||'.site'||(doc_id%5)::VARCHAR||'.co.uk'
           |  WHEN 1 THEN 'b'||(doc_id%3)::VARCHAR||'.shop.ex'||(doc_id%5)::VARCHAR||'.ck'
           |  WHEN 2 THEN 'shop.www.ck'
           |  WHEN 3 THEN 'sub'||(doc_id%3)::VARCHAR||'.city.kawasaki.jp'
           |  WHEN 4 THEN 'x.a.ward'||(doc_id%5)::VARCHAR||'.kawasaki.jp'
           |  WHEN 5 THEN 'www.school'||(doc_id%5)::VARCHAR||'.k12.ca.us'
           |  WHEN 6 THEN 'img.b'||(doc_id%5)::VARCHAR||'.s3.amazonaws.com'
           |  ELSE 'cdn.sub.host'||(doc_id%5)::VARCHAR||'.unlisted'||(doc_id%3)::VARCHAR
           |  END AS host FROM documents)
           |SELECT doc_id, host,
           |  CASE doc_id % 8
           |  WHEN 0 THEN 'site'||(doc_id%5)::VARCHAR||'.co.uk'
           |  WHEN 1 THEN 'shop.ex'||(doc_id%5)::VARCHAR||'.ck'
           |  WHEN 2 THEN 'www.ck'
           |  WHEN 3 THEN 'city.kawasaki.jp'
           |  WHEN 4 THEN 'a.ward'||(doc_id%5)::VARCHAR||'.kawasaki.jp'
           |  WHEN 5 THEN 'school'||(doc_id%5)::VARCHAR||'.k12.ca.us'
           |  WHEN 6 THEN 'b'||(doc_id%5)::VARCHAR||'.s3.amazonaws.com'
           |  ELSE 'host'||(doc_id%5)::VARCHAR||'.unlisted'||(doc_id%3)::VARCHAR
           |  END AS domain
           |FROM h""".stripMargin,

      "html_meta" ->
        s"""SELECT doc_id,
           |  CASE WHEN doc_id%7=0 THEN '' ELSE 'Doc '||doc_id::VARCHAR||' overview' END AS title,
           |  CASE WHEN doc_id%11=0 THEN '' ELSE 'Desc '||(doc_id%5)::VARCHAR END AS description,
           |  CASE WHEN doc_id%3=2 THEN '' ELSE 'OG '||doc_id::VARCHAR END AS og_title,
           |  CASE doc_id%4 WHEN 0 THEN 'http://ex.com/p/'||doc_id::VARCHAR
           |       WHEN 1 THEN 'https://ex.org/'||doc_id::VARCHAR ELSE '' END AS canonical_url,
           |  CASE doc_id%5 WHEN 0 THEN 'en' WHEN 1 THEN 'fr-fr' ELSE '' END AS lang_attr
           |FROM documents""".stripMargin,

      "anchor_texts" ->
        s"""WITH p AS (
           |  SELECT 'http://t'||(doc_id%5)::VARCHAR||'.com/page' AS dst, 'Alpha' AS anchor FROM documents
           |  UNION ALL
           |  SELECT 'http://t'||(doc_id%5)::VARCHAR||'.com/page', 'Beta '||(doc_id%3)::VARCHAR FROM documents
           |  UNION ALL
           |  SELECT 'https://hub.example.org/', 'Gamma '||(doc_id%3)::VARCHAR FROM documents WHERE doc_id%4=0),
           |c AS (SELECT dst, anchor, count(*) AS n FROM p GROUP BY 1,2),
           |r AS (SELECT dst, anchor, n,
           |  row_number() OVER (PARTITION BY dst ORDER BY n DESC, anchor ASC) AS rn FROM c)
           |SELECT dst, sum(n)::BIGINT AS n_anchors, count(*)::BIGINT AS n_distinct_texts,
           |  string_agg(anchor, '|' ORDER BY rn) FILTER (WHERE rn <= 2) AS top_anchors
           |FROM r GROUP BY dst""".stripMargin,

      "c4_clean" ->
        s"""WITH d2 AS (SELECT doc_id,
           |  'Intro line with words '||substr(text,1,30)||'.'||chr(10)||
           |  'no terminal punctuation line'||chr(10)||
           |  'Short.'||chr(10)||
           |  (CASE WHEN doc_id%4=0 THEN 'Please enable JavaScript now.' ELSE 'Second real line stays here!' END)||chr(10)||
           |  (CASE WHEN doc_id%6=0 THEN 'This mentions lorem ipsum dolor.' ELSE 'Third line asks a question? Yes. It does. Clearly.' END)||chr(10)||
           |  (CASE WHEN doc_id%9=0 THEN 'code block { return one; }' ELSE 'Final line of the page.' END) AS t2
           |  FROM documents),
           |k AS (SELECT doc_id, t2,
           |  list_filter(list_transform(string_split(t2, chr(10)), x -> regexp_replace(x, '^\\s+|\\s+$$', '', 'g')),
           |    x -> regexp_matches(x, '[.!?"'']$$') AND len(string_split_regex(x, '\\s+')) >= 3
           |      AND NOT contains(lower(x), 'javascript')) AS kl
           |  FROM d2),
           |c AS (SELECT doc_id, t2, kl, array_to_string(kl, chr(10)) AS clean_text FROM k)
           |SELECT doc_id, clean_text,
           |  len(kl)::BIGINT AS n_lines_kept,
           |  len(regexp_extract_all(clean_text, '[.!?]'))::BIGINT AS n_sentences,
           |  (len(kl) >= 1 AND len(regexp_extract_all(clean_text, '[.!?]')) >= 5
           |    AND NOT contains(lower(t2), 'lorem ipsum')
           |    AND NOT contains(t2, '{') AND NOT contains(t2, '}')) AS kept
           |FROM c""".stripMargin,

      "mojibake_fix" ->
        s"""SELECT doc_id,
           |  CASE WHEN doc_id%3=0 THEN text
           |       ELSE substr(text,1,40)||' café — “naÃ¯ve… 90°' END AS fixed,
           |  doc_id%3<>0 AS changed
           |FROM documents""".stripMargin,

      // NOTE the rounding idiom: quality values are small-denominator
      // rationals that often land EXACTLY on the .00005 decimal boundary,
      // where DuckDB's double round (std::round(x*1e4)) and Spark's
      // (HALF_UP on the shortest decimal string) disagree. Casting the
      // double through VARCHAR reproduces the shortest round-trip string on
      // both engines, and decimal round is HALF_UP — bit-identical to Spark.
      "quality_score" ->
        s"""WITH t AS (SELECT doc_id, text, ${toks.format("text")} AS toks,
           |  greatest(length(text),1)::DOUBLE AS n FROM documents),
           |raw AS (SELECT doc_id,
           |  0.25*least(length(text)::DOUBLE/500.0, 1.0)
           |    + 0.35*((length(text)-length(regexp_replace(text,'[A-Za-z]','','g')))::DOUBLE/n)
           |    + 0.25*(1.0 - least(((length(text)-length(regexp_replace(text,'[.,;:!?]','','g')))::DOUBLE/n)*10.0, 1.0))
           |    + 0.15*least((len(list_filter(toks, t -> list_contains(['the','and','of','to','in','is','a','that'], t)))::DOUBLE
           |        / greatest(len(toks),1)::DOUBLE)*4.0, 1.0) AS q
           |  FROM t)
           |SELECT doc_id, round(CAST(q AS VARCHAR)::DECIMAL(25,20), 4)::DOUBLE AS quality
           |FROM raw""".stripMargin,

      "char_entropy" ->
        """WITH ch AS (SELECT doc_id, unnest(string_split(text,'')) AS c
          |  FROM documents),
          |hist AS (SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY 1,2),
          |agg AS (SELECT doc_id, sum(cnt)::BIGINT AS nch,
          |  count(*)::BIGINT AS ndis,
          |  sum(cnt * round(ln(cnt)*1e6)::BIGINT)::BIGINT AS sum_cl
          |  FROM hist GROUP BY 1)
          |SELECT d.doc_id,
          |  coalesce(nch, 0) AS n_chars,
          |  coalesce(ndis, 0) AS n_distinct,
          |  CASE WHEN coalesce(nch, 0) = 0 THEN 0
          |    ELSE round(ln(nch)*1e6)::BIGINT - sum_cl // nch
          |  END AS entropy_micro
          |FROM documents d LEFT JOIN agg USING (doc_id)""".stripMargin,

      "readability" -> readabilityOracleSql,

      "length_percentiles" ->
        """WITH b AS (SELECT lang AS slice, length(text)::BIGINT AS v
          |  FROM documents),
          |h AS (SELECT slice, v, count(*)::BIGINT AS c FROM b GROUP BY 1, 2),
          |t AS (SELECT slice, sum(c)::BIGINT AS n FROM h GROUP BY 1),
          |cu AS (SELECT slice, v,
          |  sum(c) OVER (PARTITION BY slice ORDER BY v) AS cm FROM h)
          |SELECT cu.slice, t.n,
          |  min(CASE WHEN cm >= (n-1)*100//1000+1 THEN v END)::BIGINT AS p10,
          |  min(CASE WHEN cm >= (n-1)*500//1000+1 THEN v END)::BIGINT AS p50,
          |  min(CASE WHEN cm >= (n-1)*900//1000+1 THEN v END)::BIGINT AS p90
          |FROM cu JOIN t USING (slice) GROUP BY 1, 2""".stripMargin,

      "readability_by_slice" ->
        s"""WITH r AS (SELECT * FROM ($readabilityOracleSql) rr),
           |j AS (SELECT d.lang AS slice, r.ease_milli, r.grade_milli
           |  FROM r JOIN documents d USING (doc_id)),
           |he AS (SELECT slice, ease_milli AS v, count(*)::BIGINT AS c
           |  FROM j WHERE ease_milli IS NOT NULL GROUP BY 1, 2),
           |te AS (SELECT slice, sum(c)::BIGINT AS n FROM he GROUP BY 1),
           |ce AS (SELECT slice, v,
           |  sum(c) OVER (PARTITION BY slice ORDER BY v) AS cm FROM he),
           |me AS (SELECT ce.slice, min(v)::BIGINT AS median_ease_milli
           |  FROM ce JOIN te USING (slice)
           |  WHERE cm >= (n - 1) // 2 + 1 GROUP BY 1),
           |hg AS (SELECT slice, grade_milli AS v, count(*)::BIGINT AS c
           |  FROM j WHERE grade_milli IS NOT NULL GROUP BY 1, 2),
           |tg AS (SELECT slice, sum(c)::BIGINT AS n FROM hg GROUP BY 1),
           |cg AS (SELECT slice, v,
           |  sum(c) OVER (PARTITION BY slice ORDER BY v) AS cm FROM hg),
           |mg AS (SELECT cg.slice, min(v)::BIGINT AS median_grade_milli
           |  FROM cg JOIN tg USING (slice)
           |  WHERE cm >= (n - 1) // 2 + 1 GROUP BY 1)
           |SELECT me.slice, te.n, me.median_ease_milli, mg.median_grade_milli
           |FROM me JOIN te USING (slice) JOIN mg ON mg.slice = me.slice""".stripMargin,


      "quality_top_fraction" ->
        s"""WITH ch AS (SELECT doc_id, unnest(string_split(text,'')) AS c
           |  FROM documents),
           |hist AS (SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY 1,2),
           |agg AS (SELECT doc_id, sum(cnt)::BIGINT AS nch,
           |  sum(cnt * round(ln(cnt)*1e6)::BIGINT)::BIGINT AS sum_cl
           |  FROM hist GROUP BY 1),
           |ent AS (SELECT d.doc_id,
           |  CASE WHEN coalesce(nch, 0) = 0 THEN 0
           |    ELSE round(ln(nch)*1e6)::BIGINT - sum_cl // nch
           |  END AS entropy_micro
           |  FROM documents d LEFT JOIN agg USING (doc_id)),
           |t AS (SELECT doc_id, text, ${toks.format("text")} AS toks FROM documents),
           |c2 AS (SELECT doc_id, text,
           |  len(list_filter(toks, t -> list_contains(['the','and','of','to','in','is','a','that'], t))) AS en,
           |  len(list_filter(toks, t -> list_contains(['el','la','de','que','los','las','una','es'], t))) AS es,
           |  len(list_filter(toks, t -> list_contains(['der','die','und','das','ist','nicht','ein','zu'], t))) AS de,
           |  len(list_filter(toks, t -> list_contains(['le','la','les','des','et','est','une','dans'], t))) AS fr
           |  FROM t),
           |lng AS (SELECT doc_id,
           |  CASE WHEN length(regexp_replace(text,'[^\\x{4E00}-\\x{9FFF}]','','g')) > 0 THEN 'zh'
           |    WHEN en >= es AND en >= de AND en >= fr THEN 'en'
           |    WHEN es >= de AND es >= fr THEN 'es'
           |    WHEN de >= fr THEN 'de' ELSE 'fr' END AS lang
           |  FROM c2)
           |SELECT e.doc_id, lang, entropy_micro,
           |  percent_rank() OVER (PARTITION BY lang
           |    ORDER BY entropy_micro DESC, e.doc_id) <= 0.25 AS keep
           |FROM ent e JOIN lng USING (doc_id)""".stripMargin,

      // curate-battery replay: blocklist + Gopher rules + classifier
      // fragments composed over RAW text (repairs are no-ops on this
      // corpus by construction — a kernel that mangles clean text fails)
      "curate_battery" ->
        s"""WITH b AS (SELECT doc_id, source, text,
           |  regexp_replace(text, '^\\s+|\\s+$$', '', 'g') AS t,
           |  ${toks.format("text")} AS ks FROM documents),
           |w AS (SELECT doc_id, source, ks, t,
           |  CASE WHEN length(t)=0 THEN [] ELSE string_split_regex(t, '\\s+') END AS ws,
           |  list_filter(list_transform(string_split(text, chr(10)),
           |    x -> regexp_replace(x, '^\\s+|\\s+$$', '', 'g')), x -> x <> '') AS ls FROM b),
           |m AS (SELECT doc_id, source,
           |  len(ks)::BIGINT AS n_tokens,
           |  len(list_filter(ks, x -> list_contains(['slow','gibberish'], x)))::BIGINT AS n_blocked,
           |  len(ws)::BIGINT AS n_words,
           |  length(regexp_replace(t, '\\s+', '', 'g'))::BIGINT AS word_chars,
           |  ((length(t) - length(replace(t, '#', ''))) +
           |   len(regexp_extract_all(t, '\\.\\.\\.')) +
           |   (length(t) - length(replace(t, '…', ''))))::BIGINT AS n_symbols,
           |  len(ls)::BIGINT AS n_lines,
           |  len(list_filter(ls, x -> starts_with(x, '-') OR starts_with(x, '*')
           |    OR starts_with(x, '•')))::BIGINT AS n_bullet_lines,
           |  len(list_filter(ls, x -> ends_with(x, '...') OR ends_with(x, '…')))::BIGINT AS n_ellipsis_lines,
           |  len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))::BIGINT AS n_alpha_words,
           |  ((CASE WHEN list_contains(ks, 'the') THEN 1 ELSE 0 END) +
           |   (CASE WHEN list_contains(ks, 'be') THEN 1 ELSE 0 END) +
           |   (CASE WHEN list_contains(ks, 'to') THEN 1 ELSE 0 END) +
           |   (CASE WHEN list_contains(ks, 'of') THEN 1 ELSE 0 END) +
           |   (CASE WHEN list_contains(ks, 'and') THEN 1 ELSE 0 END) +
           |   (CASE WHEN list_contains(ks, 'that') THEN 1 ELSE 0 END) +
           |   (CASE WHEN list_contains(ks, 'have') THEN 1 ELSE 0 END) +
           |   (CASE WHEN list_contains(ks, 'with') THEN 1 ELSE 0 END))::BIGINT AS n_stop
           |  FROM w),
           |g AS (SELECT doc_id, n_tokens,
           |  (list_contains(['src3','src7','src13'], source)
           |    OR (n_blocked * 1000 // greatest(n_tokens, 1)) >= 40) AS blocked,
           |  ((n_words >= 50 AND n_words <= 100000) AND
           |   (word_chars >= 3*n_words AND word_chars <= 10*n_words) AND
           |   (10*n_symbols <= n_words) AND (10*n_bullet_lines <= 9*n_lines) AND
           |   (10*n_ellipsis_lines <= 3*n_lines) AND
           |   (5*n_alpha_words >= 4*n_words) AND (n_stop >= 2)) AS gopher_kept
           |  FROM m),
           |tk AS (SELECT doc_id, ${toks.format("text")} AS l FROM documents),
           |feats AS (
           |  SELECT doc_id, unnest(l) AS f FROM tk
           |  UNION ALL
           |  SELECT doc_id, unnest(list_transform(range(len(l)-1),
           |    i -> l[i+1]||' '||l[i+2])) AS f FROM tk WHERE len(l) >= 2),
           |fb AS (SELECT doc_id, ${hash60("'f:'||f")} % 4096 AS bucket FROM feats),
           |sc AS (SELECT doc_id, sum((${hash60("'w:'||bucket")} % 2001) - 1000) AS s
           |  FROM fb GROUP BY 1)
           |SELECT g.doc_id::VARCHAR AS doc_id, g.n_tokens, g.blocked, g.gopher_kept,
           |  coalesce(s, 0)::BIGINT AS clf_score_milli,
           |  (NOT g.blocked AND g.gopher_kept AND coalesce(s, 0) > 0) AS kept
           |FROM g LEFT JOIN sc USING (doc_id)""".stripMargin,

      // blocklist replay: same tokens, same literal lists, integer density
      "blocklist_filter" ->
        s"""WITH tk AS (SELECT doc_id, source AS domain,
           |  ${toks.format("text")} AS l FROM documents),
           |f AS (SELECT doc_id, domain, len(l)::BIGINT AS n_tokens,
           |  len(list_filter(l, x -> list_contains(['slow','gibberish'], x)))::BIGINT AS n_blocked
           |  FROM tk)
           |SELECT doc_id, domain, n_tokens, n_blocked,
           |  (n_blocked * 1000 // greatest(n_tokens, 1))::BIGINT AS blocked_ratio_milli,
           |  list_contains(['src3','src7','src13'], domain) AS domain_blocked,
           |  list_contains(['src3','src7','src13'], domain)
           |    OR (n_blocked * 1000 // greatest(n_tokens, 1)) >= 40 AS is_blocked
           |FROM f""".stripMargin,

      // classifier replay: same tokens, same unigram+bigram feature set,
      // md5-derived buckets AND weights, exact integer milli sums
      "quality_classifier" ->
        s"""WITH tk AS (SELECT doc_id, ${toks.format("text")} AS l FROM documents),
           |feats AS (
           |  SELECT doc_id, unnest(l) AS f FROM tk
           |  UNION ALL
           |  SELECT doc_id, unnest(list_transform(range(len(l)-1),
           |    i -> l[i+1]||' '||l[i+2])) AS f FROM tk WHERE len(l) >= 2),
           |fb AS (SELECT doc_id, ${hash60("'f:'||f")} % 4096 AS bucket FROM feats),
           |sc AS (SELECT doc_id, count(*) AS n,
           |        sum((${hash60("'w:'||bucket")} % 2001) - 1000) AS s
           |       FROM fb GROUP BY 1)
           |SELECT d.doc_id, coalesce(n,0)::BIGINT AS n_features,
           |  coalesce(s,0)::BIGINT AS score_milli,
           |  coalesce(s,0) > 0 AS is_positive
           |FROM documents d LEFT JOIN sc USING (doc_id)""".stripMargin,

      // LR-training replay: both gradient-descent rounds unrolled. Round 1
      // starts from w=0 so p=500 for every doc. NOTE DuckDB's integer //
      // TRUNCATES toward zero ((-5)//4 = -1), so every division below is an
      // explicit floor() to match the Spark side's floor-div columns on
      // negative gradients.
      "lr_train" ->
        s"""WITH t AS (SELECT doc_id, $docText AS t2,
           |  CASE WHEN doc_id%13=0 THEN 1000 ELSE 0 END AS y FROM documents),
           |tk AS (SELECT doc_id, ${toks.format("t2")} AS l FROM t),
           |feats AS (
           |  SELECT doc_id, unnest(l) AS f FROM tk
           |  UNION ALL
           |  SELECT doc_id, unnest(list_transform(range(len(l)-1),
           |    i -> l[i+1]||' '||l[i+2])) AS f FROM tk WHERE len(l) >= 2),
           |fb AS (SELECT doc_id, ${hash60("'f:'||f")} % 4096 AS bucket FROM feats),
           |g1 AS (SELECT bucket, sum(500 - y) AS g
           |  FROM fb JOIN t USING (doc_id) GROUP BY 1),
           |w1 AS (SELECT bucket, -floor(g / 64.0)::BIGINT AS w FROM g1),
           |s2 AS (SELECT fb.doc_id, sum(coalesce(w1.w, 0)) AS s
           |  FROM fb LEFT JOIN w1 USING (bucket) GROUP BY 1),
           |p2 AS (SELECT t.doc_id, y,
           |  greatest(0, least(1000, 500 + floor(coalesce(s, 0) / 4.0)::BIGINT)) AS p
           |  FROM t LEFT JOIN s2 USING (doc_id)),
           |g2 AS (SELECT bucket, sum(p - y) AS g
           |  FROM fb JOIN p2 USING (doc_id) GROUP BY 1),
           |w2 AS (SELECT coalesce(w1.bucket, g2.bucket) AS bucket,
           |  coalesce(w1.w, 0) - floor(coalesce(g2.g, 0) / 64.0)::BIGINT AS weight_milli
           |  FROM w1 FULL JOIN g2 ON w1.bucket = g2.bucket)
           |SELECT bucket::BIGINT AS bucket, weight_milli::BIGINT AS weight_milli
           |FROM w2""".stripMargin,

      "token_efficiency" ->
        """WITH t AS (SELECT lang AS slice,
          |  octet_length(encode(text))::BIGINT AS b,
          |  (CASE WHEN length(regexp_replace(text,'^\s+|\s+$','','g'))=0 THEN 0
          |    ELSE len(string_split_regex(regexp_replace(text,'^\s+|\s+$','','g'),'\s+')) END)::BIGINT AS wst,
          |  len(regexp_extract_all(text,'[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))::BIGINT AS bpet
          |  FROM documents)
          |SELECT slice, count(*)::BIGINT AS n_docs,
          |  sum(b)::BIGINT AS total_bytes,
          |  sum(wst)::BIGINT AS ws_tokens,
          |  sum(bpet)::BIGINT AS bpe_tokens,
          |  (CASE WHEN sum(wst)=0 THEN NULL
          |    ELSE 1000*sum(b) // sum(wst) END)::BIGINT AS bytes_per_ws_milli,
          |  (CASE WHEN sum(bpet)=0 THEN NULL
          |    ELSE 1000*sum(b) // sum(bpet) END)::BIGINT AS bytes_per_bpe_milli
          |FROM t GROUP BY slice""".stripMargin,

      "domain_wilson" ->
        s"""WITH t AS (SELECT
          |  $synthDomainSql AS domain,
          |  CASE WHEN (CASE WHEN length(regexp_replace(text,'^\\s+|\\s+$$','','g'))=0 THEN 0
          |    ELSE len(string_split_regex(regexp_replace(text,'^\\s+|\\s+$$','','g'),'\\s+')) END) >= 30
          |    THEN 1 ELSE 0 END AS good
          |  FROM documents),
          |g AS (SELECT domain AS slice, count(*)::BIGINT AS n_docs,
          |  sum(good)::BIGINT AS n_good FROM t GROUP BY 1),
          |w AS (SELECT slice, n_docs, n_good,
          |  1000 * n_good // n_docs AS good_milli,
          |  (n_good * (n_docs - n_good) // n_docs) * 1000000
          |    + (n_good * (n_docs - n_good) % n_docs) * 1000000 // n_docs
          |    + 960400 AS v_micro
          |  FROM g)
          |SELECT slice, n_docs, n_good, good_milli,
          |  greatest((n_good * 1000000 + 1920800
          |      - 1960 * floor(sqrt(v_micro))::BIGINT)
          |    // (n_docs * 1000 + 3842), 0)::BIGINT AS wilson_lower_milli
          |FROM w""".stripMargin,

      "length_outliers" ->
        """WITH base AS (SELECT doc_id, lang AS slice,
          |  length(text)::BIGINT AS len FROM documents
          |  WHERE text IS NOT NULL),
          |hist AS (SELECT slice, len, count(*)::BIGINT AS c
          |  FROM base GROUP BY 1, 2),
          |tot AS (SELECT slice, sum(c)::BIGINT AS n FROM hist GROUP BY 1),
          |cum AS (SELECT slice, len,
          |  sum(c) OVER (PARTITION BY slice ORDER BY len) AS cm FROM hist),
          |med AS (SELECT cum.slice, min(len)::BIGINT AS median_len
          |  FROM cum JOIN tot USING (slice)
          |  WHERE cm >= (n - 1) // 2 + 1 GROUP BY 1),
          |dh AS (SELECT h.slice, abs(h.len - m.median_len) AS d,
          |  sum(h.c)::BIGINT AS dc
          |  FROM hist h JOIN med m ON h.slice = m.slice GROUP BY 1, 2),
          |dtot AS (SELECT slice, sum(dc)::BIGINT AS n FROM dh GROUP BY 1),
          |dcum AS (SELECT slice, d,
          |  sum(dc) OVER (PARTITION BY slice ORDER BY d) AS cm FROM dh),
          |mad AS (SELECT dcum.slice, min(d)::BIGINT AS mad
          |  FROM dcum JOIN dtot USING (slice)
          |  WHERE cm >= (n - 1) // 2 + 1 GROUP BY 1)
          |SELECT b.doc_id, b.slice, b.len, m.median_len, a.mad,
          |  (abs(b.len - m.median_len) * 1000 > 3000 * a.mad) AS outlier
          |FROM base b JOIN med m ON b.slice = m.slice
          |  JOIN mad a ON b.slice = a.slice""".stripMargin,

      "domain_hhi" ->
        s"""WITH t AS (SELECT lang AS slice,
           |  $synthDomainSql AS dom
           |  FROM documents),
          |c AS (SELECT slice, dom, count(*)::BIGINT AS c FROM t GROUP BY 1, 2),
          |a AS (SELECT slice, sum(c)::HUGEINT AS n, count(*)::BIGINT AS nd,
          |  max(c)::BIGINT AS mx, sum(c::HUGEINT * c) AS s2
          |  FROM c GROUP BY 1)
          |SELECT slice, n::BIGINT AS n_docs, nd AS n_domains,
          |  ((s2 * 1000000) // (n * n))::BIGINT AS hhi_micro,
          |  (1000 * mx // n)::BIGINT AS top_share_milli
          |FROM a""".stripMargin,

      "name_jw" ->
        """WITH n AS (SELECT doc_id,
          |  ['acme insurance company','globex mutual holdings',
          |   'initech property casualty','umbrella corp underwriters',
          |   'stark industries assurance','wayne enterprises group',
          |   'tyrell surety partners','hooli national indemnity'
          |  ][(doc_id%8)::INT + 1] AS a FROM documents),
          |p AS (SELECT doc_id, a, CASE doc_id%5
          |  WHEN 0 THEN a
          |  WHEN 1 THEN substr(a,2,1)||substr(a,1,1)||substr(a,3)
          |  WHEN 2 THEN substr(a,1,2)||substr(a,4)
          |  WHEN 3 THEN a||' llc'
          |  ELSE 'unrelated name co' END AS b FROM n)
          |SELECT doc_id, round(jaro_winkler_similarity(a, b), 6) AS jw
          |FROM p""".stripMargin,

      "lsh_curve" ->
        """WITH s AS (SELECT (range + 1) * 25 AS j_milli FROM range(39)),
          |a AS (SELECT j_milli,
          |  j_milli*j_milli // 1000 * j_milli // 1000 * j_milli // 1000
          |    AS j_r_milli FROM s),
          |q AS (SELECT j_milli, j_r_milli, 1000 - j_r_milli AS q FROM a),
          |w AS (SELECT j_milli, j_r_milli, (q*q) // 1000 AS q2 FROM q),
          |x AS (SELECT j_milli, j_r_milli, (q2*q2) // 1000 AS q4 FROM w)
          |SELECT j_milli::BIGINT AS j_milli,
          |  j_r_milli::BIGINT AS j_r_milli,
          |  (1000 - (q4*q4) // 1000)::BIGINT AS candidate_milli
          |FROM x""".stripMargin,

      "revision_diff" ->
        """WITH p AS (SELECT doc_id, text AS a,
          |  CASE doc_id%4 WHEN 0 THEN text
          |    WHEN 1 THEN 'X' || substr(text, 2)
          |    WHEN 2 THEN text || ' tail'
          |    ELSE reverse(text) END AS b
          |  FROM documents)
          |SELECT doc_id, length(a)::BIGINT AS len_a,
          |  length(b)::BIGINT AS len_b,
          |  (CASE WHEN length(a) > 300 OR length(b) > 300 THEN NULL
          |    ELSE least(levenshtein(a, b), 17) END)::BIGINT AS dist,
          |  (CASE WHEN length(a) > 300 OR length(b) > 300 THEN NULL
          |    WHEN levenshtein(a, b) > 16 THEN NULL
          |    ELSE 1000 * levenshtein(a, b)
          |      // greatest(greatest(length(a), length(b)), 1)
          |    END)::BIGINT AS changed_milli
          |FROM p""".stripMargin,

      "signal_corr" ->
        """WITH b AS (SELECT length(text)::BIGINT AS x1,
          |  (CASE WHEN length(regexp_replace(text,'^\s+|\s+$','','g'))=0 THEN 0
          |    ELSE len(string_split_regex(regexp_replace(text,'^\s+|\s+$','','g'),'\s+')) END)::BIGINT AS x2,
          |  len(regexp_extract_all(text,'[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))::BIGINT AS x3
          |  FROM documents),
          |a AS (SELECT count(*)::HUGEINT AS n,
          |  sum(x1)::HUGEINT AS s1, sum(x2)::HUGEINT AS s2,
          |  sum(x3)::HUGEINT AS s3,
          |  sum(x1::HUGEINT*x1) AS s11, sum(x2::HUGEINT*x2) AS s22,
          |  sum(x3::HUGEINT*x3) AS s33, sum(x1::HUGEINT*x2) AS s12,
          |  sum(x1::HUGEINT*x3) AS s13, sum(x2::HUGEINT*x3) AS s23
          |  FROM b)
          |SELECT n::BIGINT AS n,
          |  (CASE WHEN n*s11-s1*s1 = 0 OR n*s22-s2*s2 = 0 THEN NULL
          |    ELSE ((n*s12-s1*s2)*1000000)
          |      // floor(sqrt(((n*s11-s1*s1)*(n*s22-s2*s2))::DOUBLE))::HUGEINT
          |    END)::BIGINT AS r_chars_ws_micro,
          |  (CASE WHEN n*s11-s1*s1 = 0 OR n*s33-s3*s3 = 0 THEN NULL
          |    ELSE ((n*s13-s1*s3)*1000000)
          |      // floor(sqrt(((n*s11-s1*s1)*(n*s33-s3*s3))::DOUBLE))::HUGEINT
          |    END)::BIGINT AS r_chars_bpe_micro,
          |  (CASE WHEN n*s22-s2*s2 = 0 OR n*s33-s3*s3 = 0 THEN NULL
          |    ELSE ((n*s23-s2*s3)*1000000)
          |      // floor(sqrt(((n*s22-s2*s2)*(n*s33-s3*s3))::DOUBLE))::HUGEINT
          |    END)::BIGINT AS r_ws_bpe_micro
          |FROM a""".stripMargin,

      "takedown_by_content" ->
        s"""WITH f AS (SELECT doc_id,
           |  ${hash60("regexp_replace(trim(lower(text)),'\\s+',' ','g')")} AS fp
           |  FROM documents),
           |fnn AS (SELECT doc_id, fp FROM f WHERE fp IS NOT NULL),
           |listed AS (SELECT DISTINCT fp FROM fnn WHERE doc_id % 59 = 0)
           |SELECT doc_id FROM fnn
           |WHERE fp NOT IN (SELECT fp FROM listed)""".stripMargin,

      "takedown_filter" ->
        """SELECT doc_id, length(text)::BIGINT AS n_chars
          |FROM documents WHERE doc_id % 13 <> 0""".stripMargin,

      "normalize_text" ->
        """WITH t AS (SELECT doc_id,
          |  'T' || doc_id::VARCHAR ||
          |  (CASE WHEN doc_id%3=0 THEN ' &amp; &lt;tag&gt;' ELSE '' END) ||
          |  (CASE WHEN doc_id%4=0 THEN ' cafe' || chr(769) ELSE '' END) ||
          |  (CASE WHEN doc_id%7=0 THEN ' &#8212; &eacute;' ELSE '' END) ||
          |  (CASE WHEN doc_id%11=0 THEN ' &foo; &#xD800;' ELSE '' END)
          |    AS raw
          |  FROM documents),
          |d AS (SELECT doc_id, raw,
          |  replace(replace(replace(replace(replace(raw,
          |    '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
          |    '&#8212;', chr(8212)), '&eacute;', chr(233)) AS dec
          |  FROM t)
          |SELECT doc_id, nfc_normalize(dec) AS text_norm,
          |  (dec <> raw) AS entity_changed,
          |  (nfc_normalize(dec) <> dec) AS nfc_changed
          |FROM d""".stripMargin,

      "temperature_alloc" ->
        s"""WITH t AS (SELECT $synthDomainSql AS domain
          |  FROM documents),
          |c AS (SELECT domain, count(*)::BIGINT AS n_docs FROM t GROUP BY 1),
          |w AS (SELECT domain, n_docs,
          |  floor(sqrt(n_docs))::BIGINT AS weight FROM c),
          |s AS (SELECT sum(weight)::BIGINT AS tw FROM w)
          |SELECT domain, n_docs, weight,
          |  (100000 * weight // tw)::BIGINT AS alloc FROM w, s""".stripMargin,

      "langid_confusion" -> {
        val prof = graft.text.TextAnalysis.LangProfiles.toMap
        def words(l: String) = prof(l).mkString(" ")
        def inList(l: String) =
          prof(l).map(w => s"'$w'").mkString("[", ",", "]")
        s"""WITH t AS (SELECT doc_id,
           |  CASE doc_id%4 WHEN 0 THEN 'en' WHEN 1 THEN 'es'
           |    WHEN 2 THEN 'de' ELSE 'fr' END AS lang_true,
           |  (CASE doc_id%4 WHEN 0 THEN '${words("en")}'
           |    WHEN 1 THEN '${words("es")}' WHEN 2 THEN '${words("de")}'
           |    ELSE '${words("fr")}' END) ||
           |  (CASE WHEN doc_id%5=0 THEN ' ' ||
           |    CASE doc_id%4 WHEN 0 THEN '${words("es")}'
           |      WHEN 1 THEN '${words("de")}' WHEN 2 THEN '${words("fr")}'
           |      ELSE '${words("en")}' END ELSE '' END) AS text
           |  FROM documents),
           |tk AS (SELECT lang_true, ${toks.format("text")} AS toks FROM t),
           |c AS (SELECT lang_true,
           |  len(list_filter(toks, x -> list_contains(${inList("en")}, x))) AS en,
           |  len(list_filter(toks, x -> list_contains(${inList("es")}, x))) AS es,
           |  len(list_filter(toks, x -> list_contains(${inList("de")}, x))) AS de,
           |  len(list_filter(toks, x -> list_contains(${inList("fr")}, x))) AS fr
           |  FROM tk),
           |p AS (SELECT lang_true,
           |  CASE WHEN en >= es AND en >= de AND en >= fr THEN 'en'
           |    WHEN es >= de AND es >= fr THEN 'es'
           |    WHEN de >= fr THEN 'de' ELSE 'fr' END AS lang_pred
           |  FROM c)
           |SELECT lang_true, lang_pred, count(*)::BIGINT AS n
           |FROM p GROUP BY 1, 2""".stripMargin
      },

      "vocab_growth" ->
        s"""WITH mx AS (SELECT max(doc_id)::BIGINT AS mx FROM documents),
           |d AS (SELECT (doc_id * 10) // (mx + 1) AS bucket
           |  FROM documents, mx),
           |dd AS (SELECT bucket, count(*)::BIGINT AS n_docs
           |  FROM d GROUP BY 1),
           |t AS (SELECT doc_id, unnest(${toks.format("text")}) AS tok
           |  FROM documents),
           |f AS (SELECT tok, min(doc_id)::BIGINT AS fst FROM t GROUP BY 1),
           |nb AS (SELECT (fst * 10) // (mx + 1) AS bucket,
           |  count(*)::BIGINT AS new_tokens FROM f, mx GROUP BY 1)
           |SELECT dd.bucket, dd.n_docs,
           |  coalesce(nb.new_tokens, 0)::BIGINT AS new_tokens,
           |  sum(dd.n_docs) OVER (ORDER BY dd.bucket)::BIGINT AS cum_docs,
           |  sum(coalesce(nb.new_tokens, 0)) OVER (ORDER BY dd.bucket)::BIGINT
           |    AS cum_tokens
           |FROM dd LEFT JOIN nb USING (bucket)""".stripMargin,

      "js_divergence" ->
        s"""WITH c AS (SELECT slice, tok, count(*)::BIGINT AS c FROM
           |    (SELECT lang AS slice, unnest(${toks.format("text")}) AS tok
           |     FROM documents) GROUP BY 1, 2),
           |n AS (SELECT slice, sum(c)::BIGINT AS n FROM c GROUP BY 1),
           |sh AS (SELECT a.slice AS slice_a, b.slice AS slice_b,
           |  sum(a.c)::BIGINT AS sha, sum(b.c)::BIGINT AS shb,
           |  sum(a.c * (round(ln(2*a.c*nb.n)*1e6)::BIGINT
           |    - round(ln(a.c*nb.n + b.c*na.n)*1e6)::BIGINT))::BIGINT AS wa,
           |  sum(b.c * (round(ln(2*b.c*na.n)*1e6)::BIGINT
           |    - round(ln(a.c*nb.n + b.c*na.n)*1e6)::BIGINT))::BIGINT AS wb
           |  FROM c a JOIN c b ON a.tok = b.tok AND a.slice < b.slice
           |  JOIN n na ON na.slice = a.slice
           |  JOIN n nb ON nb.slice = b.slice
           |  GROUP BY 1, 2),
           |p AS (SELECT a.slice AS slice_a, a.n AS na,
           |  b.slice AS slice_b, b.n AS nb
           |  FROM n a JOIN n b ON a.slice < b.slice)
           |SELECT p.slice_a, p.slice_b,
           |  (((coalesce(wa, 0) + (na - coalesce(sha, 0)) * 693147) // na
           |    + (coalesce(wb, 0) + (nb - coalesce(shb, 0)) * 693147) // nb)
           |   // 2)::BIGINT AS js_micro
           |FROM p LEFT JOIN sh ON p.slice_a = sh.slice_a
           |  AND p.slice_b = sh.slice_b""".stripMargin,

      "zipf_slope" ->
        s"""WITH t AS (SELECT lang AS slice, ${toks.format("text")} AS tk
           |  FROM documents),
           |w AS (SELECT slice, unnest(tk) AS tok FROM t),
           |c AS (SELECT slice, tok, count(*)::BIGINT AS c
           |  FROM w GROUP BY 1, 2),
           |r AS (SELECT slice, c, row_number() OVER (PARTITION BY slice
           |  ORDER BY c DESC, tok) AS rnk FROM c),
           |x AS (SELECT slice, round(ln(rnk)*1e6)::BIGINT AS x,
           |  round(ln(c)*1e6)::BIGINT AS y FROM r WHERE rnk <= 50),
           |m AS (SELECT slice, count(*)::BIGINT AS n_ranks,
           |  sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy
           |  FROM x GROUP BY 1 HAVING count(*) >= 2),
           |mm AS (SELECT slice, n_ranks, sx // n_ranks AS mx,
           |  sy // n_ranks AS my FROM m),
           |s AS (SELECT x.slice, mm.n_ranks,
           |  sum((x.x - mm.mx) * (x.y - mm.my))::BIGINT AS sxy,
           |  sum((x.x - mm.mx) * (x.x - mm.mx))::BIGINT AS sxx
           |  FROM x JOIN mm ON x.slice = mm.slice GROUP BY 1, 2)
           |SELECT slice, n_ranks,
           |  ((sxy * 1000) // sxx)::BIGINT AS slope_milli
           |FROM s""".stripMargin,

      "token_counts" ->
        """SELECT doc_id,
          |  (CASE WHEN length(regexp_replace(text,'^\s+|\s+$','','g'))=0 THEN 0
          |    ELSE len(string_split_regex(regexp_replace(text,'^\s+|\s+$','','g'),'\s+')) END)::BIGINT AS ws_tokens,
          |  len(regexp_extract_all(text,'[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))::BIGINT AS bpe_tokens,
          |  length(text)::BIGINT AS n_chars
          |FROM documents""".stripMargin,

      "fingerprint" ->
        s"""SELECT doc_id,
           |  ${hash60("regexp_replace(trim(lower(text)),'\\s+',' ','g')")} AS fp
           |FROM documents""".stripMargin,

      "exact_dedup" ->
        s"""WITH t AS (SELECT doc_id, $docText AS t2 FROM documents),
           |f AS (SELECT doc_id,
           |  ${hash60("regexp_replace(trim(lower(t2)),'\\s+',' ','g')")} AS fp FROM t)
           |SELECT doc_id, min(doc_id) OVER (PARTITION BY fp) AS canonical_id,
           |  count(*) OVER (PARTITION BY fp) AS group_size,
           |  doc_id <> min(doc_id) OVER (PARTITION BY fp) AS is_duplicate
           |FROM f""".stripMargin,

      "percentiles" ->
        """SELECT l_returnflag,
          |  round(quantile_cont(l_quantity, 0.25), 6) AS qty_p25,
          |  round(quantile_cont(l_quantity, 0.5), 6) AS qty_p50,
          |  round(quantile_cont(l_extendedprice, 0.75), 6) AS price_p75
          |FROM lineitem GROUP BY 1""".stripMargin,

      // KMV replay: k smallest distinct 60-bit hashes per group, estimate
      // (k-1)·2⁶⁰ / kth in exact 128-bit (HUGEINT) integer division
      "kmv_distinct" ->
        """WITH h AS (SELECT DISTINCT l_returnflag,
          |  ('0x'||substr(md5(l_partkey::VARCHAR),1,15))::BIGINT AS hv FROM lineitem),
          |r AS (SELECT l_returnflag, hv,
          |  row_number() OVER (PARTITION BY l_returnflag ORDER BY hv) AS rn FROM h),
          |a AS (SELECT l_returnflag, count(*) AS cnt,
          |  max(CASE WHEN rn = 64 THEN hv END) AS kth FROM r WHERE rn <= 64 GROUP BY 1),
          |x AS (SELECT l_returnflag, count(DISTINCT l_partkey) AS distinct_exact
          |  FROM lineitem GROUP BY 1)
          |SELECT a.l_returnflag,
          |  CASE WHEN cnt < 64 THEN cnt
          |       ELSE (63::HUGEINT * 1152921504606846976::HUGEINT // kth::HUGEINT)::BIGINT
          |  END AS distinct_est, x.distinct_exact
          |FROM a JOIN x USING (l_returnflag)""".stripMargin,

      // exact threshold over the same deterministic skewed stream — the MG
      // sketch's no-false-negative window (den=8 ≤ k+1=17) plus the exact
      // rescore makes the engine output equal this under any partitioning
      "heavy_hitters" ->
        """WITH s AS (SELECT CASE WHEN (l_orderkey+l_linenumber)%10 < 4
          |  THEN 'hot-'||((l_orderkey+l_linenumber)%2)
          |  ELSE 'cold-'||l_orderkey||'-'||l_linenumber END AS value
          |  FROM lineitem)
          |SELECT value, count(*)::BIGINT AS cnt FROM s GROUP BY 1
          |HAVING count(*)*8 > (SELECT count(*) FROM s)""".stripMargin,

      // HLL replay: hex-string rho (13 tail chars = 52 bits), register max
      // per bucket, int64 harmonic sum scaled by 2^53, exact-rational
      // α_256 = 1846528/2570790 through HUGEINT floor division, and the
      // JVM-precomputed linear-counting VALUES table (round(256·ln(256/v)))
      // so no engine-side libm call can move the small-range branch
      "hll_distinct" ->
        s"""WITH pairs AS (
           |  SELECT 'pk:'||l_returnflag AS grp, l_partkey::VARCHAR AS v FROM lineitem
           |  UNION ALL
           |  SELECT 'ln:all' AS grp, l_linenumber::VARCHAR AS v FROM lineitem),
           |h AS (SELECT DISTINCT grp, md5(v) AS hx FROM pairs),
           |r AS (SELECT grp, ('0x'||substr(hx,1,2))::INT AS bucket,
           |        length(regexp_extract(substr(hx,3,13), '^0*')) AS z,
           |        substr(hx,3,13) AS tail FROM h),
           |rho AS (SELECT grp, bucket, CASE WHEN z = 13 THEN 53 ELSE 4*z + 5 -
           |          (CASE WHEN d >= 8 THEN 4 WHEN d >= 4 THEN 3
           |                WHEN d >= 2 THEN 2 ELSE 1 END) END AS rho
           |        FROM (SELECT grp, bucket, z, CASE WHEN z < 13
           |                THEN ('0x'||substr(tail, z+1, 1))::INT ELSE 0 END AS d FROM r)),
           |reg AS (SELECT grp, bucket, max(rho) AS reg FROM rho GROUP BY 1, 2),
           |ag AS (SELECT grp,
           |        sum((1::BIGINT << (53 - reg))::BIGINT)::BIGINT
           |          + (256 - count(*)) * 9007199254740992::BIGINT AS s_sum,
           |        256 - count(*) AS v FROM reg GROUP BY 1),
           |lc(lv, lc_est) AS (VALUES $hllLcValues),
           |est AS (SELECT grp, v,
           |        ((1846528::HUGEINT * 65536::HUGEINT * 9007199254740992::HUGEINT)
           |          // (2570790::HUGEINT * s_sum::HUGEINT))::BIGINT AS raw FROM ag),
           |ex AS (SELECT grp, count(DISTINCT v) AS distinct_exact FROM pairs GROUP BY 1)
           |SELECT e.grp,
           |  CASE WHEN e.v > 0 AND raw <= 640 THEN lcj.lc_est ELSE raw END AS hll_est,
           |  e.v::BIGINT AS zero_regs, ex.distinct_exact
           |FROM est e LEFT JOIN lc lcj ON lcj.lv = e.v JOIN ex USING (grp)""".stripMargin,

      // hll-merge replay: register-max over a union of per-half registers
      // IS the union's registers (a set identity), so one direct chain
      // supplies both columns — Spark executes both paths for real and a
      // broken merge breaks parity
      "hll_merge" ->
        s"""WITH pairs AS (SELECT 'pk' AS grp, l_partkey::VARCHAR AS v FROM lineitem),
           |h AS (SELECT DISTINCT grp, md5(v) AS hx FROM pairs),
           |r AS (SELECT grp, ('0x'||substr(hx,1,2))::INT AS bucket,
           |        length(regexp_extract(substr(hx,3,13), '^0*')) AS z,
           |        substr(hx,3,13) AS tail FROM h),
           |rho AS (SELECT grp, bucket, CASE WHEN z = 13 THEN 53 ELSE 4*z + 5 -
           |          (CASE WHEN d >= 8 THEN 4 WHEN d >= 4 THEN 3
           |                WHEN d >= 2 THEN 2 ELSE 1 END) END AS rho
           |        FROM (SELECT grp, bucket, z, CASE WHEN z < 13
           |                THEN ('0x'||substr(tail, z+1, 1))::INT ELSE 0 END AS d FROM r)),
           |reg AS (SELECT grp, bucket, max(rho) AS reg FROM rho GROUP BY 1, 2),
           |ag AS (SELECT grp,
           |        sum((1::BIGINT << (53 - reg))::BIGINT)::BIGINT
           |          + (256 - count(*)) * 9007199254740992::BIGINT AS s_sum,
           |        256 - count(*) AS vz FROM reg GROUP BY 1),
           |lc(lv, lc_est) AS (VALUES $hllLcValues),
           |est AS (SELECT grp, vz,
           |        ((1846528::HUGEINT * 65536::HUGEINT * 9007199254740992::HUGEINT)
           |          // (2570790::HUGEINT * s_sum::HUGEINT))::BIGINT AS raw FROM ag),
           |fin AS (SELECT grp,
           |  CASE WHEN vz > 0 AND raw <= 640 THEN lcj.lc_est ELSE raw END AS e,
           |  vz FROM est LEFT JOIN lc lcj ON lcj.lv = est.vz)
           |SELECT grp, e AS est_merged, vz::BIGINT AS zero_merged,
           |  e AS est_direct, true AS merge_exact FROM fin""".stripMargin,

      // kmv-merge replay: the k smallest of a union of per-half synopses
      // ARE the union's k smallest (each half's synopsis contains every
      // candidate), so one direct chain supplies both columns — Spark runs
      // both paths for real and a broken merge breaks parity
      "kmv_merge" ->
        """WITH h AS (SELECT DISTINCT 'pk' AS grp,
          |  ('0x'||substr(md5(l_partkey::VARCHAR),1,15))::BIGINT AS hv FROM lineitem),
          |r AS (SELECT grp, hv,
          |  row_number() OVER (PARTITION BY grp ORDER BY hv) AS rn FROM h),
          |a AS (SELECT grp, count(*) AS cnt,
          |  max(CASE WHEN rn = 64 THEN hv END) AS kth FROM r WHERE rn <= 64 GROUP BY 1),
          |e AS (SELECT grp, CASE WHEN cnt < 64 THEN cnt
          |  ELSE (63::HUGEINT * 1152921504606846976::HUGEINT // kth::HUGEINT)::BIGINT
          |  END AS est FROM a)
          |SELECT grp, est AS est_merged, est AS est_direct, true AS merge_exact
          |FROM e""".stripMargin,

      // kmv-overlap replay: per-half synopses (rank ≤ 64 over distinct
      // hashes), full-outer merge re-capped at 64, shared fraction +
      // HUGEINT-floored estimates
      "kmv_overlap" ->
        """WITH ha AS (SELECT DISTINCT 'pk' AS grp,
          |  ('0x'||substr(md5(l_partkey::VARCHAR),1,15))::BIGINT AS h
          |  FROM lineitem WHERE l_orderkey%2=0),
          |hb AS (SELECT DISTINCT 'pk' AS grp,
          |  ('0x'||substr(md5(l_partkey::VARCHAR),1,15))::BIGINT AS h
          |  FROM lineitem WHERE l_orderkey%2=1),
          |sa AS (SELECT grp, h FROM (SELECT grp, h,
          |  row_number() OVER (PARTITION BY grp ORDER BY h) AS rn FROM ha)
          |  WHERE rn <= 64),
          |sb AS (SELECT grp, h FROM (SELECT grp, h,
          |  row_number() OVER (PARTITION BY grp ORDER BY h) AS rn FROM hb)
          |  WHERE rn <= 64),
          |j AS (SELECT coalesce(sa.grp, sb.grp) AS grp, coalesce(sa.h, sb.h) AS h,
          |  CASE WHEN sa.h IS NULL THEN 0 ELSE 1 END AS ia,
          |  CASE WHEN sb.h IS NULL THEN 0 ELSE 1 END AS ib
          |  FROM sa FULL JOIN sb ON sa.grp=sb.grp AND sa.h=sb.h),
          |r AS (SELECT grp, h, ia, ib,
          |  row_number() OVER (PARTITION BY grp ORDER BY h) AS rn FROM j),
          |g AS (SELECT grp, count(*)::BIGINT AS k_used,
          |  sum(CASE WHEN ia=1 AND ib=1 THEN 1 ELSE 0 END)::BIGINT AS n_shared,
          |  max(CASE WHEN rn = 64 THEN h END) AS kth
          |  FROM r WHERE rn <= 64 GROUP BY 1),
          |e AS (SELECT grp, n_shared, k_used,
          |  CASE WHEN k_used < 64 THEN k_used
          |    ELSE (63::HUGEINT * 1152921504606846976::HUGEINT // kth::HUGEINT)::BIGINT
          |  END AS union_est FROM g)
          |SELECT grp, n_shared, k_used,
          |  ((1000 * n_shared) // k_used)::BIGINT AS jaccard_milli, union_est,
          |  ((n_shared::HUGEINT * union_est::HUGEINT) // k_used::HUGEINT)::BIGINT
          |    AS intersection_est
          |FROM e""".stripMargin,

      // cms-merge replay: counters are sums over input rows, so the
      // per-half elementwise add IS the direct build — one cell relation
      // supplies both probe columns
      "cms_merge" ->
        s"""WITH t AS (SELECT doc_id, $docText AS t2 FROM documents),
           |h AS (SELECT doc_id, t2, ('0x'||substr(md5(t2),1,15))::BIGINT AS h1,
           |  (('0x'||substr(md5(t2),17,10))::BIGINT | 1) AS h2 FROM t),
           |cell AS (SELECT i, (h1 + i*h2) % 512 AS pos, count(*) AS c
           |  FROM h, (SELECT unnest(range(3)) AS i) GROUP BY 1, 2),
           |probe AS (SELECT min(doc_id) AS doc_id, h1, h2, count(*) AS freq_exact
           |  FROM h GROUP BY t2, h1, h2),
           |px AS (SELECT p.doc_id, p.freq_exact, i, (p.h1 + i*p.h2) % 512 AS pos
           |  FROM probe p, (SELECT unnest(range(3)) AS i))
           |SELECT px.doc_id, min(coalesce(c, 0)) AS freq_merged,
           |  min(coalesce(c, 0)) AS freq_direct, px.freq_exact,
           |  true AS merge_exact
           |FROM px LEFT JOIN cell USING (i, pos) GROUP BY 1, 4""".stripMargin,

      // Morton interleave replayed with DuckDB bit ops
      "zorder_layout" ->
        """SELECT DISTINCT l_orderkey % 256 AS ka, l_partkey % 256 AS kb,
          |  list_sum(list_transform(range(8), i ->
          |    ((((l_orderkey % 256) >> i) & 1) << (2*i)) +
          |    ((((l_partkey % 256) >> i) & 1) << (2*i + 1))))::BIGINT AS zval
          |FROM lineitem""".stripMargin,

      // the single-partition window the distributed assigner avoids
      "global_ids" ->
        """SELECT doc_id, doc_id % 7 AS grp,
          |  row_number() OVER (ORDER BY doc_id % 7, doc_id) - 1 AS global_id
          |FROM documents""".stripMargin,

      // DOM-node replay: re-render the template's node list (no HTML
      // parsing) — optional rows gated on the same md5 seed branches,
      // document order via a per-template ordinal
      "dom_nodes" ->
        s"""WITH d AS (SELECT doc_id::VARCHAR AS id,
           |  ('0x'||substr(md5(doc_id::VARCHAR),1,8))::BIGINT AS seed,
           |  trim(regexp_replace(substr(text,1,60), '\\s+', ' ', 'g')) AS s1,
           |  trim(regexp_replace(substr(text,61,60), '\\s+', ' ', 'g')) AS s2
           |  FROM documents),
           |n AS (
           |  SELECT id, 0 AS ord, 'html/head/title' AS path, 3 AS dep, FALSE AS a, 'T'||id AS text FROM d
           |  UNION ALL SELECT id, 1, 'html/body/nav/a', 4, TRUE, 'Home' FROM d
           |  UNION ALL SELECT id, 2, 'html/body/nav/a', 4, TRUE, 'About '||id FROM d
           |  UNION ALL SELECT id, 3, 'html/body/div/h1', 4, FALSE, 'Doc '||id FROM d
           |  UNION ALL SELECT id, 4, 'html/body/div/p', 4, FALSE, s1 FROM d WHERE len(s1) > 0
           |  UNION ALL SELECT id, 5, 'html/body/div/p', 4, FALSE, s2 FROM d WHERE seed%2=0 AND len(s2) > 0
           |  UNION ALL SELECT id, 6, 'html/body/div/p', 4, FALSE, 'Extra' FROM d WHERE seed%5=0
           |  UNION ALL SELECT id, 7, 'html/body/div/p/a', 5, TRUE, 'inline link' FROM d WHERE seed%5=0
           |  UNION ALL SELECT id, 8, 'html/body/div/p', 4, FALSE, 'tail' FROM d WHERE seed%5=0
           |  UNION ALL SELECT id, 9, 'html/body/footer', 3, FALSE, '(c) 2026' FROM d
           |  UNION ALL SELECT id, 10, 'html/body/footer/a', 4, TRUE, 'Privacy' FROM d)
           |SELECT id AS doc_id,
           |  (row_number() OVER (PARTITION BY id ORDER BY ord) - 1)::BIGINT AS node_idx,
           |  path, dep::BIGINT AS depth, a AS in_anchor, text,
           |  len(string_split(text, ' '))::BIGINT AS n_words,
           |  (CASE WHEN a THEN len(string_split(text, ' ')) ELSE 0 END)::BIGINT AS n_link_words
           |FROM n""".stripMargin,

      // interleaved-strip replay: text branch re-rendered as the non-anchor
      // node join, all-anchor spans excluded, media branch passed through
      "dom_interleaved" ->
        """WITH li AS (SELECT l_orderkey AS k, l_linenumber AS ln,
          |  l_quantity::BIGINT AS q, l_partkey%1000 AS pr, l_partkey AS pk
          |  FROM lineitem WHERE l_orderkey <= 20000)
          |SELECT k::VARCHAR AS doc_id, 'text' AS kind,
          |  'Item '||ln||' qty '||q||' price '||pr AS text,
          |  CAST(NULL AS VARCHAR) AS media_ref, (ln*2)::INT AS "offset"
          |FROM li WHERE k%11 <> 0
          |UNION ALL
          |SELECT k::VARCHAR, 'media', CAST(NULL AS VARCHAR),
          |  'img-'||k||'-'||ln, (ln*2+1)::INT
          |FROM li WHERE pk%3 = 0""".stripMargin,

      // streaming strip ≡ batch strip: the stateless per-row operator makes
      // the stream output identical, so the replay is dom_interleaved's
      "stream_domstrip" ->
        """WITH li AS (SELECT l_orderkey AS k, l_linenumber AS ln,
          |  l_quantity::BIGINT AS q, l_partkey%1000 AS pr, l_partkey AS pk
          |  FROM lineitem WHERE l_orderkey <= 20000)
          |SELECT k::VARCHAR AS doc_id, 'text' AS kind,
          |  'Item '||ln||' qty '||q||' price '||pr AS text,
          |  CAST(NULL AS VARCHAR) AS media_ref, (ln*2)::INT AS "offset"
          |FROM li WHERE k%11 <> 0
          |UNION ALL
          |SELECT k::VARCHAR, 'media', CAST(NULL AS VARCHAR),
          |  'img-'||k||'-'||ln, (ln*2+1)::INT
          |FROM li WHERE pk%3 = 0""".stripMargin,

      // interleave-markdown replay: ordered string_agg over the same span
      // derivation — text blocks raw, media as placeholders
      "interleave_markdown" ->
        """WITH li AS (SELECT l_orderkey AS k, l_linenumber AS ln,
          |  l_quantity::BIGINT AS q, l_partkey%1000 AS pr, l_partkey AS pk
          |  FROM lineitem WHERE l_orderkey <= 20000),
          |sp AS (
          |  SELECT k::VARCHAR AS doc_id, (ln*2) AS off,
          |    CASE WHEN k%11=0 THEN '<nav><a href="/">related item links</a></nav>'
          |         ELSE '<div><h1>Item '||ln||'</h1><p>qty '||q||' price '||pr||'</p><a href="/m">more</a></div>'
          |    END AS block
          |  FROM li
          |  UNION ALL
          |  SELECT k::VARCHAR, ln*2+1, '![](img-'||k||'-'||ln||')'
          |  FROM li WHERE pk%3=0)
          |SELECT doc_id,
          |  string_agg(block, chr(10)||chr(10) ORDER BY off, block) AS md,
          |  count(*)::BIGINT AS n_spans
          |FROM sp GROUP BY doc_id""".stripMargin,

      // caption replay: same spans, same full order, ignore-nulls running
      // last/first, then the distance rule (ties → preceding)
      "caption_align" ->
        """WITH li AS (SELECT l_orderkey AS k, l_linenumber AS ln,
          |  l_quantity::BIGINT AS q, l_partkey%1000 AS pr, l_partkey AS pk
          |  FROM lineitem WHERE l_orderkey <= 20000),
          |sp AS (
          |  SELECT k::VARCHAR AS doc_id, 'text' AS kind,
          |    CASE WHEN k%11=0 THEN '<nav><a href="/">related item links</a></nav>'
          |         ELSE '<div><h1>Item '||ln||'</h1><p>qty '||q||' price '||pr||'</p><a href="/m">more</a></div>'
          |    END AS text, CAST(NULL AS VARCHAR) AS ref, (ln*2) AS off
          |  FROM li
          |  UNION ALL
          |  SELECT k::VARCHAR, 'media', NULL, 'img-'||k||'-'||ln, ln*2+1
          |  FROM li WHERE pk%3=0),
          |w AS (SELECT doc_id, kind, text, ref, off,
          |  last_value(CASE WHEN kind='text' THEN off END IGNORE NULLS)
          |    OVER (PARTITION BY doc_id
          |          ORDER BY off, coalesce(text,''), coalesce(ref,'')
          |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS po,
          |  last_value(CASE WHEN kind='text' THEN text END IGNORE NULLS)
          |    OVER (PARTITION BY doc_id
          |          ORDER BY off, coalesce(text,''), coalesce(ref,'')
          |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
          |  first_value(CASE WHEN kind='text' THEN off END IGNORE NULLS)
          |    OVER (PARTITION BY doc_id
          |          ORDER BY off, coalesce(text,''), coalesce(ref,'')
          |          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS no,
          |  first_value(CASE WHEN kind='text' THEN text END IGNORE NULLS)
          |    OVER (PARTITION BY doc_id
          |          ORDER BY off, coalesce(text,''), coalesce(ref,'')
          |          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt
          |  FROM sp)
          |SELECT doc_id, off::INT AS "offset", ref AS media_ref,
          |  (CASE WHEN no IS NULL OR (po IS NOT NULL AND (off-po) <= (no-off))
          |        THEN po ELSE no END)::INT AS caption_offset,
          |  CASE WHEN no IS NULL OR (po IS NOT NULL AND (off-po) <= (no-off))
          |       THEN pt ELSE nt END AS caption
          |FROM w WHERE kind='media'""".stripMargin,

      // round-trip replay: the same span derivation, dense positions via a
      // window over the serialization order (off, block)
      "markdown_spans" ->
        """WITH li AS (SELECT l_orderkey AS k, l_linenumber AS ln,
          |  l_quantity::BIGINT AS q, l_partkey%1000 AS pr, l_partkey AS pk
          |  FROM lineitem WHERE l_orderkey <= 20000),
          |sp AS (
          |  SELECT k::VARCHAR AS doc_id, (ln*2) AS off,
          |    CASE WHEN k%11=0 THEN '<nav><a href="/">related item links</a></nav>'
          |         ELSE '<div><h1>Item '||ln||'</h1><p>qty '||q||' price '||pr||'</p><a href="/m">more</a></div>'
          |    END AS block
          |  FROM li
          |  UNION ALL
          |  SELECT k::VARCHAR, ln*2+1, '![](img-'||k||'-'||ln||')'
          |  FROM li WHERE pk%3=0),
          |r AS (SELECT doc_id, block,
          |  (row_number() OVER (PARTITION BY doc_id ORDER BY off, block) - 1) AS pos
          |  FROM sp)
          |SELECT doc_id,
          |  CASE WHEN regexp_matches(block, '^!\[\]\([^)]*\)$')
          |       THEN 'media' ELSE 'text' END AS kind,
          |  CASE WHEN regexp_matches(block, '^!\[\]\([^)]*\)$')
          |       THEN NULL ELSE block END AS text,
          |  CASE WHEN regexp_matches(block, '^!\[\]\([^)]*\)$')
          |       THEN nullif(regexp_extract(block, '^!\[\]\(([^)]*)\)$', 1), '')
          |       ELSE NULL END AS media_ref,
          |  pos::INT AS "offset"
          |FROM r""".stripMargin,

      // main-container replay: same node list → parent path → score
      // Σ(words − 3·link words) → per-doc argmax (score desc, parent asc)
      // → that container's nodes
      "dom_main" ->
        s"""WITH d AS (SELECT doc_id::VARCHAR AS id,
           |  ('0x'||substr(md5(doc_id::VARCHAR),1,8))::BIGINT AS seed,
           |  trim(regexp_replace(substr(text,1,60), '\\s+', ' ', 'g')) AS s1,
           |  trim(regexp_replace(substr(text,61,60), '\\s+', ' ', 'g')) AS s2
           |  FROM documents),
           |n AS (
           |  SELECT id, 0 AS ord, 'html/head/title' AS path, FALSE AS a, 'T'||id AS text FROM d
           |  UNION ALL SELECT id, 1, 'html/body/nav/a', TRUE, 'Home' FROM d
           |  UNION ALL SELECT id, 2, 'html/body/nav/a', TRUE, 'About '||id FROM d
           |  UNION ALL SELECT id, 3, 'html/body/div/h1', FALSE, 'Doc '||id FROM d
           |  UNION ALL SELECT id, 4, 'html/body/div/p', FALSE, s1 FROM d WHERE len(s1) > 0
           |  UNION ALL SELECT id, 5, 'html/body/div/p', FALSE, s2 FROM d WHERE seed%2=0 AND len(s2) > 0
           |  UNION ALL SELECT id, 6, 'html/body/div/p', FALSE, 'Extra' FROM d WHERE seed%5=0
           |  UNION ALL SELECT id, 7, 'html/body/div/p/a', TRUE, 'inline link' FROM d WHERE seed%5=0
           |  UNION ALL SELECT id, 8, 'html/body/div/p', FALSE, 'tail' FROM d WHERE seed%5=0
           |  UNION ALL SELECT id, 9, 'html/body/footer', FALSE, '(c) 2026' FROM d
           |  UNION ALL SELECT id, 10, 'html/body/footer/a', TRUE, 'Privacy' FROM d),
           |nn AS (SELECT id, (row_number() OVER (PARTITION BY id ORDER BY ord) - 1) AS node_idx,
           |  path, regexp_extract(path, '^(.*)/[^/]*$$', 1) AS parent, text,
           |  len(string_split(text, ' ')) AS w,
           |  CASE WHEN a THEN len(string_split(text, ' ')) ELSE 0 END AS lw FROM n),
           |sc AS (SELECT id, parent, sum(w - 3*lw) AS score, sum(w) AS content_words,
           |  row_number() OVER (PARTITION BY id ORDER BY sum(w - 3*lw) DESC, parent ASC) AS rk
           |  FROM nn GROUP BY id, parent)
           |SELECT nn.id AS doc_id, nn.node_idx::BIGINT AS node_idx, nn.parent,
           |  nn.path, nn.text, sc.score::BIGINT AS score,
           |  sc.content_words::BIGINT AS content_words
           |FROM nn JOIN sc ON nn.id = sc.id AND nn.parent = sc.parent AND sc.rk = 1""".stripMargin,

      // table-cell replay: re-render the template's cell relation without
      // parsing — header row, implied-close data row, named row with the
      // EMPTY cell, plus the %4-gated nested pair (inner table_idx 2 owns
      // 'in', the outer cell is 'pre post')
      "dom_tables" ->
        """WITH d AS (SELECT doc_id::VARCHAR AS id, doc_id AS did,
          |  n_chars FROM documents)
          |SELECT id AS doc_id, 0::BIGINT AS table_idx, 0::BIGINT AS row_idx,
          |  0::BIGINT AS col_idx, TRUE AS is_header, 'k' AS text FROM d
          |UNION ALL SELECT id, 0, 0, 1, TRUE, 'v' FROM d
          |UNION ALL SELECT id, 0, 1, 0, FALSE, 'qty' FROM d
          |UNION ALL SELECT id, 0, 1, 1, FALSE, n_chars::VARCHAR FROM d
          |UNION ALL SELECT id, 0, 2, 0, FALSE, 'name '||id FROM d
          |UNION ALL SELECT id, 0, 2, 1, FALSE, '' FROM d
          |UNION ALL SELECT id, 1, 0, 0, FALSE, 'pre post' FROM d WHERE did%4=0
          |UNION ALL SELECT id, 2, 0, 0, FALSE, 'in '||id FROM d WHERE did%4=0""".stripMargin,

      // confusable replay: the planted ZWSP and lookalikes resolve to a
      // pure function of doc_id — clean text and both counts re-rendered
      "confusable_scrub" ->
        """SELECT doc_id,
          |  'free here sale ref '||doc_id::VARCHAR||
          |  CASE WHEN doc_id%3=0 THEN ' CALE' ELSE '' END AS clean,
          |  1::BIGINT AS n_invisible,
          |  (CASE WHEN doc_id%3=0 THEN 5 ELSE 3 END)::BIGINT AS n_homoglyph
          |FROM documents""".stripMargin,

      // markdown-table replay: every line re-rendered — header row,
      // dashed separator, the data rows incl. the EMPTY cell, and the
      // separator-less single-cell nested pair on %4 docs
      "table_markdown" ->
        """WITH d AS (SELECT doc_id::VARCHAR AS id, doc_id AS did,
          |  n_chars FROM documents)
          |SELECT id AS doc_id, 0::BIGINT AS table_idx,
          |  '| k | v |'||chr(10)||'| --- | --- |'||chr(10)||
          |  '| qty | '||n_chars::VARCHAR||' |'||chr(10)||
          |  '| name '||id||' |  |' AS md FROM d
          |UNION ALL SELECT id, 1, '| pre post |' FROM d WHERE did%4=0
          |UNION ALL SELECT id, 2, '| in '||id||' |' FROM d WHERE did%4=0""".stripMargin,

      // card-scrub replay: expected redaction re-rendered per doc — the
      // valid numbers become [CARD], the +1 variant survives verbatim
      "cc_scrub" ->
        """SELECT doc_id::VARCHAR AS doc_id,
          |  'pay [CARD]'||
          |  CASE WHEN doc_id%2=0 THEN ' and [CARD]' ELSE '' END||
          |  ' not 4111111111111112 ref '||doc_id::VARCHAR AS clean,
          |  (CASE WHEN doc_id%2=0 THEN 3 ELSE 2 END)::BIGINT AS n_candidates,
          |  (CASE WHEN doc_id%2=0 THEN 2 ELSE 1 END)::BIGINT AS n_valid
          |FROM documents""".stripMargin,

      // markdown replay: the template is a pure function of
      // (doc_id, n_chars), so the expected flat prose is re-rendered
      // directly — any mis-stripped marker breaks parity
      "markdown_strip" ->
        """SELECT doc_id,
          |  'Doc '||doc_id::VARCHAR||' note '||n_chars::VARCHAR||
          |  ' body bold '||doc_id::VARCHAR||' with code and link '||
          |  doc_id::VARCHAR||' a b '||doc_id::VARCHAR||' tail done' AS clean
          |FROM documents""".stripMargin,

      // budget-selection replay: the plain window cumsum over the same
      // (score desc, id) total order, cut at the budget
      "budget_select" ->
        """WITH s AS (SELECT doc_id::VARCHAR AS doc_id,
          |  ((n_chars*31 + doc_id)%1000)::BIGINT AS score,
          |  (n_chars%997 + 1)::BIGINT AS cost FROM documents),
          |c AS (SELECT doc_id, score, cost,
          |  (sum(cost) OVER (ORDER BY score DESC, doc_id))::BIGINT AS cum
          |  FROM s)
          |SELECT doc_id, score, cost, cum FROM c WHERE cum <= 100000""".stripMargin,

      // priority-sampling replay: q = w·2⁶⁰/(h+1) in the same op order,
      // τ = the 51st priority, ŵ = max(w, τ)
      "priority_sample" ->
        s"""WITH w AS (SELECT doc_id, n_chars AS w FROM documents),
           |q AS (SELECT doc_id, w, (w::DOUBLE * 1152921504606846976.0) /
           |    ((${hash60("doc_id::VARCHAR")} + 1)::DOUBLE) AS pr FROM w),
           |r AS (SELECT doc_id, w, pr, row_number() OVER (ORDER BY pr DESC, doc_id) AS rk FROM q),
           |tau AS (SELECT CASE WHEN (SELECT count(*) FROM r) >= 51
           |  THEN (SELECT pr FROM r WHERE rk = 51) ELSE 0.0 END AS tau)
           |SELECT doc_id, w, round(pr, 6) AS priority,
           |  round(greatest(w::DOUBLE, tau), 6) AS est_weight
           |FROM r, tau WHERE rk <= 50""".stripMargin,

      // chunk replay: same integer ceil-division for the chunk count,
      // 1-based inclusive list slicing for the windows
      "doc_chunks" ->
        s"""WITH t AS (SELECT doc_id, $docText AS t2 FROM documents),
           |tok AS (SELECT doc_id, ${toks.format("t2")} AS l FROM t),
           |nc AS (SELECT doc_id, l,
           |  CASE WHEN len(l) = 0 THEN 0 WHEN len(l) <= 32 THEN 1
           |       ELSE 1 + (len(l) - 32 + 23) // 24 END AS nchunks FROM tok),
           |c AS (SELECT doc_id, i AS chunk_id, l[i*24 + 1 : i*24 + 32] AS ck
           |  FROM (SELECT doc_id, l, unnest(range(nchunks)) AS i FROM nc))
           |SELECT doc_id, chunk_id::BIGINT AS chunk_id, len(ck)::BIGINT AS n_tokens,
           |  array_to_string(ck, ' ') AS chunk_text FROM c""".stripMargin,

      // CDC replay: every w-char window-end whose domain-prefixed hash60
      // lands on the 2^6 mask is a cut; spans between consecutive cuts
      // (plus doc end) split at fixed 256-char offsets; verbatim chunk text
      "cdc_chunks" ->
        s"""WITH t AS (SELECT doc_id, $docText AS t2 FROM documents WHERE length($docText) > 0),
           |cut AS (SELECT doc_id, i FROM
           |  (SELECT doc_id, t2, unnest(range(16, length(t2)::BIGINT + 1)) AS i FROM t)
           |  WHERE ${hash60("'cdc:' || substr(t2, (i - 15)::INT, 16)")} % 64 = 0),
           |ends AS (SELECT doc_id, i AS e FROM cut
           |  UNION SELECT doc_id, length(t2)::BIGINT FROM t),
           |sp AS (SELECT doc_id, e,
           |  coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY e), 0) + 1 AS s
           |  FROM ends),
           |pc AS (SELECT doc_id, s + j*256 AS start,
           |  least(256, e - (s + j*256) + 1) AS len
           |  FROM (SELECT doc_id, s, e, unnest(range((e - s) // 256 + 1)) AS j FROM sp)),
           |ck AS (SELECT pc.doc_id, start, len,
           |  substr(t.t2, start::INT, len::INT) AS chunk_text,
           |  row_number() OVER (PARTITION BY pc.doc_id ORDER BY start) - 1 AS chunk_id
           |  FROM pc JOIN t ON pc.doc_id = t.doc_id)
           |SELECT doc_id, chunk_id::BIGINT AS chunk_id, start::BIGINT AS start,
           |  len::BIGINT AS len, chunk_text FROM ck""".stripMargin,

      // BM25 replay: tf/dl/df/avgdl → Lucene-form idf in milli-nats → one
      // rounding per (query, doc, term) → exact int64 sums → ranked window
      "bm25_topk" -> bm25OracleSql,

      // hybrid replay: the shared BM25 body as a subquery, the distinct
      // token-overlap retriever, then the integer RRF fold + re-rank
      "hybrid_rrf" ->
        s"""WITH bm AS (SELECT qid, doc_id, rank FROM ($bm25OracleSql) b),
           |t AS (SELECT doc_id, $docText AS t2 FROM documents),
           |dt AS (SELECT DISTINCT doc_id,
           |  unnest(${toks.format("t2")}) AS tok FROM t),
           |q(qid, qtext) AS (VALUES (1, 'mortgagee bank'),
           |  (2, 'duplicate content block'), (3, 'policy limit payment')),
           |qt AS (SELECT DISTINCT qid,
           |  unnest(${toks.format("qtext")}) AS tok FROM q),
           |ov AS (SELECT qid, doc_id, count(*) AS overlap
           |  FROM dt JOIN qt USING (tok) GROUP BY 1, 2),
           |ovr AS (SELECT qid, doc_id, row_number() OVER (PARTITION BY qid
           |  ORDER BY overlap DESC, doc_id) AS rank FROM ov
           |  QUALIFY rank <= 10),
           |u AS (SELECT qid, doc_id, rank FROM bm
           |  UNION ALL SELECT qid, doc_id, rank FROM ovr),
           |f AS (SELECT qid, doc_id, count(*)::BIGINT AS n_lists,
           |  sum(1000000 // (60 + rank))::BIGINT AS rrf_micro
           |  FROM u GROUP BY 1, 2)
           |SELECT qid, doc_id, n_lists, rrf_micro,
           |  row_number() OVER (PARTITION BY qid
           |    ORDER BY rrf_micro DESC, doc_id)::BIGINT AS rank
           |FROM f QUALIFY rank <= 10""".stripMargin,

      // CMS replay: per-(row, cell) build counts, probe = min over rows
      "cms_freq" ->
        s"""WITH t AS (SELECT doc_id, $docText AS t2 FROM documents),
           |h AS (SELECT doc_id, t2, ('0x'||substr(md5(t2),1,15))::BIGINT AS h1,
           |  (('0x'||substr(md5(t2),17,10))::BIGINT | 1) AS h2 FROM t),
           |cell AS (SELECT i, (h1 + i*h2) % 512 AS pos, count(*) AS c
           |  FROM h, (SELECT unnest(range(3)) AS i) GROUP BY 1, 2),
           |probe AS (SELECT min(doc_id) AS doc_id, h1, h2, count(*) AS freq_exact
           |  FROM h GROUP BY t2, h1, h2),
           |px AS (SELECT p.doc_id, p.freq_exact, i, (p.h1 + i*p.h2) % 512 AS pos
           |  FROM probe p, (SELECT unnest(range(3)) AS i))
           |SELECT px.doc_id, min(coalesce(c, 0)) AS freq_est, px.freq_exact
           |FROM px LEFT JOIN cell USING (i, pos) GROUP BY 1, 3""".stripMargin,

      // full TF-IDF replay: token counts → df cap → milli-nat integer IDF →
      // exact int64 dot products and norms → 6dp cosine
      "tfidf_pairs" ->
        s"""WITH t AS (SELECT doc_id, $docText AS t2 FROM documents),
           |tok AS (SELECT doc_id, unnest(${toks.format("t2")}) AS tok FROM t),
           |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
           |dfq AS (SELECT tok, count(*) AS dfreq FROM tf GROUP BY 1 HAVING count(*) <= 200),
           |n AS (SELECT count(DISTINCT doc_id) AS nd FROM tf),
           |idf AS (SELECT tok, (round(ln((nd+1)::DOUBLE/(dfreq+1)::DOUBLE)*1000))::BIGINT + 1000 AS idfm
           |  FROM dfq, n),
           |w AS (SELECT doc_id, tf.tok, tf*idfm AS w FROM tf JOIN idf ON tf.tok = idf.tok),
           |nr AS (SELECT doc_id, sum(w*w) AS n2 FROM w GROUP BY 1),
           |d AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.w*b.w) AS dot
           |  FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id GROUP BY 1, 2)
           |SELECT id_a, id_b, round(dot::DOUBLE/(sqrt(na.n2::DOUBLE)*sqrt(nb.n2::DOUBLE)),6) AS cosine
           |FROM d JOIN nr na ON na.doc_id = id_a JOIN nr nb ON nb.doc_id = id_b
           |WHERE round(dot::DOUBLE/(sqrt(na.n2::DOUBLE)*sqrt(nb.n2::DOUBLE)),6) >= 0.5""".stripMargin,

      // Kirsch–Mitzenmacher double hashing replayed from md5: position_i =
      // (h1 + i·h2) mod m; flagged = every probe position set by the build
      // side — reproducing the filter's false positives exactly
      "bloom_dedup" ->
        s"""WITH t AS (SELECT doc_id, $docText AS t2 FROM documents),
           |h AS (SELECT doc_id, ('0x'||substr(md5(t2),1,15))::BIGINT AS h1,
           |  (('0x'||substr(md5(t2),17,10))::BIGINT | 1) AS h2 FROM t),
           |bp AS (SELECT DISTINCT (h1 + i*h2) % 16384 AS pos
           |  FROM h, (SELECT unnest(range(4)) AS i) WHERE doc_id % 2 = 0),
           |pp AS (SELECT doc_id, (h1 + i*h2) % 16384 AS pos
           |  FROM h, (SELECT unnest(range(4)) AS i) WHERE doc_id % 2 = 1)
           |SELECT doc_id, bool_and(pos IN (SELECT pos FROM bp)) AS flagged
           |FROM pp GROUP BY 1""".stripMargin,

      // bloom-merge replay: bits are ORs over rows, so the per-third OR IS
      // the direct build over thirds 0∪1 — one position-subset replay
      // supplies both probe columns
      "bloom_merge" ->
        s"""WITH t AS (SELECT doc_id, $docText AS t2 FROM documents),
           |h AS (SELECT doc_id, ('0x'||substr(md5(t2),1,15))::BIGINT AS h1,
           |  (('0x'||substr(md5(t2),17,10))::BIGINT | 1) AS h2 FROM t),
           |bp AS (SELECT DISTINCT (h1 + i*h2) % 16384 AS pos
           |  FROM h, (SELECT unnest(range(4)) AS i) WHERE doc_id % 3 < 2),
           |pp AS (SELECT doc_id, (h1 + i*h2) % 16384 AS pos
           |  FROM h, (SELECT unnest(range(4)) AS i) WHERE doc_id % 3 = 2)
           |SELECT doc_id, bool_and(pos IN (SELECT pos FROM bp)) AS flag_merged,
           |  bool_and(pos IN (SELECT pos FROM bp)) AS flag_direct,
           |  true AS merge_exact
           |FROM pp GROUP BY 1""".stripMargin,

      "minhash_sig" ->
        s"""WITH t AS (SELECT doc_id, ${toks.format("text")} AS toks FROM documents),
           |s AS (SELECT doc_id, toks,
           |  list_distinct(list_transform(range(len(toks)-2), i -> toks[i+1]||' '||toks[i+2]||' '||toks[i+3])) AS sh
           |  FROM t WHERE len(toks) >= 3)
           |SELECT doc_id,
           |  list_min(list_transform(sh, x -> ${hash60("'0:'||x")})) AS s0,
           |  list_min(list_transform(sh, x -> ${hash60("'1:'||x")})) AS s1,
           |  list_min(list_transform(sh, x -> ${hash60("'2:'||x")})) AS s2,
           |  list_min(list_transform(sh, x -> ${hash60("'3:'||x")})) AS s3
           |FROM s""".stripMargin,

      "simhash_fp" ->
        s"""WITH t AS (SELECT doc_id, ${toks.format("text")} AS toks FROM documents)
           |SELECT doc_id,
           |  CAST(coalesce(list_sum(list_transform(range(32), i ->
           |    CASE WHEN coalesce(list_sum(list_transform(toks, tk ->
           |      CASE WHEN ((${hash32("tk")} >> i) & 1) = 1 THEN 1 ELSE -1 END)),0) > 0
           |    THEN (1::BIGINT << i) ELSE 0::BIGINT END)),0) AS BIGINT) AS fp
           |FROM t""".stripMargin,

      "ngram_jaccard" ->
        s"""WITH t AS (SELECT doc_id, $docText AS t2 FROM documents),
           |tok AS (SELECT doc_id, ${toks.format("t2")} AS toks FROM t),
           |sh AS (SELECT doc_id,
           |  list_distinct(list_transform(range(len(toks)-2), i -> toks[i+1]||' '||toks[i+2]||' '||toks[i+3])) AS shl
           |  FROM tok WHERE len(toks) >= 3),
           |rows_ AS (SELECT doc_id, ${hash60("s")} AS sh FROM (SELECT doc_id, unnest(shl) AS s FROM sh)),
           |sizes AS (SELECT doc_id, count(*) AS sz FROM rows_ GROUP BY 1),
           |common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
           |  FROM rows_ a JOIN rows_ b ON a.sh=b.sh AND a.doc_id < b.doc_id GROUP BY 1,2)
           |SELECT id_a, id_b,
           |  round(c::DOUBLE/(sa.sz + sb.sz - c)::DOUBLE, 6) AS jaccard
           |FROM common JOIN sizes sa ON sa.doc_id=id_a JOIN sizes sb ON sb.doc_id=id_b
           |WHERE round(c::DOUBLE/(sa.sz + sb.sz - c)::DOUBLE, 6) >= 0.2""".stripMargin,

      "pii_scrub" ->
        """WITH t AS (SELECT doc_id, text ||
          |  (CASE WHEN doc_id%5=0 THEN ' contact agent'||doc_id||'@example.com' ELSE '' END) ||
          |  (CASE WHEN doc_id%7=0 THEN ' call (555) 123-4567 or 555-987-6543' ELSE '' END) ||
          |  (CASE WHEN doc_id%9=0 THEN ' ssn 123-45-6789' ELSE '' END) AS t FROM documents)
          |SELECT doc_id,
          |  regexp_replace(regexp_replace(regexp_replace(t,
          |    '\b\d{3}-\d{2}-\d{4}\b', '[SSN]', 'g'),
          |    '\(\d{3}\)\s*\d{3}[-.]\d{4}|\b\d{3}[-.]\d{3}[-.]\d{4}\b', '[PHONE]', 'g'),
          |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g') AS clean,
          |  len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_email,
          |  len(regexp_extract_all(t, '\(\d{3}\)\s*\d{3}[-.]\d{4}|\b\d{3}[-.]\d{3}[-.]\d{4}\b'))::BIGINT AS n_phone,
          |  len(regexp_extract_all(t, '\b\d{3}-\d{2}-\d{4}\b'))::BIGINT AS n_ssn
          |FROM t""".stripMargin,

      // k-anonymity replay: same coarsened sensitive bucket, group stats,
      // CASE-suppressed QI columns, and both verdicts
      "k_anon" ->
        """WITH c AS (SELECT c_custkey, c_nationkey, c_mktsegment,
          |  floor(c_acctbal/2000.0)::BIGINT AS bb FROM customer),
          |g AS (SELECT c_nationkey, c_mktsegment, count(*)::BIGINT AS n,
          |  count(DISTINCT bb)::BIGINT AS ns FROM c GROUP BY 1, 2)
          |SELECT c.c_custkey,
          |  CASE WHEN g.n >= 10 THEN c.c_nationkey END AS c_nationkey,
          |  CASE WHEN g.n >= 10 THEN c.c_mktsegment END AS c_mktsegment,
          |  g.n AS group_n, g.ns AS n_sensitive,
          |  (g.n < 10) AS suppressed,
          |  (g.n >= 10 AND g.ns >= 5) AS l_diverse
          |FROM c JOIN g USING (c_nationkey, c_mktsegment)""".stripMargin,

      // SURT replay: expected key re-rendered as a pure function of
      // doc_id (reversed lowercase host labels; path+query kept verbatim,
      // fragment and port gone, empty path -> "/")
      "surt_keys" ->
        """WITH t AS (SELECT doc_id,
          |  CASE WHEN doc_id%5=0 THEN 'uk,co,news,site'||(doc_id%7)||',www'
          |    ELSE 'com,example,site'||(doc_id%7)||',www' END AS hostrev,
          |  (CASE WHEN doc_id%11=0 THEN '' ELSE '/P/'||doc_id END) ||
          |  (CASE WHEN doc_id%4=0 THEN '?b=2&utm_source=nl&a=1'
          |    WHEN doc_id%4=1 THEN '?gclid=z'
          |    WHEN doc_id%4=2 THEN '?z=9&y=8&fbclid=k' ELSE '' END) AS rest
          |  FROM documents)
          |SELECT doc_id, '('||hostrev||',)'||
          |  (CASE WHEN rest='' THEN '/' ELSE rest END) AS surt
          |FROM t""".stripMargin,

      // slice-datasheet replay: corpus-wide fingerprint dup groups
      // attributed per (lang, source) slice
      "slice_datasheet" ->
        s"""WITH f AS (SELECT lang, source, n_chars, text,
           |  ${hash60("regexp_replace(trim(lower(text)),'\\s+',' ','g')")} AS fp
           |  FROM documents),
           |dup AS (SELECT fp FROM f GROUP BY fp HAVING count(*) > 1)
           |SELECT lang, source, count(*)::BIGINT AS n_docs,
           |  sum(CASE WHEN length(regexp_replace(text,'^\\s+|\\s+$$','','g'))=0 THEN 0
           |    ELSE len(string_split_regex(
           |      regexp_replace(text,'^\\s+|\\s+$$','','g'),'\\s+')) END)::BIGINT
           |    AS n_ws_tokens,
           |  sum(n_chars)::BIGINT AS n_chars,
           |  sum(CASE WHEN dup.fp IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
           |    AS n_dup_docs
           |FROM f LEFT JOIN dup USING (fp)
           |GROUP BY 1, 2""".stripMargin,

      // idf-SimHash replay: distinct-doc df counts, micro-nat idf votes,
      // the 32 conditional bit sums, the >0 bit rule
      "simhash_idf" ->
        s"""WITH tk AS (SELECT doc_id, unnest(${toks.format("text")}) AS w
           |  FROM documents),
           |dfv AS (SELECT w, count(DISTINCT doc_id) AS dfc FROM tk GROUP BY 1),
           |nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
           |wt AS (SELECT tk.doc_id, tk.w,
           |  round(ln(nd.n::DOUBLE)*1e6)::BIGINT
           |    - round(ln(dfc::DOUBLE)*1e6)::BIGINT AS wv
           |  FROM tk JOIN dfv USING (w), nd),
           |bits AS (SELECT doc_id, i,
           |  sum(CASE WHEN ((${hash32("w")} >> i) & 1) = 1 THEN wv
           |    ELSE -wv END) AS s
           |  FROM wt, unnest(range(32)) AS t(i) GROUP BY 1, 2),
           |fp AS (SELECT doc_id, sum(CASE WHEN s > 0 THEN (1::BIGINT << i)
           |  ELSE 0 END)::BIGINT AS fp FROM bits GROUP BY 1)
           |SELECT d.doc_id, coalesce(fp.fp, 0)::BIGINT AS fp
           |FROM documents d LEFT JOIN fp USING (doc_id)""".stripMargin,

      // context-gain replay: the lm_perplexity bigram chain plus the
      // hashed unigram model over the same predicted positions, one
      // toward-zero division per doc
      "context_gain" ->
        s"""WITH t AS (SELECT doc_id, $docText AS t2 FROM documents),
           |ctk AS (SELECT doc_id, ${toks.format("t2")} AS l FROM t),
           |cbg AS (SELECT doc_id, ${hash60("l[i+1]")} % 1024 AS b1,
           |    ${hash60("l[i+1]||' '||l[i+2]")} % 8192 AS b12
           |  FROM (SELECT doc_id, l, unnest(range(len(l)-1)) AS i FROM ctk WHERE len(l) >= 2)),
           |cpd AS (SELECT doc_id, ${hash60("l[i+2]")} % 4096 AS bu
           |  FROM (SELECT doc_id, l, unnest(range(len(l)-1)) AS i FROM ctk WHERE len(l) >= 2)),
           |rtk AS (SELECT ${toks.format("text")} AS l FROM documents WHERE lang = 'en'),
           |rbg AS (SELECT ${hash60("l[i+1]")} % 1024 AS b1,
           |    ${hash60("l[i+1]||' '||l[i+2]")} % 8192 AS b12
           |  FROM (SELECT l, unnest(range(len(l)-1)) AS i FROM rtk WHERE len(l) >= 2)),
           |rpd AS (SELECT ${hash60("l[i+2]")} % 4096 AS bu
           |  FROM (SELECT l, unnest(range(len(l)-1)) AS i FROM rtk WHERE len(l) >= 2)),
           |c12 AS (SELECT b1, b12, count(*) AS c FROM rbg GROUP BY 1, 2),
           |c1 AS (SELECT b1, count(*) AS c FROM rbg GROUP BY 1),
           |cu AS (SELECT bu, count(*) AS c FROM rpd GROUP BY 1),
           |nu AS (SELECT count(*) AS n FROM rpd),
           |evb AS (SELECT cbg.doc_id,
           |  CASE WHEN c12.c IS NOT NULL
           |         THEN round((ln((c1.c+8192)::DOUBLE) - ln((c12.c+1)::DOUBLE))*1e6)::BIGINT
           |       WHEN c1.c IS NOT NULL THEN round(ln((c1.c+8192)::DOUBLE)*1e6)::BIGINT
           |       ELSE round(ln(8192::DOUBLE)*1e6)::BIGINT END AS nll
           |  FROM cbg LEFT JOIN c12 USING (b1, b12) LEFT JOIN c1 USING (b1)),
           |perb AS (SELECT doc_id, count(*) AS nb, sum(nll) AS smb FROM evb GROUP BY 1),
           |evu AS (SELECT cpd.doc_id,
           |  round((ln((nu.n+4096)::DOUBLE) - ln((coalesce(cu.c, 0)+1)::DOUBLE))*1e6)::BIGINT AS nll
           |  FROM cpd LEFT JOIN cu USING (bu), nu),
           |peru AS (SELECT doc_id, sum(nll) AS smu FROM evu GROUP BY 1)
           |SELECT d.doc_id, coalesce(nb, 0)::BIGINT AS n_bigrams,
           |  coalesce(smu, 0)::BIGINT AS nll_uni_micro,
           |  coalesce(smb, 0)::BIGINT AS nll_bi_micro,
           |  (CASE WHEN coalesce(nb, 0) = 0 THEN 0
           |    ELSE (smu - smb) // nb END)::BIGINT AS gain_micro
           |FROM documents d LEFT JOIN perb USING (doc_id)
           |  LEFT JOIN peru USING (doc_id)""".stripMargin,

      // RAKE replay: stopword-boundary running count rebuilds the phrase
      // runs, deg/freq join scores words, ranked top-3 per doc
      "rake_keywords" ->
        s"""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text),
           |    '${graft.text.Rake.TokenBoundaryPattern}') AS toks
           |  FROM documents),
           |tok AS (SELECT doc_id, unnest(toks) AS w,
           |  unnest(range(len(toks))) AS ord FROM t),
           |m AS (SELECT doc_id, w, ord,
           |  CASE WHEN NOT regexp_matches(w, '^[a-z0-9_]')
           |    OR w IN (${graft.text.Rake.Stopwords.toSeq.sorted
                  .map(w => s"'$w'").mkString(",")})
           |    THEN 1 ELSE 0 END AS st FROM tok),
           |g AS (SELECT doc_id, w, ord, st,
           |  sum(st) OVER (PARTITION BY doc_id ORDER BY ord) AS grp FROM m),
           |pw AS (SELECT doc_id, grp, w, ord FROM g WHERE st = 0),
           |ph AS (SELECT doc_id, grp, string_agg(w, ' ' ORDER BY ord) AS phrase,
           |  count(*) AS plen FROM pw GROUP BY 1, 2),
           |ws AS (SELECT pw.doc_id, pw.w, count(*) AS freq, sum(ph.plen) AS deg
           |  FROM pw JOIN ph USING (doc_id, grp) GROUP BY 1, 2),
           |ps AS (SELECT pw.doc_id, pw.grp,
           |  sum(1000 * ws.deg // ws.freq) AS score
           |  FROM pw JOIN ws ON pw.doc_id = ws.doc_id AND pw.w = ws.w
           |  GROUP BY 1, 2),
           |pp AS (SELECT DISTINCT ph.doc_id, ph.phrase, ps.score
           |  FROM ph JOIN ps USING (doc_id, grp)),
           |r AS (SELECT doc_id, phrase, score,
           |  row_number() OVER (PARTITION BY doc_id
           |    ORDER BY score DESC, phrase) AS rnk FROM pp)
           |SELECT doc_id, phrase, score::BIGINT AS score_milli,
           |  rnk::BIGINT AS rank FROM r WHERE rnk <= 3""".stripMargin,

      // PMI replay: one-scan unigram+bigram counts, micro-nat lns, the
      // (pmi desc, w1, w2) total order
      "pmi_collocations" ->
        """WITH toks AS (SELECT list_filter(
          |  regexp_split_to_array(lower(text), '\W+'), t -> t <> '') AS tk
          |  FROM documents),
          |uc AS (SELECT w, count(*)::BIGINT AS c FROM
          |  (SELECT unnest(tk) AS w FROM toks) GROUP BY 1),
          |bc AS (SELECT w1, w2, count(*)::BIGINT AS c_ab FROM
          |  (SELECT tk[i+1] AS w1, tk[i+2] AS w2 FROM toks,
          |    unnest(range(len(tk)-1)) AS t(i) WHERE len(tk) >= 2)
          |  GROUP BY 1, 2),
          |tu AS (SELECT sum(c)::BIGINT AS n_uni FROM uc),
          |tb AS (SELECT sum(c_ab)::BIGINT AS n_bi FROM bc)
          |SELECT w1, w2, c_ab,
          |  (round(ln(c_ab)*1e6)::BIGINT - round(ln(n_bi)*1e6)::BIGINT
          |   - round(ln(a.c)*1e6)::BIGINT - round(ln(b.c)*1e6)::BIGINT
          |   + 2*round(ln(n_uni)*1e6)::BIGINT) AS pmi_micro
          |FROM bc JOIN uc a ON a.w = bc.w1 JOIN uc b ON b.w = bc.w2, tu, tb
          |WHERE c_ab >= 20
          |ORDER BY pmi_micro DESC, w1, w2 LIMIT 25""".stripMargin,

      // b-bit replay: the minhash_sig chain, low-byte masks, the bucket
      // join, and BOTH estimators (corrected b-bit + full-width)
      "bbit_minhash" ->
        s"""WITH t AS (SELECT doc_id, ${toks.format("text")} AS toks
           |  FROM documents WHERE doc_id <= 500),
           |s AS (SELECT doc_id, list_distinct(list_transform(range(len(toks)-2),
           |  i -> toks[i+1]||' '||toks[i+2]||' '||toks[i+3])) AS sh
           |  FROM t WHERE len(toks) >= 3),
           |sig AS (SELECT doc_id,
           |  list_min(list_transform(sh, x -> ${hash60("'0:'||x")})) AS s0,
           |  list_min(list_transform(sh, x -> ${hash60("'1:'||x")})) AS s1,
           |  list_min(list_transform(sh, x -> ${hash60("'2:'||x")})) AS s2,
           |  list_min(list_transform(sh, x -> ${hash60("'3:'||x")})) AS s3
           |  FROM s),
           |bb AS (SELECT doc_id, s0%256 AS b0, s1%256 AS b1, s2%256 AS b2,
           |  s3%256 AS b3, s0, s1, s2, s3 FROM sig),
           |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |  (CASE WHEN a.b0=b.b0 THEN 1 ELSE 0 END +
           |   CASE WHEN a.b1=b.b1 THEN 1 ELSE 0 END +
           |   CASE WHEN a.b2=b.b2 THEN 1 ELSE 0 END +
           |   CASE WHEN a.b3=b.b3 THEN 1 ELSE 0 END) AS m_bbit,
           |  (CASE WHEN a.s0=b.s0 THEN 1 ELSE 0 END +
           |   CASE WHEN a.s1=b.s1 THEN 1 ELSE 0 END +
           |   CASE WHEN a.s2=b.s2 THEN 1 ELSE 0 END +
           |   CASE WHEN a.s3=b.s3 THEN 1 ELSE 0 END) AS m_full
           |  FROM bb a JOIN bb b ON a.b0 = b.b0 AND a.doc_id < b.doc_id)
           |SELECT id_a, id_b, m_bbit::BIGINT AS m_bbit,
           |  greatest(0, (1000*(m_bbit*256 - 4)) // (4*255))::BIGINT AS est_milli,
           |  m_full::BIGINT AS m_full,
           |  ((1000*m_full) // 4)::BIGINT AS est_full_milli
           |FROM p""".stripMargin,

      // water-fill replay: the single-partition window the operator
      // avoids — cumulative sums in (tokens, domain) order, first
      // crossing rank, integer level, least() allocation
      "water_fill" ->
        """WITH d AS (SELECT source||'-'||(doc_id%7) AS domain,
          |  (CASE WHEN length(regexp_replace(text,'^\s+|\s+$','','g'))=0 THEN 0
          |    ELSE len(string_split_regex(
          |      regexp_replace(text,'^\s+|\s+$','','g'),'\s+')) END)::BIGINT AS tok
          |  FROM documents),
          |g AS (SELECT domain, sum(tok)::BIGINT AS tokens FROM d GROUP BY 1),
          |r AS (SELECT domain, tokens,
          |  row_number() OVER (ORDER BY tokens, domain) - 1 AS rk,
          |  coalesce(sum(tokens) OVER (ORDER BY tokens, domain
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS pre,
          |  (count(*) OVER ())::BIGINT AS n,
          |  (sum(tokens) OVER ())::BIGINT AS tot FROM g),
          |lv AS (SELECT CASE WHEN (SELECT max(tot) FROM r) <= 15000 THEN NULL
          |  ELSE (SELECT (15000 - pre) // (n - rk) FROM r
          |    WHERE pre + (n - rk)*tokens > 15000 ORDER BY rk LIMIT 1) END AS L)
          |SELECT r.domain, r.tokens,
          |  (CASE WHEN lv.L IS NULL THEN r.tokens
          |    ELSE least(r.tokens, lv.L) END)::BIGINT AS alloc,
          |  (CASE WHEN lv.L IS NULL THEN FALSE
          |    ELSE r.tokens > lv.L END) AS capped
          |FROM r, lv""".stripMargin,

      // ANN-recall replay: both shared oracle bodies nested as subqueries,
      // truth left-joined to found, milli floor-division
      "ann_recall" ->
        s"""WITH truth AS (SELECT query_id, neighbor_id
           |  FROM (${knnTopkOracleSql}) t),
           |found AS (SELECT query_id, neighbor_id
           |  FROM (${ivfTopkOracleSql}) f)
           |SELECT t.query_id, count(*)::BIGINT AS k_truth,
           |  sum(CASE WHEN f.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
           |    AS n_hit,
           |  (1000 * sum(CASE WHEN f.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
           |    // count(*))::BIGINT AS recall_milli
           |FROM truth t LEFT JOIN found f
           |  ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
           |GROUP BY 1""".stripMargin,

      // URL-bitext replay: in this fixture the language is the only
      // code-valued segment, so the wildcarded key re-renders directly
      // (all five corpus langs are in UrlLangCodes); cap + pair join replayed
      "url_bitext" ->
        """WITH k AS (SELECT doc_id, lang AS l,
          |  'https://site'||(doc_id%7)||'/*/page'||(doc_id%13) AS key
          |  FROM documents WHERE doc_id < 500),
          |g AS (SELECT key FROM k GROUP BY key HAVING count(*) <= 32),
          |ok AS (SELECT k.* FROM k JOIN g USING (key))
          |SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.l AS lang_a,
          |  b.l AS lang_b, a.key AS url_key
          |FROM ok a JOIN ok b ON a.key = b.key
          |  AND (a.l < b.l OR (a.l = b.l AND a.doc_id < b.doc_id))""".stripMargin,

      // release-chain replay: the k-anon group filter composed with the
      // dp_counts draw/ln/division chain under the release salt
      "release_e2e" ->
        s"""WITH g AS (SELECT c_nationkey, c_mktsegment, count(*)::BIGINT AS n
           |  FROM customer GROUP BY 1, 2),
           |k AS (SELECT * FROM g WHERE n >= 10),
           |h AS (SELECT c_nationkey, c_mktsegment, n,
           |  ('0x'||substr(md5('rel1:'||c_nationkey||':'||c_mktsegment),1,15))::BIGINT
           |    AS hv FROM k),
           |x AS (SELECT c_nationkey, c_mktsegment, n,
           |  hv*2 - ${1L << 60} AS c FROM h),
           |y AS (SELECT c_nationkey, c_mktsegment, n,
           |  CASE WHEN c >= 0 THEN 1 ELSE -1 END AS s,
           |  round(ln(greatest(${1L << 60} - abs(c), 1))*1e6)::BIGINT
           |    - ${Math.round(Math.log((1L << 60).toDouble) * 1e6)} AS lt FROM x)
           |SELECT c_nationkey, c_mktsegment,
           |  n*1000000 + (-(1000*s*lt) // 500) AS noisy_micro FROM y""".stripMargin,

      // pseudonym replay: the injections are the only matches (base text
      // is PII-free — the pii_scrub parity proves it), so the expected
      // output re-renders with the hashed pseudonyms inline
      "pseudonymize" ->
        """WITH t AS (SELECT doc_id, text,
          |  ('0x'||substr(md5('pz1:agent'||doc_id||'@example.com'),1,15))::BIGINT
          |    % 1000000 AS he,
          |  ('0x'||substr(md5('pz1:5551234567'),1,15))::BIGINT % 10000 AS hp1,
          |  ('0x'||substr(md5('pz1:5559876543'),1,15))::BIGINT % 10000 AS hp2
          |  FROM documents)
          |SELECT doc_id,
          |  text ||
          |  (CASE WHEN doc_id%5=0 THEN ' contact user'||lpad(he::VARCHAR,6,'0')
          |    ||'@anon.invalid' ELSE '' END) ||
          |  (CASE WHEN doc_id%7=0 THEN ' call 555-'||lpad(hp1::VARCHAR,4,'0')
          |    ||' or 555-'||lpad(hp2::VARCHAR,4,'0') ELSE '' END) ||
          |  (CASE WHEN doc_id%9=0 THEN ' ssn 123-45-6789' ELSE '' END) AS clean,
          |  (CASE WHEN doc_id%5=0 THEN 1 ELSE 0 END)::BIGINT AS n_email,
          |  (CASE WHEN doc_id%7=0 THEN 2 ELSE 0 END)::BIGINT AS n_phone
          |FROM t""".stripMargin,

      // clone replay: re-render the code, re-tokenize with the shared
      // longest-match pattern, renumber identifiers by first occurrence
      // (dense_rank over min position), re-assemble the canonical string,
      // hash, and window-count the groups
      "code_clones" ->
        """WITH c AS (SELECT c_custkey AS doc_id, c_custkey % 40 AS g,
          |  (c_custkey // 40)::VARCHAR AS v FROM customer
          |  WHERE c_custkey <= 600),
          |c2 AS (SELECT doc_id, g, v, CASE g%4 WHEN 0 THEN '+' WHEN 1 THEN '-'
          |  WHEN 2 THEN '*' ELSE '/' END AS op FROM c),
          |codes AS (SELECT doc_id,
          |  'def fn'||v||' ( arg'||v||' , tmp'||v||' ) : return arg'||v||
          |  repeat(' '||op||' tmp'||v, (g%3+1)::INT)||' ; '||g AS code FROM c2),
          |t AS (SELECT doc_id, i, toks[i+1] AS tk FROM
          |  (SELECT doc_id, regexp_extract_all(code,
          |    '[A-Za-z_][A-Za-z0-9_]*|[0-9]+|\S') AS toks FROM codes),
          |  unnest(range(len(toks))) AS u(i)),
          |firsts AS (SELECT doc_id, tk, min(i) AS fp FROM t
          |  WHERE regexp_full_match(tk, '[A-Za-z_][A-Za-z0-9_]*')
          |    AND tk NOT IN ('def','return','if','else','while','for',
          |      'class','val','var','import','new','null','true','false')
          |  GROUP BY 1, 2),
          |ren AS (SELECT doc_id, tk, 'id'||(dense_rank() OVER
          |  (PARTITION BY doc_id ORDER BY fp) - 1) AS mapped FROM firsts),
          |mapped AS (SELECT t.doc_id, t.i, coalesce(ren.mapped,
          |  CASE WHEN regexp_full_match(t.tk, '[0-9]+') THEN 'num'
          |  ELSE t.tk END) AS mtk FROM t LEFT JOIN ren
          |  ON t.doc_id = ren.doc_id AND t.tk = ren.tk),
          |canon AS (SELECT doc_id, string_agg(mtk, ' ' ORDER BY i) AS cn
          |  FROM mapped GROUP BY 1),
          |fp2 AS (SELECT doc_id,
          |  ('0x'||substr(md5(cn),1,15))::BIGINT AS fingerprint FROM canon)
          |SELECT doc_id, fingerprint,
          |  (count(*) OVER (PARTITION BY fingerprint))::BIGINT AS group_n
          |FROM fp2""".stripMargin,

      // OOV replay: shared tokenizer, the (count desc, token) top-50 vocab,
      // left-join coverage per slice
      "oov_rate" ->
        """WITH toks AS (SELECT lang, unnest(list_filter(
          |  regexp_split_to_array(lower(text), '\W+'), t -> t <> '')) AS token
          |  FROM documents),
          |v AS (SELECT token FROM (SELECT token, count(*) AS c FROM toks
          |  GROUP BY 1 ORDER BY c DESC, token LIMIT 50)),
          |j AS (SELECT lang, t.token, (v.token IS NOT NULL) AS iv
          |  FROM toks t LEFT JOIN v ON t.token = v.token)
          |SELECT lang AS slice, count(*)::BIGINT AS n_tokens,
          |  sum(CASE WHEN iv THEN 0 ELSE 1 END)::BIGINT AS n_oov,
          |  (1000 * sum(CASE WHEN iv THEN 0 ELSE 1 END) // count(*))::BIGINT
          |    AS oov_milli
          |FROM j GROUP BY 1""".stripMargin,

      // HRW replay: per-(doc, shard) hash60 scores, argmax window with the
      // (score desc, shard asc) tie rule
      "rendezvous_shard" ->
        """WITH s AS (SELECT doc_id, s,
          |  ('0x'||substr(md5('rv:'||s||':'||doc_id),1,15))::BIGINT AS h
          |  FROM documents, unnest(range(8)) AS t(s)),
          |r AS (SELECT doc_id, s, row_number() OVER
          |  (PARTITION BY doc_id ORDER BY h DESC, s) AS rk FROM s)
          |SELECT doc_id, s::INT AS shard FROM r WHERE rk = 1""".stripMargin,

      // seeded-Laplace replay: hash60 uniform draw, inverse-CDF micro-nat
      // lns (the JVM ln(2^60) constant embedded so both engines subtract
      // the identical baseline), one toward-zero division
      "dp_counts" ->
        s"""WITH g AS (SELECT c_mktsegment, count(*)::BIGINT AS n
           |  FROM customer GROUP BY 1),
           |h AS (SELECT c_mktsegment, n,
           |  ('0x'||substr(md5('dp1:'||c_mktsegment),1,15))::BIGINT AS hv FROM g),
           |x AS (SELECT c_mktsegment, n,
           |  hv*2 - ${1L << 60} AS c FROM h),
           |y AS (SELECT c_mktsegment, n,
           |  CASE WHEN c >= 0 THEN 1 ELSE -1 END AS s,
           |  round(ln(greatest(${1L << 60} - abs(c), 1))*1e6)::BIGINT
           |    - ${Math.round(Math.log((1L << 60).toDouble) * 1e6)} AS lt FROM x)
           |SELECT c_mktsegment,
           |  n*1000000 + (-(1000*s*lt) // 500) AS noisy_micro FROM y""".stripMargin,

      // distinct-n replay: same tokenizer as token_counts/vocab_topk, list
      // slices re-render the n-grams, // is DuckDB's floor division
      "distinct_ngrams" ->
        """WITH toks AS (SELECT lang,
          |  list_filter(regexp_split_to_array(lower(text), '\W+'),
          |    t -> t <> '') AS tk FROM documents),
          |g AS (SELECT lang, n,
          |  unnest(CASE WHEN len(tk) >= n THEN
          |    list_transform(range(len(tk) - n + 1),
          |      i -> array_to_string(tk[(i+1):(i+n)], ' '))
          |    ELSE []::VARCHAR[] END) AS gram
          |  FROM toks, unnest([1, 2, 3]) AS t(n))
          |SELECT lang, n::BIGINT AS n, count(*)::BIGINT AS total_ngrams,
          |  count(DISTINCT gram)::BIGINT AS distinct_ngrams,
          |  (1000 * count(DISTINCT gram) // count(*))::BIGINT AS distinct_milli
          |FROM g GROUP BY 1, 2""".stripMargin,

      // SNM replay: the window form the operator avoids — row_number over
      // the (key, id) total order + a rank-distance self-join
      "snm_pairs" ->
        """WITH k AS (SELECT doc_id, substr(lower(text), 1, 24) AS k
          |  FROM documents),
          |r AS (SELECT doc_id,
          |  row_number() OVER (ORDER BY k, doc_id) - 1 AS rnk FROM k)
          |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          |  (b.rnk - a.rnk)::BIGINT AS rank_dist
          |FROM r a JOIN r b ON b.rnk - a.rnk BETWEEN 1 AND 3""".stripMargin,

      // greedy k-center replay: all 3 post-seed rounds unrolled — micro-
      // quantized int64 squared distances, arg-max with the (md, id)
      // tie-break, running least() min-distance exactly as the operator
      "kcenter_select" ->
        """WITH e AS (SELECT vec_id,
          |  list_transform(embedding, x -> round(x::DOUBLE*1e6)::BIGINT) AS v
          |  FROM embeddings WHERE embedding IS NOT NULL),
          |c0 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
          |d1 AS (SELECT e.vec_id, e.v, list_sum(list_transform(
          |    list_zip(e.v, c0.v), p -> (p[1]-p[2])*(p[1]-p[2])))::BIGINT AS md
          |  FROM e, c0),
          |c1 AS (SELECT * FROM d1 ORDER BY md DESC, vec_id LIMIT 1),
          |d2 AS (SELECT d1.vec_id, d1.v, least(d1.md, list_sum(list_transform(
          |    list_zip(d1.v, c1.v), p -> (p[1]-p[2])*(p[1]-p[2])))::BIGINT) AS md
          |  FROM d1, c1),
          |c2 AS (SELECT * FROM d2 ORDER BY md DESC, vec_id LIMIT 1),
          |d3 AS (SELECT d2.vec_id, d2.v, least(d2.md, list_sum(list_transform(
          |    list_zip(d2.v, c2.v), p -> (p[1]-p[2])*(p[1]-p[2])))::BIGINT) AS md
          |  FROM d2, c2),
          |c3 AS (SELECT * FROM d3 ORDER BY md DESC, vec_id LIMIT 1)
          |SELECT 0::BIGINT AS round, vec_id, 0::BIGINT AS dist2 FROM c0
          |UNION ALL SELECT 1, vec_id, md FROM c1
          |UNION ALL SELECT 2, vec_id, md FROM c2
          |UNION ALL SELECT 3, vec_id, md FROM c3""".stripMargin,

      // streaming-MG replay: the EXACT heavy-hitter rule — the stream's
      // flushed candidate set is a superset of true hitters by the MG
      // bound (den=4 <= k+1=9 per shard), and the query's batch rescore
      // reduces it to exactly this relation
      "stream_topk" ->
        """WITH v AS (SELECT CASE WHEN l_orderkey%10 < 3 THEN 'hot-a'
          |  WHEN l_orderkey%10 < 6 THEN 'hot-b'
          |  ELSE 'v'||(l_orderkey%97) END AS value
          |  FROM lineitem WHERE l_orderkey <= 20000),
          |t AS (SELECT count(*) AS total FROM v)
          |SELECT value, count(*)::BIGINT AS cnt FROM v, t
          |GROUP BY value, t.total HAVING count(*)*4 > t.total""".stripMargin,

      // VAD replay: synth PCM arithmetic (WAV is lossless), integer frame
      // means, cross-multiplied threshold, gaps-and-islands hangover merge
      "audio_vad" ->
        """WITH r AS (SELECT 'wav-'||s_suppkey AS media_ref,
          |  256 + s_suppkey%512 AS n,
          |  ('0x'||substr(md5('wav-'||s_suppkey),1,8))::BIGINT AS seed
          |  FROM supplier),
          |sam AS (SELECT media_ref, n,
          |  list_transform(range(n), i -> abs(((i*773 + seed*31) % 65536) - 32768)) AS a
          |  FROM r),
          |cm AS (SELECT media_ref, n, a,
          |  (list_sum(a) // n)::BIGINT AS clip_mean,
          |  ((n + 63) // 64)::BIGINT AS nf FROM sam),
          |fr AS (SELECT media_ref, clip_mean, f,
          |  (list_sum(a[(f*64+1)::INT : least((f+1)*64, n)::INT])
          |    // (least((f+1)*64, n) - f*64))::BIGINT AS fmean
          |  FROM cm, unnest(range(nf)) AS t(f)),
          |act AS (SELECT media_ref, f FROM fr
          |  WHERE fmean * 1000 > 1000 * clip_mean),
          |brk AS (SELECT media_ref, f, CASE WHEN
          |    f - lag(f) OVER (PARTITION BY media_ref ORDER BY f) <= 2
          |  THEN 0 ELSE 1 END AS b FROM act),
          |sid AS (SELECT media_ref, f,
          |  sum(b) OVER (PARTITION BY media_ref ORDER BY f) - 1 AS seg
          |  FROM brk)
          |SELECT media_ref, seg::BIGINT AS seg, min(f)::BIGINT AS start_frame,
          |  max(f)::BIGINT AS end_frame, count(*)::BIGINT AS n_active
          |FROM sid GROUP BY 1, 2""".stripMargin,

      // scene-cut replay: per-frame scene seeds, the aHash pixel chain
      // (the image_phash idiom), then the lag-window Hamming rule
      "video_scenes" ->
        """WITH spec0 AS (SELECT 'scn-'||c_custkey AS media_ref,
          |  (c_custkey%30) AS g FROM customer WHERE c_custkey <= 120),
          |fr AS (SELECT media_ref, g, unnest(range(8)) AS f FROM spec0),
          |fs AS (SELECT media_ref, f,
          |  ('0x'||substr(md5('scene:'||g||':'||(f//(2+g%3))),1,8))::BIGINT AS fseed,
          |  (16 + g%5)::INT AS w, (12 + g%5)::INT AS h FROM fr),
          |pxx AS (SELECT media_ref, f, fseed, w, h, unnest(range(w)) AS x FROM fs),
          |px AS (SELECT media_ref, f, fseed, w, h, x, unnest(range(h)) AS y FROM pxx),
          |g2 AS (SELECT media_ref, f, ((y*8)//h)*8 + ((x*8)//w) AS c,
          |  (299*((x*31+y*17+fseed)%256) + 587*((x*13+y*29+fseed)%256)
          |    + 114*((x*7+y*43+fseed)%256)) // 1000 AS gray FROM px),
          |cells AS (SELECT media_ref, f, c, sum(gray)//count(*) AS m
          |  FROM g2 GROUP BY 1,2,3),
          |ov AS (SELECT media_ref, f, sum(m)//64 AS om FROM cells GROUP BY 1,2),
          |bits AS (SELECT cells.media_ref, cells.f,
          |  sum(CASE WHEN m > om AND c >= 32 THEN (1::BIGINT << (c-32))
          |    ELSE 0 END)::BIGINT AS hi,
          |  sum(CASE WHEN m > om AND c < 32 THEN (1::BIGINT << c)
          |    ELSE 0 END)::BIGINT AS lo
          |  FROM cells JOIN ov USING (media_ref, f) GROUP BY 1,2),
          |lagd AS (SELECT media_ref, f, hi, lo,
          |  lag(hi) OVER (PARTITION BY media_ref ORDER BY f) AS phi,
          |  lag(lo) OVER (PARTITION BY media_ref ORDER BY f) AS plo FROM bits)
          |SELECT media_ref, f::BIGINT AS frame_index,
          |  (bit_count(xor(hi, phi)) + bit_count(xor(lo, plo)))::BIGINT AS dist
          |FROM lagd WHERE phi IS NOT NULL
          |  AND bit_count(xor(hi, phi)) + bit_count(xor(lo, plo)) >= 8""".stripMargin,

      // span-corruption replay: same block hash (sc:<id>:<b> through the
      // hash60 idiom), capped span lengths, prefix sentinel numbering,
      // list-slice re-rendering of input/target
      "span_corrupt" ->
        """WITH d AS (SELECT doc_id,
          |  regexp_replace(text, '^\s+|\s+$', '') AS t FROM documents),
          |tk AS (SELECT doc_id, CASE WHEN len(t) = 0 THEN []::VARCHAR[]
          |  ELSE regexp_split_to_array(t, '\s+') END AS toks FROM d),
          |b AS (SELECT doc_id, toks, len(toks)::BIGINT AS n,
          |  ((len(toks) + 9) // 10)::BIGINT AS nb FROM tk),
          |sb AS (SELECT doc_id, toks, n, nb, list_transform(range(nb), bb ->
          |  ('0x'||substr(md5('sc:'||doc_id||':'||bb), 1, 15))::BIGINT % 4) AS sbl
          |  FROM b),
          |eff AS (SELECT doc_id, toks, n, nb, sbl,
          |  list_transform(range(nb), bb ->
          |    least(sbl[(bb+1)::INT], n - bb*10)) AS se,
          |  list_transform(range(nb), bb ->
          |    least(10::BIGINT, n - bb*10)) AS bl,
          |  list_transform(range(nb), bb ->
          |    len(list_filter(sbl[1:bb::INT], x -> x > 0))::BIGINT) AS pre
          |  FROM sb)
          |SELECT doc_id,
          |  coalesce(array_to_string(flatten(list_transform(range(nb), bb ->
          |    list_concat(
          |      CASE WHEN se[(bb+1)::INT] > 0
          |        THEN ['<extra_id_'||pre[(bb+1)::INT]||'>']
          |        ELSE []::VARCHAR[] END,
          |      toks[(bb*10 + se[(bb+1)::INT] + 1)::INT
          |           : (bb*10 + bl[(bb+1)::INT])::INT]))), ' '), '') AS input_text,
          |  coalesce(array_to_string(flatten(list_transform(range(nb), bb ->
          |    CASE WHEN se[(bb+1)::INT] > 0 THEN
          |      list_concat(['<extra_id_'||pre[(bb+1)::INT]||'>'],
          |        toks[(bb*10 + 1)::INT : (bb*10 + se[(bb+1)::INT])::INT])
          |    ELSE []::VARCHAR[] END)), ' '), '') AS target_text,
          |  coalesce(list_sum(list_transform(se,
          |    x -> CASE WHEN x > 0 THEN 1 ELSE 0 END)), 0)::BIGINT AS n_spans,
          |  coalesce(list_sum(list_transform(se,
          |    x -> CASE WHEN x > 0 THEN x ELSE 0 END)), 0)::BIGINT AS n_masked
          |FROM eff""".stripMargin,

      // bitext-margin replay: both kNN directions (the knn_topk cosine
      // chain in micro), neighborhood sums, the exact integer ratio margin
      // (// and div both truncate toward zero), per-src best window
      "bitext_mine" ->
        """WITH s AS (SELECT vec_id, embedding FROM embeddings
          |  WHERE vec_id % 2 = 0 AND vec_id < 200),
          |d AS (SELECT vec_id, embedding FROM embeddings
          |  WHERE vec_id % 2 = 1 AND vec_id < 200),
          |fc AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
          |  round(round(list_sum(list_transform(list_zip(q.embedding, c.embedding), x -> x[1]::DOUBLE * x[2]::DOUBLE))
          |    / (sqrt(list_sum(list_transform(list_zip(q.embedding, q.embedding), x -> x[1]::DOUBLE * x[2]::DOUBLE)))
          |     * sqrt(list_sum(list_transform(list_zip(c.embedding, c.embedding), x -> x[1]::DOUBLE * x[2]::DOUBLE)))), 6) * 1e6)::BIGINT AS cm
          |  FROM s q JOIN d c ON true),
          |fk AS (SELECT * FROM (SELECT qid, cid, cm,
          |  row_number() OVER (PARTITION BY qid ORDER BY cm DESC, cid) AS rk
          |  FROM fc) WHERE rk <= 4),
          |bc AS (SELECT qid, cid, cm FROM (SELECT cid AS qid, qid AS cid, cm FROM fc)),
          |bk AS (SELECT * FROM (SELECT qid, cid, cm,
          |  row_number() OVER (PARTITION BY qid ORDER BY cm DESC, cid) AS rk
          |  FROM bc) WHERE rk <= 4),
          |ss AS (SELECT qid AS src_id, sum(cm)::BIGINT AS sum_src,
          |  count(*)::BIGINT AS n_src FROM fk GROUP BY 1),
          |sd AS (SELECT qid AS dst_id, sum(cm)::BIGINT AS sum_dst,
          |  count(*)::BIGINT AS n_dst FROM bk GROUP BY 1),
          |p AS (SELECT fk.qid AS src_id, fk.cid AS dst_id, fk.cm AS cos_micro,
          |  ((2000*fk.cm*ss.n_src*sd.n_dst) //
          |   (ss.sum_src*sd.n_dst + sd.sum_dst*ss.n_src))::BIGINT AS margin_milli
          |  FROM fk JOIN ss ON ss.src_id = fk.qid JOIN sd ON sd.dst_id = fk.cid
          |  WHERE ss.sum_src*sd.n_dst + sd.sum_dst*ss.n_src > 0)
          |SELECT src_id, dst_id, cos_micro, margin_milli,
          |  (row_number() OVER (PARTITION BY src_id
          |    ORDER BY margin_milli DESC, dst_id) = 1) AS is_best
          |FROM p""".stripMargin,

      "curation_e2e" ->
        s"""WITH pg AS (SELECT doc_id,
           |  'Home | About Us | Contact'||chr(10)||text||chr(10)||
           |  'Copyright 2026 - All Rights Reserved' AS page FROM documents),
           |l AS (SELECT doc_id, i AS line_idx, lines[i+1] AS line
           |  FROM (SELECT doc_id, string_split(page, chr(10)) AS lines FROM pg),
           |  unnest(range(len(lines))) AS t(i)),
           |h AS (SELECT doc_id, line_idx, line,
           |  ${hash60("regexp_replace(trim(lower(line)),'\\s+',' ','g')")} AS lh FROM l),
           |hot AS (SELECT lh FROM h GROUP BY lh HAVING count(*) > 5),
           |m AS (SELECT h.doc_id, h.line_idx, h.line, (hot.lh IS NOT NULL) AS is_hot
           |  FROM h LEFT JOIN hot ON h.lh=hot.lh),
           |cl AS (SELECT doc_id,
           |  coalesce(string_agg(CASE WHEN NOT is_hot THEN line END, chr(10) ORDER BY line_idx), '') AS clean_text
           |  FROM m GROUP BY doc_id),
           |g AS (SELECT doc_id, clean_text,
           |  (CASE WHEN length(regexp_replace(clean_text,'^\\s+|\\s+$$','','g'))=0 THEN 0
           |    ELSE len(string_split_regex(regexp_replace(clean_text,'^\\s+|\\s+$$','','g'),'\\s+')) END)::BIGINT AS ws_tokens
           |  FROM cl),
           |sm AS (SELECT doc_id, ws_tokens FROM g WHERE ws_tokens >= 8
           |  AND ${hash60("doc_id::VARCHAR")} < ${(BigDecimal(0.5) * BigDecimal(1L << 60)).toLong}),
           |t2 AS (SELECT doc_id, ${hash60("doc_id::VARCHAR")} % 4 AS shard, ws_tokens AS n_tokens FROM sm),
           |c AS (SELECT doc_id, shard, n_tokens,
           |  sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS tok_end
           |  FROM t2)
           |SELECT doc_id, shard, n_tokens, (tok_end-n_tokens)::BIGINT AS tok_start,
           |  (shard*1099511627776 + (tok_end-n_tokens)//128)::BIGINT AS seq_first,
           |  (CASE WHEN n_tokens=0 THEN shard*1099511627776 + (tok_end-n_tokens)//128
           |    ELSE shard*1099511627776 + (tok_end-1)//128 END)::BIGINT AS seq_last,
           |  ((tok_end-n_tokens)%128)::BIGINT AS offset_in_seq,
           |  (CASE WHEN n_tokens=0 THEN FALSE
           |    ELSE (tok_end-n_tokens)//128 <> (tok_end-1)//128 END) AS is_split
           |FROM c""".stripMargin,

      "line_dedup" ->
        s"""WITH pg AS (SELECT doc_id,
           |  'Home | About Us | Contact'||chr(10)||'Section '||(doc_id%7)||chr(10)||text||chr(10)||
           |  'Copyright 2026 - All Rights Reserved' AS page FROM documents),
           |l AS (SELECT doc_id, i AS line_idx, lines[i+1] AS line
           |  FROM (SELECT doc_id, string_split(page, chr(10)) AS lines FROM pg),
           |  unnest(range(len(lines))) AS t(i)),
           |h AS (SELECT doc_id, line_idx, line,
           |  ${hash60("regexp_replace(trim(lower(line)),'\\s+',' ','g')")} AS lh FROM l),
           |hot AS (SELECT lh FROM h GROUP BY lh HAVING count(*) > 5),
           |m AS (SELECT h.doc_id, h.line_idx, h.line, (hot.lh IS NOT NULL) AS is_hot
           |  FROM h LEFT JOIN hot ON h.lh=hot.lh)
           |SELECT doc_id, count(*)::BIGINT AS n_lines,
           |  sum(CASE WHEN is_hot THEN 1 ELSE 0 END)::BIGINT AS n_removed,
           |  coalesce(string_agg(CASE WHEN NOT is_hot THEN line END, chr(10) ORDER BY line_idx), '') AS clean_text
           |FROM m GROUP BY doc_id""".stripMargin,

      "decontaminate" ->
        s"""WITH tok AS (SELECT doc_id, ${toks.format("text")} AS toks FROM documents),
           |sh AS (SELECT doc_id,
           |  list_distinct(list_transform(range(len(toks)-2), i -> toks[i+1]||' '||toks[i+2]||' '||toks[i+3])) AS shl
           |  FROM tok WHERE len(toks) >= 3),
           |rows_ AS (SELECT doc_id, ${hash60("s")} AS sh FROM (SELECT doc_id, unnest(shl) AS s FROM sh)),
           |bench AS (SELECT DISTINCT sh FROM rows_ WHERE doc_id%23=0),
           |per AS (SELECT r.doc_id, count(*) AS n_sh, count(b.sh) AS n_hits
           |  FROM rows_ r LEFT JOIN bench b ON r.sh=b.sh GROUP BY 1),
           |stats AS (SELECT d.doc_id,
           |  coalesce(n_sh,0)::BIGINT AS n_shingles, coalesce(n_hits,0)::BIGINT AS n_hits,
           |  (CASE WHEN coalesce(n_sh,0)=0 THEN 0.0
           |    ELSE round(coalesce(n_hits,0)::DOUBLE/n_sh::DOUBLE,6) END) AS overlap_ratio
           |  FROM documents d LEFT JOIN per ON d.doc_id=per.doc_id)
           |SELECT doc_id, n_shingles, n_hits, overlap_ratio,
           |  overlap_ratio >= 0.5 AS is_contaminated FROM stats""".stripMargin,

      "seq_pack" ->
        s"""WITH t AS (SELECT doc_id,
           |  ${hash60("doc_id::VARCHAR")} % 8 AS shard,
           |  (CASE WHEN length(regexp_replace(text,'^\\s+|\\s+$$','','g'))=0 THEN 0
           |    ELSE len(string_split_regex(regexp_replace(text,'^\\s+|\\s+$$','','g'),'\\s+')) END)::BIGINT AS n_tokens
           |  FROM documents),
           |c AS (SELECT doc_id, shard, n_tokens,
           |  sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS tok_end
           |  FROM t)
           |SELECT doc_id, shard, n_tokens, (tok_end-n_tokens)::BIGINT AS tok_start,
           |  (shard*1099511627776 + (tok_end-n_tokens)//512)::BIGINT AS seq_first,
           |  (CASE WHEN n_tokens=0 THEN shard*1099511627776 + (tok_end-n_tokens)//512
           |    ELSE shard*1099511627776 + (tok_end-1)//512 END)::BIGINT AS seq_last,
           |  ((tok_end-n_tokens)%512)::BIGINT AS offset_in_seq,
           |  (CASE WHEN n_tokens=0 THEN FALSE
           |    ELSE (tok_end-n_tokens)//512 <> (tok_end-1)//512 END) AS is_split
           |FROM c""".stripMargin,

      "seq_pack_shuffled" ->
        s"""WITH t AS (SELECT doc_id,
           |  ${hash60("doc_id::VARCHAR")} % 8 AS shard,
           |  (CASE WHEN length(regexp_replace(text,'^\\s+|\\s+$$','','g'))=0 THEN 0
           |    ELSE len(string_split_regex(regexp_replace(text,'^\\s+|\\s+$$','','g'),'\\s+')) END)::BIGINT AS n_tokens
           |  FROM documents),
           |c AS (SELECT doc_id, shard, n_tokens,
           |  sum(n_tokens) OVER (PARTITION BY shard ORDER BY md5(doc_id::VARCHAR), doc_id ROWS UNBOUNDED PRECEDING) AS tok_end
           |  FROM t)
           |SELECT doc_id, shard, n_tokens, (tok_end-n_tokens)::BIGINT AS tok_start,
           |  (shard*1099511627776 + (tok_end-n_tokens)//512)::BIGINT AS seq_first,
           |  (CASE WHEN n_tokens=0 THEN shard*1099511627776 + (tok_end-n_tokens)//512
           |    ELSE shard*1099511627776 + (tok_end-1)//512 END)::BIGINT AS seq_last,
           |  ((tok_end-n_tokens)%512)::BIGINT AS offset_in_seq,
           |  (CASE WHEN n_tokens=0 THEN FALSE
           |    ELSE (tok_end-n_tokens)//512 <> (tok_end-1)//512 END) AS is_split
           |FROM c""".stripMargin,

      // replay of Batching.paddingReport: ws token counts (seq_pack's
      // trim/split twin), power-of-two bucket via bin-string length,
      // md5-sharded per-(bucket, shard) windows, integer waste
      "length_buckets" ->
        s"""WITH t AS (SELECT doc_id,
           |  ${hash60("doc_id::VARCHAR")} % 4 AS shard,
           |  (CASE WHEN length(regexp_replace(text,'^\\s+|\\s+$$','','g'))=0 THEN 0
           |    ELSE len(string_split_regex(regexp_replace(text,'^\\s+|\\s+$$','','g'),'\\s+')) END)::BIGINT AS n_tokens
           |  FROM documents),
           |b AS (SELECT doc_id, shard, n_tokens,
           |  (CASE WHEN n_tokens <= 1 THEN 1
           |    ELSE 1::BIGINT << length(bin(n_tokens-1)) END)::BIGINT AS bucket
           |  FROM t WHERE n_tokens > 0),
           |r AS (SELECT *, row_number() OVER (PARTITION BY bucket, shard
           |    ORDER BY md5(doc_id::VARCHAR), doc_id) - 1 AS rn FROM b)
           |SELECT bucket, shard, (rn//4)::BIGINT AS batch_idx,
           |  count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS sum_tokens,
           |  max(n_tokens)::BIGINT AS max_tokens,
           |  (count(*)*bucket)::BIGINT AS padded_tokens,
           |  ((1000*(count(*)*bucket - sum(n_tokens)))//(count(*)*bucket))::BIGINT AS waste_milli
           |FROM r GROUP BY bucket, shard, rn//4""".stripMargin,

      // replay of Recipe.epochPlan: per-source ws-token inventory joined to
      // the literal milli-weight recipe, integer needs/epochs/flags
      "epoch_plan" ->
        """WITH inv AS (SELECT source,
          |  sum(CASE WHEN length(regexp_replace(text,'^\s+|\s+$','','g'))=0 THEN 0
          |    ELSE len(string_split_regex(regexp_replace(text,'^\s+|\s+$','','g'),'\s+')) END)::BIGINT AS src_tokens
          |  FROM documents GROUP BY 1),
          |w(wsource, weight_milli) AS (VALUES
          |  ('src0',400),('src1',300),('src2',200),('src3',100))
          |SELECT source, src_tokens,
          |  coalesce(weight_milli,0)::BIGINT AS weight_milli,
          |  ((50000*coalesce(weight_milli,0))//1000)::BIGINT AS needed_tokens,
          |  (CASE WHEN src_tokens = 0 THEN 0
          |    ELSE (1000*((50000*coalesce(weight_milli,0))//1000))//src_tokens
          |  END)::BIGINT AS epochs_milli,
          |  (CASE WHEN src_tokens = 0 THEN 0
          |    ELSE (1000*((50000*coalesce(weight_milli,0))//1000))//src_tokens
          |  END) > 1000 AS oversampled
          |FROM inv LEFT JOIN w ON source = wsource""".stripMargin,

      "sample_stratified" ->
        """WITH r AS (SELECT doc_id, lang,
          |  row_number() OVER (PARTITION BY lang ORDER BY md5(doc_id::VARCHAR), doc_id) AS sample_rank,
          |  count(*) OVER (PARTITION BY lang) AS stratum_n
          |  FROM documents)
          |SELECT doc_id, lang, sample_rank::BIGINT AS sample_rank, stratum_n::BIGINT AS stratum_n
          |FROM r WHERE sample_rank <= ceil(stratum_n * 0.25)""".stripMargin,

      "sample_hash" ->
        s"""SELECT doc_id, lang, source FROM documents
           |WHERE ${hash60("doc_id::VARCHAR")} < ${(BigDecimal(0.25) * BigDecimal(1L << 60)).toLong}""".stripMargin,

      "domain_cap" ->
        """WITH d AS (SELECT doc_id, source||'-'||(doc_id % 7) AS domain FROM documents),
          |r AS (SELECT doc_id, domain,
          |  row_number() OVER (PARTITION BY domain ORDER BY md5(doc_id::VARCHAR), doc_id) AS domain_rank,
          |  count(*) OVER (PARTITION BY domain) AS domain_n FROM d)
          |SELECT doc_id, domain, domain_rank::BIGINT AS domain_rank,
          |  domain_n::BIGINT AS domain_n
          |FROM r WHERE domain_rank <= 10""".stripMargin,

      "domain_cap_scalable" ->
        s"""WITH d AS (SELECT doc_id, source||'-'||(doc_id % 7) AS domain FROM documents),
           |sz AS (SELECT domain, count(*) AS domain_n FROM d GROUP BY 1),
           |pre AS (SELECT d.doc_id, d.domain, sz.domain_n
           |  FROM d JOIN sz USING (domain)
           |  WHERE sz.domain_n <= 10
           |     OR ${hash32("d.doc_id::VARCHAR")} < ${10L * 2L * (1L << 32)} // sz.domain_n),
           |r AS (SELECT doc_id, domain, domain_n,
           |  row_number() OVER (PARTITION BY domain ORDER BY md5(doc_id::VARCHAR), doc_id) AS domain_rank
           |  FROM pre)
           |SELECT doc_id, domain, domain_rank::BIGINT AS domain_rank,
           |  domain_n::BIGINT AS domain_n
           |FROM r WHERE domain_rank <= 10""".stripMargin,

      "group_reservoir" ->
        """WITH d AS (SELECT doc_id, source||'-'||(doc_id % 7) AS domain FROM documents),
          |r AS (SELECT doc_id, domain,
          |  row_number() OVER (PARTITION BY domain ORDER BY md5(doc_id::VARCHAR), doc_id) AS res_rank,
          |  count(*) OVER (PARTITION BY domain) AS group_n FROM d)
          |SELECT doc_id, domain, res_rank::BIGINT AS res_rank,
          |  group_n::BIGINT AS group_n
          |FROM r WHERE res_rank <= 5""".stripMargin,

      "mixture_sample" ->
        s"""WITH sz AS (SELECT lang, count(*) AS stratum_n FROM documents GROUP BY 1),
           |t(lang, stratum_target) AS (VALUES ('en', 60), ('de', 100000), ('fr', 40), ('es', 40))
           |SELECT d.doc_id, d.lang, sz.stratum_n::BIGINT AS stratum_n,
           |  t.stratum_target::BIGINT AS stratum_target
           |FROM documents d JOIN sz USING (lang) JOIN t USING (lang)
           |WHERE sz.stratum_n <= t.stratum_target
           |   OR ${hash32("d.doc_id::VARCHAR")} <
           |      (t.stratum_target::BIGINT * 4294967296) // sz.stratum_n""".stripMargin,

      "substring_dedup" ->
        s"""WITH d AS (SELECT doc_id, $disclaimerCase AS page FROM documents),
           |tk AS (SELECT doc_id, ${toks.format("page")} AS l FROM d),
           |tok AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos FROM tk),
           |kg AS (SELECT doc_id, pos, ${hash60("array_to_string(l[pos+1:pos+8], ' ')")} AS kh
           |  FROM (SELECT doc_id, l, unnest(range(len(l)-7)) AS pos FROM tk WHERE len(l) >= 8)),
           |m AS (SELECT doc_id, pos,
           |  count(*) OVER (PARTITION BY kh) AS occ,
           |  row_number() OVER (PARTITION BY kh ORDER BY md5(doc_id::VARCHAR), doc_id, pos) AS rn
           |  FROM kg),
           |starts AS (SELECT doc_id, pos FROM m WHERE occ > 1 AND rn > 1),
           |cov AS (SELECT DISTINCT doc_id, pos + o AS pos FROM starts, unnest(range(8)) AS t(o)),
           |kept AS (SELECT t.doc_id, t.pos, t.tok, (c.pos IS NOT NULL) AS is_cov
           |  FROM tok t LEFT JOIN cov c ON t.doc_id=c.doc_id AND t.pos=c.pos),
           |agg AS (SELECT doc_id, count(*) AS n_tokens,
           |  sum(CASE WHEN is_cov THEN 1 ELSE 0 END) AS n_removed,
           |  coalesce(string_agg(CASE WHEN NOT is_cov THEN tok END, ' ' ORDER BY pos), '') AS clean_text
           |  FROM kept GROUP BY 1)
           |SELECT d.doc_id, coalesce(n_tokens,0)::BIGINT AS n_tokens,
           |  coalesce(n_removed,0)::BIGINT AS n_removed,
           |  coalesce(clean_text,'') AS clean_text
           |FROM d LEFT JOIN agg USING (doc_id)""".stripMargin,

      "vocab_topk" ->
        s"""WITH tok AS (SELECT unnest(${toks.format("text")}) AS token FROM documents)
           |SELECT token, count(*)::BIGINT AS cnt FROM tok GROUP BY 1
           |ORDER BY cnt DESC, token ASC LIMIT 20""".stripMargin,

      // SCD2 replay: history pass-through + full-outer open/increment join
      // with the same change/insert/keep case split
      "scd2_merge" ->
        s"""WITH open_ AS (SELECT doc_id, ${hash60("text")} AS ofp, 1 AS vfrom
           |  FROM documents WHERE doc_id%4 <> 3),
           |hist AS (SELECT doc_id, ${hash60("text || 'old'")} AS fp,
           |  0::BIGINT AS valid_from, 1::BIGINT AS valid_to
           |  FROM documents WHERE doc_id%7 = 0),
           |inc AS (SELECT doc_id, CASE WHEN doc_id%6 = 0
           |    THEN ${hash60("text || 'v2'")} ELSE ${hash60("text")} END AS nfp
           |  FROM documents WHERE doc_id%2 = 0),
           |j AS (SELECT coalesce(o.doc_id, i.doc_id) AS doc_id, o.ofp, o.vfrom,
           |  i.nfp, o.doc_id IS NOT NULL AS in_old, i.doc_id IS NOT NULL AS in_new
           |  FROM open_ o FULL JOIN inc i ON o.doc_id = i.doc_id),
           |oldr AS (SELECT doc_id, ofp AS fp, vfrom::BIGINT AS valid_from,
           |  CASE WHEN in_new AND ofp <> nfp THEN 2 END::BIGINT AS valid_to
           |  FROM j WHERE in_old),
           |newr AS (SELECT doc_id, nfp AS fp, 2::BIGINT AS valid_from,
           |  NULL::BIGINT AS valid_to
           |  FROM j WHERE in_new AND (NOT in_old OR ofp <> nfp))
           |SELECT doc_id, fp, valid_from, valid_to FROM hist
           |UNION ALL SELECT doc_id, fp, valid_from, valid_to FROM oldr
           |UNION ALL SELECT doc_id, fp, valid_from, valid_to FROM newr""".stripMargin,

      // split replay: same md5 permille bucket, same cumulative cuts
      "dataset_split" ->
        s"""SELECT doc_id,
           |  CASE WHEN ${hash60("doc_id::VARCHAR")} % 1000 < 800 THEN 'train'
           |       WHEN ${hash60("doc_id::VARCHAR")} % 1000 < 900 THEN 'val'
           |       ELSE 'test' END AS split
           |FROM documents""".stripMargin,

      // datasheet replay: same token rule, same fingerprint, one aggregate
      "corpus_datasheet" ->
        s"""SELECT count(*)::BIGINT AS n_docs,
           |  sum(CASE WHEN length(regexp_replace(text,'^\\s+|\\s+$$','','g'))=0 THEN 0
           |    ELSE len(string_split_regex(regexp_replace(text,'^\\s+|\\s+$$','','g'),'\\s+')) END)::BIGINT AS n_ws_tokens,
           |  sum(n_chars)::BIGINT AS n_chars,
           |  (count(*) - count(DISTINCT
           |    ${hash60("regexp_replace(trim(lower(text)),'\\s+',' ','g')")}))::BIGINT AS n_exact_dups
           |FROM documents""".stripMargin,

      // as-of replay: the merge replay wrapped in the validity predicate
      "scd2_asof" ->
        s"""WITH open_ AS (SELECT doc_id, ${hash60("text")} AS ofp, 1 AS vfrom
           |  FROM documents WHERE doc_id%4 <> 3),
           |hist AS (SELECT doc_id, ${hash60("text || 'old'")} AS fp,
           |  0::BIGINT AS valid_from, 1::BIGINT AS valid_to
           |  FROM documents WHERE doc_id%7 = 0),
           |inc AS (SELECT doc_id, CASE WHEN doc_id%6 = 0
           |    THEN ${hash60("text || 'v2'")} ELSE ${hash60("text")} END AS nfp
           |  FROM documents WHERE doc_id%2 = 0),
           |j AS (SELECT coalesce(o.doc_id, i.doc_id) AS doc_id, o.ofp, o.vfrom,
           |  i.nfp, o.doc_id IS NOT NULL AS in_old, i.doc_id IS NOT NULL AS in_new
           |  FROM open_ o FULL JOIN inc i ON o.doc_id = i.doc_id),
           |oldr AS (SELECT doc_id, ofp AS fp, vfrom::BIGINT AS valid_from,
           |  CASE WHEN in_new AND ofp <> nfp THEN 2 END::BIGINT AS valid_to
           |  FROM j WHERE in_old),
           |newr AS (SELECT doc_id, nfp AS fp, 2::BIGINT AS valid_from,
           |  NULL::BIGINT AS valid_to
           |  FROM j WHERE in_new AND (NOT in_old OR ofp <> nfp)),
           |m AS (SELECT doc_id, fp, valid_from, valid_to FROM hist
           |  UNION ALL SELECT doc_id, fp, valid_from, valid_to FROM oldr
           |  UNION ALL SELECT doc_id, fp, valid_from, valid_to FROM newr)
           |SELECT * FROM m
           |WHERE valid_from <= 1 AND (valid_to IS NULL OR valid_to > 1)""".stripMargin,

      // containment replay: distinct 3-shingle hashes per doc, in-bucket
      // pair counts, both milli directions (non-negative, so DuckDB's
      // truncating // IS floor here)
      "containment_pairs" ->
        s"""WITH t AS (SELECT doc_id, $containmentCase AS page FROM documents),
           |tk AS (SELECT doc_id, ${toks.format("page")} AS l FROM t),
           |sh AS (SELECT doc_id,
           |  list_distinct(list_transform(range(len(l)-2), i -> l[i+1]||' '||l[i+2]||' '||l[i+3])) AS shl
           |  FROM tk WHERE len(l) >= 3),
           |rows_ AS (SELECT DISTINCT doc_id, ${hash60("s")} AS sh
           |  FROM (SELECT doc_id, unnest(shl) AS s FROM sh)),
           |sz AS (SELECT doc_id, count(*) AS sz FROM rows_ GROUP BY 1),
           |pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
           |  FROM rows_ a JOIN rows_ b ON a.sh = b.sh AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2)
           |SELECT id_a, id_b, common::BIGINT AS common,
           |  sa.sz::BIGINT AS sz_a, sb.sz::BIGINT AS sz_b,
           |  ((1000*common)//sa.sz)::BIGINT AS cont_a_milli,
           |  ((1000*common)//sb.sz)::BIGINT AS cont_b_milli
           |FROM pr JOIN sz sa ON pr.id_a = sa.doc_id
           |  JOIN sz sb ON pr.id_b = sb.doc_id
           |WHERE greatest((1000*common)//sa.sz, (1000*common)//sb.sz) >= 800""".stripMargin,

      // novelty replay: same tokenization + 8-gram hash as substring_dedup;
      // shared = k-gram in >1 DISTINCT doc; integer milli floor-div
      "novelty_score" ->
        s"""WITH d AS (SELECT doc_id, $disclaimerCase AS page FROM documents),
           |tk AS (SELECT doc_id, ${toks.format("page")} AS l FROM d),
           |kg AS (SELECT doc_id, ${hash60("array_to_string(l[pos+1:pos+8], ' ')")} AS kh
           |  FROM (SELECT doc_id, l, unnest(range(len(l)-7)) AS pos FROM tk WHERE len(l) >= 8)),
           |nd AS (SELECT kh, count(DISTINCT doc_id) AS n_docs FROM kg GROUP BY 1),
           |sc AS (SELECT kg.doc_id, count(*) AS n_kgrams,
           |  sum(CASE WHEN nd.n_docs > 1 THEN 1 ELSE 0 END) AS n_shared
           |  FROM kg JOIN nd USING (kh) GROUP BY 1)
           |SELECT d.doc_id, coalesce(n_kgrams, 0)::BIGINT AS n_kgrams,
           |  coalesce(n_shared, 0)::BIGINT AS n_shared,
           |  (CASE WHEN coalesce(n_kgrams, 0) = 0 THEN 1000
           |    ELSE (1000*(n_kgrams-n_shared))//n_kgrams END)::BIGINT AS novelty_milli
           |FROM d LEFT JOIN sc USING (doc_id)""".stripMargin,

      "dedup_clusters" ->
        s"""WITH RECURSIVE $jacPairs,
           |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
           |  UNION SELECT id_b, id_a FROM pairs),
           |reach(id, r) AS (
           |  SELECT s, s FROM edges
           |  UNION
           |  SELECT reach.id, e.d FROM reach JOIN edges e ON reach.r = e.s)
           |SELECT id, min(r) AS cluster_id FROM reach GROUP BY id""".stripMargin,

      "dedup_clusters_alt" ->
        s"""WITH RECURSIVE $jacPairs,
           |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
           |  UNION SELECT id_b, id_a FROM pairs),
           |reach(id, r) AS (
           |  SELECT s, s FROM edges
           |  UNION
           |  SELECT reach.id, e.d FROM reach JOIN edges e ON reach.r = e.s)
           |SELECT id, min(r) AS cluster_id FROM reach GROUP BY id""".stripMargin,

      "dedup_canonical" ->
        s"""WITH RECURSIVE $jacPairs,
           |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
           |  UNION SELECT id_b, id_a FROM pairs),
           |reach(id, r) AS (
           |  SELECT s, s FROM edges
           |  UNION
           |  SELECT reach.id, e.d FROM reach JOIN edges e ON reach.r = e.s),
           |cc AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id)
           |SELECT d.doc_id, coalesce(cc.cluster_id, d.doc_id) AS cluster_id,
           |  coalesce(cc.cluster_id, d.doc_id) = d.doc_id AS is_canonical
           |FROM documents d LEFT JOIN cc USING (doc_id)""".stripMargin,

      "dedup_best_of_cluster" ->
        s"""WITH RECURSIVE $jacPairs,
           |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
           |  UNION SELECT id_b, id_a FROM pairs),
           |reach(id, r) AS (
           |  SELECT s, s FROM edges
           |  UNION
           |  SELECT reach.id, e.d FROM reach JOIN edges e ON reach.r = e.s),
           |cc AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
           |full_ AS (SELECT d.doc_id,
           |  coalesce(cc.cluster_id, d.doc_id) AS cluster_id,
           |  length($docText)::BIGINT AS n_chars2
           |  FROM documents d LEFT JOIN cc USING (doc_id))
           |SELECT doc_id, cluster_id, n_chars2,
           |  row_number() OVER (PARTITION BY cluster_id
           |    ORDER BY n_chars2 DESC, doc_id) = 1 AS is_canonical
           |FROM full_""".stripMargin,

      "knn_topk" -> knnTopkOracleSql,

      // JL replay: same (j,i) sign mix as the Spark side ("jl" additive
      // constant 51151), micro-quantized inputs, integer sums
      "jl_project" ->
        """WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL),
          |g AS (SELECT vec_id, embedding, unnest(range(8)) AS j FROM e),
          |s AS (SELECT vec_id, j, i,
          |  (((((((j*7919 + i*104729 + 51151) & 2147483647))*2654435761 + 1013904223) >> 16) % 2)*2 - 1) AS sgn,
          |  round(embedding[(i+1)::INT]::DOUBLE * 1e6)::BIGINT AS vm
          |  FROM (SELECT vec_id, j, embedding, unnest(range(len(embedding))) AS i FROM g))
          |SELECT vec_id, j::BIGINT AS dim, sum(sgn * vm)::BIGINT AS out_micro
          |FROM s GROUP BY 1, 2""".stripMargin,

      // pooling replay: same micro quantization, integer sum, ONE
      // truncated division per (label, dim) — // and DIV both truncate
      "embed_pool" ->
        """WITH e AS (SELECT label, embedding FROM embeddings
          |  WHERE embedding IS NOT NULL),
          |x AS (SELECT label, unnest(embedding) AS v,
          |  unnest(range(len(embedding))) AS dim FROM e)
          |SELECT label::BIGINT AS label, dim::BIGINT AS dim,
          |  (sum(round(v::DOUBLE*1e6)::BIGINT) // count(*))::BIGINT AS mean_micro,
          |  count(*)::BIGINT AS n
          |FROM x GROUP BY 1, 2""".stripMargin,

      // the label-mismatch predicate lands in the pair join, then the same
      // exact ranking as knn_topk
      "hard_negatives" ->
        """WITH e AS (SELECT vec_id, embedding, label FROM embeddings),
          |s AS (SELECT q.vec_id AS query_id, q.label AS query_label,
          |  c.vec_id AS neighbor_id, c.label AS neighbor_label,
          |  round(list_sum(list_transform(list_zip(q.embedding, c.embedding), x -> x[1]::DOUBLE * x[2]::DOUBLE))
          |    / (sqrt(list_sum(list_transform(list_zip(q.embedding, q.embedding), x -> x[1]::DOUBLE * x[2]::DOUBLE)))
          |     * sqrt(list_sum(list_transform(list_zip(c.embedding, c.embedding), x -> x[1]::DOUBLE * x[2]::DOUBLE)))), 6) AS cos
          |  FROM e q JOIN e c ON q.vec_id < 5 AND c.vec_id <> q.vec_id AND c.label <> q.label)
          |SELECT query_id, query_label, neighbor_id, neighbor_label, cos,
          |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id)::BIGINT AS rnk
          |FROM s QUALIFY rnk <= 5""".stripMargin,

      "embedding_near_dup" ->
        """WITH e AS (SELECT vec_id, embedding FROM embeddings),
          |s AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          |  round(list_sum(list_transform(list_zip(a.embedding, b.embedding), x -> x[1]::DOUBLE * x[2]::DOUBLE))
          |    / (sqrt(list_sum(list_transform(list_zip(a.embedding, a.embedding), x -> x[1]::DOUBLE * x[2]::DOUBLE)))
          |     * sqrt(list_sum(list_transform(list_zip(b.embedding, b.embedding), x -> x[1]::DOUBLE * x[2]::DOUBLE)))), 6) AS cos
          |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
          |SELECT id_a, id_b, cos FROM s WHERE cos >= 0.4002""".stripMargin,

      "near_dup_bucketed" ->
        """WITH e AS (SELECT vec_id, embedding,
          |  CAST(coalesce(list_sum(list_transform(range(8), i ->
          |    CASE WHEN embedding[i+1] >= 0 THEN (1 << i) ELSE 0 END)),0) AS BIGINT) AS bucket
          |  FROM embeddings),
          |s AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          |  round(list_sum(list_transform(list_zip(a.embedding, b.embedding), x -> x[1]::DOUBLE * x[2]::DOUBLE))
          |    / (sqrt(list_sum(list_transform(list_zip(a.embedding, a.embedding), x -> x[1]::DOUBLE * x[2]::DOUBLE)))
          |     * sqrt(list_sum(list_transform(list_zip(b.embedding, b.embedding), x -> x[1]::DOUBLE * x[2]::DOUBLE)))), 6) AS cos
          |  FROM e a JOIN e b ON a.bucket=b.bucket AND a.vec_id < b.vec_id)
          |SELECT id_a, id_b, cos FROM s WHERE cos >= 0.4002""".stripMargin,

      "rhp_near_dup" ->
        """WITH e AS (SELECT vec_id, embedding FROM embeddings),
          |k AS (
          |  SELECT vec_id, embedding,
          |    h*4096 + list_sum(list_transform(range(12), i ->
          |      CASE WHEN round(list_sum(list_transform(range(len(embedding)), j ->
          |        embedding[j+1]::DOUBLE *
          |          (((((((h*1000003 + i*7919 + j*104729) & 2147483647))*2654435761 + 1013904223) >> 16) % 2)*2 - 1)
          |      )), 6) >= 0 THEN 1 << i ELSE 0 END)) AS key
          |  FROM e CROSS JOIN range(4) t(h)),
          |s AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
          |  round(list_sum(list_transform(list_zip(a.embedding, b.embedding), x -> x[1]::DOUBLE * x[2]::DOUBLE))
          |    / (sqrt(list_sum(list_transform(list_zip(a.embedding, a.embedding), x -> x[1]::DOUBLE * x[2]::DOUBLE)))
          |     * sqrt(list_sum(list_transform(list_zip(b.embedding, b.embedding), x -> x[1]::DOUBLE * x[2]::DOUBLE)))), 6) AS cos
          |  FROM k a JOIN k b ON a.key=b.key AND a.vec_id < b.vec_id)
          |SELECT id_a, id_b, cos FROM s WHERE cos >= 0.4002""".stripMargin,

      "sign_bucket_hist" ->
        """WITH b AS (SELECT CAST(coalesce(list_sum(list_transform(range(8), i ->
          |    CASE WHEN embedding[i+1] >= 0 THEN (1 << i) ELSE 0 END)),0) AS BIGINT) AS bucket
          |  FROM embeddings)
          |SELECT bucket, count(*) AS n FROM b GROUP BY 1""".stripMargin,

      "knn_classify" ->
        """WITH e AS (SELECT vec_id, embedding, label FROM embeddings),
          |s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label,
          |  round(list_sum(list_transform(list_zip(q.embedding, c.embedding), x -> x[1]::DOUBLE * x[2]::DOUBLE))
          |    / (sqrt(list_sum(list_transform(list_zip(q.embedding, q.embedding), x -> x[1]::DOUBLE * x[2]::DOUBLE)))
          |     * sqrt(list_sum(list_transform(list_zip(c.embedding, c.embedding), x -> x[1]::DOUBLE * x[2]::DOUBLE)))), 6) AS cos
          |  FROM e q JOIN e c ON q.vec_id < 20 AND c.vec_id <> q.vec_id),
          |topk AS (SELECT query_id, neighbor_id, label FROM s
          |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) <= 5),
          |votes AS (SELECT query_id, label, count(*) AS v FROM topk GROUP BY 1,2)
          |SELECT query_id, label::BIGINT AS predicted_label FROM votes
          |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY v DESC, label) = 1""".stripMargin,

      // full IVF training replay: hash-ordered seeds -> Lloyd assignment
      // (6dp cosine, smaller-cell tie-break) -> per-dimension 6dp means ->
      // candidate index + 2-cell probe + exact rescore
      "ivf_topk" -> ivfTopkOracleSql,

      // quantile-sketch replay: same hash cut (2⁶⁰/16), same rank pick
      "quantile_sample" ->
        s"""WITH b AS (SELECT l_orderkey*10 + l_linenumber AS id,
           |  l_extendedprice::DOUBLE AS v FROM lineitem),
           |smp AS (SELECT id, v FROM b
           |  WHERE ${hash60("id::VARCHAR")} < 72057594037927936),
           |r AS (SELECT v, row_number() OVER (ORDER BY v, id) AS rn,
           |  count(*) OVER () AS m FROM smp),
           |q(q) AS (VALUES (0.25), (0.5), (0.9), (0.99))
           |SELECT q.q::DOUBLE AS q, r.v AS est, r.m::BIGINT AS sample_n
           |FROM r JOIN q ON r.rn = greatest(1, ceil(q.q::DOUBLE * r.m)::BIGINT)""".stripMargin,

      // BPE replay: vocab → 3 unrolled (pair-count → argmax → wrapped-
      // replace merge) rounds; replace over [sym][sym] encodings is exactly
      // the canonical greedy left-to-right merge
      "bpe_merges" -> bpeMergesSql,

      // the batched trainer must be rule-for-rule identical to sequential
      // training (Bpe.trainMergesBatched scaladoc proves why; BpeSpec
      // asserts it corpus-by-corpus) — so the sequential unrolled replay IS
      // the oracle for the batched path: any unsafe batch breaks parity
      "bpe_batch" -> bpeMergesSql,

      // expected pieces per word derived by hand-walking the greedy
      // longest-match: independent of the Scala kernel, so it breaks on
      // any drift in match order, ## prefixing, or whole-word-UNK
      "wordpiece_segment" ->
        """WITH w AS (SELECT DISTINCT l_orderkey%12 AS wid FROM lineitem)
          |SELECT wid,
          |  CASE wid WHEN 0 THEN 'abc' WHEN 1 THEN 'abca' WHEN 2 THEN 'abcab'
          |    WHEN 3 THEN 'unaffable' WHEN 4 THEN 'affable' WHEN 5 THEN 'aq'
          |    WHEN 6 THEN 'q' WHEN 7 THEN 'helloworld' WHEN 8 THEN 'hello'
          |    WHEN 9 THEN 'heabc' WHEN 10 THEN 'ab' ELSE 'ba' END AS word,
          |  CASE wid WHEN 0 THEN 'abc' WHEN 1 THEN 'abc|##a' WHEN 2 THEN 'abc|##ab'
          |    WHEN 3 THEN 'un|##aff|##able' WHEN 4 THEN 'aff|##able'
          |    WHEN 5 THEN '[UNK]' WHEN 6 THEN '[UNK]'
          |    WHEN 7 THEN 'hello|##wor|##ld' WHEN 8 THEN 'hello'
          |    WHEN 9 THEN 'he|##ab|##c' WHEN 10 THEN 'ab' ELSE 'b|##a' END AS pieces
          |FROM w""".stripMargin,

      "unigram_segment" ->
        s"""$unigramDp
           |SELECT word, cnt::BIGINT AS cnt, pieces,
           |  cost::BIGINT AS cost_micro FROM p${graft.text.Unigram.MaxWordLen}""".stripMargin,

      "unigram_counts" ->
        s"""$unigramDp,
           |tok AS (SELECT cnt, unnest(string_split(pieces, ' ')) AS token
           |  FROM p${graft.text.Unigram.MaxWordLen})
           |SELECT token, sum(cnt)::BIGINT AS cnt FROM tok
           |WHERE token <> '' GROUP BY 1""".stripMargin,

      "bpe_segment" ->
        s"""WITH tok AS (SELECT unnest(${toks.format("text")}) AS w FROM documents),
           |v0 AS (SELECT w AS word, count(*) AS cnt,
           |  list_filter(string_split(w, ''), x -> x <> '') AS syms FROM tok GROUP BY 1),
           |p1 AS (SELECT syms[j+1] AS l, syms[j+2] AS r, sum(cnt) AS pc
           |  FROM v0, unnest(range(len(syms)-1)) AS t(j) GROUP BY 1, 2),
           |b1 AS (SELECT l, r, pc FROM p1 ORDER BY pc DESC, l, r LIMIT 1),
           |v1 AS (SELECT word, cnt,
           |  regexp_extract_all(replace('['||array_to_string(syms,'][')||']',
           |    '['||b1.l||']['||b1.r||']', '['||b1.l||b1.r||']'), '\\[([^\\]]*)\\]', 1) AS syms
           |  FROM v0, b1),
           |p2 AS (SELECT syms[j+1] AS l, syms[j+2] AS r, sum(cnt) AS pc
           |  FROM v1, unnest(range(len(syms)-1)) AS t(j) GROUP BY 1, 2),
           |b2 AS (SELECT l, r, pc FROM p2 ORDER BY pc DESC, l, r LIMIT 1),
           |v2 AS (SELECT word, cnt,
           |  regexp_extract_all(replace('['||array_to_string(syms,'][')||']',
           |    '['||b2.l||']['||b2.r||']', '['||b2.l||b2.r||']'), '\\[([^\\]]*)\\]', 1) AS syms
           |  FROM v1, b2),
           |p3 AS (SELECT syms[j+1] AS l, syms[j+2] AS r, sum(cnt) AS pc
           |  FROM v2, unnest(range(len(syms)-1)) AS t(j) GROUP BY 1, 2),
           |b3 AS (SELECT l, r, pc FROM p3 ORDER BY pc DESC, l, r LIMIT 1),
           |v3 AS (SELECT word, cnt,
           |  regexp_extract_all(replace('['||array_to_string(syms,'][')||']',
           |    '['||b3.l||']['||b3.r||']', '['||b3.l||b3.r||']'), '\\[([^\\]]*)\\]', 1) AS syms
           |  FROM v2, b3)
           |SELECT word, cnt, array_to_string(syms, ' ') AS segmented
           |FROM v3 ORDER BY cnt DESC, word LIMIT 50""".stripMargin,

      // JSONL replay: the round-trip makes the expected parsed relation a
      // pure function of the source columns — corrupt lines all-null, the
      // no-title branch missing:title, corrupt (%7) outranking drift (%11)
      "stream_jsonl" ->
        """SELECT
          |  CASE WHEN doc_id%7=0 THEN NULL ELSE doc_id END AS id,
          |  CASE WHEN doc_id%7=0 OR doc_id%11=0 THEN NULL
          |       ELSE 'T'||doc_id::VARCHAR END AS title,
          |  CASE WHEN doc_id%7=0 THEN NULL ELSE n_chars END AS n,
          |  CASE WHEN doc_id%7=0 THEN NULL ELSE text END AS body,
          |  (doc_id%7=0 OR doc_id%11=0) AS quarantined,
          |  CASE WHEN doc_id%7=0 THEN 'corrupt'
          |       WHEN doc_id%11=0 THEN 'missing:title' END AS reason
          |FROM documents""".stripMargin,

      "jsonl_ingest" ->
        """SELECT
          |  CASE WHEN doc_id%7=0 THEN NULL ELSE doc_id END AS id,
          |  CASE WHEN doc_id%7=0 OR doc_id%11=0 THEN NULL
          |       ELSE 'T'||doc_id::VARCHAR END AS title,
          |  CASE WHEN doc_id%7=0 THEN NULL ELSE n_chars END AS n,
          |  CASE WHEN doc_id%7=0 THEN NULL ELSE text END AS body,
          |  (doc_id%7=0 OR doc_id%11=0) AS quarantined,
          |  CASE WHEN doc_id%7=0 THEN 'corrupt'
          |       WHEN doc_id%11=0 THEN 'missing:title' END AS reason
          |FROM documents""".stripMargin,

      // ingest replay: within-batch fingerprint dedup → corpus Bloom
      // positions → probe (FP-exact) → quality gate
      "ingest_e2e" ->
        s"""WITH t AS (SELECT doc_id, $docText AS t2 FROM documents),
           |ded AS (SELECT doc_id, t2 FROM (
           |  SELECT doc_id, t2, min(doc_id) OVER (PARTITION BY fp) AS can FROM (
           |    SELECT doc_id, t2,
           |      ${hash60("regexp_replace(trim(lower(t2)),'\\s+',' ','g')")} AS fp
           |    FROM t WHERE doc_id % 2 = 1))
           |  WHERE doc_id = can),
           |bp AS (SELECT DISTINCT (('0x'||substr(md5(t2),1,15))::BIGINT
           |    + i*(('0x'||substr(md5(t2),17,10))::BIGINT | 1)) % 16384 AS pos
           |  FROM t, (SELECT unnest(range(4)) AS i) WHERE doc_id % 2 = 0),
           |pp AS (SELECT doc_id, t2,
           |    (('0x'||substr(md5(t2),1,15))::BIGINT
           |    + i*(('0x'||substr(md5(t2),17,10))::BIGINT | 1)) % 16384 AS pos
           |  FROM ded, (SELECT unnest(range(4)) AS i)),
           |keep AS (SELECT doc_id, t2 FROM pp GROUP BY 1, 2
           |  HAVING NOT bool_and(pos IN (SELECT pos FROM bp))),
           |q AS (SELECT doc_id, t2, ${toks.format("t2")} AS toks,
           |  greatest(length(t2),1)::DOUBLE AS n FROM keep),
           |sc AS (SELECT doc_id, t2,
           |  round(CAST(0.25*least(length(t2)::DOUBLE/500.0, 1.0)
           |    + 0.35*((length(t2)-length(regexp_replace(t2,'[A-Za-z]','','g')))::DOUBLE/n)
           |    + 0.25*(1.0 - least(((length(t2)-length(regexp_replace(t2,'[.,;:!?]','','g')))::DOUBLE/n)*10.0, 1.0))
           |    + 0.15*least((len(list_filter(toks, x -> list_contains(['the','and','of','to','in','is','a','that'], x)))::DOUBLE
           |        / greatest(len(toks),1)::DOUBLE)*4.0, 1.0) AS VARCHAR)::DECIMAL(25,20), 4)::DOUBLE AS quality
           |  FROM q)
           |SELECT doc_id, quality,
           |  (CASE WHEN length(regexp_replace(t2,'^\\s+|\\s+$$','','g'))=0 THEN 0
           |    ELSE len(string_split_regex(regexp_replace(t2,'^\\s+|\\s+$$','','g'),'\\s+')) END)::BIGINT AS ws_tokens
           |FROM sc WHERE quality >= 0.3""".stripMargin,

      // PageRank replay: 3 unrolled iterations of the exact int64 update
      // share = r // deg; r' = 150000 + (850000·Σshare) // 10⁶
      "pagerank" ->
        """WITH e AS (SELECT DISTINCT l_orderkey%500 AS src, l_partkey%500 AS dst
          |  FROM lineitem),
          |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
          |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
          |r0 AS (SELECT node, 1000000::BIGINT AS r FROM nodes),
          |c1 AS (SELECT e.dst AS node, sum(r0.r // d.deg) AS inflow
          |  FROM e JOIN deg d USING (src) JOIN r0 ON r0.node = e.src GROUP BY 1),
          |r1 AS (SELECT n.node, (150000 + (850000 * coalesce(c1.inflow, 0)) // 1000000)::BIGINT AS r
          |  FROM nodes n LEFT JOIN c1 USING (node)),
          |c2 AS (SELECT e.dst AS node, sum(r1.r // d.deg) AS inflow
          |  FROM e JOIN deg d USING (src) JOIN r1 ON r1.node = e.src GROUP BY 1),
          |r2 AS (SELECT n.node, (150000 + (850000 * coalesce(c2.inflow, 0)) // 1000000)::BIGINT AS r
          |  FROM nodes n LEFT JOIN c2 USING (node)),
          |c3 AS (SELECT e.dst AS node, sum(r2.r // d.deg) AS inflow
          |  FROM e JOIN deg d USING (src) JOIN r2 ON r2.node = e.src GROUP BY 1),
          |r3 AS (SELECT n.node, (150000 + (850000 * coalesce(c3.inflow, 0)) // 1000000)::BIGINT AS r
          |  FROM nodes n LEFT JOIN c3 USING (node))
          |SELECT node, r AS rank_micro FROM r3""".stripMargin,

      "profile_stats" ->
        """WITH st AS (
          |  SELECT 'l_orderkey' AS col_name, l_orderkey::VARCHAR AS v FROM lineitem
          |  UNION ALL SELECT 'l_linenumber', l_linenumber::VARCHAR FROM lineitem
          |  UNION ALL SELECT 'l_returnflag', l_returnflag FROM lineitem
          |  UNION ALL SELECT 'l_linestatus', l_linestatus FROM lineitem
          |  UNION ALL SELECT 'rf_nullable', NULLIF(l_returnflag, 'A') FROM lineitem)
          |SELECT col_name, count(*) AS n_rows,
          |  sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
          |  count(DISTINCT v)::BIGINT AS n_distinct,
          |  min(v) AS min_str, max(v) AS max_str
          |FROM st GROUP BY 1""".stripMargin,

      "crawl_schedule" ->
        """WITH u AS (SELECT 'h'||(l_orderkey%37) AS host,
          |  'https://h'||(l_orderkey%37)||'.example.com/p/'||l_orderkey||'-'||l_linenumber AS url,
          |  l_partkey AS priority FROM lineitem)
          |SELECT host, url, priority,
          |  row_number() OVER (PARTITION BY host ORDER BY priority, url) AS wave
          |FROM u""".stripMargin,

      // label propagation replay: 3 unrolled synchronous rounds — per round
      // join labels to the symmetrized edges, count per (node, label),
      // arg-max with smallest-label ties, isolated nodes keep their own id
      "label_prop" ->
        """WITH e AS (SELECT l_orderkey%400 AS src, l_partkey%400 AS dst FROM lineitem),
          |sym AS (SELECT DISTINCT src, dst FROM (
          |  SELECT src, dst FROM e WHERE src<>dst
          |  UNION ALL SELECT dst, src FROM e WHERE src<>dst)),
          |nodes AS (SELECT DISTINCT node FROM (
          |  SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
          |l0 AS (SELECT node, node AS label FROM nodes),
          |c1 AS (SELECT s.src AS node, l.label, count(*) AS n
          |  FROM sym s JOIN l0 l ON s.dst = l.node GROUP BY 1, 2),
          |w1 AS (SELECT node, label FROM (SELECT node, label,
          |    row_number() OVER (PARTITION BY node ORDER BY n DESC, label) AS rn FROM c1)
          |  WHERE rn = 1),
          |l1 AS (SELECT n.node, coalesce(w.label, n.node) AS label
          |  FROM nodes n LEFT JOIN w1 w USING (node)),
          |c2 AS (SELECT s.src AS node, l.label, count(*) AS n
          |  FROM sym s JOIN l1 l ON s.dst = l.node GROUP BY 1, 2),
          |w2 AS (SELECT node, label FROM (SELECT node, label,
          |    row_number() OVER (PARTITION BY node ORDER BY n DESC, label) AS rn FROM c2)
          |  WHERE rn = 1),
          |l2 AS (SELECT n.node, coalesce(w.label, n.node) AS label
          |  FROM nodes n LEFT JOIN w2 w USING (node)),
          |c3 AS (SELECT s.src AS node, l.label, count(*) AS n
          |  FROM sym s JOIN l2 l ON s.dst = l.node GROUP BY 1, 2),
          |w3 AS (SELECT node, label FROM (SELECT node, label,
          |    row_number() OVER (PARTITION BY node ORDER BY n DESC, label) AS rn FROM c3)
          |  WHERE rn = 1),
          |l3 AS (SELECT n.node, coalesce(w.label, n.node) AS label
          |  FROM nodes n LEFT JOIN w3 w USING (node))
          |SELECT node, label FROM l3""".stripMargin,

      // pointer-jump replay: the same three f ← f∘f rounds, then
      // converged ⇔ the target has no outgoing edge in the base map
      "redirect_resolve" ->
        """WITH e AS MATERIALIZED (
          |  SELECT 'u'||doc_id::VARCHAR AS src,
          |         'u'||(doc_id-1)::VARCHAR AS dst
          |  FROM documents WHERE doc_id%8<>0
          |  UNION ALL SELECT 'c1','c2' UNION ALL SELECT 'c2','c1'),
          |f1 AS MATERIALIZED (SELECT a.src, coalesce(b.dst, a.dst) AS dst
          |  FROM e a LEFT JOIN e b ON a.dst = b.src),
          |f2 AS MATERIALIZED (SELECT a.src, coalesce(b.dst, a.dst) AS dst
          |  FROM f1 a LEFT JOIN f1 b ON a.dst = b.src),
          |f3 AS MATERIALIZED (SELECT a.src, coalesce(b.dst, a.dst) AS dst
          |  FROM f2 a LEFT JOIN f2 b ON a.dst = b.src)
          |SELECT f3.src, f3.dst AS target,
          |  (f3.dst NOT IN (SELECT src FROM e)) AS converged
          |FROM f3""".stripMargin,

      // k-core replay: 4 unrolled peel rounds over the symmetrized
      // squaring-map graph — keep a node iff its CURRENT degree >= 2, keep
      // an edge iff both endpoints survive, then report final degrees
      "kcore" ->
        """WITH e AS (SELECT DISTINCT l_orderkey%97 AS src,
          |    ((l_orderkey%97)*(l_orderkey%97))%97 AS dst FROM lineitem),
          |g0 AS (SELECT DISTINCT src, dst FROM (
          |  SELECT src, dst FROM e WHERE src<>dst
          |  UNION ALL SELECT dst, src FROM e WHERE src<>dst)),
          |k1 AS (SELECT src FROM g0 GROUP BY src HAVING count(*) >= 2),
          |g1 AS (SELECT g.src, g.dst FROM g0 g
          |  JOIN k1 a ON g.src = a.src JOIN k1 b ON g.dst = b.src),
          |k2 AS (SELECT src FROM g1 GROUP BY src HAVING count(*) >= 2),
          |g2 AS (SELECT g.src, g.dst FROM g1 g
          |  JOIN k2 a ON g.src = a.src JOIN k2 b ON g.dst = b.src),
          |k3 AS (SELECT src FROM g2 GROUP BY src HAVING count(*) >= 2),
          |g3 AS (SELECT g.src, g.dst FROM g2 g
          |  JOIN k3 a ON g.src = a.src JOIN k3 b ON g.dst = b.src),
          |k4 AS (SELECT src FROM g3 GROUP BY src HAVING count(*) >= 2),
          |g4 AS (SELECT g.src, g.dst FROM g3 g
          |  JOIN k4 a ON g.src = a.src JOIN k4 b ON g.dst = b.src)
          |SELECT src AS node, count(*) AS deg FROM g4 GROUP BY 1""".stripMargin,

      // dangling replay: per iteration ds = (Σ rank over out-degree-0
      // nodes) // N, added to every node's inflow before damping
      "pagerank_dangling" ->
        """WITH e AS (SELECT DISTINCT l_orderkey%500 AS src, l_partkey%700 AS dst
          |  FROM lineitem),
          |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
          |nn AS (SELECT count(*) AS n FROM nodes),
          |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
          |r0 AS (SELECT node, 1000000::BIGINT AS r FROM nodes),
          |d1 AS (SELECT coalesce(sum(r), 0) // (SELECT n FROM nn) AS ds FROM r0
          |  WHERE node NOT IN (SELECT src FROM e)),
          |c1 AS (SELECT e.dst AS node, sum(r0.r // d.deg) AS inflow
          |  FROM e JOIN deg d USING (src) JOIN r0 ON r0.node = e.src GROUP BY 1),
          |r1 AS (SELECT n.node, (150000 + (850000 * (coalesce(c1.inflow, 0) + (SELECT ds FROM d1))) // 1000000)::BIGINT AS r
          |  FROM nodes n LEFT JOIN c1 USING (node)),
          |d2 AS (SELECT coalesce(sum(r), 0) // (SELECT n FROM nn) AS ds FROM r1
          |  WHERE node NOT IN (SELECT src FROM e)),
          |c2 AS (SELECT e.dst AS node, sum(r1.r // d.deg) AS inflow
          |  FROM e JOIN deg d USING (src) JOIN r1 ON r1.node = e.src GROUP BY 1),
          |r2 AS (SELECT n.node, (150000 + (850000 * (coalesce(c2.inflow, 0) + (SELECT ds FROM d2))) // 1000000)::BIGINT AS r
          |  FROM nodes n LEFT JOIN c2 USING (node)),
          |d3 AS (SELECT coalesce(sum(r), 0) // (SELECT n FROM nn) AS ds FROM r2
          |  WHERE node NOT IN (SELECT src FROM e)),
          |c3 AS (SELECT e.dst AS node, sum(r2.r // d.deg) AS inflow
          |  FROM e JOIN deg d USING (src) JOIN r2 ON r2.node = e.src GROUP BY 1),
          |r3 AS (SELECT n.node, (150000 + (850000 * (coalesce(c3.inflow, 0) + (SELECT ds FROM d3))) // 1000000)::BIGINT AS r
          |  FROM nodes n LEFT JOIN c3 USING (node))
          |SELECT node, r AS rank_micro FROM r3""".stripMargin,

      // HITS replay: 2 unrolled (auth, hub) rounds, L1 micro normalization
      // via scalar-subquery totals, all integer floor division
      "hits_scores" ->
        """WITH e AS (SELECT DISTINCT l_orderkey%500 AS src, l_partkey%700 AS dst
          |  FROM lineitem),
          |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
          |h0 AS (SELECT node, 1::BIGINT AS hub FROM nodes),
          |a1r AS (SELECT e.dst AS node, sum(h0.hub) AS raw FROM e JOIN h0 ON h0.node = e.src GROUP BY 1),
          |a1t AS (SELECT greatest(coalesce(sum(raw), 1), 1) AS total FROM a1r),
          |a1 AS (SELECT n.node, (coalesce(raw, 0) * 1000000) // (SELECT total FROM a1t) AS auth
          |  FROM nodes n LEFT JOIN a1r USING (node)),
          |h1r AS (SELECT e.src AS node, sum(a1.auth) AS raw FROM e JOIN a1 ON a1.node = e.dst GROUP BY 1),
          |h1t AS (SELECT greatest(coalesce(sum(raw), 1), 1) AS total FROM h1r),
          |h1 AS (SELECT n.node, (coalesce(raw, 0) * 1000000) // (SELECT total FROM h1t) AS hub
          |  FROM nodes n LEFT JOIN h1r USING (node)),
          |a2r AS (SELECT e.dst AS node, sum(h1.hub) AS raw FROM e JOIN h1 ON h1.node = e.src GROUP BY 1),
          |a2t AS (SELECT greatest(coalesce(sum(raw), 1), 1) AS total FROM a2r),
          |a2 AS (SELECT n.node, (coalesce(raw, 0) * 1000000) // (SELECT total FROM a2t) AS auth
          |  FROM nodes n LEFT JOIN a2r USING (node)),
          |h2r AS (SELECT e.src AS node, sum(a2.auth) AS raw FROM e JOIN a2 ON a2.node = e.dst GROUP BY 1),
          |h2t AS (SELECT greatest(coalesce(sum(raw), 1), 1) AS total FROM h2r),
          |h2 AS (SELECT n.node, (coalesce(raw, 0) * 1000000) // (SELECT total FROM h2t) AS hub
          |  FROM nodes n LEFT JOIN h2r USING (node))
          |SELECT h2.node, h2.hub::BIGINT AS hub_micro, a2.auth::BIGINT AS auth_micro
          |FROM h2 JOIN a2 USING (node)""".stripMargin,

      "para_dedup" ->
        s"""WITH t AS (SELECT doc_id, substr(text,1,50) AS a, substr(text,51,50) AS b FROM documents),
           |d2 AS (SELECT doc_id,
           |  a||chr(10)||chr(10)||b||chr(10)||chr(10)||a||chr(10)||chr(10)||'  '||chr(10)||chr(10)||b||
           |  (CASE WHEN doc_id%3=0 THEN chr(10)||chr(10)||'tail '||doc_id::VARCHAR ELSE '' END) AS t2
           |  FROM t),
           |p AS (SELECT doc_id, list_filter(list_transform(
           |    string_split_regex(t2, '\\n\\s*\\n'),
           |    x -> regexp_replace(x, '^\\s+|\\s+$$', '', 'g')), x -> x <> '') AS paras FROM d2),
           |k AS (SELECT doc_id, paras,
           |  list_filter(paras, (x, i) -> list_position(paras, x) = i) AS kept FROM p)
           |SELECT doc_id, array_to_string(kept, chr(10)||chr(10)) AS clean_text,
           |  len(paras)::BIGINT AS n_paras,
           |  (len(paras) - len(kept))::BIGINT AS n_removed
           |FROM k""".stripMargin,

      // robots verdicts re-rendered from the (host, path) axes: host 3 =
      // all-disallow via the multi-agent run, host 1 = exact-agent group
      // replaces star, even hosts carry the extra /q disallow
      "robots_eval" ->
        s"""SELECT doc_id,
           |  'http://h'||(doc_id%4)::VARCHAR||'.com'||
           |  (CASE doc_id%5 WHEN 0 THEN '/p/doc' WHEN 1 THEN '/p/ok/x'
           |    WHEN 2 THEN '/q/z' WHEN 3 THEN '/open' ELSE '' END) AS url,
           |  CASE WHEN doc_id%4=3 THEN false
           |       WHEN doc_id%4=1 THEN doc_id%5 <> 1
           |       ELSE doc_id%5 NOT IN (0, 2) END AS allowed,
           |  CASE WHEN doc_id%4=3 THEN 'disallow:/'
           |       WHEN doc_id%4=1 THEN (CASE doc_id%5 WHEN 0 THEN 'allow:/p'
           |         WHEN 1 THEN 'disallow:/p/ok' ELSE '' END)
           |       ELSE (CASE doc_id%5 WHEN 0 THEN 'disallow:/p'
           |         WHEN 1 THEN 'allow:/p/ok' WHEN 2 THEN 'disallow:/q'
           |         ELSE '' END) END AS rule
           |FROM documents""".stripMargin,

      // composed re-render: heal = constant suffix (corpus is ASCII), para
      // dedup removes the one injected duplicate, C4 keeps 3 lines; only
      // the sentence count depends on corpus bytes and is replayed from
      // the same substring
      "web_curation_e2e" ->
        s"""WITH b AS (SELECT doc_id, substr(text,1,40) AS a FROM documents),
           |r AS (SELECT doc_id,
           |  'Intro words '||a||' café — “naÃ¯ve… 90°.' AS p1,
           |  len(regexp_extract_all(a, '[.!?]')) AS am FROM b)
           |SELECT doc_id,
           |  1::BIGINT AS n_removed,
           |  p1||chr(10)||'Second real line stays here! And more. Yes. Sure. Fine.'||chr(10)||
           |    (CASE WHEN doc_id%3=0 THEN 'A lorem ipsum veto here.'
           |          ELSE 'Closing line ends well.' END) AS c4_text,
           |  3::BIGINT AS n_lines_kept,
           |  (7 + am)::BIGINT AS n_sentences,
           |  doc_id%3<>0 AS kept
           |FROM r""".stripMargin,

      "dehyphenate" ->
        s"""SELECT doc_id, substr(text,1,40)||' example document frag-'||chr(10)||
           |  'Ment 5-'||chr(10)||'year end' AS fixed
           |FROM documents""".stripMargin,

      "script_mix" ->
        s"""WITH t AS (SELECT doc_id, substr(text,1,6)||
           |  (CASE doc_id%4 WHEN 0 THEN ' Привет мир'
           |    WHEN 1 THEN ' 中文字词语句子'
           |    WHEN 2 THEN ' καλημέρα σας' ELSE '' END) AS t2 FROM documents),
           |c AS (SELECT doc_id,
           |  (length(t2) - length(regexp_replace(t2, '[A-Za-z]', '', 'g')))::BIGINT AS n_latin,
           |  (length(t2) - length(regexp_replace(t2, '[0-9]', '', 'g')))::BIGINT AS n_digit,
           |  (length(t2) - length(regexp_replace(t2, '[\\x{0400}-\\x{04FF}]', '', 'g')))::BIGINT AS n_cyrillic,
           |  (length(t2) - length(regexp_replace(t2, '[\\x{0370}-\\x{03FF}]', '', 'g')))::BIGINT AS n_greek,
           |  (length(t2) - length(regexp_replace(t2, '[\\x{0600}-\\x{06FF}]', '', 'g')))::BIGINT AS n_arabic,
           |  (length(t2) - length(regexp_replace(t2, '[\\x{4E00}-\\x{9FFF}]', '', 'g')))::BIGINT AS n_cjk,
           |  (length(t2) - length(regexp_replace(t2, '[\\x{AC00}-\\x{D7AF}]', '', 'g')))::BIGINT AS n_hangul,
           |  (length(t2) - length(regexp_replace(t2, '[\\x{3040}-\\x{30FF}]', '', 'g')))::BIGINT AS n_kana
           |  FROM t),
           |m AS (SELECT *, greatest(n_latin, n_digit, n_cyrillic, n_greek,
           |  n_arabic, n_cjk, n_hangul, n_kana) AS mx FROM c)
           |SELECT doc_id, n_latin, n_digit, n_cyrillic, n_greek, n_arabic,
           |  n_cjk, n_hangul, n_kana,
           |  CASE WHEN mx = 0 THEN 'none'
           |    WHEN n_latin = mx THEN 'latin' WHEN n_digit = mx THEN 'digit'
           |    WHEN n_cyrillic = mx THEN 'cyrillic' WHEN n_greek = mx THEN 'greek'
           |    WHEN n_arabic = mx THEN 'arabic' WHEN n_cjk = mx THEN 'cjk'
           |    WHEN n_hangul = mx THEN 'hangul' ELSE 'kana' END AS dominant
           |FROM m""".stripMargin,

      "sentence_span_dedup" ->
        s"""WITH d2 AS (SELECT doc_id,
           |  (CASE WHEN doc_id%4=0 THEN 'Shared alpha one. Shared beta two. Shared gamma three. ' ELSE '' END)||text AS t2
           |  FROM documents),
           |sen AS (SELECT doc_id, list_filter(list_transform(
           |  regexp_extract_all(t2, '[^.!?]+[.!?]+|[^.!?]+$$'),
           |  x -> regexp_replace(x, '^\\s+|\\s+$$', '', 'g')), x -> x <> '') AS s FROM d2),
           |sp AS (SELECT doc_id, i AS span_idx,
           |  ('0x'||substr(md5(lower(s[i+1]||' '||s[i+2]||' '||s[i+3])),1,15))::BIGINT AS span_key
           |  FROM sen, unnest(range(len(s)-2)) AS u(i) WHERE len(s) >= 3)
           |SELECT doc_id, span_idx, span_key FROM sp
           |QUALIFY count(*) OVER (PARTITION BY span_key) > 1
           |  AND row_number() OVER (PARTITION BY span_key ORDER BY doc_id, span_idx) > 1""".stripMargin,

      "publish_date" ->
        s"""WITH m AS (SELECT doc_id,
           |  lpad((doc_id%12+1)::VARCHAR, 2, '0') AS mm,
           |  lpad((doc_id%28+1)::VARCHAR, 2, '0') AS dd FROM documents)
           |SELECT doc_id,
           |  CASE doc_id%5
           |    WHEN 0 THEN '2026-'||mm||'-'||dd
           |    WHEN 1 THEN '2025-'||mm||'-'||dd
           |    WHEN 2 THEN '2024-'||mm||'-'||dd
           |    WHEN 3 THEN '2023-'||mm||'-'||dd
           |    ELSE (CASE WHEN doc_id%2=0 THEN '2022-'||mm||'-01' ELSE '' END)
           |  END AS pub_date
           |FROM m""".stripMargin,

      "soft404_flags" ->
        s"""WITH t AS (SELECT doc_id,
           |  CASE WHEN doc_id%5=0 THEN '404 Not Found'
           |       WHEN doc_id%5=1 THEN 'Oops - page NOT FOUND'
           |       ELSE 'Doc overview page' END AS title,
           |  CASE WHEN doc_id%3=0 THEN 'The page does not exist. Please try again.'
           |       WHEN doc_id%3=1 THEN 'This item has been removed.'
           |       ELSE substr(text,1,60)||'.' END AS body FROM documents)
           |SELECT doc_id, title,
           |  (regexp_matches(title, '(?i)404|page not found|not available|access denied|server error')
           |   OR ((CASE WHEN contains(lower(body), 'page not found') THEN 1 ELSE 0 END)
           |     + (CASE WHEN contains(lower(body), 'does not exist') THEN 1 ELSE 0 END)
           |     + (CASE WHEN contains(lower(body), 'has been removed') THEN 1 ELSE 0 END)
           |     + (CASE WHEN contains(lower(body), 'try again') THEN 1 ELSE 0 END)
           |     + (CASE WHEN contains(lower(body), 'go back to the homepage') THEN 1 ELSE 0 END)
           |     + (CASE WHEN contains(lower(body), 'error occurred') THEN 1 ELSE 0 END)) >= 2) AS soft404
           |FROM t""".stripMargin,

      "sitemap_urls" ->
        s"""SELECT doc_id,
           |  'http://s'||(doc_id%7)::VARCHAR||'.com/p/'||doc_id::VARCHAR AS url,
           |  '2026-0'||(doc_id%9+1)::VARCHAR||'-01' AS lastmod FROM documents
           |UNION ALL
           |SELECT doc_id, 'https://s'||(doc_id%7)::VARCHAR||'.com/q/'||doc_id::VARCHAR, ''
           |FROM documents
           |UNION ALL
           |SELECT doc_id, 'https://other.org/'||doc_id::VARCHAR, '2026-12-31'
           |FROM documents WHERE doc_id%2=0""".stripMargin,

      "winnow_fps" ->
        s"""WITH t AS (SELECT doc_id, ${toks.format("text")} AS toks FROM documents),
           |g AS (SELECT doc_id, list_transform(range(len(toks)-2),
           |  i -> ('0x'||substr(md5(toks[i+1]||' '||toks[i+2]||' '||toks[i+3]),1,15))::BIGINT) AS hs
           |  FROM t WHERE len(toks) >= 3)
           |SELECT DISTINCT doc_id, list_min(hs[i+1:i+4]) AS fp
           |FROM g, unnest(range(len(hs)-3)) AS u(i)
           |WHERE len(hs) >= 4""".stripMargin,

      "winnow_overlap" ->
        s"""WITH t AS (SELECT doc_id,
           |  'g'||(doc_id%50)::VARCHAR||' alpha g'||(doc_id%50)::VARCHAR||
           |  ' beta g'||(doc_id%50)::VARCHAR||' gamma g'||(doc_id%50)::VARCHAR||
           |  ' delta g'||(doc_id%50)::VARCHAR||' epsilon g'||(doc_id%50)::VARCHAR||
           |  ' zeta '||substr(text,1,100) AS t2 FROM documents),
           |tk AS (SELECT doc_id, ${toks.format("t2")} AS toks FROM t),
           |g AS (SELECT doc_id, list_transform(range(len(toks)-2),
           |  i -> ('0x'||substr(md5(toks[i+1]||' '||toks[i+2]||' '||toks[i+3]),1,15))::BIGINT) AS hs
           |  FROM tk WHERE len(toks) >= 3),
           |f AS (SELECT DISTINCT doc_id, list_min(hs[i+1:i+4]) AS fp
           |  FROM g, unnest(range(len(hs)-3)) AS u(i) WHERE len(hs) >= 4),
           |hot AS (SELECT fp FROM f GROUP BY fp HAVING count(*) > 120),
           |f2 AS (SELECT * FROM f WHERE fp NOT IN (SELECT fp FROM hot))
           |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS n_shared
           |FROM f2 a JOIN f2 b ON a.fp = b.fp AND a.doc_id < b.doc_id
           |GROUP BY 1, 2""".stripMargin,

      "crawl_diff" ->
        s"""WITH o AS (SELECT 'u'||doc_id::VARCHAR AS url,
           |  ('0x'||substr(md5(regexp_replace(trim(lower(text)),'\\s+',' ','g')),1,15))::BIGINT AS fp
           |  FROM documents),
           |n AS (SELECT 'u'||doc_id::VARCHAR AS url,
           |  ('0x'||substr(md5(regexp_replace(trim(lower(
           |    CASE WHEN doc_id%7=0 THEN text||' updated' ELSE text END)),'\\s+',' ','g')),1,15))::BIGINT AS fp
           |  FROM documents WHERE doc_id%11<>0
           |  UNION ALL
           |  SELECT 'new'||doc_id::VARCHAR,
           |  ('0x'||substr(md5(regexp_replace(trim(lower(text||' fresh')),'\\s+',' ','g')),1,15))::BIGINT
           |  FROM documents WHERE doc_id%13=0)
           |SELECT coalesce(o.url, n.url) AS url,
           |  CASE WHEN o.url IS NULL THEN 'added' WHEN n.url IS NULL THEN 'removed'
           |       WHEN o.fp = n.fp THEN 'unchanged' ELSE 'changed' END AS status,
           |  o.fp AS old_fp, n.fp AS new_fp
           |FROM o FULL OUTER JOIN n ON o.url = n.url""".stripMargin,

      // PQ replay: md5-seeded subspace codebooks → micro-unit argmin
      // assignment → 6dp means → encode → per-query distance tables →
      // exact int64 ADC sums → per-query top-k
      "pq_topk" ->
        """WITH e AS (SELECT vec_id, embedding FROM embeddings),
          |sv AS (SELECT vec_id, s, embedding[s*16+1 : s*16+16] AS v
          |  FROM e, unnest([0,1,2,3]) AS t(s)),
          |seeds AS (SELECT s, cell, v FROM (
          |  SELECT s, row_number() OVER (PARTITION BY s
          |    ORDER BY md5(vec_id::VARCHAR), vec_id) - 1 AS cell, v FROM sv)
          |  WHERE cell < 8),
          |a0 AS (SELECT sv.vec_id, sv.s, sv.v, seeds.cell,
          |  round(list_sum(list_transform(list_zip(sv.v, seeds.v),
          |    x -> (x[1]::DOUBLE - x[2]::DOUBLE)*(x[1]::DOUBLE - x[2]::DOUBLE)))*1e6)::BIGINT AS dm
          |  FROM sv JOIN seeds ON sv.s = seeds.s),
          |asg AS (SELECT vec_id, s, v, cell FROM a0
          |  QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY dm, cell) = 1),
          |cm AS (SELECT s, cell, unnest(range(len(v))) AS pos,
          |  unnest(list_transform(v, x -> x::DOUBLE)) AS x FROM asg),
          |cents AS (SELECT s, cell, list(mn ORDER BY pos) AS c FROM (
          |  SELECT s, cell, pos, round(avg(x), 6) AS mn FROM cm GROUP BY 1, 2, 3)
          |  GROUP BY 1, 2),
          |enc AS (SELECT vec_id, s, cell AS code FROM (
          |  SELECT sv.vec_id, sv.s, cents.cell,
          |    round(list_sum(list_transform(list_zip(sv.v, cents.c),
          |      x -> (x[1]::DOUBLE - x[2]::DOUBLE)*(x[1]::DOUBLE - x[2]::DOUBLE)))*1e6)::BIGINT AS dm
          |  FROM sv JOIN cents ON sv.s = cents.s)
          |  QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY dm, cell) = 1),
          |dtab AS (SELECT q.vec_id AS query_id, cents.s, cents.cell AS code,
          |  round(list_sum(list_transform(list_zip(q.v, cents.c),
          |    x -> (x[1]::DOUBLE - x[2]::DOUBLE)*(x[1]::DOUBLE - x[2]::DOUBLE)))*1e6)::BIGINT AS dm
          |  FROM sv q JOIN cents ON q.s = cents.s WHERE q.vec_id < 5),
          |adc AS (SELECT d.query_id, enc.vec_id AS neighbor_id, sum(d.dm) AS adist
          |  FROM enc JOIN dtab d ON enc.s = d.s AND enc.code = d.code
          |  WHERE enc.vec_id <> d.query_id GROUP BY 1, 2)
          |SELECT query_id, neighbor_id, adist::BIGINT AS adist,
          |  row_number() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id)::BIGINT AS rank
          |FROM adc QUALIFY rank <= 10""".stripMargin,

      // IVF-PQ replay: the ivf_topk centroid cascade (train + assign +
      // probe) composed with the pq_topk codebook cascade run on RESIDUALS
      // (embedding − cell centroid, exact IEEE doubles), ADC tables keyed
      // per (query, probed cell) over the QUERY's residual
      "ivfpq_topk" ->
        """WITH e AS (SELECT vec_id, embedding FROM embeddings),
          |seeds AS (
          |  SELECT row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) - 1 AS cell,
          |         embedding AS c
          |  FROM e
          |  QUALIFY row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) <= 8),
          |a0 AS (
          |  SELECT e.vec_id, e.embedding, s.cell,
          |    round(list_sum(list_transform(list_zip(e.embedding, s.c), x -> x[1]::DOUBLE * x[2]::DOUBLE))
          |      / (sqrt(list_sum(list_transform(list_zip(e.embedding, e.embedding), x -> x[1]::DOUBLE * x[2]::DOUBLE)))
          |       * sqrt(list_sum(list_transform(list_zip(s.c, s.c), x -> x[1]::DOUBLE * x[2]::DOUBLE)))), 6) AS cs
          |  FROM e CROSS JOIN seeds s),
          |asg AS (
          |  SELECT vec_id, embedding, cell FROM a0
          |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell) = 1),
          |cm AS (
          |  SELECT cell, unnest(range(len(embedding))) AS pos,
          |         unnest(list_transform(embedding, x -> x::DOUBLE)) AS x
          |  FROM asg),
          |cents AS (
          |  SELECT cell, list(m ORDER BY pos) AS c FROM (
          |    SELECT cell, pos, round(avg(x), 6) AS m FROM cm GROUP BY 1, 2)
          |  GROUP BY cell),
          |casg AS (
          |  SELECT vec_id, embedding, cell FROM (
          |    SELECT e.vec_id, e.embedding, c.cell,
          |      round(list_sum(list_transform(list_zip(e.embedding, c.c), x -> x[1]::DOUBLE * x[2]::DOUBLE))
          |        / (sqrt(list_sum(list_transform(list_zip(e.embedding, e.embedding), x -> x[1]::DOUBLE * x[2]::DOUBLE)))
          |         * sqrt(list_sum(list_transform(list_zip(c.c, c.c), x -> x[1]::DOUBLE * x[2]::DOUBLE)))), 6) AS cs
          |    FROM e CROSS JOIN cents c)
          |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell) = 1),
          |resid AS (
          |  SELECT ca.vec_id, ca.cell,
          |    list_transform(list_zip(ca.embedding, c.c), x -> x[1]::DOUBLE - x[2]::DOUBLE) AS r
          |  FROM casg ca JOIN cents c USING (cell)),
          |sv AS (SELECT vec_id, cell, s, r[s*16+1 : s*16+16] AS v
          |  FROM resid, unnest([0,1,2,3]) AS t(s)),
          |pseeds AS (SELECT s, pcode, v FROM (
          |  SELECT s, row_number() OVER (PARTITION BY s
          |    ORDER BY md5(vec_id::VARCHAR), vec_id) - 1 AS pcode, v FROM sv)
          |  WHERE pcode < 8),
          |pa0 AS (SELECT sv.vec_id, sv.s, sv.v, pseeds.pcode,
          |  round(list_sum(list_transform(list_zip(sv.v, pseeds.v),
          |    x -> (x[1]::DOUBLE - x[2]::DOUBLE)*(x[1]::DOUBLE - x[2]::DOUBLE)))*1e6)::BIGINT AS dm
          |  FROM sv JOIN pseeds ON sv.s = pseeds.s),
          |pasg AS (SELECT vec_id, s, v, pcode FROM pa0
          |  QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY dm, pcode) = 1),
          |pcm AS (SELECT s, pcode, unnest(range(len(v))) AS pos,
          |  unnest(list_transform(v, x -> x::DOUBLE)) AS x FROM pasg),
          |pcents AS (SELECT s, pcode, list(mn ORDER BY pos) AS c FROM (
          |  SELECT s, pcode, pos, round(avg(x), 6) AS mn FROM pcm GROUP BY 1, 2, 3)
          |  GROUP BY 1, 2),
          |enc AS (SELECT vec_id, cell, s, pcode AS code FROM (
          |  SELECT sv.vec_id, sv.cell, sv.s, pcents.pcode,
          |    round(list_sum(list_transform(list_zip(sv.v, pcents.c),
          |      x -> (x[1]::DOUBLE - x[2]::DOUBLE)*(x[1]::DOUBLE - x[2]::DOUBLE)))*1e6)::BIGINT AS dm
          |  FROM sv JOIN pcents ON sv.s = pcents.s)
          |  QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY dm, pcode) = 1),
          |probe AS (
          |  SELECT query_id, qe, cell FROM (
          |    SELECT q.vec_id AS query_id, q.embedding AS qe, c.cell,
          |      round(list_sum(list_transform(list_zip(q.embedding, c.c), x -> x[1]::DOUBLE * x[2]::DOUBLE))
          |        / (sqrt(list_sum(list_transform(list_zip(q.embedding, q.embedding), x -> x[1]::DOUBLE * x[2]::DOUBLE)))
          |         * sqrt(list_sum(list_transform(list_zip(c.c, c.c), x -> x[1]::DOUBLE * x[2]::DOUBLE)))), 6) AS cs
          |    FROM e q CROSS JOIN cents c WHERE q.vec_id < 5)
          |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, cell) <= 2),
          |qres AS (
          |  SELECT p.query_id, p.cell,
          |    list_transform(list_zip(p.qe, c.c), x -> x[1]::DOUBLE - x[2]::DOUBLE) AS qr
          |  FROM probe p JOIN cents c USING (cell)),
          |qsv AS (SELECT query_id, cell, s, qr[s*16+1 : s*16+16] AS v
          |  FROM qres, unnest([0,1,2,3]) AS t(s)),
          |dtab AS (SELECT qsv.query_id, qsv.cell, qsv.s, pcents.pcode AS code,
          |  round(list_sum(list_transform(list_zip(qsv.v, pcents.c),
          |    x -> (x[1]::DOUBLE - x[2]::DOUBLE)*(x[1]::DOUBLE - x[2]::DOUBLE)))*1e6)::BIGINT AS dm
          |  FROM qsv JOIN pcents ON qsv.s = pcents.s),
          |adc AS (SELECT d.query_id, enc.vec_id AS neighbor_id, sum(d.dm) AS adist
          |  FROM enc JOIN dtab d ON enc.cell = d.cell AND enc.s = d.s AND enc.code = d.code
          |  WHERE enc.vec_id <> d.query_id GROUP BY 1, 2)
          |SELECT query_id, neighbor_id, adist::BIGINT AS adist,
          |  row_number() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id)::BIGINT AS rank
          |FROM adc QUALIFY rank <= 10""".stripMargin,

      "selection_e2e" ->
        s"""WITH d AS (SELECT doc_id, $disclaimerCase AS page FROM documents),
           |tk AS (SELECT doc_id, ${toks.format("page")} AS l FROM d),
           |tok AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos FROM tk),
           |kg AS (SELECT doc_id, pos, ${hash60("array_to_string(l[pos+1:pos+8], ' ')")} AS kh
           |  FROM (SELECT doc_id, l, unnest(range(len(l)-7)) AS pos FROM tk WHERE len(l) >= 8)),
           |m AS (SELECT doc_id, pos,
           |  count(*) OVER (PARTITION BY kh) AS occ,
           |  row_number() OVER (PARTITION BY kh ORDER BY md5(doc_id::VARCHAR), doc_id, pos) AS rn
           |  FROM kg),
           |starts AS (SELECT doc_id, pos FROM m WHERE occ > 1 AND rn > 1),
           |cov AS (SELECT DISTINCT doc_id, pos + o AS pos FROM starts, unnest(range(8)) AS t(o)),
           |kept AS (SELECT t.doc_id, t.pos, t.tok, (c.pos IS NOT NULL) AS is_cov
           |  FROM tok t LEFT JOIN cov c ON t.doc_id=c.doc_id AND t.pos=c.pos),
           |agg AS (SELECT doc_id,
           |  coalesce(string_agg(CASE WHEN NOT is_cov THEN tok END, ' ' ORDER BY pos), '') AS clean_text
           |  FROM kept GROUP BY 1),
           |clean AS (SELECT d.doc_id, coalesce(agg.clean_text, '') AS clean_text
           |  FROM d LEFT JOIN agg USING (doc_id)),
           |tk2 AS (SELECT doc_id, ${toks.format("clean_text")} AS l FROM clean),
           |bg AS (SELECT doc_id, ${hash60("b")} % 256 AS bucket FROM
           |  (SELECT doc_id, unnest(list_transform(range(len(l)-1), i -> l[i+1]||' '||l[i+2])) AS b
           |   FROM tk2 WHERE len(l) >= 2)),
           |tt AS (SELECT count(*) AS n FROM bg WHERE doc_id % 11 = 0),
           |rt AS (SELECT count(*) AS n FROM bg),
           |tc AS (SELECT bucket, count(*) AS c FROM bg WHERE doc_id % 11 = 0 GROUP BY 1),
           |rc AS (SELECT bucket, count(*) AS c FROM bg GROUP BY 1),
           |w AS (SELECT rc.bucket,
           |  round((ln((coalesce(tc.c,0)+1)::DOUBLE / (tt.n+256)::DOUBLE)
           |       - ln((rc.c+1)::DOUBLE / (rt.n+256)::DOUBLE)) * 1e6)::BIGINT AS wm
           |  FROM rc LEFT JOIN tc USING (bucket), tt, rt),
           |per AS (SELECT bg.doc_id, count(*) AS nb, sum(w.wm) AS sm
           |  FROM bg JOIN w USING (bucket) GROUP BY 1),
           |scored AS (SELECT c.doc_id, coalesce(nb,0)::BIGINT AS n_bigrams,
           |  coalesce(sm,0)::BIGINT AS score_micro
           |  FROM clean c LEFT JOIN per USING (doc_id))
           |SELECT doc_id, n_bigrams, score_micro FROM scored
           |ORDER BY score_micro DESC, doc_id LIMIT 200""".stripMargin,

      // conditional-LM replay: joint (context, bigram) counts from the
      // lang='en' reference, add-one over the hashed event space, backoff
      // CASE mirrors coalesce(w_joint, w_ctx, ln B2) in micro-nats
      "lm_perplexity" ->
        s"""WITH t AS (SELECT doc_id, $docText AS t2 FROM documents),
           |ctk AS (SELECT doc_id, ${toks.format("t2")} AS l FROM t),
           |cbg AS (SELECT doc_id, ${hash60("l[i+1]")} % 1024 AS b1,
           |    ${hash60("l[i+1]||' '||l[i+2]")} % 8192 AS b12
           |  FROM (SELECT doc_id, l, unnest(range(len(l)-1)) AS i FROM ctk WHERE len(l) >= 2)),
           |rtk AS (SELECT ${toks.format("text")} AS l FROM documents WHERE lang = 'en'),
           |rbg AS (SELECT ${hash60("l[i+1]")} % 1024 AS b1,
           |    ${hash60("l[i+1]||' '||l[i+2]")} % 8192 AS b12
           |  FROM (SELECT l, unnest(range(len(l)-1)) AS i FROM rtk WHERE len(l) >= 2)),
           |c12 AS (SELECT b1, b12, count(*) AS c FROM rbg GROUP BY 1, 2),
           |c1 AS (SELECT b1, count(*) AS c FROM rbg GROUP BY 1),
           |ev AS (SELECT cbg.doc_id,
           |  CASE WHEN c12.c IS NOT NULL
           |         THEN round((ln((c1.c+8192)::DOUBLE) - ln((c12.c+1)::DOUBLE))*1e6)::BIGINT
           |       WHEN c1.c IS NOT NULL THEN round(ln((c1.c+8192)::DOUBLE)*1e6)::BIGINT
           |       ELSE round(ln(8192::DOUBLE)*1e6)::BIGINT END AS nll
           |  FROM cbg LEFT JOIN c12 USING (b1, b12) LEFT JOIN c1 USING (b1)),
           |per AS (SELECT doc_id, count(*) AS nb, sum(nll) AS sm FROM ev GROUP BY 1)
           |SELECT d.doc_id, coalesce(nb, 0)::BIGINT AS n_bigrams,
           |  coalesce(sm, 0)::BIGINT AS nll_micro
           |FROM documents d LEFT JOIN per USING (doc_id)""".stripMargin,

      // CCNet tercile replay: the lm_perplexity chain + integer mean +
      // per-language ntile(3) with doc_id tie-break
      "ccnet_buckets" ->
        s"""WITH t AS (SELECT doc_id, $docText AS t2 FROM documents),
           |ctk AS (SELECT doc_id, ${toks.format("t2")} AS l FROM t),
           |cbg AS (SELECT doc_id, ${hash60("l[i+1]")} % 1024 AS b1,
           |    ${hash60("l[i+1]||' '||l[i+2]")} % 8192 AS b12
           |  FROM (SELECT doc_id, l, unnest(range(len(l)-1)) AS i FROM ctk WHERE len(l) >= 2)),
           |rtk AS (SELECT ${toks.format("text")} AS l FROM documents WHERE lang = 'en'),
           |rbg AS (SELECT ${hash60("l[i+1]")} % 1024 AS b1,
           |    ${hash60("l[i+1]||' '||l[i+2]")} % 8192 AS b12
           |  FROM (SELECT l, unnest(range(len(l)-1)) AS i FROM rtk WHERE len(l) >= 2)),
           |c12 AS (SELECT b1, b12, count(*) AS c FROM rbg GROUP BY 1, 2),
           |c1 AS (SELECT b1, count(*) AS c FROM rbg GROUP BY 1),
           |ev AS (SELECT cbg.doc_id,
           |  CASE WHEN c12.c IS NOT NULL
           |         THEN round((ln((c1.c+8192)::DOUBLE) - ln((c12.c+1)::DOUBLE))*1e6)::BIGINT
           |       WHEN c1.c IS NOT NULL THEN round(ln((c1.c+8192)::DOUBLE)*1e6)::BIGINT
           |       ELSE round(ln(8192::DOUBLE)*1e6)::BIGINT END AS nll
           |  FROM cbg LEFT JOIN c12 USING (b1, b12) LEFT JOIN c1 USING (b1)),
           |per AS (SELECT doc_id, count(*) AS nb, sum(nll) AS sm FROM ev GROUP BY 1),
           |sc AS (SELECT d.doc_id, d.lang, coalesce(nb, 0)::BIGINT AS n_bigrams,
           |  coalesce(sm // nullif(nb, 0), 0)::BIGINT AS avg_nll_micro
           |  FROM documents d LEFT JOIN per USING (doc_id))
           |SELECT doc_id, lang, n_bigrams, avg_nll_micro,
           |  CASE ntile(3) OVER (PARTITION BY lang ORDER BY avg_nll_micro, doc_id)
           |    WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS ppl_bucket
           |FROM sc""".stripMargin,

      // WARC replay: re-render the expected record rows from the same doc
      // fields — request payload verbatim, response split at the HTTP
      // blank line, Content-Length measured on the full block
      "warc_parse" ->
        """WITH d AS (SELECT doc_id, source, text,
          |  chr(13)||chr(10) AS rn,
          |  'https://'||source||'.example.com/doc/'||doc_id AS uri,
          |  'GET /doc/'||doc_id||' HTTP/1.1' AS req,
          |  CASE WHEN doc_id%7=0 THEN 'not found' ELSE substr(text,1,120) END AS body,
          |  CASE WHEN doc_id%7=0 THEN '404 Not Found' ELSE '200 OK' END AS st
          |  FROM documents)
          |SELECT doc_id, 0 AS rec_idx, 'request' AS warc_type, uri AS target_uri,
          |  length(req)::BIGINT AS content_length, 0 AS http_status, req AS payload
          |FROM d
          |UNION ALL
          |SELECT doc_id, 1, 'response', uri,
          |  length('HTTP/1.1 '||st||rn||'Content-Type: text/html'||rn||rn||body)::BIGINT,
          |  CASE WHEN doc_id%7=0 THEN 404 ELSE 200 END, body
          |FROM d""".stripMargin,

      // unicode-fold replay: the SAME JVM-generated ligature chain +
      // translate table as literals — no engine-side Unicode call
      "unicode_fold" -> {
        def sq(s: String) = s.replace("'", "''")
        val folded = graft.text.TextAnalysis.FoldMulti.foldLeft("t2") {
          case (e, (bad, good)) => s"replace($e, '${sq(bad)}', '${sq(good)}')"
        }
        val fold = s"translate($folded, '${sq(graft.text.TextAnalysis.foldFrom)}'," +
          s" '${sq(graft.text.TextAnalysis.foldTo)}')"
        s"""WITH t AS (SELECT doc_id,
           |  (CASE doc_id%4 WHEN 0 THEN 'Æther Øre łódź '
           |    WHEN 1 THEN 'ＦＵＬＬｗｉｄｔｈ！ '
           |    WHEN 2 THEN 'Café naïve ß ' ELSE '' END)
           |  || replace(text, 'a', 'á') AS t2 FROM documents)
           |SELECT doc_id, $fold AS folded,
           |  length(t2)::BIGINT AS n_in, length($fold)::BIGINT AS n_out
           |FROM t""".stripMargin
      },

      // phrase-match replay: per-phrase non-overlapping replace-scan — for
      // phrases that cannot self-overlap this equals the automaton's
      // all-occurrence count
      "phrase_match" ->
        """WITH p(phrase) AS (VALUES ('table scan'), ('row filter'),
          |  ('value table'), ('spark')),
          |c AS (SELECT doc_id, phrase,
          |  ((length(text) - length(replace(text, phrase, ''))) // length(phrase))::BIGINT AS n_matches
          |  FROM documents, p)
          |SELECT doc_id, phrase, n_matches FROM c WHERE n_matches > 0""".stripMargin,

      // domain-KL replay: same hashed buckets, per-value micro-nat lns,
      // int64 weighted sum, one truncated division per domain
      "domain_kl" ->
        s"""WITH tk AS (SELECT source AS domain,
           |  unnest(${toks.format("text")}) AS w FROM documents),
           |tb AS (SELECT domain, ${hash60("w")} % 256 AS bucket FROM tk),
           |dc AS (SELECT domain, bucket, count(*) AS cs FROM tb GROUP BY 1, 2),
           |dn AS (SELECT domain, sum(cs) AS ns FROM dc GROUP BY 1),
           |cc AS (SELECT bucket, sum(cs) AS c FROM dc GROUP BY 1),
           |cn AS (SELECT sum(c) AS n FROM cc),
           |grid AS (SELECT dn.domain, dn.ns, g.range AS bucket FROM dn, range(256) g),
           |tv AS (SELECT grid.domain, grid.ns,
           |    (coalesce(dc.cs, 0) + 1) *
           |    ((round(ln((coalesce(dc.cs, 0) + 1)::DOUBLE)*1e6)::BIGINT
           |      - round(ln((grid.ns + 256)::DOUBLE)*1e6)::BIGINT)
           |   - (round(ln((coalesce(cc.c, 0) + 1)::DOUBLE)*1e6)::BIGINT
           |      - round(ln((cn.n + 256)::DOUBLE)*1e6)::BIGINT)) AS term
           |  FROM grid
           |  LEFT JOIN dc ON dc.domain = grid.domain AND dc.bucket = grid.bucket
           |  LEFT JOIN cc ON cc.bucket = grid.bucket, cn)
           |SELECT domain, max(ns)::BIGINT AS n_tokens,
           |  (sum(term) // (max(ns) + 256))::BIGINT AS kl_micro
           |FROM tv GROUP BY 1""".stripMargin,

      // keyword replay: tf/df aggs, smoothed micro-nat idf, windowed top-3
      "tfidf_keywords" ->
        s"""WITH tk AS (SELECT doc_id, unnest(${toks.format("text")}) AS term
           |  FROM documents),
           |tf AS (SELECT doc_id, term, count(*) AS tf FROM tk GROUP BY 1, 2),
           |dft AS (SELECT term, count(*) AS df_t FROM tf GROUP BY 1),
           |nn AS (SELECT count(*) AS n FROM documents),
           |sc AS (SELECT doc_id, term, tf, df_t,
           |    round(ln((n + 1)::DOUBLE / (df_t + 1)::DOUBLE)*1e6)::BIGINT AS idf_micro
           |  FROM tf JOIN dft USING (term), nn)
           |SELECT doc_id,
           |  row_number() OVER (PARTITION BY doc_id
           |    ORDER BY tf*idf_micro DESC, term) AS rnk,
           |  term, tf::BIGINT AS tf, df_t::BIGINT AS df_t,
           |  (tf*idf_micro)::BIGINT AS score_micro
           |FROM sc QUALIFY rnk <= 3""".stripMargin,

      // Kneser-Ney replay: the four count tables and the exact-rational
      // discount formula, all integer
      "kn_bigram_lm" ->
        s"""WITH tk AS (SELECT ${toks.format("text")} AS l FROM documents),
           |bg AS (SELECT l[i+1] AS w1, l[i+2] AS w2
           |  FROM (SELECT l, unnest(range(len(l)-1)) AS i FROM tk WHERE len(l) >= 2)),
           |bc AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
           |ctx AS (SELECT w1, sum(c12) AS c1, count(*) AS n1f FROM bc GROUP BY 1),
           |cont AS (SELECT w2, count(*) AS n1b FROM bc GROUP BY 1),
           |tt AS (SELECT count(*) AS t_types FROM bc)
           |SELECT bc.w1, bc.w2, bc.c12::BIGINT AS c12, ctx.c1::BIGINT AS c1,
           |  ctx.n1f::BIGINT AS n1f, cont.n1b::BIGINT AS n1b,
           |  tt.t_types::BIGINT AS t_types,
           |  ((greatest(4*bc.c12 - 3, 0) * tt.t_types + 3 * ctx.n1f * cont.n1b)
           |    * 1000000 // (4 * ctx.c1 * tt.t_types))::BIGINT AS pkn_micro
           |FROM bc JOIN ctx USING (w1) JOIN cont USING (w2), tt
           |ORDER BY bc.c12 DESC, bc.w1, bc.w2 LIMIT 100""".stripMargin,

      "dsir_score" ->
        s"""WITH tk AS (SELECT doc_id, ${toks.format("text")} AS l FROM documents),
           |bg AS (SELECT doc_id, ${hash60("b")} % 256 AS bucket FROM
           |  (SELECT doc_id, unnest(list_transform(range(len(l)-1), i -> l[i+1]||' '||l[i+2])) AS b
           |   FROM tk WHERE len(l) >= 2)),
           |tt AS (SELECT count(*) AS n FROM bg WHERE doc_id % 11 = 0),
           |rt AS (SELECT count(*) AS n FROM bg),
           |tc AS (SELECT bucket, count(*) AS c FROM bg WHERE doc_id % 11 = 0 GROUP BY 1),
           |rc AS (SELECT bucket, count(*) AS c FROM bg GROUP BY 1),
           |w AS (SELECT rc.bucket,
           |  round((ln((coalesce(tc.c,0)+1)::DOUBLE / (tt.n+256)::DOUBLE)
           |       - ln((rc.c+1)::DOUBLE / (rt.n+256)::DOUBLE)) * 1e6)::BIGINT AS wm
           |  FROM rc LEFT JOIN tc USING (bucket), tt, rt),
           |per AS (SELECT bg.doc_id, count(*) AS nb, sum(w.wm) AS sm
           |  FROM bg JOIN w USING (bucket) GROUP BY 1)
           |SELECT d.doc_id, coalesce(nb,0)::BIGINT AS n_bigrams,
           |  coalesce(sm,0)::BIGINT AS score_micro
           |FROM documents d LEFT JOIN per USING (doc_id)""".stripMargin,

      // int8 replay: micro-unit entry, integer max/rounding/dequant, md5
      // code digest
      "int8_quant" ->
        """WITH e AS (SELECT vec_id,
          |  list_transform(embedding, x -> round(x::DOUBLE * 1000000)::BIGINT) AS xm
          |  FROM embeddings),
          |a AS (SELECT vec_id, xm,
          |  coalesce(list_max(list_transform(xm, v -> abs(v))), 0) AS amax FROM e),
          |q AS (SELECT vec_id, xm, amax,
          |  list_transform(xm, v -> CASE WHEN amax = 0 THEN 0
          |    ELSE (v*254 + (CASE WHEN v < 0 THEN -1 WHEN v > 0 THEN 1 ELSE 0 END) * amax)
          |         // (2*amax) END) AS qq
          |  FROM a)
          |SELECT vec_id, len(xm)::BIGINT AS dim, amax::BIGINT AS amax_micro,
          |  md5(array_to_string(qq, ',')) AS q_digest,
          |  qq[1]::BIGINT AS q0, qq[2]::BIGINT AS q1,
          |  qq[3]::BIGINT AS q2, qq[4]::BIGINT AS q3,
          |  (CASE WHEN len(xm) = 0 THEN 0 ELSE
          |    list_sum(list_transform(range(len(xm)),
          |      i -> abs(xm[i+1] - (qq[i+1]*amax) // 127))) // len(xm) END)::BIGINT AS mae_micro
          |FROM q""".stripMargin,

      "semantic_dedup" ->
        """WITH e AS (SELECT vec_id, embedding FROM embeddings),
          |seeds AS (
          |  SELECT row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) - 1 AS cell,
          |         embedding AS c
          |  FROM e
          |  QUALIFY row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) <= 8),
          |a0 AS (
          |  SELECT e.vec_id, e.embedding, s.cell,
          |    round(list_sum(list_transform(list_zip(e.embedding, s.c), x -> x[1]::DOUBLE * x[2]::DOUBLE))
          |      / (sqrt(list_sum(list_transform(list_zip(e.embedding, e.embedding), x -> x[1]::DOUBLE * x[2]::DOUBLE)))
          |       * sqrt(list_sum(list_transform(list_zip(s.c, s.c), x -> x[1]::DOUBLE * x[2]::DOUBLE)))), 6) AS cs
          |  FROM e CROSS JOIN seeds s),
          |asg AS (
          |  SELECT vec_id, embedding, cell FROM a0
          |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell) = 1),
          |cm AS (
          |  SELECT cell, unnest(range(len(embedding))) AS pos,
          |         unnest(list_transform(embedding, x -> x::DOUBLE)) AS x
          |  FROM asg),
          |cents AS (
          |  SELECT cell, list(m ORDER BY pos) AS c FROM (
          |    SELECT cell, pos, round(avg(x), 6) AS m FROM cm GROUP BY 1, 2)
          |  GROUP BY cell),
          |keyed AS (
          |  SELECT vec_id, ce, cell, cs AS ccos FROM (
          |    SELECT e.vec_id, e.embedding AS ce, c.cell,
          |      round(list_sum(list_transform(list_zip(e.embedding, c.c), x -> x[1]::DOUBLE * x[2]::DOUBLE))
          |        / (sqrt(list_sum(list_transform(list_zip(e.embedding, e.embedding), x -> x[1]::DOUBLE * x[2]::DOUBLE)))
          |         * sqrt(list_sum(list_transform(list_zip(c.c, c.c), x -> x[1]::DOUBLE * x[2]::DOUBLE)))), 6) AS cs
          |    FROM e CROSS JOIN cents c)
          |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell) = 1),
          |closer AS (
          |  SELECT a.vec_id, count(*) AS n_closer
          |  FROM keyed a JOIN keyed b ON a.cell = b.cell AND a.vec_id <> b.vec_id
          |  WHERE (b.ccos < a.ccos OR (b.ccos = a.ccos AND b.vec_id < a.vec_id))
          |    AND round(list_sum(list_transform(list_zip(a.ce, b.ce), x -> x[1]::DOUBLE * x[2]::DOUBLE))
          |      / (sqrt(list_sum(list_transform(list_zip(a.ce, a.ce), x -> x[1]::DOUBLE * x[2]::DOUBLE)))
          |       * sqrt(list_sum(list_transform(list_zip(b.ce, b.ce), x -> x[1]::DOUBLE * x[2]::DOUBLE)))), 6) >= 0.4002
          |  GROUP BY 1)
          |SELECT k.vec_id, k.cell::BIGINT AS cell, k.ccos AS centroid_cos,
          |  coalesce(c.n_closer, 0)::BIGINT AS n_closer_dups,
          |  coalesce(c.n_closer, 0) = 0 AS is_kept
          |FROM keyed k LEFT JOIN closer c USING (vec_id)""".stripMargin,

      "f3_loose_dollar" ->
        """WITH t AS (SELECT l_orderkey, l_linenumber::BIGINT AS page,
          |  'ref '||(l_partkey*37)||' amount $'||(l_suppkey%10) AS txt FROM lineitem)
          |SELECT l_orderkey, page,
          |  regexp_matches(txt, '\$\s*\d|\b\d{1,3}(?:,\d{3})+(?:\.\d+)?\b|\b\d{5,}\b') AS hit
          |FROM t""".stripMargin,

      "f4_extended_keyword" ->
        """WITH t AS (SELECT doc_id,
          |  CASE WHEN doc_id%7=0 THEN text || ' payee: X' ELSE text END AS t2 FROM documents)
          |SELECT doc_id,
          |  (lower(t2) LIKE '%mortgagee%' OR lower(t2) LIKE '%additional interest%'
          |   OR lower(t2) LIKE '%additional insured%' OR lower(t2) LIKE '%loss payee%'
          |   OR lower(t2) LIKE '%loss payable%' OR lower(t2) LIKE '%lienholder%'
          |   OR lower(t2) LIKE '%lien holder%' OR lower(t2) LIKE '%secured party%'
          |   OR lower(t2) LIKE '%secured parties%' OR lower(t2) LIKE '%mortgage holder%'
          |   OR lower(t2) LIKE '%payee%') AS hit
          |FROM t""".stripMargin,

      "r6_first_k" ->
        """SELECT l_orderkey, page FROM (
          |  SELECT DISTINCT l_orderkey, l_linenumber::BIGINT AS page FROM lineitem)
          |QUALIFY row_number() OVER (PARTITION BY l_orderkey ORDER BY page) <= 3""".stripMargin,

      "a5_section_validation" ->
        """WITH t AS (SELECT doc_id,
          |  CASE WHEN doc_id%2=0 THEN 'GL' ELSE 'PROPERTY' END AS coverage, text FROM documents)
          |SELECT doc_id, coverage, coalesce(length(text),0) > 100 AS valid,
          |  coalesce(CASE WHEN coverage='GL' THEN
          |    array_to_string(list_filter(['limit','aggregate','occurrence'],
          |      k -> contains(lower(text), k)), ',')
          |  ELSE
          |    array_to_string(list_filter(['building','property','coverage'],
          |      k -> contains(lower(text), k)), ',') END, '') AS keywords_found
          |FROM t""".stripMargin,

      "a6_distinct_pages" ->
        """SELECT l_orderkey, count(DISTINCT l_linenumber) AS n_pages
          |FROM lineitem GROUP BY 1""".stripMargin,

      // Full MinHash+LSH replay: 32-row signatures, 8 band keys, candidate
      // pairs via shared bands, exact-Jaccard verify — all from md5.
      "minhash_dups" ->
        s"""WITH t AS (SELECT doc_id, $docText AS t2 FROM documents),
           |tok AS (SELECT doc_id, ${toks.format("t2")} AS toks FROM t),
           |sh AS (SELECT doc_id, list_distinct(list_transform(range(len(toks)-2),
           |    i -> toks[i+1]||' '||toks[i+2]||' '||toks[i+3])) AS shl
           |  FROM tok WHERE len(toks) >= 3),
           |sig AS (SELECT doc_id, list_transform(range(32), i ->
           |    list_min(list_transform(shl, x -> ${hash60("i||':'||x")}))) AS sg FROM sh),
           |bands AS (SELECT doc_id, unnest(list_transform(range(8), b ->
           |    ${hash60("b||'|'||sg[4*b+1]||','||sg[4*b+2]||','||sg[4*b+3]||','||sg[4*b+4]")})) AS band FROM sig),
           |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM bands a JOIN bands b ON a.band=b.band AND a.doc_id < b.doc_id),
           |rows_ AS (SELECT doc_id, ${hash60("s")} AS sh2
           |  FROM (SELECT doc_id, unnest(shl) AS s FROM sh)),
           |sizes AS (SELECT doc_id, count(*) AS sz FROM rows_ GROUP BY 1),
           |common AS (SELECT c.id_a, c.id_b, count(*) AS cnt FROM cand c
           |  JOIN rows_ a ON a.doc_id=c.id_a JOIN rows_ b ON b.doc_id=c.id_b AND a.sh2=b.sh2 GROUP BY 1,2)
           |SELECT id_a, id_b, round(cnt::DOUBLE/(sa.sz+sb.sz-cnt)::DOUBLE,6) AS jaccard
           |FROM common JOIN sizes sa ON sa.doc_id=id_a JOIN sizes sb ON sb.doc_id=id_b
           |WHERE round(cnt::DOUBLE/(sa.sz+sb.sz-cnt)::DOUBLE,6) >= 0.5""".stripMargin,

      // recall replay: truth = ALL shared-shingle pairs at exact J >= 0.5
      // (the ngram_jaccard cascade), found = the banded cascade above;
      // found ⊆ truth, so the left join + count is the exact recall
      "minhash_recall" ->
        s"""WITH t AS (SELECT doc_id, $docText AS t2 FROM documents),
           |tok AS (SELECT doc_id, ${toks.format("t2")} AS toks FROM t),
           |sh AS (SELECT doc_id, list_distinct(list_transform(range(len(toks)-2),
           |    i -> toks[i+1]||' '||toks[i+2]||' '||toks[i+3])) AS shl
           |  FROM tok WHERE len(toks) >= 3),
           |rows_ AS (SELECT doc_id, ${hash60("s")} AS sh2
           |  FROM (SELECT doc_id, unnest(shl) AS s FROM sh)),
           |sizes AS (SELECT doc_id, count(*) AS sz FROM rows_ GROUP BY 1),
           |allc AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS cnt
           |  FROM rows_ a JOIN rows_ b ON a.sh2=b.sh2 AND a.doc_id < b.doc_id GROUP BY 1,2),
           |truth AS (SELECT id_a, id_b FROM allc
           |  JOIN sizes sa ON sa.doc_id=id_a JOIN sizes sb ON sb.doc_id=id_b
           |  WHERE round(cnt::DOUBLE/(sa.sz+sb.sz-cnt)::DOUBLE,6) >= 0.5),
           |sig AS (SELECT doc_id, list_transform(range(32), i ->
           |    list_min(list_transform(shl, x -> ${hash60("i||':'||x")}))) AS sg FROM sh),
           |bands AS (SELECT doc_id, unnest(list_transform(range(8), b ->
           |    ${hash60("b||'|'||sg[4*b+1]||','||sg[4*b+2]||','||sg[4*b+3]||','||sg[4*b+4]")})) AS band FROM sig),
           |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM bands a JOIN bands b ON a.band=b.band AND a.doc_id < b.doc_id),
           |common AS (SELECT c.id_a, c.id_b, count(*) AS cnt FROM cand c
           |  JOIN rows_ a ON a.doc_id=c.id_a JOIN rows_ b ON b.doc_id=c.id_b AND a.sh2=b.sh2 GROUP BY 1,2),
           |found AS (SELECT id_a, id_b FROM common
           |  JOIN sizes sa ON sa.doc_id=id_a JOIN sizes sb ON sb.doc_id=id_b
           |  WHERE round(cnt::DOUBLE/(sa.sz+sb.sz-cnt)::DOUBLE,6) >= 0.5)
           |SELECT count(*)::BIGINT AS n_true,
           |  count(f.id_a)::BIGINT AS n_found,
           |  (1000 * count(f.id_a)) // count(*) AS recall_milli
           |FROM truth tr LEFT JOIN found f ON tr.id_a=f.id_a AND tr.id_b=f.id_b""".stripMargin,

      // streaming replay: the signature/banding cascade (identical to
      // minhash_dups) on the bounded corpus, with the STREAMING verdict —
      // signature-component equality fraction — instead of exact Jaccard
      "stream_minhash" ->
        s"""WITH t AS (SELECT doc_id, $docText AS t2 FROM documents WHERE doc_id <= 500),
           |tok AS (SELECT doc_id, ${toks.format("t2")} AS toks FROM t),
           |sh AS (SELECT doc_id, list_distinct(list_transform(range(len(toks)-2),
           |    i -> toks[i+1]||' '||toks[i+2]||' '||toks[i+3])) AS shl
           |  FROM tok WHERE len(toks) >= 3),
           |sig AS (SELECT doc_id, list_transform(range(32), i ->
           |    list_min(list_transform(shl, x -> ${hash60("i||':'||x")}))) AS sg FROM sh),
           |bands AS (SELECT doc_id, unnest(list_transform(range(8), b ->
           |    ${hash60("b||'|'||sg[4*b+1]||','||sg[4*b+2]||','||sg[4*b+3]||','||sg[4*b+4]")})) AS band FROM sig),
           |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM bands a JOIN bands b ON a.band=b.band AND a.doc_id < b.doc_id)
           |SELECT id_a, id_b,
           |  ((1000 * len(list_filter(range(32), i -> sa.sg[i+1] = sb.sg[i+1]))) // 32)::BIGINT
           |    AS sim_milli
           |FROM cand JOIN sig sa ON sa.doc_id=id_a JOIN sig sb ON sb.doc_id=id_b
           |WHERE (1000 * len(list_filter(range(32), i -> sa.sg[i+1] = sb.sg[i+1]))) // 32 >= 500""".stripMargin,

      // incremental replay: the BATCH cascade (identical to minhash_dups)
      // restricted to pairs touching an odd ("new") doc — the incremental
      // path must produce exactly the batch answer for those pairs
      "minhash_incremental" ->
        s"""WITH t AS (SELECT doc_id, $docText AS t2 FROM documents),
           |tok AS (SELECT doc_id, ${toks.format("t2")} AS toks FROM t),
           |sh AS (SELECT doc_id, list_distinct(list_transform(range(len(toks)-2),
           |    i -> toks[i+1]||' '||toks[i+2]||' '||toks[i+3])) AS shl
           |  FROM tok WHERE len(toks) >= 3),
           |sig AS (SELECT doc_id, list_transform(range(32), i ->
           |    list_min(list_transform(shl, x -> ${hash60("i||':'||x")}))) AS sg FROM sh),
           |bands AS (SELECT doc_id, unnest(list_transform(range(8), b ->
           |    ${hash60("b||'|'||sg[4*b+1]||','||sg[4*b+2]||','||sg[4*b+3]||','||sg[4*b+4]")})) AS band FROM sig),
           |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM bands a JOIN bands b ON a.band=b.band AND a.doc_id < b.doc_id
           |  WHERE a.doc_id % 2 = 1 OR b.doc_id % 2 = 1),
           |rows_ AS (SELECT doc_id, ${hash60("s")} AS sh2
           |  FROM (SELECT doc_id, unnest(shl) AS s FROM sh)),
           |sizes AS (SELECT doc_id, count(*) AS sz FROM rows_ GROUP BY 1),
           |common AS (SELECT c.id_a, c.id_b, count(*) AS cnt FROM cand c
           |  JOIN rows_ a ON a.doc_id=c.id_a JOIN rows_ b ON b.doc_id=c.id_b AND a.sh2=b.sh2 GROUP BY 1,2)
           |SELECT id_a, id_b, round(cnt::DOUBLE/(sa.sz+sb.sz-cnt)::DOUBLE,6) AS jaccard
           |FROM common JOIN sizes sa ON sa.doc_id=id_a JOIN sizes sb ON sb.doc_id=id_b
           |WHERE round(cnt::DOUBLE/(sa.sz+sb.sz-cnt)::DOUBLE,6) >= 0.5""".stripMargin,

      // SimHash byte-band candidate join + Hamming verify, replayed via
      // md5-derived 32-bit fingerprints and integer bit ops.
      "simhash_dups" ->
        s"""WITH t AS (SELECT doc_id, $docText AS t2 FROM documents),
           |tok AS (SELECT doc_id, ${toks.format("t2")} AS toks FROM t),
           |fp AS (SELECT doc_id,
           |  CAST(coalesce(list_sum(list_transform(range(32), i ->
           |    CASE WHEN coalesce(list_sum(list_transform(toks, tk ->
           |      CASE WHEN ((${hash32("tk")} >> i) & 1) = 1 THEN 1 ELSE -1 END)),0) > 0
           |    THEN (1::BIGINT << i) ELSE 0::BIGINT END)),0) AS BIGINT) AS f
           |  FROM tok),
           |banded AS (SELECT doc_id, f, unnest(list_transform(range(4),
           |    b -> b||'|'||((f >> (b*8)) & 255))) AS band FROM fp),
           |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.f AS fa, b.f AS fb
           |  FROM banded a JOIN banded b ON a.band=b.band AND a.doc_id < b.doc_id)
           |SELECT id_a, id_b, bit_count(xor(fa, fb))::BIGINT AS hamming
           |FROM pairs WHERE bit_count(xor(fa, fb)) <= 3""".stripMargin,

      // Full EP1 replay: body construction → A2 gate (gibberish count +
      // total chars) → per-kind F1∨F2 hits → islands merge → R4 endpoint
      // drop + slice → union → per-source placeholder interleave → offset
      // renumber. Span text compared verbatim.
      "ep1_oracle" -> ep1CascadeSql(""),
      "ep1_extract" -> ep1CascadeSql(""),

      // the streamed EP1 path over the bounded corpus: identical cascade
      // replay, bounded WHERE
      "stream_extract" -> ep1CascadeSql("WHERE l_orderkey <= 8000"),

      // the custom-state assembly path: assembled docs ≡ batch docs (spans
      // sorted by offset), so the per-doc span COUNT replays through the
      // same cascade; docs whose cascade output is empty emit n_spans=0
      // (left join), and the sentinel doc never emits at all
      "stream_assemble" ->
        (s"""WITH spansq AS (
           |${ep1CascadeSql("WHERE l_orderkey <= 2000")}
           |)
           |SELECT d.k::VARCHAR AS doc_id, coalesce(c.n, 0)::BIGINT AS n_spans
           |FROM (SELECT DISTINCT l_orderkey AS k FROM lineitem WHERE l_orderkey <= 2000) d
           |LEFT JOIN (SELECT k, count(*) AS n FROM spansq GROUP BY 1) c ON d.k = c.k""".stripMargin),


      // Real-decode replay: Spark runs synth pixels → PNG encode → ImageIO
      // decode → pixel scan; the oracle computes the identical channel sums
      // arithmetically (x = i mod w, y = i div w), means via the 6dp
      // VARCHAR→DECIMAL tie-boundary idiom.
      // aHash replay from pixel arithmetic (PNG decode is lossless): unnest
      // the pixel grid, integer grayscale, box cells by (coord*8) div edge,
      // integer cell means, bit per cell above the 64-cell mean
      // energy-band fingerprint replay from synthSample arithmetic
      "audio_fingerprint" ->
        """WITH spec AS (SELECT 'au-'||c_custkey AS media_ref,
          |  ('0x'||substr(md5('a'||(c_custkey%200)),1,8))::BIGINT AS seed,
          |  (200 + (c_custkey%200)%50)::INT AS n
          |  FROM customer WHERE c_custkey <= 1000),
          |sx AS (SELECT media_ref, seed, n, unnest(range(n)) AS i FROM spec),
          |sm AS (SELECT media_ref, (i*64)//n AS w,
          |  abs(((i*773 + seed*31) % 65536) - 32768) AS a FROM sx),
          |wm AS (SELECT media_ref, w, sum(a)//count(*) AS m FROM sm GROUP BY 1,2),
          |ov AS (SELECT media_ref, sum(m)//64 AS om FROM wm GROUP BY 1)
          |SELECT wm.media_ref,
          |  sum(CASE WHEN m > om AND w >= 32 THEN (1::BIGINT << (w-32))
          |    ELSE 0 END)::BIGINT AS fp_hi,
          |  sum(CASE WHEN m > om AND w < 32 THEN (1::BIGINT << w)
          |    ELSE 0 END)::BIGINT AS fp_lo
          |FROM wm JOIN ov USING (media_ref) GROUP BY 1""".stripMargin,

      "image_phash" -> (imagePhashOracleCtes +
        "SELECT media_ref, ahash_hi, ahash_lo FROM bits"),

      "image_dups" -> (imagePhashOracleCtes +
        """SELECT a.media_ref AS ref_a, b.media_ref AS ref_b,
          |  a.ahash_hi, a.ahash_lo
          |FROM bits a JOIN bits b
          |  ON a.ahash_hi=b.ahash_hi AND a.ahash_lo=b.ahash_lo
          |  AND a.media_ref < b.media_ref""".stripMargin),

      "video_phash" -> (videoPhashOracleCtes +
        "SELECT media_ref, frame_index, ahash_hi, ahash_lo FROM vbits"),

      "video_dups" -> (videoPhashOracleCtes +
        """SELECT a.media_ref AS ref_a, b.media_ref AS ref_b,
          |  count(*) AS matched_frames
          |FROM vbits a JOIN vbits b
          |  ON a.frame_index=b.frame_index AND a.ahash_hi=b.ahash_hi
          |  AND a.ahash_lo=b.ahash_lo AND a.media_ref < b.media_ref
          |GROUP BY 1,2 HAVING count(*) >= 4""".stripMargin),

      "media_decode" ->
        """WITH r AS (SELECT 'img-'||c_custkey AS media_ref,
          |  16 + c_custkey%17 AS w, 12 + c_custkey%13 AS h,
          |  ('0x'||substr(md5('img-'||c_custkey),1,8))::BIGINT AS seed
          |  FROM customer WHERE c_custkey <= 3000),
          |px AS (SELECT media_ref, w, h,
          |  list_sum(list_transform(range(w*h), i -> ((i%w)*31 + (i//w)*17 + seed) % 256)) AS sr,
          |  list_sum(list_transform(range(w*h), i -> ((i%w)*13 + (i//w)*29 + seed) % 256)) AS sg,
          |  list_sum(list_transform(range(w*h), i -> ((i%w)*7  + (i//w)*43 + seed) % 256)) AS sb
          |  FROM r)
          |SELECT media_ref, 'png' AS format, w::BIGINT AS width, h::BIGINT AS height,
          |  round(CAST(sr::DOUBLE/(w*h) AS VARCHAR)::DECIMAL(25,20),6)::DOUBLE AS mean_r,
          |  round(CAST(sg::DOUBLE/(w*h) AS VARCHAR)::DECIMAL(25,20),6)::DOUBLE AS mean_g,
          |  round(CAST(sb::DOUBLE/(w*h) AS VARCHAR)::DECIMAL(25,20),6)::DOUBLE AS mean_b
          |FROM px""".stripMargin,

      // Streaming windowed-agg replay: tumbling 300s windows over
      // event_time = 1767225600 + l_orderkey%3600; every regular window
      // finalizes (the sentinel doc's watermark passes them all), the
      // sentinel's own window never emits and is excluded here.
      // the streaming dedup's survivors are full-row identical per key, so
      // the oracle is simply the DISTINCT of the derivation + the exact
      // fingerprint the state keyed on
      "stream_dedup" ->
        s"""SELECT DISTINCT doc_id % 100 AS doc_key,
           |  'Body Variant  ' || (doc_id % 100) AS text,
           |  ${hash60("regexp_replace(trim(lower('Body Variant  ' || (doc_id % 100))),'\\s+',' ','g')")} AS fp
           |FROM documents""".stripMargin,

      // stream-stream join replay: inner matches emit on partner arrival,
      // so a fully-delivered two-source stream equals the batch join; whole-
      // second timestamps make interval math exact integer arithmetic
      "stream_join" ->
        """WITH l AS (SELECT o_orderkey AS doc_id,
          |    1767225600 + o_orderkey % 3600 AS doc_ts,
          |    CAST(round(o_totalprice*100) AS BIGINT) AS o_cents
          |  FROM orders WHERE o_orderkey <= 2000),
          |r AS (SELECT l_orderkey AS rk,
          |    1767225600 + (l_orderkey % 3600) + ((l_linenumber*37) % 150) - 70 AS span_ts,
          |    'p' || l_linenumber || '-' || l_orderkey AS span_text
          |  FROM lineitem WHERE l_orderkey <= 2000)
          |SELECT doc_id, doc_ts, o_cents, span_ts, span_text
          |FROM l JOIN r ON doc_id = rk AND abs(span_ts - doc_ts) <= 60""".stripMargin,

      // streaming-HLL replay: the hll_distinct register chain with the
      // 5-minute window start as the group key; the sentinel's own window
      // never finalizes, so only the 12 regular windows appear
      "stream_hll" ->
        s"""WITH ev AS (SELECT (1767225600 + l_orderkey%3600) AS ts,
           |    l_partkey::VARCHAR AS v FROM lineitem WHERE l_orderkey <= 20000),
           |wv AS (SELECT (ts//300)*300 AS grp, v FROM ev),
           |nr AS (SELECT grp, count(*) AS n_rows FROM wv GROUP BY 1),
           |h AS (SELECT DISTINCT grp, md5(v) AS hx FROM wv),
           |r AS (SELECT grp, ('0x'||substr(hx,1,2))::INT AS bucket,
           |        length(regexp_extract(substr(hx,3,13), '^0*')) AS z,
           |        substr(hx,3,13) AS tail FROM h),
           |rho AS (SELECT grp, bucket, CASE WHEN z = 13 THEN 53 ELSE 4*z + 5 -
           |          (CASE WHEN d >= 8 THEN 4 WHEN d >= 4 THEN 3
           |                WHEN d >= 2 THEN 2 ELSE 1 END) END AS rho
           |        FROM (SELECT grp, bucket, z, CASE WHEN z < 13
           |                THEN ('0x'||substr(tail, z+1, 1))::INT ELSE 0 END AS d FROM r)),
           |reg AS (SELECT grp, bucket, max(rho) AS reg FROM rho GROUP BY 1, 2),
           |ag AS (SELECT grp,
           |        sum((1::BIGINT << (53 - reg))::BIGINT)::BIGINT
           |          + (256 - count(*)) * 9007199254740992::BIGINT AS s_sum,
           |        256 - count(*) AS vz FROM reg GROUP BY 1),
           |lc(lv, lc_est) AS (VALUES $hllLcValues),
           |est AS (SELECT grp, vz,
           |        ((1846528::HUGEINT * 65536::HUGEINT * 9007199254740992::HUGEINT)
           |          // (2570790::HUGEINT * s_sum::HUGEINT))::BIGINT AS raw FROM ag)
           |SELECT e.grp AS window_start,
           |  CASE WHEN e.vz > 0 AND raw <= 640 THEN lcj.lc_est ELSE raw END AS hll_distinct,
           |  nr.n_rows
           |FROM est e LEFT JOIN lc lcj ON lcj.lv = e.vz JOIN nr USING (grp)""".stripMargin,

      // the batch sessionize replay over the same bounded corpus: every
      // real session closed (sentinel-flushed), sentinel excluded
      "stream_session" ->
        """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id FROM events
          |  WHERE event_id <= 20000),
          |l AS (SELECT user_id, us, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM e),
          |s AS (SELECT user_id, us, CASE WHEN prev IS NULL OR us-prev > 1800000000 THEN 1 ELSE 0 END AS ns FROM l),
          |g AS (SELECT user_id, us, sum(ns) OVER (PARTITION BY user_id ORDER BY us
          |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess FROM s)
          |SELECT user_id, min(us) AS session_start_us, max(us) AS session_end_us,
          |  count(*) AS n_events FROM g GROUP BY user_id, sess""".stripMargin,

      "stream_window" ->
        """WITH sp AS (SELECT l_orderkey AS k,
          |  'p'||l_linenumber||'-'||l_orderkey AS text FROM lineitem
          |  WHERE l_orderkey <= 20000)
          |SELECT ((1767225600 + k%3600)//300)*300 AS window_start,
          |  'text' AS kind, count(*)::BIGINT AS n_spans,
          |  sum(length(text))::BIGINT AS n_chars
          |FROM sp GROUP BY 1, 2""".stripMargin,

      // Real audio replay: sample i = ((i*773 + seed*31) % 65536) - 32768;
      // Spark runs WAV encode → javax.sound decode → PCM scan, the oracle
      // computes identical sums arithmetically.
      "media_audio" ->
        """WITH r AS (SELECT 'wav-'||s_suppkey AS media_ref,
          |  256 + s_suppkey%512 AS n,
          |  ('0x'||substr(md5('wav-'||s_suppkey),1,8))::BIGINT AS seed
          |  FROM supplier),
          |sam AS (SELECT media_ref, n,
          |  list_transform(range(n), i -> abs(((i*773 + seed*31) % 65536) - 32768)) AS a
          |  FROM r)
          |SELECT media_ref, 'wave' AS format, n::BIGINT AS n_samples,
          |  8000::BIGINT AS sample_rate,
          |  round(CAST(list_sum(a)::DOUBLE/n AS VARCHAR)::DECIMAL(25,20),6)::DOUBLE AS mean_abs,
          |  list_max(a)::BIGINT AS peak
          |FROM sam""".stripMargin,

      // Decode-stub replay: metadata bytes are md5(ref) bytes d0..d4,
      // parsed from the hex digest; resize is integer aspect-ratio math.
      "media_stub_meta" ->
        """WITH r AS (SELECT 'm-'||p_partkey AS media_ref, md5('m-'||p_partkey) AS h FROM part),
          |d AS (SELECT media_ref,
          |  ('0x'||substr(h,1,2))::INT AS d0, ('0x'||substr(h,3,2))::INT AS d1,
          |  ('0x'||substr(h,5,2))::INT AS d2, ('0x'||substr(h,7,2))::INT AS d3,
          |  ('0x'||substr(h,9,2))::INT AS d4 FROM r),
          |m AS (SELECT media_ref,
          |  (['jpeg','png','webp','mp4'])[(d0%4)+1] AS format,
          |  (64 + d1*8)::BIGINT AS width, (64 + d2*8)::BIGINT AS height,
          |  d3, (256 + d4*16)::BIGINT AS bytes_len FROM d),
          |m2 AS (SELECT media_ref, format, width, height,
          |  (CASE WHEN format='mp4' THEN 1 + (d3%32) ELSE 1 END)::BIGINT AS n_frames,
          |  bytes_len, greatest(width, height) AS long_ FROM m)
          |SELECT media_ref, format, width, height, n_frames, bytes_len,
          |  (CASE WHEN long_ <= 256 THEN width ELSE greatest(1, (width*256)//long_) END)::BIGINT AS rs_width,
          |  (CASE WHEN long_ <= 256 THEN height ELSE greatest(1, (height*256)//long_) END)::BIGINT AS rs_height
          |FROM m2""".stripMargin,

      // doc-derived media corpus (mediaDocs): refs mm-<k>-<p> for every
      // distinct (order, line) with p%5<>0 (the %5==0 media spans carry an
      // empty ref and the metadata stage must drop them) — same md5 stub
      // replay as media_stub_meta
      "media_meta" ->
        """WITH pg AS (SELECT DISTINCT l_orderkey AS k, l_linenumber::INT AS p
          |  FROM lineitem WHERE l_linenumber%5 <> 0),
          |r AS (SELECT 'mm-'||k||'-'||p AS media_ref, k::VARCHAR AS doc_id,
          |  md5('mm-'||k||'-'||p) AS h FROM pg),
          |d AS (SELECT media_ref, doc_id,
          |  ('0x'||substr(h,1,2))::INT AS d0, ('0x'||substr(h,3,2))::INT AS d1,
          |  ('0x'||substr(h,5,2))::INT AS d2, ('0x'||substr(h,7,2))::INT AS d3 FROM r),
          |m AS (SELECT media_ref, doc_id,
          |  (['jpeg','png','webp','mp4'])[(d0%4)+1] AS format,
          |  (64 + d1*8)::BIGINT AS width, (64 + d2*8)::BIGINT AS height, d3 FROM d)
          |SELECT media_ref, doc_id, format, width, height,
          |  (CASE WHEN format='mp4' THEN 1 + (d3%32) ELSE 1 END)::BIGINT AS n_frames
          |FROM m""".stripMargin,

      "media_frames" ->
        """WITH pg AS (SELECT DISTINCT l_orderkey AS k, l_linenumber::INT AS p
          |  FROM lineitem WHERE l_linenumber%5 <> 0),
          |r AS (SELECT 'mm-'||k||'-'||p AS media_ref, md5('mm-'||k||'-'||p) AS h FROM pg),
          |d AS (SELECT media_ref,
          |  ('0x'||substr(h,1,2))::INT AS d0, ('0x'||substr(h,7,2))::INT AS d3 FROM r),
          |m AS (SELECT media_ref,
          |  CASE WHEN (['jpeg','png','webp','mp4'])[(d0%4)+1]='mp4' THEN 1 + (d3%32) ELSE 1 END AS nf
          |  FROM d),
          |n AS (SELECT media_ref, nf, least(4, nf) AS n FROM m),
          |f AS (SELECT media_ref, nf, n, unnest(range(n)) AS i FROM n),
          |idx AS (SELECT media_ref,
          |  (CASE WHEN n=1 THEN 0 ELSE (i*(nf-1))//(n-1) END)::BIGINT AS frame_index
          |  FROM f)
          |SELECT media_ref, frame_index,
          |  upper(substr(md5(media_ref||'#'||frame_index),1,16)) AS feature_hex
          |FROM idx""".stripMargin,

      "media_resize" ->
        """WITH pg AS (SELECT DISTINCT l_orderkey AS k, l_linenumber::INT AS p
          |  FROM lineitem WHERE l_linenumber%5 <> 0),
          |r AS (SELECT 'mm-'||k||'-'||p AS media_ref, md5('mm-'||k||'-'||p) AS h FROM pg),
          |d AS (SELECT media_ref,
          |  ('0x'||substr(h,3,2))::INT AS d1, ('0x'||substr(h,5,2))::INT AS d2 FROM r),
          |m AS (SELECT media_ref, (64 + d1*8)::BIGINT AS width,
          |  (64 + d2*8)::BIGINT AS height FROM d),
          |m2 AS (SELECT media_ref, width, height, greatest(width, height) AS long_ FROM m)
          |SELECT media_ref,
          |  (CASE WHEN long_ <= 256 THEN width ELSE greatest(1, (width*256)//long_) END)::BIGINT AS width,
          |  (CASE WHEN long_ <= 256 THEN height ELSE greatest(1, (height*256)//long_) END)::BIGINT AS height
          |FROM m2""".stripMargin,

      // Frame sampling replay: n = min(4, n_frames); evenly spaced integer
      // indices; feature = first 8 bytes of md5(ref#idx), upper-hex.
      "media_stub_frames" ->
        """WITH r AS (SELECT 'm-'||p_partkey AS media_ref, md5('m-'||p_partkey) AS h FROM part),
          |d AS (SELECT media_ref,
          |  ('0x'||substr(h,1,2))::INT AS d0, ('0x'||substr(h,7,2))::INT AS d3 FROM r),
          |m AS (SELECT media_ref,
          |  CASE WHEN (['jpeg','png','webp','mp4'])[(d0%4)+1]='mp4' THEN 1 + (d3%32) ELSE 1 END AS nf
          |  FROM d),
          |n AS (SELECT media_ref, nf, least(4, nf) AS n FROM m),
          |f AS (SELECT media_ref, nf, n, unnest(range(n)) AS i FROM n),
          |idx AS (SELECT media_ref,
          |  (CASE WHEN n=1 THEN 0 ELSE (i*(nf-1))//(n-1) END)::BIGINT AS frame_index
          |  FROM f)
          |SELECT media_ref, frame_index,
          |  upper(substr(md5(media_ref||'#'||frame_index),1,16)) AS feature_hex
          |FROM idx""".stripMargin,

      // real GPNG container decode: the oracle replays each SAMPLED frame's
      // channel means arithmetically (frame f of seed s is the synthPixel
      // image of s+f; PNG frames are lossless so any defect in the
      // encode/parse/seek/decode cycle breaks parity)
      "media_video_frames" ->
        """WITH r AS (SELECT 'vid-'||c_custkey AS media_ref,
          |  1 + c_custkey%10 AS nf, 8 + c_custkey%9 AS w, 6 + c_custkey%7 AS h,
          |  ('0x'||substr(md5('vid-'||c_custkey),1,8))::BIGINT AS seed
          |  FROM customer WHERE c_custkey <= 600),
          |n AS (SELECT media_ref, nf, w, h, seed, least(4, nf) AS n FROM r),
          |f0 AS (SELECT media_ref, nf, n, w, h, seed, unnest(range(n)) AS i FROM n),
          |f AS (SELECT media_ref, w, h,
          |  (CASE WHEN n=1 THEN 0 ELSE (i*(nf-1))//(n-1) END)::BIGINT AS frame_index,
          |  seed + (CASE WHEN n=1 THEN 0 ELSE (i*(nf-1))//(n-1) END) AS fseed FROM f0),
          |px AS (SELECT media_ref, frame_index, w, h,
          |  list_sum(list_transform(range(w*h), i -> ((i%w)*31 + (i//w)*17 + fseed) % 256)) AS sr,
          |  list_sum(list_transform(range(w*h), i -> ((i%w)*13 + (i//w)*29 + fseed) % 256)) AS sg,
          |  list_sum(list_transform(range(w*h), i -> ((i%w)*7  + (i//w)*43 + fseed) % 256)) AS sb
          |  FROM f)
          |SELECT media_ref, frame_index, w::BIGINT AS width, h::BIGINT AS height,
          |  round(CAST(sr::DOUBLE/(w*h) AS VARCHAR)::DECIMAL(25,20),6)::DOUBLE AS mean_r,
          |  round(CAST(sg::DOUBLE/(w*h) AS VARCHAR)::DECIMAL(25,20),6)::DOUBLE AS mean_g,
          |  round(CAST(sb::DOUBLE/(w*h) AS VARCHAR)::DECIMAL(25,20),6)::DOUBLE AS mean_b
          |FROM px""".stripMargin,

      // EP3 metadata replay: P1 boundaries arithmetically (as p1_boundaries),
      // F1 hits from the body construction, R1 islands (as islands_merge),
      // R7 start-page existence + match indexing, R5 available-page end
      // selection + warnings, R8 banner/chunk length assembly and A5's
      // length validation.
      "qc_head_meta" -> (qcHeadCascadeSql +
        """
          |SELECT k, cov AS coverage, sp::BIGINT AS start_page, ep::BIGINT AS end_page,
          |  pc::BIGINT AS page_count, cl::BIGINT AS content_len,
          |  cl > 100 AS valid, nw::BIGINT AS n_warnings
          |FROM sec, unnest(['GL','PROPERTY']) AS t(cov)""".stripMargin),

      // same cascade through the QcJob wrapper (fromSpans assembly → run):
      // the span corpus renders to the identical flat text, so the replay
      // differs only in the projected columns
      "qc_head_sections" -> (qcHeadCascadeSql +
        """
          |SELECT k::VARCHAR AS doc_id, cov AS coverage, sp::BIGINT AS start_page,
          |  ep::BIGINT AS end_page, pc::BIGINT AS page_count, cl > 100 AS valid
          |FROM sec, unnest(['GL','PROPERTY']) AS t(cov)""".stripMargin),

      // verbatim R8 section text: same cascade as qc_head_meta, but instead
      // of arithmetic lengths the oracle REBUILDS the assembled string —
      // '[Match i] Page p' banners + the page chunks re-concatenated from
      // marker+body renders in page order — and the A5 found-keyword list
      "qc_head_content" ->
        """WITH li AS (SELECT l_orderkey AS k, l_linenumber::INT AS page, min(l_partkey) AS pk
          |  FROM lineitem GROUP BY 1, 2),
          |b0 AS (SELECT k, page, pk,
          |  'item page '||page||' of order '||k||' limit $'||(pk%400)||
          |  (CASE WHEN pk%7=0 THEN ' see EXAMPLE calculation' ELSE '' END) AS body FROM li),
          |c AS (SELECT k, page, pk, 169 + length(page::VARCHAR) + length(body) AS clen FROM b0),
          |pos AS (SELECT k, page, pk, clen,
          |  coalesce(sum(clen) OVER (PARTITION BY k ORDER BY page
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),0) AS cum,
          |  sum(clen) OVER (PARTITION BY k) AS total FROM c),
          |bound AS (SELECT k, page, pk, cum+1 AS cstart,
          |  coalesce(lead(cum+1) OVER (PARTITION BY k ORDER BY page), total) AS cend FROM pos),
          |hits AS (SELECT k, page FROM bound WHERE pk%7 <> 0 AND pk%400 >= 200),
          |dom AS (SELECT k, min(page) AS mn, max(page) AS mx FROM bound GROUP BY 1),
          |r0 AS (SELECT DISTINCT h.k, greatest(d.mn, h.page-1) AS s, least(d.mx, h.page+1) AS e
          |  FROM hits h JOIN dom d ON h.k=d.k),
          |w AS (SELECT k, s, e, max(e) OVER (PARTITION BY k ORDER BY s, e
          |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe FROM r0),
          |g AS (SELECT k, s, e, sum(CASE WHEN pe IS NULL OR s > pe+1 THEN 1 ELSE 0 END)
          |  OVER (PARTITION BY k ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND
          |  CURRENT ROW) AS grp FROM w),
          |ranges AS (SELECT k, min(s) AS s, max(e) AS e FROM g GROUP BY k, grp),
          |-- range validity via an INNER JOIN on bound's unique (k,page) key,
          |-- NOT `WHERE EXISTS`: DuckDB's correlated-EXISTS decorrelation can
          |-- nondeterministically DUPLICATE the outer row under parallel
          |-- execution (observed ~30% of runs at sf0.1), which doubled a
          |-- section downstream; the join is 1:1 by construction
          |m0 AS (SELECT r.k, r.s, r.e, (r.e - r.s + 1) AS n_req FROM ranges r
          |  JOIN bound b ON b.k = r.k AND b.page = r.s),
          |m AS (SELECT k, s, e, n_req, row_number() OVER (PARTITION BY k ORDER BY s) AS idx FROM m0),
          |avail AS (SELECT m.k, m.idx, m.s, m.n_req, b.page, b.cend,
          |  row_number() OVER (PARTITION BY m.k, m.idx ORDER BY b.page) AS arn,
          |  count(*) OVER (PARTITION BY m.k, m.idx) AS cnt
          |  FROM m JOIN bound b ON b.k = m.k AND b.page >= m.s),
          |ends AS (SELECT k, idx, s, n_req, cnt,
          |  max(CASE WHEN arn = least(cnt, n_req) THEN page END) AS end_page,
          |  max(CASE WHEN arn = least(cnt, n_req) THEN cend END) AS end_char
          |  FROM avail GROUP BY 1, 2, 3, 4, 5),
          |ml AS (SELECT e.k, e.idx, e.s AS start_page, e.end_page,
          |  bs.cstart AS start_char, e.end_char
          |  FROM ends e JOIN bound bs ON bs.k=e.k AND bs.page=e.s),
          |chunks AS (SELECT m.k, m.idx, m.start_page,
          |  -- the slice starts AT the marker bar (the P1 match start, one
          |  -- char past the block's leading newline) and, when a further
          |  -- page follows, ends one char INTO its block (its leading
          |  -- newline) — hence the substr(...,2) and the trailing chr(10)
          |  substr(string_agg(chr(10)||repeat('=',80)||chr(10)||'PAGE '||b.page||chr(10)||
          |    repeat('=',80)||chr(10)||b.body, '' ORDER BY b.page), 2)||
          |  (CASE WHEN m.end_page < dd.mx THEN chr(10) ELSE '' END) AS chunk
          |  FROM ml m JOIN dom dd ON dd.k=m.k
          |  JOIN b0 b ON b.k=m.k AND b.page BETWEEN m.start_page AND m.end_page
          |  WHERE m.end_char > m.start_char
          |  GROUP BY m.k, m.idx, m.start_page, m.end_page, dd.mx),
          |sec AS (SELECT k, string_agg(
          |    chr(10)||chr(10)||repeat('=',80)||chr(10)||'[Match '||idx||'] Page '||start_page||
          |    chr(10)||repeat('=',80)||chr(10)||chr(10)||chunk, '' ORDER BY idx) AS content
          |  FROM chunks GROUP BY k)
          |SELECT k, cov AS coverage, content,
          |  coalesce(array_to_string(list_filter(
          |    CASE WHEN cov='GL' THEN ['limit','aggregate','occurrence']
          |         ELSE ['building','property','coverage'] END,
          |    x -> contains(lower(content), x)), ','), '') AS found_kw
          |FROM sec, unnest(['GL','PROPERTY']) AS t(cov)""".stripMargin,

      // P1 replayed arithmetically: each rendered chunk is a fixed-width
      // marker (169 chars + page digits, incl. its leading newline) plus the
      // body; a boundary starts at its first marker's '=' bar (cum+1) and
      // ends at the next distinct page's bar (duplicate pages extend the
      // first occurrence), the last at the document end.
      "p1_boundaries" ->
        """WITH li AS (SELECT l_orderkey AS k, l_linenumber AS page,
          |  'item page '||l_linenumber||' of order '||l_orderkey AS body FROM lineitem),
          |c AS (SELECT k, page, 169 + length(page::VARCHAR) + length(body) AS clen FROM li),
          |g AS (SELECT k, page, sum(clen) AS chunk FROM c GROUP BY 1, 2),
          |pos AS (SELECT k, page, chunk,
          |  coalesce(sum(chunk) OVER (PARTITION BY k ORDER BY page
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum,
          |  sum(chunk) OVER (PARTITION BY k) AS total FROM g)
          |SELECT k, page::BIGINT AS page, (cum + 1)::BIGINT AS start,
          |  coalesce(lead(cum + 1) OVER (PARTITION BY k ORDER BY page), total)::BIGINT AS "end"
          |FROM pos""".stripMargin,

      // P3 replayed arithmetically: marker kept inside the chunk (168 chars
      // + digits from the '=' bar), plus the body, plus the next chunk's
      // leading newline except for the last chunk; every marker (duplicate
      // pages included) emits its own chunk; page-0 preamble is
      // 'preamble text\n' + the first marker's leading newline = 15 chars.
      "p3_split" ->
        """WITH li AS (SELECT l_orderkey AS k, l_linenumber AS page,
          |  'line '||l_linenumber AS body FROM lineitem),
          |c AS (SELECT k, page, 168 + length(page::VARCHAR) + length(body) AS base FROM li),
          |r AS (SELECT k, page, base,
          |  row_number() OVER (PARTITION BY k ORDER BY page) AS rn,
          |  count(*) OVER (PARTITION BY k) AS n FROM c)
          |SELECT k, page::BIGINT AS page,
          |  (base + CASE WHEN rn = n THEN 0 ELSE 1 END)::BIGINT AS chunk_len FROM r
          |UNION ALL
          |SELECT DISTINCT l_orderkey AS k, 0::BIGINT AS page, 15::BIGINT AS chunk_len
          |FROM lineitem""".stripMargin,

      "j6_name_variation" ->
        """WITH t AS (SELECT c_custkey, upper(c_name) AS name FROM customer),
          |nn AS (SELECT c_custkey, name,
          |  CASE WHEN c_custkey%3=0 THEN replace(name,'O','0')
          |       WHEN c_custkey%3=1 THEN replace(name,'I','1')
          |       ELSE name||'X' END AS noisy FROM t),
          |s AS (SELECT c_custkey, name, noisy,
          |  replace(replace(replace(replace(replace(replace(name,
          |    ' LLC',''),' INC',''),' CORP',''),' L.L.C.',''),' I.N.C.',''),' CORP.','') AS n1,
          |  replace(replace(replace(replace(replace(replace(noisy,
          |    ' LLC',''),' INC',''),' CORP',''),' L.L.C.',''),' I.N.C.',''),' CORP.','') AS n2
          |  FROM nn)
          |SELECT c_custkey, name, noisy,
          |  CASE WHEN length(n1)=length(n2) AND length(n1)>5 AND
          |      len(list_filter(range(length(n1)),
          |        i -> substring(n1,(i+1)::INT,1) <> substring(n2,(i+1)::INT,1))) <= 2
          |    THEN true
          |  WHEN length(n1)>8 AND length(n2)>8 AND len(list_filter(
          |      [n1, replace(n1,'G','H'), replace(n1,'H','G'), replace(n1,'O','0'),
          |       replace(n1,'0','O'), replace(n1,'I','1'), replace(n1,'1','I')],
          |      a -> list_contains(
          |        [n2, replace(n2,'G','H'), replace(n2,'H','G'), replace(n2,'O','0'),
          |         replace(n2,'0','O'), replace(n2,'I','1'), replace(n2,'1','I')], a))) > 0
          |    THEN true ELSE false END AS is_variation
          |FROM s""".stripMargin)
  }
}
