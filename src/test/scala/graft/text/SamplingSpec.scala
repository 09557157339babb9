package graft.text

import graft.SparkTestBase

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  test("stratified: md5-ranked per-stratum sample matches the pure twin") {
    val lang: Long => String = i => if (i % 3 == 0) "de" else "en"
    val docs = (1L to 40L).map(i => (i, lang(i))).toDF("doc_id", "lang")
    val got = Sampling.stratified(docs, "doc_id", "lang", 0.25)
      .select("doc_id", "lang", "sample_rank", "stratum_n")
      .as[(Long, String, Int, Long)].collect()
    val byLang = (1L to 40L).groupBy(lang)
    val exp = byLang.flatMap { case (l, ids) =>
      Sampling.stratifiedPure(ids.toSeq, 0.25).map(_ -> l)
    }.toSet
    assert(got.map(r => (r._1, r._2)).toSet == exp)
    // ceil(13 * .25)=4 de docs, ceil(27 * .25)=7 en docs
    assert(got.count(_._2 == "de") == 4)
    assert(got.count(_._2 == "en") == 7)
    // ranks are exactly 1..keep within each stratum; stratum_n is the
    // full stratum size, not the kept size
    for ((l, rows) <- got.groupBy(_._2)) {
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
      assert(rows.forall(_._4 == byLang(l).size))
    }
    // frac=1 keeps everything; out-of-range frac rejected
    assert(Sampling.stratified(docs, "doc_id", "lang", 1.0).count() == 40)
    intercept[IllegalArgumentException](
      Sampling.stratified(docs, "doc_id", "lang", 0.0))
  }

  test("prioritySample: pure-twin parity, tau law, under-k exactness, top-k plan") {
    val rows = (1L to 500L).map(i => (i, 1L + (i * 7) % 100)) // ids, weights
    val df = rows.toDF("doc_id", "w")
    val got = Sampling.prioritySample(df, "doc_id", "w", 30)
      .select("doc_id", "priority", "est_weight")
      .as[(Long, Double, Double)].collect().toSeq
    val exp = Sampling.prioritySamplePure(rows, 30)
    assert(got.sortBy(_._1) == exp.sortBy(_._1))
    // estimator law: every kept row's est = max(w, tau) with ONE tau
    val wById = rows.toMap
    val taus = got.collect { case (id, _, est) if est != wById(id).toDouble => est }
    assert(taus.distinct.size <= 1)
    // priorities of kept rows all exceed tau
    if (taus.nonEmpty) assert(got.forall(_._2 >= taus.head))
    // partitioning cannot move the sample
    val rep = Sampling.prioritySample(df.repartition(13), "doc_id", "w", 30)
      .select("doc_id").as[Long].collect().toSet
    assert(rep == got.map(_._1).toSet)
    // k >= n keeps everything with est = w exactly
    val small = Sampling.prioritySample(df.limit(10), "doc_id", "w", 30)
      .select("doc_id", "est_weight").as[(Long, Double)].collect()
    assert(small.length == 10)
    assert(small.forall { case (id, est) => est == wById(id).toDouble })
    // the top-(k+1) cut is a distributed TakeOrderedAndProject, not a
    // global sort
    val plan = Sampling.prioritySample(df, "doc_id", "w", 30)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("hashThreshold: pure-twin parity, zero-shuffle plan, frac=1 keeps all") {
    val docs = (1L to 400L).map(i => (i, s"d$i")).toDF("doc_id", "payload")
    val kept = Sampling.hashThreshold(docs, "doc_id", 0.25)
      .select("doc_id").as[Long].collect().toSet
    val expect = (1L to 400L).filter(Sampling.hashThresholdPure(_, 0.25)).toSet
    assert(kept == expect)
    // binomial around frac·n, never exact by construction — sanity band only
    assert(kept.size > 60 && kept.size < 140, s"got ${kept.size}")
    assert(Sampling.hashThreshold(docs, "doc_id", 1.0).count() == 400)
    // scale shape: a pure filter — no exchange of any kind in the plan
    val plan = Sampling.hashThreshold(docs, "doc_id", 0.25)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    intercept[IllegalArgumentException](
      Sampling.hashThreshold(docs, "doc_id", 1.5))
  }

  test("domainCap: md5-smallest cap per domain; small domains survive whole") {
    val dom: Long => String = i => if (i % 5 == 0) "small.example" else s"big${i % 2}.example"
    val docs = (1L to 100L).map(i => (i, dom(i))).toDF("doc_id", "domain")
    val got = Sampling.domainCap(docs, "doc_id", "domain", 10)
      .select("doc_id", "domain", "domain_rank", "domain_n")
      .as[(Long, String, Int, Long)].collect()
    // small.example has 20 docs (>cap) — every domain is capped to 10 here;
    // check against the pure md5 order per domain
    val byDom = (1L to 100L).groupBy(dom)
    for ((d, ids) <- byDom) {
      val kept = got.filter(_._2 == d)
      assert(kept.length == math.min(10, ids.size))
      assert(kept.map(_._1).toSet == Sampling.stratifiedPure(ids.toSeq, 1.0).take(10).toSet)
      assert(kept.forall(_._4 == ids.size))
      assert(kept.map(_._3).sorted.toSeq == (1 to kept.length))
    }
    // a genuinely small domain survives whole
    val tiny = docs.union(Seq((1000L, "tiny.example"), (1001L, "tiny.example"))
      .toDF("doc_id", "domain"))
    val t = Sampling.domainCap(tiny, "doc_id", "domain", 10)
      .filter($"domain" === "tiny.example").count()
    assert(t == 2)
  }

  test("domainCapScalable: prefilter bounds the window; agrees with exact when slack covers") {
    val dom: Long => String = i => s"d${i % 3}"
    val docs = (1L to 300L).map(i => (i, dom(i))).toDF("doc_id", "domain")
    // slack high enough that the binomial prefilter virtually never
    // under-fills at this size → must agree with the exact baseline
    val exact = Sampling.domainCap(docs, "doc_id", "domain", 5)
      .select("doc_id").as[Long].collect().toSet
    val scal = Sampling.domainCapScalable(docs, "doc_id", "domain", 5, slack = 20)
      .select("doc_id").as[Long].collect().toSet
    assert(scal == exact)
    // with a tight slack the result is still deterministic and ≤ cap per
    // domain, and every kept doc passes the integer prefilter predicate
    val tight = Sampling.domainCapScalable(docs, "doc_id", "domain", 5, slack = 2)
      .select("doc_id", "domain", "domain_n").as[(Long, String, Long)].collect()
    assert(tight.groupBy(_._2).values.forall(_.length <= 5))
    val cut = 5L * 2L * (1L << 32)
    assert(tight.forall { case (id, _, n) =>
      n <= 5 || TextAnalysis.hash32(id.toString) < cut / n })
    // rerun is bit-identical (no RNG anywhere)
    val rerun = Sampling.domainCapScalable(docs, "doc_id", "domain", 5, slack = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(rerun == tight.map(_._1).toSet)
  }

  test("mixtureSample: per-stratum targets, pure-twin parity, corpus never shuffles") {
    val lang: Long => String = i => Seq("en", "de", "fr")((i % 3).toInt)
    val docs = (1L to 600L).map(i => (i, lang(i), s"payload $i")).toDF("doc_id", "lang", "text")
    // en: 200 docs → target 50 (downsample); de: 200 → 500 (kept whole);
    // fr untargeted → dropped entirely
    val targets = Map("en" -> 50L, "de" -> 500L)
    val got = Sampling.mixtureSample(docs, "doc_id", "lang", targets)
      .select("doc_id", "lang", "stratum_n", "stratum_target")
      .as[(Long, String, Long, Long)].collect()
    assert(got.forall(_._2 != "fr"))
    assert(got.count(_._2 == "de") == 200) // under target → whole
    val en = got.filter(_._2 == "en")
    // binomial around 50 with the floor cut biasing low — sanity band
    assert(en.length > 25 && en.length < 75, s"got ${en.length}")
    // every row agrees with the pure keep rule, and no kept row is missing
    val expEn = (1L to 600L).filter(i => lang(i) == "en" &&
      Sampling.mixtureSamplePure(i, 200L, 50L)).toSet
    assert(en.map(_._1).toSet == expEn)
    assert(got.forall(r => r._3 == 200L && targets(r._2) == r._4))
    // plan shape: the only shuffle is the tiny per-stratum count agg — the
    // corpus side reaches the filter through a broadcast join
    val plan = Sampling.mixtureSample(docs, "doc_id", "lang", targets)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    intercept[IllegalArgumentException](
      Sampling.mixtureSample(docs, "doc_id", "lang", Map.empty))
    intercept[IllegalArgumentException](
      Sampling.mixtureSample(docs, "doc_id", "lang", Map("en" -> 0L)))
  }

  test("budgetSelect: exact global cumsum ≡ pure twin across partitionings") {
    import spark.implicits._
    val rows = (0 until 200).map { i =>
      val id = s"d$i"
      val score = (i * 2654435761L) % 50 // heavy score ties → id tie-break
      val cost = (i * 40503L) % 97 + 1
      (id, score, cost)
    }
    val want = Sampling.budgetSelectPure(rows, budget = 3000L)
    assert(want.nonEmpty && want.size < 200) // the budget genuinely cuts
    // the boundary row is exact: adding the next doc would overflow
    val cut = want.last._4
    assert(cut <= 3000L)
    for (parts <- Seq(1, 3, 16)) {
      val got = Sampling.budgetSelect(
        rows.toDF("doc_id", "q", "c").repartition(7),
        "doc_id", "q", "c", budget = 3000L, parts = parts)
        .as[(String, Long, Long, Long)].collect().toSeq
        .sortBy { case (_, sc, _, cum) => (-sc, cum) }
      assert(got == want, s"parts=$parts")
      graft.io.Persisted.release(spark)
    }
  }

  test("budgetSelect survives a downstream coalesce(1) — the sink write path") {
    import spark.implicits._
    // regression: task-scoped partition ids zero every offset when a sink
    // coalesces; the cut must stay identical under coalesce(1)
    val rows = (0 until 200).map { i =>
      (s"d$i", (i * 2654435761L) % 50, (i * 40503L) % 97 + 1)
    }
    val want = Sampling.budgetSelectPure(rows, budget = 3000L).map(_._1).toSet
    val got = Sampling.budgetSelect(
      rows.toDF("doc_id", "q", "c").repartition(7),
      "doc_id", "q", "c", budget = 3000L, parts = 8)
      .coalesce(1)
      .as[(String, Long, Long, Long)].collect()
    assert(got.map(_._1).toSet == want)
    assert(got.map(_._4).max == Sampling.budgetSelectPure(rows, 3000L).last._4)
    graft.io.Persisted.release(spark)
  }

  test("datasetSplit: pure-twin parity, stability under growth, refusals") {
    import spark.implicits._
    val ids = (0 until 500).map(i => s"doc$i")
    val got = Sampling.datasetSplit(ids.toDF("doc_id").repartition(5), "doc_id")
      .as[(String, String)].collect().toMap
    ids.foreach(id => assert(got(id) == Sampling.datasetSplitPure(id), id))
    // all three splits are populated at plausible rates
    val bys = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(bys("train") > 300 && bys("val") > 20 && bys("test") > 20, bys)
    // growth stability: adding docs never moves an existing one
    val grown = Sampling.datasetSplit(
      (ids ++ (500 until 900).map(i => s"doc$i")).toDF("doc_id"), "doc_id")
      .as[(String, String)].collect().toMap
    ids.foreach(id => assert(grown(id) == got(id), id))
    // zero-shuffle plan
    val plan = Sampling.datasetSplit(ids.toDF("doc_id"), "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.replaceAll("RoundRobin", "").contains("Exchange"), plan)
    intercept[IllegalArgumentException](
      Sampling.datasetSplit(ids.toDF("doc_id"), "doc_id", 900, 100))
  }

  test("budgetSelect: zero budget keeps nothing; full budget keeps all") {
    import spark.implicits._
    val df = Seq(("a", 5L, 10L), ("b", 3L, 10L)).toDF("id", "s", "c")
    assert(Sampling.budgetSelect(df, "id", "s", "c", 0L, parts = 2)
      .count() == 0)
    assert(Sampling.budgetSelect(df, "id", "s", "c", 100L, parts = 2)
      .count() == 2)
    intercept[IllegalArgumentException](
      Sampling.budgetSelect(df, "id", "s", "c", -1L))
    graft.io.Persisted.release(spark)
  }

  test("groupReservoir: matches domainCap exactly; partition-invariant; whole small groups") {
    val dom: Long => String =
      i => if (i % 5 == 0) "small.example" else s"big${i % 2}.example"
    val docs = (1L to 300L).map(i => (i, dom(i))).toDF("doc_id", "domain")
    val exact = Sampling.domainCap(docs, "doc_id", "domain", 7)
      .select($"doc_id", $"domain", $"domain_rank".cast("long"), $"domain_n")
      .as[(Long, String, Long, Long)].collect().toSet
    val res = Sampling.groupReservoir(docs, "doc_id", "domain", 7)
      .select($"domain", $"doc_id", $"res_rank", $"group_n")
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._2, r._1, r._3, r._4)).toSet
    assert(res == exact) // same kept ids, ranks, and ORIGINAL group sizes

    // merge correctness: the buffer path must not depend on layout
    val one = Sampling.groupReservoir(docs.repartition(1), "doc_id", "domain", 7)
      .as[(String, Long, Long, Long)].collect().toSet
    val many = Sampling.groupReservoir(docs.repartition(13), "doc_id", "domain", 7)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(one == many)

    // k >= group size keeps the whole group with ranks 1..n
    val whole = Sampling.groupReservoir(docs, "doc_id", "domain", 1000)
      .as[(String, Long, Long, Long)].collect()
    assert(whole.length == 300)
    for ((_, rows) <- whole.groupBy(_._1))
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length))

    // the plan is a partial aggregation, not a window sort
    val plan = Sampling.groupReservoir(docs, "doc_id", "domain", 7)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"expected no window in:\n$plan")
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"),
      s"expected an aggregate in:\n$plan")

    intercept[IllegalArgumentException](
      Sampling.groupReservoir(docs, "doc_id", "domain", 0))
  }

  test("waterFill: exact level, full-keep, zero level, invariance") {
    val doms = Seq(("a", 10L), ("b", 20L), ("c", 30L), ("d", 100L))
    def run(budget: Long, parts: Int = 1) =
      Sampling.waterFill(doms.toDF("domain", "tokens").repartition(parts),
        "domain", "tokens", budget)
        .select("domain", "tokens", "alloc", "capped")
        .as[(String, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    // budget 90: level 30 — giants cut to the level, tail kept whole
    assert(run(90) == Seq(("a", 10L, 10L, false), ("b", 20L, 20L, false),
      ("c", 30L, 30L, false), ("d", 100L, 30L, true)))
    // sum of allocations is exactly the maximal feasible total
    assert(run(90).map(_._3).sum == 90L)
    // budget covers everything -> nothing capped
    assert(run(200).forall(r => r._3 == r._2 && !r._4))
    // tiny budget -> integer level 0, everything capped to 0
    assert(run(3).forall(r => r._3 == 0L))
    // pure-twin parity across partitionings and budgets
    for (b <- Seq(0L, 3L, 55L, 90L, 160L, 200L); parts <- Seq(1, 5)) {
      val got = run(b, parts).map(r => (r._1, r._2, r._3)).toSet
      assert(got == Sampling.waterFillPure(doms, b).toSet, s"b=$b parts=$parts")
    }
    intercept[IllegalArgumentException](
      Sampling.waterFill(doms.toDF("domain", "tokens"), "domain", "tokens", -1))
  }

  test("sqrtTemperatureAlloc: hand shares, conservation, pure-twin parity") {
    // counts {100,25,4,1} -> weights {10,5,2,1}, sum 18; budget 1800
    val rows = Seq.fill(100)("a") ++ Seq.fill(25)("b") ++
      Seq.fill(4)("c") ++ Seq("d")
    val df = rows.zipWithIndex.map { case (d, i) => (i.toLong, d) }
      .toDF("doc_id", "domain")
    val got = Sampling.sqrtTemperatureAlloc(df.repartition(5), "domain", 1800L)
      .select("domain", "n_docs", "weight", "alloc")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      "a" -> ((100L, 10L, 1000L)), "b" -> ((25L, 5L, 500L)),
      "c" -> ((4L, 2L, 200L)), "d" -> ((1L, 1L, 100L))))
    // sqrt flattens: the head's share drops from 100/130 to 10/18
    assert(got("a")._3 * 3 < 1800L * 2)
    // parity + conservation on a lopsided corpus
    val counts = Map("x" -> 7L, "y" -> 50L, "z" -> 2L)
    val df2 = counts.toSeq.flatMap { case (d, n) => (1L to n).map(i => (i, d)) }
      .toDF("doc_id", "domain")
    val exp = Sampling.sqrtTemperatureAllocPure(counts, 999L)
    val got2 = Sampling.sqrtTemperatureAlloc(df2, "domain", 999L)
      .select("domain", "n_docs", "weight", "alloc")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got2 == exp)
    assert(got2.values.map(_._3).sum <= 999L)
    intercept[IllegalArgumentException](
      Sampling.sqrtTemperatureAlloc(df2, "domain", 0L))
  }
}
