package graft.dedup

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {
  import Dedup._
  import spark.implicits._

  val base = "the quick brown fox jumps over the lazy dog near the river bank today"
  val nearDup = base.replace("today", "tonight") // 1 token differs
  val unrelated = "completely different content about insurance policies and coverage limits"

  val docs = Seq(
    (1L, base),
    (2L, "The  Quick brown fox jumps over the lazy dog near the river bank today"), // exact after norm
    (3L, nearDup),
    (4L, unrelated),
    (5L, base)) // exact duplicate verbatim

  test("exact dedup groups normalized-identical docs, min id canonical") {
    val got = exactDuplicates(docs.toDF("id", "text"), "id", "text")
      .select("id", "canonical_id", "group_size", "is_duplicate")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got.map(r => (r._1, r._2, r._3, r._4)).toSeq == Seq(
      (1L, 1L, 3L, false), (2L, 1L, 3L, true), (3L, 3L, 1L, false),
      (4L, 4L, 1L, false), (5L, 1L, 3L, true)))
  }

  test("winnowing: DF ≡ pure, guarantee on shared spans, short docs empty") {
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val a = "intro words here " + shared + " closing remarks"
    val b = "totally different opener " + shared + " other ending text"
    val c = "no overlap with anything else at all whatsoever truly"
    val rows = Seq(1L -> a, 2L -> b, 3L -> c, 4L -> "too short")
    val got = winnowFingerprints(rows.toDF("id", "text"), "id", "text", 3, 4)
      .as[(Long, Long)].collect().groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    for ((id, text) <- rows) {
      assert(got.getOrElse(id, Set.empty[Long]) == winnow(text, 3, 4), s"doc $id")
    }
    // winnowing guarantee: a shared 12-token span (≥ w+n-1 = 6) must
    // surface at least one common fingerprint; unrelated docs share none
    assert(got(1L).intersect(got(2L)).nonEmpty)
    assert(got(1L).intersect(got(3L)).isEmpty)
    assert(!got.contains(4L)) // 2 tokens < n
    // sampling actually compresses: fewer fps than k-gram positions
    assert(got(1L).size < graft.text.TextAnalysis.tokens(a).size - 2)
  }

  test("winnow overlap pairs: shared spans pair up, maxDf kills boilerplate fps") {
    val span = "one two three four five six seven eight nine ten"
    val rows = Seq(
      1L -> s"alpha opener $span alpha closer",
      2L -> s"beta start $span beta finish",
      3L -> "nothing in common with the others truly at all here",
      4L -> s"gamma lead $span gamma tail")
    val got = winnowOverlapPairs(rows.toDF("id", "text"), "id", "text", 3, 4)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    assert(got == Set((1L, 2L), (1L, 4L), (2L, 4L))) // 3 pairs among the span-sharers
    // shared counts replay from the pure fingerprint sets
    val fps = rows.toMap.view.mapValues(winnow(_, 3, 4)).toMap
    val df2 = winnowOverlapPairs(rows.toDF("id", "text"), "id", "text", 3, 4)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    for (((a, b), nShared) <- df2)
      assert(nShared == fps(a).intersect(fps(b)).size.toLong, s"pair ($a,$b)")
    // a maxDf of 2 drops fingerprints shared by all three span docs
    val capped = winnowOverlapPairs(rows.toDF("id", "text"), "id", "text",
      3, 4, minShared = 1, maxDf = 2)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(capped.keySet.subsetOf(got))
    // every capped count is <= the uncapped count for the same pair
    for ((pair, nShared) <- capped) assert(nShared <= df2(pair), s"$pair")
  }

  test("shingles: distinct word n-grams") {
    assert(shingles("a b c d", 3) == Seq("a b c", "b c d"))
    assert(shingles("a b", 3).isEmpty)
    assert(shingles("a a a a", 2) == Seq("a a")) // distinct
    val got = Seq("a b c d").toDF("t")
      .select(shinglesCol(graft.text.TextAnalysis.tokensCol(col("t")), 3)).as[Seq[String]]
      .collect()(0)
    assert(got == shingles("a b c d", 3))
  }

  test("n-gram jaccard pairs find near-dups above threshold") {
    val got = jaccardPairs(docs.toDF("id", "text"), "id", "text", n = 3, minJ = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    // 1-2-5 identical (jaccard 1.0); 1-3 high; 4 isolated
    assert(got.map(p => (p._1, p._2)) ==
      Set((1L, 2L), (1L, 5L), (2L, 5L), (1L, 3L), (2L, 3L), (3L, 5L)))
    assert(got.filter(p => Set((1L, 2L), (1L, 5L), (2L, 5L)).contains((p._1, p._2)))
      .forall(_._3 == 1.0))
    val j13 = got.find(p => (p._1, p._2) == ((1L, 3L))).get._3
    assert(j13 == jaccard(base, nearDup, 3))
    assert(j13 > 0.5 && j13 < 1.0)
  }

  test("minhash signature/band keys: pure and Column forms agree") {
    val df = docs.toDF("id", "text")
    val got = df.select(col("id"),
      minhashSignatureCol(graft.text.TextAnalysis.tokensCol(col("text")), 3, 16).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    for ((id, text) <- docs) {
      assert(got(id) == minhashSignature(text, 3, 16), s"sig for doc $id")
    }
    val sig = got(1L)
    val keys = Seq(sig).toDF("sig").select(lshBandKeysCol(col("sig"), 4, 4))
      .as[Seq[Long]].collect()(0)
    assert(keys == lshBandKeys(sig, 4, 4))
  }

  test("minhash LSH duplicates: catches identical and near-dup, skips unrelated") {
    val got = minhashDuplicates(docs.toDF("id", "text"), "id", "text",
      n = 3, k = 32, bands = 8, minJ = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val pairs = got.map(p => (p._1, p._2))
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 5L)) && pairs.contains((2L, 5L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    // verified jaccard values match the exact computation
    for ((a, b, j) <- got)
      assert(j == jaccard(docs.toMap.apply(a), docs.toMap.apply(b), 3), s"pair $a-$b")
  }

  test("incremental minhash ≡ batch restricted to new-touching pairs") {
    // richer randomized corpus: duplicates and near-dups scattered across
    // both parity halves, so old×new AND new×new candidates both occur
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    def doc(seed: Int): String =
      (0 until 12).map(i => words(((seed * 7 + i * 3) ^ (i * seed)) % 10)).mkString(" ")
    val corpus = (1L to 40L).map(i => (i, doc((i % 11).toInt))) // forced collisions
    val df = corpus.toDF("id", "text")
    val old = df.filter($"id" % 2 === 0)
    val nw = df.filter($"id" % 2 === 1)
    val oldBands = minhashBandRows(old, "id", "text", 3, 32, 8)
    val inc = minhashIncrementalDuplicates(oldBands, old, nw, "id", "text",
      n = 3, k = 32, bands = 8, minJ = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val batch = minhashDuplicates(df, "id", "text", n = 3, k = 32, bands = 8,
      minJ = 0.5).as[(Long, Long, Double)].collect().toSet
      .filter(p => p._1 % 2 == 1 || p._2 % 2 == 1)
    assert(inc == batch)
    assert(inc.exists(p => p._1 % 2 == 0 || p._2 % 2 == 0), "no old×new pair hit")
    assert(inc.exists(p => p._1 % 2 == 1 && p._2 % 2 == 1), "no new×new pair hit")
    // the invariant also holds under a live maxBucket cap (union counts)
    val incCap = minhashIncrementalDuplicates(oldBands, old, nw, "id", "text",
      n = 3, k = 32, bands = 8, minJ = 0.5, maxBucket = 3)
      .as[(Long, Long, Double)].collect().toSet
    val batchCap = minhashDuplicates(df, "id", "text", n = 3, k = 32, bands = 8,
      minJ = 0.5, maxBucket = 3).as[(Long, Long, Double)].collect().toSet
      .filter(p => p._1 % 2 == 1 || p._2 % 2 == 1)
    assert(incCap == batchCap)
    assert(incCap != inc, "cap did not fire — corpus too tame to test it")
  }

  test("simhash: pure and Column forms agree; near-dups are close in Hamming") {
    val df = docs.toDF("id", "text")
    val got = df.select(col("id"),
      simhash32Col(graft.text.TextAnalysis.tokensCol(col("text"))).as("fp"))
      .as[(Long, Long)].collect().toMap
    for ((id, text) <- docs) assert(got(id) == simhash32(text), s"fp for doc $id")
    assert(got(1L) == got(2L)) // same tokens → same fingerprint
    assert(hamming(got(1L), got(3L)) < hamming(got(1L), got(4L)))
  }

  test("maxDf cap drops hot shingles from candidate generation") {
    // 'the quick brown' appears in docs 1,2,3,5 (df=4); cap at 3 removes it
    val rows = Dedup.shingleRows(docs.toDF("id", "text"), "id", "text", 3, maxDf = 3)
    val hot = graft.text.TextAnalysis.hash60("the quick brown")
    assert(!rows.select("sh").as[Long].collect().contains(hot))
    // uncapped keeps it
    val all = Dedup.shingleRows(docs.toDF("id", "text"), "id", "text", 3)
    assert(all.select("sh").as[Long].collect().contains(hot))
  }

  test("typed production paths produce identical values to Column forms") {
    import org.apache.spark.sql.functions.col
    val df = docs.toDF("id", "text")
    // signatures
    val typed = Dedup.minhashSignaturesTyped(df, "id", "text", 3, 16)
      .as[(Long, Seq[Long])].collect().toMap
    for ((id, text) <- docs if shingles(text, 3).nonEmpty)
      assert(typed(id) == minhashSignature(text, 3, 16), s"typed sig for $id")
    // band rows
    val bands = Dedup.minhashBandRows(df, "id", "text", 3, 16, 4)
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    for ((id, text) <- docs if shingles(text, 3).nonEmpty)
      assert(bands(id) == lshBandKeys(minhashSignature(text, 3, 16), 4, 4), s"bands for $id")
    // simhash fingerprints, id type preserved
    val fps = Dedup.simhashFingerprints(df, "id", "text")
    assert(fps.schema("id").dataType == org.apache.spark.sql.types.LongType)
    val fpm = fps.as[(Long, Long)].collect().toMap
    for ((id, text) <- docs) assert(fpm(id) == simhash32(text), s"typed fp for $id")
  }

  test("simhash duplicate pairs by banded Hamming join") {
    val got = simhashDuplicates(docs.toDF("id", "text"), "id", "text", maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    val pairs = got.map(p => (p._1, p._2))
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 5L)))
    assert(got.find(p => (p._1, p._2) == ((1L, 2L))).get._3 == 0)
    // 4 byte-bands only guarantee recall to Hamming 3 — larger radii rejected
    intercept[IllegalArgumentException] {
      simhashDuplicates(docs.toDF("id", "text"), "id", "text", maxHamming = 6)
    }
  }

  test("minhash skew caps: viral shingle and hot band bounded, dups still found") {
    // one viral 3-gram ("viral spam token") shared by every doc; docs 1,2
    // identical; doc 3 a near-dup of them; doc 4 unrelated
    val viral = " viral spam token"
    val skewed = Seq(
      (1L, base + viral), (2L, base + viral),
      (3L, nearDup + viral),
      (4L, "totally disjoint text about gardens and weather patterns" + viral))
    // uncapped: viral shingle present in the verify relation for all 4 docs
    val hot = graft.text.TextAnalysis.hash60("viral spam token")
    val all = Dedup.shingleRows(skewed.toDF("id", "text"), "id", "text", 3)
    assert(all.filter(col("sh") === hot).count() == 4)
    // maxDf threads through the verify path (jaccard computed over the
    // capped shingle sets); maxBucket drops any all-docs band bucket
    val got = minhashDuplicates(skewed.toDF("id", "text"), "id", "text",
      n = 3, k = 32, bands = 8, minJ = 0.3, maxDf = 3, maxBucket = 3)
      .as[(Long, Long, Double)].collect().toSet
    val pairs = got.map(p => (p._1, p._2))
    assert(pairs.contains((1L, 2L)), s"clone pair must survive the caps: $pairs")
    assert(!pairs.exists(p => p._2 == 4L || p._1 == 4L), s"unrelated doc must not pair: $pairs")
    // expected jaccards over shingle sets with df > 3 removed (pure replay)
    val shSets = skewed.map { case (id, t) => id -> shingles(t, 3).toSet }.toMap
    val dfOf = shSets.values.flatten.toSeq.groupBy(identity).view.mapValues(_.size).toMap
    def capped(id: Long): Set[String] = shSets(id).filter(s => dfOf(s) <= 3)
    def jac(a: Set[String], b: Set[String]): Double = {
      val c = (a intersect b).size.toDouble
      BigDecimal(c / (a.size + b.size - c)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got.find(p => (p._1, p._2) == ((1L, 2L))).get._3 == 1.0)
    val j13 = got.find(p => (p._1, p._2) == ((1L, 3L))).get._3
    assert(j13 == jac(capped(1L), capped(3L)), "verify-path jaccard must use the maxDf-capped sets")
    // and the capped value differs from the uncapped one (the lever is live)
    assert(j13 != jac(shSets(1L), shSets(3L)))
  }

  test("simhash maxBucket caps the fp=0 empty-doc band without losing real dups") {
    // corpus-scale failure mode: every empty/near-empty doc fingerprints to
    // fp=0, so all its 4 band keys collide → one O(n²) band bucket. The cap
    // must drop those buckets while identical non-empty docs still pair.
    val skewed = (1L to 40L).map(i => (i, "")) ++
      Seq((100L, base), (101L, base), (102L, nearDup))
    assert(simhash32("") == 0L)
    // uncapped: the 40 empty docs alone produce 40*39/2 = 780 pairs
    val uncapped = simhashDuplicates(skewed.toDF("id", "text"), "id", "text")
      .as[(Long, Long, Int)].collect().toSet
    assert(uncapped.count(p => p._1 <= 40L && p._2 <= 40L) == 780)
    // capped: the four fp=0 band buckets hold all 40 empty docs each →
    // dropped; the base/nearDup docs pair through their own small buckets
    val capped = simhashDuplicates(skewed.toDF("id", "text"), "id", "text",
      maxHamming = 3, maxBucket = 8)
      .as[(Long, Long, Int)].collect().toSet
    assert(!capped.exists(p => p._1 <= 40L && p._2 <= 40L),
      s"empty-doc quadratic pairs must be dropped: $capped")
    assert(capped.map(p => (p._1, p._2)).contains((100L, 101L)),
      s"identical non-empty docs must still pair: $capped")
    spark.catalog.clearCache() // simhashDuplicates persists its band relation
  }
  test("connected components: min-label fixpoint over chains, cliques, singletons") {
    // components: chain 1-2-3-4 (diameter 3), clique {10,11,12}, pair {20,21}
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("id_a", "id_b")
    val cc = connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
    spark.catalog.clearCache()
    // not-converged is an error, not a partial result: diameter-3 chain
    // cannot settle in 1 round (vertex 4 needs label 1 to travel 3 hops)
    val e = intercept[IllegalArgumentException] {
      connectedComponents(pairs, "id_a", "id_b", maxIters = 1)
    }
    assert(e.getMessage.contains("not converged"))
    spark.catalog.clearCache()
  }

  test("alternating CC: same labels as min-label, O(log) rounds on chains") {
    // the min-label battery verbatim: chain, clique, pair
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L), (30L, 30L)).toDF("id_a", "id_b")
    val alt = connectedComponentsAlternating(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(alt == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L,
      30L -> 30L)) // self-pair-only node labels itself
    spark.catalog.clearCache()

    // diameter-59 chain: min-label needs 59 rounds, alternating must
    // contract it onto node 1 within 12 star rounds (the whole point)
    val chain = (1L until 60L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = connectedComponentsAlternating(chain, "id_a", "id_b", maxIters = 12)
      .as[(Long, Long)].collect()
    assert(got.length == 60 && got.forall(_._2 == 1L), got.take(5).toSeq.toString)
    spark.catalog.clearCache()

    val e = intercept[IllegalArgumentException] {
      connectedComponentsAlternating(chain, "id_a", "id_b", maxIters = 1)
    }
    assert(e.getMessage.contains("not converged"))
    spark.catalog.clearCache()
  }

  test("alternating CC ≡ min-label propagation on randomized graphs") {
    // deterministic pseudo-random edge sets (md5-derived — no RNG): across
    // densities the two independent algorithms must produce identical
    // labelings, including isolated self-pairs and string-typed ids
    def h(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(7).map("%02x".format(_)).mkString, 16)
    for (density <- Seq(20, 60, 140)) {
      val edges = (1 to density).map { i =>
        (h(s"a$density-$i") % 50, h(s"b$density-$i") % 50)
      }.toDF("id_a", "id_b")
      val viaMinLabel = connectedComponents(edges, "id_a", "id_b")
        .as[(Long, Long)].collect().toMap
      val viaStars = connectedComponentsAlternating(edges, "id_a", "id_b")
        .as[(Long, Long)].collect().toMap
      assert(viaStars == viaMinLabel, s"density=$density")
      spark.catalog.clearCache()
    }
    // string ids order lexicographically in both implementations
    val sp = Seq(("doc-b", "doc-a"), ("doc-b", "doc-c"), ("x", "x"))
      .toDF("id_a", "id_b")
    val s1 = connectedComponents(sp, "id_a", "id_b").as[(String, String)].collect().toMap
    val s2 = connectedComponentsAlternating(sp, "id_a", "id_b")
      .as[(String, String)].collect().toMap
    assert(s2 == s1 && s2("doc-c") == "doc-a" && s2("x") == "x")
    spark.catalog.clearCache()
  }

  test("line dedup: strips corpus-hot lines, keeps unique bodies in order") {
    // chrome on every doc (hot at maxOcc=2), body unique, one shared-by-2
    // line that must survive the cap exactly
    val mk: Long => String = i =>
      s"NAV BAR\nbody unique $i\n${if (i <= 2) "shared pair line" else s"tail $i"}\nfooter"
    val rows = (1L to 5L).map(i => (i, mk(i)))
    val got = dedupLines(rows.toDF("doc_id", "text"), "doc_id", "text", 2)
      .select("doc_id", "n_lines", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == dedupLinesPure(rows, 2))
    // NAV BAR + footer (5 occurrences) removed; "shared pair line" (2) kept
    assert(got.head == ((1L, 4L, 2L, "body unique 1\nshared pair line")))
    assert(got(3) == ((4L, 4L, 2L, "body unique 4\ntail 4")))
    // normalization: case/whitespace variants of a line count together
    val v = Seq((1L, "The Nav\nbody a"), (2L, "  the   nav \nbody b"), (3L, "THE NAV\nbody c"))
    val got2 = dedupLines(v.toDF("doc_id", "text"), "doc_id", "text", 2)
      .select("doc_id", "clean_text").as[(Long, String)].collect().sortBy(_._1)
    assert(got2.map(_._2).toSeq == Seq("body a", "body b", "body c"))
    assert(got2.toSeq == dedupLinesPure(v, 2).map(r => (r._1, r._4)))
  }

  test("contamination: per-doc benchmark overlap; broadcast default, shuffle fallback") {
    val corpusRows = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox sat very still"),
      (3L, "completely different words entirely here now"),
      (4L, "ab")) // < 3 tokens: no shingles, trivially clean
    val corpus = corpusRows.toDF("doc_id", "text")
    val bench = Seq("the quick brown fox jumps high").toDF("text")
    // doc 1 overlaps 3/7 shingles (0.428…), doc 2 exactly 2/5 (0.4): the
    // 0.42 threshold puts them on opposite sides of the gate
    val minOv = 0.42
    val got = contamination(corpus, "doc_id", "text", bench, "text",
      n = 3, minOverlap = minOv)
      .select("doc_id", "n_shingles", "n_hits", "overlap_ratio", "is_contaminated")
      .as[(Long, Long, Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    // expected from the pure shingle twin
    val benchSh = shingles("the quick brown fox jumps high", 3).toSet
    val exp = corpusRows.map { case (id, t) =>
      val sh = shingles(t, 3).toSet
      val hits = sh.count(benchSh).toLong
      val ratio = if (sh.isEmpty) 0.0
        else BigDecimal(hits.toDouble / sh.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, sh.size.toLong, hits, ratio, ratio >= minOv)
    }
    assert(got == exp)
    assert(got.map(r => r._1 -> r._5).toMap ==
      Map(1L -> true, 2L -> false, 3L -> false, 4L -> false))
    // plan: benchmark side broadcast by default even with auto-broadcast
    // off (explicit hint); with broadcastBench=false, zero broadcasts
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val pB = contamination(corpus, "doc_id", "text", bench, "text", 3, minOv)
        .queryExecution.executedPlan.toString
      assert(pB.contains("BroadcastExchange"), pB)
      val pS = contamination(corpus, "doc_id", "text", bench, "text", 3, minOv,
        broadcastBench = false).queryExecution.executedPlan.toString
      assert(!pS.contains("BroadcastExchange"), pS)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("canonicalize tags every doc; singletons are their own canonical") {
    val docs = (1L to 6L).map(i => (i, s"doc$i")).toDF("doc_id", "payload")
    val pairs = Seq((1L, 2L), (2L, 5L)).toDF("id_a", "id_b")
    val got = canonicalize(docs, "doc_id", pairs)
      .select("doc_id", "cluster_id", "is_canonical")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 1L, true), (2L, 1L, false), (3L, 3L, true),
      (4L, 4L, true), (5L, 1L, false), (6L, 6L, true)))
    spark.catalog.clearCache()
  }

  test("canonicalizeByScore: highest score survives, ties fall to min id") {
    val docs = Seq((1L, 10L), (2L, 30L), (3L, 7L), (4L, 7L), (5L, 30L), (6L, 1L))
      .toDF("doc_id", "score")
    // cluster {1,2,5}: max score 30 tied between 2 and 5 → 2 wins;
    // cluster {3,4}: equal scores → min id 3 wins; 6 is a singleton
    val pairs = Seq((1L, 2L), (2L, 5L), (3L, 4L)).toDF("id_a", "id_b")
    val got = canonicalizeByScore(docs, "doc_id", "score", pairs)
      .select("doc_id", "cluster_id", "is_canonical")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 1L, false), (2L, 1L, true), (3L, 3L, true),
      (4L, 3L, false), (5L, 1L, false), (6L, 6L, true)))
    // exactly one canonical per cluster
    val perCluster = got.groupBy(_._2).view.mapValues(_.count(_._3)).toMap
    assert(perCluster.values.forall(_ == 1))
    spark.catalog.clearCache()
  }

  test("substring dedup: duplicated k-token spans stripped to one canonical copy") {
    val shared = "standard legal disclaimer all liability limited to amounts stated"
    val corpus = Seq(
      (1L, s"unique opening for doc one $shared and a unique tail one"),
      (2L, s"another different beginning here $shared plus other words two"),
      (3L, s"third document text starts now $shared closing remarks three"),
      (4L, "no shared content in this document at all just words"),
      (5L, "tiny doc"), // shorter than k — no k-grams, untouched
      (6L, ""))         // token-less — must still get an output row
    val got = dedupSubstrings(corpus.toDF("id", "text"), "id", "text", k = 5)
      .select("id", "n_tokens", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    // bit-for-bit parity with the pure twin
    assert(got == dedupSubstringsPure(corpus, k = 5, maxOccurrences = 1).sortBy(_._1))
    // the shared 9-token span is stripped from 2 of the 3 docs carrying it
    val strippedDocs = got.filter(r => r._1 <= 3 && r._2 > r._4.split(" ").length)
    assert(strippedDocs.length == 2)
    assert(strippedDocs.forall(r => !r._4.contains("disclaimer")))
    // exactly one doc keeps the canonical copy intact
    assert(got.count(r => r._1 <= 3 && r._4.contains(shared)) == 1)
    // untouched docs: nothing removed, text = space-joined tokens
    assert(got.find(_._1 == 4L).get._3 == 0)
    assert(got.find(_._1 == 5L).get == ((5L, 2L, 0L, "tiny doc")))
    assert(got.find(_._1 == 6L).get == ((6L, 0L, 0L, "")))
    // deterministic rerun
    val rerun = dedupSubstrings(corpus.toDF("id", "text"), "id", "text", k = 5)
      .select("id", "n_tokens", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(rerun == got)
    graft.io.Persisted.release(spark)
  }

  test("substring dedup: maxOccurrences tolerates repeats up to the cap") {
    val span = "alpha beta gamma delta epsilon"
    val corpus = (1L to 4L).map(i => (i, s"doc number $i has $span inside"))
    // cap 4: the span occurs 4 times ≤ 4 → nothing stripped
    val loose = dedupSubstringsPure(corpus, k = 5, maxOccurrences = 4)
    assert(loose.forall(_._3 == 0))
    val looseDf = dedupSubstrings(corpus.toDF("id", "text"), "id", "text",
        k = 5, maxOccurrences = 4)
      .select("id", "n_tokens", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(looseDf == loose.sortBy(_._1))
    // cap 1: stripped everywhere but the canonical occurrence
    val strict = dedupSubstrings(corpus.toDF("id", "text"), "id", "text",
        k = 5, maxOccurrences = 1)
      .select("id", "n_removed").as[(Long, Long)].collect()
    assert(strict.count(_._2 > 0) == 3)
    graft.io.Persisted.release(spark)
  }

  test("novelty score: cross-doc shared spans lower it, in-doc repetition does not") {
    val boiler = "all rights reserved contact us for terms of service today"
    val docs = Seq(
      (1L, s"alpha beta gamma delta epsilon zeta $boiler"),
      (2L, s"one two three four five six seven $boiler"),
      // in-doc repetition of a 10-token span, but unique to this doc
      (3L, "red blue green yellow purple orange pink " * 3),
      (4L, "entirely unique words nowhere else repeated in this corpus at all"),
      (5L, "short doc")) // < k tokens -> fully novel by contract
    val got = Dedup.noveltyScore(docs.toDF("id", "text"), "id", "text", k = 8)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val pure = Dedup.noveltyScorePure(docs, 8).map(r => r._1 -> r).toMap
    assert(got == pure)
    // docs 1 and 2 share the boilerplate k-grams -> partially novel
    assert(got(1L)._3 > 0 && got(1L)._4 < 1000L)
    assert(got(2L)._3 > 0 && got(2L)._4 < 1000L)
    // in-doc repetition alone stays fully novel
    assert(got(3L)._3 == 0 && got(3L)._4 == 1000L)
    assert(got(4L)._4 == 1000L)
    assert(got(5L) == ((5L, 0L, 0L, 1000L)))
    graft.io.Persisted.release(spark)
  }

  test("containment pairs: partial mirror scores ~1000 where jaccard stays low") {
    val small = "alpha beta gamma delta epsilon zeta eta theta"
    val big = small + " " + (1 to 60).map(i => s"word$i").mkString(" ")
    val docs = Seq(1L -> big, 2L -> small, 3L -> "totally unrelated content here today")
    val got = Dedup.containmentPairs(docs.toDF("id", "text"), "id", "text",
      n = 3, minMilli = 800)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == 1)
    val (ia, ib, common, szA, szB, ca, cb) = got.head
    assert((ia, ib) == ((1L, 2L)))
    // every shingle of the small doc is inside the big one
    assert(cb == 1000L && common == szB && ca < 200L)
    val (pa, pb) = Dedup.containment(big, small, 3)
    assert((ca, cb) == ((pa, pb)))
    // jaccard would have missed this pair entirely at any useful threshold
    assert(Dedup.jaccard(big, small, 3) < 0.12)
    graft.io.Persisted.release(spark)
  }

  test("containment pairs: partitioning invariance and maxDf cap") {
    val shared = "the common quoted passage appears here verbatim"
    val docs = (0L until 20L).map { i =>
      val unique = (0 until 12).map(j => s"u${i}t$j").mkString(" ")
      (i, if (i % 4 == 0) s"$shared $unique" else unique)
    }
    val exp = Dedup.containmentPairs(docs.toDF("id", "text"), "id", "text",
      n = 3, minMilli = 250)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    graft.io.Persisted.release(spark)
    assert(exp.nonEmpty && exp.forall { case (a, b, _, _, _, _, _) =>
      a % 4 == 0 && b % 4 == 0 })
    val got = Dedup.containmentPairs(docs.toDF("id", "text").repartition(7),
      "id", "text", n = 3, minMilli = 250)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == exp)
    graft.io.Persisted.release(spark)
    // the shared passage's shingles occur in 5 docs; maxDf=4 kills them all
    val capped = Dedup.containmentPairs(docs.toDF("id", "text"), "id", "text",
      n = 3, minMilli = 300, maxDf = 4).count()
    assert(capped == 0)
    graft.io.Persisted.release(spark)
    intercept[IllegalArgumentException](
      Dedup.containmentPairs(docs.toDF("id", "text"), "id", "text", 3, 1001))
  }

  test("novelty score: partitioning invariance and exact milli arithmetic") {
    val docs = (0L until 30L).map { i =>
      val shared = "the quick brown fox jumps over the lazy dog again"
      val unique = (0 until 10).map(j => s"u${i}w$j").mkString(" ")
      (i, if (i % 3 == 0) s"$shared $unique" else unique)
    }
    val expected = Dedup.noveltyScorePure(docs, 4).toSet
    for (p <- Seq(1, 7)) {
      val got = Dedup.noveltyScore(
        docs.toDF("id", "text").repartition(p), "id", "text", k = 4)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == expected, s"parts=$p")
      graft.io.Persisted.release(spark)
    }
  }

  test("bbitMinhashPairs: compression, estimator correction, cap") {
    import org.apache.spark.sql.functions._
    // exact duplicates + one unrelated doc
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally different words entirely here now")).toDF("doc_id", "text")
    val got = Dedup.bbitMinhashPairs(docs, "doc_id", "text", n = 3, k = 4, b = 8)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // the exact-dup pair matches all 4 components in both widths, and the
    // corrected estimate is exactly 1000 milli
    val dup = got((1L, 2L))
    assert(dup._3 == 4L && dup._5 == 4L)
    assert(dup._4 == 1000L && dup._6 == 1000L)
    assert(dup._4 == Dedup.bbitEstimateMilli(4, 4, 8))
    // estimator correction: m of k at b bits under-shoots the naive m/k
    assert(Dedup.bbitEstimateMilli(1, 4, 8) == 247L) // (0.25-2^-8)/(1-2^-8)
    assert(Dedup.bbitEstimateMilli(0, 4, 8) == 0L)   // clamped
    // cap: a bucket above maxBucket drops whole
    val many = (1L to 40L).map(i => (i, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    assert(Dedup.bbitMinhashPairs(many, "doc_id", "text", 3, 4, 8,
      maxBucket = 10).count() == 0)
    intercept[IllegalArgumentException](
      Dedup.bbitMinhashPairs(docs, "doc_id", "text", 3, 4, b = 0))
  }

  test("simhashIdfFingerprints: idf voting, ubiquitous-token immunity") {
    import org.apache.spark.sql.functions._
    // 'common' appears in every doc -> idf 0 -> cannot move any bit;
    // docs 1 and 2 differ ONLY in ubiquitous tokens
    val corpus = Seq(
      (1L, "common alpha bravo charlie"),
      (2L, "common common alpha bravo charlie"),
      (3L, "common delta echo foxtrot"),
      (4L, ""))
    val got = Dedup.simhashIdfFingerprints(
        corpus.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val exp = Dedup.simhashIdfPure(corpus)
    assert(got == exp)
    // zero-weight ubiquity: 1 and 2 fingerprint identically
    assert(got(1L) == got(2L))
    // distinctive content separates
    assert(got(1L) != got(3L))
    // tokenless doc -> fp 0
    assert(got(4L) == 0L)
    // partitioning invariance
    val rep = Dedup.simhashIdfFingerprints(
        corpus.toDF("doc_id", "text").repartition(5), "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(rep == exp)
  }
}
