package graft.sketch

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  private val K = 32

  test("KmvAggregator ≡ relational twin ≡ pure twin; partitioning-invariant") {
    val rows = (1 to 3000).map { i =>
      val g = if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"
      // group a: ~1000 distinct; group b: only 7 distinct (exact path);
      // group c: heavy duplication, ~200 distinct
      val v = g match {
        case "a" => s"val$i"
        case "b" => s"small${i % 7}"
        case _   => s"mid${i % 200}"
      }
      (g, v)
    }
    val df = rows.toDF("g", "v")
    val agg = Sketches.kmvDistinct(df, Seq("g"), "v", K)
      .as[(String, Long)].collect().toMap
    val rel = Sketches.kmvDistinctRelational(df, Seq("g"), "v", K)
      .as[(String, Long)].collect().toMap
    assert(agg == rel)
    val byG = rows.groupBy(_._1)
    for ((g, grp) <- byG)
      assert(agg(g) == Sketches.kmvDistinctPure(grp.map(_._2), K), s"group $g")
    // exact path: below k the sketch IS the distinct count
    assert(agg("b") == 7L)
    // estimate path: within 40% of truth at k=32 (1/sqrt(k) ≈ 18% stddev)
    assert(math.abs(agg("a") - 1000.0) / 1000.0 < 0.4, agg("a").toString)
    assert(math.abs(agg("c") - 200.0) / 200.0 < 0.4, agg("c").toString)
    // partitioning cannot move a set-function
    val rep = Sketches.kmvDistinct(df.repartition(17), Seq("g"), "v", K)
      .as[(String, Long)].collect().toMap
    assert(rep == agg)
  }

  test("HLL: aggregator ≡ relational twin ≡ pure twin; partitioning-invariant") {
    val rows = (1 to 6000).map { i =>
      val g = if (i % 2 == 0) "big" else "small"
      val v = if (g == "big") s"val${i}" else s"s${i % 9}" // 3000 vs 9 distinct
      (g, v)
    }
    val df = rows.toDF("g", "v")
    val agg = Sketches.hllDistinct(df, "g", "v")
      .as[(String, Long, Long)].collect().map { case (g, e, z) => g -> (e, z) }.toMap
    val rel = Sketches.hllDistinctRelational(df, "g", "v")
      .as[(String, Long, Long)].collect().map { case (g, e, z) => g -> (e, z) }.toMap
    assert(agg == rel)
    val byG = rows.groupBy(_._1)
    for ((g, grp) <- byG)
      assert(agg(g) == Sketches.hllDistinctPure(grp.map(_._2).distinct), s"group $g")
    // small group takes the linear-counting branch: estimate = lc(zero_regs)
    // (9 distinct values occupy ≤ 9 buckets; lc lands on 9 ± a collision)
    assert(agg("small")._1 == Sketches.hllLinearCounting(agg("small")._2.toInt))
    assert(agg("small")._2 >= Sketches.HllM - 9 && math.abs(agg("small")._1 - 9) <= 2)
    // big group: raw estimator within the 3-sigma band (1.04/sqrt(256) ≈ 6.5%)
    assert(math.abs(agg("big")._1 - 3000.0) / 3000.0 < 0.2, agg("big").toString)
    // a set function cannot move under repartitioning
    val rep = Sketches.hllDistinct(df.repartition(17), "g", "v")
      .as[(String, Long, Long)].collect().map { case (g, e, z) => g -> (e, z) }.toMap
    assert(rep == agg)
    // duplicates cannot move a register max
    val dup = Sketches.hllDistinct(df.unionAll(df), "g", "v")
      .as[(String, Long, Long)].collect().map { case (g, e, z) => g -> (e, z) }.toMap
    assert(dup == agg)
  }

  test("HLL registers: per-snapshot merge ≡ direct sketch over the union") {
    val rows = (1 to 2000).map(i => ("g", s"v${i % 700}", i % 2))
    val df = rows.toDF("g", "v", "half")
    val r0 = Sketches.hllRegisters(df.filter($"half" === 0).select("g", "v"), "g", "v")
    val r1 = Sketches.hllRegisters(df.filter($"half" === 1).select("g", "v"), "g", "v")
    val merged = Sketches.hllEstimateFromRegisters(
      r0.unionAll(r1).groupBy("g", "bucket").agg(max("reg").as("reg")), "g")
      .as[(String, Long, Long)].collect().head
    val direct = Sketches.hllDistinct(df.select("g", "v"), "g", "v")
      .as[(String, Long, Long)].collect().head
    assert(merged == direct)
  }

  test("KMV synopsis: per-snapshot merge ≡ direct estimate over the union") {
    val rows = (1 to 3000).map(i => ("g", s"v${i % 900}", i % 3))
    val df = rows.toDF("g", "v", "third")
    val syns = (0 to 2).map(t =>
      Sketches.kmvSynopsis(df.filter($"third" === t).select("g", "v"), Seq("g"), "v", 64))
    val merged = Sketches.kmvEstimateFromSynopsis(
      Sketches.kmvMergeSynopses(64, Seq("g"), syns: _*), Seq("g"), 64)
      .as[(String, Long)].collect().head
    val direct = Sketches.kmvDistinct(df.select("g", "v"), Seq("g"), "v", 64)
      .as[(String, Long)].collect().head
    assert(merged == direct)
    // merging a synopsis with itself is a no-op (idempotence)
    val self = Sketches.kmvEstimateFromSynopsis(
      Sketches.kmvMergeSynopses(64, Seq("g"), syns(0), syns(0)), Seq("g"), 64)
      .as[(String, Long)].collect().head
    val one = Sketches.kmvEstimateFromSynopsis(syns(0), Seq("g"), 64)
      .as[(String, Long)].collect().head
    assert(self == one)
  }

  test("CMS merge: per-half elementwise add ≡ direct build; dims enforced") {
    val df = (1 to 400).map(i => (i.toLong, s"w${i % 37}")).toDF("id", "t")
    val halves = Seq(0, 1).map(m =>
      Sketches.cmsBuild(df.filter($"id" % 2 === m), "t", width = 64, depth = 3))
    val merged = Sketches.cmsMerge(halves, width = 64, depth = 3)
    val direct = Sketches.cmsBuild(df, "t", width = 64, depth = 3)
    assert(merged.toSeq == direct.toSeq)
    assertThrows[IllegalArgumentException] {
      Sketches.cmsMerge(Seq(new Array[Long](6), new Array[Long](8)), 2, 3)
    }
    // equal cell count but different geometry is refused, not mixed
    assertThrows[IllegalArgumentException] {
      Sketches.cmsMerge(Seq(new Array[Long](6)), width = 3, depth = 3)
    }
  }

  test("kmvOverlap: DF ≡ pure twin; exact below k; disjoint → zero") {
    val k = 16
    def syn(vals: Seq[String]) = Sketches.kmvSynopsis(
      vals.map(v => ("g", v)).toDF("grp", "v"), Seq("grp"), "v", k)
    def run(a: Seq[String], b: Seq[String]) =
      Sketches.kmvOverlap(syn(a), syn(b), Seq("grp"), k)
        .select("n_shared", "k_used", "jaccard_milli", "union_est",
          "intersection_est")
        .as[(Long, Long, Long, Long, Long)].collect().head

    // below k on both sides: L is the whole union → exact set arithmetic
    val a1 = Seq("a", "b", "c", "d", "e")
    val b1 = Seq("c", "d", "e", "f")
    val got1 = run(a1, b1)
    assert(got1 == Sketches.kmvOverlapPure(a1, b1, k))
    assert(got1._1 == 3L && got1._2 == 6L) // |A∩B|=3, |A∪B|=6
    assert(got1._4 == 6L && got1._5 == 3L) // exact union + intersection
    assert(got1._3 == 3000L / 6L)

    // big sets: estimator path (kth-value division), DF ≡ pure
    val a2 = (1 to 300).map(i => s"x$i")
    val b2 = (150 to 450).map(i => s"x$i")
    assert(run(a2, b2) == Sketches.kmvOverlapPure(a2, b2, k))

    // disjoint: zero shared, zero intersection estimate
    val got3 = run(Seq("p", "q", "r"), Seq("s", "t"))
    assert(got3._1 == 0L && got3._3 == 0L && got3._5 == 0L)
    spark.catalog.clearCache()
  }

  test("HLL internals: rho from hex; linear-counting table; register merge") {
    // rho = 1 + leading zero bits of the 52-bit tail
    assert(Sketches.hllBucketRho("ff" + "8" + "0" * 12 + "0" * 17)._2 == 1)
    assert(Sketches.hllBucketRho("00" + "1" + "0" * 12 + "0" * 17)._2 == 4)
    assert(Sketches.hllBucketRho("ab" + "08" + "0" * 11 + "0" * 17)._2 == 5)
    assert(Sketches.hllBucketRho("ab" + "0" * 13 + "0" * 17)._2 == 53)
    assert(Sketches.hllBucketRho("ff" + "0" * 30)._1 == 255)
    // lc table: v = m → 0; v = 1 → round(256·ln 256)
    assert(Sketches.hllLinearCounting(256) == 0L)
    assert(Sketches.hllLinearCounting(1) == math.round(256.0 * math.log(256.0)))
    val a = new Sketches.HllAggregator
    val m1 = a.reduce(a.zero, "ff" + "8" + "0" * 29)
    val m2 = a.reduce(a.zero, "ff" + "0" + "8" * 29) // same bucket, deeper rho
    assert(a.merge(m1.clone(), m2.clone())(255) == math.max(m1(255), m2(255)))
  }

  test("aggregator buffer is bounded and merge keeps sorted distinct") {
    val a = new Sketches.KmvAggregator(4)
    var buf = a.zero
    for (h <- Seq(50L, 10L, 30L, 10L, 70L, 20L, 5L)) buf = a.reduce(buf, h)
    assert(buf.toSeq == Seq(5L, 10L, 20L, 30L)) // 4 smallest, sorted, distinct
    val merged = a.merge(Array(5L, 10L, 20L, 30L), Array(1L, 10L, 15L, 40L))
    assert(merged.toSeq == Seq(1L, 5L, 10L, 15L))
    assert(a.finish(Array(1L, 2L, 3L)) == 3L) // under k → exact
  }

  test("CMS: never under-counts, exact without collisions, replay with them") {
    val W = 64
    val D = 3
    val items = (1 to 900).map(i => s"item${i % 30}") // 30 distinct, 30 each
    val df = items.toDF("v")
    val sk = Sketches.cmsBuild(df, "v", W, D)
    // partitioning-invariant (elementwise add is commutative)
    assert(java.util.Arrays.equals(sk, Sketches.cmsBuild(df.repartition(11), "v", W, D)))
    val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    for ((v, c) <- truth) {
      val est = Sketches.cmsEstimatePure(sk, v, W, D)
      assert(est >= c, s"$v under-counted: $est < $c")
      assert(est <= c + 900, s"$v absurd: $est")
    }
    // estimate column matches the pure twin; null → null
    val probes = (truth.keys.toSeq :+ "never-seen").map(Option(_)) :+ None
    val got = Sketches.cmsEstimate(probes.toDF("v"), "v", sk, W, D)
      .as[(Option[String], Option[Long])].collect().toMap
    for (p <- probes) p match {
      case Some(s) => assert(got(p).contains(Sketches.cmsEstimatePure(sk, s, W, D)))
      case None    => assert(got(p).isEmpty)
    }
    // a wide sketch with no collisions is exact
    val wide = Sketches.cmsBuild(df, "v", 8192, 4)
    assert(truth.forall { case (v, c) => Sketches.cmsEstimatePure(wide, v, 8192, 4) == c })
  }

  test("plan: partial aggregation of sketch buffers, not a distinct shuffle") {
    val df = (1 to 500).map(i => ("g", s"v$i")).toDF("g", "v")
    val plan = Sketches.kmvDistinct(df, Seq("g"), "v", K)
      .queryExecution.executedPlan.toString
    // typed Aggregator runs as ObjectHashAggregate/SortAggregate with a
    // partial stage before the exchange — rows are combined map-side
    assert(plan.contains("Aggregate"), plan)
    assert(plan.toLowerCase.contains("partial"), plan)
  }

  test("sampledQuantiles ≡ pure twin; ranks hit both edges; sample bounded") {
    val rows = (0L until 4000L).map(i => (i, ((i * 37) % 997).toDouble))
    val df = rows.toDF("id", "v").repartition(7)
    val qs = Seq(0.001, 0.25, 0.5, 0.9, 1.0)
    val got = Sketches.sampledQuantiles(df, "id", "v", qs, frac = 0.1)
      .as[(Double, Double, Long)].collect().sortBy(_._1)
    val want = Sketches.sampledQuantilesPure(rows, qs, frac = 0.1)
      .sortBy(_._1)
    assert(got.toSeq == want)
    val m = got.head._3
    assert(m > 0 && m < 1000, s"sample size $m should be ~400 of 4000")
    // q=1.0 returns the sample max; tiny q returns the sample min
    val sample = rows.filter(r =>
      graft.text.Sampling.hashThresholdPure(r._1, 0.1)).map(_._2)
    assert(got.last._2 == sample.max)
    assert(got.head._2 == sample.min)
    // estimates should be near the true quantiles (coarse sanity)
    val trueMed = rows.map(_._2).sorted.apply(2000)
    assert(math.abs(got(2)._2 - trueMed) < 100, s"${got(2)._2} vs $trueMed")
  }
}
