package graft.dedup

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BloomSpec extends SparkTestBase {
  import spark.implicits._

  private val M = 1 << 14 // 16384 bits
  private val K = 4

  test("positionsCol ≡ positionsPure for varied strings") {
    val strs = Seq("", "a", "hello world", "Ünïcødé ≠ ascii", "x" * 500,
      "line\nbreak\ttab")
    val df = strs.toDF("s")
    val got = df.select(col("s"), Bloom.positionsCol(col("s"), M, K).as("p"))
      .as[(String, Seq[Long])].collect().toMap
    for (s <- strs) assert(got(s) == Bloom.positionsPure(s, M, K), s"for '$s'")
    // null text → null array
    val n = Seq(Option.empty[String]).toDF("s")
      .select(Bloom.positionsCol(col("s"), M, K)).collect()(0)
    assert(n.isNullAt(0))
  }

  test("build: deterministic, partitioning-invariant, no false negatives") {
    val items = (1 to 800).map(i => s"doc body number $i")
    val df = items.toDF("text")
    val f1 = Bloom.build(df, "text", M, K)
    val f2 = Bloom.build(df.repartition(13), "text", M, K)
    assert(java.util.Arrays.equals(f1, f2))
    // every built item must probe true
    assert(items.forall(Bloom.containsPure(f1, _, M, K)))
  }

  test("probe ≡ exact position-subset replay; FP rate within bound") {
    val seen = (1 to 700).map(i => s"seen $i")
    val fresh = (1 to 2000).map(i => s"fresh $i")
    val filter = Bloom.build(seen.toDF("text"), "text", M, K)
    val flagged = Bloom.probe(fresh.toDF("text"), "text", filter, M, K)
      .filter(col("flagged")).select("text").as[String].collect().toSet
    // independent replay: union of built positions, subset check per probe
    val builtPos = seen.flatMap(Bloom.positionsPure(_, M, K)).toSet
    val expect = fresh.filter(s => Bloom.positionsPure(s, M, K).forall(builtPos)).toSet
    assert(flagged == expect)
    // theoretical fp ≈ (1-e^{-kn/m})^k ≈ 0.07% here; allow 10x slack
    assert(flagged.size <= 15, s"fp count ${flagged.size}")
    // nulls probe false
    val withNull = Seq(Option("seen 1"), None).toDF("text")
    val got = Bloom.probe(withNull, "text", filter, M, K)
      .select("flagged").as[Boolean].collect().toSeq
    assert(got == Seq(true, false))
  }

  test("merge: per-snapshot OR ≡ direct build over the union; dims enforced") {
    val docs = (1 to 300).map(i => (i.toLong, s"text $i")).toDF("id", "t")
    val halves = Seq(0, 1).map(m =>
      Bloom.build(docs.filter($"id" % 2 === m), "t", M, K))
    val merged = Bloom.merge(halves)
    val direct = Bloom.build(docs, "t", M, K)
    assert(merged.toSeq == direct.toSeq)
    // idempotent: merging a filter with itself changes nothing
    assert(Bloom.merge(Seq(halves(0), halves(0))).toSeq == halves(0).toSeq)
    assertThrows[IllegalArgumentException] {
      Bloom.merge(Seq(new Array[Byte](4), new Array[Byte](8)))
    }
  }

  test("bitsFor matches the standard sizing bound") {
    val m = Bloom.bitsFor(1000000, 0.01)
    assert(m % 8 == 0)
    assert(m >= 9585058 && m <= 9586000, m.toString)
    intercept[IllegalArgumentException](Bloom.bitsFor(0, 0.01))
    intercept[IllegalArgumentException](Bloom.bitsFor(10, 1.5))
    // beyond int bits → explicit shard advice, not silent overflow
    intercept[IllegalArgumentException](Bloom.bitsFor(10000000000L, 0.0001))
  }

  test("empty build side yields an all-zero filter that flags nothing") {
    val filter = Bloom.build(Seq.empty[String].toDF("text"), "text", M, K)
    assert(filter.forall(_ == 0))
    assert(!Bloom.containsPure(filter, "anything", M, K))
  }
}
