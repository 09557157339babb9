package graft.io

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The persist-for-caller contract: LSH/clustering operators leave internal
  * relations cached for the caller's single action; [[Persisted]] releases
  * exactly those — the caller's own caches survive. */
class PersistedSpec extends SparkTestBase {

  private def docs = {
    import spark.implicits._
    (1 to 40).map { i =>
      val body = if (i % 2 == 0) s"the quick brown fox jumps over dog ${i / 2}"
                 else s"completely different text body number $i with words"
      (i.toLong, body)
    }.toDF("doc_id", "text")
  }

  test("operators register their persisted relations; release is selective") {
    Persisted.release(spark) // drain anything a prior suite left behind
    spark.catalog.clearCache()

    val mine = docs.persist(StorageLevel.MEMORY_AND_DISK)
    assert(mine.count() == 40)

    val before = Persisted.trackedCount(spark)
    assert(before == 0)

    val pairs = graft.dedup.Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, minJ = 0.5)
    assert(pairs.count() >= 0) // materialize — shingle relation now cached
    assert(Persisted.trackedCount(spark) == 1)

    Persisted.release(spark)
    assert(Persisted.trackedCount(spark) == 0)
    // the caller's own cache is untouched by the selective release
    assert(mine.storageLevel != StorageLevel.NONE)
    // double release is a no-op
    Persisted.release(spark)
    mine.unpersist(blocking = true)
  }

  test("unpersistAfter scopes a materialization; all five operators track") {
    Persisted.release(spark)
    // suites share one SparkContext: a prior suite's localCheckpoint RDDs
    // (e.g. Hits iterations, freed by the ContextCleaner on GC, not by
    // catalog.clearCache) may still be registered — the leak assertion at
    // the bottom is about THIS test's scopes, so snapshot the baseline
    val preexisting = spark.sparkContext.getPersistentRDDs.keySet
    val n = Persisted.unpersistAfter(spark) {
      val mh = graft.dedup.Dedup.minhashDuplicates(
        docs, "doc_id", "text", n = 3, k = 16, bands = 4, minJ = 0.3)
      val sh = graft.dedup.Dedup.simhashDuplicates(docs, "doc_id", "text", maxHamming = 3)
      val mhc = mh.count(); val shc = sh.count()
      // minhash tracks cand+shingles (band relation self-released), simhash 1
      assert(Persisted.trackedCount(spark) == 3)
      mhc + shc
    }
    assert(n >= 0)
    assert(Persisted.trackedCount(spark) == 0)

    import spark.implicits._
    val vecs = (1 to 20).map { i =>
      (i.toLong, Array.tabulate(8)(d => (if (i % 4 == 0) d else i * d + 1).toFloat))
    }.toDF("id", "vec")
    Persisted.unpersistAfter(spark) {
      val rhp = graft.sim.Similarity.rhpNearDupPairs(vecs, "id", "vec", 0.9, tables = 2, bits = 4)
      rhp.count()
      assert(Persisted.trackedCount(spark) == 1)
    }
    Persisted.unpersistAfter(spark) {
      val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
      val cc = graft.dedup.Dedup.connectedComponents(edges, "a", "b")
      assert(cc.count() == 5)
      assert(Persisted.trackedCount(spark) == 1)
    }
    assert(Persisted.trackedCount(spark) == 0)
    // nothing cached leaks out of the scopes
    assert(spark.sparkContext.getPersistentRDDs.keySet.subsetOf(preexisting))
  }
}
