package graft.sim

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SparseSimSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus: Seq[(Long, String)] = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "the quick brown fox leaps over the lazy dog",
    3L -> "insurance policy general liability aggregate limit",
    4L -> "policy insurance liability general limit aggregate", // permutation of 3
    5L -> "completely unrelated text about gardening tulips",
    6L -> "", // token-less: no vector, no pairs
    7L -> "the the the the") // only corpus-hot tokens

  test("tfidfPairs ≡ pure twin at several thresholds, with and without maxDf") {
    val df = corpus.toDF("doc_id", "text")
    for (minCos <- Seq(0.05, 0.5); maxDf <- Seq(0, 4)) {
      val got = graft.io.Persisted.unpersistAfter(spark) {
        SparseSim.tfidfPairs(df, "doc_id", "text", minCos, maxDf)
          .as[(Long, Long, Double)].collect().toSet
      }
      val exp = SparseSim.tfidfPairsPure(corpus, minCos, maxDf).toSet
      assert(got == exp, s"minCos=$minCos maxDf=$maxDf")
    }
  }

  test("permuted bag-of-words pairs at cosine 1.0; token-less docs pair with nothing") {
    val df = corpus.toDF("doc_id", "text")
    val got = graft.io.Persisted.unpersistAfter(spark) {
      SparseSim.tfidfPairs(df, "doc_id", "text", 0.0)
        .as[(Long, Long, Double)].collect()
    }
    val m = got.map(r => (r._1, r._2) -> r._3).toMap
    assert(m((3L, 4L)) == 1.0)              // same bag, different order
    assert(m((1L, 2L)) > 0.8 && m((1L, 2L)) < 1.0)
    assert(!got.exists(r => r._1 == 6L || r._2 == 6L))
  }

  test("maxDf drops corpus-hot tokens from candidates AND norms") {
    val df = corpus.toDF("doc_id", "text")
    // 'the' appears in docs 1,2,7 (df=3); maxDf=2 removes it, so doc 7
    // (all 'the') loses its whole vector and every pair
    val got = graft.io.Persisted.unpersistAfter(spark) {
      SparseSim.tfidfPairs(df, "doc_id", "text", 0.0, maxDf = 2)
        .as[(Long, Long, Double)].collect()
    }
    assert(!got.exists(r => r._1 == 7L || r._2 == 7L))
    assert(got.map(r => (r._1, r._2)).toSet ==
      SparseSim.tfidfPairsPure(corpus, 0.0, 2).map(r => (r._1, r._2)).toSet)
  }

  test("bm25TopK ≡ pure twin; ranking favors rare matched terms") {
    val df = corpus.toDF("doc_id", "text")
    val queries = Seq(1L -> "insurance liability limit", 2L -> "quick fox",
      3L -> "unmatched zebra tokens", 4L -> "the")
    val qdf = queries.toDF("qid", "qtext")
    val got = graft.io.Persisted.unpersistAfter(spark) {
      SparseSim.bm25TopK(df, "doc_id", "text", qdf, "qid", "qtext", k = 3)
        .as[(Long, Long, Long, Long)].collect().toSet
    }
    val exp = SparseSim.bm25TopKPure(corpus, queries, k = 3).toSet
    assert(got == exp)
    // insurance query retrieves docs 3 and 4 ahead of everything else
    val q1 = got.filter(_._1 == 1L).toSeq.sortBy(_._3).map(_._2)
    assert(q1.take(2).toSet == Set(3L, 4L))
    // a query with no corpus tokens retrieves nothing
    assert(!got.exists(_._1 == 3L))
    // ties break on doc id, so reruns are stable
    val again = graft.io.Persisted.unpersistAfter(spark) {
      SparseSim.bm25TopK(df.repartition(9), "doc_id", "text", qdf, "qid", "qtext", 3)
        .as[(Long, Long, Long, Long)].collect().toSet
    }
    assert(again == got)
  }

  test("bm25 plan: query side broadcasts, corpus never reshuffles per query") {
    val df = corpus.toDF("doc_id", "text")
    val qdf = Seq(1L -> "insurance").toDF("qid", "qtext")
    val plan = SparseSim.bm25TopK(df, "doc_id", "text", qdf, "qid", "qtext", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    graft.io.Persisted.release(spark)
  }

  test("plan: one token shuffle feeding a persisted weight relation; caches released") {
    val df = corpus.toDF("doc_id", "text")
    val pairs = SparseSim.tfidfPairs(df, "doc_id", "text", 0.1)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"), plan) // weight relation reused
    assert(!plan.contains("CartesianProduct"), plan)
    pairs.collect()
    assert(graft.io.Persisted.trackedCount(spark) == 2) // tf + weights
    graft.io.Persisted.release(spark)
    assert(graft.io.Persisted.trackedCount(spark) == 0)
  }

  test("tfidfKeywords ≡ pure twin; rare terms outrank common; k caps per doc") {
    val docs = Seq(
      1L -> "alpha alpha alpha common common",
      2L -> "beta common unique",
      3L -> "common common gamma gamma delta",
      4L -> "") // token-less: no rows
    val got = graft.io.Persisted.unpersistAfter(spark) {
      SparseSim.tfidfKeywords(docs.toDF("doc_id", "text"), "doc_id", "text", 2)
        .as[(Long, Int, String, Long, Long, Long)].collect()
        .sortBy(r => (r._1, r._2)).toSeq
    }
    assert(got == SparseSim.tfidfKeywordsPure(docs, 2))
    assert(got.count(_._1 == 4L) == 0)
    assert(got.count(_._1 == 3L) == 2) // k caps a 3-term doc at 2
    // "common" appears in 3 of 4 docs → low idf; doc 2's top term is a
    // unique one, not "common"
    val doc2Top = got.find(r => r._1 == 2L && r._2 == 1).get._3
    assert(doc2Top != "common", got.toString)
  }
}
