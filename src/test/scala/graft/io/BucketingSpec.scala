package graft.io

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  private def fixture() = {
    val big = (0 until 3000).map(i => (i.toLong % 97, i.toLong)).toDF("k", "v")
    val dim = (0L until 97L).map(k => (k, s"name$k")).toDF("k2", "name")
    (big, dim)
  }

  test("bucketed join plans with no exchange on either side and matches plain join") {
    val (big, dim) = fixture()
    Bucketing.writeBucketed(big, "bspec_big", Seq("k"), 4)
    Bucketing.writeBucketed(dim, "bspec_dim", Seq("k2"), 4)
    val b = spark.table("bspec_big")
    val d = spark.table("bspec_dim")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = b.join(d, b("k") === d("k2"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(!plan.contains("Exchange"), plan)
      val got = joined.select(col("k"), col("v"), col("name"))
        .as[(Long, Long, String)].collect().toSet
      val expected = big.join(dim, big("k") === dim("k2"))
        .select(col("k"), col("v"), col("name"))
        .as[(Long, Long, String)].collect().toSet
      assert(got == expected)
      assert(got.size == 3000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("one file per bucket plus the scan-ordering flag also drops the per-task sort") {
    // Spark trusts the within-bucket sort order only when each bucket is a
    // single file (pre-clustering the writer by the bucket key — the same
    // murmur3 hash — produces exactly that layout) AND the bucketed-scan
    // output-ordering flag is on (off by default since 3.0 because it forces
    // single-file bucket reads).
    val (big, dim) = fixture()
    Bucketing.writeBucketed(big.repartition(4, col("k")), "bspec_big2", Seq("k"), 4)
    Bucketing.writeBucketed(dim.repartition(4, col("k2")), "bspec_dim2", Seq("k2"), 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val orderingKey = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(orderingKey, "true")
      val b = spark.table("bspec_big2")
      val d = spark.table("bspec_dim2")
      val joined = b.join(d, b("k") === d("k2"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Sort "), plan)
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() == 3000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set(orderingKey, "false")
    }
  }

  test("overwrite is idempotent: rewriting the table leaves the same rows") {
    val (big, _) = fixture()
    Bucketing.writeBucketed(big, "bspec_big3", Seq("k"), 4)
    Bucketing.writeBucketed(big, "bspec_big3", Seq("k"), 4)
    assert(spark.table("bspec_big3").count() == 3000)
  }

  test("bad arguments are refused") {
    val (big, _) = fixture()
    intercept[IllegalArgumentException](Bucketing.writeBucketed(big, "x", Seq.empty, 4))
    intercept[IllegalArgumentException](Bucketing.writeBucketed(big, "x", Seq("k"), 0))
  }

  test("groupBy on the bucket key is also exchange-free") {
    val (big, _) = fixture()
    Bucketing.writeBucketed(big, "bspec_big4", Seq("k"), 4)
    val agg = spark.table("bspec_big4").groupBy("k").agg(sum("v").as("sv"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    val direct = big.groupBy("k").agg(sum("v").as("sv"))
      .as[(Long, Long)].collect().toSet
    assert(agg.as[(Long, Long)].collect().toSet == direct)
  }
}
