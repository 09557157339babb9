package graft.io

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class IdsSpec extends SparkTestBase {
  import spark.implicits._

  test("assign: contiguous 0-based ids in total order, multi-partition") {
    // scrambled input across several partitions; order = (v % 7, v)
    val df = scala.util.Random.shuffle((0L until 500L).toList)
      .toDF("v").repartition(7)
      .withColumn("grp", pmod(col("v"), lit(7)))
    val got = Ids.assign(df, Seq("grp", "v"), numPartitions = 5)
      .select("v", "global_id").as[(Long, Long)].collect().toMap
    val expected = (0L until 500L).sortBy(v => (v % 7, v))
      .zipWithIndex.map { case (v, i) => v -> i.toLong }.toMap
    assert(got == expected)
  }

  test("assign: ids are dense and unique even with empty partitions") {
    // more partitions than distinct range-keys forces empty partitions
    val df = Seq(5L, 1L, 3L).toDF("v").repartition(4)
    val ids = Ids.assign(df, Seq("v"), numPartitions = 8)
      .select("v", "global_id").as[(Long, Long)].collect().toMap
    assert(ids == Map(1L -> 0L, 3L -> 1L, 5L -> 2L))
  }

  test("assign: 50k rows — dense, unique, exactly ordered (sf1 regression)") {
    // the sf1 gate caught duplicate ids at this scale: the count job and
    // the assignment job ran as TWO query executions and disagreed on the
    // range partitioning, overlapping the per-partition offset ranges.
    // This pins density + uniqueness + exact order at the failing scale.
    val df = spark.range(50000).select(col("id").as("v"))
      .withColumn("grp", pmod(col("v"), lit(7)))
      .repartition(24)
    val got = Ids.assign(df, Seq("grp", "v"), numPartitions = 8)
      .select("v", "global_id").as[(Long, Long)].collect()
    assert(got.length == 50000)
    assert(got.map(_._2).distinct.length == 50000, "duplicate global ids")
    val expected = (0L until 50000L).sortBy(v => (v % 7, v))
      .zipWithIndex.map { case (v, i) => v -> i.toLong }.toMap
    assert(got.forall { case (v, g) => expected(v) == g })
  }

  test("assign: rejects an existing id column and empty order") {
    val df = Seq((1L, 2L)).toDF("a", "global_id")
    intercept[IllegalArgumentException] { Ids.assign(df, Seq("a")) }
    intercept[IllegalArgumentException] {
      Ids.assign(Seq(1L).toDF("a"), Seq.empty)
    }
  }
}
