package graft.graph

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TrianglesSpec extends SparkTestBase {
  import spark.implicits._

  test("K4: four triangles, every node in three") {
    val k4 = (for (a <- 1 to 4; b <- 1 to 4 if a < b) yield (a.toLong, b.toLong))
      .toDF("s", "d")
    assert(Triangles.total(k4, "s", "d").as[Long].collect().head == 4L)
    val per = Triangles.perNode(k4, "s", "d")
      .as[(Long, Long)].collect().toMap
    assert(per == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("duplicate, reverse, and self-loop edges collapse before counting") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (1L, 1L))
      .toDF("s", "d")
    assert(Triangles.total(messy, "s", "d").as[Long].collect().head == 1L)
    spark.catalog.clearCache()
  }

  test("random graph ≡ brute-force triple enumeration; partitioning invariant") {
    val rnd = new scala.util.Random(31)
    val edges = Seq.fill(220)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter(e => e._1 != e._2)
    val df = edges.toDF("s", "d")
    val got = Triangles.total(df, "s", "d").as[Long].collect().head
    // brute force over canonical undirected set
    val und = edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val brute = (for {
      i <- nodes.indices; j <- (i + 1) until nodes.size; k <- (j + 1) until nodes.size
      if und((nodes(i), nodes(j))) && und((nodes(j), nodes(k))) &&
        und((nodes(i), nodes(k)))
    } yield 1).size.toLong
    assert(got == brute, s"got $got brute $brute")
    val got2 = Triangles.total(df.repartition(13), "s", "d")
      .as[Long].collect().head
    assert(got2 == brute)
    // per-node totals sum to 3 × triangles
    val perSum = Triangles.perNode(df, "s", "d")
      .agg(sum("triangles")).as[Long].collect().head
    assert(perSum == 3L * brute)
    spark.catalog.clearCache()
  }
}
