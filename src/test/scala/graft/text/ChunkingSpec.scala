package graft.text

import graft.SparkTestBase
import org.scalacheck.Gen

class ChunkingSpec extends SparkTestBase {
  import spark.implicits._

  // raw-Gen sampling, same idiom as PropertySpec (scalatestplus is not in
  // the offline cache)
  private def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    Iterator.continually(g.sample).flatten.take(200).foreach(f)

  test("chunkDf ≡ pure twin across sizes/overlaps; edge docs") {
    val docs = Seq(
      1L -> ("tok " * 100).trim,
      2L -> "exactly four word tokens",
      3L -> "one",
      4L -> "",
      5L -> ("w " * 33).trim) // n = chunkSize+1 → 2 chunks
    for ((size, ov) <- Seq((32, 8), (32, 0), (4, 1), (1, 0))) {
      val got = Chunking.chunkDf(docs.toDF("doc_id", "text"), "doc_id", "text", size, ov)
        .as[(Long, Long, Long, String)].collect().toSet
      val exp = docs.flatMap { case (id, t) =>
        Chunking.chunk(t, size, ov).map { case (i, n, c) => (id, i, n, c) }
      }.toSet
      assert(got == exp, s"size=$size overlap=$ov")
    }
  }

  test("chunk boundaries: stride coverage, overlap, short tail, reconstruction") {
    val toks = (1 to 75).map(i => s"t$i")
    val got = Chunking.chunk(toks.mkString(" "), 32, 8)
    // strides of 24: starts 0, 24, 48 → 3 chunks; last is short (27)
    assert(got.map(_._2) == Seq(32L, 32L, 27L))
    assert(got(1)._3.startsWith("t25 ") && got(1)._3.endsWith(" t56"))
    // consecutive chunks overlap by exactly 8 tokens
    val c0 = got(0)._3.split(" ").toSeq
    val c1 = got(1)._3.split(" ").toSeq
    assert(c0.takeRight(8) == c1.take(8))
    // zero-overlap chunking reconstructs the token stream exactly
    val flat = Chunking.chunk(toks.mkString(" "), 32, 0).flatMap(_._3.split(" "))
    assert(flat == toks)
  }

  test("property: every token covered, chunk count formula, bounds hold") {
    forAll(for {
      n <- Gen.choose(0, 300)
      size <- Gen.choose(1, 50)
      ov <- Gen.choose(0, size - 1)
    } yield (n, size, ov)) { case (n, size, ov) =>
      val text = (1 to n).map(i => s"w$i").mkString(" ")
      val got = Chunking.chunk(text, size, ov)
      if (n == 0) assert(got.isEmpty)
      else {
        val stride = size - ov
        assert(got.head._1 == 0 && got.map(_._1) == got.indices.map(_.toLong))
        assert(got.forall(_._2 <= size))
        assert(got.dropRight(1).forall(_._2 == size))
        // coverage: union of [i*stride, i*stride+len) is [0, n)
        val covered = got.zipWithIndex.flatMap { case ((_, len, _), i) =>
          (i * stride) until (i * stride + len.toInt)
        }.toSet
        assert(covered == (0 until n).toSet)
      }
    }
  }

  test("plan: chunking is narrow — zero exchanges") {
    val df = Seq(1L -> ("tok " * 50)).toDF("doc_id", "text")
    val plan = Chunking.chunkDf(df, "doc_id", "text", 16, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    intercept[IllegalArgumentException](Chunking.chunkDf(df, "doc_id", "text", 8, 8))
  }
}
