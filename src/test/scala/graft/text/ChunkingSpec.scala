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

  // ------------------------------------------------ content-defined -------

  private def mkText(seed: Int, n: Int): String = {
    val rnd = new scala.util.Random(seed)
    val sb = new StringBuilder
    while (sb.length < n) sb.append(('a' + rnd.nextInt(26)).toChar)
      .append(if (rnd.nextInt(6) == 0) " " else "")
    sb.toString.take(n)
  }

  test("cdc: DF ≡ pure twin; reassembly; max-size cap; edge docs") {
    val docs = Seq(
      1L -> mkText(42, 3000),
      2L -> "short",                       // < windowLen → one chunk
      3L -> "",                            // empty → no chunks
      4L -> mkText(7, 300),
      5L -> "z" * 700)                     // constant text: either no cuts
                                           // (maxLen split) or cut everywhere
    val df = docs.toDF("doc_id", "text")
    val got = Chunking.cdcChunks(df, "doc_id", "text", 16, 4, 128)
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    for ((id, t) <- docs) {
      val exp = Chunking.cdcChunk(t, 16, 4, 128)
        .map { case (c, s, l, x) => (id, c, s, l, x) }
      assert(got.getOrElse(id, Seq.empty) == exp, s"doc $id")
      // chunks re-assemble the document exactly, in chunk_id order
      assert(exp.map(_._5).mkString == t, s"doc $id reassembly")
      assert(exp.forall(_._4 <= 128), s"doc $id cap")
      assert(exp.forall(_._4 >= 1), s"doc $id empty chunk")
    }
    assert(!got.contains(3L))
    assert(got(2L).map(_._5) == Seq("short"))
    // the mask actually cuts somewhere on the long random doc
    assert(got(1L).size > 3000 / 128)
  }

  test("cdc: edit locality — chunks past the edit window re-align") {
    val suffix = mkText(9, 4000)
    val a = Chunking.cdcChunk(mkText(1, 500) + suffix, 16, 6, 256).map(_._4)
    val b = Chunking.cdcChunk(mkText(2, 777) + suffix, 16, 6, 256).map(_._4)
    // (_._4 is chunk text) common suffix of the two chunk STREAMS: with a
    // 2^6 mask the ~4000 shared chars hold ~60 boundaries, and all chunks
    // after the first shared boundary are content-identical despite the
    // different (and differently-sized) prefixes shifting every offset
    val common = a.reverse.zip(b.reverse).takeWhile { case (x, y) => x == y }.length
    assert(common >= 10, s"only $common common suffix chunks")
    // and fixed-size chunking (the control) shares NO chunks when the
    // prefix length shift is not a multiple of the chunk size
    val fa = (mkText(1, 500) + suffix).grouped(256).toSeq
    val fb = (mkText(2, 777) + suffix).grouped(256).toSeq
    val fixedCommon = fa.reverse.zip(fb.reverse).takeWhile { case (x, y) => x == y }.length
    assert(fixedCommon <= 1, s"fixed-size control unexpectedly aligned: $fixedCommon")
  }

  test("cdc: plan is narrow — zero exchanges; guards") {
    val df = Seq(1L -> mkText(3, 400)).toDF("doc_id", "text")
    val plan = Chunking.cdcChunks(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    intercept[IllegalArgumentException](Chunking.cdcChunks(df, "doc_id", "text", 1))
    intercept[IllegalArgumentException](Chunking.cdcChunks(df, "doc_id", "text", 16, 0))
    intercept[IllegalArgumentException](Chunking.cdcChunks(df, "doc_id", "text", 16, 6, 8))
  }
}
