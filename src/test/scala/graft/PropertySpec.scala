package graft

import graft.dedup.Dedup
import graft.extract.Norms
import graft.ranges.Islands
import graft.segment.PageSegmenter

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY.md §5 item 3) for the pure operator
  * cores. No SparkSession — these pin down the algebra the distributed
  * forms are tested against elsewhere. (scalatestplus is not in the offline
  * cache, so sampling is driven directly from ScalaCheck generators with a
  * fixed seed-count budget.)
  */
class PropertySpec extends AnyFunSuite {

  def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    Iterator.continually(g.sample).flatten.take(200).foreach(f)

  def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb)) { case (a, b) => f(a, b) }

  def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc)) { case (a, b, c) => f(a, b, c) }

  def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body

  val pageGen: Gen[Int] = Gen.choose(1, 40)
  val pagesGen: Gen[List[Int]] = Gen.listOfN(12, pageGen)
  val bufferGen: Gen[Int] = Gen.choose(0, 3)

  test("R1 merge: sorted, disjoint, non-adjacent, within domain, covers hits") {
    forAll(pagesGen, pagesGen, bufferGen) { (hits0, domain0, buffer) =>
      whenever(domain0.nonEmpty) {
        val domain = domain0.distinct.sorted
        val hits = hits0.filter(domain.contains).distinct
        val ranges = Islands.mergeRanges(hits, domain, buffer)
        // sorted by start, pairwise non-overlapping and non-adjacent
        assert(ranges.map(_._1) == ranges.map(_._1).sorted)
        ranges.sliding(2).foreach {
          case Seq((_, e1), (s2, _)) => assert(s2 > e1 + 1)
          case _ =>
        }
        // every range within the clamping domain
        ranges.foreach { case (s, e) =>
          assert(s >= domain.min && e <= domain.max && s <= e)
        }
        // every hit covered by some range
        hits.foreach { h =>
          assert(ranges.exists { case (s, e) => h >= s && h <= e },
            s"hit $h uncovered in $ranges")
        }
        // idempotence: merging the merged starts again changes nothing
        if (buffer == 0) {
          val again = Islands.mergeRanges(
            ranges.flatMap { case (s, e) => s to e }, domain, 0)
          assert(again == ranges)
        }
      }
    }
  }

  test("R4 kept pages: sorted distinct subset of boundaries") {
    forAll(pagesGen, pagesGen, bufferGen) { (hits0, domain0, buffer) =>
      whenever(domain0.nonEmpty) {
        val domain = domain0.distinct.sorted
        val hits = hits0.filter(domain.contains).distinct
        val ranges = Islands.mergeRanges(hits, domain, buffer)
        val kept = Islands.keptPages(ranges, domain.toSet)
        assert(kept == kept.distinct.sorted)
        assert(kept.forall(domain.contains))
      }
    }
  }

  val contentGen: Gen[String] =
    Gen.listOfN(8, Gen.alphaNumStr.map(_.take(12))).map(_.mkString(" "))

  test("P2 parse ∘ render = identity on marker documents") {
    val docGen = for {
      n <- Gen.choose(1, 8)
      pages <- Gen.pick(n, 1 to 30)
      texts <- Gen.listOfN(n, contentGen)
    } yield pages.toList.zip(texts)
    forAll(docGen) { pages =>
      whenever(pages.forall(_._2.strip.nonEmpty)) {
        val rendered = pages.map { case (p, t) =>
          PageSegmenter.renderMarker(p) + t
        }.mkString
        val parsed = PageSegmenter.p2ExtractPages(rendered)
        assert(parsed == pages.map { case (p, t) => (p, t.strip) })
      }
    }
  }

  test("normalizeMoney is idempotent") {
    val moneyGen = Gen.oneOf(
      Gen.choose(0L, 10000000L).map(v => s"$$${v}"),
      Gen.const("Included"), Gen.const("2%"),
      Gen.const("Inside $10,000 / Outside $10,000"),
      Gen.alphaStr.map(_.take(10)), Gen.const(""), Gen.const("$1,234.56"))
    forAll(moneyGen) { v =>
      val once = Norms.normalizeMoney(v)
      val twice = once.flatMap(Norms.normalizeMoney)
      assert(twice == once)
    }
  }

  test("isNameVariation is symmetric") {
    val nameGen = Gen.listOfN(12, Gen.oneOf(('A' to 'Z') ++ Seq('0', '1', ' '))).map(_.mkString)
    forAll(nameGen, nameGen) { (a, b) =>
      assert(Norms.isNameVariation(a, b) == Norms.isNameVariation(b, a))
    }
  }

  test("simhash: self-distance 0; token order does not matter") {
    val textGen = Gen.listOfN(20, Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))
      .map(_.mkString(" "))
    forAll(textGen) { t =>
      val fp = Dedup.simhash32(t)
      assert(Dedup.hamming(fp, fp) == 0)
      val shuffled = t.split(" ").reverse.mkString(" ")
      assert(Dedup.simhash32(shuffled) == fp) // bag-of-words invariance
    }
  }

  test("minhash signature: length k, deterministic, shingle-order invariant") {
    val textGen = Gen.listOfN(10, Gen.oneOf("a", "b", "c", "d", "e", "f"))
      .map(_.mkString(" "))
    forAll(textGen) { t =>
      val sig = Dedup.minhashSignature(t, 2, 16)
      assert(sig.length == 16)
      assert(sig == Dedup.minhashSignature(t, 2, 16))
    }
  }

  test("jaccard bounds and identity") {
    val textGen = Gen.listOfN(12, Gen.oneOf("w1", "w2", "w3", "w4", "w5"))
      .map(_.mkString(" "))
    forAll(textGen, textGen) { (a, b) =>
      val j = Dedup.jaccard(a, b, 3)
      assert(j >= 0.0 && j <= 1.0)
      assert(Dedup.jaccard(a, a, 3) == (if (Dedup.shingles(a, 3).isEmpty) 0.0 else 1.0))
    }
  }

  test("tolerantNorm: idempotent, symmetric equality, date/money canonical") {
    val valGen = Gen.oneOf(
      Gen.zip(Gen.choose(1, 12), Gen.choose(1, 28), Gen.choose(1990, 2030))
        .map { case (m, d, y) => f"$m%02d/$d%02d/$y%d" },
      Gen.zip(Gen.choose(1, 12), Gen.choose(1, 28), Gen.choose(1990, 2030))
        .map { case (m, d, y) => s"$m/$d/$y" },
      Gen.choose(0, 5000000).map(n => s"$$$n"),
      Gen.oneOf("123 Main Road", "123 MAIN RD.", "55 Oak Avenue, Suite 9",
        "Acme Insurance Co", "2%", "", "  "),
      Gen.alphaNumStr)
    forAll(valGen) { v =>
      val n1 = Norms.tolerantNorm(v)
      assert(Norms.tolerantNorm(n1) == n1, s"idempotence on '$v'") // norm∘norm = norm
      assert(Norms.tolerantEqual(v, v))
    }
    forAll(valGen, valGen) { (a, b) =>
      assert(Norms.tolerantEqual(a, b) == Norms.tolerantEqual(b, a))
    }
    // zero-padded and bare dates canonicalize identically
    forAll(Gen.zip(Gen.choose(1, 12), Gen.choose(1, 28), Gen.choose(1990, 2030))) {
      case (m, d, y) =>
        assert(Norms.tolerantEqual(f"$m%02d/$d%02d/$y", s"$m/$d/$y"))
    }
  }

  test("boilerplate: labels partition the blocks; content spans ordered") {
    import graft.classify.Boilerplate
    val blockGen = Gen.oneOf(
      Gen.listOfN(6, Gen.oneOf("alpha", "beta", "gamma", "delta")).map(_.mkString(" ")),
      Gen.const("""<a href="u">Nav Link</a> <a href="v">Other</a>"""),
      Gen.const("Short Heading"),
      Gen.const("A sentence that ends properly."),
      Gen.const("<hr/>"))
    val docGen = Gen.listOfN(5, blockGen).map(_.mkString("\n\n"))
    forAll(docGen) { doc =>
      val blocks = Boilerplate.classifyBlocks(doc)
      assert(blocks.forall(b =>
        Set("heading", "body", "boilerplate", "empty").contains(b.label)))
      assert(blocks.map(_.idx) == blocks.indices)
      assert(blocks.forall(b => b.linkDensity >= 0.0 && b.nLinkWords <= math.max(b.nWords, 1)))
      val spans = Boilerplate.contentSpans(doc)
      assert(spans.map(_.offset) == spans.indices)
      assert(spans.size == blocks.count(b => b.label == "heading" || b.label == "body"))
    }
  }

  test("packing: tape is gapless, offsets bounded, split iff crossing a cut") {
    import graft.text.Packing
    val docsGen = Gen.listOfN(12, Gen.choose(0L, 20L)).map(_.zipWithIndex.map {
      case (n, i) => (i.toLong + 1, n)
    })
    val budgetGen = Gen.choose(1L, 16L)
    forAll(docsGen, budgetGen) { (docs, budget) =>
      val packed = Packing.packPure(docs, budget)
      var cum = 0L
      for (((id, n), (pid, start, first, last, off)) <- docs.zip(packed)) {
        assert(id == pid)
        assert(start == cum, "gapless tape")
        assert(off == start % budget && off < budget)
        assert(first == start / budget)
        if (n == 0) assert(last == first, "zero-token doc pinned")
        else assert(last == (start + n - 1) / budget)
        assert((first != last) == (n > 0 && start / budget != (start + n - 1) / budget))
        cum += n
      }
    }
  }

  test("line dedup: kept lines a subsequence, hot lines gone, cap monotone") {
    val lineGen = Gen.oneOf("nav", "footer", "alpha beta", "gamma", "unique line")
    val docGen = Gen.listOfN(4, lineGen).map(_.mkString("\n"))
    val corpusGen = Gen.listOfN(6, docGen).map(_.zipWithIndex.map {
      case (t, i) => (i.toLong + 1, t)
    })
    forAll(corpusGen, Gen.choose(1L, 8L)) { (docs, cap) =>
      val norm: String => String = _.trim.toLowerCase.replaceAll("\\s+", " ")
      val occ = docs.flatMap(_._2.split("\n", -1)).groupBy(norm).map { case (k, v) => k -> v.size }
      val out = Dedup.dedupLinesPure(docs, cap)
      for (((id, t), (oid, nl, nr, clean)) <- docs.zip(out)) {
        assert(id == oid)
        val orig = t.split("\n", -1).toSeq
        val kept = if (clean.isEmpty && nr == nl) Seq.empty else clean.split("\n", -1).toSeq
        assert(nl == orig.size && nr == orig.size - kept.size)
        // kept is exactly the original minus hot lines, order preserved
        assert(kept == orig.filter(l => occ(norm(l)) <= cap))
        assert(kept.forall(l => occ(norm(l)) <= cap))
      }
      // a looser cap never removes more
      val out2 = Dedup.dedupLinesPure(docs, cap + 1)
      assert(out.zip(out2).forall { case (a, b) => a._3 >= b._3 })
    }
  }

  test("stratified sampling: size = ceil(frac*n), deterministic, nested in looser fracs") {
    import graft.text.Sampling
    val idsGen = Gen.listOfN(15, Gen.choose(1L, 500L)).map(_.distinct)
    val fracGen = Gen.oneOf(0.1, 0.25, 0.5, 0.75)
    forAll(idsGen, fracGen) { (ids, frac) =>
      whenever(ids.nonEmpty) {
        val kept = Sampling.stratifiedPure(ids, frac)
        assert(kept.size == math.ceil(ids.size * frac).toInt)
        assert(kept.toSet.subsetOf(ids.toSet))
        assert(kept == Sampling.stratifiedPure(ids, frac), "deterministic")
        // md5 ranking makes samples nested: frac ⊆ frac' for frac < frac'
        val larger = Sampling.stratifiedPure(ids, math.min(1.0, frac * 2))
        assert(kept.toSet.subsetOf(larger.toSet))
      }
    }
  }

  test("mixture sampling: whole-stratum pass-through, keep rule monotone in target") {
    import graft.text.Sampling
    val nGen = Gen.choose(1L, 100000L)
    val tGen = Gen.choose(1L, 1000L)
    val idGen = Gen.choose(1L, 1000000L)
    forAll(idGen, nGen, tGen) { (id, n, t) =>
      // at or under target: always kept
      assert(Sampling.mixtureSamplePure(id, math.min(n, t), t))
      // monotone: growing the target never drops a kept doc
      if (Sampling.mixtureSamplePure(id, n, t))
        assert(Sampling.mixtureSamplePure(id, n, math.min(t * 2, 1L << 30)))
      // deterministic
      assert(Sampling.mixtureSamplePure(id, n, t) == Sampling.mixtureSamplePure(id, n, t))
    }
  }

  test("substring dedup: removal accounting, canonical survival, cap monotone") {
    val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "shared", "span", "x")
    val docGen = Gen.listOfN(8, wordGen).map(_.mkString(" "))
    val corpusGen = Gen.listOfN(5, docGen).map(_.zipWithIndex.map {
      case (t, i) => (i.toLong + 1, t)
    })
    forAll(corpusGen, Gen.choose(2, 4)) { (docs, k) =>
      val out = Dedup.dedupSubstringsPure(docs, k, 1)
      val occByKg = docs.flatMap { case (_, t) =>
        val ts = graft.text.TextAnalysis.tokens(t)
        if (ts.size >= k) ts.sliding(k).map(_.mkString(" ")).toSeq else Seq.empty
      }.groupBy(identity).map { case (g, v) => g -> v.size }
      for (((id, t), (oid, nt, nr, clean)) <- docs.zip(out)) {
        assert(id == oid)
        val ts = graft.text.TextAnalysis.tokens(t)
        assert(nt == ts.size)
        val kept = if (clean.isEmpty) Seq.empty else clean.split(" ").toSeq
        assert(nr == nt - kept.size && nr >= 0)
        // kept tokens are a subsequence of the original tokens
        var i = 0
        kept.foreach { w =>
          val j = ts.indexOf(w, i); assert(j >= 0, s"$w not in order"); i = j + 1
        }
        // a doc with no corpus-duplicated k-gram is untouched
        val hasDup = ts.size >= k &&
          ts.sliding(k).exists(g => occByKg(g.mkString(" ")) > 1)
        if (!hasDup) assert(nr == 0 && kept == ts)
      }
      // every duplicated k-gram keeps at least one occurrence corpus-wide
      // (the canonical copy) unless an OVERLAPPING duplicated k-gram's
      // removal clipped it — so total removals < total duplicated tokens+1
      assert(out.map(_._3).sum <= docs.map(d => graft.text.TextAnalysis.tokens(d._2).size).sum)
      // a looser cap never removes more
      val loose = Dedup.dedupSubstringsPure(docs, k, 2)
      assert(out.zip(loose).forall { case (a, b) => a._3 >= b._3 })
    }
  }

  test("dsir: bigram count accounting, target-copy boost, determinism") {
    import graft.text.Importance
    val wordGen = Gen.oneOf("the", "policy", "coverage", "recipe", "basil", "limit")
    val docGen = Gen.listOfN(6, wordGen).map(_.mkString(" "))
    val corpusGen = Gen.listOfN(6, docGen).map(_.zipWithIndex.map {
      case (t, i) => (i.toLong + 1, t)
    })
    forAll(corpusGen) { docs =>
      val target = docs.take(2).map(_._2)
      val out = Importance.dsirScoresPure(docs, target, buckets = 64)
      for (((id, t), (oid, nb, _)) <- docs.zip(out)) {
        assert(id == oid)
        val nt = graft.text.TextAnalysis.tokens(t).size
        assert(nb == math.max(0, nt - 1), "bigram count = tokens - 1")
      }
      assert(out == Importance.dsirScoresPure(docs, target, buckets = 64), "deterministic")
      // doubling the target's copies of a doc never lowers that doc's score
      val boosted = Importance.dsirScoresPure(docs, target ++ Seq(docs.head._2), buckets = 64)
      assert(boosted.head._3 >= out.head._3)
    }
  }
}
