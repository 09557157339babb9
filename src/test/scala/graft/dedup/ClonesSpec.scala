package graft.dedup

import graft.SparkTestBase

class ClonesSpec extends SparkTestBase {
  import spark.implicits._

  test("normalize: alpha renaming, keywords, numbers, token classes") {
    // renamed identifiers + changed constants collapse
    val a = Clones.normalize("def total(xs, n): return xs + n * 3")
    val b = Clones.normalize("def sum(values, k): return values + k * 99")
    assert(a == b)
    assert(a == "def id0 ( id1 , id2 ) : return id1 + id2 * num")
    // keywords keep their spelling; structure differences survive
    assert(Clones.normalize("if x return x") == "if id0 return id0")
    assert(Clones.normalize("x + y") != Clones.normalize("x - y"))
    // first-occurrence numbering: reuse maps to the same id
    assert(Clones.normalize("a b a") == "id0 id1 id0")
    // the SAME name in a different role still renumbers consistently
    assert(Clones.normalize("b a a") == "id0 id1 id1")
    // numbers and punctuation tokenize greedily
    assert(Clones.normalize("v12+34") == "id0 + num")
    assert(Clones.normalize("") == "")
  }

  test("cloneGroups: grouping, id-type preservation, partition invariance") {
    val docs = Seq(
      (1L, "def f(a): return a + 1"),
      (2L, "def g(z): return z + 42"),   // clone of 1
      (3L, "def h(z): return z - 42"),   // different operator
      (4L, null.asInstanceOf[String]),    // null code -> empty canonical
      (5L, "")).toDF("doc_id", "code")
    val got = Clones.cloneGroups(docs, "doc_id", "code")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L)._1 == got(2L)._1 && got(1L)._2 == 2L)
    assert(got(3L)._1 != got(1L)._1 && got(3L)._2 == 1L)
    // null and empty code share the empty canonical
    assert(got(4L)._1 == got(5L)._1 && got(4L)._2 == 2L)
    // id stays a LONG through the kernel
    assert(Clones.cloneGroups(docs, "doc_id", "code")
      .schema("doc_id").dataType.typeName == "long")
    val rep = Clones.cloneGroups(docs.repartition(7), "doc_id", "code")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rep == got)
    intercept[IllegalArgumentException](
      Clones.cloneGroups(docs, "nope", "code"))
  }
}
