package graft.text

import graft.SparkTestBase

class RecipeSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    ("web", "a b c d"), ("web", "e f"), // web: 6 tokens
    ("code", "x y"), // code: 2 tokens
    ("books", "p q r s t u v w") // books: 8 tokens
  ).toDF("source", "text")

  test("epochPlan: integer-exact needs/epochs, oversample flag") {
    val got = Recipe.epochPlan(docs, "source", "text",
      Map("web" -> 500L, "code" -> 300L, "books" -> 200L), targetTokens = 40L)
      .select("source", "src_tokens", "weight_milli", "needed_tokens",
        "epochs_milli", "oversampled")
      .as[(String, Long, Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val expect = Recipe.epochPlanPure(
      Map("web" -> 6L, "code" -> 2L, "books" -> 8L),
      Map("web" -> 500L, "code" -> 300L, "books" -> 200L), 40L)
    assert(got == expect)
    // web needs 20 of 6 available -> 3.333 epochs, oversampled
    assert(got.find(_._1 == "web").get == (("web", 6L, 500L, 20L, 3333L, true)))
    // books needs 8 of 8 -> exactly one epoch, not oversampled
    assert(got.find(_._1 == "books").get == (("books", 8L, 200L, 8L, 1000L, false)))
  }

  test("epochPlan: unknown source gets weight 0; zero target rejected") {
    val got = Recipe.epochPlan(docs, "source", "text",
      Map("web" -> 1000L), targetTokens = 10L)
      .select("source", "weight_milli", "needed_tokens", "epochs_milli")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got.filter(_._1 != "web").forall(r => r._2 == 0L && r._3 == 0L && r._4 == 0L))
    intercept[IllegalArgumentException] {
      Recipe.epochPlan(docs, "source", "text", Map.empty, 0L)
    }
  }
}
