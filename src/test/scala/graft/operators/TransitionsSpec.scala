package graft.operators

import graft.SparkSpec

/** Markov transition matrix: adjacency within entity, counts, and exact
  * row normalization.
  */
class TransitionsSpec extends SparkSpec {
  import spark.implicits._

  // user 1: a→b→a→c   user 2: a→b   user 3: c (no transition)
  private def events = Seq(
    (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "c"),
    (2L, 1L, "a"), (2L, 2L, "b"),
    (3L, 1L, "c")
  ).toDF("user_id", "seq", "state")

  private def out =
    Transitions.matrix(events, "user_id", "state", "seq")

  "matrix" should "count adjacent transitions per entity" in {
    val n = out.select("from_state", "to_state", "n")
      .as[(String, String, Long)].collect().toSet
    n shouldBe Set(("a", "b", 2L), ("b", "a", 1L), ("a", "c", 1L))
  }

  it should "row-normalize probabilities exactly" in {
    val p = out.select("from_state", "to_state", "prob")
      .as[(String, String, Double)].collect()
      .map { case (f, t, v) => (f, t) -> v }.toMap
    p(("a", "b")) shouldBe 2.0 / 3.0
    p(("a", "c")) shouldBe 1.0 / 3.0
    p(("b", "a")) shouldBe 1.0
  }

  it should "never chain across entities" in {
    // user 2 ends in b, user 3 starts with c — no b→c transition
    out.filter("from_state = 'b' AND to_state = 'c'").count() shouldBe 0L
  }

  it should "require an ordering column" in {
    an[IllegalArgumentException] should be thrownBy
      Transitions.matrix(events, "user_id", "state")
  }
}
