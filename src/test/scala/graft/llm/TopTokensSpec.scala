package graft.llm

import graft.{SparkSpec, Tables}

class TopTokensSpec extends SparkSpec {

  test("top tokens match a brute-force count on a tiny corpus") {
    import spark.implicits._
    val df = Seq(
      (1L, "en", "a b a c a b"),
      (2L, "en", "b c d"),
      (3L, "fr", "x x y")
    ).toDF("doc_id", "lang", "text")
    val out = TextStats.topTokens(df, "text", "lang", 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .toSet
    // en: a=3, b=3 (tie → a first; c=2, d=1 cut); fr: x=2, y=1
    assert(out === Set(
      ("en", "a", 3L, 1), ("en", "b", 3L, 2),
      ("fr", "x", 2L, 1), ("fr", "y", 1L, 2)))
  }

  test("count ties break lexicographically") {
    import spark.implicits._
    val df = Seq((1L, "en", "z q z q m")).toDF("doc_id", "lang", "text")
    val out = TextStats.topTokens(df, "text", "lang", 2)
      .collect().map(r => (r.getString(1), r.getInt(3))).toSet
    assert(out === Set(("q", 1), ("z", 2)))
  }

  test("per-group top-k plans as WindowGroupLimit (pre-shuffle prune)") {
    val plan = TextStats.topTokens(Tables.documents(spark, sf()), "text", "lang", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }
}
