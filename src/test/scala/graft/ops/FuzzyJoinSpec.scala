package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.llm.TextHash

class FuzzyJoinSpec extends SparkSpec {

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  test("planted pairs at distance 1, 2 found; distance 3 excluded") {
    import spark.implicits._
    val df = Seq("kitten", "sitten", "sittn", "mitten", "banana", "xyz")
      .toDF("w")
    val out = FuzzyJoin.editPairs(df, "w", maxEdits = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    assert(out(("kitten", "sitten")) === 1) // substitution
    assert(out(("sitten", "sittn")) === 1)  // deletion
    assert(out(("kitten", "mitten")) === 1)
    assert(out(("kitten", "sittn")) === 2)
    assert(!out.keySet.exists(p => p._1 == "banana" || p._2 == "banana"))
    assert(!out.keySet.exists(p => p._1 == "xyz" || p._2 == "xyz"))
  }

  test("deletion blocking is complete: equals brute force on the corpus vocab") {
    val vocab = Tables.documents(spark, sf("sf0.01"))
      .select(explode(TextHash.words(lower(trim(col("text"))))).as("word"))
      .distinct().collect().map(_.getString(0))
    val brute = (for {
      a <- vocab; b <- vocab if a < b
      d = lev(a, b) if d <= 2
    } yield (a, b) -> d).toMap
    val got = FuzzyJoin.editPairs(
        Tables.documents(spark, sf("sf0.01"))
          .select(explode(TextHash.words(lower(trim(col("text"))))).as("word")),
        "word", maxEdits = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    assert(got === brute)
    assert(brute.nonEmpty, "corpus should contain at least one fuzzy pair")
  }

  test("maxEdits=1 restricts to distance-1 pairs") {
    import spark.implicits._
    val df = Seq("abc", "abd", "abcd", "azd").toDF("w")
    val out = FuzzyJoin.editPairs(df, "w", maxEdits = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    // lexicographic pair order: "abcd" < "abd"
    assert(out === Map(("abc", "abd") -> 1, ("abc", "abcd") -> 1,
      ("abcd", "abd") -> 1, ("abd", "azd") -> 1))
  }

  test("plan: candidates come from an equi-join, not a cross product") {
    import spark.implicits._
    val df = Seq("abc", "abd").toDF("w")
    val plan = FuzzyJoin.editPairs(df, "w").queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("NestedLoop"),
      s"fuzzy join must block, not cross:\n$plan")
  }
}
