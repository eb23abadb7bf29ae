package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance self-join by DELETION-NEIGHBORHOOD blocking (the
  * SymSpell decomposition, Garbe 2012 — public algorithm): two
  * strings within Levenshtein distance d share at least one variant
  * obtainable by deleting ≤ d characters from each, so candidate
  * pairs come from an EQUI-join on deletion variants and only
  * candidates pay the exact `levenshtein` verify — never the O(n²)
  * cross product a naive fuzzy join plans.
  *
  * Scale shape: variants explode map-side (1 + L + L(L−1)/2 per
  * string at d = 2 — ~37 rows for an 8-char word), the candidate
  * join is a plain shuffle hash/sort-merge equi-join on the variant
  * string, and the pair set dedups on the SKINNY (w1, w2) projection
  * before the verify (the NOTES_r6 fat-shuffle lesson). Variant
  * fan-in is inherently output-bounded: a variant's bucket holds
  * exactly the strings within ≤ d deletions of it, the same strings
  * a correct join must pair anyway.
  */
object FuzzyJoin {

  /** One-character-deletion variants of `s` (length must be bound to
    * an attribute by the caller — HOF inlining discipline).
    */
  private def deletes1(s: Column, slen: Column): Column =
    transform(sequence(lit(1), slen), i =>
      concat(s.substr(lit(1), i - 1), s.substr(i + 1, slen)))

  /** All distinct variants of `s` with at most `maxEdits` ∈ {1, 2}
    * deletions, including `s` itself.
    */
  def deletionVariants(s: Column, slen: Column, maxEdits: Int): Column = {
    require(maxEdits == 1 || maxEdits == 2, "maxEdits must be 1 or 2")
    val d1 = deletes1(s, slen)
    val all =
      if (maxEdits == 1) concat(array(s), d1)
      else concat(array(s), d1,
        flatten(transform(d1, v => transform(sequence(lit(1), length(v)), i =>
          concat(v.substr(lit(1), i - 1), v.substr(i + 1, length(v)))))))
    array_distinct(all)
  }

  /** Distinct unordered pairs (w1 < w2, dist) of `strCol` values
    * within Levenshtein distance `maxEdits`. Exact: the deletion
    * neighborhood is a complete candidate generator for ≤ maxEdits
    * (FuzzyJoinSpec proves equality with the brute-force all-pairs
    * join on the corpus vocabulary).
    */
  def editPairs(df: DataFrame, strCol: String, maxEdits: Int = 2): DataFrame = {
    val base = df.select(col(strCol).cast("string").as("w"))
      .filter(col("w").isNotNull && length(col("w")) > 0)
      .distinct()
      .withColumn("wlen", length(col("w")))
    val vars = base.select(col("w"),
      explode(deletionVariants(col("w"), col("wlen"), maxEdits)).as("v"))
    vars.as("a").join(vars.as("b"),
        col("a.v") === col("b.v") && col("a.w") < col("b.w"))
      .select(col("a.w").as("w1"), col("b.w").as("w2"))
      .distinct()
      .withColumn("dist", levenshtein(col("w1"), col("w2")))
      .filter(col("dist") <= maxEdits)
  }
}
