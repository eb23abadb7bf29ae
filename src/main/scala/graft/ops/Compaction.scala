package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregation: maintain per-key stats as new batches
  * arrive WITHOUT rescanning history. The stats schema is a mergeable
  * partial aggregate — sum/count/min/max are decomposable, and the
  * sum is DECIMAL so merging is exact and order-independent:
  * `merge(stats(A), stats(B)) == stats(A ∪ B)` bit-for-bit (proved by
  * the `incremental_stats` oracle, which IS the plain full-table
  * GROUP BY, and property-checked over random splits in
  * CompactionSpec).
  *
  * This is the 100 TB daily-pipeline shape: each day aggregates only
  * its delta (O(day)), then one tiny merge over #keys rows folds it
  * into the base table — the full-history scan never happens. Same
  * algebra Spark's own partial aggregation uses within a query,
  * lifted to a persisted cross-run contract.
  */
object Compaction {

  /** Mergeable per-key stats of one batch. `decValCol` must be the
    * DECIMAL cast of the measure (exactness ⇒ merge associativity).
    */
  def stats(df: DataFrame, keyCols: Seq[String], decValCol: String,
            rawValCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(
        sum(col(decValCol)).as("sum_dec"),
        count(lit(1)).as("n_events"),
        min(col(rawValCol)).as("min_value"),
        max(col(rawValCol)).as("max_value"))

  /** Merge any number of stats frames into one (re-aggregate the
    * partials). Input size is O(#keys × #batches) — trivial next to
    * the deltas themselves.
    */
  def merge(parts: Seq[DataFrame], keyCols: Seq[String]): DataFrame =
    parts.reduce(_.unionByName(_))
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(col("sum_dec")).as("sum_dec"),
        sum(col("n_events")).as("n_events"),
        min(col("min_value")).as("min_value"),
        max(col("max_value")).as("max_value"))

  /** Final user-facing projection (double sum like the query surface). */
  def finish(df: DataFrame): DataFrame =
    df.withColumn("sum_value", col("sum_dec").cast("double")).drop("sum_dec")
}
