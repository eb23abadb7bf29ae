package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-bucketized range (interval) self-join — the no-equi-key case
  * Spark's planner can only express as a BroadcastNestedLoopJoin
  * (O(n²) comparisons): "all pairs of events within ±tolerance of
  * each other". Blocking by time bucket turns it into an equi-join:
  *
  *  - every row gets bucket `b = t div W` (W = tolerance; integer
  *    division — float bucketing can mis-bucket boundary values);
  *  - the left occurrence of each row explodes to buckets
  *    {b−1, b, b+1}; the right occurrence keeps its single bucket;
  *  - `|ta − tb| ≤ W ⇒ bucket(b-side) ∈ {bucket(a)−1, …, +1}`, so the
  *    equi-join on bucket is COMPLETE, and because the right bucket
  *    is unique per row each qualifying pair matches exactly once —
  *    no dedup pass needed (unlike LSH candidate generation, this
  *    blocking is lossless, so the oracle stays the plain theta
  *    join).
  *
  * Scale: one shuffle keyed by bucket; per-bucket cost is (events per
  * tolerance window)² — the data-rate-bounded quantity — instead of
  * (all events)². Skewed hot windows can be salted on (bucket,
  * id-range) if a burst dominates.
  */
object RangeJoin {

  /** All pairs (id_a < id_b) with |t_b − t_a| ≤ toleranceUs; emits
    * (id_a, id_b, dt_us) with dt_us = t_b − t_a.
    */
  def selfPairs(df: DataFrame, idCol: String, tsCol: String,
                toleranceUs: Long): DataFrame = {
    val base = df.select(col(idCol).as("id"), unix_micros(col(tsCol)).as("t"))
      .withColumn("b", expr(s"t div ${toleranceUs}L"))
    val lhs = base.select(col("id").as("id_a"), col("t").as("t_a"),
      explode(array(col("b") - 1, col("b"), col("b") + 1)).as("jb"))
    val rhs = base.select(col("id").as("id_b"), col("t").as("t_b"),
      col("b").as("jb"))
    lhs.join(rhs, Seq("jb"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("t_b") - col("t_a")) <= toleranceUs)
      .select(col("id_a"), col("id_b"), (col("t_b") - col("t_a")).as("dt_us"))
  }
}
