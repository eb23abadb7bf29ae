package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe two-phase aggregation. A plain `groupBy(key)` sends every
  * row of a hot key through one reducer — with the reference's 3
  * instrument codes (SURVEY §7.4) a 100 TB aggregation would run on 3
  * cores. Salting splits each key into `salts` sub-groups for the
  * first (parallel) aggregation, then merges the per-salt partials in
  * a second, tiny aggregation over #keys × salts rows.
  *
  * Only decomposable aggregates are offered (sum/count/min/max — the
  * merge of partials equals the direct aggregate; sums stay exact
  * when the input is DECIMAL), so the salted result is bit-identical
  * to the unsalted one: the oracle for a salted query is simply the
  * plain GROUP BY (proved equal in SaltingSpec).
  *
  * Note Spark's map-side partial aggregation already gives this
  * shape for pre-shuffle combining; explicit salting additionally
  * randomizes the REDUCER placement, which matters when per-key
  * partial results are still too many/large for one task (high
  * distinct-subkey payloads, or AQE skew handling unavailable, e.g.
  * non-join aggregations over a handful of keys).
  */
object Salting {

  /** Decimal-exact stats per key, computed via a `salts`-way salted
    * first phase. `saltCol` must be a deterministic per-row integer
    * expression (e.g. `pmod(id, n)`) — its value never affects the
    * result, only the placement.
    */
  def saltedStats(df: DataFrame, keyCols: Seq[String], saltCol: Column,
                  decValCol: String, rawValCol: String, salts: Int): DataFrame = {
    val phase1 = df
      .withColumn("__salt", pmod(saltCol, lit(salts)))
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(
        sum(col(decValCol)).as("__sum"),
        count(lit(1)).as("__cnt"),
        min(col(rawValCol)).as("__min"),
        max(col(rawValCol)).as("__max"))
    phase1
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(col("__sum")).cast("double").as("sum_value"),
        sum(col("__cnt")).as("n_events"),
        min(col("__min")).as("min_value"),
        max(col("__max")).as("max_value"))
  }
}
