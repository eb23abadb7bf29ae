package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DecimalType, LongType}

/** Two-sided CUSUM changepoint monitor (Page 1954) — the sequential
  * drift detector next to [[graft.queries.CurationQueries]]'s batch
  * PSI screen: per key, standardize each observation against the
  * key's reference mean/σ, then run the cumulative-sum recursions
  *
  *   S⁺ₜ = max(0, S⁺ₜ₋₁ + zₜ − slack),  S⁻ₜ = max(0, S⁻ₜ₋₁ − zₜ − slack)
  *
  * and flag an alarm when either statistic crosses the threshold
  * (both reset after an alarm — Page's restart). Emits EVERY row with
  * its statistics, so the full trajectory is oracle-hash-checked, not
  * just the (rare by design) alarms.
  *
  * Determinism: reference moments are DECIMAL-exact sums assembled
  * into μ/σ in ONE fixed double expression (the corr_features
  * pattern); zₜ quantizes to integer micro-σ units immediately
  * (LangModel policy) and the recursion is PURE 64-bit integer
  * arithmetic — bit-reproducible and restated in the oracle as a
  * per-key recursive SQL chain (the ImbalanceBars reset-state trick,
  * row-stepped).
  *
  * Scale design (100 TB): like every reset-accumulator operator the
  * scan is `repartition(key) + sortWithinPartitions + one sequential
  * mapPartitions pass` — O(n) with parallelism = key cardinality and
  * O(1) state per key; the moment pass is one combiner-friendly
  * aggregation joined back broadcast-style. Keys with σ = 0 or a
  * single row are dropped (standardization undefined) — mirrored in
  * the oracle.
  */
object Cusum {

  /** `(key, orderCols…, z_micro, s_plus, s_minus, alarm)` per row. */
  def monitor(df: DataFrame, keyCol: String, orderCols: Seq[String],
              valueCol: String, slackMicro: Long,
              thresholdMicro: Long): DataFrame = {
    val p = col(valueCol).cast(DecimalType(19, 4)).as("__p")
    val base = df.select((col(keyCol) +: orderCols.map(col)) :+ p: _*)
    val m = base.groupBy(keyCol).agg(
      count(lit(1)).as("__n"),
      sum(col("__p")).as("__s"),
      sum(col("__p") * col("__p")).as("__ss"))
    def dbl(c: String) = col(c).cast("double")
    val nD = col("__n").cast("double")
    val mu = dbl("__s") / nD
    val sigma = sqrt(nD * dbl("__ss") - dbl("__s") * dbl("__s")) / nD
    val stats = m.select(col(keyCol), col("__n"), mu.as("__mu"),
        sigma.as("__sigma"))
      .filter(col("__n") >= 2 && col("__sigma") > 0.0)

    val zed = base.join(stats, keyCol)
      .select((col(keyCol) +: orderCols.map(col)) :+
        floor((col("__p").cast("double") - col("__mu")) / col("__sigma")
          * lit(1e6) + lit(0.5)).cast("long").as("z_micro"): _*)

    val outSchema = zed.schema
      .add("s_plus", LongType).add("s_minus", LongType)
      .add("alarm", BooleanType)
    val keyIdx = zed.schema.fieldIndex(keyCol)
    val zIdx = zed.schema.fieldIndex("z_micro")
    zed.repartition(col(keyCol))
      .sortWithinPartitions((keyCol +: orderCols).map(col): _*)
      .mapPartitions { it =>
        var curKey: Any = null
        var started = false
        var sp = 0L
        var sm = 0L
        it.map { row =>
          val k = row.get(keyIdx)
          if (!started || k != curKey) {
            curKey = k; started = true; sp = 0L; sm = 0L
          }
          val z = row.getLong(zIdx)
          sp = math.max(0L, sp + z - slackMicro)
          sm = math.max(0L, sm - z - slackMicro)
          val alarm = sp >= thresholdMicro || sm >= thresholdMicro
          val out = Row.fromSeq(row.toSeq :+ sp :+ sm :+ alarm)
          if (alarm) { sp = 0L; sm = 0L }
          out
        }
      }(Encoders.row(outSchema))
  }
}
