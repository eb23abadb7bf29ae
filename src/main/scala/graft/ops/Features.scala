package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-group feature normalization — the last step before training
  * data leaves the engine: min-max to [0,1] and z-score against the
  * group's population moments.
  *
  * Shape: one partial-aggregated groupBy produces the per-group stats
  * table (|groups| rows — broadcasts at any corpus scale), then a
  * map-side broadcast join + projection normalizes every row. Two
  * scans, zero wide shuffles of the fact side.
  *
  * Determinism: min/max are order-free; mean/σ come from exact
  * DECIMAL moments evaluated in one fixed DOUBLE expression shape
  * (Registry policy). Degenerate groups are pinned, not left to ±∞ /
  * ANSI errors: constant groups (max = min, σ = 0) yield null
  * `minmax` / `zscore`.
  */
object Features {

  /** Appends `minmax` and `zscore` (population σ) for `valCol` within
    * each `keyCol` group.
    *
    * Decimal headroom matches the DECIMAL(19,4) oracles: plain sums at
    * (20,4); the squared-moment operands at (18,4) so the product is
    * (37,8) — still exact at scale 8 ((19,4)² would cap at Spark's
    * 38-precision limit and LOSE a scale digit). Input contract:
    * |value| < 10¹⁴.
    */
  def scale(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val v = col(valCol).cast(DecimalType(20, 4))
    val vSq = col(valCol).cast(DecimalType(18, 4))
    val stats = df.groupBy(col(keyCol)).agg(
      count(lit(1)).as("__n"),
      min(col(valCol)).as("__mn"),
      max(col(valCol)).as("__mx"),
      sum(v).cast("double").as("__s"),
      sum(vSq * vSq).cast("double").as("__s2"))
    val nD = col("__n").cast("double")
    val mean = col("__s") / nD
    val sd = sqrt(greatest(col("__s2") - col("__s") * col("__s") / nD, lit(0.0)) / nD)
    df.join(broadcast(stats), keyCol)
      .withColumn("minmax",
        when(col("__mx") === col("__mn"), lit(null).cast("double"))
          .otherwise((col(valCol) - col("__mn")) / (col("__mx") - col("__mn"))))
      .withColumn("__sd", sd)
      .withColumn("zscore",
        when(col("__sd") === 0.0, lit(null).cast("double"))
          .otherwise((col(valCol) - mean) / col("__sd")))
      .drop("__n", "__mn", "__mx", "__s", "__s2", "__sd")
  }
}
