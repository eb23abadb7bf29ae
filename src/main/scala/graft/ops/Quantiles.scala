package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group discrete quantiles by rank selection: the value at
  * rank `ceil(p·n/100)` in (value, tie) order. Pure row selection —
  * no floating-point arithmetic touches the data, so results are
  * engine-exact; the rank itself is computed in INTEGER arithmetic
  * (`(p·n + 99) div 100`) because `ceil(0.9 * n)` in doubles can land
  * on either side of an exact multiple depending on the engine's
  * literal type (DuckDB parses 0.9 as DECIMAL, Spark as DOUBLE).
  *
  * Scale: needs a full per-group sort — inherent to exact quantiles.
  * The 100 TB path is `approx_percentile` (GK/KLL-style mergeable
  * summaries, one pass, no sort); QuantilesSpec bounds it against
  * this exact operator the same way SketchSpec bounds HLL against
  * exact distinct counts.
  */
object Quantiles {

  /** @param pcts integer percentiles in (0, 100]. */
  def exactQuantiles(df: DataFrame, keyCol: String, valCol: String,
                     tieCol: String, pcts: Seq[Int]): DataFrame = {
    require(pcts.forall(p => p > 0 && p <= 100), "percentiles must be in (0,100]")
    val wRank = Window.partitionBy(keyCol).orderBy(col(valCol), col(tieCol))
    df.withColumn("__rn", row_number().over(wRank))
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy(keyCol)))
      .withColumn("pct", explode(array(pcts.map(lit): _*)))
      .filter(col("__rn") === expr("(pct * __cnt + 99) div 100"))
      .select(col(keyCol), col("pct"), col(valCol).as("quantile_value"),
        col("__cnt").as("n"))
  }

  /** Per-group IQR outlier detection (Tukey fences): rows outside
    * `[q1 − k·IQR, q3 + k·IQR]` of their group — the standard
    * pre-training numeric-cleaning rule. Quartiles come from
    * [[exactQuantiles]] (rank selection, engine-exact); the
    * group-bounds table is group-count-sized and broadcasts, so the
    * flagging pass is a map-side join over the fact scan. All bound
    * arithmetic is plain IEEE on values selected from the data —
    * bit-identical across engines.
    */
  def iqrOutliers(df: DataFrame, keyCol: String, valCol: String,
                  tieCol: String, k: Double = 1.5): DataFrame = {
    val bounds = exactQuantiles(df, keyCol, valCol, tieCol, Seq(25, 75))
      .groupBy(col(keyCol))
      .agg(max(when(col("pct") === 25, col("quantile_value"))).as("q1"),
        max(when(col("pct") === 75, col("quantile_value"))).as("q3"))
      .withColumn("lo", col("q1") - lit(k) * (col("q3") - col("q1")))
      .withColumn("hi", col("q3") + lit(k) * (col("q3") - col("q1")))
    df.join(broadcast(bounds), keyCol)
      .filter(col(valCol) < col("lo") || col(valCol) > col("hi"))
      .select(col(keyCol), col(tieCol), col(valCol), col("lo"), col("hi"))
  }

  /** Per-group winsorization: clip values into their group's
    * [p_lo, p_hi] exact-quantile envelope instead of dropping them —
    * the gentler sibling of [[iqrOutliers]] for feature pipelines
    * where row loss is worse than tail distortion. The bounds come
    * from rank selection (values FROM the data, no float arithmetic),
    * the clip is `least(greatest(...))` on a broadcast bounds join —
    * map-side at any scale.
    */
  def winsorize(df: DataFrame, keyCol: String, valCol: String,
                tieCol: String, loPct: Int = 1, hiPct: Int = 99): DataFrame = {
    val bounds = exactQuantiles(df, keyCol, valCol, tieCol, Seq(loPct, hiPct))
      .groupBy(col(keyCol))
      .agg(max(when(col("pct") === loPct, col("quantile_value"))).as("lo"),
        max(when(col("pct") === hiPct, col("quantile_value"))).as("hi"))
    df.join(broadcast(bounds), keyCol)
      .withColumn(s"${valCol}_wins",
        least(greatest(col(valCol), col("lo")), col("hi")))
  }
}
