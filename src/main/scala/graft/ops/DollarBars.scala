package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dollar-bar construction — the flagship batch analytic of the
  * reference (`processing_raw_data_from_gcs.py:108-141`): a running
  * cumulative notional per instrument (SURVEY.md W1), floor-bucketed
  * into fixed-notional bars (P11), then OHLCV-aggregated per bar
  * (A1-A5).
  *
  * Determinism fix (SURVEY.md §2.4 A2): the reference uses
  * `first`/`last` in the bar aggregation, which in vanilla Spark are
  * order-nondeterministic under shuffles; we use `min_by`/`max_by`
  * keyed on event time (unique in the testdata) — identical results
  * on ordered input, reproducible anywhere.
  *
  * The notional column is expected to be DECIMAL so the running sum is
  * exact and associative — bar boundaries then do not depend on
  * partitioning or evaluation order (SURVEY.md §7.4).
  *
  * Scale notes (100 TB): the cumulative sum is a per-key sequential
  * scan — parallelism equals key cardinality. The reference has only 3
  * instrument codes, so this window stage caps at 3 tasks at any data
  * size; with realistic key counts (1 500 at sf0.1, millions in
  * production) the hash exchange spreads evenly. For the few-keys case
  * the fix is a two-phase parallel prefix sum (per-partition partial
  * sums collected once, offsets broadcast back — O(#partitions) driver
  * data). The bar aggregation itself is a partial+final HashAggregate
  * and scales linearly.
  */
object DollarBars {

  /** Appends `cumsum` (running notional, DOUBLE) and `bar_num` (INT). */
  def withBarNum(
      df: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      notionalCol: String,
      barSize: Double
  ): DataFrame = {
    val w = Window
      .partitionBy(keyCol)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cumsum", sum(col(notionalCol)).over(w).cast("double"))
      .withColumn("bar_num", floor(col("cumsum") / barSize).cast("int"))
  }

  /** [[bars]] with the cumsum computed by the two-phase distributed
    * prefix sum (PrefixSum) instead of a per-key window — identical
    * results (decimal-exact), parallelism independent of key count.
    * This is the plan to run at 100 TB with 3 instrument codes.
    */
  def barsScalable(df: DataFrame, keyCol: String, timeCol: String,
                   priceCol: String, notionalCol: String, barSize: Double): DataFrame =
    PrefixSum.withRunningSum(df, keyCol, Seq(timeCol), notionalCol, "cumsum")
      .withColumn("bar_num", floor(col("cumsum") / barSize).cast("int"))
      .groupBy(col(keyCol), col("bar_num"))
      .agg(barAggs(timeCol, priceCol, notionalCol).head,
        barAggs(timeCol, priceCol, notionalCol).tail: _*)

  /** OHLCV bars keyed by (key, bar_num). `timeCol` must totally order
    * rows within a key.
    */
  def bars(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      priceCol: String,
      notionalCol: String,
      barSize: Double
  ): DataFrame =
    withBarNum(df, keyCol, Seq(timeCol), notionalCol, barSize)
      .groupBy(col(keyCol), col("bar_num"))
      .agg(barAggs(timeCol, priceCol, notionalCol).head,
        barAggs(timeCol, priceCol, notionalCol).tail: _*)

  private def barAggs(timeCol: String, priceCol: String,
                      notionalCol: String): Seq[org.apache.spark.sql.Column] = Seq(
    min_by(col(priceCol), col(timeCol)).as("open"),
    max(col(priceCol)).as("high"),
    min(col(priceCol)).as("low"),
    max_by(col(priceCol), col(timeCol)).as("close"),
    sum(col(notionalCol)).cast("double").as("volume"),
    count(lit(1)).as("n_trades"),
    min(col(timeCol)).as("start_ts"),
    max(col(timeCol)).as("end_ts")
  )
}
