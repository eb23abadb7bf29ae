package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** OHLCV candle aggregation over event-time windows — the core of the
  * reference's streaming feature pipelines
  * (`kafka_to_kafka_by_spark_for_druid.py:100-132` tumbling 10 s,
  * `kafka_upbit_realtime_processing.py:108-194` sliding 10 min / 15 s).
  * SURVEY.md T2/T3 + A1-A7.
  *
  * Works identically on batch and streaming DataFrames — `window()` +
  * `groupBy().agg()` is incremental-execution-safe; the streaming
  * wrapper only adds `withWatermark` (graft.stream).
  *
  * Determinism (SURVEY.md §2.4 A2, §7.4): open/close use
  * `min_by`/`max_by` on event time instead of the reference's
  * order-nondeterministic `first`/`last`; sums go through fixed-scale
  * DECIMAL (exact + associative ⇒ partitioning-independent); the
  * volatility (A7 `stddev`) is computed from exact decimal moments
  * `sqrt(max((Σx² − (Σx)²/n)/(n−1), 0))` so both Spark and the DuckDB
  * oracle perform the identical IEEE double ops — vanilla
  * `stddev_samp` is merge-order-sensitive at the 1e-15 level.
  *
  * Scale notes (100 TB): tumbling windows are a single partial+final
  * HashAggregate shuffle keyed (window, key) — linear scale-out, no
  * skew beyond key skew (salt the key if one instrument dominates).
  * Sliding windows expand each row into dur/slide window copies
  * *before* the shuffle (Spark plans `Expand`); partial aggregation
  * still collapses them map-side, so network volume is
  * O(#windows × #keys), not O(rows × dur/slide).
  */
object Candles {

  /** Money/value columns: DECIMAL(10,4) — exact, and narrow enough
    * that v*v = DECIMAL(21,8) stays within precision 38 as a sum.
    */
  private def dec(c: Column): Column = c.cast(DecimalType(10, 4))

  /** The candle aggregate list over `valCol`, ordered by `tsCol`;
    * `sideCol === sideValue` selects the rows for the conditional
    * volume (reference: `ask_bid == "ASK"`).
    */
  def aggs(tsCol: String, valCol: String, sideCol: String, sideValue: String): Seq[Column] = {
    val v = col(valCol)
    val n = count(lit(1))
    val sx = sum(dec(v)).cast("double")
    val sxx = sum(dec(v) * dec(v)).cast("double")
    Seq(
      min_by(v, col(tsCol)).as("open"),
      max(v).as("high"),
      min(v).as("low"),
      max_by(v, col(tsCol)).as("close"),
      sum(dec(v)).cast("double").as("volume"),
      sum(when(col(sideCol) === sideValue, dec(v)).otherwise(lit(0).cast(DecimalType(10, 4))))
        .cast("double").as("side_volume"),
      (sum(dec(v)).cast("double") / n).as("avg_value"),
      when(n > 1, sqrt(greatest((sxx - sx * sx / n) / (n - lit(1)), lit(0.0))))
        .as("volatility"),
      n.as("n_events")
    )
  }

  /** Tumbling event-time candles (`window(ts, dur)`), flattened to
    * `window_start`/`window_end` columns.
    */
  def tumbling(df: DataFrame, tsCol: String, keyCol: String, valCol: String,
               sideCol: String, sideValue: String, dur: String): DataFrame =
    candle(df, window(col(tsCol), dur), tsCol, keyCol, valCol, sideCol, sideValue)

  /** Sliding event-time candles (`window(ts, dur, slide)`). */
  def sliding(df: DataFrame, tsCol: String, keyCol: String, valCol: String,
              sideCol: String, sideValue: String, dur: String, slide: String): DataFrame =
    candle(df, window(col(tsCol), dur, slide), tsCol, keyCol, valCol, sideCol, sideValue)

  private def candle(df: DataFrame, win: Column, tsCol: String, keyCol: String,
                     valCol: String, sideCol: String, sideValue: String): DataFrame = {
    val as = aggs(tsCol, valCol, sideCol, sideValue)
    df.groupBy(win, col(keyCol))
      .agg(as.head, as.tail: _*)
      .select(Seq(col("window.start").as("window_start"), col("window.end").as("window_end"), col(keyCol)) ++
        aggNames.map(col): _*)
  }

  val aggNames: Seq[String] =
    Seq("open", "high", "low", "close", "volume", "side_volume", "avg_value", "volatility", "n_events")
}
