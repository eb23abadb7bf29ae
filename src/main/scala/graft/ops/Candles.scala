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
  * OHLC (open/high/low/close/avg/volatility) aggregate the PRICE
  * column; volume and the conditional side volume aggregate the
  * VOLUME column — the reference sums `trade_volume`, not prices
  * (`kafka_to_kafka_by_spark_for_druid.py:119-129`). The optional
  * latency column adds the reference's `mean(time_diff)` collection
  * latency per candle (`:107,131`).
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

  /** Money/value columns: DECIMAL(18,4) — exact, wide enough for
    * KRW-scale prices (up to 10¹⁴; a 10,4 cast would overflow BTC/KRW
    * ~1e8 and null out sums with ANSI off), and narrow enough that
    * v*v = DECIMAL(37,8) still fits precision 38 as a sum.
    */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** The candle aggregate list: OHLC over `priceCol` ordered by
    * `tsCol`, (side-)volume sums over `volCol` where
    * `sideCol === sideValue` selects the conditional rows (reference:
    * `ask_bid == "ASK"`), plus `mean(latencyCol)` when given.
    */
  def aggs(tsCol: String, priceCol: String, volCol: String,
           sideCol: String, sideValue: String,
           latencyCol: Option[String] = None): Seq[Column] = {
    val p = col(priceCol)
    val n = count(lit(1))
    val sx = sum(dec(p)).cast("double")
    val sxx = sum(dec(p) * dec(p)).cast("double")
    val base = Seq(
      min_by(p, col(tsCol)).as("open"),
      max(p).as("high"),
      min(p).as("low"),
      max_by(p, col(tsCol)).as("close"),
      sum(dec(col(volCol))).cast("double").as("volume"),
      sum(when(col(sideCol) === sideValue, dec(col(volCol)))
        .otherwise(lit(0).cast(DecimalType(18, 4))))
        .cast("double").as("side_volume"),
      (sum(dec(p)).cast("double") / n).as("avg_value"),
      when(n > 1, sqrt(greatest((sxx - sx * sx / n) / (n - lit(1)), lit(0.0))))
        .as("volatility"),
      n.as("n_events")
    )
    base ++ latencyCol.map(lc =>
      (sum(dec(col(lc))).cast("double") / n).as("avg_latency")).toSeq
  }

  /** Tumbling event-time candles (`window(ts, dur)`), flattened to
    * `window_start`/`window_end` columns.
    */
  def tumbling(df: DataFrame, tsCol: String, keyCol: String, priceCol: String,
               sideCol: String, sideValue: String, dur: String,
               volCol: String = null, latencyCol: Option[String] = None): DataFrame =
    candle(df, window(col(tsCol), dur), tsCol, keyCol, priceCol,
      Option(volCol).getOrElse(priceCol), sideCol, sideValue, latencyCol)

  /** Sliding event-time candles (`window(ts, dur, slide)`). */
  def sliding(df: DataFrame, tsCol: String, keyCol: String, priceCol: String,
              sideCol: String, sideValue: String, dur: String, slide: String,
              volCol: String = null, latencyCol: Option[String] = None): DataFrame =
    candle(df, window(col(tsCol), dur, slide), tsCol, keyCol, priceCol,
      Option(volCol).getOrElse(priceCol), sideCol, sideValue, latencyCol)

  private def candle(df: DataFrame, win: Column, tsCol: String, keyCol: String,
                     priceCol: String, volCol: String, sideCol: String,
                     sideValue: String, latencyCol: Option[String]): DataFrame = {
    val as = aggs(tsCol, priceCol, volCol, sideCol, sideValue, latencyCol)
    val names = aggNames ++ latencyCol.map(_ => "avg_latency").toSeq
    df.groupBy(win, col(keyCol))
      .agg(as.head, as.tail: _*)
      .select(Seq(col("window.start").as("window_start"), col("window.end").as("window_end"), col(keyCol)) ++
        names.map(col): _*)
  }

  val aggNames: Seq[String] =
    Seq("open", "high", "low", "close", "volume", "side_volume", "avg_value", "volatility", "n_events")

  /** Gap-fill a bucketed-candle table to a regular grid: groupBy-based
    * candles emit NO row for an empty interval, but downstream
    * consumers (charting, feature windows, resample joins) need one
    * row per (key, bucket) with the last close carried forward.
    *
    * Each key's spine spans its own [min, max] bucket range —
    * `sequence(min, max, step)` exploded map-side off a 1-row-per-key
    * aggregate (never a driver-side loop), then a left join back and
    * a forward-fill window (`last ignoreNulls`) per fill column.
    *
    * Scale notes: the spine explode is O(#keys × #buckets) — the size
    * of the OUTPUT, not the input; the join and window shuffle on the
    * same key so the exchange is reused. Dense-output gap fill at
    * 100 TB is dominated by the output write, as it should be.
    *
    * @param step a calendar-interval expression, e.g.
    *             `expr("interval 1 hour")` — must match the bucketing
    *             of `bucketCol`
    * @return the spine row set with original columns (null on empty
    *         buckets) plus `<c>_ff` forward-filled variants of
    *         `fillCols` and a `has_data` flag
    */
  def gapFill(candles: DataFrame, keyCol: String, bucketCol: String,
              step: Column, fillCols: Seq[String]): DataFrame = {
    val spine = candles.groupBy(col(keyCol))
      .agg(min(col(bucketCol)).as("__mn"), max(col(bucketCol)).as("__mx"))
      .select(col(keyCol),
        explode(sequence(col("__mn"), col("__mx"), step)).as(bucketCol))
    val joined = spine.join(candles, Seq(keyCol, bucketCol), "left")
      .withColumn("has_data", col(fillCols.head).isNotNull)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(bucketCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // all fills in ONE select = one Window node; a withColumn per fill
    // column would plan one Window (sort + frame scan) each — the
    // CollapseWindow-blocked-by-Project trap (see Indicators.bollinger)
    joined.select(joined.columns.toIndexedSeq.map(col) ++ fillCols.map(c =>
      last(col(c), ignoreNulls = true).over(w).as(s"${c}_ff")): _*)
  }
}
