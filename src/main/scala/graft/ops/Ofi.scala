package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order-flow imbalance — the reference's lag-based feature
  * (SURVEY.md W3+P7, `kafka_upbit_realtime_processing.py:121-128`).
  *
  * Two forms:
  *
  * - [[withBookOfi]] — the reference's actual two-sided formula: lag
  *   the *struct* of the best book level per instrument and apply the
  *   sign logic to bid and ask sides separately:
  *   {{{
  *   ofi = (bid_price >= prev.bid_price ?  bid_size : -prev.bid_size)
  *       - (ask_price <= prev.ask_price ?  ask_size : +prev.ask_size)
  *   }}}
  *   (note the ask otherwise-branch is +prev_ask_size in the
  *   reference — `kafka_upbit_realtime_processing.py:127`).
  *
  * - [[withOfi]] — a single-series variant applying both comparisons
  *   to one (price, size) stream with −prev_size in both otherwise
  *   branches (the standard Cont-et-al. OFI sign convention). This is
  *   an intentional DEVIATION from the reference's two-sided form,
  *   kept as the one-series feature for flat event streams.
  *
  * First row per key → null (lag default). Scale: one hash shuffle on
  * the key + per-partition sort; `lag(1)` needs no buffering beyond
  * the sort — linear.
  */
object Ofi {

  /** Appends `prev_<price>`, `prev_<size>` and `outCol` (single-series
    * Cont-style variant — see object doc for the deviation note).
    */
  def withOfi(df: DataFrame, keyCol: String, orderCols: Seq[String],
              priceCol: String, sizeCol: String, outCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols.map(col): _*)
    val prevP = lag(col(priceCol), 1).over(w)
    val prevS = lag(col(sizeCol), 1).over(w)
    val bidTerm: Column = when(col(priceCol) >= prevP, col(sizeCol)).otherwise(-prevS)
    val askTerm: Column = when(col(priceCol) <= prevP, col(sizeCol)).otherwise(-prevS)
    df.withColumn(s"prev_$priceCol", prevP)
      .withColumn(s"prev_$sizeCol", prevS)
      .withColumn(outCol, bidTerm - askTerm)
  }

  /** Two-sided book OFI, reference-exact
    * (`kafka_upbit_realtime_processing.py:121-128`): lags the best
    * bid/ask book as ONE struct column (SURVEY.md W3 — `lag` on a
    * struct works natively, a single window function instead of four)
    * and applies the per-side sign logic. Appends flattened
    * `prev_bid_price`, `prev_bid_size`, `prev_ask_price`,
    * `prev_ask_size` and `outCol`.
    */
  def withBookOfi(df: DataFrame, keyCol: String, orderCols: Seq[String],
                  bidPriceCol: String, bidSizeCol: String,
                  askPriceCol: String, askSizeCol: String,
                  outCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols.map(col): _*)
    val book = struct(
      col(bidPriceCol).as("bid_price"), col(bidSizeCol).as("bid_size"),
      col(askPriceCol).as("ask_price"), col(askSizeCol).as("ask_size"))
    // The lag is materialized once as a column; terms read the
    // materialized struct so the window function runs exactly once.
    val withPrev = df.withColumn("__prev_book", lag(book, 1).over(w))
    val bidTerm: Column = when(col(bidPriceCol) >= col("__prev_book.bid_price"),
      col(bidSizeCol)).otherwise(-col("__prev_book.bid_size"))
    val askTerm: Column = when(col(askPriceCol) <= col("__prev_book.ask_price"),
      col(askSizeCol)).otherwise(col("__prev_book.ask_size"))
    withPrev
      .withColumn("prev_bid_price", col("__prev_book.bid_price"))
      .withColumn("prev_bid_size", col("__prev_book.bid_size"))
      .withColumn("prev_ask_price", col("__prev_book.ask_price"))
      .withColumn("prev_ask_size", col("__prev_book.ask_size"))
      .withColumn(outCol, bidTerm - askTerm)
      .drop("__prev_book")
  }
}
