package graft.schema

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

/** Typed `Dataset[T]` views over the wire DataFrames (SURVEY.md §1.4):
  * `DataFrame` stays the norm (dynamic schema at the envelope edge),
  * these give compile-time field safety where per-record logic wants
  * it (e.g. `flatMapGroupsWithState` stages). All fields Option-al to
  * match the nullable-everything wire schemas.
  */
object TypedViews {

  def trades(df: DataFrame): Dataset[Trade] =
    df.select("code", "timestamp", "trade_price", "trade_volume",
      "ask_bid", "sequential_id", "arrive_time")
      .as(Encoders.product[Trade])

  def orderbooks(df: DataFrame): Dataset[Orderbook] =
    df.select("code", "timestamp", "total_ask_size", "total_bid_size",
      "orderbook_units", "arrive_time")
      .as(Encoders.product[Orderbook])
}
