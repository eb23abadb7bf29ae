package graft.schema

import org.apache.spark.sql.types._

/** The reference's two wire schemas, declared once (the reference
  * re-declares them in six files — SURVEY.md §1.2/§1.3; canonical copy
  * `kafka_to_gcs_by_spark_batch.py:18-58`). Explicit and
  * nullable-everything, selected by topic name; schema inference is
  * never used on the hot path.
  */
object UpbitSchemas {

  /** `upbit_trade` — flat trade tick (15 fields). */
  val trade: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("code", StringType),
    StructField("timestamp", LongType),          // exchange epoch millis
    StructField("trade_date", StringType),
    StructField("trade_time", StringType),
    StructField("trade_timestamp", LongType),
    StructField("trade_price", DoubleType),
    StructField("trade_volume", DoubleType),
    StructField("ask_bid", StringType),          // "ASK" | "BID"
    StructField("prev_closing_price", DoubleType),
    StructField("change", StringType),
    StructField("change_price", DoubleType),
    StructField("sequential_id", LongType),      // monotone per code
    StructField("stream_type", StringType),
    StructField("arrive_time", DoubleType)       // collector epoch seconds
  ))

  /** Order-book price level (best at index 0). */
  val orderbookUnit: StructType = StructType(Seq(
    StructField("ask_price", DoubleType),
    StructField("bid_price", DoubleType),
    StructField("ask_size", DoubleType),
    StructField("bid_size", DoubleType)
  ))

  /** `upbit_orderbook` — nested snapshot (9 fields). */
  val orderbook: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("code", StringType),
    StructField("timestamp", LongType),
    StructField("total_ask_size", DoubleType),
    StructField("total_bid_size", DoubleType),
    StructField("orderbook_units", ArrayType(orderbookUnit)),
    StructField("stream_type", StringType),
    StructField("level", IntegerType),
    StructField("arrive_time", DoubleType)
  ))

  /** Topic-name registry (reference `load_schema`, errors on unknown
    * topic — `kafka_to_gcs_by_spark_batch.py:18-58`).
    */
  def forTopic(topic: String): StructType = topic match {
    case "upbit_trade"     => trade
    case "upbit_orderbook" => orderbook
    case other => throw new IllegalArgumentException(s"unknown topic: $other")
  }
}

/** Typed views (SURVEY.md §1.4). */
case class OrderbookUnit(ask_price: Option[Double], bid_price: Option[Double],
                         ask_size: Option[Double], bid_size: Option[Double])

case class Trade(code: Option[String], timestamp: Option[Long],
                 trade_price: Option[Double], trade_volume: Option[Double],
                 ask_bid: Option[String], sequential_id: Option[Long],
                 arrive_time: Option[Double])

case class Orderbook(code: Option[String], timestamp: Option[Long],
                     total_ask_size: Option[Double], total_bid_size: Option[Double],
                     orderbook_units: Option[Seq[OrderbookUnit]],
                     arrive_time: Option[Double])
