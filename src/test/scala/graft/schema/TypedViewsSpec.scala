package graft.schema

import graft.SparkSpec
import graft.ops.Envelope

class TypedViewsSpec extends SparkSpec {

  test("Dataset[Trade]/[Orderbook] round the wire schemas with null safety") {
    import spark.implicits._
    val tradeJson = Seq(
      """{"type":"trade","code":"KRW-BTC","timestamp":1704067200000,"trade_price":100.5,"trade_volume":0.25,"ask_bid":"ASK","sequential_id":1,"arrive_time":1704067200.05}""",
      """{"type":"trade","code":"KRW-ETH","timestamp":1704067201000,"trade_price":null,"trade_volume":0.5,"ask_bid":"BID","sequential_id":2,"arrive_time":1704067201.05}"""
    ).toDF("value")
    val trades = TypedViews.trades(Envelope.parse(tradeJson, UpbitSchemas.trade))
    val rows = trades.collect().sortBy(_.sequential_id)
    assert(rows.length === 2)
    assert(rows(0).code === Some("KRW-BTC") && rows(0).trade_price === Some(100.5))
    assert(rows(1).trade_price === None) // nullable wire field → None, no NPE
    // typed per-record logic
    val notional = trades.flatMap(t =>
      for { p <- t.trade_price; v <- t.trade_volume } yield p * v).collect().sorted
    assert(notional.toSeq === Seq(25.125))

    val obJson = Seq(
      """{"type":"orderbook","code":"KRW-BTC","timestamp":1704067200100,"total_ask_size":5.0,"total_bid_size":4.0,"orderbook_units":[{"ask_price":101.0,"bid_price":100.0,"ask_size":1.0,"bid_size":2.0}],"stream_type":"REALTIME","level":0,"arrive_time":1704067200.15}"""
    ).toDF("value")
    val obs = TypedViews.orderbooks(Envelope.parse(obJson, UpbitSchemas.orderbook)).collect()
    assert(obs.head.orderbook_units.get.head.bid_price === Some(100.0))
  }
}
