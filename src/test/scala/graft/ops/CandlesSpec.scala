package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class CandlesSpec extends SparkSpec {

  private def df = {
    val schema = StructType(Seq(
      StructField("ts", TimestampType),
      StructField("k", StringType),
      StructField("side", StringType),
      StructField("v", DoubleType)))
    def t(s: String) = Timestamp.valueOf(s)
    val rows = Seq(
      Row(t("2024-01-01 00:00:01"), "a", "BID", 10.0),
      Row(t("2024-01-01 00:00:05"), "a", "ASK", 14.0),
      Row(t("2024-01-01 00:00:09"), "a", "BID", 8.0),
      Row(t("2024-01-01 00:00:11"), "a", "ASK", 20.0), // next 10s window
      Row(t("2024-01-01 00:00:03"), "b", "ASK", 5.0)   // singleton → null volatility
    )
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
  }

  test("tumbling OHLCV semantics") {
    val out = Candles.tumbling(df, "ts", "k", "v", "side", "ASK", "10 seconds")
      .orderBy("k", "window_start").collect()
    assert(out.length === 3)
    val a0 = out(0)
    assert(a0.getAs[Double]("open") === 10.0)
    assert(a0.getAs[Double]("close") === 8.0)
    assert(a0.getAs[Double]("high") === 14.0)
    assert(a0.getAs[Double]("low") === 8.0)
    assert(a0.getAs[Double]("volume") === 32.0)
    assert(a0.getAs[Double]("side_volume") === 14.0) // ASK only
    assert(a0.getAs[Long]("n_events") === 3L)
    assert(math.abs(a0.getAs[Double]("volatility") - 3.055050463303893) < 1e-12)
    val b = out(2)
    assert(b.getAs[String]("k") === "b" && b.isNullAt(b.fieldIndex("volatility")))
  }

  test("sliding windows cover each row dur/slide times") {
    val out = Candles.sliding(df, "ts", "k", "v", "side", "ASK", "10 seconds", "5 seconds")
    // each row lands in exactly 2 windows; (k, window) dedup may merge
    val totalEvents = out.agg(org.apache.spark.sql.functions.sum("n_events")).collect()(0).getLong(0)
    assert(totalEvents === df.count() * 2)
  }

  test("gapFill emits every bucket on the key's spine and carries close forward") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def h(hr: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $hr%02d:00:00")
    // key "a" trades at hours 1, 4 (gap at 2, 3); key "b" only at hour 7
    val candles = Seq(
      ("a", h(1), 10.0, 3L), ("a", h(4), 12.0, 1L), ("b", h(7), 5.0, 2L)
    ).toDF("k", "hour", "close", "n")
    val out = Candles.gapFill(candles, "k", "hour", expr("interval 1 hour"), Seq("close"))
      .orderBy("k", "hour").collect()
    assert(out.length === 5) // a: 1,2,3,4; b: 7
    val a2 = out(1) // hour 2, empty
    assert(a2.isNullAt(a2.fieldIndex("close")))
    assert(a2.getAs[Double]("close_ff") === 10.0)
    assert(!a2.getAs[Boolean]("has_data"))
    assert(out(3).getAs[Double]("close_ff") === 12.0) // hour 4, real close
    assert(out(4).getAs[String]("k") === "b" && out(4).getAs[Boolean]("has_data"))
  }
}
