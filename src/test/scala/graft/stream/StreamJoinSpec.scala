package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stream-stream interval join == the same band join in batch: each
  * trade picks up quotes of its key from the preceding `band`
  * seconds; watermarks on both sides bound the join state.
  */
class StreamJoinSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  private val trades = Seq(
    ("a", t("2024-01-01 00:00:10"), 100.0),
    ("a", t("2024-01-01 00:00:25"), 101.0),
    ("b", t("2024-01-01 00:00:12"), 50.0))

  private val quotes = Seq(
    ("a", t("2024-01-01 00:00:05"), 99.5),  // within 10s of trade@10 and NOT of trade@25
    ("a", t("2024-01-01 00:00:24"), 100.5), // within 10s of trade@25
    ("b", t("2024-01-01 00:00:03"), 49.5),  // 9s before trade@12 → match
    ("b", t("2024-01-01 00:00:13"), 50.5))  // AFTER the trade → no match

  test("streaming band join equals the batch band join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val memT = MemoryStream[(String, Timestamp, Double)]
    val memQ = MemoryStream[(String, Timestamp, Double)]
    // no caller-side withWatermark: bandJoin applies both itself
    val sT = memT.toDF().toDF("k", "trade_ts", "price")
    val sQ = memQ.toDF().toDF("k", "quote_ts", "bid")
    val joined = Streams.bandJoin(sT, sQ, "k", "trade_ts", "quote_ts", bandSec = 10L)
    val q = joined.writeStream.format("memory").queryName("band_join_stream")
      .outputMode("append").start()
    try {
      memT.addData(trades)
      memQ.addData(quotes)
      q.processAllAvailable()
      val streamed = spark.table("band_join_stream")
        .select("k", "trade_ts", "price", "quote_ts", "bid")
        .collect().map(_.toSeq).toSet
      val batch = Streams.bandJoin(
          trades.toDF("k", "trade_ts", "price"),
          quotes.toDF("k", "quote_ts", "bid"),
          "k", "trade_ts", "quote_ts", bandSec = 10L)
        .select("k", "trade_ts", "price", "quote_ts", "bid")
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
      // the band semantics themselves: trade@10 matches quote@5 only, etc.
      assert(batch === Set(
        Seq("a", t("2024-01-01 00:00:10"), 100.0, t("2024-01-01 00:00:05"), 99.5),
        Seq("a", t("2024-01-01 00:00:25"), 101.0, t("2024-01-01 00:00:24"), 100.5),
        Seq("b", t("2024-01-01 00:00:12"), 50.0, t("2024-01-01 00:00:03"), 49.5)))
    } finally q.stop()
  }

  test("identically-named key/ts columns resolve via side-qualified refs") {
    import spark.implicits._
    // both sides named (k, ts, v): unqualified col("ts") would throw
    // AMBIGUOUS_REFERENCE; bandJoin qualifies through each input
    val l = Seq(("a", t("2024-01-01 00:00:10"), 1.0)).toDF("k", "ts", "v")
    val r = Seq(("a", t("2024-01-01 00:00:05"), 2.0),
                ("a", t("2024-01-01 00:00:11"), 3.0)).toDF("k", "ts", "v")
    val out = Streams.bandJoin(l, r, "k", "ts", "ts", bandSec = 10L)
    assert(out.count() === 1) // only the 00:00:05 quote is in-band
  }
}
