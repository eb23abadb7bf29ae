package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Candles
import graft.SparkSpec

/** Streaming == batch equivalence: the same candle plan over a
  * bounded MemoryStream must equal the batch run (SURVEY.md §5).
  */
class StreamingSpec extends SparkSpec {

  private def ticks: Seq[(Timestamp, String, String, Double)] = {
    def t(s: String) = Timestamp.valueOf(s)
    Seq(
      (t("2024-01-01 00:00:01"), "a", "BID", 10.0),
      (t("2024-01-01 00:00:05"), "a", "ASK", 14.0),
      (t("2024-01-01 00:00:09"), "a", "BID", 8.0),
      (t("2024-01-01 00:00:11"), "a", "ASK", 20.0),
      (t("2024-01-01 00:00:03"), "b", "ASK", 5.0),
      (t("2024-01-01 00:10:00"), "a", "BID", 1.0) // advances watermark past 00:00:1x
    )
  }

  test("windowed candle agg on a stream equals batch on same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, String, Double)]
    val sdf = mem.toDF().toDF("ts", "k", "side", "v").withWatermark("ts", "5 seconds")
    val agg = Candles.tumbling(sdf, "ts", "k", "v", "side", "ASK", "10 seconds")
    val q = agg.writeStream.format("memory").queryName("candles_stream")
      .outputMode("append").start()
    try {
      mem.addData(ticks)
      q.processAllAvailable()
      mem.addData(Seq((Timestamp.valueOf("2024-01-01 00:20:00"), "a", "BID", 1.0)))
      q.processAllAvailable()
      val streamed = spark.table("candles_stream")
        .orderBy("k", "window_start")
        .collect()
      val batch = Candles.tumbling(
        ticks.toDF("ts", "k", "side", "v"), "ts", "k", "v", "side", "ASK", "10 seconds")
        .filter(col("window_end") <= Timestamp.valueOf("2024-01-01 00:19:55")) // watermark-closed only
        .orderBy("k", "window_start")
        .collect()
      assert(streamed.toSeq === batch.toSeq)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("update output mode: re-emits a window as late-but-in-watermark rows refine it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    val mem = MemoryStream[(Timestamp, String, String, Double)]
    val sdf = mem.toDF().toDF("ts", "k", "side", "v").withWatermark("ts", "1 hour")
    val agg = Candles.tumbling(sdf, "ts", "k", "v", "side", "ASK", "10 seconds")
    val q = agg.writeStream.format("memory").queryName("candles_update")
      .outputMode("update").start()
    try {
      mem.addData(Seq((t("2024-01-01 00:00:01"), "a", "ASK", 10.0)))
      q.processAllAvailable()
      // append mode would emit nothing yet (watermark hasn't closed the
      // window); update mode already emitted the provisional candle
      val first = spark.table("candles_update").collect()
      assert(first.length == 1 && first(0).getAs[Double]("high") == 10.0)
      // a second in-window row REFINES the same window: update emits a
      // second (newer) row for the identical window key
      mem.addData(Seq((t("2024-01-01 00:00:05"), "a", "ASK", 14.0)))
      q.processAllAvailable()
      val rows = spark.table("candles_update")
        .filter(col("k") === "a").collect()
      assert(rows.length == 2)
      assert(rows.map(_.getAs[Double]("high")).sorted.toSeq == Seq(10.0, 14.0))
      assert(rows.map(_.getAs[Timestamp]("window_start")).distinct.length == 1)
    } finally q.stop()
  }

  test("stateful EWMA+OFI stream equals batch operators on ordered input") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = (1 to 40).map(i => (i % 3L, i.toLong * 1000, 100.0 + (i * 7 % 13), (i * 5) % 50))
    val mem = MemoryStream[(Long, Long, Double, Int)]
    val sdf = mem.toDF().toDF("key", "tsUs", "price", "size")
    val q = StatefulFeatures(sdf, alpha = 0.8)
      .writeStream.format("memory").queryName("feat_stream").outputMode("append").start()
    try {
      // feed in two chunks split mid-stream: state must carry across batches
      mem.addData(data.take(17)); q.processAllAvailable()
      mem.addData(data.drop(17)); q.processAllAvailable()
      val streamed = spark.table("feat_stream").orderBy("key", "tsUs").collect()

      val batchDf = data.toDF("key", "tsUs", "price", "size")
      val ewma = graft.ops.Ewma.rowwise(batchDf, "key", Seq("tsUs"), "price", 0.8, "ewma")
      val both = graft.ops.Ofi.withOfi(ewma, "key", Seq("tsUs"), "price", "size", "ofi")
        .select("key", "tsUs", "price", "ewma", "ofi")
        .orderBy("key", "tsUs").collect()
      assert(streamed.length === both.length)
      streamed.zip(both).foreach { case (s, b) =>
        assert(s.getLong(0) === b.getLong(0))
        assert(s.getLong(1) === b.getLong(1))
        assert(s.getDouble(3) === b.getDouble(3)) // identical IEEE fold
        val sOfi = if (s.isNullAt(4)) None else Some(s.getInt(4))
        val bOfi = if (b.isNullAt(4)) None else Some(b.getInt(4))
        assert(sOfi === bOfi)
      }
    } finally q.stop()
  }

  test("stateful two-sided book OFI stream equals Ofi.withBookOfi on ordered input") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = (1 to 40).map { i =>
      (i % 3L, i.toLong * 1000,
        100.0 + (i * 7 % 13), 1.0 + (i * 5 % 50),
        200.0 - (i * 7 % 13), 1.0 + (i * 11 % 40))
    }
    val mem = MemoryStream[(Long, Long, Double, Double, Double, Double)]
    val sdf = mem.toDF().toDF("key", "tsUs", "bidPrice", "bidSize", "askPrice", "askSize")
    val q = StatefulFeatures.book(sdf)
      .writeStream.format("memory").queryName("book_stream").outputMode("append").start()
    try {
      mem.addData(data.take(13)); q.processAllAvailable()
      mem.addData(data.drop(13)); q.processAllAvailable()
      val streamed = spark.table("book_stream").orderBy("key", "tsUs").collect()

      val batch = graft.ops.Ofi.withBookOfi(
        data.toDF("key", "tsUs", "bidPrice", "bidSize", "askPrice", "askSize"),
        "key", Seq("tsUs"), "bidPrice", "bidSize", "askPrice", "askSize", "ofi")
        .select("key", "tsUs", "ofi")
        .orderBy("key", "tsUs").collect()
      assert(streamed.length === batch.length)
      streamed.zip(batch).foreach { case (s, b) =>
        assert(s.getLong(0) === b.getLong(0))
        assert(s.getLong(1) === b.getLong(1))
        val sOfi = if (s.isNullAt(2)) None else Some(s.getDouble(2))
        val bOfi = if (b.isNullAt(2)) None else Some(b.getDouble(2))
        assert(sOfi === bOfi)
      }
    } finally q.stop()
  }
}
