package graft.stream

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.ImbalanceBars

/** Streaming imbalance bars == batch closed bars on the same in-order
  * data, across arbitrary micro-batch splits (signs, the reset
  * accumulator, and open-bar aggregates must all carry in state).
  */
class ImbalanceStreamSpec extends SparkSpec {

  private val ticks = Seq(
    (1L, 1L, 100.0), (1L, 2L, 101.0), (1L, 3L, 102.0), (1L, 4L, 101.0),
    (1L, 5L, 101.0), (1L, 6L, 100.0), (1L, 7L, 104.0), (1L, 8L, 105.0),
    (1L, 9L, 106.0), (1L, 10L, 107.0),
    (2L, 1L, 50.0), (2L, 2L, 49.0), (2L, 3L, 48.0), (2L, 4L, 47.0),
    (2L, 5L, 48.0)
  )

  private def batchClosed(threshold: Long) = {
    import spark.implicits._
    val df = ticks.toDF("key", "tsUs", "price")
    val bars = ImbalanceBars.bars(df, "key", "tsUs", "price", threshold)
    val last = bars.groupBy("key").agg(max("bar_num").as("l")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    bars.collect()
      .filter(r => r.getInt(1) < last(r.getLong(0)))
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getAs[Long]("theta"),
        r.getAs[Long]("n_trades")))
      .sortBy(t => (t._1, t._2)).toSeq
  }

  test("streamed closed bars equal batch closed bars over 3 uneven splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double)]
    val sdf = mem.toDF().toDF("key", "tsUs", "price")
    val q = StatefulFeatures.imbalanceBars(sdf, threshold = 3L)
      .writeStream.format("memory").queryName("imb_stream")
      .outputMode("append").start()
    try {
      mem.addData(ticks.take(4)); q.processAllAvailable()
      mem.addData(ticks.slice(4, 11)); q.processAllAvailable()
      mem.addData(ticks.drop(11)); q.processAllAvailable()
      val streamed = spark.table("imb_stream")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5), r.getLong(6), r.getLong(7)))
        .sortBy(t => (t._1, t._2)).toSeq
      assert(streamed === batchClosed(3L))
      assert(streamed.nonEmpty)
      // closed bars sit exactly at the threshold
      assert(streamed.forall(b => math.abs(b._7) === 3L))
    } finally q.stop()
  }

  test("tied timestamps: tieCol pins the order to the batch (ts, id) total order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // every timestamp duplicated — without the tie column the
    // within-micro-batch sort order (hence signs, bar cuts, OHLC)
    // would be nondeterministic
    val tied = Seq(
      (1L, 1L, 10L, 100.0), (1L, 1L, 11L, 103.0),
      (1L, 2L, 12L, 101.0), (1L, 2L, 13L, 104.0),
      (1L, 3L, 14L, 105.0), (1L, 3L, 15L, 102.0),
      (1L, 4L, 16L, 106.0), (1L, 4L, 17L, 107.0))
    val bdf = tied.toDF("key", "tsUs", "id", "price")
    val bars = ImbalanceBars.bars(bdf, "key", "tsUs", "price", 3L,
      tieCols = Seq("id"))
    val last = bars.agg(max("bar_num")).collect().head.getInt(0)
    val expected = bars.collect().filter(_.getInt(1) < last)
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getAs[Long]("theta"),
        r.getAs[Long]("n_trades")))
      .sortBy(t => (t._1, t._2)).toSeq
    val mem = MemoryStream[(Long, Long, Long, Double)]
    val sdf = mem.toDF().toDF("key", "tsUs", "id", "price")
    val q = StatefulFeatures.imbalanceBars(sdf, threshold = 3L,
        tieCol = Some("id"))
      .writeStream.format("memory").queryName("imb_stream_tied")
      .outputMode("append").start()
    try {
      // split INSIDE a tied pair so the tie order must also hold
      // across the state carry
      mem.addData(tied.take(3)); q.processAllAvailable()
      mem.addData(tied.drop(3)); q.processAllAvailable()
      val streamed = spark.table("imb_stream_tied")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5), r.getLong(6), r.getLong(7)))
        .sortBy(t => (t._1, t._2)).toSeq
      assert(streamed === expected)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
