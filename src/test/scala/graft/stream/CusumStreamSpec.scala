package graft.stream

import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.ops.Cusum

/** Streaming CUSUM == batch CUSUM trajectory over uneven micro-batch
  * splits: the z standardization happens batch-side (production
  * serves it as a broadcast pre-trained reference), the integer
  * recursion rides two longs of state per key.
  */
class CusumStreamSpec extends SparkSpec {

  test("stream trajectory bit-equals batch across 3 uneven splits, alarms included") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val r = new Random(13)
    val rows = for (k <- 0 until 3; i <- 0 until 60) yield {
      // plant a level shift on key 1 so at least one alarm crosses a
      // micro-batch boundary
      val base = if (k == 1 && i >= 30) 260.0 else 100.0
      (k.toLong, new Timestamp(1700000000000L + i * 1000L), (k * 100 + i).toLong,
        base + math.rint(r.nextDouble() * 200) / 10.0)
    }
    val batch = Cusum.monitor(rows.toDF("user_id", "ts", "event_id", "value"),
        "user_id", Seq("ts", "event_id"), "value", 500000L, 3000000L)
      .collect()
      .map(x => (x.getLong(0), x.getLong(2), x.getLong(3), x.getLong(4),
        x.getLong(5), x.getBoolean(6)))
    assert(batch.exists(_._6), "fixture produced no alarms — weaken the shift")

    // feed the SAME z sequence (key, tsUs = event_id for ordering,
    // zMicro) in 3 uneven chunks
    val zRows = batch.map(t => (t._1, t._2, t._3)).sortBy(x => (x._1, x._2))
    val mem = MemoryStream[(Long, Long, Long)]
    val sdf = mem.toDF().toDF("key", "tsUs", "zMicro")
    val q = StatefulFeatures.cusum(sdf, 500000L, 3000000L)
      .writeStream.format("memory").queryName("cusum_stream")
      .outputMode("append").start()
    try {
      val (a, rest) = zRows.splitAt(7)
      val (b, c) = rest.splitAt(101)
      Seq(a, b, c).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
      val streamed = spark.table("cusum_stream")
        .collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
          x.getLong(4), x.getBoolean(5)))
        .toSet
      val expected = batch
        .map(t => (t._1, t._2, t._3, t._4, t._5, t._6)).toSet
      assert(streamed == expected,
        s"only-batch=${expected -- streamed}\nonly-stream=${streamed -- expected}")
    } finally q.stop()
  }

  test("tied timestamps: tieCol reproduces the batch (ts, event_id) trajectory") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two events per timestamp with DIFFERENT values (a rising drift
    // ± a within-tie offset): monitor standardizes internally, the
    // drift guarantees alarms on both tails, and the tie-order
    // changes the sp/sm stamped on each tied row — only the pinned
    // (ts, id) order bit-equals the batch trajectory
    val rows = for (i <- 0 until 20; j <- 0 until 2) yield {
      val v = 100.0 + i * 5 + (if (j == 0) 2.0 else -2.0)
      (1L, new Timestamp(1700000000000L + i * 1000L), (i * 2 + j).toLong, v)
    }
    // batch rows: (key, tsMs, id, z, sp, sm, alarm) — the stream
    // output carries no id, but within a tied timestamp the two z
    // values differ (opposite signs), so (key, tsMs, z, ...) is a
    // faithful comparison key
    val batch = Cusum.monitor(
        rows.toDF("user_id", "ts", "event_id", "value"),
        "user_id", Seq("ts", "event_id"), "value", 0L, 1500000L)
      .collect()
      .map(x => (x.getLong(0), x.getTimestamp(1).getTime, x.getLong(2),
        x.getLong(3), x.getLong(4), x.getLong(5), x.getBoolean(6)))
    assert(batch.exists(_._7), "fixture produced no alarms")
    // stream input: tsUs = the (tied) epoch-ms, event_id as tie
    val zRows = batch.map(t => (t._1, t._2, t._3, t._4))
      .sortBy(x => (x._2, x._3))
    val mem = MemoryStream[(Long, Long, Long, Long)]
    val sdf = mem.toDF().toDF("key", "tsUs", "id", "zMicro")
    val q = StatefulFeatures.cusum(sdf, 0L, 1500000L, tieCol = Some("id"))
      .writeStream.format("memory").queryName("cusum_stream_tied")
      .outputMode("append").start()
    try {
      // cut INSIDE a tied pair so the pinned order must also hold
      // across the state carry
      val (a, b) = zRows.splitAt(11)
      Seq(a, b).foreach { chunk => mem.addData(chunk); q.processAllAvailable() }
      val streamed = spark.table("cusum_stream_tied")
        .collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
          x.getLong(3), x.getLong(4), x.getBoolean(5)))
        .toSet
      val expected = batch.map(t => (t._1, t._2, t._4, t._5, t._6, t._7)).toSet
      assert(streamed == expected,
        s"only-batch=${expected -- streamed}\nonly-stream=${streamed -- expected}")
    } finally q.stop()
  }
}
