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
}
