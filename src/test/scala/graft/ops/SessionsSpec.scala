package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SessionsSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  /** u1: events at 0 s, 10 s (merge), 10+gap s (exactly gap after —
    * the semantics-pinning case), then 1000 s later (clear break).
    */
  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, t("2024-01-01 00:00:00"), 1.0),
      (1L, t("2024-01-01 00:00:10"), 2.0),
      (1L, t("2024-01-01 00:00:40"), 4.0), // exactly gap=30s after prev
      (1L, t("2024-01-01 01:00:00"), 8.0),
      (2L, t("2024-01-01 00:00:05"), 16.0)
    ).toDF("user_id", "ts", "value")
  }

  test("window form: an event exactly gap after its predecessor MERGES") {
    val out = Sessions.stats(fixture, "user_id", "ts", "value", gapSec = 30L)
      .orderBy("user_id", "session_idx")
      .select("user_id", "session_idx", "n_events", "sum_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq((1L, 1L, 3L, 7.0), (1L, 2L, 1L, 8.0), (2L, 1L, 1L, 16.0)))
  }

  test("native session_window: an event exactly gap after its predecessor MERGES too") {
    // windows merge on touch ([t, t+gap] closure over overlap-or-abut),
    // so the native form agrees with the window form at the boundary
    val out = Sessions.statsNative(fixture, "user_id", "ts", "value", gapSec = 30L)
      .orderBy("user_id", "session_start")
      .select("user_id", "n_events", "sum_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((1L, 3L, 7.0), (1L, 1L, 8.0), (2L, 1L, 16.0)))
  }

  test("the two forms agree when no gap is exactly the threshold (real data)") {
    val ev = Tables.events(spark, sf("sf0.001"))
    val a = Sessions.stats(ev, "user_id", "ts", "value", gapSec = 30000L)
      .select("user_id", "session_start", "session_end", "n_events", "sum_value", "duration_us")
      .collect().map(_.toSeq).toSet
    val b = Sessions.statsNative(ev, "user_id", "ts", "value", gapSec = 30000L)
      .select("user_id", "session_start", "session_end", "n_events", "sum_value", "duration_us")
      .collect().map(_.toSeq).toSet
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("streaming session_window with watermark equals batch on closed sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val sdf = mem.toDF().toDF("user_id", "ts", "value").withWatermark("ts", "5 seconds")
    val agg = Sessions.statsNative(sdf, "user_id", "ts", "value", gapSec = 30L)
    val q = agg.writeStream.format("memory").queryName("sessions_stream")
      .outputMode("append").start()
    try {
      mem.addData(Seq(
        (1L, t("2024-01-01 00:00:00"), 1.0),
        (1L, t("2024-01-01 00:00:10"), 2.0),
        (2L, t("2024-01-01 00:00:05"), 16.0)))
      q.processAllAvailable()
      // advance watermark far past the sessions above to close them
      mem.addData(Seq((3L, t("2024-01-01 02:00:00"), 0.0)))
      q.processAllAvailable()
      val streamed = spark.table("sessions_stream")
        .select("user_id", "session_start", "session_end", "n_events", "sum_value", "duration_us")
        .collect().map(_.toSeq).toSet
      val batch = Sessions.statsNative(
          Seq((1L, t("2024-01-01 00:00:00"), 1.0),
            (1L, t("2024-01-01 00:00:10"), 2.0),
            (2L, t("2024-01-01 00:00:05"), 16.0)).toDF("user_id", "ts", "value"),
          "user_id", "ts", "value", gapSec = 30L)
        .select("user_id", "session_start", "session_end", "n_events", "sum_value", "duration_us")
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
