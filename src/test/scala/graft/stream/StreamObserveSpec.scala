package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `observe()` on a STREAMING query: per-micro-batch data-quality
  * metrics ride the query's own pass and surface through
  * `StreamingQueryProgress.observedMetrics` — the streaming
  * counterpart of the batch ObserveSpec ingest gate (no second
  * aggregation, no extra sink). This is how a production stream
  * alerts on null rates / volume drops per trigger.
  */
class StreamObserveSpec extends SparkSpec {

  test("per-batch observed metrics match the data fed to each trigger") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val sdf = mem.toDF().toDF("ts", "key", "value")
      .observe("ingest_gate",
        count(lit(1)).as("rows_seen"),
        count(when(col("value") < 0, 1)).as("neg_values"),
        max(col("value")).as("max_value"))
    val q = sdf.writeStream.format("memory").queryName("obs_stream")
      .outputMode("append").start()
    def t(s: String) = Timestamp.valueOf(s)
    try {
      mem.addData(Seq(
        (t("2024-01-01 00:00:01"), 1L, 10.0),
        (t("2024-01-01 00:00:02"), 1L, -3.0),
        (t("2024-01-01 00:00:03"), 2L, 7.5)))
      q.processAllAvailable()
      mem.addData(Seq((t("2024-01-01 00:00:04"), 2L, 99.0)))
      q.processAllAvailable()
      val metrics = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("ingest_gate")))
        .map(r => (r.getAs[Long]("rows_seen"), r.getAs[Long]("neg_values"),
          r.getAs[Double]("max_value")))
        .filter(_._1 > 0) // empty maintenance batches carry no data
      assert(metrics === Seq((3L, 1L, 10.0), (1L, 0L, 99.0)))
      // the sink saw every row exactly once alongside the metrics
      assert(spark.table("obs_stream").count() === 4L)
    } finally q.stop()
  }
}
