package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Streaming exact-dedup: duplicates inside the watermark delay are
  * dropped across micro-batches; state for expired keys is evicted
  * (a re-arrival after the watermark passes is treated as new — the
  * documented bounded-state trade-off).
  */
class DedupStreamSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  test("duplicates within the delay are dropped across micro-batches; state expires after") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val out = Streams.dedupWithinWatermark(
      mem.toDF().toDF("msg_id", "ts", "payload"), "ts", "10 seconds", Seq("msg_id"))
    val q = out.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      mem.addData(Seq(
        (1L, t("2024-01-01 00:00:00"), "a"),
        (1L, t("2024-01-01 00:00:01"), "a-dup-same-batch"),
        (2L, t("2024-01-01 00:00:02"), "b")))
      q.processAllAvailable()
      // next batch: key 1 again, still within the delay → dropped
      mem.addData(Seq((1L, t("2024-01-01 00:00:05"), "a-dup-next-batch")))
      q.processAllAvailable()
      // advance watermark far past key 1's expiry, then re-send key 1
      mem.addData(Seq((3L, t("2024-01-01 01:00:00"), "advance")))
      q.processAllAvailable()
      mem.addData(Seq((1L, t("2024-01-01 01:00:01"), "a-after-expiry")))
      q.processAllAvailable()
      val rows = spark.table("dedup_stream")
        .collect().map(r => (r.getLong(0), r.getString(2))).toSet
      assert(rows === Set(
        (1L, "a"), (2L, "b"), (3L, "advance"), (1L, "a-after-expiry")))
    } finally q.stop()
  }
}
