package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.ops.Scd

/** Streaming CDC → SCD2 dimension maintenance: each micro-batch of
  * changes merges into the running type-2 history via
  * `Scd.applyChanges` (closed intervals untouched — O(changed keys)
  * per batch), and the maintained table equals the batch rebuild over
  * everything streamed so far. The incremental path a 100 TB
  * dimension needs: the alternative — rebuilding the full history
  * every batch — rewrites the whole table forever.
  */
class ScdStreamSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  test("foreachBatch-maintained SCD2 equals batch rebuild across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    var hist: DataFrame = Scd.history(
      Seq.empty[(Long, String, Timestamp, Long)]
        .toDF("user_id", "event_type", "ts", "event_id"),
      "user_id", "event_type", "ts", "event_id").localCheckpoint()

    val mem = MemoryStream[(Long, String, Timestamp, Long)]
    val q = mem.toDF().toDF("user_id", "event_type", "ts", "event_id")
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        // localCheckpoint: pin this generation so the next batch's
        // merge doesn't re-read a plan over a mutated MemoryStream
        hist = Scd.applyChanges(hist, b, "user_id", "event_type", "ts", "event_id")
          .localCheckpoint()
      }
      .start()

    val batch1 = Seq(
      (1L, "A", t("2024-01-01 00:00:01"), 1L),
      (1L, "A", t("2024-01-01 00:00:02"), 2L),
      (2L, "X", t("2024-01-01 00:00:03"), 3L))
    val batch2 = Seq(
      (1L, "B", t("2024-01-01 00:00:04"), 4L), // value change → new version
      (2L, "X", t("2024-01-01 00:00:05"), 5L), // repeat → collapses
      (3L, "Q", t("2024-01-01 00:00:06"), 6L)) // new key
    val batch3 = Seq(
      (1L, "A", t("2024-01-01 00:00:07"), 7L)) // back to A → third version

    try {
      Seq(batch1, batch2, batch3).foreach { b =>
        mem.addData(b); q.processAllAvailable()
      }
    } finally q.stop()

    val all = (batch1 ++ batch2 ++ batch3)
      .toDF("user_id", "event_type", "ts", "event_id")
    val rebuilt = Scd.history(all, "user_id", "event_type", "ts", "event_id")

    def norm(df: DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Timestamp]("valid_from"), r.getAs[Timestamp]("valid_to"),
        r.getAs[Int]("version"), r.getAs[Boolean]("is_current")))
      .sortBy(x => (x._1, x._5)).toSeq

    assert(norm(hist) === norm(rebuilt))
    // and the expected shape: user 1 has A/B/A versions 1-3
    val k1 = norm(hist).filter(_._1 == 1L)
    assert(k1.map(_._2) === Seq("A", "B", "A"))
    assert(k1.count(_._6) === 1)
  }
}
