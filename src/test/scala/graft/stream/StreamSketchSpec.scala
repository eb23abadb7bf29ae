package graft.stream

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Quantiles

/** The mergeable bottom-k quantile sketch on a STREAM: because the
  * aggregate is order-independent ("k smallest of a set"), a complete-
  * mode streaming aggregation over incrementally arriving batches
  * must end bit-identical to the batch run — the property that lets
  * one sketch implementation serve batch, streaming, and
  * partial-merge compaction alike.
  */
class StreamSketchSpec extends SparkSpec {

  private def sketchAgg(df: DataFrame, k: Int) = {
    val agg = udaf(new Quantiles.BottomKAgg(k), Encoders.product[Quantiles.QHV])
    df.select(col("k"),
        md5(concat_ws(":", lit("qsketch"), col("id").cast("string"))).as("h"),
        col("v").cast("double").as("v"))
      .groupBy("k")
      .agg(agg(col("h"), col("v")).as("sk"))
      .select(col("k"), col("sk.n").as("n"), col("sk.m").as("m"),
        col("sk.vs").as("vs"))
  }

  test("streaming bottom-k sketch equals the batch sketch on the same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = (1 to 500).map(i => (s"g${i % 3}", i.toLong, (i * 37 % 101).toDouble))
    val mem = MemoryStream[(String, Long, Double)]
    val sdf = mem.toDF().toDF("k", "id", "v")
    val q = sketchAgg(sdf, k = 32).writeStream.format("memory")
      .queryName("sketch_stream").outputMode("complete").start()
    try {
      // three uneven arrival waves — merge order differs from batch
      mem.addData(rows.take(100))
      q.processAllAvailable()
      mem.addData(rows.slice(100, 350))
      q.processAllAvailable()
      mem.addData(rows.drop(350))
      q.processAllAvailable()
      val streamed = spark.table("sketch_stream")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getInt(2), r.getSeq[Double](3))).toMap
      val batch = sketchAgg(rows.toDF("k", "id", "v"), k = 32)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getInt(2), r.getSeq[Double](3))).toMap
      assert(streamed === batch)
      assert(streamed.values.forall(_._2 === 32), "groups larger than k sample to k")
    } finally q.stop()
  }

  test("windowed append-mode sketch: closed windows equal the batch window sketch") {
    import java.sql.Timestamp
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    val rows = (0 until 200).map { i =>
      (t(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"), s"g${i % 2}", i.toLong, (i * 13 % 47).toDouble)
    }
    val late = Seq((t("2024-01-01 01:00:00"), "g0", 9999L, 1.0)) // closes all 1-min windows
    val mem = MemoryStream[(Timestamp, String, Long, Double)]
    val sdf = mem.toDF().toDF("ts", "k", "id", "v")
    val q = Streams.windowedSketch(sdf, "ts", "k", "v", "id", k = 16,
        windowDur = "1 minute", delay = "10 seconds")
      .writeStream.format("memory").queryName("wsketch_stream")
      .outputMode("append").start()
    try {
      mem.addData(rows.take(70)); q.processAllAvailable()
      mem.addData(rows.drop(70)); q.processAllAvailable()
      mem.addData(late); q.processAllAvailable()
      val streamed = spark.table("wsketch_stream")
        .filter($"window_end" <= t("2024-01-01 00:04:00"))
        .collect().map(r => (r.getTimestamp(0), r.getString(2)) ->
          (r.getLong(3), r.getInt(4), r.getSeq[Double](5))).toMap
      val batch = Streams.windowedSketch(rows.toDF("ts", "k", "id", "v"),
          "ts", "k", "v", "id", k = 16, windowDur = "1 minute", delay = "10 seconds")
        .filter($"window_end" <= t("2024-01-01 00:04:00"))
        .collect().map(r => (r.getTimestamp(0), r.getString(2)) ->
          (r.getLong(3), r.getInt(4), r.getSeq[Double](5))).toMap
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
