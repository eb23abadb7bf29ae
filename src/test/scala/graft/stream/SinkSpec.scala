package graft.stream

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Sink/source surface (SURVEY.md K1/K3/K5 + S3): streaming
  * Hive-partitioned file sink with checkpoint, partition-pruned
  * explicit-schema read-back, and multi-query orchestration.
  */
class SinkSpec extends SparkSpec {

  test("streaming json file sink partitioned by (processing_date, code) + read-back") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_sink").toString
    val mem = MemoryStream[(String, Long, Double)]
    val df = mem.toDF().toDF("code", "timestamp", "price")
      .withColumn("processing_date", lit("2024-01-01"))
    mem.addData(Seq(("KRW-BTC", 1L, 10.0), ("KRW-ETH", 2L, 20.0), ("KRW-BTC", 3L, 30.0)))
    val q = Streams.fileSink(df, "json", s"$dir/data", s"$dir/ckpt",
      Trigger.AvailableNow(), Seq("processing_date", "code")).start()
    try {
      q.awaitTermination(60000)
      // Hive-style partition dirs exist
      assert(new java.io.File(s"$dir/data/processing_date=2024-01-01/code=KRW-BTC").exists())
      // S3-style read-back: explicit schema + partition-pruning path
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("timestamp", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("price", org.apache.spark.sql.types.DoubleType)))
      val back = spark.read.schema(schema)
        .json(s"$dir/data/processing_date=2024-01-01/code=KRW-BTC/*.json")
      assert(back.count() === 2)
      assert(back.agg(sum("price")).collect()(0).getDouble(0) === 40.0)
      // full partitioned read discovers partition columns
      val full = spark.read.format("json").load(s"$dir/data")
      assert(full.select("code").distinct().count() === 2)
      val pruned = full.filter(col("code") === "KRW-ETH")
      assert(pruned.count() === 1)
    } finally q.stop()
  }

  test("two concurrent streaming queries with distinct checkpoints") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_multi").toString
    val mem = MemoryStream[(String, Double)]
    val df = mem.toDF().toDF("code", "price")
    mem.addData(Seq(("X", 1.0), ("Y", 2.0)))
    val q1 = Streams.fileSink(df, "json", s"$dir/a", s"$dir/ckpt_a",
      Trigger.AvailableNow(), Seq.empty).start()
    val q2 = Streams.fileSink(df.withColumn("price", col("price") * 2), "json",
      s"$dir/b", s"$dir/ckpt_b", Trigger.AvailableNow(), Seq.empty).start()
    try {
      q1.awaitTermination(60000); q2.awaitTermination(60000)
      val a = spark.read.json(s"$dir/a").agg(sum("price")).collect()(0).getDouble(0)
      val b = spark.read.json(s"$dir/b").agg(sum("price")).collect()(0).getDouble(0)
      assert(a === 3.0 && b === 6.0)
    } finally { q1.stop(); q2.stop() }
  }
}
