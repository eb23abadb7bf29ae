package graft.stream

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.SparkSpec
import graft.ops.Vpin

/** Streaming VPIN buckets == batch Vpin bucket layer on the same
  * in-order data (closed buckets only; the open bucket lives in
  * state). Volumes are integers so double and decimal accumulation
  * agree exactly.
  */
class VpinStreamSpec extends SparkSpec {

  // (key, tsUs, price, vol): two instruments, volume 10 each, bucket 20
  private val ticks = Seq(
    (1L, 1L, 100.0, 10.0), (1L, 2L, 101.0, 10.0), (1L, 3L, 100.0, 10.0),
    (1L, 4L, 100.0, 10.0), (1L, 5L, 102.0, 10.0), (1L, 6L, 101.0, 10.0),
    (2L, 1L, 50.0, 10.0), (2L, 2L, 49.0, 10.0), (2L, 3L, 49.0, 10.0)
  )

  test("streamed closed buckets equal the batch operator's aggregates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double, Double)]
    val sdf = mem.toDF().toDF("key", "tsUs", "price", "vol")
    val q = StatefulFeatures.vpinBuckets(sdf, bucketSize = 20.0)
      .writeStream.format("memory").queryName("vpin_stream")
      .outputMode("append").start()
    try {
      // two micro-batches: state must carry signs/cumsum/open bucket across
      mem.addData(ticks.take(4))
      q.processAllAvailable()
      mem.addData(ticks.drop(4))
      q.processAllAvailable()
      val streamed = spark.table("vpin_stream")
        .orderBy("key", "bucket").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5), r.getLong(6)))

      val batchIn = ticks.toDF("key", "tsUs", "price", "vol")
        .withColumn("notional", col("vol").cast(DecimalType(20, 4)))
      val lastBucket = Vpin.vpin(batchIn, "key", "tsUs", "price", "notional", 20.0, 2)
        .groupBy("key").agg(max("bucket").as("last")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val batch = Vpin.vpin(batchIn, "key", "tsUs", "price", "notional", 20.0, 2)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1).toLong, r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5), r.getLong(6)))
        .filter { case (k, b, _, _, _, _, _) => b != lastBucket(k).toLong } // closed only
        .sortBy(t => (t._1, t._2))
      assert(streamed.toSeq === batch.toSeq)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
