package graft.stream

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** `transformWithState` (Spark 4 successor API) equals the
  * `flatMapGroupsWithState` form, plus state-TTL eviction.
  * RocksDB state store is required by transformWithState — toggled
  * per query here, restored after.
  */
class TransformWithStateSpec extends SparkSpec {

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  private def withRocksDb[T](body: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    // Changelog checkpointing appends per-batch deltas instead of
    // zipping a full RocksDB snapshot into the checkpoint on every
    // commit (the snapshot-zip path stalls on this sandbox FS).
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  private val data =
    (1 to 40).map(i => (i % 3L, i.toLong * 1000, 100.0 + (i * 7 % 13), (i * 5) % 50))

  test("transformWithState output equals flatMapGroupsWithState across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val memNew = MemoryStream[(Long, Long, Double, Int)]
    val qNew = withRocksDb {
      StatefulFeatures.applyTws(
        memNew.toDF().toDF("key", "tsUs", "price", "size"), alpha = 0.8)
        .writeStream.format("memory").queryName("tws_stream").outputMode("append").start()
    }
    val memOld = MemoryStream[(Long, Long, Double, Int)]
    val qOld = StatefulFeatures(
      memOld.toDF().toDF("key", "tsUs", "price", "size"), alpha = 0.8)
      .writeStream.format("memory").queryName("fmgws_stream").outputMode("append").start()
    try {
      memNew.addData(data.take(17)); qNew.processAllAvailable()
      memNew.addData(data.drop(17)); qNew.processAllAvailable()
      memOld.addData(data.take(17)); qOld.processAllAvailable()
      memOld.addData(data.drop(17)); qOld.processAllAvailable()
      val a = spark.table("tws_stream").orderBy("key", "tsUs").collect().toSeq
      val b = spark.table("fmgws_stream").orderBy("key", "tsUs").collect().toSeq
      assert(a.nonEmpty)
      assert(a === b)
    } finally { qNew.stop(); qOld.stop() }
  }

  /** In ProcessingTime mode the query self-schedules micro-batches to
    * advance wall-clock state (TTL), so `processAllAvailable` never
    * observes a quiescent stream — poll the sink instead.
    */
  private def awaitRows(table: String, n: Long, timeoutMs: Long = 60000): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (spark.table(table).count() < n) {
      assert(System.currentTimeMillis() < deadline, s"timed out waiting for $n rows in $table")
      Thread.sleep(50)
    }
  }

  test("state TTL evicts idle keys: post-TTL rows restart like first rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double, Int)]
    val q = withRocksDb {
      StatefulFeatures.applyTws(
        mem.toDF().toDF("key", "tsUs", "price", "size"), alpha = 0.8,
        ttl = Some(java.time.Duration.ofMillis(200)))
        .writeStream.format("memory").queryName("tws_ttl").outputMode("append").start()
    }
    try {
      mem.addData(Seq((1L, 1000L, 10.0, 5), (1L, 2000L, 12.0, 7)))
      awaitRows("tws_ttl", 2)
      Thread.sleep(1500) // sail past the 200 ms TTL
      mem.addData(Seq((1L, 3000L, 14.0, 9)))
      awaitRows("tws_ttl", 3)
      val rows = spark.table("tws_ttl").orderBy("tsUs").collect()
      assert(rows.length === 3)
      // row 2 saw state from row 1; row 3's state was TTL-evicted →
      // behaves like a first row: ewma == price, ofi null
      assert(!rows(1).isNullAt(4))
      assert(rows(2).getDouble(3) === 14.0)
      assert(rows(2).isNullAt(4))
    } finally q.stop()
  }
}
