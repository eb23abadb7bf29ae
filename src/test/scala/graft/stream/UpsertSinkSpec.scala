package graft.stream

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** foreachBatch upsert sink: the state table converges to
  * latest-per-key across micro-batches, re-merging an already-applied
  * batch is a no-op (the idempotence that makes crash-replay
  * exactly-once), and the generation/pointer protocol keeps a
  * committed snapshot readable through a crash DURING the state
  * write.
  */
class UpsertSinkSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  test("state table is latest-per-key across batches; replay is idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("upsert_sink").toFile
    val statePath = s"${dir.getAbsolutePath}/state"
    val ckpt = s"${dir.getAbsolutePath}/ckpt"

    val mem = MemoryStream[(Long, Timestamp, Double)]
    val q = Streams.upsertSink(mem.toDF().toDF("k", "ts", "v"),
      Seq("k"), Seq("ts"), statePath, ckpt).start()
    try {
      mem.addData(Seq(
        (1L, t("2024-01-01 00:00:00"), 1.0),
        (2L, t("2024-01-01 00:00:00"), 2.0)))
      q.processAllAvailable()
      mem.addData(Seq(
        (1L, t("2024-01-01 00:01:00"), 10.0), // newer → replaces
        (3L, t("2024-01-01 00:00:30"), 3.0))) // new key
      q.processAllAvailable()
      // a LATE row older than the current state must NOT win
      mem.addData(Seq((2L, t("2023-12-31 23:59:00"), -2.0)))
      q.processAllAvailable()

      def state() = Streams.latestState(spark, statePath).get
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      val s1 = state()
      assert(s1 === Map(1L -> 10.0, 2L -> 2.0, 3L -> 3.0))

      // replay: re-apply batch-2's data against the existing state —
      // converges to the same table (crash-before-commit recovery).
      // New protocol: merge reads the committed generation, writes a
      // fresh one (no overwrite of what it read).
      val replay = Seq(
        (1L, t("2024-01-01 00:01:00"), 10.0),
        (3L, t("2024-01-01 00:00:30"), 3.0)).toDF("k", "ts", "v")
      val merged = graft.ops.Compaction.latestMerge(
        Seq(Streams.latestState(spark, statePath).get, replay),
        Seq("k"), Seq("ts"))
      merged.write.mode("overwrite").parquet(s"$statePath/gen-replay")
      Files.write(new java.io.File(statePath, "_LATEST").toPath,
        "gen-replay".getBytes("UTF-8"))
      assert(state() === s1)
    } finally q.stop()
  }

  test("crash DURING state write keeps the committed snapshot readable") {
    import spark.implicits._
    val dir = Files.createTempDirectory("upsert_crash").toFile
    val src = s"${dir.getAbsolutePath}/src"
    val statePath = s"${dir.getAbsolutePath}/state"
    val ckpt = s"${dir.getAbsolutePath}/ckpt"

    import org.apache.spark.sql.functions.col
    def runOnce(): Unit = {
      val q = Streams.upsertSink(
        spark.readStream.schema("k LONG, us LONG, v DOUBLE").json(src)
          .select(col("k"), col("us"), col("v")),
        Seq("k"), Seq("us"), statePath, ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    Seq((1L, 10L, 1.0)).toDF("k", "us", "v")
      .coalesce(1).write.mode("append").json(src)
    runOnce()
    val committed = Streams.latestState(spark, statePath).get.collect().toSeq
    assert(committed.map(r => r.getLong(0) -> r.getDouble(2)) === Seq(1L -> 1.0))

    // simulate a crash mid-write of the NEXT generation: a partial,
    // uncommitted gen dir exists (garbage file, no commit), pointer
    // still on the committed generation — the old overwrite protocol
    // would have already DELETED the committed state at this point
    val partial = new java.io.File(statePath, "gen-00000000000000000099")
    partial.mkdirs()
    Files.write(new java.io.File(partial, "part-garbage.parquet.tmp").toPath,
      Array.fill[Byte](16)(0x5A))
    assert(Streams.latestState(spark, statePath).get.collect().toSeq === committed)

    // restart against the same checkpoint with new data: the batch
    // merges onto the COMMITTED snapshot (not the wreck) and commits
    Seq((2L, 20L, 2.0)).toDF("k", "us", "v")
      .coalesce(1).write.mode("append").json(src)
    runOnce()
    val s = Streams.latestState(spark, statePath).get
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s === Map(1L -> 1.0, 2L -> 2.0))
    // superseded generations (including the wreck) were reaped
    val gens = new java.io.File(statePath).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("gen-"))
    assert(gens.length === 1)
  }

  test("stop/restart against the same checkpoint: only NEW source files apply") {
    import spark.implicits._
    val dir = Files.createTempDirectory("upsert_restart").toFile
    val src = s"${dir.getAbsolutePath}/src"
    val statePath = s"${dir.getAbsolutePath}/state"
    val ckpt = s"${dir.getAbsolutePath}/ckpt"

    import org.apache.spark.sql.functions.col
    def stream() = spark.readStream
      .schema("k LONG, us LONG, v DOUBLE")
      .json(src)
      .select(col("k"), col("us"), col("v"))
    def runOnce(): Unit = {
      val q = Streams.upsertSink(stream(), Seq("k"), Seq("us"), statePath, ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def state() = Streams.latestState(spark, statePath).get
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap

    Seq((1L, 10L, 1.0), (2L, 10L, 2.0)).toDF("k", "us", "v")
      .coalesce(1).write.json(s"$src/gen1")
    // json source reads the directory tree; write generations as files
    // inside one dir via append
    spark.read.json(s"$src/gen1").write.mode("append").json(src)
    runOnce()
    assert(state() === Map(1L -> 1.0, 2L -> 2.0))

    // restart the query from the SAME checkpoint with one new file:
    // the old files are not re-applied (offsets committed), the new
    // one upserts
    Seq((1L, 20L, 10.0), (3L, 5L, 3.0)).toDF("k", "us", "v")
      .coalesce(1).write.mode("append").json(src)
    runOnce()
    assert(state() === Map(1L -> 10.0, 2L -> 2.0, 3L -> 3.0))

    // a third restart with NO new data is a no-op
    runOnce()
    assert(state() === Map(1L -> 10.0, 2L -> 2.0, 3L -> 3.0))
  }
}
