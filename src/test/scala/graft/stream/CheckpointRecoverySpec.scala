package graft.stream

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** T5 exactly-once contract: a restarted query resumes from its
  * checkpoint — already-committed input is not re-emitted to the file
  * sink, new input is.
  */
class CheckpointRecoverySpec extends SparkSpec {

  test("file sink query restarted from checkpoint neither loses nor duplicates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_ckpt").toString
    val mem = MemoryStream[(Long, Double)]
    def sink() = Streams.fileSink(mem.toDF().toDF("id", "v"), "json",
      s"$dir/data", s"$dir/ckpt", Trigger.AvailableNow(), Seq.empty)

    mem.addData((1L to 5L).map(i => (i, i * 1.0)))
    val q1 = sink().start()
    q1.awaitTermination(60000)
    q1.stop()

    mem.addData((6L to 9L).map(i => (i, i * 1.0)))
    val q2 = sink().start() // same checkpoint → resumes after batch 0
    q2.awaitTermination(60000)
    q2.stop()

    val out = spark.read.json(s"$dir/data")
    assert(out.count() === 9) // 5 + 4, no replays
    assert(out.select("id").distinct().count() === 9)
  }
}
