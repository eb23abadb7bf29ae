package graft.stream

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{SparkSpec, Tables}
import graft.llm.{Dedup, QualityClassifier}

/** End-to-end COMPOSED streaming curation pipeline — the production
  * shape the per-operator stream specs build toward: arrivals pass
  * the NB quality gate (map-literal filter, zero state), the
  * survivors probe the persisted near-dup LSH index (stream-static
  * equi-join, zero state), matches land in a checkpointed file sink.
  * Because every stage is stateless, the composition inherits the
  * file-sink exactly-once contract unchanged — this spec pins both
  * halves: stream == batch through the WHOLE composition, and a
  * mid-stream restart neither loses nor duplicates.
  */
class StreamPipelineSpec extends SparkSpec {

  private def fixtures() = {
    val corpus = Tables.documents(spark, sf())
      .select(col("doc_id").as("id"), col("text"))
    val index = Dedup.bandedIndex(corpus, "id", "text",
      numPerm = 32, bands = 8, maxBucket = 64).localCheckpoint()
    val train = Tables.documents(spark, sf())
      .filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val pos = col("source").isin("src0", "src1", "src2", "src3")
    val (m, oov, prior) = QualityClassifier.serve(
      QualityClassifier.nbModel(train, "text", pos),
      QualityClassifier.nbPrior(train, pos))
    (corpus, index, m, oov, prior)
  }

  // gate → probe, identical code path for a stream or a batch frame
  private def pipeline(docs: DataFrame, index: DataFrame,
                       m: Map[String, Long], oov: Long, prior: Long): DataFrame =
    StreamDedup.nearDupMatches(
      QualityClassifier.nbFilter(docs, "text", m, oov, prior,
        minScoreMicro = -1600000L),
      index, "id", "text", numPerm = 32, bands = 8, tau = 0.7)

  test("gate -> dedup-probe composition: stream == batch, bit-equal") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (corpus, index, m, oov, prior) = fixtures()
    // arrivals = the corpus re-keyed (id+offset): every doc is a near
    // dup of its original, so the probe emits real matches while the
    // gate drops the low-scoring tail
    val arrivals = corpus
      .select((col("id") + 100000L).as("id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(arrivals.nonEmpty)

    val batchOut = pipeline(
        arrivals.toDF("id", "text"), index, m, oov, prior)
      .collect().map(_.toSeq).toSet

    val mem = MemoryStream[(Long, String)]
    val sinkDir = Files.createTempDirectory("graft_pipe").toString
    val (a, b) = arrivals.splitAt(arrivals.size / 2)
    mem.addData(a); mem.addData(b) // two micro-batches
    val q = pipeline(mem.toDF().toDF("id", "text"), index, m, oov, prior)
      .writeStream.format("parquet")
      .option("path", s"$sinkDir/data")
      .option("checkpointLocation", s"$sinkDir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000); q.stop()

    val streamOut = spark.read.parquet(s"$sinkDir/data")
      .collect().map(_.toSeq).toSet
    assert(streamOut === batchOut)
    assert(batchOut.nonEmpty, "composition must emit matches to prove anything")
    // and the gate must actually gate: some arrivals were dropped
    val gated = QualityClassifier.nbFilter(
      arrivals.toDF("id", "text"), "text", m, oov, prior, -1600000L).count()
    assert(gated < arrivals.size, "threshold chose to keep everything — raise it")
  }

  test("composed pipeline restarted from checkpoint neither loses nor duplicates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (corpus, index, m, oov, prior) = fixtures()
    val arrivals = corpus
      .select((col("id") + 200000L).as("id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val (first, second) = arrivals.splitAt(arrivals.size / 2)

    val mem = MemoryStream[(Long, String)]
    val dir = Files.createTempDirectory("graft_pipe_ckpt").toString
    def run() = pipeline(mem.toDF().toDF("id", "text"), index, m, oov, prior)
      .writeStream.format("parquet")
      .option("path", s"$dir/data")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()

    mem.addData(first)
    val q1 = run(); q1.awaitTermination(120000); q1.stop()
    mem.addData(second)
    val q2 = run(); q2.awaitTermination(120000); q2.stop()

    val out = spark.read.parquet(s"$dir/data")
      .collect().map(_.toSeq).toSet
    val want = pipeline(arrivals.toDF("id", "text"), index, m, oov, prior)
      .collect().map(_.toSeq).toSet
    assert(out === want) // all-at-once batch == stop/restart stream
  }
}
