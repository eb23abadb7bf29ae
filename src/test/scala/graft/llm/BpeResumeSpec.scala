package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Checkpoint-resume for the BPE merge loop (r6 VERDICT #6): a run
  * killed mid-training and resumed from the persisted merge log must
  * produce a BIT-IDENTICAL model to an uninterrupted run — merges,
  * ranks, counts, and the fully-merged word table.
  */
class BpeResumeSpec extends SparkSpec {

  private def modelSig(m: Bpe.BpeModel): (Seq[(Int, String, String, Long)], Set[(String, String)]) =
    (m.merges,
      m.wordTable.select(col("word"), col("s")).collect()
        .map(r => (r.getString(0), r.getString(1))).toSet)

  test("kill + resume is bit-identical to an uninterrupted run (batch=1)") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val straight = Bpe.train(docs, "text", numMerges = 12)

    val dir = Files.createTempDirectory("bpe_ckpt").toFile.getAbsolutePath
    // "kill" after 5 merges: run with a lower budget, checkpointing
    // every 2 — the log on disk is what a dead driver leaves behind
    Bpe.trainResumable(docs, "text", numMerges = 5, dir = dir, every = 2)
    val logLines = scala.io.Source.fromFile(s"$dir/merges.tsv", "UTF-8")
      .getLines().toVector
    assert(logLines.size === 5)

    val t0 = System.nanoTime()
    val resumed = Bpe.trainResumable(docs, "text", numMerges = 12, dir = dir)
    val resumeSec = (System.nanoTime() - t0) / 1e9
    info(f"resume (replay 5 + train 7): $resumeSec%.1f s")
    assert(modelSig(resumed) === modelSig(straight))
  }

  test("kill + resume is bit-identical with batched selection (batch=4)") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val straight = Bpe.train(docs, "text", numMerges = 10, batch = 4)
    val dir = Files.createTempDirectory("bpe_ckpt_b").toFile.getAbsolutePath
    Bpe.trainResumable(docs, "text", numMerges = 6, batch = 4, dir = dir, every = 3)
    val resumed = Bpe.trainResumable(docs, "text", numMerges = 10, batch = 4, dir = dir)
    assert(modelSig(resumed) === modelSig(straight))
    // and the resumed-from log prefix equals the straight run's prefix
    assert(resumed.merges.take(6) === straight.merges.take(6))
  }

  test("resume with a SMALLER budget replays only the prefix (up to numMerges TOTAL)") {
    // r7 ADVICE low: a log holding more merges than the invocation's
    // budget used to replay ALL of them and return an over-budget model
    val docs = Tables.documents(spark, sf("sf0.001"))
    val dir = Files.createTempDirectory("bpe_ckpt_d").toFile.getAbsolutePath
    Bpe.trainResumable(docs, "text", numMerges = 8, dir = dir)
    val smaller = Bpe.trainResumable(docs, "text", numMerges = 5, dir = dir)
    assert(smaller.merges.size === 5, "model must hold exactly numMerges merges")
    assert(Bpe.lastTrainRounds === 0, "prefix replay needs no pair-count rounds")
    assert(modelSig(smaller) === modelSig(Bpe.train(docs, "text", numMerges = 5)))
    // r8 ADVICE medium: the smaller run must NOT truncate the on-disk log —
    // merges 6-8 are trained capital a later resume at budget 8 relies on
    val logAfter = scala.io.Source.fromFile(s"$dir/merges.tsv", "UTF-8")
      .getLines().toVector
    assert(logAfter.size === 8, "smaller-budget resume must not rewrite the log")
    val back = Bpe.trainResumable(docs, "text", numMerges = 8, dir = dir)
    assert(Bpe.lastTrainRounds === 0,
      "original-budget resume after a smaller run must be pure replay")
    assert(back.merges.size === 8)
  }

  test("a completed log makes re-run pure replay (no further training)") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val dir = Files.createTempDirectory("bpe_ckpt_c").toFile.getAbsolutePath
    val first = Bpe.trainResumable(docs, "text", numMerges = 8, dir = dir)
    val again = Bpe.trainResumable(docs, "text", numMerges = 8, dir = dir)
    assert(Bpe.lastTrainRounds === 0, "replay-only run must run zero pair-count rounds")
    assert(modelSig(again) === modelSig(first))
  }
}
