package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Bpe

/** Merge-loop cost curve for BPE training (dev-side, not part of the
  * driver contract) — the round-5 verdict's one unmeasured LLM-operator
  * scale story: `Bpe.train` runs one Spark job + one driver collect per
  * merge, which is corpus-size-independent (the distinct-word table)
  * but DRIVER-round-trip-bound at production vocab sizes (10k–50k
  * merges). This measures that cost directly and A/Bs it against the
  * exactness-preserving disjoint-prefix batching (`batch` parameter —
  * see Bpe.train's scaladoc for the equivalence proof).
  *
  * Corpus: the testdata `documents` table has a ~31-word vocabulary —
  * BPE exhausts it after a few hundred merges, far short of production
  * vocab sizes. The tool therefore derives a larger vocabulary FROM the
  * same table by fusing each consecutive word trigram into one
  * underscore-joined "word" (deterministic, content-derived — no
  * synthetic data): ~31³ potential distinct words of ~17 chars,
  * enough headroom for thousands of merges.
  *
  * Usage: tools/run.sh graft.tools.BpeLoopExp [sfDir] [m1,m2,...] [b1,b2,...]
  * Defaults: sf0.1, merges 50,500,2000, batches 1,16,64.
  */
object BpeLoopExp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mergeArms = args.lift(1).getOrElse("50,500,2000")
      .split(",").map(_.trim.toInt).toSeq
    val batchArms = args.lift(2).getOrElse("1,16,64")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Tables.documents(spark, sfDir)
    val w = split(trim(lower(col("text"))), "\\s+")
    val tri = docs.select(array_join(
      transform(sequence(lit(0), floor((size(w) - lit(1)) / 3).cast("int")),
        i => array_join(slice(w, i * 3 + 1, lit(3)), "_")),
      " ").as("text"))
      .localCheckpoint() // corpus fixed + materialized before any timing
    val nWords = Bpe.wordCounts(tri, "text").count()
    println(s"sf=$sfDir distinctTrigramWords=$nWords")

    // Warmup: JIT + codegen on a tiny run before any timed arm.
    Bpe.train(tri, "text", 10)

    for (m <- mergeArms; b <- batchArms) {
      val t0 = System.nanoTime()
      val model = Bpe.train(tri, "text", m, batch = b)
      val sec = (System.nanoTime() - t0) / 1e9
      val got = model.merges.size
      val rounds = Bpe.lastTrainRounds
      println(f"merges=$m%5d batch=$b%3d  time=$sec%8.2f s  " +
        f"done=$got%5d  ms_per_merge=${sec * 1000 / math.max(got, 1)}%7.1f  " +
        f"rounds=$rounds%5d  merges_per_round=${got.toDouble / math.max(rounds, 1)}%5.2f")
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
