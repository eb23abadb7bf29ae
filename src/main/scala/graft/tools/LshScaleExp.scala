package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.Tables
import graft.llm.Similarity

/** Measures the LSH bits-per-group scale knob (the one super-linear
  * finding of the r5 sf1 scale curve): with FIXED planes, sign-bucket
  * occupancy grows linearly with the corpus, so query×candidate work
  * grows quadratically — `ann_lsh_topk` was 12.2× for 10× data while
  * everything else stayed ≤ 1.7× per decade. The fix is standard LSH
  * practice: grow bits with log₂(corpus) to hold occupancy constant
  * (the planes are a PARAMETER of [[Similarity.lshTopK]]; the driver
  * query pins 16×6 only because its DuckDB oracle restates those
  * exact planes).
  *
  * Arms are interleaved within one JVM (same methodology as
  * [[LoopExp]] — sequential whole-process runs carry ±30% container
  * drift, swamming per-knob signal); recall@5 vs [[Similarity
  * .bruteTopK]] is computed once per arm so the speed knob's accuracy
  * cost is measured, not assumed.
  *
  * Raising bits ALONE trades recall away (per-group collision
  * probability is p^bits): measured 0.71 → 0.21 recall for 6 → 10
  * bits at sf1. The standard recipe raises bits AND groups together
  * (OR-amplification 1−(1−p^bits)^groups restores recall while
  * occupancy stays constant) — arms are `groups:bits` pairs so both
  * knobs are measured jointly.
  *
  * Usage: tools/run.sh graft.tools.LshScaleExp <sfDir> [g:bCsv] [sweeps]
  */
object LshScaleExp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // groups:bits[:probes] triples
    val arms = args.lift(1).getOrElse("16:6,16:8,16:10").split(",").map { a =>
      val parts = a.trim.split(":")
      (parts(0).toInt, parts(1).toInt, parts.lift(2).map(_.toInt).getOrElse(0))
    }.toSeq
    val sweeps = args.lift(2).map(_.toInt).getOrElse(3)
    // query-set modulus: id % mod == 0 selects the queries. Default 40
    // matches the driver query; at sf10 (200k vectors) the recall
    // ground truth is brute-force — 5000 queries × 200k corpus is a
    // 10⁹-pair all-pairs job, so larger decades pass a larger modulus
    // to hold the query COUNT (not rate) roughly constant.
    val queryMod = args.lift(3).map(_.toInt).getOrElse(40)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val pred = col("id") % queryMod === 0

    def lsh(arm: (Int, Int, Int)) = Similarity.lshTopK(emb, "vec_id", "embedding",
      pred, k = 5,
      Similarity.md5Planes(dim = 64, groups = arm._1, bitsPerGroup = arm._2),
      probes = arm._3)

    // Warmup every arm once (JIT + codegen), then interleave timed sweeps.
    arms.foreach(a => lsh(a).count())
    val samples = collection.mutable.Map.empty[(Int, Int, Int), Vector[Double]].withDefaultValue(Vector.empty)
    for (_ <- 1 to sweeps; a <- arms) {
      val t0 = System.nanoTime()
      lsh(a).count()
      samples(a) = samples(a) :+ (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache(); System.gc()
    }

    val brute = Similarity.bruteTopK(emb, "vec_id", "embedding", pred, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // map(_._1) already dedups to distinct query ids — no /k here
    println(s"corpus=$n queries=${brute.map(_._1).size} sf=$sfDir sweeps=$sweeps")
    arms.foreach { a =>
      val got = lsh(a).select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (brute & got).size.toDouble / brute.size
      val s = samples(a).sorted
      println(f"groups=${a._1}%2d bits=${a._2}%2d probes=${a._3}%2d  median=${s(s.size / 2)}%6.2f s  min=${s.head}%6.2f  max=${s.last}%6.2f  recall@5=$recall%.3f")
    }
    spark.stop()
  }
}
