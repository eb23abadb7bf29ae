package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.Tables
import graft.llm.{ScalePolicy, Similarity}

/** Decade timing for the binary-quantization arms in the
  * queries-∝-corpus regime: the flat XOR+popcount scan
  * ([[Similarity.hammingRerankTopK]]) vs the bucket funnel
  * ([[Similarity.hammingRerankBucketedTopK]]) with pinned 16×6 planes
  * (the oracle-restated driver parameters) and with ScalePolicy
  * occupancy-constant planes. Motivated by an honest r7 surprise: at
  * 200k vectors the PINNED funnel (53 s) LOSES to the flat scan
  * (34.6 s) — fixed-bits occupancy grows linearly, so the funnel
  * pushes 250M candidate rows through a join+dedup exchange while the
  * flat scan's 10⁹ pairs are pure map-side popcounts; the funnel only
  * beats the scan when its bucket stage holds occupancy constant.
  * Interleaved arms, LshScaleExp methodology.
  *
  * Usage: tools/run.sh graft.tools.HammingScaleExp <sfDir> [queryMod] [sweeps]
  */
object HammingScaleExp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/scale/sf1")
    val queryMod = args.lift(1).map(_.toInt).getOrElse(40)
    val sweeps = args.lift(2).map(_.toInt).getOrElse(3)
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
    val bits = ScalePolicy.lshBitsFor(n)
    val polPlanes = Similarity.md5Planes(64, ScalePolicy.lshGroupsFor(bits), bits)
    val arms: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "flat_scan" -> (() => Similarity.hammingRerankTopK(
        emb, "vec_id", "embedding", pred, 5, shortlist = 64)),
      "funnel_16x6" -> (() => Similarity.hammingRerankBucketedTopK(
        emb, "vec_id", "embedding", pred, 5,
        Similarity.md5Planes(64, 16, 6), shortlist = 64)),
      "funnel_policy" -> (() => Similarity.hammingRerankBucketedTopK(
        emb, "vec_id", "embedding", pred, 5, polPlanes, shortlist = 64)))

    arms.foreach(a => a._2().write.format("noop").mode("overwrite").save())
    val samples = collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to sweeps; (name, fn) <- arms) {
      val t0 = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      samples(name) = samples(name) :+ (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache(); System.gc()
    }
    println(s"corpus=$n queryMod=$queryMod sf=$sfDir sweeps=$sweeps " +
      s"policy_bits=$bits policy_groups=${ScalePolicy.lshGroupsFor(bits)}")
    arms.foreach { case (name, _) =>
      val s = samples(name).sorted
      println(f"$name%-14s median=${s(s.size / 2)}%7.2f s  min=${s.head}%7.2f  max=${s.last}%7.2f")
    }
    spark.stop()
  }
}
