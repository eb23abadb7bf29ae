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
  * Usage: tools/run.sh graft.tools.HammingScaleExp <sfDir> [queryMod] [sweeps] [arms]
  * (`arms` = comma-list filter over arm names, default all)
  */
object HammingScaleExp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/scale/sf1")
    val queryMod = args.lift(1).map(_.toInt).getOrElse(40)
    val sweeps = args.lift(2).map(_.toInt).getOrElse(3)
    val armFilter = args.lift(3).map(_.split(",").toSet)
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
    val allArms: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "flat_scan" -> (() => Similarity.hammingRerankTopK(
        emb, "vec_id", "embedding", pred, 5, shortlist = 64)),
      "funnel_16x6" -> (() => Similarity.hammingRerankBucketedTopK(
        emb, "vec_id", "embedding", pred, 5,
        Similarity.md5Planes(64, 16, 6), shortlist = 64)),
      "funnel_policy" -> (() => Similarity.hammingRerankBucketedTopK(
        emb, "vec_id", "embedding", pred, 5, polPlanes, shortlist = 64)),
      // the library entry point: policy planes + min(4,bits) probes +
      // the 256 shortlist — what a user calling the Auto actually gets
      "funnel_auto" -> (() => ScalePolicy.hammingRerankAuto(
        emb, "vec_id", "embedding", pred, 5, corpus = n)))
    val arms = armFilter.fold(allArms)(f => allArms.filter(a => f(a._1)))

    // recall mode: GRAFT_RECALL=<mod> measures recall@5 vs brute on a
    // sparser query slice instead of timing (ground truth at 200k is
    // itself quadratic — a 200-query slice keeps it a 40M-cosine job)
    sys.env.get("GRAFT_RECALL").foreach { m =>
      val rPred = col("id") % m.toInt === 0
      val brute = Similarity.bruteTopK(emb, "vec_id", "embedding", rPred, 5)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // (probes, shortlist) sweep: where does funnel recall actually
      // live — probe amplification or the sketch shortlist cut?
      val variants = sys.env.get("GRAFT_VARIANTS")
        .map(_.split(",").toSeq.map { v =>
          val Array(p, sl) = v.split(":"); (p.toInt, sl.toInt)
        })
        .getOrElse(Seq((0, 64), (4, 64), (13, 64), (0, 256), (4, 256), (13, 256)))
      variants.foreach { case (p, sl) =>
        // p = -1 marks the FLAT popcount scan (no buckets) at shortlist sl
        val fn = () =>
          if (p < 0) Similarity.hammingRerankTopK(
            emb, "vec_id", "embedding", rPred, 5, shortlist = sl)
          else Similarity.hammingRerankBucketedTopK(
            emb, "vec_id", "embedding", rPred, 5, polPlanes,
            shortlist = sl, probes = p)
        val got = fn().select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val rec = (brute & got).size.toDouble / brute.size
        // one timed sweep at the TIMING slice (queryMod) for the same knobs
        val tPred = col("id") % queryMod === 0
        val t0 = System.nanoTime()
        (if (p < 0) Similarity.hammingRerankTopK(
            emb, "vec_id", "embedding", tPred, 5, shortlist = sl)
         else Similarity.hammingRerankBucketedTopK(emb, "vec_id", "embedding",
            tPred, 5, polPlanes, shortlist = sl, probes = p))
          .write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"variant probes=$p%2d shortlist=$sl%3d recall=$rec%.3f time=$sec%7.2f s")
      }
      spark.stop(); return
    }

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
