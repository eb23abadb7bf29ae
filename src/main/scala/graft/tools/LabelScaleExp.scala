package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.Tables
import graft.llm.{ScalePolicy, Similarity}

/** Decade measurement for the LABEL-family bucketed arms
  * (hard-negative mining / kNN classification): pinned 16×6 planes
  * (the driver queries' oracle-restated parameters) vs the
  * ScalePolicy occupancy-constant arm, interleaved in one JVM (the
  * LshScaleExp methodology — sequential whole-process runs carry
  * ±30% container drift). Recall@k of the bucketed negatives vs the
  * exact all-pairs miner is computed once per arm so the speed knob's
  * accuracy cost is measured, not assumed; classification agreement
  * with the exact vote is reported the same way.
  *
  * Two regimes, two invocations: FIXED query count (mod growing with
  * the corpus — isolates per-query cost; the index-side hashing is
  * the linear-in-corpus floor both arms share) and queries ∝ corpus
  * (mod 40, the driver queries' regime, `noacc` because exact ground
  * truth at 5k × 200k is itself the quadratic job the arm exists to
  * avoid — accuracy comes from the fixed-count invocation, which
  * subsets the same query population).
  *
  * Usage: tools/run.sh graft.tools.LabelScaleExp <sfDir> [queryMod] [sweeps] [noacc]
  */
object LabelScaleExp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/scale/sf1")
    val queryMod = args.lift(1).map(_.toInt).getOrElse(40)
    val sweeps = args.lift(2).map(_.toInt).getOrElse(3)
    val noacc = args.lift(3).contains("noacc")
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
    val pinned = Similarity.md5Planes(dim = 64, groups = 16, bitsPerGroup = 6)

    val arms: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "neg_pinned" -> (() => Similarity.hardNegativesBucketed(
        emb, "vec_id", "embedding", "label", pred, 5, pinned)),
      "neg_policy" -> (() => ScalePolicy.hardNegativesAuto(
        emb, "vec_id", "embedding", "label", pred, 5, n)),
      "cls_pinned" -> (() => Similarity.knnClassifyBucketed(
        emb, "vec_id", "embedding", "label", pred, 5, pinned)),
      "cls_policy" -> (() => ScalePolicy.knnClassifyAuto(
        emb, "vec_id", "embedding", "label", pred, 5, n)))

    arms.foreach(a => a._2().write.format("noop").mode("overwrite").save())
    val samples = collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to sweeps; (name, fn) <- arms) {
      val t0 = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      samples(name) = samples(name) :+ (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache(); System.gc()
    }

    val exactNeg = if (noacc) Set.empty[(Long, Long)] else
      Similarity.hardNegatives(emb, "vec_id", "embedding", "label", pred, 5)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactCls = if (noacc) Map.empty[Long, Int] else
      Similarity.knnClassify(emb, "vec_id", "embedding", "label", pred, 5)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    println(s"corpus=$n queries=${exactCls.size} sf=$sfDir sweeps=$sweeps " +
      s"policy_bits=${ScalePolicy.lshBitsFor(n)} " +
      s"policy_groups=${ScalePolicy.lshGroupsFor(ScalePolicy.lshBitsFor(n))}")
    arms.foreach { case (name, fn) =>
      val s = samples(name).sorted
      val acc =
        if (noacc) "acc=skipped"
        else if (name.startsWith("neg")) {
          val got = fn().select("query_id", "neighbor_id").collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
          f"recall@5=${(exactNeg & got).size.toDouble / exactNeg.size}%.3f"
        } else {
          val got = fn().collect().map(r => r.getLong(0) -> r.getInt(1))
          val agree = got.count { case (q, l) => exactCls(q) == l }
          f"agree=${agree.toDouble / got.length}%.3f answered=${got.length}"
        }
      println(f"$name%-10s median=${s(s.size / 2)}%7.2f s  min=${s.head}%7.2f  max=${s.last}%7.2f  $acc")
    }
    spark.stop()
  }
}
