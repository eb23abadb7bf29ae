package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.Tables
import graft.llm.Similarity

/** Does the MIPS lift preserve the LSH occupancy law? The lift maps
  * every corpus vector onto the radius-m hemisphere `[x,
  * sqrt(m²−‖x‖²)]` — angles COMPRESS toward the lifted pole for
  * short vectors (short ⇒ large lift component ⇒ small angular
  * spread), so lifted sign-buckets could in principle crowd
  * differently than plain cosine buckets as the corpus grows, and
  * the [[LshScaleExp]] recipe (bits/group ∝ log₂ corpus, probes to
  * buy recall back) needs its own measurement on the lifted space.
  *
  * Same methodology as [[LshScaleExp]]: groups:bits[:probes] arms
  * interleaved in one JVM, recall@5 vs [[Similarity.mipsTopK]]
  * (brute MIPS, not brute cosine — the lift changes the OBJECTIVE),
  * per-arm medians over sweeps. Planes are md5 at dim 65.
  *
  * Usage: tools/run.sh graft.tools.MipsScaleExp <sfDir> [g:b[:p]Csv]
  *        [sweeps] [queryMod]
  */
object MipsScaleExp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val arms = args.lift(1).getOrElse("16:6,16:10,16:10:10").split(",").map { a =>
      val parts = a.trim.split(":")
      (parts(0).toInt, parts(1).toInt, parts.lift(2).map(_.toInt).getOrElse(0))
    }.toSeq
    val sweeps = args.lift(2).map(_.toInt).getOrElse(3)
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

    def mipsLsh(arm: (Int, Int, Int)) = Similarity.mipsLshTopK(emb, "vec_id",
      "embedding", pred, k = 5,
      Similarity.md5Planes(dim = 65, groups = arm._1, bitsPerGroup = arm._2),
      probes = arm._3)

    arms.foreach(a => mipsLsh(a).count())
    val samples = collection.mutable.Map.empty[(Int, Int, Int), Vector[Double]].withDefaultValue(Vector.empty)
    for (_ <- 1 to sweeps; a <- arms) {
      val t0 = System.nanoTime()
      mipsLsh(a).count()
      samples(a) = samples(a) :+ (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache(); System.gc()
    }

    val brute = Similarity.mipsTopK(emb, "vec_id", "embedding", pred, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"corpus=$n queries=${brute.map(_._1).size} sf=$sfDir sweeps=$sweeps")
    arms.foreach { a =>
      val got = mipsLsh(a).select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (brute & got).size.toDouble / brute.size
      val s = samples(a).sorted
      println(f"groups=${a._1}%2d bits=${a._2}%2d probes=${a._3}%2d  median=${s(s.size / 2)}%6.2f s  min=${s.head}%6.2f  max=${s.last}%6.2f  recall@5=$recall%.3f")
    }
    spark.stop()
  }
}
