package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.Tables
import graft.llm.Similarity

/** Measures LSH block refinement for the block-bounded pair operators
  * (`knn_graph` family): with a FIXED block vocabulary (10 labels),
  * per-block pair work is quadratic in corpus — the r5 sf1 curve
  * measured `knn_graph` at 8.6× for 10× data. Refining the block with
  * b group-0 sign-bucket bits ([[Similarity.refineBlock]]) divides
  * occupancy by ~2^b; growing b with log₂(corpus) holds it constant.
  *
  * Arms (bits; 0 = label-only baseline) interleave within one JVM
  * (LoopExp methodology). Quality = edge agreement: the fraction of
  * the baseline's (src,dst) top-k edges the refined graph keeps —
  * edges lost cross a bucket boundary, the standard blocking
  * approximation.
  *
  * Usage: tools/run.sh graft.tools.KnnBlockExp <sfDir> [bitsCsv] [sweeps]
  */
object KnnBlockExp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val arms = args.lift(1).getOrElse("0,2,3,4").split(",").map(_.trim.toInt).toSeq
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
    println(s"corpus=${emb.count()} sf=$sfDir sweeps=$sweeps")

    def graph(bits: Int) = {
      val blk = if (bits == 0) col("label").cast("string")
                else Similarity.refineBlock(emb, col("label"), col("embedding"), bits)
      Similarity.knnGraph(emb.withColumn("blk", blk), "vec_id", "embedding", "blk", k = 3)
    }

    // sweeps == 1 skips the warmup: at sf10 the bits=0 baseline arm is
    // a deliberately quadratic ~10-minute run — paying it twice to
    // warm JIT caches would double the experiment for a <5% timing
    // effect on runs that long
    if (sweeps > 1) arms.foreach(b => graph(b).count())
    val samples = collection.mutable.Map.empty[Int, Vector[Double]].withDefaultValue(Vector.empty)
    for (_ <- 1 to sweeps; b <- arms) {
      val t0 = System.nanoTime()
      graph(b).count()
      samples(b) = samples(b) :+ (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache(); System.gc()
    }

    // Two quality views: exact-edge agreement (strict — a lost edge
    // counts even when replaced by a near-equal in-block neighbor) and
    // mean edge cosine vs the baseline's (what downstream clustering /
    // diversity sampling actually consumes). Quality baseline = the
    // FIRST arm (bits=0 in the classic setup; at decades where bits=0
    // is prohibitive the first arm is the previous decade's recipe).
    val base = graph(arms.head).select("src", "dst", "cosine").collect()
    val baseline = base.map(r => (r.getLong(0), r.getLong(1))).toSet
    val baseCos = base.map(_.getDouble(2)).sum / base.length
    arms.foreach { b =>
      val rows = graph(b).select("src", "dst", "cosine").collect()
      val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
      val agree = (baseline & got).size.toDouble / baseline.size
      val meanCos = rows.map(_.getDouble(2)).sum / rows.length
      val s = samples(b).sorted
      println(f"bits=$b%2d  median=${s(s.size / 2)}%6.2f s  min=${s.head}%6.2f  max=${s.last}%6.2f  edge_agreement=$agree%.3f  mean_cos=$meanCos%.4f (baseline $baseCos%.4f)  edges=${rows.length}")
    }
    spark.stop()
  }
}
