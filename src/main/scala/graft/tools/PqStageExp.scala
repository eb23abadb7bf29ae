package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.llm.{Pq, Similarity}

/** Dev-side stage isolation for the PQ family (guide §1): how much of
  * pq_topk / ann_ivfpq_topk is codebook TRAINING (driver-coordinated
  * Lloyd collects — 4-5 sequential trainings) vs encoding vs the ADC
  * scan. Usage: tools/run.sh graft.tools.PqStageExp <sfDir> [n]
  */
object PqStageExp {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"  ${(System.nanoTime() - t0) / 1e9}%6.2f s  $label")
      r
    }

    for (i <- 1 to n) {
      println(s"sweep $i")
      val emb = Tables.embeddings(spark, sfDir)
      val base = emb.select(col("vec_id").cast("long").as("id"),
        Similarity.toDoubleVec(col("embedding")).as("v")).persist()
      val (books, encoded) = time("encode (4 Lloyd trainings + 4 assignment passes)") {
        val be = Pq.encode(base, "id", "v", dim = 64, m = 4, codes = 16, iters = 1)
        be._2.write.format("noop").mode("overwrite").save()
        be
      }
      time("coarse cells (1 Lloyd + assign)") {
        val cents = Similarity.lloydCentroids(base, "id", "v", 8, 1)
        Similarity.assignCells(base, "id", "v", cents)
          .write.format("noop").mode("overwrite").save()
      }
      base.unpersist()
      time("pq_topk full") {
        graft.SparkEntry.queries("pq_topk")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      time("ann_ivfpq_topk full") {
        graft.SparkEntry.queries("ann_ivfpq_topk")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
