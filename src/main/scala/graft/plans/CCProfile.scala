package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.llm.Dedup

/** Dev tool: profile the connected-components loop phases at a given
  * sf dir. Usage: tools/run.sh graft.plans.CCProfile /root/testdata/sf0.1
  */
object CCProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f s  $label"); r
    }
    val docs = Tables.documents(spark, sfDir)
    // warm
    Dedup.minHashNearDups(docs, "doc_id", "text", 16, 4, 0.85, 64).count()
    val pairs = time("pairs (warm)") {
      val p = Dedup.minHashNearDups(docs, "doc_id", "text", 16, 4, 0.85, 64)
        .persist()
      p.count(); p
    }
    var comp: org.apache.spark.sql.DataFrame = null
    (1 to 3).foreach { r =>
      comp = time(s"connectedComponents run$r") {
        val c = Dedup.connectedComponents(pairs, "id_a", "id_b",
          docs.select(col("doc_id")), "doc_id")
        c.count(); c
      }
    }
    time("cluster_size window") {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("rep")
      comp.withColumn("cluster_size", count(lit(1)).over(w)).count()
    }
    spark.stop()
  }
}
