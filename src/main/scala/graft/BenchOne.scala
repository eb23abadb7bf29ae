package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time a single query (or comma list) at a given sf dir.
  * Usage: tools/run.sh graft.BenchOne <sfDir> <name>[,<name>…] [explain]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val explain = args.length > 2 && args(2) == "explain"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      if (explain) SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      // time fn() too: iterative operators (connected components) do
      // eager checkpointed work during construction, as Bench does.
      // noop sink, not count(): same action as Bench.force (guide §1.4
      // — count() prunes output-only work and under-measures it)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f s  $name")
    }
    spark.stop()
  }
}
