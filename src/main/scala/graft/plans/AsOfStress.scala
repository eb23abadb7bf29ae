package graft.plans
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scratch: dense-right as-of stress, native vs classic. */
object AsOfStress {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val nKeys = 3
    val left = spark.range(args.headOption.map(_.toInt).getOrElse(30000).toLong).select((col("id") % nKeys).as("k"),
      (col("id") * 100).as("t"), col("id").as("lid")).cache()
    val right = spark.range(args.lift(1).map(_.toInt).getOrElse(3000000).toLong).select((col("id") % nKeys).as("rk"),
      col("id").as("rt"), (col("id") * 2).as("v")).cache()
    left.count(); right.count()
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag: ${(System.nanoTime()-t0)/1e9}%.1f s ($n rows)")
    }
    // tolerance 50_000 ticks => ~500 right rows in band per left row
    time("native ")(AsOfJoinNative.join(left.toDF(), right.toDF(), "k", "t", "rk", "rt", 50000L).count())
    if (!args.contains("nativeonly")) time("classic")(graft.ops.AsOfJoin.joined(
      left.toDF(), right.toDF().withColumnRenamed("rk", "k"),
      "k", "t", "rt", expr("CAST(50000 AS BIGINT)"), Seq("k", "lid")).count())
    spark.stop()
  }
}
