package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.llm.TextHash._

/** Dev-side stage isolation for the md5 text-hashing family (guide
  * §1.1 first-principles + §1.4 noop sink): times each map-side stage
  * of the dedup/ngram pipelines separately so the optimization target
  * (per-token/per-gram `h32` = md5 → hex → conv, evaluated inside
  * interpreted higher-order lambdas) is a measured share, not a guess.
  *
  * Usage: tools/run.sh graft.tools.HashExp <sfDir> [nSweeps]
  */
object HashExp {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs = Tables.documents(spark, sfDir)

    val stages: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "scan_text" -> (() => docs.select(col("doc_id"), col("text"))),
      "split_words" -> (() => docs.select(col("doc_id"), wordSet(col("text")).as("toks"))),
      "word_h32" -> (() => docs.select(col("doc_id"),
        array_distinct(transform(wordSet(col("text")), t => h32(t))).as("hs"))),
      "word_h32_sig16" -> (() => {
        val d = docs.select(col("doc_id"),
          array_distinct(transform(wordSet(col("text")), t => h32(t))).as("hs"))
        d.select(col("doc_id"), call_function("minhash_sig", col("hs"), lit(16)).as("sig"))
      }),
      "gram3_h32_mod4" -> (() => docs.select(col("doc_id"),
        array_distinct(filter(transform(
          sequence(lit(1), greatest(length(col("text")) - 2, lit(1))),
          i => h32(col("text").substr(i, lit(3)))),
          h => h % 4 === 0)).as("grams"))),
      "wordgram8_h32" -> (() => {
        val ws = words(col("text"))
        docs.select(col("doc_id"),
          array_distinct(transform(
            sequence(lit(1), greatest(size(ws) - 7, lit(0)) + 1),
            i => h32(concat_ws(" ", slice(ws, i, lit(8)))))).as("grams"))
      })
    )

    def time(fn: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // warmup
    stages.foreach { case (_, fn) => time(fn) }
    val acc = collection.mutable.Map.empty[String, Vector[Double]].withDefaultValue(Vector.empty)
    for (_ <- 1 to n; (name, fn) <- stages) acc(name) = acc(name) :+ time(fn)
    def med(xs: Vector[Double]) = { val s = xs.sorted; s(s.size / 2) }
    stages.foreach { case (name, _) =>
      println(f"$name%-18s med=${med(acc(name))}%6.3f s  runs=${acc(name).map(x => f"$x%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
