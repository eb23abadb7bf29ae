package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.QualityClassifier

/** Measures the NB serving crossover: map-literal scoring
  * ([[QualityClassifier.nbScoreMap]] — zero shuffle, but the model
  * inlines as a ~2·B-child CreateMap expression per projection) vs
  * the broadcast-join scorer ([[QualityClassifier.nbScore]] — one
  * doc-keyed shuffle, model as a B-row broadcast relation) as the
  * hashed-feature bucket count B grows. The module doc inherits
  * [[graft.llm.Dsir.LiteralModelMaxBuckets]]'s janino rationale; this
  * experiment replaces the analogy with NB's own numbers.
  *
  * Method: interleaved arms in one JVM (the LoopExp discipline — the
  * trustworthy comparison form on this box), median of `runs` serial
  * passes per arm per B, count() action (both arms end in the same
  * aggregate shape). Bit-equality of the two arms' score sums is
  * asserted per B before timing.
  *
  * Usage: tools/run.sh graft.tools.NbServeExp [sfDir] [runs]
  */
object NbServeExp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).localCheckpoint()
    val train = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      .withColumn("pos", pmod(col("doc_id"), lit(3)) === 0)
    val score = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      .localCheckpoint()
    println(s"sf=$sfDir train=${train.count()} score=${score.count()} runs=$runs")

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    for (b <- Seq(256, 1024, 2048, 4096, 8192, 16384)) {
      val feat = QualityClassifier.hashedFeature(b)
      val model = QualityClassifier.nbModel(train, "text", col("pos"), feat)
        .localCheckpoint()
      val prior = QualityClassifier.nbPrior(train, col("pos")).localCheckpoint()
      val (m, oov, pm) = QualityClassifier.serve(model, prior)
      def litArm() = QualityClassifier
        .nbScoreMap(score, "doc_id", "text", m, oov, pm, feat)
        .agg(sum("score_micro")).collect().head.getLong(0)
      def joinArm() = QualityClassifier
        .nbScore(score, "doc_id", "text", model, prior, feat)
        .agg(sum("score_micro")).collect().head.getLong(0)
      // third arm (r10): the ONE-row broadcast-map serving form — the
      // stream-legal join path (serveRow + nbScoreBroadcast); the map
      // is broadcast DATA, so like the shuffle join it should be
      // feature-count-invariant, without the doc-side shuffle
      val servingRow = QualityClassifier.serveRow(model, prior).localCheckpoint()
      def bcastArm() = QualityClassifier
        .nbScoreBroadcast(score, "doc_id", "text", servingRow, feat)
        .agg(sum("score_micro")).collect().head.getLong(0)
      // fourth arm (r10): dense O(1) array-literal serving of the
      // hashed model — flat in B by construction (element_at on an
      // array literal is an index, not the map forms' linear key scan)
      val (dl, docc, dpm) = QualityClassifier.serveDense(model, prior, b)
      def denseArm() = QualityClassifier
        .nbScoreDense(score, "doc_id", "text", dl, docc, dpm, b)
        .agg(sum("score_micro")).collect().head.getLong(0)
      require(litArm() == joinArm(), s"arms diverge at B=$b") // also warms both
      require(bcastArm() == litArm(), s"bcast arm diverges at B=$b")
      require(denseArm() == litArm(), s"dense arm diverges at B=$b")
      val (ts1, ts2, ts3, ts4) = (Seq.newBuilder[Double], Seq.newBuilder[Double],
        Seq.newBuilder[Double], Seq.newBuilder[Double])
      for (_ <- 1 to runs) {
        ts1 += time(litArm()); ts2 += time(joinArm())
        ts3 += time(bcastArm()); ts4 += time(denseArm())
      }
      val (l, j, bc, de) = (med(ts1.result()), med(ts2.result()),
        med(ts3.result()), med(ts4.result()))
      println(f"B=$b%6d features=${m.size}%6d literal=$l%7.3f s  join=$j%7.3f s  bcast=$bc%7.3f s  dense=$de%7.3f s  literal/join=${l / j}%5.2f  bcast/join=${bc / j}%5.2f  dense/join=${de / j}%5.2f")
    }
    spark.stop()
  }
}
