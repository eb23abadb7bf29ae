package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.util.SizeEstimator

import graft.llm.QualityClassifier

/** Probes the DENSE array-literal serving ceiling (r10 verdict #2):
  * the dense forms' stated limit — 8·buckets bytes of driver/task
  * literal ([[graft.llm.Dsir.scoreDense]],
  * [[QualityClassifier.serveDense]]) — was asserted, not measured.
  * This sweep runs the dense NB scorer at B = 16k → 1M recording,
  * per width:
  *
  *  - `serve_s`    — [[QualityClassifier.serveDense]] wall time (the
  *    model collect + the B-long tabulate; driver-side, once per
  *    model refresh),
  *  - `plan_s`     — cold plan materialization (analysis + physical
  *    planning + codegen of a projection carrying the two B-long
  *    literals; once per query),
  *  - `lit_mb`     — SizeEstimator bytes of the two literal arrays
  *    (what the driver holds and the ONE task-binary broadcast per
  *    stage ships — literals ride the broadcast taskBinary, not each
  *    task),
  *  - `dense_s`    — scoring wall time, median of `runs` interleaved
  *    passes (the per-row cost the law says is flat in B),
  *  - `join_s`     — the broadcast-join scorer [[QualityClassifier
  *    .nbScore]] at the same B, the serving alternative past any
  *    ceiling.
  *
  * Bit-equality of dense vs join is asserted per B before timing.
  * The janino concern does NOT apply here by construction (one
  * Literal node regardless of B — the map literal's 2·B-child
  * CreateMap is what cliffs); the open question this sweep answers is
  * whether plan build, task-binary broadcast, or constant-folding
  * overheads introduce a SOFT ceiling before driver memory does.
  *
  * Usage: tools/run.sh graft.tools.DenseCeilingExp [sfDir] [runs] [widths]
  * (widths comma-separated; default sweeps 16k → 4M. r12 extended the
  * default one decade past r11's 1M bound on the LitSerExp 4M probe.)
  */
object DenseCeilingExp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(5)
    val widths = args.lift(2)
      .map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(16384, 65536, 262144, 1048576, 4194304))
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

    for (b <- widths) {
      val feat = QualityClassifier.hashedFeature(b)
      val model = QualityClassifier.nbModel(train, "text", col("pos"), feat)
        .localCheckpoint()
      val prior = QualityClassifier.nbPrior(train, col("pos")).localCheckpoint()
      val occupied = model.count()
      var served: (IndexedSeq[Long], IndexedSeq[Boolean], Long) = null
      val serveS = time { served = QualityClassifier.serveDense(model, prior, b) }
      val (dl, docc, dpm) = served
      val litMb = (SizeEstimator.estimate(dl.toArray) +
        SizeEstimator.estimate(docc.toArray)) / 1e6
      def denseDf() = QualityClassifier
        .nbScoreDense(score, "doc_id", "text", dl, docc, dpm, b)
      // cold plan build: fresh logical plan -> executed plan (codegen
      // fires lazily on first execution, so also time first run apart)
      val planS = time { denseDf().queryExecution.executedPlan }
      def denseArm() = denseDf()
        .agg(sum("score_micro")).collect().head.getLong(0)
      def joinArm() = QualityClassifier
        .nbScore(score, "doc_id", "text", model, prior, feat)
        .agg(sum("score_micro")).collect().head.getLong(0)
      val firstS = time { denseArm() } // includes codegen + JIT warmup
      require(denseArm() == joinArm(), s"arms diverge at B=$b")
      val (ts1, ts2) = (Seq.newBuilder[Double], Seq.newBuilder[Double])
      for (_ <- 1 to runs) { ts1 += time(denseArm()); ts2 += time(joinArm()) }
      val (de, j) = (med(ts1.result()), med(ts2.result()))
      println(f"B=$b%8d occupied=$occupied%6d serve=$serveS%6.2f s  plan=$planS%6.3f s  first=$firstS%6.2f s  lit=$litMb%7.2f MB  dense=$de%6.3f s  join=$j%6.3f s  dense/join=${de / j}%5.2f")
    }
    spark.stop()
  }
}
