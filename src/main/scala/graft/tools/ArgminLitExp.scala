package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.{DenseLit, Similarity}

/** Three-arm A/B for the argmin-cell SERVING encoding (r12 follow-up
  * to the CentLitExp finding): the boxed struct-array literal is
  * per-ACTION hostile (object graph per micro-batch), but the first
  * flat re-encode paid a per-ROW tax instead — `slice(flat, i·dim+1,
  * dim)` copies dim doubles per (row, cell) before the dot kernel
  * sees them. Arms, all bit-equal by construction:
  *
  *  a. boxed   — `typedLit(Seq[(Int, Seq[Double], Double)])`,
  *     per-cell vector by `getField` (reference, no copy) — the r11
  *     form;
  *  b. slice   — ONE row-major DenseLit.doubles + per-row slice —
  *     the first r12 form;
  *  c. percell — k SEPARATE dim-length DenseLit.doubles literals,
  *     argmin over an explicit array of k (dist, cell) structs — no
  *     copy, flat serialization, k codegen children (the CreateMap
  *     lesson bounds k).
  *
  * Corpus is sized so per-row cost dominates (the stream-replay
  * regime where the 0.60x reading appeared).
  *
  * Usage: tools/run.sh graft.tools.ArgminLitExp [rows] [runs] [k-list]
  */
object ArgminLitExp {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(200000)
    val runs = args.lift(1).map(_.toInt).getOrElse(5)
    val ks = args.lift(2)
      .map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(64, 256, 1024))
    val dim = 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = spark.range(rows.toLong).select(col("id"),
        transform(sequence(lit(0), lit(dim - 1)),
          j => (pmod(col("id") * 31 + j * 7, lit(97)) / 97.0)).as("v"))
      .localCheckpoint()
    val base = Similarity.withNorm(docs, "v").localCheckpoint()
    val dotF = Similarity.dotAdaptive(base)(_, _)

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    for (k <- ks) {
      val cents: Seq[(Int, Seq[Double], Double)] = Seq.tabulate(k) { i =>
        val cv = Seq.tabulate(dim)(j => ((i * 13 + j * 3) % 89) / 89.0)
        (i, cv, cv.foldLeft(0.0)((a, x) => a + x * x))
      }
      def run(best: Column): Long = base
        .select(best.as("cell")).agg(sum("cell")).collect().head.getLong(0)

      val boxedLit = typedLit(cents)
      def boxedArm(): Long = run(
        array_min(transform(boxedLit, c =>
          struct((col("__norm") + c.getField("_3") -
            lit(2.0) * dotF(col("v"), c.getField("_2"))).as("dist"),
            c.getField("_1").as("cell")))).getField("cell").cast("long"))

      val cvFlat = DenseLit.doubles(cents.flatMap(_._2).toArray)
      val cnLit = DenseLit.doubles(cents.map(_._3).toArray)
      val cellLit = DenseLit.longs(cents.map(_._1.toLong).toArray)
      def sliceArm(): Long = run(
        array_min(transform(sequence(lit(0), lit(k - 1)), i =>
          struct((col("__norm") + element_at(cnLit, i + 1) -
            lit(2.0) * dotF(col("v"), slice(cvFlat, i * lit(dim) + lit(1), lit(dim))))
              .as("dist"),
            element_at(cellLit, i + 1).cast("int").as("cell"))))
          .getField("cell").cast("long"))

      val perCell = cents.map { case (id, cv, cn) =>
        struct((col("__norm") + lit(cn) -
          lit(2.0) * dotF(col("v"), DenseLit.doubles(cv.toArray))).as("dist"),
          lit(id).as("cell"))
      }
      def perCellArm(): Long = run(
        array_min(array(perCell: _*)).getField("cell").cast("long"))

      val (a, b, c) = (boxedArm(), sliceArm(), perCellArm())
      require(a == b && b == c, s"arms diverge at k=$k: $a $b $c")
      val (t1, t2, t3) =
        (Seq.newBuilder[Double], Seq.newBuilder[Double], Seq.newBuilder[Double])
      for (_ <- 1 to runs) {
        t1 += time(boxedArm()); t2 += time(sliceArm()); t3 += time(perCellArm())
      }
      println(f"k=$k%5d dim=$dim rows=$rows boxed=${med(t1.result())}%7.3f s  slice=${med(t2.result())}%7.3f s  percell=${med(t3.result())}%7.3f s")
    }
    spark.stop()
  }
}
