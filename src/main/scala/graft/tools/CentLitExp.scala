package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.DenseLit

/** LitSerExp's sibling for STRUCT-SHAPED model constants (r11 verdict
  * #3): IVF centroid tables (k×dim doubles) and PQ codebooks
  * (m×codes×sub) used to ride the plan as nested boxed literals
  * (`typedlit(Seq[Seq[Double]])` / struct arrays) — the same
  * JavaSerializer-walks-an-object-graph-per-action encoding whose
  * curve the NB sweep showed is heap-hostile (boxed OOMed an 8g JVM at
  * 16M longs). This A/B isolates the encoding at centroid shapes: a
  * k×64 table as (a) a boxed nested literal with
  * `element_at(element_at(lit, i+1), j+1)` vs (b) ONE row-major
  * primitive-double [[DenseLit.doubles]] literal with
  * `element_at(lit, i*dim + j + 1)` — O(1) offset arithmetic, flat
  * byte region. Fixed 1000-row corpus so per-row work is negligible;
  * value equality asserted per shape before timing.
  *
  * Usage: tools/run.sh graft.tools.CentLitExp [runs] [k-list]
  * (default k = 512,4096 at dim 64 → 32k / 256k elements, the widths
  * the r11 verdict asked for; pass more to probe the curve.)
  */
object CentLitExp {
  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(5)
    val ks = args.lift(1)
      .map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(512, 4096))
    val dim = 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    for (k <- ks) {
      val table: Seq[Seq[Double]] = Seq.tabulate(k)(i =>
        Seq.tabulate(dim)(j => ((i * 31 + j * 7) % 97) / 97.0))
      val docs = (0L until 1000L).map(l => (l, (l % k).toInt, (l % dim).toInt))
        .toDF("id", "i", "j").localCheckpoint()
      val boxed = typedlit(table)
      val flat = DenseLit.doubles(table.flatten.toArray)
      def armBoxed() = docs
        .select(element_at(element_at(boxed, col("i") + 1), col("j") + 1).as("v"))
        .agg(sum("v")).collect().head.getDouble(0)
      def armFlat() = docs
        .select(element_at(flat, col("i") * dim + col("j") + 1).as("v"))
        .agg(sum("v")).collect().head.getDouble(0)
      require(armBoxed() == armFlat(), s"arms diverge at k=$k")
      val (t1, t2) = (Seq.newBuilder[Double], Seq.newBuilder[Double])
      for (_ <- 1 to runs) { t1 += time(armBoxed()); t2 += time(armFlat()) }
      println(f"k=$k%6d dim=$dim (${k * dim}%8d elems) boxed=${med(t1.result())}%6.3f s  flat=${med(t2.result())}%6.3f s")
    }
    spark.stop()
  }
}
