package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Literal, UnsafeArrayData}
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Scratch A/B isolating the DenseCeilingExp slope: is the dense
  * arm's growth past B=64k per-row lookup cost or per-ACTION literal
  * serialization? Scores a fixed tiny corpus (so per-row work is
  * negligible) against a B-long literal in two encodings:
  * typedlit(IndexedSeq[Long]) (GenericArrayData over boxed values —
  * Java-serialized object graph in the taskBinary) vs an
  * UnsafeArrayData literal over the primitive array (flat byte
  * region). If the boxed arm grows with B while unsafe stays flat,
  * the ceiling is SERIALIZATION, not lookup.
  */
object LitSerExp {
  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(5)
    val widths = args.lift(1)
      .map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(16384, 65536, 262144, 1048576))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = (0L until 1000L).map(i => (i, i % 97)).toDF("id", "k")
      .localCheckpoint()
    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    for (b <- widths) {
      val arr = Array.tabulate(b)(i => (i * 7L) % 1000L)
      val boxed = typedlit(arr.toIndexedSeq)
      val unsafe = GraftSqlShim.column(Literal(
        UnsafeArrayData.fromPrimitiveArray(arr),
        ArrayType(LongType, containsNull = false)))
      def armBoxed() = docs
        .select(element_at(boxed, (col("k") + 1).cast("int")).as("v"))
        .agg(sum("v")).collect().head.getLong(0)
      def armUnsafe() = docs
        .select(element_at(unsafe, (col("k") + 1).cast("int")).as("v"))
        .agg(sum("v")).collect().head.getLong(0)
      require(armBoxed() == armUnsafe(), s"arms diverge at B=$b")
      val (t1, t2) = (Seq.newBuilder[Double], Seq.newBuilder[Double])
      for (_ <- 1 to runs) { t1 += time(armBoxed()); t2 += time(armUnsafe()) }
      println(f"B=$b%8d boxed=${med(t1.result())}%6.3f s  unsafe=${med(t2.result())}%6.3f s")
    }
    spark.stop()
  }
}
