package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generates an sf1 slice (default 10× sf0.1) for the scale-curve
  * experiment (VERDICT r4 "Next round" #3) — the heaviest six bench
  * queries need `orders`, `lineitem`, `documents`.
  *
  * The driver's testdata is read-only and stops at sf0.1, so the next
  * decade is synthesized by replication that PRESERVES each query's
  * workload profile instead of distorting it:
  *
  *  - `orders`/`lineitem`: key-space translation per replica (orderkey /
  *    custkey / suppkey / partkey each offset by a stride above their
  *    max), the standard TPC-H-style scaling — the order-flow graph
  *    becomes `replicas` disjoint copies, so nodes AND edges scale
  *    linearly exactly as a bigger generator run would.
  *  - `documents`: the corpus is random word sequences over a ~30-word
  *    vocabulary with planted dup/near-dup pairs. Each replica applies a
  *    cyclic permutation of that vocabulary (word i → word i+r mod V).
  *    A bijection on words preserves within-replica pair structure
  *    (planted near-identical word sequences stay near-identical), while
  *    a doc and its shifted copy relate like two random docs — far below
  *    any dup threshold — so pair output scales ~linearly with corpus
  *    size rather than quadratically (which naive text duplication would
  *    cause: every doc would gain C(replicas,2) exact-dup pairs and the
  *    curve would measure the synthetic pathology, not the engine).
  *
  * Replica 0 is the untouched original, so sf1 ⊇ sf0.1. Output stays
  * inside the repo (`target/` — not committed); testdata is never
  * written.
  *
  * Usage: runMain graft.tools.ScaleGen [outDir] [replicas] [srcDir]
  */
object ScaleGen {

  /** Next power of 10 strictly above v — keeps offset keys readable. */
  private def stride(v: Long): Long = {
    var s = 10L
    while (s <= v) s *= 10
    s
  }

  def main(args: Array[String]): Unit = {
    val out      = args.headOption.getOrElse("target/scale/sf1")
    val replicas = args.lift(1).map(_.toInt).getOrElse(10)
    val src      = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val orders   = spark.read.parquet(s"$src/orders.parquet")
    val lineitem = spark.read.parquet(s"$src/lineitem.parquet")
    val docs     = spark.read.parquet(s"$src/documents.parquet")

    // One row of maxima (tiny) drives every stride.
    val m = orders.agg(max("o_orderkey"), max("o_custkey")).collect()(0)
    val ml = lineitem.agg(max("l_suppkey"), max("l_partkey")).collect()(0)
    val (okS, ckS) = (stride(m.getLong(0)), stride(m.getLong(1)))
    val (skS, pkS) = (stride(ml.getLong(0)), stride(ml.getLong(1)))
    val docS = stride(docs.agg(max("doc_id")).collect()(0).getLong(0))

    def replicate(df: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until replicas).map(r => shift(df, r)).reduce(_.unionAll(_))

    replicate(orders) { (df, r) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(r * okS))
        .withColumn("o_custkey", col("o_custkey") + lit(r * ckS))
    }.write.mode("overwrite").parquet(s"$out/orders.parquet")

    replicate(lineitem) { (df, r) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(r * okS))
        .withColumn("l_suppkey", col("l_suppkey") + lit(r * skS))
        .withColumn("l_partkey", col("l_partkey") + lit(r * pkS))
    }.write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    // The whole vocabulary is ~30 words — a driver-side literal map per
    // replica, applied as a codegen'd transform (no UDF, no join).
    val vocab = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").distinct()
      .as[String].collect().sorted
    val v = vocab.length
    replicate(docs) { (df, r) =>
      val perm = typedLit(vocab.indices.map(i => vocab(i) -> vocab((i + r) % v)).toMap)
      val shifted = array_join(
        transform(split(col("text"), " "), w => coalesce(element_at(perm, w), w)),
        " ")
      df.withColumn("doc_id", col("doc_id") + lit(r * docS))
        .withColumn("text", if (r == 0) col("text") else shifted)
        .withColumn("n_chars", length(col("text")))
    }.write.mode("overwrite").parquet(s"$out/documents.parquet")

    println(s"wrote $out: replicas=$replicas strides ok=$okS ck=$ckS sk=$skS pk=$pkS doc=$docS vocab=$v")
    spark.stop()
  }
}
