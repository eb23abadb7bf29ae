package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class EwmaSpec extends SparkSpec {

  private val alpha = 0.8

  /** Driver-side reference fold. */
  private def foldEwma(vs: Seq[Double]): Double =
    vs.tail.foldLeft(vs.head)((e, x) => alpha * x + (1 - alpha) * e)

  test("aggregator equals sequential fold regardless of partitioning") {
    import spark.implicits._
    val vs = Seq(1.0, 5.0, 2.0, 9.0, 4.5, 3.25)
    val df = vs.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }
      .toDF("k", "ts", "v").repartition(5)
    val ew = Ewma.ewmaUdaf(alpha)
    val got = df.groupBy("k").agg(ew(col("ts"), col("v")).as("e"))
      .collect()(0).getDouble(1)
    assert(got === foldEwma(vs)) // bit-exact: same IEEE op sequence
  }

  test("rowwise mapPartitions scan equals aggregator at every prefix") {
    val ev = Tables.events(spark, sf()).select(col("event_id"), col("user_id"),
      col("ts"), col("value"))
    val rw = Ewma.rowwise(ev, "user_id", Seq("ts"), "value", alpha, "ewma")
    // final row per key from rowwise == grouped aggregator result
    val lastPerKey = rw.groupBy("user_id")
      .agg(max_by(col("ewma"), col("ts")).as("ewma"))
    val ewu = Ewma.ewmaUdaf(alpha)
    val agg = ev.select(col("user_id"), unix_micros(col("ts")).as("tsu"), col("value"))
      .groupBy("user_id").agg(ewu(col("tsu"), col("value")).as("ewma"))
    val joined = lastPerKey.as("a").join(agg.as("b"), "user_id")
      .filter(col("a.ewma") =!= col("b.ewma"))
    assert(joined.count() === 0)
  }

  test("rowwise is partitioning-invariant") {
    val ev = Tables.events(spark, sf()).select(col("event_id"), col("user_id"),
      col("ts"), col("value"))
    val a = Ewma.rowwise(ev.repartition(1), "user_id", Seq("ts"), "value", alpha, "ewma")
      .orderBy("event_id").collect().toSeq
    val b = Ewma.rowwise(ev.repartition(13), "user_id", Seq("ts"), "value", alpha, "ewma")
      .orderBy("event_id").collect().toSeq
    assert(a === b)
  }

  test("fused macd equals the three-pass rowwise composition bit-exactly") {
    val ev = Tables.events(spark, sf()).select(col("event_id"), col("user_id"),
      col("ts"), col("value"))
    val (af, as, asig) = (2.0 / 13.0, 2.0 / 27.0, 2.0 / 10.0)
    val fused = Ewma.macd(ev, "user_id", Seq("ts"), "value", af, as, asig)
      .orderBy("event_id").collect().toSeq
    // naive composition: two EWMAs of value, then an EWMA of macd
    val composed = Ewma.rowwise(
        Ewma.rowwise(
          Ewma.rowwise(ev, "user_id", Seq("ts"), "value", af, "ema_fast"),
          "user_id", Seq("ts"), "value", as, "ema_slow")
          .withColumn("macd", col("ema_fast") - col("ema_slow")),
        "user_id", Seq("ts"), "macd", asig, "signal")
      .withColumn("histogram", col("macd") - col("signal"))
      .orderBy("event_id").collect().toSeq
    assert(fused === composed)
    assert(fused.nonEmpty)
  }

  test("macd pays a single shuffle (the fused-pass contract)") {
    val ev = Tables.events(spark, sf()).select(col("event_id"), col("user_id"),
      col("ts"), col("value"))
    val plan = Ewma.macd(ev, "user_id", Seq("ts"), "value")
      .queryExecution.executedPlan.toString()
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 1, s"fused macd must shuffle once:\n$plan")
  }
}
