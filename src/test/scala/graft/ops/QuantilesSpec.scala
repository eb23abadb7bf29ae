package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class QuantilesSpec extends SparkSpec {

  test("rank-selected quantiles match a hand-computed tiny case") {
    import spark.implicits._
    // k=a values 1..10: p25→rank ceil(2.5)=3, p50→5, p99→ceil(9.9)=10
    val df = (1 to 10).map(i => ("a", i.toDouble, i.toLong)).toDF("k", "v", "id")
    val out = Quantiles.exactQuantiles(df, "k", "v", "id", Seq(25, 50, 99))
      .collect().map(r => (r.getInt(1), r.getDouble(2))).toSet
    assert(out === Set((25, 3.0), (50, 5.0), (99, 10.0)))
  }

  test("approx_percentile lands within 1% rank error of the exact quantiles") {
    val ev = Tables.events(spark, sf("sf0.01"))
    val exact = Quantiles.exactQuantiles(ev, "event_type", "value", "event_id",
        Seq(25, 50, 75, 90))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // rank-error bound: the sketch's value must sit between the exact
    // quantiles at p±1 (accuracy 10000 → ~0.01% rank error; 1% is lax)
    val lo = Quantiles.exactQuantiles(ev, "event_type", "value", "event_id",
        Seq(24, 49, 74, 89))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val hi = Quantiles.exactQuantiles(ev, "event_type", "value", "event_id",
        Seq(26, 51, 76, 91))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val approx = ev.groupBy("event_type")
      .agg(percentile_approx(col("value"),
        array(lit(0.25), lit(0.5), lit(0.75), lit(0.9)), lit(10000)).as("qs"))
      .collect().flatMap { r =>
        r.getSeq[Double](1).zip(Seq(25, 50, 75, 90)).map { case (v, p) =>
          (r.getString(0), p) -> v
        }
      }.toMap
    approx.foreach { case ((k, p), v) =>
      assert(v >= lo((k, p - 1)) && v <= hi((k, p + 1)),
        s"$k p$p: approx $v outside [${lo((k, p - 1))}, ${hi((k, p + 1))}]")
    }
  }
}
