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

  test("iqr outliers: exactly the points outside the Tukey fences") {
    import spark.implicits._
    // 1..10 plus extremes -100 and 1000 -> 12 values; q1=rank 3, q3=rank 9
    val vals = Seq(-100.0) ++ (1 to 10).map(_.toDouble) ++ Seq(1000.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("a", v, i.toLong) }
      .toDF("k", "v", "id")
    val out = Quantiles.iqrOutliers(df, "k", "v", "id", k = 1.5)
      .collect().map(_.getAs[Double]("v")).toSet
    // q1 = value at rank ceil(.25*12)=3 -> 2.0; q3 = rank 9 -> 8.0;
    // fences: 2-9=-7, 8+9=17 -> only the planted extremes flagged
    assert(out === Set(-100.0, 1000.0))
    val bounds = Quantiles.iqrOutliers(df, "k", "v", "id", k = 1.5).head()
    assert(bounds.getAs[Double]("lo") === -7.0)
    assert(bounds.getAs[Double]("hi") === 17.0)
  }

  test("numeric profile: one-pass census matches direct aggregates") {
    import spark.implicits._
    val df = Seq((1L, Some(2.0)), (2L, None), (3L, Some(2.0)), (4L, Some(5.0)))
      .toDF("id", "v")
    val p = Profiler.numericProfile(df, Seq("id", "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p("id").getAs[Long]("n") === 4L)
    assert(p("id").getAs[Long]("n_null") === 0L)
    assert(p("id").getAs[Long]("n_distinct") === 4L)
    assert(p("v").getAs[Long]("n_null") === 1L)
    assert(p("v").getAs[Long]("n_distinct") === 2L)
    assert(p("v").getAs[Double]("vmin") === 2.0 && p("v").getAs[Double]("vmax") === 5.0)
    // single scan: exactly one leaf scan node in the plan
    val q = Profiler.numericProfile(Tables.events(spark, sf("sf0.001")),
      Seq("event_id", "user_id", "value"))
    val leaves = q.queryExecution.executedPlan.collectLeaves()
    assert(leaves.size === 1, s"profiler must scan once:\n${q.queryExecution.executedPlan}")
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

  test("bucketize: equal-frequency bins with exact boundary semantics") {
    import spark.implicits._
    val df = (1 to 100).map(i => ("g", i.toDouble, i.toLong)).toDF("k", "v", "id")
    val out = Quantiles.bucketize(df, "k", "v", "id", nBuckets = 4)
      .collect().map(r => r.getAs[Double]("v") -> r.getAs[Int]("bucket")).toMap
    // cutoffs at ranks 25/50/75 -> values 25,50,75; bucket = 1 + #cuts below
    assert(out(1.0) === 1 && out(25.0) === 1)
    assert(out(26.0) === 2 && out(50.0) === 2)
    assert(out(51.0) === 3 && out(75.0) === 3)
    assert(out(76.0) === 4 && out(100.0) === 4)
    val sizes = out.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes === Map(1 -> 25, 2 -> 25, 3 -> 25, 4 -> 25))
  }

  test("bottom-k sketch: identical output under any partitioning") {
    val ev = Tables.events(spark, sf("sf0.01"))
    def run(parts: Int) =
      Quantiles.sampledQuantiles(ev.repartition(parts), "event_type", "value",
          "event_id", k = 128, pcts = Seq(10, 50, 90))
        .collect().map(r => (r.getString(0), r.getInt(1)) ->
          (r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    assert(run(1) === run(17))
  }

  test("bottom-k sketch degenerates to exact quantiles when n <= k") {
    import spark.implicits._
    val df = (1 to 50).map(i => ("g", i.toDouble, i.toLong)).toDF("k", "v", "id")
    val est = Quantiles.sampledQuantiles(df, "k", "v", "id", k = 1000,
        pcts = Seq(25, 50, 99))
      .collect().map(r => (r.getInt(1), r.getDouble(2))).toSet
    // same ranks as exactQuantiles over all 50 values: 13, 25, 50
    assert(est === Set((25, 13.0), (50, 25.0), (99, 50.0)))
    val meta = Quantiles.sampledQuantiles(df, "k", "v", "id", k = 1000,
      pcts = Seq(50)).head()
    assert(meta.getLong(3) === 50L && meta.getLong(4) === 50L)
  }

  test("bottom-k sketch estimate sits within DKW rank error of exact") {
    // k=256 ⇒ ε = sqrt(ln(2/δ)/(2k)) ≈ 0.13 at δ=1e-4; assert 0.15.
    val ev = Tables.events(spark, sf("sf0.01"))
    val est = Quantiles.sampledQuantiles(ev, "event_type", "value", "event_id",
        k = 256, pcts = Seq(10, 50, 90))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2))
    // empirical CDF per group from the full data
    val all = ev.select("event_type", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    val worst = est.map { case ((g, p), v) =>
      val vs = all(g)
      val rank = vs.count(_ <= v).toDouble / vs.length
      math.abs(rank - p / 100.0)
    }.max
    info(f"worst sketch rank error: $worst%.4f (bound 0.15)")
    assert(worst <= 0.15)
  }

  test("bottom-k sketch plan: one aggregation, no window over the data") {
    val ev = Tables.events(spark, sf("sf0.001"))
    val q = Quantiles.sampledQuantiles(ev, "event_type", "value", "event_id",
      k = 64, pcts = Seq(50))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"sketch must not sort the data:\n$plan")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected a typed aggregate:\n$plan")
  }

  test("winsorize clips into the group's [p-lo, p-hi] envelope, keeps all rows") {
    import spark.implicits._
    val df = (1 to 100).map(i => ("g", i.toLong, i.toDouble)).toDF("k", "id", "v")
    val out = Quantiles.winsorize(df, "k", "v", "id", loPct = 10, hiPct = 90)
    assert(out.count() === 100)
    val clipped = out.select("v", "v_wins").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    // p10 of 1..100 by rank ceil(10*100/100)=10 -> 10.0; p90 -> 90.0
    assert(clipped.forall { case (v, w) => w == math.min(math.max(v, 10.0), 90.0) })
    assert(clipped.count { case (v, w) => v != w } === 19) // 1..9 and 91..100
  }
}
