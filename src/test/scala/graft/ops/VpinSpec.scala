package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.SparkSpec

class VpinSpec extends SparkSpec {

  private def trades(rows: Seq[(String, Int, Double, Double)]) = {
    import spark.implicits._
    rows.toDF("k", "t", "price", "vol")
      .withColumn("notional", col("vol").cast(DecimalType(20, 4)))
  }

  test("hand-computed: tick-rule signs, equal-volume buckets, trailing ratio") {
    // volumes of 10 → bucket size 20 cuts pairs of trades per bucket
    val df = trades(Seq(
      ("a", 1, 100.0, 10.0), // first trade: sign +1 by convention
      ("a", 2, 101.0, 10.0), // up-tick  → +1   | bucket 0: buy 20, sell 0
      ("a", 3, 100.0, 10.0), // down-tick → -1
      ("a", 4, 100.0, 10.0), // tie → carries -1 | bucket 1: buy 0, sell 20
      ("a", 5, 102.0, 10.0), // up-tick  → +1
      ("a", 6, 101.0, 10.0)  // down-tick → -1  | bucket 2: buy 10, sell 10
    ))
    val out = Vpin.vpin(df, "k", "t", "price", "notional",
        bucketSize = 20.0, trailing = 2)
      .orderBy("bucket").collect()
      .map(r => (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(5), r.getDouble(7)))
    // withBarNum buckets on cumsum/size: cumsum 20 → floor(20/20)=1, so
    // bucket boundaries land at the first trade CROSSING each multiple;
    // trades 1-2 cum 10,20 → buckets 0,1? No: floor(10/20)=0, floor(20/20)=1.
    // Buckets therefore: t1→0 | t2,t3→1 | t4,t5→2 | t6→3
    val expected = Seq(
      // (bucket, buy, sell, |imb|, vpin over trailing 2 buckets)
      (0, 10.0, 0.0, 10.0, 10.0 / 10.0),          // +1
      (1, 10.0, 10.0, 0.0, (10.0 + 0.0) / 30.0),  // +1(up), -1(down)
      (2, 10.0, 10.0, 0.0, (0.0 + 0.0) / 40.0),   // -1(tie carry), +1(up)
      (3, 0.0, 10.0, 10.0, (0.0 + 10.0) / 30.0)   // -1(down)
    )
    assert(out.toSeq === expected)
  }

  test("bucket layer equals a naive single-machine reference on random trades (5 seeds)") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val rows = (1 to 200).map { t =>
        ("k1", t, 100.0 + rnd.nextInt(5) - 2, (1 + rnd.nextInt(4)) * 5.0)
      }
      val df = rows.toDF("k", "t", "price", "vol")
        .withColumn("notional", col("vol").cast(DecimalType(20, 4)))
      val got = Vpin.vpin(df, "k", "t", "price", "notional", bucketSize = 50.0,
          trailing = 3)
        .collect()
        .map(r => r.getInt(1) -> ((r.getDouble(2), r.getDouble(3), r.getLong(6))))
        .toMap
      // naive: sequential signs and bucket accumulation
      var (prev, sign, cum) = (0.0, 1, 0.0)
      val acc = scala.collection.mutable.Map.empty[Int, (Double, Double, Long)]
      rows.zipWithIndex.foreach { case ((_, _, p, v), i) =>
        if (i > 0) sign = if (p > prev) 1 else if (p < prev) -1 else sign
        cum += v
        val b = math.floor(cum / 50.0).toInt
        val (buy, sell, n) = acc.getOrElse(b, (0.0, 0.0, 0L))
        acc(b) = (buy + (if (sign == 1) v else 0.0),
          sell + (if (sign == -1) v else 0.0), n + 1)
        prev = p
      }
      assert(got === acc.toMap, s"seed $seed")
    }
  }

  test("vpin is within [0, 1] and buckets partition the flow on real data") {
    val ev = graft.Tables.events(spark, sf())
      .select(col("user_id"), col("ts"), col("value"),
        col("value").cast(DecimalType(20, 4)).as("notional"))
    val out = Vpin.vpin(ev, "user_id", "ts", "value", "notional", 500.0, 5)
    assert(out.filter(col("vpin") < 0 || col("vpin") > 1 + 1e-12).count() === 0)
    // buy + sell account for every unit of bucket volume
    assert(out.filter(abs(col("buy_vol") + col("sell_vol") - col("bucket_vol")) > 1e-9)
      .count() === 0)
  }
}
