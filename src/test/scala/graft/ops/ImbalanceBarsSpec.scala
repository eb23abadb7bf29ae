package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class ImbalanceBarsSpec extends SparkSpec {

  test("hand case: signs, resets, and the crossing row closing its bar") {
    import spark.implicits._
    // prices: 1,2,3,2,2,1,5 -> signs +1(first),+1,+1,-1,-1(carry),-1,+1
    // theta:   1, 2, 3(close T=3, reset), -1, -2, -3(close), 1
    val df = Seq(1.0, 2.0, 3.0, 2.0, 2.0, 1.0, 5.0).zipWithIndex
      .map { case (p, i) => ("k", i.toLong, i.toLong, p) }
      .toDF("k", "t", "id", "p")
    val out = ImbalanceBars.bars(df, "k", "t", "p", threshold = 3L,
        tieCols = Seq("id"))
      .orderBy("bar_num").collect()
    assert(out.length === 3)
    assert(out(0).getAs[Long]("theta") === 3L)   // rows 0-2
    assert(out(0).getAs[Long]("n_trades") === 3L)
    assert(out(0).getAs[Double]("close") === 3.0)
    assert(out(1).getAs[Long]("theta") === -3L)  // rows 3-5
    assert(out(1).getAs[Double]("open") === 2.0)
    assert(out(2).getAs[Long]("n_trades") === 1L) // trailing partial
    assert(out(2).getAs[Long]("theta") === 1L)
  }

  test("every closed bar has |theta| exactly at the threshold") {
    val ev = Tables.events(spark, sf("sf0.01"))
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val bars = ImbalanceBars.bars(ev, "user_id", "ts", "value", 4L,
      Seq("event_id")).collect()
    val lastBar = bars.groupBy(_.getLong(0))
      .map { case (k, bs) => k -> bs.map(_.getInt(1)).max }
    bars.foreach { r =>
      val closed = r.getInt(1) < lastBar(r.getLong(0))
      if (closed)
        assert(math.abs(r.getAs[Long]("theta")) === 4L,
          s"closed bar must sit exactly at the threshold: $r")
      else
        assert(math.abs(r.getAs[Long]("theta")) <= 4L)
    }
    assert(bars.length > Tables.events(spark, sf("sf0.01"))
      .select("user_id").distinct().count(), "expected multiple bars per key")
  }

  test("equals a brute-force sequential reference; partition-invariant") {
    val ev = Tables.events(spark, sf("sf0.001"))
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    def run(parts: Int) = ImbalanceBars.bars(ev.repartition(parts),
        "user_id", "ts", "value", 3L, Seq("event_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getDouble(2), r.getDouble(5), r.getAs[Long]("theta"), r.getAs[Long]("n_trades")))
      .toMap
    val a = run(1)
    assert(a === run(13))
    // brute reference
    val raw = ev.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    val want = raw.flatMap { case (k, rows) =>
      val ord = rows.sortBy(r => (r._2.getTime, r._3))
      var lastP = Double.NaN; var lastS = 1; var theta = 0L; var bar = 0
      val acc = collection.mutable.Map.empty[Int, (Double, Double, Long, Long)]
      ord.zipWithIndex.foreach { case ((_, _, _, p), i) =>
        if (i == 0) { lastP = p }
        else {
          lastS = if (p > lastP) 1 else if (p < lastP) -1 else lastS
          lastP = p
        }
        theta += lastS
        val cur = acc.get(bar)
        acc(bar) = cur match {
          case None => (p, p, lastS.toLong, 1L)
          case Some((o, _, th, n)) => (o, p, th + lastS, n + 1)
        }
        if (math.abs(theta) >= 3) { bar += 1; theta = 0 }
      }
      acc.map { case (b, (o, c, th, n)) => (k, b) -> (o, c, th, n) }
    }
    assert(a === want)
  }
}
