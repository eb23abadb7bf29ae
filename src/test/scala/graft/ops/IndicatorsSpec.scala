package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IndicatorsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("vwap weights prices by quantity exactly") {
    val df = Seq(
      ("A", 10.0, 1.0), ("A", 20.0, 3.0), // vwap = (10 + 60) / 4 = 17.5
      ("B", 5.0, 2.0)
    ).toDF("k", "p", "q")
    val out = Indicators.vwap(df, Seq("k"), "p", "q")
      .orderBy("k").collect()
    assert(out.map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3))).toSeq ==
      Seq(("A", 17.5, 4.0, 2L), ("B", 5.0, 2.0, 1L)))
  }

  test("bollinger: constant series has zero-width bands; frame is trailing n rows") {
    val df = (1 to 30).map(i => ("k", ts(i), i.toLong, 7.0))
      .toDF("k", "t", "id", "v")
    val out = Indicators.bollinger(df, "k", Seq("t", "id"), "v", n = 20, k = 2.0)
    val rows = out.select("mid", "upper", "lower").distinct().collect()
    assert(rows.length == 1 && rows(0).getDouble(0) == 7.0 &&
      rows(0).getDouble(1) == 7.0 && rows(0).getDouble(2) == 7.0)

    // two-value alternation: after the frame fills, mean is the frame mean
    val alt = (1 to 40).map(i => ("k", ts(i), i.toLong, if (i % 2 == 0) 2.0 else 0.0))
      .toDF("k", "t", "id", "v")
    val last = Indicators.bollinger(alt, "k", Seq("t", "id"), "v", n = 20, k = 2.0)
      .orderBy(desc("t")).select("mid").head().getDouble(0)
    assert(last == 1.0) // 10 zeros + 10 twos in any 20-row frame
  }

  test("drawdown tracks the running peak per key") {
    val df = Seq(
      ("k", ts(1), 1L, 10.0), ("k", ts(2), 2L, 8.0),
      ("k", ts(3), 3L, 12.0), ("k", ts(4), 4L, 9.0)
    ).toDF("k", "t", "id", "v")
    val out = Indicators.drawdown(df, "k", Seq("t", "id"), "v")
      .orderBy("t").select("peak", "drawdown").collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    assert(out == Seq((10.0, 0.0), (10.0, 2.0), (12.0, 0.0), (12.0, 3.0)))
  }

  test("rsi: all-gains series is 100; symmetric moves give 50") {
    val up = (1 to 10).map(i => ("k", ts(i), i.toDouble)).toDF("k", "t", "v")
    val rUp = Indicators.rsi(up, "k", "t", "v", period = 14).head()
    assert(rUp.getAs[Double]("rsi") == 100.0)
    assert(rUp.getAs[Double]("avg_loss") == 0.0)
    assert(rUp.getAs[Long]("n_moves") == 9L)

    // +1/-1 alternation: gains and losses see identical series (1,0,1,0..
    // vs 0,1,0,1.. shifted) — with an even number of moves the folds
    // differ, so use the exact recurrence to check instead
    val zig = (1 to 11).map(i => ("k", ts(i), if (i % 2 == 0) 1.0 else 0.0))
      .toDF("k", "t", "v")
    val r = Indicators.rsi(zig, "k", "t", "v", period = 14).head()
    val a = 1.0 / 14.0
    def fold(xs: Seq[Double]) = xs.tail.foldLeft(xs.head)((acc, x) => a * x + (1 - a) * acc)
    val gains = Seq(1.0, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0, 0.0)
    val losses = gains.map(g => 1.0 - g)
    assert(r.getAs[Double]("avg_gain") == fold(gains))
    assert(r.getAs[Double]("avg_loss") == fold(losses))
    val expect = 100.0 * fold(gains) / (fold(gains) + fold(losses))
    assert(r.getAs[Double]("rsi") == expect)

    // flat series: every move 0 → neutral 50 by convention
    val flat = (1 to 5).map(i => ("k", ts(i), 3.0)).toDF("k", "t", "v")
    assert(Indicators.rsi(flat, "k", "t", "v", period = 14)
      .head().getAs[Double]("rsi") == 50.0)
  }

  test("rangeVolatility: hand-computed Parkinson/GK from two known candles") {
    import spark.implicits._
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:00:00").toInstant
      .plusSeconds(m * 60L)
    // hour 0: 100 → 110 monotone (O=100 H=110 L=100 C=110)
    // hour 1: flat 100       (u = c = 0)
    val rows = Seq(
      ("a", java.sql.Timestamp.from(ts(0)), 100.0),
      ("a", java.sql.Timestamp.from(ts(30)), 105.0),
      ("a", java.sql.Timestamp.from(ts(59)), 110.0),
      ("a", java.sql.Timestamp.from(ts(60)), 100.0),
      ("a", java.sql.Timestamp.from(ts(90)), 100.0)
    ).toDF("k", "t", "p")
    val out = Indicators.rangeVolatility(rows, "k", "t", "p").collect()
    assert(out.length === 1)
    val r = out.head
    val um = math.floor(math.log(110.0 / 100.0) * 1e3 + 0.5).toLong // 95
    assert(r.getAs[Long]("n_candles") === 2L)
    assert(r.getAs[Long]("sum_u2") === um * um)
    assert(r.getAs[Long]("sum_c2") === um * um) // monotone candle: c == u
    val fourLn2 = 2.7725887222397812
    val twoLn2M1 = 0.3862943611198906
    val su = (um * um).toDouble // mirror the operator: quantized sums
    assert(r.getAs[Double]("parkinson") ===
      math.sqrt(su / (fourLn2 * 2) / 1e6))
    assert(r.getAs[Double]("garman_klass") ===
      math.sqrt((0.5 * su - twoLn2M1 * su) / 2 / 1e6))
    // GK clamp: a pure-drift candle (c² dominating) cannot go NaN
    assert(!r.getAs[Double]("garman_klass").isNaN)
  }

  test("rollingPairCorrelation: perfect, inverse, and degenerate pairs") {
    import spark.implicits._
    val h = 3600L * 1000000
    def ts(slot: Int) = new java.sql.Timestamp((slot * h + 1) / 1000)
    // keys 1,2,3 in one bucket: 2 = 1's prices doubled (corr 1),
    // 3 moves opposite to 1 (corr -1); key 4 constant vs nothing
    val rows = (0 until 6).flatMap { s =>
      Seq((1L, ts(s), 10.0 + s), (2L, ts(s), 20.0 + 2 * s),
        (3L, ts(s), 10.0 - s), (4L, ts(s), 7.0))
    }.toDF("user_id", "ts", "value")
    val out = Indicators.rollingPairCorrelation(rows, "user_id", "ts", "value",
        slotDur = "1 hour", n = 4, bucketSize = 10)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getTimestamp(2)),
        (r.getLong(5), Option(r.get(6)).map(_.asInstanceOf[Double]))))
      .toMap
    val lastSlot = ts(5)
    assert(out((1L, 2L, lastSlot))._2.exists(c => math.abs(c - 1.0) < 1e-12))
    assert(out((1L, 3L, lastSlot))._2.exists(c => math.abs(c + 1.0) < 1e-12))
    // constant series: zero variance → null, never NaN/∞
    assert(out((1L, 4L, lastSlot))._2.isEmpty)
    // first slot of any pair: single point → zero variance → null
    assert(out((1L, 2L, ts(0)))._2.isEmpty)
    // trailing frame caps at n=4 slots
    assert(out((1L, 2L, lastSlot))._1 === 4L)
  }
}
