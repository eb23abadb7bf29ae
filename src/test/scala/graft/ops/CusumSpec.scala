package graft.ops

import java.sql.Timestamp

import scala.util.Random

import graft.SparkSpec

class CusumSpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Int) = new Timestamp(1700000000000L + i * 1000L)

  /** Independent reference replicating the engine's exact chain. */
  private def ref(values: Seq[Double], slack: Long, h: Long): Seq[(Long, Long, Long, Boolean)] = {
    val n = values.length
    val bd = values.map(v => BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP))
    val s = bd.sum.doubleValue
    val ss = bd.map(x => x * x).sum.doubleValue
    val nD = n.toDouble
    val mu = s / nD
    val sigma = math.sqrt(nD * ss - s * s) / nD
    var sp = 0L; var sm = 0L
    bd.map { p =>
      val z = math.floor((p.doubleValue - mu) / sigma * 1e6 + 0.5).toLong
      sp = math.max(0L, sp + z - slack)
      sm = math.max(0L, sm - z - slack)
      val alarm = sp >= h || sm >= h
      val out = (z, sp, sm, alarm)
      if (alarm) { sp = 0L; sm = 0L }
      out
    }
  }

  test("matches the independent reference trajectory exactly on random series") {
    val r = new Random(17)
    val rows = for (k <- 0 until 5; i <- 0 until 80)
      yield (k.toLong, ts(i), (k * 1000 + i).toLong,
        math.rint(r.nextDouble() * 4000) / 10.0 + 1.0)
    val out = Cusum.monitor(rows.toDF("user_id", "ts", "event_id", "value"),
        "user_id", Seq("ts", "event_id"), "value", 500000L, 3000000L)
      .collect()
      .map(x => (x.getLong(0), x.getLong(2), x.getLong(3), x.getLong(4),
        x.getLong(5), x.getBoolean(6)))
      .groupBy(_._1)
    for (k <- 0L until 5L) {
      val got = out(k).sortBy(_._2).map(t => (t._3, t._4, t._5, t._6)).toSeq
      val vals = rows.filter(_._1 == k).sortBy(_._3).map(_._4)
      assert(got == ref(vals, 500000L, 3000000L), s"key $k trajectory diverged")
    }
  }

  test("planted mean shift: directional alarms on both sides of the pooled reference; reset restarts") {
    val r = new Random(5)
    // 60 points ~ U[100, 110], then 20 shifted to ~ U[160, 170]. The
    // reference moments POOL the whole series (self-trained, like the
    // driver query), so the prefix sits below the pooled mean and the
    // tail above it — CUSUM must flag BOTH regimes, each on the
    // correct side. (A quiet-prefix expectation belongs to the
    // held-out-reference deployment, not this pooled variant.)
    val vals = Seq.fill(60)(100.0 + math.rint(r.nextDouble() * 100) / 10.0) ++
      Seq.fill(20)(160.0 + math.rint(r.nextDouble() * 100) / 10.0)
    val rows = vals.zipWithIndex.map { case (v, i) => (1L, ts(i), i.toLong, v) }
    val out = Cusum.monitor(rows.toDF("user_id", "ts", "event_id", "value"),
        "user_id", Seq("ts", "event_id"), "value", 500000L, 3000000L)
      .collect().sortBy(_.getLong(2))
    val alarms = out.zipWithIndex.filter(_._1.getBoolean(6))
    assert(alarms.nonEmpty, "shift never detected")
    // every prefix alarm is a LOW-side crossing, every tail alarm HIGH-side
    alarms.foreach { case (row, i) =>
      if (i < 60) assert(row.getLong(5) >= 3000000L, s"prefix alarm at $i not low-side")
      else assert(row.getLong(4) >= 3000000L, s"tail alarm at $i not high-side")
    }
    assert(alarms.exists(_._2 >= 60), "the shifted tail itself never alarmed")
    // Page restart: the row after the first alarm starts from zeroed stats
    val after = alarms.head._2 + 1
    if (after < out.length) {
      val z = out(after).getLong(3)
      assert(out(after).getLong(4) == math.max(0L, z - 500000L))
      assert(out(after).getLong(5) == math.max(0L, -z - 500000L))
    }
  }

  test("fully stationary series: quiet at 5-sigma (h=3 has ARL0 ~ 117 and WILL alarm)") {
    // CUSUM false-alarm rate is a tuning, not a bug: with k=0.5σ the
    // in-control average run length is ~117 at h=3σ but ~930 at h=5σ
    // (Page/Siegmund) — so the no-false-alarm assertion belongs at 5σ.
    val r = new Random(11)
    val vals = Seq.fill(120)(100.0 + math.rint(r.nextDouble() * 100) / 10.0)
    val rows = vals.zipWithIndex.map { case (v, i) => (1L, ts(i), i.toLong, v) }
    val out = Cusum.monitor(rows.toDF("user_id", "ts", "event_id", "value"),
      "user_id", Seq("ts", "event_id"), "value", 500000L, 5000000L)
    assert(out.filter("alarm").count() == 0,
      "false alarm on a stationary uniform series even at 5 sigma")
  }

  test("partition invariance: pre-shuffled input yields the identical trajectory") {
    val r = new Random(9)
    val rows = for (k <- 0 until 4; i <- 0 until 50)
      yield (k.toLong, ts(i), (k * 100 + i).toLong,
        math.rint(r.nextDouble() * 5000) / 10.0 + 5.0)
    val df = rows.toDF("user_id", "ts", "event_id", "value")
    val a = Cusum.monitor(df, "user_id", Seq("ts", "event_id"), "value",
      500000L, 3000000L).collect().map(_.toSeq).toSet
    val b = Cusum.monitor(df.repartition(11).sortWithinPartitions("value"),
      "user_id", Seq("ts", "event_id"), "value",
      500000L, 3000000L).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("constant and singleton series are dropped (undefined standardization)") {
    val rows = Seq(
      (1L, ts(0), 0L, 7.0), (1L, ts(1), 1L, 7.0), (1L, ts(2), 2L, 7.0),
      (2L, ts(0), 3L, 5.0))
    val out = Cusum.monitor(rows.toDF("user_id", "ts", "event_id", "value"),
      "user_id", Seq("ts", "event_id"), "value", 500000L, 3000000L)
    assert(out.count() == 0)
  }
}
