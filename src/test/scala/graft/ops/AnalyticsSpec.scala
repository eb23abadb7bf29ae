package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class AnalyticsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(minute * 60000L)

  test("funnel counts only strictly-ordered stage progressions") {
    // u1 completes all three stages in order; u2's click precedes its
    // view so it stalls at view; u3 never signs up → excluded.
    val ev = Seq(
      (1L, ts(0), "signup"), (1L, ts(1), "view"), (1L, ts(2), "click"),
      (2L, ts(0), "signup"), (2L, ts(3), "view"), (2L, ts(1), "click"),
      (3L, ts(0), "view"), (3L, ts(1), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = Analytics.funnel(ev, "user_id", "ts", "event_type",
      Seq("signup", "view", "click"))
      .select("user_id", "stage_reached").as[(Long, Int)].collect().toMap
    assert(out === Map(1L -> 3, 2L -> 2))
  }

  test("funnel stage time is the EARLIEST qualifying event, not any") {
    // Two qualifying views: the earlier one (minute 1) gates the click
    // window, so a click at minute 2 counts.
    val ev = Seq(
      (1L, ts(0), "signup"), (1L, ts(1), "view"), (1L, ts(5), "view"),
      (1L, ts(2), "click")
    ).toDF("user_id", "ts", "event_type")
    val row = Analytics.funnel(ev, "user_id", "ts", "event_type",
      Seq("signup", "view", "click")).collect().head
    assert(row.getAs[Timestamp]("t1") === ts(1))
    assert(row.getAs[Timestamp]("t2") === ts(2))
    assert(row.getAs[Int]("stage_reached") === 3)
  }

  test("cohort retention: offsets anchored to each user's first day") {
    val day = 86400000L
    val ev = Seq(
      (1L, new Timestamp(0L)), (1L, new Timestamp(2 * day)),
      (2L, new Timestamp(day)), (2L, new Timestamp(2 * day)),
      (2L, new Timestamp(2 * day + 1000L)) // same day, counted once
    ).toDF("user_id", "ts")
    val out = Analytics.cohortRetention(ev, "user_id", "ts", 14)
      .select(col("cohort_day").cast("string"), col("day_offset"), col("users"))
      .as[(String, Int, Long)].collect().toSet
    assert(out === Set(
      ("1970-01-01", 0, 1L), ("1970-01-01", 2, 1L),
      ("1970-01-02", 0, 1L), ("1970-01-02", 1, 1L)))
  }

  test("histogram: exact bucket totals, max value lands in last bucket") {
    val df = (0 until 64).map(i => i.toDouble).toDF("v")
    val out = Analytics.histogram(df, "v", 4)
      .orderBy("bucket")
      .select("bucket", "n", "sum_value", "min_value", "max_value")
      .as[(Int, Long, Double, Double, Double)].collect()
    // width = 63/4 = 15.75: buckets [0,15.75) [15.75,31.5) [31.5,47.25) [47.25,63]
    assert(out.map(_._1).toSeq === Seq(0, 1, 2, 3))
    assert(out.map(_._2).sum === 64L)
    assert(out.last._5 === 63.0) // max value included, not dropped
    assert(out.map(_._3).sum === (0 until 64).sum.toDouble)
  }

  test("histogram bucket count parameter is respected on real data") {
    val ev = Tables.events(spark, sf())
    val out = Analytics.histogram(ev, "value", 16).collect()
    assert(out.length <= 16)
    assert(out.map(_.getAs[Long]("n")).sum === ev.count())
  }

  test("pareto_front flags exactly the brute-force non-dominated set") {
    val out = graft.queries.Registry.byName("pareto_front")
      .fn(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getBoolean(3)))
    assert(out.nonEmpty)
    val pts = out.map { case (_, x, y, _) => (x, y) }
    def dominated(p: (Double, Long)) = pts.exists { q =>
      q._1 >= p._1 && q._2 >= p._2 && (q._1 > p._1 || q._2 > p._2)
    }
    out.foreach { case (id, x, y, flag) =>
      assert(flag === !dominated((x, y)), s"instrument $id")
    }
    val front = out.filter(_._4)
    assert(front.nonEmpty && front.length < out.length)
  }
}
