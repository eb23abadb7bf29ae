package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class AsOfJoinSpec extends SparkSpec {

  private def fixtures = {
    val ev = Tables.events(spark, sf())
    val left = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val right = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("value").as("click_value"))
    (left, right)
  }

  test("joined: latest right row within lookback, nulls outside") {
    val (left, right) = fixtures
    val out = AsOfJoin.joined(left, right, "user_id", "ts", "click_ts",
      expr("INTERVAL 3 DAYS"), Seq("user_id", "event_id"))
    assert(out.count() === left.count()) // left-outer: row count preserved
    // every matched click is <= ts and within lookback
    val bad = out.filter(col("click_ts").isNotNull &&
      (col("click_ts") > col("ts") || col("click_ts") < col("ts") - expr("INTERVAL 3 DAYS")))
    assert(bad.count() === 0)
    assert(out.filter(col("click_ts").isNull).count() > 0) // null path exercised
  }

  test("unioned matches joined exactly") {
    val (left, right) = fixtures
    val a = AsOfJoin.joined(left, right, "user_id", "ts", "click_ts",
      expr("INTERVAL 3 DAYS"), Seq("user_id", "event_id"))
      .orderBy("user_id", "event_id")
      .select("user_id", "ts", "event_id", "click_ts", "click_value")
    val b = AsOfJoin.unioned(left, right, "user_id", "ts", "click_ts",
      expr("INTERVAL 3 DAYS"))
      .orderBy("user_id", "event_id")
      .select("user_id", "ts", "event_id", "click_ts", "click_value")
    assert(a.collect().toSeq === b.collect().toSeq)
  }

  test("directional: forward/nearest known answers") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq((1L, t("2024-01-01 12:00:00"), 100L))
      .toDF("k", "ts", "lid")
    val right = Seq(
      (1L, t("2024-01-01 11:59:00"), "before_1m"),
      (1L, t("2024-01-01 12:03:00"), "after_3m"),
      (1L, t("2024-01-01 12:10:00"), "after_10m")
    ).toDF("k", "rts", "tag")
    def run(dir: String) = AsOfJoin.directional(left, right, "k", "ts", "rts",
      expr("INTERVAL 5 MINUTES"), Seq("k", "lid"), dir)
      .select("tag").head().getString(0)
    assert(run("backward") === "before_1m") // only one at/before t
    assert(run("forward") === "after_3m")   // earliest at/after t within 5m
    assert(run("nearest") === "before_1m")  // 1m beats 3m

    // equidistant tie -> earlier right row
    val tie = Seq(
      (1L, t("2024-01-01 11:58:00"), "before_2m"),
      (1L, t("2024-01-01 12:02:00"), "after_2m")
    ).toDF("k", "rts", "tag")
    val near = AsOfJoin.directional(left, tie, "k", "ts", "rts",
      expr("INTERVAL 5 MINUTES"), Seq("k", "lid"), "nearest")
      .select("tag").head().getString(0)
    assert(near === "before_2m")

    // out-of-tolerance on the forward side -> null match
    val far = AsOfJoin.directional(left, right.filter(col("tag") === "after_10m"),
      "k", "ts", "rts", expr("INTERVAL 5 MINUTES"), Seq("k", "lid"), "forward")
    assert(far.filter(col("tag").isNull).count() === 1)
  }
}
