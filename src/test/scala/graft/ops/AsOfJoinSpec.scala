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
}
