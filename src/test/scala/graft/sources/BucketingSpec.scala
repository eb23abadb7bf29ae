package graft.sources

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Bucketed tables: the join of two tables bucketed by the join key
  * with equal bucket counts plans WITHOUT any Exchange — the
  * co-located-join contract at 100 TB.
  */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans with no shuffle exchange") {
    val ev = Tables.events(spark, sf("sf0.001"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "value")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("value").as("click_value"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-join path so the bucketed-scan co-location
      // (not a broadcast) is what eliminates the exchanges
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Bucketing.writeBucketed(purchases, "bspec_purchases", 8,
        Seq("user_id"), Seq("user_id"))
      Bucketing.writeBucketed(clicks, "bspec_clicks", 8,
        Seq("user_id"), Seq("user_id"))
      val j = spark.table("bspec_purchases")
        .join(spark.table("bspec_clicks"), "user_id")
        .groupBy("user_id").agg(count(lit(1)).as("n"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      // no shuffle at the join NOR at the groupBy (it groups on the
      // bucket key, whose distribution the scan already satisfies)
      assert(!plan.contains("Exchange hashpartitioning") && !plan.contains("ShuffleQueryStage"),
        s"unexpected shuffle in:\n$plan")
      assert(plan.contains("Bucketed: true"))
      assert(j.count() > 0)

      // sanity: same join on the raw (un-bucketed) frames DOES shuffle
      val raw = purchases.join(clicks, "user_id")
        .groupBy("user_id").agg(count(lit(1)).as("n"))
      raw.collect()
      assert(raw.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      Bucketing.drop(spark, "bspec_purchases")
      Bucketing.drop(spark, "bspec_clicks")
    }
  }
}
