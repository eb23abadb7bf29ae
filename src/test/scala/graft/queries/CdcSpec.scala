package graft.queries

import graft.SparkSpec

class CdcSpec extends SparkSpec {

  test("cdc_apply: tombstoned keys vanish, revived keys return") {
    import org.apache.spark.sql.functions._
    val out = Registry.byName("cdc_apply").fn(spark, sf("sf0.01"))
      .collect().map(_.getLong(0)).toSet
    // independent reference from the raw table: last op per user
    val ref = graft.Tables.events(spark, sf("sf0.01"))
      .selectExpr("user_id", "ts", "event_id",
        "CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))
      .groupBy(_._1)
      .map { case (u, rows) => u -> rows.maxBy(r => (r._2, r._3))._4 }
    val want = ref.filter(_._2 == "U").keySet
    assert(out === want)
    val deleted = ref.filter(_._2 == "D").keySet
    assert(deleted.nonEmpty, "the corpus should contain live tombstones")
    assert(out.intersect(deleted).isEmpty)
    // the revive edge: at least one user has an error event somewhere
    // in history but a later upsert — and survives
    val hist = graft.Tables.events(spark, sf("sf0.01"))
      .filter(col("event_type") === "error")
      .select("user_id").collect().map(_.getLong(0)).toSet
    assert(out.intersect(hist).nonEmpty,
      "expected at least one revived (deleted-then-upserted) user")
  }
}
