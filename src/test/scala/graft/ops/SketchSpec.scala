package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** HLL++ sketch path (approx_count_distinct) asserted against the
  * exact distinct counts that the oracled `distinct_users` query
  * verifies — the sketch itself is engine-internal state and not
  * ANSI-restatable, so this spec is its correctness bound.
  */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct lands within 5% of exact per group") {
    val ev = Tables.events(spark, sf("sf0.01"))
    val both = ev.groupBy("event_type").agg(
      countDistinct("user_id").as("exact"),
      approx_count_distinct("user_id", rsd = 0.02).as("approx"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }
}
