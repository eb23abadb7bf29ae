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

  test("distinctSketch: union of batch sketches == sketch of the union, within HLL error of exact") {
    val ev = Tables.events(spark, sf("sf0.01"))
      .select(col("event_type"), col("user_id"))
    // deterministic split into two "daily batches"
    val a = ev.filter(pmod(col("user_id"), lit(3)) === 0)
    val b = ev.filter(pmod(col("user_id"), lit(3)) =!= 0)
    val merged = Compaction.distinctFinish(Compaction.distinctMerge(
      Seq(Compaction.distinctSketch(a, Seq("event_type"), "user_id"),
        Compaction.distinctSketch(b, Seq("event_type"), "user_id")),
      Seq("event_type")))
    val whole = Compaction.distinctFinish(
      Compaction.distinctSketch(ev, Seq("event_type"), "user_id"))
    val m = merged.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val w = whole.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === w) // mergeability: batch-sketch-then-union is lossless
    val exact = ev.groupBy("event_type").agg(countDistinct("user_id").as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, x) =>
      assert(math.abs(m(k).toDouble - x) / x <= 0.05, s"$k: ${m(k)} vs $x")
    }
  }
}
