package graft.queries

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{SparkSpec, Tables}

/** `observe()` — pipeline instrumentation computed DURING the query's
  * own pass (a CollectMetrics node over the flowing rows): row counts
  * and exact decimal sums with zero extra scans. The operational
  * surface a production pipeline uses for data-quality gates
  * (ingested-row counts, null rates, value totals) without paying a
  * second aggregation job.
  */
class ObserveSpec extends SparkSpec {

  test("observed metrics equal direct aggregates, computed in the same pass") {
    val li = Tables.lineitem(spark, sf("sf0.001"))
    val obs = Observation("ingest_gate")
    val instrumented = li.observe(obs,
      count(lit(1)).as("rows_seen"),
      sum(col("l_quantity").cast(DecimalType(20, 4))).cast("double").as("qty_total"),
      count(when(col("l_shipdate").isNull, 1)).as("null_shipdates"))
    // downstream work proceeds normally; metrics ride along
    val kept = instrumented.filter(col("l_quantity") > 25).count()
    val m = obs.get
    val expectRows = li.count()
    val expectQty = li.agg(sum(col("l_quantity").cast(DecimalType(20, 4)))
      .cast("double")).head().getDouble(0)
    assert(m("rows_seen") === expectRows) // observes PRE-filter flow
    assert(m("qty_total") === expectQty)
    assert(m("null_shipdates") === 0L)
    assert(kept > 0 && kept < expectRows)
  }

  test("observation placed after a filter sees only surviving rows") {
    val li = Tables.lineitem(spark, sf("sf0.001"))
    val obs = Observation("post_filter")
    val filtered = li.filter(col("l_quantity") > 25)
      .observe(obs, count(lit(1)).as("rows_seen"))
    val n = filtered.count()
    assert(obs.get("rows_seen") === n)
  }
}
