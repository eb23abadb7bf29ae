package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Runtime bloom-filter join pruning (Catalyst `InjectRuntimeFilter`):
  * a selective filter on the build side gets turned into a
  * `might_contain(bloom_filter_agg(...))` predicate on the probe side,
  * so probe rows that cannot join are dropped AT THE SCAN, before the
  * shuffle. At 100 TB this is the difference between shuffling the
  * whole fact table and shuffling the ~matching slice.
  */
class RuntimeFilterSpec extends SparkSpec {

  private def withConfs[A](confs: Map[String, String])(f: => A): A = {
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      f
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("selective dim filter injects a bloom might_contain on the fact scan") {
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force shuffle join
    withConfs(confs) {
      val orders = Tables.orders(spark, sf("sf0.01"))
      val customer = Tables.customer(spark, sf("sf0.01"))
        .filter(col("c_mktsegment") === "BUILDING")
      val j = orders.join(customer,
        orders("o_custkey") === customer("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      val rows = j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"), plan.take(4000))
      // correctness unchanged vs the same join without runtime filters
      val plainRows = withConfs(Map(
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false")) {
        orders.join(customer, orders("o_custkey") === customer("c_custkey"))
          .groupBy("c_mktsegment").agg(count(lit(1)).as("n")).collect()
      }
      assert(rows.map(_.toSeq).toSet === plainRows.map(_.toSeq).toSet)
      assert(rows.nonEmpty)
    }
  }
}
