package graft.queries

import graft.SparkSpec

/** Physical-plan contracts for the headline queries — the shapes the
  * 100 TB design story depends on (EXPLAIN.md).
  */
class PlanSpec extends SparkSpec {

  test("q3_orders: AQE broadcasts the dim sides with no orders-side hint") {
    val df = Registry.byName("q3_orders").fn(spark, sf("sf0.01"))
    df.collect() // run so AQE finalizes the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast joins in:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "orders/lineitem join regressed to a shuffle join at bench scale")
  }

  test("q1_pricing: filter is pushed to the parquet scan") {
    val df = Registry.byName("q1_pricing").fn(spark, sf("sf0.01"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"missing scan-level pushdown in:\n$plan")
  }

  test("token_topk: scan reads ONLY the two needed columns of documents") {
    val df = Registry.byName("token_topk").fn(spark, sf("sf0.01"))
    val scan = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(scan.contains("lang") && scan.contains("text"), scan)
    assert(!scan.contains("n_chars") && !scan.contains("source") && !scan.contains("doc_id"),
      s"column pruning regressed — scan reads more than (lang, text): $scan")
  }

  test("stratified_sample: hash-threshold filter keeps the scan as the only plan node group") {
    val df = Registry.byName("stratified_sample").fn(spark, sf("sf0.01"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }

  test("doc_chunks and repetition_stats are shuffle-free map work") {
    Seq("doc_chunks", "repetition_stats").foreach { name =>
      val df = Registry.byName(name).fn(spark, sf("sf0.01"))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"$name must not shuffle:\n$plan")
    }
  }

  test("decontam_overlap: held-out gram set joins as broadcast, not shuffle") {
    val df = Registry.byName("decontam_overlap").fn(spark, sf("sf0.01"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"banned-gram join must broadcast:\n$plan")
  }
}
