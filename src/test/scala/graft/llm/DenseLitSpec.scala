package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DenseLitSpec extends SparkSpec {

  test("DenseLit literals are element-wise identical to typedlit, 1-based element_at, not-null typed") {
    val longs = Array.tabulate(1000)(i => (i * 37L) % 101L - 50L)
    val bools = Array.tabulate(1000)(i => i % 3 == 0)
    val idx = spark.range(1, 1001).select(col("id").cast("int").as("i"))
    val got = idx.select(
      element_at(DenseLit.longs(longs), col("i")).as("l"),
      element_at(DenseLit.booleans(bools), col("i")).as("b"),
      element_at(typedlit(longs.toIndexedSeq), col("i")).as("lRef"),
      element_at(typedlit(bools.toIndexedSeq), col("i")).as("bRef"))
    assert(got.filter(col("l") =!= col("lRef") || col("b") =!= col("bRef"))
      .count() === 0L)
    // schema: element not-null (the unsafe region has no null bitmap entries)
    val sch = idx.select(DenseLit.longs(longs).as("a")).schema.head.dataType
    assert(sch === org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false))
    // the whole point: ONE Literal node, codegen-compatible plan (the
    // "*(n)" prefix is WholeStageCodegen in the compact plan string)
    val plan = idx.select(element_at(DenseLit.longs(longs), col("i")))
      .queryExecution.executedPlan.toString()
    assert(plan.contains("*(1)"), s"must stay codegen'd:\n$plan")
  }
}
