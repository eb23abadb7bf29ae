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

  test("DenseLit.doubles: bit-identical to typedlit, row-major slice matches the nested boxed lookup") {
    val dim = 16
    val k = 64
    val table = Seq.tabulate(k)(i =>
      Seq.tabulate(dim)(j => ((i * 31 + j * 7) % 97) / 97.0 - 0.5))
    val flat = table.flatten.toArray
    val idx = spark.range(0, (k * dim).toLong)
      .select(col("id").cast("int").as("e"))
    // element-wise equality against typedlit over the same flat values
    val got = idx.select(
      element_at(DenseLit.doubles(flat), col("e") + 1).as("d"),
      element_at(typedlit(flat.toIndexedSeq), col("e") + 1).as("dRef"))
    assert(got.filter(col("d") =!= col("dRef")).count() === 0L)
    // row-major O(1) arithmetic reproduces the nested boxed lookup:
    // (i, j) -> i*dim + j (the argminCell / Pq.dtColumn access pattern)
    val ij = spark.range(0, (k * dim).toLong).select(
      (col("id") / dim).cast("int").as("i"), (col("id") % dim).cast("int").as("j"))
    val both = ij.select(
      element_at(DenseLit.doubles(flat), col("i") * dim + col("j") + 1).as("f"),
      element_at(element_at(typedlit(table), col("i") + 1), col("j") + 1).as("n"))
    assert(both.filter(col("f") =!= col("n")).count() === 0L)
    // slice of the flat literal hands back exactly row i (the per-cell
    // vector argminCell feeds the dot kernel)
    val sl = ij.filter(col("j") === 0).select(col("i"),
      slice(DenseLit.doubles(flat), col("i") * dim + 1, lit(dim)).as("row"),
      element_at(typedlit(table), col("i") + 1).as("rowRef"))
    assert(sl.filter(col("row") =!= col("rowRef")).count() === 0L)
    // not-null element type, same as the other primitives
    val sch = idx.select(DenseLit.doubles(flat).as("a")).schema.head.dataType
    assert(sch === org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType, containsNull = false))
  }
}
