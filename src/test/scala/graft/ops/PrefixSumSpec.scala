package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{SparkSpec, Tables}

class PrefixSumSpec extends SparkSpec {

  private def ev = Tables.events(spark, sf())
    .select(col("event_id"), col("user_id"), col("ts"),
      col("value").cast(DecimalType(20, 4)).as("notional"))

  test("two-phase prefix sum equals single-task window cumsum bit-for-bit") {
    val w = Window.partitionBy("user_id").orderBy("ts")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val windowed = ev
      .withColumn("cumsum", sum(col("notional")).over(w).cast("double"))
      .select("event_id", "cumsum")
    val twoPhase = PrefixSum
      .withRunningSum(ev, "user_id", Seq("ts"), "notional", "cumsum")
      .select("event_id", "cumsum")
    val diff = windowed.as("a").join(twoPhase.as("b"), "event_id")
      .filter(col("a.cumsum") =!= col("b.cumsum"))
    assert(diff.count() === 0)
    assert(twoPhase.count() === ev.count())
  }

  test("result is invariant to input partitioning") {
    val a = PrefixSum.withRunningSum(ev.repartition(1), "user_id", Seq("ts"), "notional", "c")
      .select("event_id", "c").orderBy("event_id").collect().toSeq
    val b = PrefixSum.withRunningSum(ev.repartition(17), "user_id", Seq("ts"), "notional", "c")
      .select("event_id", "c").orderBy("event_id").collect().toSeq
    assert(a === b)
  }
}
