package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{SparkSpec, Tables}

class SaltingSpec extends SparkSpec {

  private def ev = Tables.events(spark, sf("sf0.001"))
    .withColumn("dec_value", col("value").cast(DecimalType(20, 4)))

  test("salted two-phase stats are bit-identical to the direct groupBy") {
    val salted = Salting.saltedStats(ev, Seq("event_type"), col("event_id"),
        "dec_value", "value", salts = 16)
      .collect().map(_.toSeq).toSet
    val direct = ev.groupBy("event_type").agg(
        sum(col("dec_value")).cast("double").as("sum_value"),
        count(lit(1)).as("n_events"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .collect().map(_.toSeq).toSet
    assert(salted === direct)
    assert(salted.nonEmpty)
  }

  test("result is independent of the salt expression and fan-out") {
    val a = Salting.saltedStats(ev, Seq("event_type"), col("event_id"),
      "dec_value", "value", salts = 2).collect().map(_.toSeq).toSet
    val b = Salting.saltedStats(ev, Seq("event_type"), col("user_id") * 7,
      "dec_value", "value", salts = 64).collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("plan shows the two-phase shape: exchange on (key, salt) then on key") {
    val plan = Salting.saltedStats(ev, Seq("event_type"), col("event_id"),
      "dec_value", "value", salts = 16).queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges >= 2, s"expected 2 exchanges, got $exchanges:\n$plan")
  }
}
