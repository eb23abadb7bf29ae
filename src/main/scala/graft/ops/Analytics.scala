package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-analytics operators a production pipeline runs next to the
  * market queries: ordered funnels, cohort retention, and fixed-width
  * histograms. (The reference has no product-analytics stage —
  * `spark_src/` is purely market-data — these extend the engine's
  * OLAP surface the same way the curation ops extend its
  * training-data surface.)
  *
  * Scale notes (100 TB): every aggregation here is keyed by the
  * entity id (user) or a bounded bucket, so partial (map-side)
  * aggregation bounds shuffle volume by |users| / |buckets|, not by
  * event count. The per-stage funnel joins are between *per-user
  * aggregates* — co-partitioned on the same key, so AQE plans them
  * without extra exchanges; the histogram's bounds row is a 1-row
  * broadcast (never a driver collect).
  */
object Analytics {

  /** Ordered funnel: for each user, the earliest time of stage i
    * strictly AFTER their earliest qualifying time of stage i-1
    * (classic sequential-conversion semantics — a click before the
    * signup does not count). Output: one row per user who completed
    * stage 0, with `t0..t{n-1}` stage timestamps (null = never
    * reached) and `stage_reached` = number of completed stages.
    *
    * Shape: one filtered groupBy per stage (partial-agg bounded by
    * |users|), then left joins between the per-user aggregates — all
    * keyed on `userCol`, so the shuffles re-use one partitioning.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    var out = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t0"))
    stages.zipWithIndex.tail.foreach { case (stage, i) =>
      val next = events.filter(col(typeCol) === stage)
        .join(out.select(col(userCol), col(s"t${i - 1}")), Seq(userCol))
        .filter(col(tsCol) > col(s"t${i - 1}"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"t$i"))
      out = out.join(next, Seq(userCol), "left")
    }
    out.withColumn("stage_reached",
      stages.indices.map(i => when(col(s"t$i").isNotNull, 1).otherwise(0))
        .reduce(_ + _))
  }

  /** Cohort retention: users grouped by first-activity date, counted
    * on each later activity day as an offset from their cohort day.
    * Output: (cohort_day, day_offset, users) for offsets in
    * [0, maxOffsetDays].
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      maxOffsetDays: Int): DataFrame = {
    val firstSeen = events.groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("cohort_day"))
    val activeDays = events
      .select(col(userCol), to_date(col(tsCol)).as("day")).distinct()
    activeDays.join(firstSeen, Seq(userCol))
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")))
      .filter(col("day_offset") <= maxOffsetDays)
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct(col(userCol)).as("users"))
  }

  /** Fixed-count equal-width histogram: two passes — a 1-row global
    * (min, max) aggregate broadcast into a bucketing projection, then
    * a bucket-keyed count/sum. Bucket index arithmetic is plain IEEE
    * double math (identical in any engine); the top edge value lands
    * in the last bucket via `least`. Sum is DECIMAL-exact.
    */
  def histogram(df: DataFrame, valueCol: String, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val bounds = df.agg(min(col(valueCol)).as("__lo"), max(col(valueCol)).as("__hi"))
    val width = (col("__hi") - col("__lo")) / buckets
    df.select(col(valueCol)).join(broadcast(bounds))
      .withColumn("bucket",
        least(floor((col(valueCol) - col("__lo")) / width), lit(buckets - 1))
          .cast("int"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n"),
        sum(col(valueCol).cast(DecimalType(20, 4))).cast("double").as("sum_value"),
        min(col(valueCol)).as("min_value"),
        max(col(valueCol)).as("max_value"))
  }
}
