package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** AQE skew-join handling: a pathologically skewed join key makes one
  * shuffle partition dwarf the rest; with
  * `spark.sql.adaptive.skewJoin` AQE splits the oversized partition
  * into parallel sub-reads (the SMJ node reports `skew=true`) instead
  * of serializing the hot key through one task. This is the runtime
  * complement to the proactive `ops.Salting` pre-aggregation.
  */
class SkewJoinSpec extends SparkSpec {

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

  test("AQE splits the skewed partition of a hot-key join (skew=true)") {
    import spark.implicits._
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    withConfs(confs) {
      // 50k rows (x ~70 B pad) on ONE key + 50-key tail vs a 51-key dim
      val fact = spark.range(50000).select(lit(0L).as("k"), col("id").as("payload"),
          lpad(col("id").cast("string"), 64, "x").as("pad"))
        .unionAll(spark.range(1000).select((col("id") % 50 + 1).as("k"),
          col("id").as("payload"), lpad(col("id").cast("string"), 64, "x").as("pad")))
      val dim = spark.range(51).select(col("id").as("k"),
        concat(lit("name_"), col("id")).as("name"))
      val j = fact.join(dim, "k").select("k", "name", "pad")
      val n = j.count()
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE did not mark the skew join:\n$plan")
      // correctness: every fact row joined exactly once
      assert(n === 51000L)
      assert(j.filter(col("k") === 0).count() === 50000L)
    }
  }
}
