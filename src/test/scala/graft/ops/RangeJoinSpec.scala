package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class RangeJoinSpec extends SparkSpec {

  test("bucketized range join equals the brute-force theta join exactly") {
    val ev = Tables.events(spark, sf("sf0.001")).select("event_id", "ts")
    val tol = 30000000L
    val bucketed = RangeJoin.selfPairs(ev, "event_id", "ts", tol)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val base = ev.select(col("event_id"), unix_micros(col("ts")).as("t"))
    val brute = base.as("a").crossJoin(base.as("b"))
      .filter(col("a.event_id") < col("b.event_id") &&
        abs(col("b.t") - col("a.t")) <= tol)
      .select(col("a.event_id"), col("b.event_id"), (col("b.t") - col("a.t")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(bucketed === brute)
    assert(bucketed.nonEmpty)
  }

  test("boundary pairs exactly at the tolerance are kept once, beyond dropped") {
    import spark.implicits._
    val tol = 1000L
    val df = Seq(
      (1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(0, 0))),
      (2L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(0, 1000000))),  // +1000 us = exactly tol from 1
      (3L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(0, 1900000)))   // +900 us from 2, +1900 from 1
    ).toDF("event_id", "ts")
    val out = RangeJoin.selfPairs(df, "event_id", "ts", tol)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(out === Seq((1L, 2L), (2L, 3L)))
  }
}
