package graft.llm

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class CountMinSpec extends SparkSpec {

  test("exact counts survive; below-threshold tokens are filtered") {
    import spark.implicits._
    // "hot" ×5, "warm" ×3, "cold" ×1
    val df = Seq("hot hot hot warm", "hot warm cold", "hot warm")
      .toDF("text")
    val out = CountMin.heavyHitters(df, "text", depth = 4, width = 1024,
      minCount = 3L).collect().map(r => r.getAs[String]("token") ->
      (r.getAs[Long]("est"), r.getAs[Long]("cnt"))).toMap
    assert(out.keySet === Set("hot", "warm"))
    assert(out("hot")._2 === 5L && out("warm")._2 === 3L)
    // wide sketch, 3 tokens: no collisions, est == exact
    assert(out("hot")._1 === 5L && out("warm")._1 === 3L)
  }

  test("adversarial width=1: everything collides, yet exact verify stays sound") {
    import spark.implicits._
    val df = Seq("a a a b c d e f g h").toDF("text")
    val out = CountMin.heavyHitters(df, "text", depth = 2, width = 1,
      minCount = 3L).collect()
    // every cell holds the global count (10) so ALL tokens are
    // candidates — but only 'a' (cnt=3) passes the exact filter
    assert(out.map(_.getAs[String]("token")).toSeq === Seq("a"))
    assert(out.head.getAs[Long]("cnt") === 3L)
    assert(out.head.getAs[Long]("est") === 10L) // the collision overestimate
  }

  test("corpus invariants: est is an upper bound, threshold is exact") {
    val docs = Tables.documents(spark, sf())
    val out = CountMin.heavyHitters(docs, "text", minCount = 50L).cache()
    try {
      assert(out.count() > 0)
      assert(out.where(col("est") < col("cnt")).count() === 0) // CMS never underestimates
      assert(out.where(col("cnt") < 50).count() === 0)
      // cross-check against a plain exact count
      val exact = docs.select(explode(split(trim(lower(col("text"))), "\\s+")).as("t"))
        .groupBy("t").count().where(col("count") >= 50)
      assert(out.count() === exact.count())
    } finally out.unpersist()
  }
}
