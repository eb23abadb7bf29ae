package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TfIdfSpec extends SparkSpec {

  test("known answer: rare term outranks common term") {
    import spark.implicits._
    val df = Seq(
      (1L, "apple apple banana common common"),
      (2L, "banana cherry common"),
      (3L, "common filler filler")
    ).toDF("doc_id", "text")
    val out = TextStats.tfidfTopTerms(df, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(5)) -> r).toMap
    // doc 1: apple tf=2 df=1 -> score 2*3/1=6; common tf=2 df=3 -> 2;
    //        banana tf=1 df=2 -> 1.5
    val d1 = out((1L, 1))
    assert(d1.getAs[String]("token") === "apple")
    assert(d1.getAs[Long]("tf") === 2L && d1.getAs[Long]("df") === 1L)
    assert(d1.getAs[Double]("score") === 6.0)
    assert(out((1L, 2)).getAs[String]("token") === "common")
    // doc 2: cherry (1*3/1=3) beats banana (1*3/2=1.5) beats common (1)
    assert(out((2L, 1)).getAs[String]("token") === "cherry")
    assert(out((2L, 2)).getAs[String]("token") === "banana")
    // doc 3: filler tf=2 df=1 -> 6 tops
    assert(out((3L, 1)).getAs[String]("token") === "filler")
  }

  test("score ties break lexicographically by token") {
    import spark.implicits._
    val df = Seq((1L, "zeta alpha"), (2L, "unrelated words")).toDF("doc_id", "text")
    val out = TextStats.tfidfTopTerms(df, "doc_id", "text", k = 2)
      .filter(col("doc_id") === 1L).orderBy("rank").collect()
    // both tokens tf=1 df=1 -> equal score; alpha must rank first
    assert(out.map(_.getAs[String]("token")).toSeq === Seq("alpha", "zeta"))
  }

  test("per-doc top-k plans as WindowGroupLimit (pre-shuffle prune)") {
    import spark.implicits._
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    val q = TextStats.tfidfTopTerms(df, "doc_id", "text", k = 3)
    q.collect()
    assert(q.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }
}
