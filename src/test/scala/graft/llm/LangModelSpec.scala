package graft.llm

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class LangModelSpec extends SparkSpec {

  private def micro(p: Double): Long = math.floor(math.log(p) * 1e6 + 0.5).toLong

  test("bigram score matches hand-computed add-one-smoothed counts") {
    import spark.implicits._
    // corpus: doc1 = "a b a b", doc2 = "a b c"
    //   bigram counts c2: (a,b)=3 (b,a)=1 (b,c)=1; left counts c1: a=3 b=2; V=3
    val df = Seq(("1", "a b a b"), ("2", "a b c")).toDF("doc_id", "text")
    val out = LangModel.bigramScore(df, "doc_id", "text")
      .collect().map(r => r.getAs[String]("doc_id") -> r).toMap

    val llAB = micro(4.0 / 6.0) // (c2+1)/(c1+V) = (3+1)/(3+3)
    val llBA = micro(2.0 / 5.0) // (1+1)/(2+3)
    val llBC = micro(2.0 / 5.0)

    val d1 = out("1")
    assert(d1.getAs[Long]("n_bigrams") === 3L)
    assert(d1.getAs[Long]("distinct_bigrams") === 2L)
    assert(d1.getAs[Long]("sum_ll_micro") === 2 * llAB + llBA)
    assert(d1.getAs[Double]("avg_ll") === (2 * llAB + llBA).toDouble / 3e6)

    val d2 = out("2")
    assert(d2.getAs[Long]("n_bigrams") === 2L)
    assert(d2.getAs[Long]("sum_ll_micro") === llAB + llBC)
  }

  test("single-word and empty-bigram docs emit nothing; scores are negative") {
    import spark.implicits._
    val df = Seq(("1", "solo"), ("2", "x y x")).toDF("doc_id", "text")
    val out = LangModel.bigramScore(df, "doc_id", "text")
    assert(out.where(col("doc_id") === "1").count() === 0)
    assert(out.where(col("avg_ll") >= 0).count() === 0) // smoothed p < 1 always
  }

  test("corpus run: every doc with >=2 words scores, n_bigrams = words - 1") {
    val docs = Tables.documents(spark, sf())
    val out = LangModel.bigramScore(docs, "doc_id", "text")
    val expected = docs
      .select(col("doc_id"), (size(split(trim(lower(col("text"))), "\\s+")) - 1).as("nb"))
      .where(col("nb") >= 1)
    val joined = out.join(expected, "doc_id")
    assert(joined.count() === expected.count())
    assert(joined.where(col("n_bigrams") =!= col("nb")).count() === 0)
  }
}
