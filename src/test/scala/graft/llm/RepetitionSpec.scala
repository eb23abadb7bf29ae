package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RepetitionSpec extends SparkSpec {

  test("known answer: repeated bigram dominates") {
    import spark.implicits._
    // "spam ham" appears 3x (positions 1,3,5 of the bigram list)
    val df = Seq((1L, "spam ham spam ham spam ham extra words")).toDF("doc_id", "text")
    val r = TextStats.withRepetition(df, "text").head()
    assert(r.getAs[Int]("n_words") === 8)
    // 8 words, 4 distinct (spam, ham, extra, words) -> 0.5
    assert(r.getAs[Double]("dup_word_frac") === 0.5)
    assert(r.getAs[String]("top_bigram") === "ham spam" ||
      r.getAs[String]("top_bigram") === "spam ham")
    assert(r.getAs[Int]("top_bigram_n") === 3)
  }

  test("ties break to the lexicographically smallest bigram") {
    import spark.implicits._
    // bigrams: "b c", "c b", "b c" ... both "b c" and "c b" occur twice
    val df = Seq((1L, "b c b c b")).toDF("doc_id", "text")
    val r = TextStats.withRepetition(df, "text").head()
    assert(r.getAs[String]("top_bigram") === "b c")
    assert(r.getAs[Int]("top_bigram_n") === 2)
  }

  test("single-word and unique-word docs degrade gracefully") {
    import spark.implicits._
    val df = Seq((1L, "lonely"), (2L, "all words completely unique here"))
      .toDF("doc_id", "text")
    val out = TextStats.withRepetition(df, "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("top_bigram") === "")
    assert(out(1L).getAs[Int]("top_bigram_n") === 0)
    assert(out(1L).getAs[Double]("top_bigram_char_frac") === 0.0)
    assert(out(2L).getAs[Double]("dup_word_frac") === 0.0)
    assert(out(2L).getAs[Boolean]("pass_repetition"))
  }

  test("highly repetitive text fails the filter") {
    import spark.implicits._
    val df = Seq((1L, Seq.fill(50)("buy now").mkString(" "))).toDF("doc_id", "text")
    val r = TextStats.withRepetition(df, "text").head()
    assert(!r.getAs[Boolean]("pass_repetition"))
    assert(r.getAs[Double]("top_bigram_char_frac") > 0.2)
  }
}
