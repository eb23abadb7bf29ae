package graft.llm

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class GopherRulesSpec extends SparkSpec {

  test("hand-computed verdicts per rule on crafted documents") {
    import spark.implicits._
    val good = (("the quick brown fox jumps over all of the lazy dogs " +
      "and that very happy pack would have run with them for hours ") * 3).trim
    val short_ = "the of and that have with be to"        // < 50 words
    val symbols = Seq.fill(60)("###").mkString(" ")       // symbol ratio 1.0
    val numeric = (1 to 60).map(_.toString).mkString(" ") // alpha frac 0
    val noStops = Seq.fill(60)("word").mkString(" ")      // 0 stop hits
    val df = Seq((1L, good), (2L, short_), (3L, symbols), (4L, numeric),
      (5L, noStops)).toDF("doc_id", "text")
    val out = GopherRules(df, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

    assert(out(1L).getAs[Int]("passes") === 1)
    val g = out(1L)
    assert(g.getAs[Long]("n_words") === 69) // 23 words x 3 repeats
    assert(g.getAs[Long]("stop_hits") >= 2)

    assert(out(2L).getAs[Int]("r_word_count") === 0)
    assert(out(2L).getAs[Int]("r_stopwords") === 1)
    assert(out(2L).getAs[Int]("passes") === 0)

    assert(out(3L).getAs[Int]("r_symbol_ratio") === 0)
    assert(out(3L).getAs[Double]("symbol_ratio") === 1.0)
    // '###' contains no [a-z]
    assert(out(3L).getAs[Int]("r_alpha_frac") === 0)

    assert(out(4L).getAs[Int]("r_alpha_frac") === 0)
    assert(out(4L).getAs[Double]("alpha_frac") === 0.0)
    assert(out(4L).getAs[Int]("r_symbol_ratio") === 1)

    assert(out(5L).getAs[Int]("r_stopwords") === 0)
    assert(out(5L).getAs[Long]("stop_hits") === 0L)
    assert(out(5L).getAs[Int]("r_word_count") === 1)
    assert(out(5L).getAs[Double]("mean_word_len") === 4.0)
  }

  test("word-count rule splits the synthetic corpus; stopword >=2 rule never fires") {
    val out = GopherRules(Tables.documents(spark, sf()), "doc_id", "text")
    val n = out.count()
    val wc = out.filter(col("r_word_count") === 1).count()
    assert(wc > 0 && wc < n, s"word-count rule should split: $wc/$n")
    // the tech vocabulary carries at most ONE of Gopher's stopwords per
    // doc: single hits are common, the >=2 rule fails uniformly
    assert(out.filter(col("stop_hits") > 0).count() > 0)
    assert(out.filter(col("r_stopwords") === 1).count() === 0)
    // ratios are exact: mean word length consistent with its inputs
    val row = out.orderBy("doc_id").limit(1).collect()(0)
    assert(row.getAs[Double]("mean_word_len") > 0)
  }
}
