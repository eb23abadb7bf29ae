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

  /** Reference KN probability with the engine's exact association. */
  private def knMicro(c2: Long, c1: Long, n1p: Long, nctx: Long,
                      nbig: Long): Long = {
    val p = math.max(c2.toDouble - 0.75, 0.0) / c1.toDouble +
      0.75 * n1p.toDouble / c1.toDouble * (nctx.toDouble / nbig.toDouble)
    math.floor(math.log(p) * 1e6 + 0.5).toLong
  }

  test("Kneser-Ney matches hand counts on a tiny corpus") {
    import spark.implicits._
    // corpus: "a b a b" + "a b c"
    // c2: (a,b)=3 (b,a)=1 (b,c)=1; c1: a=3 b=2
    // N1+(a,.)=1, N1+(b,.)=2; N1+(.,b)=1, N1+(.,a)=1, N1+(.,c)=1; nbig=3
    val df = Seq(("1", "a b a b"), ("2", "a b c")).toDF("doc_id", "text")
    val out = LangModel.kneserNeyScore(df, "doc_id", "text")
      .collect().map(r => r.getAs[String]("doc_id") -> r).toMap
    val llAB = knMicro(3, 3, 1, 1, 3)
    val llBA = knMicro(1, 2, 2, 1, 3)
    val llBC = knMicro(1, 2, 2, 1, 3)
    assert(out("1").getAs[Long]("sum_ll_micro") === 2 * llAB + llBA)
    assert(out("1").getAs[Long]("n_bigrams") === 3L)
    assert(out("2").getAs[Long]("sum_ll_micro") === llAB + llBC)
  }

  test("continuation weighting: the Francisco effect orders equal-frequency bigrams") {
    import spark.implicits._
    // 'versatile' follows 4 distinct contexts once each; 'francisco'
    // follows only 'san' 4 times. Equal unigram frequency (4), equal
    // per-bigram c2=1 vs c2=4... instead compare two TEST bigrams with
    // identical (c2, c1): (p1, versatile) vs (san2, francisco2) where
    // francisco2 only ever follows san2 but versatile spreads.
    val corpus = Seq(
      ("1", "p1 versatile"), ("2", "p2 versatile"),
      ("3", "p3 versatile"), ("4", "p4 versatile"), ("5", "p5 versatile"),
      ("6", "san francisco"), ("7", "san francisco"),
      ("8", "san francisco"), ("9", "san francisco")
    ).toDF("doc_id", "text")
    val out = LangModel.kneserNeyScore(corpus, "doc_id", "text")
      .collect().map(r => r.getAs[String]("doc_id") ->
        r.getAs[Long]("sum_ll_micro")).toMap
    // doc 1: c2(p1,versatile)=1, c1(p1)=1, n1p=1, nctx(versatile)=5, nbig=6
    // doc 6: c2(san,francisco)=4, c1(san)=4, n1p=1, nctx(francisco)=1, nbig=6
    assert(out("1") === knMicro(1, 1, 1, 5, 6))
    assert(out("6") === knMicro(4, 4, 1, 1, 6))
    // the discounted-MLE parts are close (0.25/1=0.25+0.625 vs
    // 3.25/4+0.031) but the continuation term rewards the
    // many-context word decisively (0.875 vs 0.844). (At 4 contexts
    // both sides land on exactly 0.85 — a fun quantization tie.)
    val pVers = math.max(1.0 - 0.75, 0.0) / 1.0 + 0.75 * 1.0 / 1.0 * (5.0 / 6.0)
    val pFran = math.max(4.0 - 0.75, 0.0) / 4.0 + 0.75 * 1.0 / 4.0 * (1.0 / 6.0)
    assert(pVers > pFran, "continuation term must dominate here")
    assert(out("1") > out("6"))
  }
}
