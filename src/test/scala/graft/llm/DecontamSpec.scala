package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DecontamSpec extends SparkSpec {

  test("known answer: 8-gram overlap flags exactly the leaking doc") {
    import spark.implicits._
    val leak = "alpha beta gamma delta epsilon zeta eta theta" // 8 words
    val train = Seq(
      (1L, s"intro words here $leak trailing tail"), // contains the eval 8-gram
      (2L, "totally different content with no shared sequences at all here"),
      (3L, "short doc") // < 8 words -> zero grams
    ).toDF("doc_id", "text")
    val heldout = Seq((100L, s"benchmark prompt $leak and answer")).toDF("doc_id", "text")
    val out = Decontam.report(train, heldout, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L)._3 === true)
    assert(out(1L)._2 >= 1L)
    assert(out(2L) === ((out(2L)._1, 0L, false)))
    assert(out(3L) === ((0, 0L, false))) // no grams, not contaminated
    assert(out.size === 3) // every train doc reported, hit or not
  }

  test("selfOverlapPairs: shared span pairs, gram-count proxy, df cap") {
    import spark.implicits._
    val span = "one two three four five six seven eight nine" // 9 words -> 2 distinct 8-grams
    val docs = Seq(
      (1L, s"prefix a b c $span"),
      (2L, s"$span different suffix words here"),
      (3L, "unrelated text with nothing shared at all among these words")
    ).toDF("doc_id", "text")
    val out = Decontam.selfOverlapPairs(docs, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // only (1,2) pair; the 9-word span holds both of its 8-grams
    assert(out.toSeq == Seq((1L, 2L, 2L)))

    // df cap: a gram shared by all 3 docs disappears at maxDf=2
    val common = Seq(
      (1L, span), (2L, span), (3L, span)
    ).toDF("doc_id", "text")
    assert(Decontam.selfOverlapPairs(common, "doc_id", "text", n = 8, maxDf = 2)
      .count() == 0L)
    assert(Decontam.selfOverlapPairs(common, "doc_id", "text", n = 8, maxDf = 3)
      .count() == 3L) // all three pairs
  }

  test("bloomReport equals the exact report (no false negatives), small bloom") {
    import spark.implicits._
    val span = "alpha beta gamma delta epsilon zeta eta theta"
    val train = (1L to 40L).map { i =>
      if (i % 7 == 0) (i, s"doc $i contains the span $span verbatim here today")
      else (i, s"doc $i unique filler words w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f w${i}g w${i}h")
    }.toDF("doc_id", "text")
    val heldout = Seq((100L, s"benchmark with $span inside")).toDF("doc_id", "text")
    val exact = Decontam.report(train, heldout, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3))).sorted
    // deliberately tiny bloom (high FP rate) — exact verify must absorb it
    val bloom = Decontam.bloomReport(train, heldout, "doc_id", "text", n = 8,
        mBits = 256, k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3))).sorted
    assert(bloom === exact)
    assert(exact.count(_._4) === train.count().toInt / 7)
  }

  test("bloomBuild bitmap is correctly sized and well spread") {
    import spark.implicits._
    val grams = (1L to 500L).map(i => i * 2654435761L % 4294967296L).toDF("g")
    val mBits = 1 << 14 // ~32 bits/elem, k=4 → FP ~ 1e-3
    val bitmap = Decontam.bloomBuild(grams, "g", mBits, 4)
    assert(bitmap.length === mBits / 64)
    assert(bitmap.map(java.lang.Long.bitCount).sum <= 500 * 4)
    assert(bitmap.map(java.lang.Long.bitCount).sum > 1000) // hashes spread
  }

  test("gram sets are distinct and empty below n words") {
    import spark.implicits._
    val df = Seq((1L, "a b a b a b a b a b")) // repeated bigram, 10 words
      .toDF("doc_id", "text")
    val grams = df.select(Decontam.gramHashes(col("text"), 8).as("g"))
      .selectExpr("size(g)").as[Int].head()
    // 3 windows of 8 over 10 words, but only 2 distinct sequences
    // ("a b a b a b a b" and "b a b a b a b a")
    assert(grams === 2)
    val short = Seq((1L, "a b c")).toDF("doc_id", "text")
      .select(Decontam.gramHashes(col("text"), 8).as("g"))
      .selectExpr("size(g)").as[Int].head()
    assert(short === 0)
  }
}
