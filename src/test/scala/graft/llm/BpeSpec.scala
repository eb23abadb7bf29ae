package graft.llm

import graft.SparkSpec

class BpeSpec extends SparkSpec {

  // the classic BPE worked example: low×5 lower×2 newest×6 widest×3
  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, ("low " * 5).trim + " " + ("lower " * 2).trim),
      (2L, ("newest " * 6).trim + " " + ("widest " * 3).trim)
    ).toDF("doc_id", "text")
  }

  test("train reproduces the hand-computed merge sequence with deterministic ties") {
    val merges = Bpe.train(corpus, "text", numMerges = 5).merges
    // pair counts: (e,s)=9 (s,t)=9 tie → lex picks (e,s); then (es,t)=9;
    // (l,o)=7 (o,w)=7 tie → (l,o); then (lo,w)=7; then (e,w)=6 beats
    // (n,e)/(w,est) on lex
    assert(merges === Seq(
      (1, "e", "s", 9L),
      (2, "es", "t", 9L),
      (3, "l", "o", 7L),
      (4, "lo", "w", 7L),
      (5, "e", "w", 6L)))
  }

  test("adjacent repeats merge the true-BPE way (aaaa → aa aa, not aa a a)") {
    import spark.implicits._
    val rep = Seq((1L, "aaaa aaaa aaa")).toDF("doc_id", "text")
    val model = Bpe.train(rep, "text", numMerges = 2)
    // pairs: aaaa has 3 (a,a), ×2 words; aaa has 2 → (a,a)=8
    assert(model.merges.head === ((1, "a", "a", 8L)))
    // after merge 1: aaaa → [aa, aa] (2 tokens), aaa → [aa, a];
    // merge 2 is then (aa, aa)=2 (beats (aa, a)=1)
    assert(model.merges(1) === ((2, "aa", "aa", 2L)))
    val toks = Bpe.wordTokenCounts(model).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(toks("aaaa") === 1) // aa+aa merged again by merge 2
    assert(toks("aaa") === 2)  // [aa, a]
  }

  test("encodeCounts: tokens per word after the trained merges") {
    import spark.implicits._
    val model = Bpe.train(corpus, "text", numMerges = 5)
    val doc = Seq((9L, "lower newest")).toDF("doc_id", "text")
    val out = Bpe.encodeCounts(doc, "doc_id", "text", model).collect().head
    // "lower" → low|e|r (3), "newest" → n|ew|est (3)
    assert(out.getAs[Int]("n_words") === 2)
    assert(out.getAs[Int]("bpe_tokens") === 6)
    assert(out.getAs[Double]("tokens_per_word") === 3.0)
  }

  test("merging to exhaustion stops early and single-symbol words survive") {
    import spark.implicits._
    val tiny = Seq((1L, "a a b")).toDF("doc_id", "text")
    // "a" and "b" are single-symbol words: no adjacent pairs → no merges
    assert(Bpe.train(tiny, "text", 3).merges === Seq.empty)
    val ab = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    val m = Bpe.train(ab, "text", 10).merges
    // (a,b)=2 then (c,d)=1, then nothing left
    assert(m === Seq((1, "a", "b", 2L), (2, "c", "d", 1L)))
  }
}
