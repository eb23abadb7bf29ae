package graft.llm

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class MixtureSpec extends SparkSpec {

  // hand-built availability: domain a is scarce relative to its
  // weight (capped), d is abundant (water-filled)
  private def corpus = {
    import spark.implicits._
    Seq(
      ("a", 1L, 100L), ("a", 2L, 100L),              // avail  200, w 1.0
      ("b", 3L, 400L), ("b", 4L, 400L),              // avail  800, w 0.5
      ("c", 5L, 900L), ("c", 6L, 900L),              // avail 1800, w 0.25
      ("d", 7L, 2000L), ("d", 8L, 2000L)             // avail 4000, w 0.125
    ).toDF("dom", "id", "toks")
  }
  private val w = Map("a" -> 1.0, "b" -> 0.5, "c" -> 0.25, "d" -> 0.125)
  private def weightOf(d: org.apache.spark.sql.Column) =
    w.foldRight(lit(0.0)) { case ((k, v), els) => when(d === k, v).otherwise(els) }

  test("water level: capped domains exhaust, uncapped get floor(lambda*w), sum hits budget") {
    // total 6800, budget 3400. r = a/w: a 200, b 1600, c 7200, d 32000
    // cap a (200); lambda = 3200/0.875 = 3657.14 -> b capped too
    // (800 < 1828.6); lambda = (3400-1000)/0.375 = 6400 -> c, d
    // uncapped: c = 1600 <= 1800, d = 800 <= 4000. Sum = 3400.
    val out = Mixture.waterFill(corpus, "dom", col("toks"), weightOf, 0.5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getBoolean(4))).toMap
    assert(out("a") === ((200L, 200L, true)))
    assert(out("b") === ((800L, 800L, true)))
    assert(out("c") === ((1800L, 1600L, false)))
    assert(out("d") === ((4000L, 800L, false)))
  }

  test("budget conservation and monotonicity in the budget fraction") {
    def allocs(frac: Double): Map[String, Long] =
      Mixture.waterFill(corpus, "dom", col("toks"), weightOf, frac)
        .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val total = 6800L
    for (frac <- Seq(0.1, 0.3, 0.5, 0.8)) {
      val a = allocs(frac)
      val budget = math.floor(total * frac).toLong
      // floors lose < 1 token per uncapped domain
      assert(a.values.sum <= budget && budget - a.values.sum < 4, s"frac=$frac $a")
    }
    val lo = allocs(0.3); val hi = allocs(0.6)
    assert(w.keys.forall(k => hi(k) >= lo(k)), s"$lo -> $hi")
    // frac = 1.0: every domain exhausted
    val full = Mixture.waterFill(corpus, "dom", col("toks"), weightOf, 1.0)
      .collect()
    assert(full.forall(_.getBoolean(4)))
    assert(full.map(_.getLong(3)).sum === total)
  }

  test("degenerate shapes: single domain takes the whole budget; zero budget allocates zero") {
    import spark.implicits._
    val one = Seq(("x", 1L, 100L)).toDF("dom", "id", "toks")
    val o = Mixture.waterFill(one, "dom", col("toks"), _ => lit(1.0), 0.5).collect().head
    assert(o.getLong(3) === 50L && !o.getBoolean(4))
    val z = Mixture.waterFill(corpus, "dom", col("toks"), weightOf, 0.0)
      .collect()
    assert(z.forall(_.getLong(3) === 0L))
  }

  test("epochPlan: epochs capped at maxEpochs, scarce domains repeat, budget conserved") {
    // budget 2x total (13600) with <=4 epochs: caps 4a. r = 4a/w:
    // a 800, b 6400, c 28800, d 128000. cap a (800);
    // lambda = 12800/0.875 = 14628.6 -> b capped (3200 < 7314.3);
    // lambda = (13600-4000)/0.375 = 25600 -> c, d uncapped:
    // c = 6400 <= 7200, d = 3200 <= 16000. Sum = 13600.
    val out = Mixture.epochPlan(corpus, "dom", col("toks"), weightOf,
      budgetFrac = 2.0, maxEpochs = 4)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getDouble(4), r.getBoolean(5))).toMap
    assert(out("a") === ((200L, 800L, 4.0, true)))   // repetition ceiling
    assert(out("b") === ((800L, 3200L, 4.0, true)))  // repetition ceiling
    assert(out("c") === ((1800L, 6400L, 6400.0 / 1800.0, false)))
    assert(out("d") === ((4000L, 3200L, 0.8, false))) // partial single pass
    assert(out.values.map(_._2).sum === 13600L)
    assert(out.values.forall(_._3 <= 4.0))
  }

  test("applyBernoulli: deterministic, rate-bounded, keeps only allocated domains") {
    val docs = TextStats.withTokenCounts(Tables.documents(spark, sf("sf0.01")), "text")
    val alloc = Mixture.waterFill(docs, "source", col("re_tokens"),
      d => lit(1.0) / call_function("shiftleft", lit(1),
        substring(d, 4, 8).cast("int") % 6), 0.5)
    def run() = Mixture.applyBernoulli(docs, "doc_id", "source", alloc)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val kept = run()
    assert(run() === kept) // md5 deviate: bit-stable across runs
    // expected kept tokens per domain ~ allocation (Bernoulli mean);
    // just pin the global bound: kept fraction <= 1 and > 0
    assert(kept.nonEmpty && kept.size < docs.count())
  }
}
