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

  test("dupSpans: later occurrence of a shared substring becomes one maximal span; first survives") {
    import spark.implicits._
    val shared = (1 to 12).map(i => s"dup$i").mkString(" ") // 12 shared words
    val doc1 = s"alpha beta gamma delta $shared omega psi chi phi"
    val doc2 = s"one two three four five $shared six seven eight nine"
    val doc3 = "totally different words with no overlap at all whatsoever here today"
    val df = Seq((1L, doc1), (2L, doc2), (3L, doc3)).toDF("doc_id", "text")
    val out = Decontam.dupSpans(df, "doc_id", "text", n = 8).collect()
    // only doc2 (the later occurrence) reports a span
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(2L))
    val s = out.head
    // doc2 words: 5 unique + 12 shared + 4 unique. The shared 12-word
    // region yields 12-8+1 = 5 duplicated 8-grams at positions 6..10
    // -> span words 6..17 (1-based, inclusive: exactly the shared run)
    assert(s.getAs[Long]("span_start") === 6L)
    assert(s.getAs[Long]("span_end") === 17L)
    assert(s.getAs[Long]("n_grams") === 5L)
  }

  test("dupSpans: within-document repetition keeps the first copy only") {
    import spark.implicits._
    val run = (1 to 10).map(i => s"w$i").mkString(" ")
    val doc = s"$run filler1 filler2 filler3 $run" // same 10 words twice
    val df = Seq((7L, doc)).toDF("doc_id", "text")
    val out = Decontam.dupSpans(df, "doc_id", "text", n = 8).collect()
    assert(out.length === 1)
    val s = out.head
    // second copy starts at word 14 (10 + 3 fillers + 1); its 3
    // duplicated 8-grams (positions 14..16) close the span at 23
    assert(s.getAs[Long]("span_start") === 14L)
    assert(s.getAs[Long]("span_end") === 23L)
    assert(s.getAs[Long]("n_grams") === 3L)
  }

  test("dupSpans equals a naive driver-side reference on random planted corpora") {
    import spark.implicits._
    val n = 6
    val rnd = new scala.util.Random(42)
    def word() = s"w${rnd.nextInt(40)}"
    // 30 random docs over a small vocabulary (natural 6-gram collisions
    // are possible and MUST be reported identically by both sides),
    // plus planted copies: doc i copies a slice of doc i-1 every 5th doc
    val base = (0 until 30).map { i =>
      val ws = Vector.fill(12 + rnd.nextInt(25))(word())
      (i.toLong, ws)
    }
    val docs = base.map { case (i, ws0) =>
      val ws = if (i % 5 == 4) {
        val src = base((i - 1).toInt)._2
        val take = math.min(src.length, 8 + rnd.nextInt(5))
        ws0.take(4) ++ src.take(take) ++ ws0.drop(4)
      } else ws0
      (i, ws.mkString(" "))
    }
    val out = Decontam.dupSpans(docs.toDF("doc_id", "text"), "doc_id", "text", n)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end"), r.getAs[Long]("n_grams"))).toSet

    // naive reference: full gram table, first occurrence by (doc, pos),
    // island merge per doc
    val grams = for {
      (id, text) <- docs
      ws = text.split("\\s+").toVector
      p <- 1 to math.max(ws.length - n + 1, 0)
    } yield ((id, p.toLong), ws.slice(p - 1, p + n - 1).mkString(" "))
    val byGram = grams.groupBy(_._2)
    val removable = byGram.values.filter(_.size >= 2).flatMap { occ =>
      occ.map(_._1).sorted.drop(1) // keep corpus-first
    }.toSet
    val expect = removable.groupBy(_._1).flatMap { case (id, ps) =>
      val sorted = ps.map(_._2).toSeq.sorted
      // islands of consecutive positions
      val islands = sorted.foldLeft(Vector.empty[Vector[Long]]) { (acc, p) =>
        if (acc.nonEmpty && acc.last.last == p - 1) acc.init :+ (acc.last :+ p)
        else acc :+ Vector(p)
      }
      islands.map(is => (id, is.head, is.last + n - 1, is.size.toLong))
    }.toSet
    assert(out === expect)
    assert(expect.nonEmpty, "planted copies must produce spans")
  }

  test("dupSpans: disjoint duplicated regions stay separate spans") {
    import spark.implicits._
    val a = (1 to 9).map(i => s"a$i").mkString(" ")
    val b = (1 to 9).map(i => s"b$i").mkString(" ")
    val src = s"$a gapone gaptwo gapthree gapfour gapfive $b"
    val cpy = s"$a xgapone xgaptwo xgapthree xgapfour xgapfive $b"
    val df = Seq((1L, src), (2L, cpy)).toDF("doc_id", "text")
    val out = Decontam.dupSpans(df, "doc_id", "text", n = 8)
      .orderBy("span_start").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(2L, 2L))
    // two 9-word shared runs -> two 2-gram islands in the copy
    assert(out(0).getAs[Long]("span_start") === 1L)
    assert(out(0).getAs[Long]("span_end") === 9L)
    assert(out(1).getAs[Long]("span_start") === 15L)
    assert(out(1).getAs[Long]("span_end") === 23L)
  }
}
