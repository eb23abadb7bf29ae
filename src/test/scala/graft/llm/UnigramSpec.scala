package graft.llm

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class UnigramSpec extends SparkSpec {

  private def bruteViterbi(word: String, costs: Map[String, Long],
                           maxPiece: Int = 6, maxWord: Int = 16): Option[(Long, List[String])] = {
    if (word.isEmpty || word.length > maxWord) return None
    val n = word.length
    val dp = Array.fill(n + 1)(Unigram.Inf)
    val bl = Array.fill(n + 1)(0)
    dp(0) = 0L
    for (i <- 1 to n) {
      var best = Unigram.Inf * 64L
      for (l <- 1 to math.min(maxPiece, i)) {
        costs.get(word.substring(i - l, i)).foreach { c =>
          if (dp(i - l) < Unigram.Inf) {
            val packed = (dp(i - l) + c) * 64L + l
            if (packed < best) best = packed
          }
        }
      }
      dp(i) = best / 64L
      bl(i) = (best % 64L).toInt
    }
    if (dp(n) >= Unigram.Inf) None
    else {
      var pos = n
      val ps = List.newBuilder[String]
      while (pos > 0) {
        val l = bl(pos)
        ps += word.substring(pos - l, pos)
        pos -= l
      }
      Some((dp(n), ps.result()))
    }
  }

  test("trained model segments every corpus word, pieces tile exactly") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    val model = Unigram.train(docs, "text")
    assert(model.pieces.nonEmpty)
    val stats = Unigram.wordStats(docs, "text", model).collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      val word = r.getString(0)
      assert(!r.getBoolean(3), s"corpus word '$word' must be segmentable")
      val ps = r.getSeq[String](4)
      assert(ps.map(_.length).sum === word.length,
        s"pieces $ps must tile '$word'")
      assert(ps.mkString.sorted === word.sorted)
    }
  }

  test("Viterbi segmentation equals a brute-force DP on the real corpus") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    val model = Unigram.train(docs, "text")
    val costs = model.pieces.map(p => p._1 -> p._3).toMap
    val stats = Unigram.wordStats(docs, "text", model).collect()
    stats.foreach { r =>
      val word = r.getString(0)
      val want = bruteViterbi(word, costs)
      assert(want.isDefined === !r.getBoolean(3), s"unk mismatch '$word'")
      want.foreach { case (cost, ps) =>
        assert(r.getLong(2) === cost, s"cost mismatch '$word'")
        // backtrace emits pieces right-to-left; brute builds the same way
        assert(r.getSeq[String](4).toList === ps, s"pieces mismatch '$word'")
      }
    }
  }

  test("unigram prefers whole-word pieces over char spellouts") {
    // the E-step's count renormalization should leave frequent whole
    // words as single pieces (cost of one common piece < sum of chars)
    val docs = Tables.documents(spark, sf("sf0.01"))
    val model = Unigram.train(docs, "text")
    val stats = Unigram.wordStats(docs, "text", model).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val avgToks = stats.values.sum.toDouble / stats.size
    info(f"mean tokens/word over ${stats.size} words: $avgToks%.2f")
    assert(avgToks < 3.0, "model should compress beyond char spellout")
  }

  test("train and encode are partition-invariant") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    def run(parts: Int) = {
      val d = docs.repartition(parts)
      val m = Unigram.train(d, "text")
      (m.pieces,
        Unigram.encodeCounts(d, "doc_id", "text", m)
          .collect().map(r => r.getLong(0) ->
            (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap)
    }
    assert(run(1) === run(7))
  }

  test("unsegmentable and over-long words are UNK in encode") {
    import spark.implicits._
    val docs = Seq((1L, "abc abc zz " + "a" * 20)).toDF("doc_id", "text")
    val model = Unigram.train(docs, "text", maxWord = 16)
    // restrict the model to pieces over 'abc' only: drop anything with z
    val restricted = Unigram.UnigramModel(
      model.pieces.filterNot(_._1.contains("z")))
    val out = Unigram.encodeCounts(docs, "doc_id", "text", restricted,
      maxWord = 16).head()
    assert(out.getInt(1) === 4)            // n_words
    assert(out.getLong(3) === 2L)          // zz + the 20-char word
  }
}
