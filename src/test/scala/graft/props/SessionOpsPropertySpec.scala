package graft.props

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.llm.{Unigram, Wordpiece}
import graft.ops.{Communities, FuzzyJoin, Quantiles}

/** Property tests for the session-3 operators (seed-pinned so
  * failures reproduce): each operator against an independent
  * brute-force reference on randomized inputs.
  */
class SessionOpsPropertySpec extends SparkSpec {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("bottom-k sketch picks EXACTLY the k smallest md5 hashes (4 seeds)") {
    import spark.implicits._
    (40L to 43L).foreach { seed =>
      val rows = sample(Gen.listOfN(300, for {
        g <- Gen.oneOf("a", "b", "c")
        v <- Gen.choose(-50.0, 50.0)
      } yield (g, v)), seed).zipWithIndex
        .map { case ((g, v), i) => (g, i.toLong, math.rint(v * 4) / 4) }
      val parts = 1 + (seed % 7).toInt
      val got = Quantiles.sampledQuantiles(
          rows.toDF("k", "id", "v").repartition(parts), "k", "v", "id",
          k = 16, pcts = Seq(50))
        .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getLong(3), r.getLong(4)))
        .toMap
      rows.groupBy(_._1).foreach { case (g, rs) =>
        // reference: k smallest by (md5 hash, value), then median by rank
        val kept = rs.map { case (_, id, v) => (md5hex(s"qsketch:$id"), v) }
          .sorted.take(16).map(_._2).sorted
        val m = kept.length
        val want = kept((50 * m + 99) / 100 - 1)
        assert(got(g) === ((want, m.toLong, rs.size.toLong)),
          s"seed=$seed group=$g")
      }
    }
  }

  test("fuzzy join equals brute-force levenshtein on random strings (4 seeds)") {
    import spark.implicits._
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(a.length)
    }
    (50L to 53L).foreach { seed =>
      val words = sample(Gen.listOfN(40, for {
        n <- Gen.choose(1, 7)
        cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
      } yield cs.mkString), seed).distinct
      val got = FuzzyJoin.editPairs(words.toDF("w"), "w", maxEdits = 2)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
      val want = (for {
        a <- words; b <- words if a < b
        d = lev(a, b) if d <= 2
      } yield (a, b) -> d).toMap
      assert(got === want, s"seed=$seed")
    }
  }

  test("unigram Viterbi equals brute DP under random piece models (4 seeds)") {
    import spark.implicits._
    val pieceGen = for {
      n <- Gen.choose(1, 3)
      cs <- Gen.listOfN(n, Gen.oneOf('x', 'y', 'z'))
      c <- Gen.choose(100000L, 9000000L)
    } yield (cs.mkString, c)
    (60L to 63L).foreach { seed =>
      val pieces = sample(Gen.listOfN(25, pieceGen), seed)
        .groupBy(_._1).map { case (p, cs) => (p, 1L, cs.head._2) }.toSeq
      val model = Unigram.UnigramModel(pieces.sortBy(_._1))
      val words = sample(Gen.listOfN(30, for {
        n <- Gen.choose(1, 10)
        cs <- Gen.listOfN(n, Gen.oneOf('x', 'y', 'z'))
      } yield cs.mkString), seed).distinct
      val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val costs = model.pieces.map(p => p._1 -> p._3).toMap
      def brute(word: String): Option[Long] = {
        if (word.isEmpty || word.length > 16) return None
        val dp = Array.fill(word.length + 1)(Unigram.Inf)
        dp(0) = 0
        for (i <- 1 to word.length; l <- 1 to math.min(6, i))
          costs.get(word.substring(i - l, i)).foreach { c =>
            if (dp(i - l) < Unigram.Inf) dp(i) = math.min(dp(i), dp(i - l) + c)
          }
        if (dp(word.length) >= Unigram.Inf) None else Some(dp(word.length))
      }
      val got = Unigram.wordStats(docs, "text", model)
        .collect().map(r => r.getString(0) -> (r.getLong(2), r.getBoolean(3))).toMap
      words.foreach { w =>
        val want = brute(w)
        assert(got(w)._2 === want.isEmpty, s"seed=$seed unk mismatch '$w'")
        want.foreach(c => assert(got(w)._1 === c, s"seed=$seed cost mismatch '$w'"))
      }
    }
  }

  test("LPA equals a brute-force synchronous reference on random graphs (4 seeds)") {
    import spark.implicits._
    (70L to 73L).foreach { seed =>
      val edges = sample(Gen.listOfN(60, for {
        a <- Gen.choose(1L, 25L)
        b <- Gen.choose(1L, 25L) if a != b
      } yield (a, b)), seed).distinct
      if (edges.nonEmpty) {
        val und = (edges ++ edges.map(_.swap)).distinct
        val adj = und.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
        var lbl = adj.keys.map(n => n -> n).toMap
        for (_ <- 1 to 3) {
          lbl = adj.map { case (n, nbrs) =>
            val counts = nbrs.map(lbl).groupBy(identity)
              .map { case (l, xs) => (l, xs.size) }
            val best = counts.toSeq.map { case (l, c) => (-c, l) }.min._2
            n -> best
          }
        }
        val got = Communities.labelPropagation(edges.toDF("s", "d"), "s", "d", iters = 3)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === lbl, s"seed=$seed")
      }
    }
  }

  test("wordpiece greedy equals a reference matcher under random vocabularies (4 seeds)") {
    import spark.implicits._
    val vocabGen = Gen.listOfN(15, for {
      n <- Gen.choose(1, 3)
      cs <- Gen.listOfN(n, Gen.oneOf('p', 'q'))
      cont <- Gen.oneOf(true, false)
    } yield (cs.mkString, cont))
    (80L to 83L).foreach { seed =>
      val vs = sample(vocabGen, seed).distinct
      val words = sample(Gen.listOfN(25, for {
        n <- Gen.choose(1, 8)
        cs <- Gen.listOfN(n, Gen.oneOf('p', 'q'))
      } yield cs.mkString), seed).distinct
      val init = vs.collect { case (p, false) => p }.toSet
      val cont = vs.collect { case (p, true) => p }.toSet
      if (init.nonEmpty) {
        val maxPiece = vs.map(_._1.length).max
        def ref(word: String): (Int, Boolean) = {
          if (word.isEmpty || word.length > 24) return (1, true)
          var pos = 0; var toks = 0
          while (pos < word.length) {
            val set = if (pos == 0) init else cont
            (math.min(maxPiece, word.length - pos) to 1 by -1)
              .find(l => set(word.substring(pos, pos + l))) match {
              case Some(l) => pos += l; toks += 1
              case None => return (1, true)
            }
          }
          (toks, false)
        }
        val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
        val got = Wordpiece.wordTokenCounts(docs, "text", vs.sorted, 24)
          .collect().map(r => r.getString(0) -> (r.getInt(1), r.getBoolean(2))).toMap
        words.foreach { w =>
          val (t, unk) = ref(w)
          val wantToks = if (unk) 1 else t
          assert(got(w) === ((wantToks, unk)), s"seed=$seed word '$w'")
        }
      }
    }
  }
}
