package graft.llm

import scala.util.Random

import graft.SparkSpec

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def randWords(r: Random, n: Int): Seq[String] =
    Seq.fill(n)("w" + r.nextInt(5000))

  test("winnowing guarantee: any shared span of >= w+k-1 words yields a shared fingerprint") {
    // k=5, w=4 -> guarantee threshold 8 words
    val r = new Random(7)
    val span = randWords(r, 12).mkString(" ") // 12 > 8
    val docs = (0 until 6).map { i =>
      val pre = randWords(r, 20).mkString(" ")
      val post = randWords(r, 20).mkString(" ")
      (i.toLong, s"$pre $span $post")
    }
    val fps = Winnow.fingerprints(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().groupBy(_.getLong(0)).map { case (d, rs) => d -> rs.map(_.getLong(1)).toSet }
    // every pair of docs shares at least one fingerprint via the span
    for (a <- 0 until 6; b <- (a + 1) until 6)
      assert(fps(a.toLong).intersect(fps(b.toLong)).nonEmpty,
        s"docs $a,$b embed the same 12-word span but share no fingerprint")
  }

  test("density: winnowed set is a strict reduction of the gram set on long docs") {
    val r = new Random(11)
    val doc = Seq((1L, randWords(r, 200).mkString(" "))).toDF("doc_id", "text")
    val nFps = Winnow.fingerprints(doc, "doc_id", "text").count()
    val nGrams = 200 - 5 + 1
    // expected density ~ 2/(w+1) = 0.4; allow generous slack, but must reduce
    assert(nFps < nGrams * 0.7, s"$nFps fingerprints of $nGrams grams — no reduction")
    assert(nFps > 0)
  }

  test("short documents: < k words -> none; < w grams -> exactly the global min") {
    val docs = Seq(
      (1L, "a b c"),              // 3 words < k=5 -> 0 grams -> no fps
      (2L, "a b c d e f")         // 6 words -> 2 grams < w=4 -> 1 fp (min)
    ).toDF("doc_id", "text")
    val by = Winnow.fingerprints(docs, "doc_id", "text")
      .collect().groupBy(_.getLong(0))
    assert(!by.contains(1L))
    assert(by(2L).length == 1)
  }

  test("pairs: planted near-duplicates are reported, unrelated docs are not") {
    val r = new Random(23)
    val shared = randWords(r, 30).mkString(" ")
    val docs = Seq(
      (1L, shared + " " + randWords(r, 10).mkString(" ")),
      (2L, randWords(r, 10).mkString(" ") + " " + shared),
      (3L, randWords(r, 60).mkString(" ")),
      (4L, randWords(r, 60).mkString(" "))
    ).toDF("doc_id", "text")
    val pairs = Winnow.pairs(docs, "doc_id", "text")
      .collect().map(row => (row.getLong(0), row.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "planted duplicate pair missed")
    assert(pairs.size == 1, s"false-positive pairs: $pairs")
  }
}
