package graft.props

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.llm.{Chunking, Decontam, QualityClassifier, Similarity}
import graft.sources.Layout

/** Property tests for the round-3 curation operators (seed-pinned so
  * failures reproduce).
  */
class CurationPropertySpec extends SparkSpec {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val docGen: Gen[List[String]] = Gen.listOfN(12, for {
    n <- Gen.choose(1, 90)
    ws <- Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "delta",
      "epsilon", "zeta", "eta", "theta", "iota", "kappa"))
  } yield ws.mkString(" "))

  test("chunking reconstructs every document exactly (5 seeds)") {
    import spark.implicits._
    (20L to 24L).foreach { seed =>
      val texts = sample(docGen, seed)
      val size = 8 + (seed % 5).toInt
      val stride = 1 + (size * 3) / 4
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val chunks = Chunking.chunks(df, "doc_id", "text", size, stride)
        .collect().groupBy(_.getLong(0))
      texts.zipWithIndex.foreach { case (t, i) =>
        val words = t.split("\\s+").toSeq
        val cs = chunks(i.toLong).sortBy(_.getInt(1))
        // stitch: first chunk whole, then the non-overlapping tail of each
        val stitched = cs.head.getString(2).split(" ").toSeq ++
          cs.tail.toSeq.flatMap(c => c.getString(2).split(" ").toSeq.drop(size - stride))
        assert(stitched === words, s"seed=$seed doc=$i size=$size stride=$stride")
        // every chunk except the last is exactly `size` tokens
        assert(cs.init.forall(_.getInt(3) === size), s"seed=$seed doc=$i")
      }
    }
  }

  test("zValue is bijective for arbitrary dims/bits grids (5 seeds)") {
    import spark.implicits._
    (30L to 34L).foreach { seed =>
      val d = 2 + (seed % 2).toInt   // 2 or 3 dims
      val bits = 2 + (seed % 3).toInt // 2..4 bits
      val side = 1 << bits
      val pts = (0 until math.pow(side, d).toInt).map { v =>
        Seq.tabulate(d)(j => (v >> (j * bits)) & (side - 1))
      }
      val df = pts.map(p => (p.head, p(1), if (d > 2) p(2) else 0))
        .toDF("x", "y", "z3")
      val dims = (Seq(col("x"), col("y")) ++
        (if (d > 2) Seq(col("z3")) else Nil))
      val zs = df.select(Layout.zValue(dims, bits).as("z"))
        .collect().map(_.getLong(0))
      assert(zs.toSet.size === pts.size, s"seed=$seed d=$d bits=$bits")
      assert(zs.min === 0L && zs.max === pts.size - 1L)
    }
  }

  test("int8 quantization error is within half a scale step per component (5 seeds)") {
    import spark.implicits._
    val vecGen: Gen[List[Seq[Float]]] = Gen.listOfN(20,
      Gen.listOfN(16, Gen.choose(-1000000, 1000000).map(_ / 10000.0f)).map(_.toSeq))
    (40L to 44L).foreach { seed =>
      val vecs = sample(vecGen, seed)
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val q = Similarity.quantizeInt8(df, "vec_id", "embedding")
        .join(df, "vec_id")
        .collect()
      q.foreach { r =>
        val s = r.getAs[Double]("scale")
        // Spark floor() yields LongType: the codes are true integers
        val codes = r.getAs[scala.collection.Seq[Long]]("qvec")
        val orig = r.getAs[scala.collection.Seq[Float]]("embedding")
        assert(codes.forall(c => math.abs(c) <= 127))
        codes.zip(orig).foreach { case (c, x) =>
          assert(math.abs(c * s - x) <= s / 2 + 1e-12,
            s"seed=$seed code=$c x=$x scale=$s")
        }
      }
    }
  }

  test("decontam: overlap bounded by gram count; verbatim heldout docs always flagged (3 seeds)") {
    import spark.implicits._
    (50L to 52L).foreach { seed =>
      val texts = sample(docGen, seed)
      val train = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      // held-out = a verbatim copy of the first three train docs
      val heldout = texts.take(3).zipWithIndex
        .map { case (t, i) => (1000L + i, t) }.toDF("doc_id", "text")
      val out = Decontam.report(train, heldout, "doc_id", "text", n = 5)
        .collect().map(r => r.getLong(0) -> r).toMap
      out.values.foreach { r =>
        assert(r.getLong(2) <= r.getInt(1), s"seed=$seed overlap > grams")
      }
      texts.take(3).zipWithIndex.foreach { case (t, i) =>
        if (t.split("\\s+").length >= 5)
          assert(out(i.toLong).getBoolean(3), s"seed=$seed verbatim doc $i not flagged")
      }
    }
  }

  test("pack_sequences is invariant under input partitioning (3 seeds)") {
    import spark.implicits._
    (60L to 62L).foreach { seed =>
      val texts = sample(docGen, seed)
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      def run(d: org.apache.spark.sql.DataFrame) =
        Chunking.packSequences(d, "doc_id", "text", seqLen = 64)
          .orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(run(df) === run(df.repartition(7)), s"seed=$seed")
      assert(run(df) === run(df.repartition(1)), s"seed=$seed")
    }
  }

  test("NB classifier train+score is invariant under input partitioning (3 seeds)") {
    import spark.implicits._
    // the integer micro-nat policy's whole point: identical bits under
    // any partitioning of BOTH the training and the scored corpus
    (70L to 72L).foreach { seed =>
      // degenerate docs ride along (r9 ADVICE): null text (dropped by
      // contract), empty and whitespace-only (score as one OOV token)
      val texts = sample(docGen, seed) ++
        Seq(null.asInstanceOf[String], "", "  \t ")
      val df = texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, t, i % 3 == 0) }.toDF("doc_id", "text", "pos")
      def run(d: org.apache.spark.sql.DataFrame) = {
        val tr = d.filter(col("doc_id") % 2 === 0)
        val te = d.filter(col("doc_id") % 2 === 1)
        QualityClassifier.nbScore(te, "doc_id", "text",
            QualityClassifier.nbModel(tr, "text", col("pos")),
            QualityClassifier.nbPrior(tr, col("pos")))
          .orderBy("doc_id").collect().map(_.toSeq).toSeq
      }
      val base = run(df)
      assert(base.nonEmpty)
      assert(base === run(df.repartition(7)), s"seed=$seed")
      assert(base === run(df.repartition(1)), s"seed=$seed")
    }
  }
}
