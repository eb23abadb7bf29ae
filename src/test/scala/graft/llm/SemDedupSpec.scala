package graft.llm

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SemDedupSpec extends SparkSpec {

  test("micro-case: equal-dist ties keep the smaller id, dissimilar vectors survive") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(1.0f, 0.0f)), // exact copy of 1
      (3L, Seq(0.0f, 1.0f))  // orthogonal
    ).toDF("vec_id", "embedding")
    val out = SemDedup.semanticDedup(df, "vec_id", "embedding",
      k = 1, iters = 0, tau = 0.99).collect()
      .map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(out(1L).getAs[Int]("keep") === 1)
    assert(out(3L).getAs[Int]("keep") === 1)
    assert(out(2L).getAs[Int]("keep") === 0)
    assert(out(2L).getAs[Long]("dup_of") === 1L)
    assert(out(2L).getAs[Double]("dup_cosine") > 0.999999)
  }

  for (k <- Seq(8, 32))
  test(s"matches a driver-side brute-force recompute on the sf0.001 embeddings (k=$k)") {
    val emb = Tables.embeddings(spark, sf())
    val iters = 1; val tau = 0.35
    val out = SemDedup.semanticDedup(emb, "vec_id", "embedding", k, iters, tau)
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap

    // Trusted input: the oracled kmeansCells assignment. The spec
    // recomputes the dominance/attribution logic independently.
    val cells = Similarity.kmeansCells(emb, "vec_id", "embedding", k, iters)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cell"),
        r.getAs[Double]("dist")))
    val vecs = emb.select(col("vec_id"),
        Similarity.toDoubleVec(col("embedding")).as("v")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val byCell = cells.groupBy(_._2)
    var dropped = 0
    for ((id, cell, dist) <- cells) {
      val doms = byCell(cell).filter { case (oid, _, odist) =>
        (odist > dist || (odist == dist && oid < id)) &&
          cos(vecs(id), vecs(oid)) >= tau
      }
      val row = out(id)
      if (doms.isEmpty) assert(row.getAs[Int]("keep") === 1, s"vec $id")
      else {
        dropped += 1
        val best = doms.map { case (oid, _, _) => (cos(vecs(id), vecs(oid)), oid) }
          .maxBy { case (c, oid) => (c, -oid) }
        assert(row.getAs[Int]("keep") === 0, s"vec $id")
        assert(row.getAs[Long]("dup_of") === best._2, s"vec $id")
        assert(math.abs(row.getAs[Double]("dup_cosine") - best._1) < 1e-12)
      }
    }
    assert(dropped > 0, "corpus should contain semantic dups at this tau")
    assert(out.size === cells.length) // exactly one verdict per vector
  }

  test("the farthest-from-centroid member of every cell is always kept") {
    val emb = Tables.embeddings(spark, sf())
    val out = SemDedup.semanticDedup(emb, "vec_id", "embedding",
      k = 8, iters = 1, tau = 0.35)
    val cells = Similarity.kmeansCells(emb, "vec_id", "embedding", k = 8, iters = 1)
    val far = cells.groupBy("cell").agg(max_by(col("vec_id"),
      struct(col("dist"), -col("vec_id"))).as("vec_id"))
    val kept = out.join(far, Seq("vec_id"), "left_semi")
      .filter(col("keep") === 0).count()
    assert(kept === 0)
  }

  test("semanticDedupIndexed over the persisted IVF index equals the monolithic form bit-for-bit") {
    // the nightly-dedup shape: Lloyd read from the index tables, the
    // dominance dist recomputed map-side from the quantizer — must
    // reproduce semanticDedup exactly, including through parquet
    val emb = graft.Tables.embeddings(spark, sf())
    val mono = SemDedup.semanticDedup(emb, "vec_id", "embedding",
      k = 8, iters = 1, tau = 0.35)
    val (vectors, _, quant) = AnnIndex.buildIvf(emb, "vec_id", "embedding",
      cells = 8, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("semdedup_idx")
      .toFile.getAbsolutePath
    vectors.write.parquet(s"$dir/vectors")
    quant.write.parquet(s"$dir/quant")
    val indexed = SemDedup.semanticDedupIndexed(
      spark.read.parquet(s"$dir/vectors"), spark.read.parquet(s"$dir/quant"),
      tau = 0.35)
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.mkString("|")).toSet
    assert(rows(indexed) === rows(mono))
    assert(indexed.count() === emb.count())
  }
}
