package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SparseSpec extends SparkSpec {
  import spark.implicits._

  test("sparseTf counts tokens case-insensitively; hashedTf folds into dim buckets") {
    val df = Seq((1L, "Apple apple BANANA banana banana cherry")).toDF("doc_id", "text")
    val tf = Sparse.sparseTf(df, "doc_id", "text")
      .collect().map(r => r.getLong(2)).sorted
    assert(tf.toSeq == Seq(1L, 2L, 3L)) // cherry 1, apple 2, banana 3

    val hashed = Sparse.hashedTf(df, "doc_id", "text", dim = 8).collect()
    assert(hashed.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 8))
    // total mass preserved through the fold
    assert(hashed.map(_.getLong(2)).sum == 6L)
  }

  test("sparseCosinePairs: hand-computed cosine, candidates only via shared terms") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta delta"),     // shares 2 of 3 unit terms with 1 -> cos = 2/3
      (3L, "epsilon zeta eta")      // shares nothing -> no pair at all
    ).toDF("doc_id", "text")
    val out = Sparse.sparseCosinePairs(df, "doc_id", "text", tau = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 1)
    val (a, b, c) = out(0)
    // mirror the engine's exact IEEE shape: dot/(sqrt(n2a)*sqrt(n2b)),
    // NOT the algebraic 2/3 (sqrt(3)*sqrt(3) = 2.9999999999999996)
    assert(a == 1L && b == 2L && c == 2.0 / (math.sqrt(3.0) * math.sqrt(3.0)))
  }

  test("df pruning drops stopword-like terms from BOTH dot and norms (self-consistent)") {
    // 'the' appears in all 3 docs; with maxDf=2 it must not contribute
    val df = Seq(
      (1L, "the alpha"),
      (2L, "the alpha"),
      (3L, "the omega")
    ).toDF("doc_id", "text")
    val out = Sparse.sparseCosinePairs(df, "doc_id", "text", tau = 0.0, minDfCap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // only (1,2) share 'alpha'; cosine over the pruned space is exactly 1
    assert(out.toSeq == Seq((1L, 2L, 1.0)))
  }
}
