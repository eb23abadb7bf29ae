package graft.llm

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.llm.TextHash.h32

class NgramJaccardSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "x", 0, "the quick brown fox jumps over the lazy dog"),
      (2L, "x", 0, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
      (3L, "x", 0, "entirely different content with no overlap at all"),
      (4L, "y", 0, "the quick brown fox jumps over the lazy dog")  // dup of 1, other block
    ).toDF("doc_id", "lang", "len_band", "text")
  }

  test("near-dup pair found within block; cross-block pairs excluded") {
    val out = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      Seq("lang", "len_band"), n = 3, tau = 0.5, modP = 1).collect()
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L }) // blocked away
    assert(!pairs.contains((1L, 3L)))
  }

  test("mod-p sketch keeps identical-text jaccard at 1.0 and is deterministic") {
    val full = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      Seq("len_band"), n = 3, tau = 0.0, modP = 1)
      .filter(col("id_a") === 1 && col("id_b") === 4).collect()(0).getDouble(2)
    val sketched = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      Seq("len_band"), n = 3, tau = 0.0, modP = 4)
      .filter(col("id_a") === 1 && col("id_b") === 4).collect()(0).getDouble(2)
    assert(full === 1.0 && sketched === 1.0) // identical texts sketch identically
    val again = Dedup.ngramJaccardPairs(docs.repartition(7), "doc_id", "text",
      Seq("len_band"), n = 3, tau = 0.0, modP = 4)
      .filter(col("id_a") === 1 && col("id_b") === 4).collect()(0).getDouble(2)
    assert(sketched === again)
  }

  test("band-bucket candidates find every true tau-pair (vs all-pairs baseline)") {
    val d = Tables.documents(spark, sf("sf0.001"))
      .withColumn("len_band", floor(col("n_chars") / 50).cast("int"))
    val sampled = Dedup.ngramJaccardPairs(d, "doc_id", "text",
      Seq("lang", "len_band"), n = 3, tau = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // All-pairs baseline: block self-join, no candidate stage at all.
    val g = d.select(col("doc_id"), col("lang"), col("len_band"),
      array_distinct(filter(transform(
        sequence(lit(1), greatest(length(col("text")) - 2, lit(1))),
        i => h32(col("text").substr(i, lit(3)))),
        h => h % 4 === 0)).as("grams"))
    val truth = g.as("a").join(g.as("b"),
        col("a.lang") === col("b.lang") && col("a.len_band") === col("b.len_band") &&
          col("a.doc_id") < col("b.doc_id"))
      .withColumn("inter", size(array_intersect(col("a.grams"), col("b.grams"))))
      .select(col("a.doc_id"), col("b.doc_id"),
        (col("inter").cast("double") /
          (size(col("a.grams")) + size(col("b.grams")) - col("inter")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(sampled === truth,
      s"lost: ${truth -- sampled}; spurious: ${sampled -- truth}")
    assert(sampled.forall(_._3 >= 0.8))
  }
}
