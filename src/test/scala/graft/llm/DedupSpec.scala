package graft.llm

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class DedupSpec extends SparkSpec {

  test("exact dedup groups duplicated normalized text") {
    import spark.implicits._
    val df = Seq(
      (1L, "Hello  World"),
      (2L, "hello world"),
      (3L, "other doc")
    ).toDF("doc_id", "text")
    val out = Dedup.exact(df, "doc_id", "text").collect()
    assert(out.length === 2)
    val grp = out.find(_.getAs[Long]("group_size") === 2L).get
    assert(grp.getAs[Long]("rep_id") === 1L)
  }

  test("minhash LSH finds all high-jaccard pairs it emits (no false positives)") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val out = Dedup.minHashNearDups(docs, "doc_id", "text", 16, 4, 0.85)
    // exact verify stage guarantees jaccard >= tau on every emitted pair
    assert(out.filter(col("jaccard") < 0.85).count() === 0)
    assert(out.filter(col("id_a") >= col("id_b")).count() === 0)
  }

  test("simhash near-identical token sets have small hamming distance") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"), // 1 token differs
      (3L, "completely different words entirely unrelated content here now")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simHashNearDups(df, "doc_id", "text", maxDist = 20).collect()
    val close = pairs.find(r => r.getAs[Long]("id_a") === 1L && r.getAs[Long]("id_b") === 2L)
    assert(close.isDefined, "near-identical docs must be a candidate pair")
    assert(close.get.getAs[Int]("hamming") <= 12)
  }
}
