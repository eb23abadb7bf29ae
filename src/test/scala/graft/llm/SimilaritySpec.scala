package graft.llm

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SimilaritySpec extends SparkSpec {

  test("brute-force topk: k rows per query, cosine in [-1,1], self excluded") {
    val out = Similarity.bruteTopK(Tables.embeddings(spark, sf("sf0.01")),
      "vec_id", "embedding", col("id") % 40 === 0, k = 5).cache()
    val perQuery = out.groupBy("query_id").count().collect()
    assert(perQuery.forall(_.getLong(1) === 5L))
    assert(out.filter(col("cosine") > 1.0001 || col("cosine") < -1.0001).count() === 0)
    assert(out.filter(col("query_id") === col("neighbor_id")).count() === 0)
  }

  test("lsh topk recall vs brute force") {
    val emb = Tables.embeddings(spark, sf("sf0.01"))
    val brute = Similarity.bruteTopK(emb, "vec_id", "embedding",
      col("id") % 40 === 0, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding",
      col("id") % 40 === 0, k = 5,
      Similarity.md5Planes(dim = 64, groups = 16, bitsPerGroup = 6))
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    info(s"recall@5 = $recall (${lsh.size} approx rows, ${brute.size} exact)")
    assert(recall > 0.5) // approximate method, md5-derived → deterministic bound
  }
}
