package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Build-once/probe-many contract: probing the persisted index with
  * the corpus's own query slice reproduces the monolithic operators
  * bit-exactly at equal planes/probes — including through a parquet
  * round-trip (what "persisted" actually means), so refreshing the
  * index on a schedule and probing per batch changes no returned row.
  */
class AnnIndexSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("topK probe equals monolithic lshTopK at equal planes (with and without probes)") {
    val emb = graft.Tables.embeddings(spark, sf())
    val planes = Similarity.md5Planes(64, 16, 6)
    val qp = col("id") % 40 === 0
    val queries = emb.filter(col("vec_id") % 40 === 0)
    val (buckets, vectors) = AnnIndex.build(emb, "vec_id", "embedding", planes)
    val probe = AnnIndex.topK(buckets, vectors, queries, "vec_id", "embedding",
      planes, k = 5)
    val mono = Similarity.lshTopK(emb, "vec_id", "embedding", qp, k = 5, planes)
    assert(rows(probe) === rows(mono))
    assert(rows(probe).nonEmpty)
    // multi-probe: flips are query-side, index untouched
    val finePlanes = Similarity.md5Planes(64, 16, 10)
    val (fb, fv) = AnnIndex.build(emb, "vec_id", "embedding", finePlanes)
    val probeP = AnnIndex.topK(fb, fv, queries, "vec_id", "embedding",
      finePlanes, k = 5, probes = 10)
    val monoP = Similarity.lshTopK(emb, "vec_id", "embedding", qp, k = 5,
      finePlanes, probes = 10)
    assert(rows(probeP) === rows(monoP))
  }

  test("hammingTopK probe equals the monolithic funnel, including the policy/probe parameters") {
    val emb = graft.Tables.embeddings(spark, sf())
    val n = emb.count()
    val bits = ScalePolicy.lshBitsFor(n)
    val planes = Similarity.md5Planes(64, ScalePolicy.lshGroupsFor(bits), bits)
    val qp = col("id") % 40 === 0
    val queries = emb.filter(col("vec_id") % 40 === 0)
    val (buckets, vectors) = AnnIndex.buildHamming(emb, "vec_id", "embedding", planes)
    val probe = AnnIndex.hammingTopK(buckets, vectors, queries, "vec_id",
      "embedding", planes, k = 5, shortlist = 32, probes = bits)
    val mono = Similarity.hammingRerankBucketedTopK(emb, "vec_id", "embedding",
      qp, k = 5, planes, shortlist = 32, probes = bits)
    assert(rows(probe) === rows(mono))
    assert(rows(probe).nonEmpty)
  }

  test("a parquet round-trip of the index changes no returned row") {
    val emb = graft.Tables.embeddings(spark, sf())
    val planes = Similarity.md5Planes(64, 16, 6)
    val queries = emb.filter(col("vec_id") % 40 === 0)
    val (buckets, vectors) = AnnIndex.build(emb, "vec_id", "embedding", planes)
    val dir = Files.createTempDirectory("ann_idx").toFile.getAbsolutePath
    buckets.write.parquet(s"$dir/buckets")
    vectors.write.parquet(s"$dir/vectors")
    val live = AnnIndex.topK(buckets, vectors, queries, "vec_id", "embedding",
      planes, k = 5)
    val persisted = AnnIndex.topK(
      spark.read.parquet(s"$dir/buckets"), spark.read.parquet(s"$dir/vectors"),
      queries, "vec_id", "embedding", planes, k = 5)
    assert(rows(persisted) === rows(live))
  }

  test("disjoint external queries probe the index (no self-exclusion interference)") {
    // external ids far outside the corpus id space: every corpus
    // vector is a legal neighbor, and an exact copy surfaces at
    // cosine 1 rank 1
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, sf())
    val planes = Similarity.md5Planes(64, 16, 6)
    val (buckets, vectors) = AnnIndex.build(emb, "vec_id", "embedding", planes)
    val copy = emb.orderBy("vec_id").limit(1)
      .select(col("vec_id"), col("embedding")).collect()(0)
    val queries = Seq((1000000L + copy.getLong(0), copy.getSeq[Float](1)))
      .toDF("vec_id", "embedding")
    val out = AnnIndex.topK(buckets, vectors, queries, "vec_id", "embedding",
      planes, k = 3).collect()
    assert(out.nonEmpty)
    val top = out.minBy(_.getInt(3))
    assert(top.getLong(1) === copy.getLong(0))
    assert(math.abs(top.getDouble(2) - 1.0) < 1e-12)
  }
}
